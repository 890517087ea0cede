"""DPT decoder head — JAX/Flax, NHWC, TPU-first.

Parity with the reference head (reference depth_anything_v2/dpt.py:38-150 and
util/blocks.py): per-tap 1x1 projection, resize ladder (x4/x2/identity/half),
scratch 3x3 convs to a common width, four FeatureFusionBlock refinenets
top-down with bilinear align_corners=True upsampling, and the two output
convs ending in ReLU depth.

All spatial resizes are static-shape separable matmuls (ops/resize.py); the
k=s ConvTranspose upsamplers are expressed as einsum + reshape (a pure MXU
matmul) instead of a transposed convolution.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vr_video_generator_tpu.ops.head_tail_pallas import (
    big_pick_plan, ext_pick_block_rows, head_tail_big_pallas,
    head_tail_ext_pallas)
from vr_video_generator_tpu.ops.resize import resize_bilinear
from vr_video_generator_tpu.utils.config import ModelConfig

Dtype = Any


class PixelShuffleUpsample(nn.Module):
    """ConvTranspose2d with kernel_size == stride == r, padding 0.

    For k=s transposed convolution every output pixel receives exactly one
    (input pixel, tap) contribution, so it factors into a dense map
    C -> r*r*O followed by a depth-to-space reshape — one big matmul on the
    MXU. Mirrors reference dpt.py:61-73 resize_layers[0]/[1].
    Param layout: kernel (r, r, C, O) where torch's ConvTranspose2d weight is
    (C, O, r, r).
    """

    out_ch: int
    rate: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        r = self.rate
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (r, r, c, self.out_ch), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,), jnp.float32)
        y = jnp.einsum("bhwc,ijco->bhiwjo", x.astype(self.dtype),
                       kernel.astype(self.dtype))
        y = y.reshape(b, h * r, w * r, self.out_ch)
        return y + bias.astype(self.dtype)


class _ConvParams(nn.Module):
    """Declares nn.Conv-shaped params (kernel HWIO + bias) without the
    conv — the fused Pallas tail consumes them directly while keeping the
    checkpoint tree identical to the XLA path."""

    features: int
    in_features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _RCUParams(nn.Module):
    """Param tree of a ResidualConvUnit (conv1+conv2) without the compute —
    consumed by the fused refinenet_pre_pallas kernel."""

    features: int

    @nn.compact
    def __call__(self):
        k1, b1 = _ConvParams(self.features, self.features, name="conv1")()
        k2, b2 = _ConvParams(self.features, self.features, name="conv2")()
        return k1, b1, k2, b2


class ResidualConvUnit(nn.Module):
    """relu-conv-relu-conv + skip — reference util/blocks.py:29-80 (no BN)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """Top-down refinenet — reference util/blocks.py:83-148.

    One input: rcu2 -> upsample -> 1x1 out_conv.
    Two inputs: x + rcu1(skip) first. Upsample target is the static
    ``out_hw`` (or exact x2 when None), bilinear align_corners=True.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None = None,
                 out_hw: Tuple[int, int] | None = None,
                 return_pre_upsample: bool = False,
                 return_params: bool = False):
        if return_params:
            # fully-fused path: declare the identical param tree and hand
            # everything to the Pallas kernels (rcu pair + ext tail).
            r1 = _RCUParams(self.features, name="rcu1")()
            r2 = _RCUParams(self.features, name="rcu2")()
            oc = _ConvParams(self.features, self.features, (1, 1),
                             name="out_conv")()
            return r1, r2, oc
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name="rcu1")(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype,
                             name="rcu2")(x)
        if return_pre_upsample:
            # fused-tail path: hand back the pre-upsample activation plus
            # out_conv's params (same tree as the nn.Conv below).
            k, b = _ConvParams(self.features, self.features, (1, 1),
                               name="out_conv")()
            return x, k, b
        if out_hw is None:
            out_hw = (x.shape[-3] * 2, x.shape[-2] * 2)
        # compute-dtype resize: the reference runs these under fp16 autocast
        # (PredictAndGenerate.py:54), so bf16/default precision is parity.
        x = resize_bilinear(x, out_hw, align_corners=True, dtype=self.dtype,
                            precision=jax.lax.Precision.DEFAULT)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class DPTHead(nn.Module):
    """Reference dpt.py:38-150 (use_clstoken=False path, as the reference
    always constructs it — dpt.py:176).

    ``tail``: "xla" keeps the pure-XLA tail; "fused" runs refinenet1's
    upsample + out_conv + output convs in one Pallas kernel
    (ops/head_tail_pallas) when the geometry fits VMEM — the XLA tail's
    32/64-channel intermediates all pad to 128 lanes and make it
    bandwidth-bound; "auto" fuses on TPU backends only. Both paths create
    the identical parameter tree.
    """

    cfg: ModelConfig
    dtype: Dtype = jnp.float32
    tail: str = "auto"

    @nn.compact
    def __call__(self, taps: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                 ph: int, pw: int) -> jnp.ndarray:
        cfg = self.cfg
        feats = cfg.features
        out = []
        for i, (tokens, _cls) in enumerate(taps):
            b = tokens.shape[0]
            x = tokens.reshape(b, ph, pw, tokens.shape[-1]).astype(self.dtype)
            x = nn.Conv(cfg.out_channels[i], (1, 1), dtype=self.dtype,
                        name=f"project{i}")(x)
            if i == 0:
                x = PixelShuffleUpsample(cfg.out_channels[0], 4,
                                         dtype=self.dtype, name="resize0")(x)
            elif i == 1:
                x = PixelShuffleUpsample(cfg.out_channels[1], 2,
                                         dtype=self.dtype, name="resize1")(x)
            elif i == 3:
                x = nn.Conv(cfg.out_channels[3], (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name="resize3")(x)
            out.append(x)

        rn = [nn.Conv(feats, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                      name=f"layer{i + 1}_rn")(out[i]) for i in range(4)]

        path4 = FeatureFusionBlock(feats, dtype=self.dtype, name="refinenet4")(
            rn[3], out_hw=rn[2].shape[1:3])
        path3 = FeatureFusionBlock(feats, dtype=self.dtype, name="refinenet3")(
            path4, rn[2], out_hw=rn[1].shape[1:3])
        path2 = FeatureFusionBlock(feats, dtype=self.dtype, name="refinenet2")(
            path3, rn[1], out_hw=rn[0].shape[1:3])

        out_hw = (ph * cfg.patch_size, pw * cfg.patch_size)
        pre_shape = (out[0].shape[0], rn[0].shape[1], rn[0].shape[2], feats)
        fuse = self.tail == "fused" or (
            self.tail == "auto" and jax.default_backend() == "tpu")
        big = None
        if fuse and ext_pick_block_rows(pre_shape, feats // 2, self.dtype,
                                        out_hw) is None:
            # vitl: 256-channel rows blow the single-kernel VMEM plan; fall
            # back to the two-kernel big-C tail, then to XLA.
            big = big_pick_plan(pre_shape, feats // 2, self.dtype, out_hw)
            if big is None:
                fuse = False

        if fuse:
            # NOTE: a fused rcu1/rcu2 kernel exists (refinenet_pre_pallas +
            # channel_major_halo tail input) but measured slower than XLA's
            # RCU convs at 148-space (halo recompute at VMEM-bounded block
            # sizes), so the RCUs stay XLA here.
            pre, oc_k, oc_b = FeatureFusionBlock(
                feats, dtype=self.dtype, name="refinenet1")(
                path2, rn[0], return_pre_upsample=True)
            k1, b1 = _ConvParams(feats // 2, feats, name="output_conv1")()
            k2, b2 = _ConvParams(32, feats // 2, name="output_conv2_0")()
            k3, b3 = _ConvParams(1, 32, (1, 1), name="output_conv2_2")()
            if big is not None:
                return head_tail_big_pallas(pre.astype(self.dtype), oc_k, oc_b,
                                            k1, b1, k2, b2, k3, b3, out_hw,
                                            plan=big)
            return head_tail_ext_pallas(pre.astype(self.dtype), oc_k, oc_b,
                                        k1, b1, k2, b2, k3, b3, out_hw)

        path1 = FeatureFusionBlock(feats, dtype=self.dtype, name="refinenet1")(
            path2, rn[0])
        x = nn.Conv(feats // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="output_conv1")(path1)
        x = resize_bilinear(x, out_hw,
                            align_corners=True, dtype=self.dtype,
                            precision=jax.lax.Precision.DEFAULT)
        x = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                    name="output_conv2_0")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv2_2")(x)
        x = nn.relu(x)
        return x[..., 0]
