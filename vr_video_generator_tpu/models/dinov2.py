"""DINOv2 vision transformer encoder — JAX/Flax, TPU-first.

Functional parity with the reference encoder
(reference depth_anything_v2/dinov2.py + dinov2_layers/): patch-embed 14x14,
cls token, bicubic pos-embed interpolation with the 0.1-offset quirk
(dinov2.py:179-210), pre-norm blocks with LayerScale (block.py:82-107,
layer_scale.py:16-28), exact-erf GELU MLP (mlp.py:17-41), and intermediate
layer taps with final-norm + cls-token return (dinov2.py:297-321).

TPU-first choices: NHWC patch conv, one fused QKV projection feeding
``jax.nn.dot_product_attention`` (XLA picks the fused TPU attention path),
bf16 activations with f32 LayerNorm/softmax accumulation, static shapes
throughout (the pos-embed resample is a trace-time weight-matrix matmul,
ops/resize.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vr_video_generator_tpu.ops.attention import mha
from vr_video_generator_tpu.ops.gelu import gelu_exact
from vr_video_generator_tpu.ops.layernorm import layernorm
from vr_video_generator_tpu.ops.resize import resize_bicubic
from vr_video_generator_tpu.utils.config import ModelConfig

Dtype = Any


class LayerNorm(nn.Module):
    """LayerNorm with f32 statistics and compute-dtype output, lowered to the
    fused Pallas kernel on TPU (ops/layernorm.py). Param names match flax
    LayerNorm ({scale, bias}) so converted checkpoints are layout-identical.
    eps 1e-6 per the reference (dinov2.py:95)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return layernorm(x, scale, bias, eps=1e-6, out_dtype=self.dtype)


class Mlp(nn.Module):
    """Transformer MLP with exact (erf) GELU — reference dinov2_layers/mlp.py:17-41.

    The exact path uses ops/gelu.gelu_exact (A&S 7.1.26 erf, <=1.5e-7 err,
    ~2x cheaper than XLA's erf on the VPU); ``gelu_approx`` swaps in the
    tanh approximation (ModelConfig.gelu_approx — a speed knob, not
    reference parity)."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        if self.gelu_approx:
            x = jax.nn.gelu(x, approximate=True)
        else:
            x = gelu_exact(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class SwiGLUFFN(nn.Module):
    """SwiGLU feed-forward (vitg only) — reference dinov2_layers/swiglu_ffn.py.

    Fused variant: one Dense produces [x1 | x2], hidden = silu(x1) * x2,
    with the 2/3-rounded-to-8 hidden sizing of SwiGLUFFNFused.
    """

    hidden_dim: int  # the nominal mlp hidden (dim * mlp_ratio)
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        swiglu_hidden = (int(self.hidden_dim * 2 / 3) + 7) // 8 * 8
        x12 = nn.Dense(2 * swiglu_hidden, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        hidden = jax.nn.silu(x1) * x2
        return nn.Dense(self.out_dim, dtype=self.dtype, name="w3")(hidden)


class Attention(nn.Module):
    """Multi-head self-attention — reference dinov2_layers/attention.py:29-62.

    The reference scales q by head_dim**-0.5 before the logits matmul; we pass
    the same scale to the fused attention op. Softmax runs in f32.
    """

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = mha(q, k, v, scale=head_dim ** -0.5)
        out = out.reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class LayerScale(nn.Module):
    """Per-channel residual scaling — reference dinov2_layers/layer_scale.py:16-28."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        return x * gamma.astype(self.dtype)


class _DenseParams(nn.Module):
    """nn.Dense-shaped params (kernel (in, out) + bias) without the compute —
    consumed by the fused MLP half-block kernel while keeping the checkpoint
    tree identical to the unfused path."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _MlpParams(nn.Module):
    """Param tree of Mlp (fc1+fc2) without the compute."""

    hidden_dim: int
    dim: int

    @nn.compact
    def __call__(self):
        k1, b1 = _DenseParams(self.hidden_dim, self.dim, name="fc1")()
        k2, b2 = _DenseParams(self.dim, self.hidden_dim, name="fc2")()
        return k1, b1, k2, b2


class _AttnParams(nn.Module):
    """Param tree of Attention (qkv+proj) without the compute."""

    dim: int

    @nn.compact
    def __call__(self):
        kq, bq = _DenseParams(3 * self.dim, self.dim, name="qkv")()
        kp, bp = _DenseParams(self.dim, self.dim, name="proj")()
        return kq, bq, kp, bp


class _SwiGLUParams(nn.Module):
    """Param tree of SwiGLUFFN (w12+w3) without the compute."""

    hidden_dim: int
    dim: int

    @nn.compact
    def __call__(self):
        swiglu_hidden = (int(self.hidden_dim * 2 / 3) + 7) // 8 * 8
        k12, b12 = _DenseParams(2 * swiglu_hidden, self.dim, name="w12")()
        k3, b3 = _DenseParams(self.dim, swiglu_hidden, name="w3")()
        return k12, b12, k3, b3


class _LNParams(nn.Module):
    """Param tree of LayerNorm ({scale, bias}) without the compute."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return scale, bias


class _LSParams(nn.Module):
    """Param tree of LayerScale ({gamma}) without the compute."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("gamma", nn.initializers.ones, (self.dim,),
                          jnp.float32)


class Block(nn.Module):
    """Pre-norm transformer block — reference dinov2_layers/block.py:36-107.

    Inference path only (x + ls1(attn(norm1 x)); x + ls2(mlp(norm2 x))); the
    reference's stochastic-depth branches are train-only and Depth-Anything-V2
    runs the encoder frozen.

    ``mlp_fused`` is the fusion policy for BOTH half-blocks: "auto" fuses
    the attention half (ops/qkv_pallas.py + the one-shot attention kernel)
    at every fusable width and the MLP half (ops/mlp_pallas.py) at D>=512
    on TPU backends — identical param trees, same rounding points;
    "xla"/"fused" force both halves off/on.
    """

    dim: int
    num_heads: int
    mlp_ratio: float
    ffn_layer: str = "mlp"
    dtype: Dtype = jnp.float32
    gelu_approx: bool = False
    mlp_fused: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from vr_video_generator_tpu.ops.attention_pallas import (
            oneshot_mha_heads, supported)
        from vr_video_generator_tpu.ops.mlp_pallas import mlp_residual_pallas
        from vr_video_generator_tpu.ops.qkv_pallas import (
            attn_fusable, ln_qkv_pallas, proj_ls_residual_pallas)

        # Attention-side fusion pays at EVERY width (vits 157 -> 181 fps:
        # the win is the removed transposes/LN/layout traffic, not the GEMM),
        # unlike the MLP half which only wins at D>=512.
        n_tokens = x.shape[1]
        fuse_attn = self.dim % 128 == 0 and (self.dim // self.num_heads) \
            % 64 == 0 and supported(n_tokens) \
            and attn_fusable(self.dim, n_tokens, x.dtype) and (
                self.mlp_fused == "fused"
                or (self.mlp_fused == "auto"
                    and jax.default_backend() == "tpu"))
        if fuse_attn:
            lnw1, lnb1 = _LNParams(self.dim, name="norm1")()
            kq, bq, kp, bp = _AttnParams(self.dim, name="attn")()
            g1 = _LSParams(self.dim, name="ls1")()
            scale = (self.dim // self.num_heads) ** -0.5
            qt, kt, vt = ln_qkv_pallas(x, lnw1, lnb1, kq, bq,
                                       self.num_heads, scale)
            ot = oneshot_mha_heads(qt, kt, vt, n_tokens)
            x = proj_ls_residual_pallas(ot, x, kp, bp, g1)
        else:
            h = LayerNorm(self.dim, dtype=self.dtype, name="norm1")(x)
            h = Attention(self.num_heads, dtype=self.dtype, name="attn")(h)
            x = x + LayerScale(self.dim, dtype=self.dtype, name="ls1")(h)
        # "auto" fuses only at vitb/vitl/vitg widths: at D=384 (vits) the
        # fused kernel microbenches even with XLA but costs ~2-3% in the
        # full pipeline, while at D>=768 it wins ~15% (vitb 66.9 -> 76.7
        # fps); see docs/BENCHLOG.md round-2 MLP study.
        fuse = self.ffn_layer in ("mlp", "swiglufused") \
            and self.dim % 128 == 0 and (
                self.mlp_fused == "fused"
                or (self.mlp_fused == "auto" and self.dim >= 512
                    and jax.default_backend() == "tpu"))
        if fuse:
            from vr_video_generator_tpu.ops.mlp_pallas import \
                swiglu_residual_pallas

            lnw, lnb = _LNParams(self.dim, name="norm2")()
            gamma = _LSParams(self.dim, name="ls2")()
            if self.ffn_layer == "swiglufused":
                k12, b12, k3, b3 = _SwiGLUParams(
                    int(self.dim * self.mlp_ratio), self.dim, name="mlp")()
                return swiglu_residual_pallas(x, lnw, lnb, k12, b12, k3, b3,
                                              gamma)
            k1, b1, k2, b2 = _MlpParams(int(self.dim * self.mlp_ratio),
                                        self.dim, name="mlp")()
            return mlp_residual_pallas(x, lnw, lnb, k1, b1, k2, b2, gamma,
                                       approx=self.gelu_approx)
        h = LayerNorm(self.dim, dtype=self.dtype, name="norm2")(x)
        if self.ffn_layer == "swiglufused":
            h = SwiGLUFFN(int(self.dim * self.mlp_ratio), self.dim,
                          dtype=self.dtype, name="mlp")(h)
        else:
            h = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                    gelu_approx=self.gelu_approx, name="mlp")(h)
        return x + LayerScale(self.dim, dtype=self.dtype, name="ls2")(h)


class DinoVisionTransformer(nn.Module):
    """DINOv2 ViT returning intermediate-layer taps for the DPT head.

    Constructed at img_size=518 / patch 14 / layerscale 1.0 / no registers,
    matching the reference factory (reference dinov2.py:398-415).
    """

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    def interpolate_pos_encoding(self, pos_embed: jnp.ndarray, ph: int,
                                 pw: int) -> jnp.ndarray:
        """Bicubic pos-embed resample to a (ph, pw) patch grid.

        Reference dinov2.py:179-210: scale-factor-mode bicubic with
        align_corners=False and the +0.1 workaround offset; identity when the
        grid already matches and the image is square.
        """
        n = pos_embed.shape[1] - 1
        side = int(round(n ** 0.5))
        if ph == pw == side:
            return pos_embed
        cls_pos = pos_embed[:, :1].astype(jnp.float32)
        patch_pos = pos_embed[:, 1:].astype(jnp.float32)
        off = self.cfg.interpolate_offset
        sh, sw = (ph + off) / side, (pw + off) / side
        grid = patch_pos.reshape(1, side, side, -1)
        grid = resize_bicubic(grid, (ph, pw), align_corners=False,
                              scale_hw=(sh, sw), h_axis=1, w_axis=2)
        return jnp.concatenate(
            [cls_pos, grid.reshape(1, ph * pw, -1)], axis=1)

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 take_layers: Sequence[int]) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]:
        """x: (B, H, W, 3) normalized, H/W multiples of 14. Returns a tuple of
        (patch_tokens (B, ph*pw, D), cls_token (B, D)) per tapped layer, each
        with the final LayerNorm applied (reference dinov2.py:309-312)."""
        cfg = self.cfg
        b, h, w, _ = x.shape
        ph, pw = h // cfg.patch_size, w // cfg.patch_size

        # Patch embedding: 14x14/s14 conv (reference patch_embed.py:26-89),
        # expressed as patch-extract reshape + one GEMM — XLA lowers the
        # strided 3-channel conv itself ~100x off MXU peak (14ms/batch).
        p = cfg.patch_size
        kernel = self.param("patch_embed",
                            lambda key: {"kernel": nn.initializers.lecun_normal()(
                                key, (p, p, 3, cfg.embed_dim), jnp.float32),
                                "bias": jnp.zeros((cfg.embed_dim,), jnp.float32)})
        patches = x.astype(self.dtype).reshape(b, ph, p, pw, p, 3)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, ph * pw, p * p * 3)
        w_flat = kernel["kernel"].astype(self.dtype).reshape(p * p * 3,
                                                             cfg.embed_dim)
        x = patches @ w_flat + kernel["bias"].astype(self.dtype)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, cfg.embed_dim), jnp.float32)
        grid = cfg.pretrain_img_size // cfg.patch_size
        pos_embed = self.param("pos_embed", nn.initializers.normal(0.02),
                               (1, grid * grid + 1, cfg.embed_dim), jnp.float32)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, cfg.embed_dim)), x],
            axis=1)
        pos = self.interpolate_pos_encoding(pos_embed, ph, pw)
        x = x + pos.astype(self.dtype)

        take = set(take_layers)
        final_norm = LayerNorm(cfg.embed_dim, dtype=self.dtype, name="norm")
        tapped = {}
        for i in range(cfg.depth):
            x = Block(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                      ffn_layer=cfg.ffn_layer, dtype=self.dtype,
                      gelu_approx=cfg.gelu_approx,
                      mlp_fused=getattr(cfg, "mlp_fused", "auto"),
                      name=f"block{i}")(x)
            if i in take:
                out = final_norm(x)
                tapped[i] = (out[:, 1:], out[:, 0])
        # one tap per requested index, duplicates allowed (tiny test configs)
        return tuple(tapped[i] for i in take_layers)
