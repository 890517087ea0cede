"""Depth-Anything-V2 assembly: DINOv2 encoder + DPT head + infer wrapper.

Parity with reference depth_anything_v2/dpt.py:153-228 (DepthAnythingV2):
intermediate-layer taps per encoder size (dpt.py:166-171), ReLU depth
(dpt.py:186-187), bicubic align_corners=True upsample back to the source
resolution (dpt.py:196) and the per-encoder depth rescale applied by the
inference worker (reference PredictAndGenerate.py:27-34,55).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vr_video_generator_tpu.models.dinov2 import DinoVisionTransformer
from vr_video_generator_tpu.models.dpt import DPTHead
from vr_video_generator_tpu.ops.preprocess import network_input_size, preprocess_frames
from vr_video_generator_tpu.ops.resize import resize_bicubic
from vr_video_generator_tpu.utils.config import ModelConfig

Dtype = Any


class DepthAnythingV2(nn.Module):
    """Forward over preprocessed network input (B, Hn, Wn, 3) -> (B, Hn, Wn)."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32
    tail: str = "auto"  # DPT head tail impl: auto | fused | xla

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ph = x.shape[-3] // self.cfg.patch_size
        pw = x.shape[-2] // self.cfg.patch_size
        taps = DinoVisionTransformer(self.cfg, dtype=self.dtype,
                                     name="pretrained")(
            x, self.cfg.intermediate_layers)
        depth = DPTHead(self.cfg, dtype=self.dtype, tail=self.tail,
                        name="depth_head")(taps, ph, pw)
        return nn.relu(depth)


def infer_depth(model: DepthAnythingV2, params, frames_rgb_u8: jnp.ndarray,
                input_size: int = 518, apply_scaler: bool = True,
                out_hw: Tuple[int, int] | None = None,
                preprocess: str = "exact") -> jnp.ndarray:
    """uint8 RGB frames (B, H, W, 3) -> depth (B, H, W) float32.

    The jittable equivalent of the reference's
    ``infer_image_gpu(img) * scaler`` chain (dpt.py:190-199 +
    PredictAndGenerate.py:55): preprocess, forward, bicubic
    align_corners=True upsample to the source resolution, rescale.
    ``preprocess``: 'exact' or the bf16 'folded' fast path
    (ops/preprocess.preprocess_frames).
    """
    h, w = frames_rgb_u8.shape[-3], frames_rgb_u8.shape[-2]
    net_hw = network_input_size(h, w, target=input_size,
                                multiple_of=model.cfg.patch_size)
    x = preprocess_frames(frames_rgb_u8, net_hw, dtype=model.dtype,
                          impl=preprocess)
    depth = model.apply({"params": params}, x).astype(jnp.float32)
    if out_hw is None:
        out_hw = (h, w)
    depth = resize_bicubic(depth[..., None], out_hw, align_corners=True)[..., 0]
    if apply_scaler:
        depth = depth * model.cfg.depth_scaler
    return depth
