"""Depth-net input preprocessing — parity with the reference transform stack.

Reference chain (depth_anything_v2/dpt.py:204-228 + util/transform.py):
  BGR->RGB, /255, aspect-keeping resize to >=input_size with multiple-of-14
  rounding ("lower_bound" policy, INTER_AREA), ImageNet normalize, HWC->CHW.

The TPU build takes RGB uint8 HWC frames (the host decode tier already
delivers RGB), keeps NHWC layout (native for XLA convs), and does resize +
normalize on device in one fused program.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from vr_video_generator_tpu.ops.resize import resize_area_cv2

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def constrain_to_multiple_of(x: float, multiple_of: int, min_val: float = 0,
                             max_val: float | None = None) -> int:
    """Reference Resize.constrain_to_multiple_of (util/transform.py:51-60)."""
    y = int(round(x / multiple_of) * multiple_of)
    if max_val is not None and y > max_val:
        y = int(np.floor(x / multiple_of) * multiple_of)
    if y < min_val:
        y = int(np.ceil(x / multiple_of) * multiple_of)
    return y


def network_input_size(height: int, width: int, target: int = 518,
                       multiple_of: int = 14) -> Tuple[int, int]:
    """(H, W) the depth net sees for a source frame of (height, width).

    Reference Resize.get_size with keep_aspect_ratio=True and
    resize_method='lower_bound' (util/transform.py:62-107): scale so both
    sides are at least ``target``, then round each side to a multiple of 14
    (never dropping below ``target``).
    """
    scale_h = target / height
    scale_w = target / width
    scale = max(scale_h, scale_w)  # lower_bound: output at least target
    new_h = constrain_to_multiple_of(scale * height, multiple_of, min_val=target)
    new_w = constrain_to_multiple_of(scale * width, multiple_of, min_val=target)
    return new_h, new_w


def preprocess_frames(frames_rgb_u8: jnp.ndarray, net_hw: Tuple[int, int],
                      dtype=jnp.float32, impl: str = "exact") -> jnp.ndarray:
    """uint8 RGB (..., H, W, 3) -> normalized (..., Hn, Wn, 3) network input.

    Matches reference image2tensor (dpt.py:204-228): /255, INTER_AREA resize,
    ImageNet normalize. Resize and normalize commute (the resize is linear
    with rows summing to 1) but we keep the reference order.

    ``impl="folded"`` (bf16 deployment fast path, -0.17 ms/frame at 1080p):
    uint8 pixels cast to bf16 (exact for 0..255), both separable resize
    GEMMs run in bf16 with f32 MXU accumulation, and /255 + ImageNet
    normalize fold into a final affine. Deviation vs the exact path is set
    by bf16 weight rounding (~0.4%), the same order as the bf16 cast the
    exact path ends with — the end-to-end TPU bf16 per-pixel parity gate
    covers it (docs/BENCHLOG.md).
    """
    if impl == "folded":
        from vr_video_generator_tpu.ops.resize import (_apply_axis,
                                                       area_or_linear_weights)

        h_in, w_in = frames_rgb_u8.shape[-3], frames_rgb_u8.shape[-2]
        hn, wn = net_hw
        up = hn > h_in or wn > w_in
        scale = jnp.asarray(1.0 / (255.0 * IMAGENET_STD), dtype)
        bias = jnp.asarray(-IMAGENET_MEAN / IMAGENET_STD, dtype)
        x = frames_rgb_u8.astype(dtype)
        # banded-blocked when it pays (the area matrices are ~3-tap banded;
        # at 1080p -> 518x924 the blocked form does ~4x fewer MXU FLOPs)
        x = _apply_axis(x, area_or_linear_weights(h_in, hn, up),
                        x.ndim - 3, "o", dtype, None)
        x = _apply_axis(x, area_or_linear_weights(w_in, wn, up),
                        x.ndim - 2, "p", dtype, None)
        return x * scale + bias
    x = frames_rgb_u8.astype(jnp.float32) / 255.0
    x = resize_area_cv2(x, net_hw)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)
