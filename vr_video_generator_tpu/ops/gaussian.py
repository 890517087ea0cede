"""Separable Gaussian blur with torchvision parity.

The reference smooths occlusion-fill pixels with
``torchvision.transforms.v2.functional.gaussian_blur(img_chw, (2k+3, 2k+1),
sigma=3)`` (reference PredictAndGenerate.py:191-194; k = round(0.0036*H),
:165). torchvision builds two 1-D kernels (kernel_size[0] = width-axis,
kernel_size[1] = height-axis), pads with reflect, convolves, and rounds back
to the integer dtype. Reproduced here as two depthwise 1-D convolutions.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """torchvision _get_gaussian_kernel1d: sampled pdf, normalized."""
    x = np.linspace(-(ksize - 1) * 0.5, (ksize - 1) * 0.5, ksize)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    return (pdf / pdf.sum()).astype(np.float32)


def _depthwise_1d(x: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    """Depthwise 1-D blur along H (axis=1) or W (axis=2) of NHWC ``x``,
    reflect padding.

    Implemented as a sum of statically shifted slices rather than
    ``conv_general_dilated``: a 3-channel depthwise conv puts C=3 in the
    lane dimension and crawls on TPU, while k shifted multiply-adds stay one
    elementwise fusion.
    """
    k = kernel.shape[0]
    n = x.shape[axis]
    pad = [(0, 0)] * 4
    pad[axis] = (k // 2, k // 2)
    xp = jnp.pad(x, pad, mode="reflect")
    out = jnp.zeros_like(x)
    for t in range(k):
        sl = [slice(None)] * 4
        sl[axis] = slice(t, t + n)
        out = out + float(kernel[t]) * xp[tuple(sl)]
    return out


def gaussian_blur(img: jnp.ndarray, kernel_wh: Tuple[int, int],
                  sigma: float) -> jnp.ndarray:
    """Blur (..., H, W, C) float input; kernel_wh = (kx, ky) torchvision order."""
    kx, ky = kernel_wh
    batched = img.ndim == 4
    x = img if batched else img[None]
    x = x.astype(jnp.float32)
    x = _depthwise_1d(x, gaussian_kernel1d(kx, sigma), axis=2)
    x = _depthwise_1d(x, gaussian_kernel1d(ky, sigma), axis=1)
    return x if batched else x[0]


def gaussian_blur_u8(img_u8: jnp.ndarray, kernel_wh: Tuple[int, int],
                     sigma: float) -> jnp.ndarray:
    """uint8 in/out with torchvision's round-half-even + clamp cast."""
    out = gaussian_blur(img_u8, kernel_wh, sigma)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
