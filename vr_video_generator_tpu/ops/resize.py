"""Separable resampling as weight-matrix matmuls — the TPU-native resize tier.

The reference leans on three resamplers that have no exact XLA builtin:

  * cv2 ``INTER_AREA`` for the depth-net input resize
    (reference depth_anything_v2/dpt.py:213, util/transform.py:113);
  * torch ``bicubic`` interpolation, both align_corners=True (depth upsample,
    dpt.py:196) and scale-factor/align_corners=False (DINOv2 pos-embed
    interpolation, dinov2.py:199-205);
  * torch ``bilinear, align_corners=True`` (DPT fusion-block upsampling,
    util/blocks.py:144, and the final x14 upsample, dpt.py:147).

All are separable linear maps with static shapes, so each axis is one dense
(out, in) weight matrix built on host at trace time and applied with
``jnp.einsum`` — turning every resize into MXU matmuls instead of gather soup.
Weight construction reproduces the cv2/torch coordinate conventions exactly
(half-pixel centers, border clamping, cv2's zero-fraction edge clamp, cubic
convolution with A=-0.75).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "area_weights", "linear_weights", "cubic_weights",
    "resize_area_cv2", "resize_bilinear", "resize_bicubic",
    "ResizePlan",
]


# ---------------------------------------------------------------------------
# Weight-matrix builders (host-side numpy; cached — they are trace constants)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def area_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) weights of exact area (box-average) downsampling.

    Matches cv2 INTER_AREA's fractional-ratio path: output k averages input
    span [k*s, (k+1)*s), s = n_in/n_out, with fractional edge weights.
    """
    s = n_in / n_out
    w = np.zeros((n_out, n_in), np.float64)
    for k in range(n_out):
        a, b = k * s, (k + 1) * s
        i0 = int(np.floor(a))
        i1 = min(int(np.ceil(b)), n_in)
        for i in range(i0, i1):
            w[k, i] = (min(i + 1.0, b) - max(float(i), a)) / s
    return w


@functools.lru_cache(maxsize=None)
def linear_weights(n_in: int, n_out: int, align_corners: bool = False,
                   scale: Optional[float] = None,
                   cv2_edge_clamp: bool = False) -> np.ndarray:
    """(n_out, n_in) bilinear weights.

    align_corners=True:  src = k*(n_in-1)/(n_out-1)           (torch semantics)
    align_corners=False: src = (k+0.5)/scale - 0.5            (half-pixel)
    cv2_edge_clamp: cv2 INTER_LINEAR clamps src<0 to exactly sample index 0
    (fraction zeroed) rather than extrapolating — needed for cv2 parity on
    the upscaling fallback of INTER_AREA.
    """
    w = np.zeros((n_out, n_in), np.float64)
    if n_out == 1 and align_corners:
        w[0, 0] = 1.0
        return w
    for k in range(n_out):
        if align_corners:
            src = k * (n_in - 1) / max(n_out - 1, 1)
        else:
            sc = scale if scale is not None else n_out / n_in
            src = (k + 0.5) / sc - 0.5
        x0 = int(np.floor(src))
        t = src - x0
        if cv2_edge_clamp:
            if x0 < 0:
                x0, t = 0, 0.0
            if x0 >= n_in - 1:
                x0, t = n_in - 2, 1.0
                if n_in == 1:
                    x0, t = 0, 0.0
        w[k, np.clip(x0, 0, n_in - 1)] += 1.0 - t
        w[k, np.clip(x0 + 1, 0, n_in - 1)] += t
    return w


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), A=-0.75 as in torch/cv2."""
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    out = np.where(
        t <= 1.0,
        (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0,
        np.where(t < 2.0, a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=None)
def cubic_weights(n_in: int, n_out: int, align_corners: bool = False,
                  scale: Optional[float] = None) -> np.ndarray:
    """(n_out, n_in) bicubic weights with torch border semantics (taps clamped
    to the valid range — border replicate; fractions NOT zeroed)."""
    w = np.zeros((n_out, n_in), np.float64)
    for k in range(n_out):
        if align_corners:
            src = k * (n_in - 1) / max(n_out - 1, 1) if n_out > 1 else 0.0
        else:
            sc = scale if scale is not None else n_out / n_in
            src = (k + 0.5) / sc - 0.5
        x0 = int(np.floor(src))
        t = src - x0
        taps = np.array([x0 - 1, x0, x0 + 1, x0 + 2])
        wt = _cubic_kernel(np.array([t + 1.0, t, 1.0 - t, 2.0 - t]))
        for tap, wv in zip(np.clip(taps, 0, n_in - 1), wt):
            w[k, tap] += wv
    return w


@functools.lru_cache(maxsize=None)
def area_zoom_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) weights of cv2's INTER_AREA *zoom emulation* path.

    When either axis of an INTER_AREA resize enlarges, cv2 emulates area with
    a 2-tap interpolation whose coordinates come from its area-mode offset
    table: sx = floor(dx*scale), frac = (dx+1) - (sx+1)/scale (<=0 -> 0),
    applied to BOTH axes. Verified bit-close against cv2 5.0.
    """
    scale = n_in / n_out
    inv = n_out / n_in
    w = np.zeros((n_out, n_in), np.float64)
    for dx in range(n_out):
        sx = int(np.floor(dx * scale))
        fx = (dx + 1) - (sx + 1) * inv
        fx = 0.0 if fx <= 0 else fx - np.floor(fx)
        if sx < 0:
            sx, fx = 0, 0.0
        if sx >= n_in - 1:
            if n_in == 1:
                sx, fx = 0, 0.0
            else:
                sx, fx = n_in - 2, 1.0
        w[dx, sx] += 1.0 - fx
        w[dx, min(sx + 1, n_in - 1)] += fx
    return w


@functools.lru_cache(maxsize=None)
def area_or_linear_weights(n_in: int, n_out: int, zoom_mode: bool) -> np.ndarray:
    """cv2 INTER_AREA axis weights: true area when the WHOLE resize shrinks
    (both axes), otherwise cv2's 2-tap zoom emulation for both axes."""
    if zoom_mode:
        return area_zoom_weights(n_in, n_out)
    return area_weights(n_in, n_out)


# ---------------------------------------------------------------------------
# Appliers
# ---------------------------------------------------------------------------

_LETTERS = "abcdefghijklmn"

_BANDED_BLOCK = 128  # output rows per banded block (one MXU tile)

# Measured same-hour interleaved A/B on the attached TPU (2026-08-18,
# docs/BENCHLOG.md "Banded-blocked resize"): banded wins the isolated
# endpoint upsample (~0.41 vs ~0.50 ms/frame) but loses end-to-end on both
# tested configs (config 2: 191-193 vs 195.6 fps; config 5: 31.3 vs 32.2)
# — the stacked per-block slices cost HBM copies XLA's fused dense einsum
# avoids, and the head-tail x14 resize (tiny n_in) regresses outright.
# Default is therefore the dense einsums; VRVG_BANDED_RESIZE=1 re-enables
# the blocked form for controlled measurements.
_BANDED_ENABLED = os.environ.get("VRVG_BANDED_RESIZE", "0") != "0"


def _banded_plan(w: np.ndarray, block: int = _BANDED_BLOCK):
    """Decompose a banded (n_out, n_in) weight matrix into per-block dense
    factors, or return None when dense is at least as cheap.

    Every resampler here reads at most 4 input taps per output sample, so a
    block of ``block`` consecutive outputs touches only a contiguous input
    span of ~block/scale + taps columns. Returns (starts (nb,), wblk
    (nb, block, span)) with out[i*block:(i+1)*block] = wblk[i] @
    x[starts[i]:starts[i]+span] — exact (the factors are literal slices of
    ``w``), cutting the contraction from n_in to span.
    """
    n_out, n_in = w.shape
    nb = -(-n_out // block)
    pad = nb * block - n_out
    if pad:
        w = np.concatenate([w, np.zeros((pad, n_in), w.dtype)])
    starts, span = [], 0
    for i in range(nb):
        cols = np.nonzero(np.any(w[i * block:(i + 1) * block] != 0.0, axis=0))[0]
        lo, hi = (int(cols[0]), int(cols[-1]) + 1) if cols.size else (0, 1)
        starts.append(lo)
        span = max(span, hi - lo)
    span = min(-(-span // 8) * 8, n_in)  # sublane-align the slice width
    starts = [min(s, n_in - span) for s in starts]
    if nb * block * span >= n_out * n_in:  # blocked does MORE work: stay dense
        return None
    wblk = np.stack([w[i * block:(i + 1) * block, s:s + span]
                     for i, s in enumerate(starts)])
    return starts, wblk


def _apply_axis(x: jnp.ndarray, w: np.ndarray, axis: int, out_ch: str,
                compute, precision, banded: Optional[bool] = None
                ) -> jnp.ndarray:
    """One (n_out, n_in) weight matrix along ``axis`` of ``x`` — dense einsum
    by default; the blocked-banded form when requested (``banded=True`` or
    the VRVG_BANDED_RESIZE=1 opt-in) AND the band structure saves work."""
    src = _LETTERS[:x.ndim]
    if banded is None:
        banded = _BANDED_ENABLED
    plan = _banded_plan(w) if banded else None
    if plan is None:
        out = src.replace(src[axis], out_ch)
        return jnp.einsum(f"{src},{out_ch}{src[axis]}->{out}", x,
                          jnp.asarray(w, compute), precision=precision)
    starts, wblk = plan
    span = wblk.shape[2]
    slices = jnp.stack([jax.lax.slice_in_dim(x, s, s + span, axis=axis)
                        for s in starts])  # (nb, ..., span, ...)
    sl = "z" + src.replace(src[axis], "s")
    # output puts (block index z, within-block o) adjacent so one reshape
    # restores the axis — no transpose of the big activation
    out_sub = src[:axis] + "zo" + src[axis + 1:]
    out = jnp.einsum(f"{sl},zos->{out_sub}", slices,
                     jnp.asarray(wblk, compute), precision=precision)
    out = out.reshape(x.shape[:axis] + (-1,) + x.shape[axis + 1:])
    return jax.lax.slice_in_dim(out, 0, w.shape[0], axis=axis)


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray,
                     h_axis: int, w_axis: int,
                     dtype: Optional[jnp.dtype] = None,
                     precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
    """Apply per-axis weight matrices along (h_axis, w_axis) of ``x``.

    Axis-aware einsums (no moveaxis round-trips — transposing big NHWC
    activations costs real HBM traffic). Default HIGH matmul precision
    (bf16_3x, ~1e-5 absolute): the default f32 matmul on TPU runs one bf16
    pass (~4e-3 absolute error) — too much of the 1e-2 budget for the
    pipeline-endpoint resamplers — while HIGHEST (bf16_6x) doubles the cost
    for accuracy below other error sources. In-network call sites (which the
    reference runs under fp16 autocast) pass bf16 dtype + DEFAULT precision.

    Large resamplers (the pipeline-endpoint depth upsample: 518x924 ->
    1080x1920 and up) dispatch per axis to the banded-blocked form
    (_banded_plan): the 2/4-tap weight matrices are banded, so blocked
    factors cut the contraction length ~n_in/(block/scale+taps)x — ~7x
    fewer MXU FLOPs at 1080p, more at 4K. Small/in-network resizes (37x37
    pos-embed grids, refinenet x2s) stay dense.
    """
    compute = dtype or jnp.promote_types(x.dtype, jnp.float32)
    h_axis %= x.ndim
    w_axis %= x.ndim
    x = x.astype(compute)
    x = _apply_axis(x, np.ascontiguousarray(wh), h_axis, "o", compute, precision)
    x = _apply_axis(x, np.ascontiguousarray(ww), w_axis, "p", compute, precision)
    return x


def resize_area_cv2(x: jnp.ndarray, out_hw: Tuple[int, int],
                    h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """cv2.resize(..., interpolation=INTER_AREA) parity resize.

    Used for the depth-net input resize (reference dpt.py:213). Defaults to
    HWC layout (h_axis=-3, w_axis=-2).
    """
    h_in, w_in = x.shape[h_axis], x.shape[w_axis]
    h_out, w_out = out_hw
    upscale_any = h_out > h_in or w_out > w_in
    wh = area_or_linear_weights(h_in, h_out, upscale_any)
    ww = area_or_linear_weights(w_in, w_out, upscale_any)
    return _apply_separable(x, wh, ww, h_axis, w_axis)


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    align_corners: bool = True,
                    h_axis: int = -3, w_axis: int = -2,
                    dtype: Optional[jnp.dtype] = None,
                    precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear') parity resize."""
    h_in, w_in = x.shape[h_axis], x.shape[w_axis]
    wh = linear_weights(h_in, out_hw[0], align_corners=align_corners)
    ww = linear_weights(w_in, out_hw[1], align_corners=align_corners)
    return _apply_separable(x, wh, ww, h_axis, w_axis, dtype=dtype,
                            precision=precision)


def resize_bicubic(x: jnp.ndarray, out_hw: Tuple[int, int],
                   align_corners: bool = True,
                   scale_hw: Optional[Tuple[float, float]] = None,
                   h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """torch F.interpolate(mode='bicubic') parity resize.

    ``scale_hw`` reproduces torch's scale_factor mode (used by the DINOv2
    pos-embed interpolation, reference dinov2.py:199-205, where the output
    size is floor(in*scale) but source coordinates use the given scale).
    """
    h_in, w_in = x.shape[h_axis], x.shape[w_axis]
    sh = scale_hw[0] if scale_hw else None
    sw = scale_hw[1] if scale_hw else None
    wh = cubic_weights(h_in, out_hw[0], align_corners=align_corners, scale=sh)
    ww = cubic_weights(w_in, out_hw[1], align_corners=align_corners, scale=sw)
    return _apply_separable(x, wh, ww, h_axis, w_axis)


class ResizePlan:
    """Precomputed (wh, ww) pair for a fixed resize, reusable across frames."""

    def __init__(self, wh: np.ndarray, ww: np.ndarray, h_axis: int = -3,
                 w_axis: int = -2):
        self.wh, self.ww = wh, ww
        self.h_axis, self.w_axis = h_axis, w_axis

    def __call__(self, x: jnp.ndarray, dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
        return _apply_separable(x, self.wh, self.ww, self.h_axis, self.w_axis,
                                dtype=dtype)
