"""Stereo synthesis core: cutoff planes, forward warp, occlusion fill, SBS.

TPU-native rebuild of the reference's ``SbsProcessor``
(reference PredictAndGenerate.py:63-198). The reference materializes one
rolled image per plane and scatter-writes each plane through
``torch.nonzero`` fancy indexing (:150-155,:172-183) — data-dependent shapes
that cannot compile. Here the same semantics become a static-shape program:

  * the per-frame variable-length ``cutoff_list`` (:101-126) is built
    in-graph as a PADDED table of ``max_planes`` entries with a validity
    mask, so jit compiles one program per resolution;
  * the far->near plane loop with last-write-wins compositing becomes a
    ``lax.scan`` over planes that tracks, per output pixel, the offset of the
    nearest plane whose *source* pixel falls in the plane's depth band
    (scan touches only the 1-channel depth map);
  * the image is then touched exactly once by a single gather with the
    winning per-pixel offset — forward-warp semantics preserved, zero
    ``nonzero`` calls.

Quirk preserved on purpose: the reference zips ``cutoff_list`` against the
one-shorter ``step_list`` (:172), so the last table entry never becomes a
plane — its band is covered by the previous plane's +1.05*step overlap. The
hole-fill index (:190) and left-edge width (:196) still use the full list
exactly as the reference does.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vr_video_generator_tpu.ops.gaussian import gaussian_blur
from vr_video_generator_tpu.utils.config import StereoConfig


class PlaneTables(NamedTuple):
    """Padded per-frame plane tables (all shapes static in ``max_planes``)."""

    cutoffs: jnp.ndarray      # (P,) f32 depth thresholds
    steps: jnp.ndarray        # (P,) f32 cutoff[k+1]-cutoff[k]
    offsets: jnp.ndarray      # (P,) i32 per-plane pixel shifts
    plane_valid: jnp.ndarray  # (P,) bool — k < n_full-1 (zip truncation)
    fill_offset: jnp.ndarray  # () i32 offset of the int(n_full*3/5) plane
    edge_width: jnp.ndarray   # () i32 round(offsets[n_full-2]*2/3) columns
    offset_range: jnp.ndarray  # (2,) f32 smoothed (r0, r1) — next-frame EWMA state


def build_plane_tables(depth: jnp.ndarray, offset_range: jnp.ndarray,
                       cfg: StereoConfig, height: int,
                       max_planes: int) -> PlaneTables:
    """In-graph equivalent of ``SbsProcessor.get_cutoff``
    (reference PredictAndGenerate.py:101-126).

    ``offset_range`` is the already-EWMA-smoothed (r0, r1) for this frame
    (the 50/50 blend with the previous frame happens in the temporal scan).
    Python's round() is round-half-to-even, as is jnp.round — parity holds.
    """
    step = cfg.offset_step_size
    ls = jnp.ceil(jnp.max(depth))
    r0, r1 = offset_range[0], offset_range[1]
    round_r0 = jnp.round(r0)
    round_r1 = jnp.round(r1)

    # len(range(round(r0), 0, step)) and len(range(1, round(r1), step))
    n_neg = jnp.maximum(0, jnp.ceil(-round_r0 / step)).astype(jnp.int32)
    n_pos = jnp.maximum(0, jnp.ceil((round_r1 - 1) / step)).astype(jnp.int32)
    n_full = n_neg + n_pos + 2

    k = jnp.arange(max_planes, dtype=jnp.int32)
    i_k = jnp.where(
        k < n_neg, round_r0 + k * step,
        jnp.where(k == n_neg, 0.0, 1.0 + (k - n_neg - 1) * step))
    denom = 1e-5 + r1 - r0
    cutoffs = (i_k - r0) / denom * (1e-5 + ls)
    cutoffs = jnp.where(k == n_full - 1, ls, cutoffs)
    cutoffs = jnp.where(k == 0, 0.0, cutoffs)
    # Padding beyond n_full: +inf so steps/bands there can never match.
    cutoffs = jnp.where(k < n_full, cutoffs, jnp.inf)

    steps = jnp.diff(cutoffs, append=jnp.inf)
    offsets = jnp.round(
        cutoffs / (1e-5 + ls) * denom + r0).astype(jnp.int32)
    offsets = jnp.where(k < n_full, offsets, 0)
    plane_valid = k < n_full - 1

    fill_idx = (n_full * 3) // 5
    fill_offset = offsets[fill_idx]
    edge_width = jnp.round(offsets[n_full - 2] / 3.0 * 2.0).astype(jnp.int32)

    return PlaneTables(cutoffs=cutoffs, steps=steps, offsets=offsets,
                       plane_valid=plane_valid, fill_offset=fill_offset,
                       edge_width=edge_width,
                       offset_range=jnp.stack([r0, r1]))


def select_warp_offsets(depth: jnp.ndarray,
                        tables: PlaneTables) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-pixel winning plane offset + coverage mask.

    Scan over planes far->near (ascending cutoff, reference :172-183): plane k
    claims output pixel (y, x) when the source pixel (y, x-off_k) has depth in
    [thr-0.05*step, thr+1.05*step); later (nearer) planes overwrite. Holes
    default to the 3/5-plane fill offset (reference :190).
    Returns (sel_off (H, W) i32, covered (H, W) bool).
    """
    h, w = depth.shape

    def body(carry, plane):
        sel_off, covered = carry
        thr, stp, off, valid = plane
        d_src = jnp.roll(depth, off, axis=1)
        m = (d_src >= thr - 0.05 * stp) & (d_src < thr + 1.05 * stp) & valid
        return (jnp.where(m, off, sel_off), covered | m), None

    init = (jnp.full((h, w), tables.fill_offset, jnp.int32),
            jnp.zeros((h, w), jnp.bool_))
    (sel_off, covered), _ = jax.lax.scan(
        body, init,
        (tables.cutoffs, tables.steps, tables.offsets, tables.plane_valid))
    return sel_off, covered


def warp_frame(img_u8: jnp.ndarray, depth: jnp.ndarray, tables: PlaneTables,
               kernel_size: int, sigma: float) -> jnp.ndarray:
    """One frame: (H, W, 3) uint8 RGB + smoothed depth -> (H, 2W, 3) SBS.

    Mirrors ``left_side_sbs`` (reference :157-198): plane compositing,
    3/5-plane hole fill, Gaussian smoothing of filled pixels, left-edge copy
    from the original, [synth-left | original-right] concat.
    """
    h, w, _ = img_u8.shape
    sel_off, covered = select_warp_offsets(depth, tables)

    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    src_cols = jnp.remainder(cols - sel_off, w)
    composite = jnp.take_along_axis(img_u8, src_cols[..., None], axis=1)

    kx, ky = kernel_size * 2 + 3, kernel_size * 2 + 1
    blurred = jnp.clip(jnp.round(gaussian_blur(composite, (kx, ky), sigma)),
                       0, 255).astype(jnp.uint8)
    result = jnp.where(covered[..., None], composite, blurred)

    edge = cols < tables.edge_width
    result = jnp.where(edge[..., None], img_u8, result)
    return jnp.concatenate([result, img_u8], axis=1)


@dataclasses.dataclass(frozen=True)
class WarpSpec:
    """Static warp parameters for a fixed frame geometry."""

    height: int
    width: int
    cfg: StereoConfig
    max_planes: int
    kernel_size: int

    @staticmethod
    def create(height: int, width: int, cfg: StereoConfig) -> "WarpSpec":
        cfg = cfg.normalized()
        # reference :165 — round(0.0036*H), python round-half-even
        ks = int(np.round(0.0036 * height))
        return WarpSpec(height=height, width=width, cfg=cfg,
                        max_planes=cfg.max_planes(height), kernel_size=ks)

    def initial_offset_range(self) -> jnp.ndarray:
        return jnp.zeros((2,), jnp.float32)

    def frame_offset_range(self, depth: jnp.ndarray) -> jnp.ndarray:
        """Raw (un-EWMA'd) offset range of one frame (reference :102-104)."""
        ls = jnp.ceil(jnp.max(depth))
        return jnp.stack([self.cfg.offset_bg * self.height * ls / 14.0,
                          self.cfg.offset_fg * self.height * ls / 14.0])

    def warp(self, img_u8: jnp.ndarray, depth: jnp.ndarray,
             offset_range: jnp.ndarray) -> jnp.ndarray:
        tables = build_plane_tables(depth, offset_range, self.cfg, self.height,
                                    self.max_planes)
        return warp_frame(img_u8, depth, tables, self.kernel_size,
                          self.cfg.sigma)
