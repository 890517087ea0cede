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
    # Saturate at the static sizing bounds: `max_planes` and the shift tables
    # are sized for ceil(depth.max()) <= limit_step_cap (max_planes()), so a
    # caller handing in over-cap depth or an oversized offset_range must not
    # push n_full past the padded axis (the reads at fill_idx / n_full-2
    # below would clamp-index silently). The pipeline already clamps depth in
    # temporal_scan; this keeps direct callers safe too.
    cap = float(cfg.limit_step_cap)
    ls = jnp.minimum(jnp.ceil(jnp.max(depth)), cap)
    r0 = jnp.maximum(offset_range[0], cfg.offset_bg * height * cap / 14.0)
    r1 = jnp.minimum(offset_range[1], cfg.offset_fg * height * cap / 14.0)
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


class ShiftTables(NamedTuple):
    """Plane tables re-indexed by pixel shift.

    Plane offsets are round() of an affine map of the plane index
    (reference :120-123), hence monotone non-decreasing integers in the
    statically-bounded range [-s_neg, s_pos]. Re-indexing by shift turns the
    per-plane loop into an unrolled loop over STATIC shifts — every roll
    compiles to a pair of static slices, and ascending shift order equals
    ascending plane order, preserving the reference's last-write-wins
    compositing. Adjacent planes that round to the same offset merge into
    one interval [min lo, max hi), which is semantics-preserving because
    their bands are contiguous and they share the same output offset.
    """

    lo: jnp.ndarray      # (S,) f32 band lower bounds (thr - 0.05*step)
    hi: jnp.ndarray      # (S,) f32 band upper bounds (thr + 1.05*step)
    valid: jnp.ndarray   # (S,) bool — some plane maps to this shift
    fill_offset: jnp.ndarray
    edge_width: jnp.ndarray


def build_shift_tables(tables: PlaneTables, s_neg: int, s_pos: int) -> ShiftTables:
    """Re-index the padded plane tables by shift.

    Dense (S, P) one-hot reduction instead of scatter: TPU lowers scatters
    to serialized updates (~100ms/batch measured), while a masked min/max
    over a 67x68 matrix is one trivial fusion.
    """
    size = s_neg + s_pos + 1
    lo_k = tables.cutoffs - 0.05 * tables.steps
    hi_k = tables.cutoffs + 1.05 * tables.steps
    shifts = jnp.arange(-s_neg, s_pos + 1, dtype=jnp.int32)
    hit = (tables.offsets[None, :] == shifts[:, None]) & tables.plane_valid[None, :]
    lo = jnp.min(jnp.where(hit, lo_k[None, :], jnp.inf), axis=1)
    hi = jnp.max(jnp.where(hit, hi_k[None, :], -jnp.inf), axis=1)
    valid = jnp.any(hit, axis=1)
    return ShiftTables(lo=lo, hi=hi, valid=valid,
                       fill_offset=tables.fill_offset,
                       edge_width=tables.edge_width)


def warp_composite_static(img_u8: jnp.ndarray, depth: jnp.ndarray,
                          st: ShiftTables, s_neg: int,
                          s_pos: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compositing via the unrolled static-shift loop.

    Per shift s (ascending = far->near): destination pixel x is claimed when
    depth[x-s] falls in the shift's band; the winning shift's color
    img[x-s] = roll(img, s)[x] is selected. Holes get roll(img, fill_offset)
    — that one roll is dynamic (per-frame fill offset).
    Returns (composite (H,W,3) uint8, covered (H,W) bool).
    """
    composite = jnp.roll(img_u8, st.fill_offset, axis=1)
    covered = jnp.zeros(depth.shape, jnp.bool_)
    for j, s in enumerate(range(-s_neg, s_pos + 1)):
        d_s = jnp.roll(depth, s, axis=1)
        m = st.valid[j] & (st.lo[j] <= d_s) & (d_s < st.hi[j])
        composite = jnp.where(m[..., None], jnp.roll(img_u8, s, axis=1),
                              composite)
        covered = covered | m
    return composite, covered


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
               kernel_size: int, sigma: float, impl: str = "xla",
               s_neg: int = 0, s_pos: int = 0) -> jnp.ndarray:
    """One frame: (H, W, 3) uint8 RGB + smoothed depth -> (H, 2W, 3) SBS.

    Mirrors ``left_side_sbs`` (reference :157-198): plane compositing,
    3/5-plane hole fill, Gaussian smoothing of filled pixels, left-edge copy
    from the original, [synth-left | original-right] concat.

    impl: 'xla' — unrolled static-shift compositing (default);
          'pallas' — fused VMEM-resident kernel (ops/warp_pallas.py);
          'scan' — lax.scan over planes with dynamic rolls + final gather
          (reference-shaped; kept as oracle/fallback).
    """
    h, w, _ = img_u8.shape
    if impl == "pallas":
        from vr_video_generator_tpu.ops.warp_pallas import warp_frame_pallas

        return warp_frame_pallas(img_u8, depth, tables, kernel_size, sigma,
                                 s_neg, s_pos)
    if impl == "scan":
        sel_off, covered = select_warp_offsets(depth, tables)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        src_cols = jnp.remainder(cols - sel_off, w)
        composite = jnp.take_along_axis(img_u8, src_cols[..., None], axis=1)
    else:
        st = build_shift_tables(tables, s_neg, s_pos)
        composite, covered = warp_composite_static(img_u8, depth, st,
                                                   s_neg, s_pos)

    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
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
    s_neg: int = 0         # static bound on background (negative) shifts
    s_pos: int = 0         # static bound on foreground (positive) shifts
    impl: str = "xla"

    @staticmethod
    def create(height: int, width: int, cfg: StereoConfig,
               impl: str = "xla") -> "WarpSpec":
        cfg = cfg.normalized()
        # reference :165 — round(0.0036*H), python round-half-even
        ks = int(np.round(0.0036 * height))
        step = max(cfg.offset_step_size, 1)
        s_neg = int(np.ceil(-cfg.offset_bg * height * cfg.limit_step_cap / 14.0 / step) * step) + 1
        s_pos = int(np.ceil(cfg.offset_fg * height * cfg.limit_step_cap / 14.0 / step) * step) + 1
        if impl == "auto":
            # Pallas on TPU: the fused kernel keeps row blocks in VMEM across
            # all shifts; the unrolled XLA loop's independent rolled copies
            # give the scheduler license to balloon HBM pressure.
            import jax

            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        return WarpSpec(height=height, width=width, cfg=cfg,
                        max_planes=cfg.max_planes(height), kernel_size=ks,
                        s_neg=s_neg, s_pos=s_pos, impl=impl)

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
                          self.cfg.sigma, impl=self.impl,
                          s_neg=self.s_neg, s_pos=self.s_pos)

    def warp_batch(self, imgs_u8: jnp.ndarray, depths: jnp.ndarray,
                   offset_ranges: jnp.ndarray, emit: str = "u8",
                   interpret: bool = False) -> jnp.ndarray:
        """Batched warp: the pallas impl fuses compositing AND the Gaussian
        hole smoothing into two kernels over the whole batch (the blur
        kernel owns the batch grid, so it cannot sit under vmap); other
        impls vmap the per-frame path. ``emit="packed"`` (pallas only)
        returns (B, H, 2W) packed uint32 SBS instead of uint8 HWC."""
        if self.impl == "pallas":
            from vr_video_generator_tpu.ops.warp_pallas import warp_batch_pallas

            return warp_batch_pallas(imgs_u8, depths, offset_ranges, self.cfg,
                                     self.height, self.max_planes,
                                     self.kernel_size, self.cfg.sigma,
                                     self.s_neg, self.s_pos, emit=emit,
                                     interpret=interpret)
        if emit == "packed":
            raise ValueError("packed SBS output requires the pallas warp")
        return jax.vmap(self.warp)(imgs_u8, depths, offset_ranges)
