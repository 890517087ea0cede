"""Temporal depth state: EWMA depth dampening + offset-range smoothing.

The reference keeps per-worker Python state: the last 2 *raw* depth maps,
blended 0.58/0.30/0.12 into each frame (reference PredictAndGenerate.py:
71-80,131-145), and a 50/50 EWMA of the disparity range across frames
(:105-108). Both are frame-sequential, so inside a batch they become a
``lax.scan`` carry; across batches the carry is returned to the caller
(fixing nothing — state resets at segment boundaries exactly like the
reference — but making halo handoff possible for multi-host sharding).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vr_video_generator_tpu.ops.warp import WarpSpec


class TemporalState(NamedTuple):
    """Scan carry across frames."""

    d_prev1: jnp.ndarray       # (H, W) raw depth of frame t-1
    d_prev2: jnp.ndarray       # (H, W) raw depth of frame t-2
    offset_range: jnp.ndarray  # (2,) smoothed (r0, r1)
    has_state: jnp.ndarray     # () bool — False only before the first frame
    overflow: jnp.ndarray      # () i32 — frames whose scaled depth exceeded
    #                              StereoConfig.limit_step_cap (clamped, counted)
    anchor_prev: jnp.ndarray = None  # (H, W) raw depth of the last stride
    #                              anchor (None unless depth_stride > 1)

    @staticmethod
    def initial(height: int, width: int,
                depth_stride: int = 1) -> "TemporalState":
        # Distinct buffers: the pipeline donates the state, and donating one
        # buffer through two leaves is an error.
        return TemporalState(d_prev1=jnp.zeros((height, width), jnp.float32),
                             d_prev2=jnp.zeros((height, width), jnp.float32),
                             offset_range=jnp.zeros((2,), jnp.float32),
                             has_state=jnp.asarray(False),
                             overflow=jnp.zeros((), jnp.int32),
                             anchor_prev=(jnp.zeros((height, width),
                                                    jnp.float32)
                                          if depth_stride > 1 else None))


def temporal_scan(raw_depths: jnp.ndarray, state: TemporalState,
                  spec: WarpSpec, n_valid=None,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, TemporalState]:
    """(B, H, W) raw depths -> (smoothed depths, per-frame offset ranges, state').

    ``n_valid`` (optional scalar): number of leading frames that are real;
    the host runtimes pad short batches by repeating the last frame for
    static shapes, and those copies must not inflate the overflow tally.
    None counts every frame (callers that never pad).

    Per frame (reference get_depth :131-145 + get_cutoff :102-108):
      blended_t = w0*raw_t + w1*raw_{t-1} + w2*raw_{t-2}   (history = RAW maps)
      r_t = 0.5*(r_{t-1} + range(ceil(blended_t.max())))    (r_0 un-averaged)

    The depth blend is a 3-tap convolution along time over RAW maps — fully
    parallel over the batch; only the offset-range EWMA is sequential, and
    that is a lax.scan over per-frame (2,) scalars. (A naive scan over full
    depth maps costs ~30ms/batch of pure carry traffic.)
    """
    w0, w1, w2 = spec.cfg.dampening_weights

    # Depth-cap guard: the static plane tables are sized for scaled depth
    # <= limit_step_cap (WarpSpec.create / StereoConfig.max_planes). The
    # reference's cutoff_list is unbounded (reference :101-118); an
    # off-family checkpoint could exceed the cap, which would otherwise
    # clamp-index the padded tables OOB and silently drop planes. Saturate
    # the depth at the cap (graceful: far planes merge) and count affected
    # frames so the host runtime can surface the overflow.
    cap = jnp.float32(spec.cfg.limit_step_cap)
    over_f = jnp.any(raw_depths > cap, axis=(1, 2))  # (B,)
    if n_valid is not None:
        over_f = over_f & (jnp.arange(over_f.shape[0]) < n_valid)
    over = jnp.sum(over_f).astype(jnp.int32)
    raw_depths = jnp.minimum(raw_depths, cap)

    d1 = jnp.where(state.has_state, state.d_prev1, raw_depths[0])
    d2 = jnp.where(state.has_state, state.d_prev2, raw_depths[0])
    ext = jnp.concatenate([d2[None], d1[None], raw_depths], axis=0)
    blended = w0 * ext[2:] + w1 * ext[1:-1] + w2 * ext[:-2]

    # Per-frame raw ranges (vectorized), then the sequential 50/50 EWMA.
    ls = jnp.ceil(jnp.max(blended, axis=(1, 2)))  # (B,)
    scale = jnp.asarray([spec.cfg.offset_bg * spec.height / 14.0,
                         spec.cfg.offset_fg * spec.height / 14.0], jnp.float32)
    r_raw = ls[:, None] * scale[None, :]  # (B, 2)

    def body(carry, r_t):
        r_prev, has = carry
        r = jnp.where(has, 0.5 * (r_prev + r_t), r_t)
        # Derive from the carried flag (not a fresh constant) so the varying
        # manual-axes type is preserved under shard_map.
        return (r, has | True), r

    (r_last, _), ranges = jax.lax.scan(
        body, (state.offset_range, state.has_state), r_raw)

    new_state = TemporalState(d_prev1=ext[-1], d_prev2=ext[-2],
                              offset_range=r_last,
                              has_state=state.has_state | True,
                              overflow=state.overflow + over,
                              # passed through unchanged so the state pytree
                              # is stable; stride_interpolate callers
                              # _replace it with the fresh anchor afterwards
                              anchor_prev=state.anchor_prev)
    return blended, ranges, new_state


def stride_audit_stats(true_depths: jnp.ndarray, state: TemporalState,
                       stride: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W) TRUE raw depths -> (rms, max) scalar interpolation error.

    The fidelity half of the depth-stride trade, measured in-graph: what the
    stride path would have interpolated for this batch (anchors = the true
    depth of every ``stride``-th frame + the carried ``state.anchor_prev``)
    minus the true depth, reduced over the batch's NON-anchor frames (anchor
    frames are exact by construction). Units: scaled raw depth. Consumed by
    the sampled production audit (RunConfig.stride_audit_every)."""
    interp, _ = stride_interpolate(true_depths[stride - 1::stride], state,
                                   stride)
    err = interp - true_depths
    nonanchor = (jnp.arange(err.shape[0]) % stride) != (stride - 1)
    sq = jnp.mean(err * err, axis=(1, 2))  # (B,)
    rms = jnp.sqrt(jnp.sum(jnp.where(nonanchor, sq, 0.0))
                   / jnp.maximum(jnp.sum(nonanchor), 1))
    mx = jnp.max(jnp.where(nonanchor[:, None, None], jnp.abs(err), 0.0))
    return rms, mx


def stride_interpolate(anchors: jnp.ndarray, state: TemporalState,
                       stride: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-stride expansion: (G, H, W) anchor depths -> (G*stride, H, W).

    The depth net runs only on every ``stride``-th frame (the LAST frame of
    each stride group, so no cross-batch lookahead is ever needed); the
    frames in between get a linear interpolation between the surrounding
    anchors. Group g's frame j in [0, stride) receives

        lerp(anchor_{g-1}, anchor_g, (j+1)/stride)

    where anchor_{-1} is the carried ``state.anchor_prev`` (cold start: the
    first anchor itself, i.e. group 0 holds anchor_0 — the same
    copies-are-a-fixed-point convention as the temporal EWMA cold start).
    Anchor frames (j == stride-1, weight exactly 1.0) receive their true
    depth bit-for-bit.

    This is a deliberate, opt-in capability the reference does not have: its
    per-frame architecture recomputes depth for every frame
    (reference PredictAndGenerate.py:218-231). Video depth is temporally
    smooth — the reference itself blends 3 consecutive raw maps
    (:137-142) — so anchored interpolation trades bounded depth lag for a
    near-``stride``x cut of the dominant pipeline cost. Default off
    (RunConfig.depth_stride = 1) keeps reference parity.

    Returns (interpolated raw depths, last anchor for the next carry).
    """
    g = anchors.shape[0]
    prev0 = jnp.where(state.has_state, state.anchor_prev, anchors[0])
    prev = jnp.concatenate([prev0[None], anchors[:-1]], axis=0)
    w = jnp.arange(1, stride + 1, dtype=jnp.float32) / stride  # (s,)
    w = w[None, :, None, None]
    depths = prev[:, None] * (1.0 - w) + anchors[:, None] * w
    return depths.reshape(g * stride, *anchors.shape[1:]), anchors[-1]
