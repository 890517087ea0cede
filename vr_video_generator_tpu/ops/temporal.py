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

    @staticmethod
    def initial(height: int, width: int) -> "TemporalState":
        # Distinct buffers: the pipeline donates the state, and donating one
        # buffer through two leaves is an error.
        return TemporalState(d_prev1=jnp.zeros((height, width), jnp.float32),
                             d_prev2=jnp.zeros((height, width), jnp.float32),
                             offset_range=jnp.zeros((2,), jnp.float32),
                             has_state=jnp.asarray(False))


def temporal_scan(raw_depths: jnp.ndarray, state: TemporalState,
                  spec: WarpSpec) -> Tuple[jnp.ndarray, jnp.ndarray, TemporalState]:
    """(B, H, W) raw depths -> (smoothed depths, per-frame offset ranges, state').

    Per frame (reference get_depth :131-145 + get_cutoff :102-108):
      blended_t = w0*raw_t + w1*raw_{t-1} + w2*raw_{t-2}   (history = RAW maps)
      r_t = 0.5*(r_{t-1} + range(ceil(blended_t.max())))    (r_0 un-averaged)
    """
    w0, w1, w2 = spec.cfg.dampening_weights

    def body(carry: TemporalState, d_raw):
        d1 = jnp.where(carry.has_state, carry.d_prev1, d_raw)
        d2 = jnp.where(carry.has_state, carry.d_prev2, d_raw)
        blended = w0 * d_raw + w1 * d1 + w2 * d2
        r_raw = spec.frame_offset_range(blended)
        r = jnp.where(carry.has_state,
                      0.5 * (carry.offset_range + r_raw), r_raw)
        # Derive from the carried flag (not a fresh constant) so the varying
        # manual-axes type is preserved under shard_map.
        new = TemporalState(d_prev1=d_raw, d_prev2=d1, offset_range=r,
                            has_state=carry.has_state | True)
        return new, (blended, r)

    state, (blended, ranges) = jax.lax.scan(body, state, raw_depths)
    return blended, ranges, state
