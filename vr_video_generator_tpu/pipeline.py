"""The fused per-batch SBS pipeline — one jitted program per video geometry.

Replaces the reference's entire process fleet (GPU inference workers +
segment workers + Queue plumbing, reference PredictAndGenerate.py:23-61,
200-321) with a single compiled step over a batch of frames:

    uint8 RGB frames (B, H, W, 3)
      -> preprocess (device: /255, INTER_AREA resize, ImageNet normalize)
      -> DINOv2+DPT depth forward (bf16, MXU)
      -> bicubic upsample to source resolution x encoder scaler
      -> lax.scan temporal EWMA (depth dampening + offset-range smoothing)
      -> padded cutoff-plane tables + forward warp + hole fill (vmapped)
      -> SBS concat -> uint8 (B, H, 2W, 3)

The temporal carry (TemporalState) crosses batch boundaries, so a segment
processed in B-frame batches is bit-identical to one long scan — unlike the
reference, whose smoothing state silently resets every segment (SURVEY.md §5);
per-segment reset remains available by reinitializing the state.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2, infer_depth
from vr_video_generator_tpu.models.factory import load_model
from vr_video_generator_tpu.ops.temporal import (
    TemporalState,
    stride_audit_stats,
    stride_interpolate,
    temporal_scan,
)
from vr_video_generator_tpu.ops.warp import WarpSpec
from vr_video_generator_tpu.utils.config import RunConfig


class SbsPipeline:
    """Single-device pipeline for a fixed (height, width) video geometry."""

    def __init__(self, model: DepthAnythingV2, params, height: int, width: int,
                 run_cfg: Optional[RunConfig] = None):
        self.run_cfg = run_cfg or RunConfig(encoder=model.cfg.encoder)
        self.model = model
        self.params = params
        self.height, self.width = height, width
        self.spec = WarpSpec.create(height, width, self.run_cfg.stereo(),
                                    impl=self.run_cfg.warp_impl)
        self.sbs_emit = _resolve_sbs_emit(self.run_cfg)
        self.preprocess_impl = _resolve_preprocess(self.run_cfg, model)
        _check_depth_stride(self.run_cfg)
        self._step = jax.jit(self._step_impl, donate_argnums=(2,))

    @classmethod
    def create(cls, run_cfg: RunConfig, height: int, width: int,
               allow_random: bool = False, dtype=None) -> "SbsPipeline":
        if dtype is None:
            dtype = jnp.bfloat16 if run_cfg.compute_dtype == "bfloat16" else jnp.float32
        model, params = load_model(run_cfg.encoder, run_cfg.encoder_path,
                                   dtype=dtype, allow_random=allow_random,
                                   gelu=run_cfg.gelu,
                                   mlp_fused=run_cfg.mlp_fused,
                                   tail=run_cfg.tail)
        return cls(model, params, height, width, run_cfg=run_cfg)

    def initial_state(self) -> TemporalState:
        return TemporalState.initial(self.height, self.width,
                                     depth_stride=self.run_cfg.depth_stride)

    def _step_impl(self, params, frames_u8: jnp.ndarray,
                   state: TemporalState, n_valid=None,
                   ) -> Tuple[jnp.ndarray, TemporalState]:
        s = self.run_cfg.depth_stride
        if s > 1:
            if frames_u8.shape[0] % s:
                raise ValueError(f"batch {frames_u8.shape[0]} not divisible "
                                 f"by depth_stride {s}")
            # Depth net on every s-th frame only (group-end anchors), raw
            # depth lerped in between — see ops/temporal.stride_interpolate.
            depth_a = infer_depth(self.model, params, frames_u8[s - 1::s],
                                  input_size=self.run_cfg.input_size,
                                  preprocess=self.preprocess_impl)
            depth, anchor_last = stride_interpolate(depth_a, state, s)
        else:
            depth = infer_depth(self.model, params, frames_u8,
                                input_size=self.run_cfg.input_size,
                                preprocess=self.preprocess_impl)
        blended, ranges, state = temporal_scan(depth, state, self.spec,
                                               n_valid=n_valid)
        if s > 1:
            state = state._replace(anchor_prev=anchor_last)
        sbs = self.spec.warp_batch(frames_u8, blended, ranges,
                                   emit=self.sbs_emit)
        return sbs, state

    def step(self, frames_u8, state: TemporalState,
             n_valid: Optional[int] = None) -> Tuple[jnp.ndarray, TemporalState]:
        """Process one batch; returns (SBS frames, carried state) — uint8
        (B, H, 2W, 3) or, when ``sbs_emit == 'packed'``, packed uint32
        (B, H, 2W) for host-side rgb24 unpacking (native.unpack_sbs).

        ``n_valid``: how many leading frames are real (the rest are host
        padding copies); only those count toward the overflow diagnostic.
        Traced, so distinct values share one compilation."""
        return self._step(self.params, jnp.asarray(frames_u8), state, n_valid)

    @functools.cached_property
    def _step_many(self):
        def impl(params, frames_u8, state):
            # UNROLLED, not lax.scan: a scanned body must stack its k SBS
            # outputs into one ys buffer, and on TPU that stacking is
            # pathological either way — the natural 5D u8 ys draws a
            # T(8,128) trailing-3 tiled layout (42x HBM inflation, 68 GB
            # alloc = OOM at 1080p k=4), and a flattened (B, H*2W*3) ys
            # costs a ~2.2 ms/frame u8 relayout per iteration (measured:
            # checksum-only scan 2.76 ms/frame vs flat-ys scan 5.00).
            # Unrolling emits k separate outputs in the per-batch output
            # form XLA already handles well: 2.96 ms/frame at k=4 vs 3.55
            # per-batch dispatch (2026-08-20 on-chip A/B).
            outs = []
            for i in range(frames_u8.shape[0]):
                sbs, state = self._step_impl(params, frames_u8[i], state)
                outs.append(sbs)
            return tuple(outs), state

        return jax.jit(impl, donate_argnums=(2,))

    def step_many(self, frames_u8, state: TemporalState):
        """Chunked superstep: process k FULL batches in one dispatch.

        ``frames_u8``: (k, B, H, W, 3) uint8 — k whole batches; returns
        (tuple of k SBS arrays (B, H, 2W, 3), carried state), bit-identical
        to k sequential step() calls (the unrolled body threads
        TemporalState exactly as the host loop would).

        Why: one dispatch instead of k amortizes per-dispatch host cost —
        the dev relay's ~28 ms/call floor, and the ~KB/dispatch native RSS
        leak in this jax runtime (see RunConfig.chunk_batches). Short or
        audit-probed batches must use step()/step_audited() — this program
        takes no n_valid (every frame is real by contract).
        """
        fr = jnp.asarray(frames_u8)
        if fr.ndim != 5:
            raise ValueError(f"step_many expects (k, B, H, W, 3) uint8, "
                             f"got shape {fr.shape}")
        return self._step_many(self.params, fr, state)

    def primed_state(self, warm_frames, batch_size: int,
                     min_batches: int = 0) -> TemporalState:
        """Prime the temporal state on frames [begin-W, begin) so a segment
        start continues the full-video sequence instead of resetting.

        The reference resets its smoothing state at every segment boundary
        (reference PredictAndGenerate.py:131-145 — per-worker state), a known
        discontinuity (SURVEY.md §5). Feeding the preceding frames through
        the normal step and discarding the SBS output removes it.

        Exactness of batching at depth_stride == 1: copies of the first fed
        frame are a fixed point of the state — the cold start sets
        d1 = d2 = raw[0] (ops/temporal.py), and the 50/50 offset-range EWMA
        is idempotent on equal values — so front-padding the window to whole
        batches is exact, and no second compiled program is needed.

        ``min_batches`` pins the number of fed batches regardless of window
        length. With depth_stride > 1 the front pads are NOT a fixed point
        (they prime the anchor carry), so the pad count is part of the
        defined warm-up trajectory: the runtimes pass
        ceil(warmup_frames/batch) so a segment whose begin is shorter than
        the warm-up window (begin < warmup) primes identically whether it is
        dispatched single-chip or as a sharded slot
        (runtime/sharded_runner._primed_states uses the same fixed k across
        slots — the SPMD trip count must be globally uniform anyway).
        """
        import numpy as np

        state = self.initial_state()
        warm = np.asarray(warm_frames)
        n = warm.shape[0]
        if n == 0:
            return state
        k = max(-(-n // batch_size), min_batches)
        pad = k * batch_size - n
        if pad:
            warm = np.concatenate([np.repeat(warm[:1], pad, axis=0), warm])
        for i in range(k):
            _, state = self.step(warm[i * batch_size:(i + 1) * batch_size],
                                 state)
        # warm-up frames should not count toward the segment's overflow tally
        return state._replace(overflow=state.overflow * 0)

    @functools.cached_property
    def _step_audited(self):
        return jax.jit(self._step_audited_impl, donate_argnums=(2,))

    def _step_audited_impl(self, params, frames_u8: jnp.ndarray,
                           state: TemporalState, n_valid=None):
        """Full per-frame depth step THAT ALSO reports the stride error.

        The adaptive-stride fallback program (depth_stride > 1 only): depth
        runs on every frame (full fidelity — this is what the stride mode
        falls back to), the lerp-vs-true stats say what the stride path
        WOULD have erred on this batch given the carried anchor (the probe
        and re-raise signal, priced at one cheap subtraction since the full
        depth is computed anyway), and ``anchor_prev`` is maintained on the
        absolute grid (batch % stride == 0, so the batch's last frame IS an
        anchor position) — re-raising the stride later is seamless.
        """
        s = self.run_cfg.depth_stride
        true = infer_depth(self.model, params, frames_u8,
                           input_size=self.run_cfg.input_size,
                           preprocess=self.preprocess_impl)
        rms, mx = stride_audit_stats(true, state, s)  # pre-step anchor carry
        blended, ranges, state = temporal_scan(true, state, self.spec,
                                               n_valid=n_valid)
        # unclamped raw, exactly like stride_interpolate's anchors[-1]
        state = state._replace(anchor_prev=true[-1])
        sbs = self.spec.warp_batch(frames_u8, blended, ranges,
                                   emit=self.sbs_emit)
        return sbs, state, rms, mx

    def step_audited(self, frames_u8, state: TemporalState,
                     n_valid: Optional[int] = None):
        """(sbs, state', stride_rms, stride_max) — full-depth batch for the
        adaptive-stride runtime (see RunConfig.stride_max_rms). Donates
        ``state`` like step()."""
        if self.run_cfg.depth_stride < 2:
            raise ValueError("step_audited requires depth_stride > 1")
        sbs, state, rms, mx = self._step_audited(
            self.params, jnp.asarray(frames_u8), state, n_valid)
        return sbs, state, float(rms), float(mx)

    @functools.cached_property
    def _stride_audit_fn(self):
        s = self.run_cfg.depth_stride

        def impl(params, frames_u8, state):
            true = infer_depth(self.model, params, frames_u8,
                               input_size=self.run_cfg.input_size,
                               preprocess=self.preprocess_impl)
            return stride_audit_stats(true, state, s)

        return jax.jit(impl)

    def stride_audit(self, frames_u8, state: TemporalState) -> Tuple[float, float]:
        """Sampled depth-stride fidelity check: run the depth net on EVERY
        frame of this batch and compare against what the stride path would
        interpolate from the batch's anchors + the carried ``anchor_prev``.
        Returns (rms, max) absolute error in scaled raw-depth units over the
        non-anchor frames. Read-only; call BEFORE step() on the same batch
        and state (step donates the state). See RunConfig.stride_audit_every
        for the production sampling hook (runtime/segment.py)."""
        if self.run_cfg.depth_stride < 2:
            raise ValueError("stride_audit requires depth_stride > 1")
        rms, mx = self._stride_audit_fn(self.params, jnp.asarray(frames_u8),
                                        state)
        return float(rms), float(mx)

    @functools.cached_property
    def _depth_fn(self):
        # Same preprocess variant as step() — on TPU bf16 that is the folded
        # path, so debug depth maps match what the pipeline actually warps.
        return jax.jit(functools.partial(infer_depth, self.model,
                                         input_size=self.run_cfg.input_size,
                                         preprocess=self.preprocess_impl))

    def depth_only(self, frames_u8) -> jnp.ndarray:
        """Depth maps at source resolution (scaled) — debugging/benchmarks."""
        return self._depth_fn(self.params, jnp.asarray(frames_u8))


def _check_depth_stride(run_cfg: RunConfig) -> None:
    s = run_cfg.depth_stride
    if s < 1:
        raise ValueError(f"depth_stride must be >= 1, got {s}")
    if run_cfg.chunk_batches < 1:
        raise ValueError(f"chunk_batches must be >= 1, "
                         f"got {run_cfg.chunk_batches}")
    if s > 1 and run_cfg.batch_size % s:
        raise ValueError(
            f"depth_stride={s} must divide batch_size={run_cfg.batch_size} "
            "(each device batch is split into whole anchor groups)")


def _resolve_sbs_emit(run_cfg: RunConfig) -> str:
    emit = run_cfg.sbs_output
    if emit == "auto":
        emit = "u8"  # packed is opt-in: device win ~0.02 ms/frame, D2H +33%
    return emit


def _resolve_preprocess(run_cfg: RunConfig, model: DepthAnythingV2) -> str:
    pre = run_cfg.preprocess
    if pre == "auto":
        pre = ("folded" if (jax.default_backend() == "tpu"
                            and model.dtype == jnp.bfloat16) else "exact")
    return pre
