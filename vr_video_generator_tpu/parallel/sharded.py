"""Mesh-sharded SBS pipeline: DP over temporal segments + TP in the depth net.

Structure (SURVEY.md §2c — the TPU-native replacement table):

  * depth inference is embarrassingly parallel over frames -> the flattened
    (n_data*B) frame batch is sharded over ``data`` while the ViT's
    attention/MLP weights are sharded over ``model`` (parallel/sharding.py);
    XLA inserts all collectives;
  * temporal smoothing is frame-sequential *within* a segment -> a
    ``shard_map`` over ``data`` runs one lax.scan per segment shard, each
    with its own TemporalState (exactly the reference's per-worker state,
    reference PredictAndGenerate.py:71-80, minus the Queue plumbing);
  * the warp is per-frame independent -> batch-sharded vmap.

Each ``data`` slot therefore owns a contiguous temporal slice of the video,
like one reference segment worker; the host runtime feeds slices and carries
states between batches.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2, infer_depth
from vr_video_generator_tpu.ops.temporal import (
    TemporalState,
    stride_interpolate,
    temporal_scan,
)
from vr_video_generator_tpu.ops.warp import WarpSpec
from vr_video_generator_tpu.parallel.sharding import shard_params
from vr_video_generator_tpu.utils.config import RunConfig


def batched_initial_state(n_data: int, height: int, width: int,
                          depth_stride: int = 1) -> TemporalState:
    return TemporalState(
        d_prev1=jnp.zeros((n_data, height, width), jnp.float32),
        d_prev2=jnp.zeros((n_data, height, width), jnp.float32),
        offset_range=jnp.zeros((n_data, 2), jnp.float32),
        has_state=jnp.zeros((n_data,), jnp.bool_),
        overflow=jnp.zeros((n_data,), jnp.int32),
        anchor_prev=(jnp.zeros((n_data, height, width), jnp.float32)
                     if depth_stride > 1 else None))


class ShardedSbsPipeline:
    """Pipeline over a (data, model) mesh for a fixed video geometry.

    ``step`` consumes (n_data * batch, H, W, 3) uint8 frames — n_data
    contiguous temporal slices concatenated — plus a per-slice state stack.
    """

    def __init__(self, model: DepthAnythingV2, params, height: int, width: int,
                 mesh: Mesh, run_cfg: Optional[RunConfig] = None,
                 interpret: bool = False):
        # interpret: run pallas kernels in interpreter mode — lets the
        # multi-chip dryrun exercise the packed/pallas emit arm on a virtual
        # CPU mesh (never set in production).
        self._interpret = interpret
        self.run_cfg = run_cfg or RunConfig(encoder=model.cfg.encoder)
        self.model = model
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.height, self.width = height, width
        self.spec = WarpSpec.create(height, width, self.run_cfg.stereo(),
                                    impl=self.run_cfg.warp_impl)
        from vr_video_generator_tpu.pipeline import (_resolve_preprocess,
                                                     _resolve_sbs_emit)

        self.preprocess_impl = _resolve_preprocess(self.run_cfg, model)
        self.sbs_emit = _resolve_sbs_emit(self.run_cfg)
        self.params = shard_params(params, mesh)

        from vr_video_generator_tpu.pipeline import _check_depth_stride

        _check_depth_stride(self.run_cfg)
        self.depth_stride = self.run_cfg.depth_stride
        self._check_slot_ownership()
        data_sharding = NamedSharding(mesh, P("data"))
        state_shardings = jax.tree.map(
            lambda _: data_sharding,
            batched_initial_state(1, 1, 1, self.depth_stride))
        self._step = jax.jit(
            self._step_impl,
            in_shardings=(None, data_sharding, state_shardings,
                          data_sharding),
            out_shardings=(data_sharding, state_shardings),
            donate_argnums=(2,))

    @property
    def local_slots(self):
        """``data``-axis slots this process owns (all of them single-host)."""
        from vr_video_generator_tpu.parallel.multihost import local_data_slots

        return local_data_slots(self.mesh)

    def _check_slot_ownership(self) -> None:
        """Multi-host feeding is host-local by design (frames never cross
        hosts — step_local furnishes only this process's data shards), which
        requires every process to own n_data/process_count whole slots. A
        mesh violating that (e.g. data=1 over several hosts: one slot's
        devices span processes, so other hosts could never furnish their
        addressable shards; or uneven ownership) would deadlock or crash
        deep inside make_array_from_process_local_data — refuse it loudly
        at construction instead."""
        n_proc = jax.process_count()
        if n_proc == 1:
            return
        owned = len(self.local_slots)
        if self.n_data % n_proc or owned != self.n_data // n_proc:
            raise ValueError(
                f"mesh data axis ({self.n_data}) must split into whole "
                f"per-process slot groups across {n_proc} processes "
                f"(this process owns {owned}); pick a mesh whose data "
                "extent is a multiple of the process count — pure "
                "model-parallel multi-host (data smaller than the process "
                "count) is not supported by the host-local feeding design")

    def initial_state(self) -> TemporalState:
        # Created on-device under out_shardings (not device_put of a host
        # array) so every process of a multi-host mesh can build the global
        # state without holding non-addressable shards.
        sharding = jax.tree.map(
            lambda _: NamedSharding(self.mesh, P("data")),
            batched_initial_state(1, 1, 1, self.depth_stride))
        return jax.jit(
            functools.partial(batched_initial_state, self.n_data,
                              self.height, self.width,
                              depth_stride=self.depth_stride),
            out_shardings=sharding)()

    def _step_impl(self, params, frames_u8: jnp.ndarray,
                   states: TemporalState, n_valid=None,
                   ) -> Tuple[jnp.ndarray, TemporalState]:
        n, h, w, _ = frames_u8.shape
        d = self.n_data
        b = n // d
        s = self.depth_stride

        net_in = frames_u8
        if s > 1:
            if b % s:
                raise ValueError(f"per-slot batch {b} not divisible by "
                                 f"depth_stride {s}")
            # Every s-th frame of each slot's contiguous slice (group-end
            # anchors) — a static slice on the inner axis, so the data
            # sharding of the flattened batch is preserved.
            net_in = frames_u8.reshape(d, b, h, w, 3)[:, s - 1::s]
            net_in = jax.lax.with_sharding_constraint(
                net_in.reshape(d * (b // s), h, w, 3),
                NamedSharding(self.mesh, P("data")))

        depth = infer_depth(self.model, params, net_in,
                            input_size=self.run_cfg.input_size,
                            preprocess=self.preprocess_impl)
        depth = jax.lax.with_sharding_constraint(
            depth, NamedSharding(self.mesh, P("data")))

        if n_valid is None:  # direct/bench callers: every frame is real
            n_valid = jnp.full((d,), b, jnp.int32)
        local_scan = functools.partial(_local_temporal_scan, spec=self.spec,
                                       b=b, stride=s)
        specs = _state_specs(with_anchor=s > 1)
        blended, ranges, states = jax.shard_map(
            local_scan, mesh=self.mesh,
            in_specs=(P("data"), specs, P("data")),
            out_specs=(P("data"), P("data"), specs),
        )(depth.reshape(d, b // s, h, w), states, n_valid)

        # Warp runs under shard_map so each data slot invokes the full
        # single-chip kernel stack (batched pallas compositor + fused blur)
        # on its local batch — the manual-DMA blur grid never needs to
        # partition because it only ever sees per-device shapes. Unmentioned
        # mesh axes (model) see replicated inputs and deterministic compute,
        # so outputs stay replicated.
        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
        # info, so the replication checker cannot run across the kernel.
        sbs = jax.shard_map(
            functools.partial(_local_warp, spec=self.spec,
                              emit=self.sbs_emit,
                              interpret=self._interpret), mesh=self.mesh,
            in_specs=(P("data"), P("data"), P("data")), out_specs=P("data"),
            check_vma=False,
        )(frames_u8, blended.reshape(n, h, w), ranges.reshape(n, 2))
        return sbs, states

    def _full_n_valid(self, b: int) -> np.ndarray:
        return np.full((self.n_data,), b, np.int32)

    def step(self, frames_u8, states: TemporalState, n_valid=None):
        """``n_valid``: (n_data,) i32 — real (non-padding) frames per data
        slot this step; only those count toward the overflow diagnostic.
        None means every frame is real."""
        frames_u8 = jnp.asarray(frames_u8)
        if n_valid is None:
            n_valid = self._full_n_valid(frames_u8.shape[0] // self.n_data)
        return self._step(self.params, frames_u8,
                          states, jnp.asarray(n_valid, jnp.int32))

    @functools.cached_property
    def _audit(self):
        data_sharding = NamedSharding(self.mesh, P("data"))
        state_shardings = jax.tree.map(
            lambda _: data_sharding,
            batched_initial_state(1, 1, 1, self.depth_stride))
        return jax.jit(  # read-only: no donation — step() runs afterwards
            self._audit_impl,
            in_shardings=(None, data_sharding, state_shardings),
            out_shardings=(data_sharding, data_sharding))

    def _audit_impl(self, params, frames_u8, states: TemporalState):
        n, h, w, _ = frames_u8.shape
        d = self.n_data
        b = n // d
        true = infer_depth(self.model, params, frames_u8,
                           input_size=self.run_cfg.input_size,
                           preprocess=self.preprocess_impl)
        true = jax.lax.with_sharding_constraint(
            true, NamedSharding(self.mesh, P("data")))
        specs = _state_specs(with_anchor=True)
        return jax.shard_map(
            functools.partial(_local_stride_audit, stride=self.depth_stride),
            mesh=self.mesh,
            in_specs=(P("data"), specs),
            out_specs=(P("data"), P("data")),
        )(true.reshape(d, b, h, w), states)

    def _per_slot_audit(self, rms, mx):
        """{global data slot -> (rms, max)} for this process's shards (each
        shard of a (n_data,)-over-'data' array covers exactly one slot)."""
        out = {}
        for sr, sm in zip(rms.addressable_shards, mx.addressable_shards):
            slot = sr.index[0].start or 0
            out[slot] = (float(np.asarray(sr.data)[0]),
                         float(np.asarray(sm.data)[0]))
        return out

    def stride_audit(self, frames_u8, states: TemporalState):
        """Sampled depth-stride fidelity check over the mesh: run the depth
        net on EVERY frame and compare against what the stride path would
        interpolate per data slot (same math as SbsPipeline.stride_audit —
        ops/temporal.stride_audit_stats). Read-only; call BEFORE step() on
        the same inputs. Returns {slot: (rms, max)} in scaled depth units."""
        if self.depth_stride < 2:
            raise ValueError("stride_audit requires depth_stride > 1")
        rms, mx = self._audit(self.params, jnp.asarray(frames_u8), states)
        return self._per_slot_audit(rms, mx)

    def stride_audit_local(self, local_frames_u8, states: TemporalState):
        """Multi-host stride_audit: takes only this process's slots (same
        layout as step_local); returns this process's {slot: (rms, max)}."""
        if self.depth_stride < 2:
            raise ValueError("stride_audit requires depth_stride > 1")
        n_local, h, w, _ = local_frames_u8.shape
        # ownership is whole and even (checked at construction), so the
        # global batch is n_data * the per-slot batch
        n_global = self.n_data * (n_local // len(self.local_slots))
        sharding = NamedSharding(self.mesh, P("data"))
        frames = jax.make_array_from_process_local_data(
            sharding, np.asarray(local_frames_u8), (n_global, h, w, 3))
        rms, mx = self._audit(self.params, frames, states)
        return self._per_slot_audit(rms, mx)

    def step_local(self, local_frames_u8, states: TemporalState,
                   n_valid_local=None):
        """Multi-host step: ``local_frames_u8`` holds only this process's
        ``data`` slots, stacked in ascending slot order —
        (len(local_slots) * batch, H, W, 3). The global array is assembled
        from every process's local shards; frames never cross hosts
        (SURVEY.md §2c: DCN carries only program coordination).
        ``n_valid_local``: per-owned-slot real-frame counts (same order)."""
        n_local, h, w, _ = local_frames_u8.shape
        n_slots = len(self.local_slots)  # > 0: checked at construction
        b = n_local // n_slots
        n_global = self.n_data * b
        sharding = NamedSharding(self.mesh, P("data"))
        frames = jax.make_array_from_process_local_data(
            sharding, np.asarray(local_frames_u8), (n_global, h, w, 3))
        if n_valid_local is None:
            n_valid_local = np.full((n_slots,), b, np.int32)
        n_valid = jax.make_array_from_process_local_data(
            sharding, np.asarray(n_valid_local, np.int32), (self.n_data,))
        return self._step(self.params, frames, states, n_valid)


def _state_specs(with_anchor: bool = False) -> TemporalState:
    return TemporalState(d_prev1=P("data"), d_prev2=P("data"),
                         offset_range=P("data"), has_state=P("data"),
                         overflow=P("data"),
                         anchor_prev=P("data") if with_anchor else None)


def _local_warp(frames_local, blended_local, ranges_local, *, spec: WarpSpec,
                emit: str = "u8", interpret: bool = False):
    """Body run per data shard: the slot's (B, H, W, 3) frames through the
    batched warp — identical kernels to the single-chip path."""
    return spec.warp_batch(frames_local, blended_local, ranges_local,
                           emit=emit, interpret=interpret)


def _local_stride_audit(true_local, state_local: TemporalState, *,
                        stride: int):
    """Body run per data shard: (1, B, H, W) true depths + leading-1 state
    -> (1,) rms / (1,) max interpolation error for this slot's batch."""
    from vr_video_generator_tpu.ops.temporal import stride_audit_stats

    state = jax.tree.map(lambda x: x[0], state_local)
    rms, mx = stride_audit_stats(true_local[0], state, stride)
    return rms[None], mx[None]


def _local_temporal_scan(depth_local, state_local: TemporalState,
                         n_valid_local, *,
                         spec: WarpSpec, b: int, stride: int = 1):
    """Body run per data shard: (1, B or B/stride, H, W) + leading-1 state
    + (1,) per-slot real-frame count (overflow diagnostic mask).

    With depth_stride > 1 the incoming maps are the slot's anchor depths;
    the interpolation runs per slot against the slot's own carried anchor
    (each ``data`` slot owns a contiguous temporal slice, so its carry is
    exactly the single-chip pipeline's)."""
    state = jax.tree.map(lambda x: x[0], state_local)
    depth = depth_local[0]
    if stride > 1:
        depth, anchor_last = stride_interpolate(depth, state, stride)
    blended, ranges, state = temporal_scan(depth, state, spec,
                                           n_valid=n_valid_local[0])
    if stride > 1:
        state = state._replace(anchor_prev=anchor_last)
    state = jax.tree.map(lambda x: x[None], state)
    return blended[None], ranges[None], state
