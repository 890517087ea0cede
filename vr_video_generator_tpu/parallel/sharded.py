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
from vr_video_generator_tpu.ops.temporal import TemporalState, temporal_scan
from vr_video_generator_tpu.ops.warp import WarpSpec
from vr_video_generator_tpu.parallel.sharding import shard_params
from vr_video_generator_tpu.utils.config import RunConfig


def batched_initial_state(n_data: int, height: int, width: int) -> TemporalState:
    return TemporalState(
        d_prev1=jnp.zeros((n_data, height, width), jnp.float32),
        d_prev2=jnp.zeros((n_data, height, width), jnp.float32),
        offset_range=jnp.zeros((n_data, 2), jnp.float32),
        has_state=jnp.zeros((n_data,), jnp.bool_),
        overflow=jnp.zeros((n_data,), jnp.int32))


class ShardedSbsPipeline:
    """Pipeline over a (data, model) mesh for a fixed video geometry.

    ``step`` consumes (n_data * batch, H, W, 3) uint8 frames — n_data
    contiguous temporal slices concatenated — plus a per-slice state stack.
    """

    def __init__(self, model: DepthAnythingV2, params, height: int, width: int,
                 mesh: Mesh, run_cfg: Optional[RunConfig] = None):
        self.run_cfg = run_cfg or RunConfig(encoder=model.cfg.encoder)
        self.model = model
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.height, self.width = height, width
        self.spec = WarpSpec.create(height, width, self.run_cfg.stereo(),
                                    impl=self.run_cfg.warp_impl)
        from vr_video_generator_tpu.pipeline import _resolve_preprocess

        self.preprocess_impl = _resolve_preprocess(self.run_cfg, model)
        self.params = shard_params(params, mesh)

        data_sharding = NamedSharding(mesh, P("data"))
        state_shardings = TemporalState(
            d_prev1=data_sharding, d_prev2=data_sharding,
            offset_range=data_sharding, has_state=data_sharding,
            overflow=data_sharding)
        self._step = jax.jit(
            self._step_impl,
            in_shardings=(None, data_sharding, state_shardings),
            out_shardings=(data_sharding, state_shardings),
            donate_argnums=(2,))

    @property
    def local_slots(self):
        """``data``-axis slots this process owns (all of them single-host)."""
        from vr_video_generator_tpu.parallel.multihost import local_data_slots

        return local_data_slots(self.mesh)

    def initial_state(self) -> TemporalState:
        # Created on-device under out_shardings (not device_put of a host
        # array) so every process of a multi-host mesh can build the global
        # state without holding non-addressable shards.
        sharding = jax.tree.map(
            lambda _: NamedSharding(self.mesh, P("data")),
            batched_initial_state(1, 1, 1))
        return jax.jit(
            functools.partial(batched_initial_state, self.n_data,
                              self.height, self.width),
            out_shardings=sharding)()

    def _step_impl(self, params, frames_u8: jnp.ndarray,
                   states: TemporalState) -> Tuple[jnp.ndarray, TemporalState]:
        n, h, w, _ = frames_u8.shape
        d = self.n_data
        b = n // d

        depth = infer_depth(self.model, params, frames_u8,
                            input_size=self.run_cfg.input_size,
                            preprocess=self.preprocess_impl)
        depth = jax.lax.with_sharding_constraint(
            depth, NamedSharding(self.mesh, P("data")))

        local_scan = functools.partial(_local_temporal_scan, spec=self.spec, b=b)
        blended, ranges, states = jax.shard_map(
            local_scan, mesh=self.mesh,
            in_specs=(P("data"), _state_specs()),
            out_specs=(P("data"), P("data"), _state_specs()),
        )(depth.reshape(d, b, h, w), states)

        # Warp runs under shard_map so each data slot invokes the full
        # single-chip kernel stack (batched pallas compositor + fused blur)
        # on its local batch — the manual-DMA blur grid never needs to
        # partition because it only ever sees per-device shapes. Unmentioned
        # mesh axes (model) see replicated inputs and deterministic compute,
        # so outputs stay replicated.
        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
        # info, so the replication checker cannot run across the kernel.
        sbs = jax.shard_map(
            functools.partial(_local_warp, spec=self.spec), mesh=self.mesh,
            in_specs=(P("data"), P("data"), P("data")), out_specs=P("data"),
            check_vma=False,
        )(frames_u8, blended.reshape(n, h, w), ranges.reshape(n, 2))
        return sbs, states

    def step(self, frames_u8, states: TemporalState):
        return self._step(self.params, jnp.asarray(frames_u8), states)

    def step_local(self, local_frames_u8, states: TemporalState):
        """Multi-host step: ``local_frames_u8`` holds only this process's
        ``data`` slots, stacked in ascending slot order —
        (len(local_slots) * batch, H, W, 3). The global array is assembled
        from every process's local shards; frames never cross hosts
        (SURVEY.md §2c: DCN carries only program coordination)."""
        n_local, h, w, _ = local_frames_u8.shape
        n_global = n_local * (self.n_data // max(len(self.local_slots), 1))
        sharding = NamedSharding(self.mesh, P("data"))
        frames = jax.make_array_from_process_local_data(
            sharding, np.asarray(local_frames_u8), (n_global, h, w, 3))
        return self._step(self.params, frames, states)


def _state_specs() -> TemporalState:
    return TemporalState(d_prev1=P("data"), d_prev2=P("data"),
                         offset_range=P("data"), has_state=P("data"),
                         overflow=P("data"))


def _local_warp(frames_local, blended_local, ranges_local, *, spec: WarpSpec,
                interpret: bool = False):
    """Body run per data shard: the slot's (B, H, W, 3) frames through the
    batched warp — identical kernels to the single-chip path."""
    return spec.warp_batch(frames_local, blended_local, ranges_local,
                           interpret=interpret)


def _local_temporal_scan(depth_local, state_local: TemporalState, *,
                         spec: WarpSpec, b: int):
    """Body run per data shard: (1, B, H, W) + leading-1 state."""
    state = jax.tree.map(lambda x: x[0], state_local)
    blended, ranges, state = temporal_scan(depth_local[0], state, spec)
    state = jax.tree.map(lambda x: x[None], state)
    return blended[None], ranges[None], state
