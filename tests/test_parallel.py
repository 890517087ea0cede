"""Sharded-pipeline tests on the 8-virtual-CPU-device mesh: DP+TP shardings
compile, execute, and agree with the single-device pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pipeline import TINY, H, W
from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
from vr_video_generator_tpu.models.factory import random_params
from vr_video_generator_tpu.parallel.mesh import make_mesh
from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline
from vr_video_generator_tpu.parallel.sharding import param_specs
from vr_video_generator_tpu.pipeline import SbsPipeline
from vr_video_generator_tpu.utils.config import RunConfig


@pytest.fixture(scope="module")
def tiny_model():
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    return model, random_params(model)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_param_specs_mark_tp_dims(tiny_model):
    _, params = tiny_model
    specs = param_specs(params)
    qkv = specs["pretrained"]["block0"]["attn"]["qkv"]["kernel"]
    assert qkv == jax.sharding.PartitionSpec(None, "model")
    patch = specs["pretrained"]["patch_embed"]["kernel"]
    assert patch == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single_device(tiny_model, mesh_shape, rng):
    model, params = tiny_model
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32")
    mesh = make_mesh(mesh_shape)
    n_data, b = mesh_shape[0], 2

    sharded = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    frames = rng.integers(0, 256, (n_data * b, H, W, 3), dtype=np.uint8)
    sbs, states = sharded.step(frames, sharded.initial_state())
    sbs = np.asarray(sbs)
    assert sbs.shape == (n_data * b, H, 2 * W, 3)

    # Oracle: every data slot is an independent segment start -> run the
    # single-device pipeline per slot slice.
    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    for slot in range(n_data):
        ref, _ = single.step(frames[slot * b:(slot + 1) * b],
                             single.initial_state())
        np.testing.assert_array_equal(sbs[slot * b:(slot + 1) * b],
                                      np.asarray(ref))


def test_sharded_state_carries(tiny_model, rng):
    model, params = tiny_model
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32")
    mesh = make_mesh((4, 2))
    sharded = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    frames = rng.integers(0, 256, (8, H, W, 3), dtype=np.uint8)
    st = sharded.initial_state()
    _, st = sharded.step(frames, st)
    out2, _ = sharded.step(frames, st)

    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    s = single.initial_state()
    _, s = single.step(frames[:2], s)
    ref2, _ = single.step(frames[:2], s)
    np.testing.assert_array_equal(np.asarray(out2)[:2], np.asarray(ref2))


def test_multihost_helpers_single_process():
    from vr_video_generator_tpu.parallel.multihost import (
        initialize,
        local_data_slots,
        make_global_mesh,
    )

    initialize()  # no-op on single host
    mesh = make_global_mesh((4, 2))
    assert local_data_slots(mesh) == [0, 1, 2, 3]


def test_pallas_warp_batch_under_shard_map(rng):
    """The fused batched pallas warp must run per data slot inside shard_map
    (interpret mode on CPU) and agree with the single-device xla path —
    multi-chip keeps the single-chip kernel stack."""
    import functools

    from jax.sharding import PartitionSpec as P

    from tests.test_warp import synth_depth, synth_img
    from tests.test_warp import H as WH, W as WW
    from vr_video_generator_tpu.ops.warp import WarpSpec
    from vr_video_generator_tpu.parallel.sharded import _local_warp
    from vr_video_generator_tpu.utils.config import StereoConfig

    n_data, b = 4, 2
    mesh = make_mesh((n_data, 2))
    cfg = StereoConfig().normalized()
    spec_pl = WarpSpec.create(WH, WW, cfg, impl="pallas")
    spec_xla = WarpSpec.create(WH, WW, cfg, impl="xla")

    imgs = np.stack([synth_img(rng) for _ in range(n_data * b)])
    depths = np.stack([synth_depth(rng) for _ in range(n_data * b)])
    ranges = np.stack([
        np.asarray(spec_xla.frame_offset_range(jnp.asarray(d))) for d in depths])

    sharded_fn = jax.jit(jax.shard_map(
        functools.partial(_local_warp, spec=spec_pl, interpret=True),
        mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False))
    got = np.asarray(sharded_fn(jnp.asarray(imgs), jnp.asarray(depths),
                                jnp.asarray(ranges)))
    want = np.asarray(spec_xla.warp_batch(jnp.asarray(imgs),
                                          jnp.asarray(depths),
                                          jnp.asarray(ranges)))
    np.testing.assert_array_equal(got, want)


def test_sharded_with_fused_kernels_matches_single(rng):
    """The ViT's fused Pallas half-blocks must partition under the pjit mesh
    (DP x TP): force mlp_fused='fused' (interpret on CPU) and check the
    sharded step equals the single-device fused pipeline. Guards the real
    multi-chip path, which the CPU 'auto' gate would otherwise never
    exercise."""

    from vr_video_generator_tpu.utils.config import ModelConfig

    cfg_model = ModelConfig(
        encoder="vits", embed_dim=128, depth=2, num_heads=2, mlp_ratio=4.0,
        features=16, out_channels=(8, 16, 32, 32),
        intermediate_layers=(0, 1, 0, 1), depth_scaler=1.618,
        mlp_fused="fused")
    model = DepthAnythingV2(cfg_model, dtype=jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32")
    mesh = make_mesh((4, 2))

    sharded = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    frames = rng.integers(0, 256, (8, H, W, 3), dtype=np.uint8)
    sbs, _ = sharded.step(frames, sharded.initial_state())

    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    for slot in range(4):
        ref, _ = single.step(frames[slot * 2:(slot + 1) * 2],
                             single.initial_state())
        np.testing.assert_array_equal(np.asarray(sbs)[slot * 2:(slot + 1) * 2],
                                      np.asarray(ref))


def test_slot_ownership_check_rejects_partial_ownership(monkeypatch):
    """Multi-host feeding is host-local (step_local furnishes only this
    process's data shards), which requires every process to own
    n_data/process_count whole slots. A mesh violating that (data=1 over 2
    processes: the slot's devices span hosts) must be refused loudly at
    construction instead of deadlocking inside
    make_array_from_process_local_data."""
    import jax
    import pytest

    from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline

    monkeypatch.setattr(jax, "process_count", lambda: 2)

    class Spanning:
        n_data = 1
        local_slots = [0]

    with pytest.raises(ValueError, match="multiple of the process count"):
        ShardedSbsPipeline._check_slot_ownership(Spanning())

    class Uneven:  # 3 slots over 2 processes
        n_data = 3
        local_slots = [0, 1]

    with pytest.raises(ValueError):
        ShardedSbsPipeline._check_slot_ownership(Uneven())

    class Whole:
        n_data = 4
        local_slots = [2, 3]

    ShardedSbsPipeline._check_slot_ownership(Whole())  # no raise
