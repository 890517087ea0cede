"""End-to-end pipeline tests with a tiny model on synthetic video."""

import numpy as np
import pytest
import jax.numpy as jnp

from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
from vr_video_generator_tpu.models.factory import random_params
from vr_video_generator_tpu.pipeline import SbsPipeline
from vr_video_generator_tpu.utils.config import ModelConfig, RunConfig

TINY = ModelConfig(encoder="vits", embed_dim=32, depth=4, num_heads=2,
                   mlp_ratio=4.0, features=16, out_channels=(8, 16, 32, 32),
                   intermediate_layers=(0, 1, 2, 3), depth_scaler=1.618)

H, W = 56, 98


@pytest.fixture(scope="module")
def tiny_pipeline():
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=4, input_size=56, compute_dtype="float32")
    return SbsPipeline(model, params, H, W, run_cfg=cfg)


def test_step_shapes_and_dtype(tiny_pipeline, rng):
    frames = rng.integers(0, 256, (4, H, W, 3), dtype=np.uint8)
    sbs, state = tiny_pipeline.step(frames, tiny_pipeline.initial_state())
    sbs = np.asarray(sbs)
    assert sbs.shape == (4, H, 2 * W, 3)
    assert sbs.dtype == np.uint8
    # right half is the original frame
    np.testing.assert_array_equal(sbs[:, :, W:], frames)


def test_state_continuity(tiny_pipeline, rng):
    """Two 2-frame batches with carried state == one 4-frame batch."""
    frames = rng.integers(0, 256, (4, H, W, 3), dtype=np.uint8)
    full, _ = tiny_pipeline.step(frames, tiny_pipeline.initial_state())
    st = tiny_pipeline.initial_state()
    a, st = tiny_pipeline.step(frames[:2], st)
    b, _ = tiny_pipeline.step(frames[2:], st)
    np.testing.assert_array_equal(np.asarray(full),
                                  np.concatenate([np.asarray(a), np.asarray(b)]))


def test_depth_only(tiny_pipeline, rng):
    frames = rng.integers(0, 256, (2, H, W, 3), dtype=np.uint8)
    depth = np.asarray(tiny_pipeline.depth_only(frames))
    assert depth.shape == (2, H, W)
    assert (depth >= 0).all()
