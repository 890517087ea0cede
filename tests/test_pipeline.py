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


def test_primed_state_removes_segment_reset(tiny_pipeline, rng):
    """A segment started from a warm-up-primed state is bit-identical to the
    same frames inside one full sequential run — the reference's per-segment
    smoothing reset (PredictAndGenerate.py:131-145) is gone."""
    frames = rng.integers(0, 256, (12, H, W, 3), dtype=np.uint8)
    st = tiny_pipeline.initial_state()
    outs, states = [], []
    for lo in range(0, 12, 4):
        sbs, st = tiny_pipeline.step(frames[lo:lo + 4], st)
        outs.append(np.asarray(sbs))
        states.append(st)
    full = np.concatenate(outs)

    # warm-up window covers the whole prefix -> exact (exercises the
    # front-pad: 6 frames at batch 4 pad 2 copies of frame 0)
    primed = tiny_pipeline.primed_state(frames[:6], batch_size=4)
    # snapshot before step() consumes (donates) the state buffers
    primed_has_state = bool(np.asarray(primed.has_state))
    primed_range = np.asarray(primed.offset_range).copy()
    sbs, after = tiny_pipeline.step(frames[6:10], primed)
    np.testing.assert_array_equal(np.asarray(sbs), full[6:10])
    # ... and the carried state stays on the full-run trajectory: stepping
    # frames [8, 12) from it reproduces the full run's final state
    sbs2, after2 = tiny_pipeline.step(frames[8:12],
                                      tiny_pipeline.primed_state(frames[:8],
                                                                 batch_size=4))
    np.testing.assert_array_equal(np.asarray(sbs2), full[8:12])
    np.testing.assert_array_equal(np.asarray(after2.offset_range),
                                  np.asarray(states[-1].offset_range))
    np.testing.assert_array_equal(np.asarray(after2.d_prev1),
                                  np.asarray(states[-1].d_prev1))

    # a cold start (the reference's behavior) is a genuinely different state
    assert primed_has_state
    assert not bool(np.asarray(tiny_pipeline.initial_state().has_state))
    assert not np.array_equal(primed_range, np.zeros(2, np.float32))

    # empty warm-up window returns a fresh state
    fresh = tiny_pipeline.primed_state(frames[:0], batch_size=4)
    assert int(np.asarray(fresh.has_state)) == 0


def test_depth_only(tiny_pipeline, rng):
    frames = rng.integers(0, 256, (2, H, W, 3), dtype=np.uint8)
    depth = np.asarray(tiny_pipeline.depth_only(frames))
    assert depth.shape == (2, H, W)
    assert (depth >= 0).all()


def _states_equal(a, b):
    import jax

    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_step_many_matches_sequential(tiny_pipeline, rng):
    """The chunked superstep (one dispatch, lax.scan over k batches) is
    bit-identical to k sequential step() calls, state included."""
    frames = rng.integers(0, 256, (3, 4, H, W, 3), dtype=np.uint8)
    many, st_many = tiny_pipeline.step_many(frames,
                                            tiny_pipeline.initial_state())
    assert isinstance(many, tuple) and len(many) == 3
    st = tiny_pipeline.initial_state()
    outs = []
    for i in range(3):
        sbs, st = tiny_pipeline.step(frames[i], st)
        outs.append(np.asarray(sbs))
    np.testing.assert_array_equal(
        np.stack([np.asarray(o) for o in many]), np.stack(outs))
    _states_equal(st_many, st)

    with pytest.raises(ValueError, match="step_many"):
        tiny_pipeline.step_many(frames[0], tiny_pipeline.initial_state())


def test_step_many_stride2(tiny_pipeline, rng):
    """Superstep under depth_stride=2: the anchor carry crosses scan
    iterations exactly as it crosses host-loop batches."""
    cfg = RunConfig(batch_size=4, input_size=56, compute_dtype="float32",
                    depth_stride=2)
    pipe = SbsPipeline(tiny_pipeline.model, tiny_pipeline.params, H, W,
                       run_cfg=cfg)
    frames = rng.integers(0, 256, (3, 4, H, W, 3), dtype=np.uint8)
    many, st_many = pipe.step_many(frames, pipe.initial_state())
    st = pipe.initial_state()
    outs = []
    for i in range(3):
        sbs, st = pipe.step(frames[i], st)
        outs.append(np.asarray(sbs))
    np.testing.assert_array_equal(
        np.stack([np.asarray(o) for o in many]), np.stack(outs))
    _states_equal(st_many, st)


@pytest.mark.parametrize("stride,audit_every", [(1, 0), (2, 2)])
def test_segment_chunked_bit_identical(tmp_path, stride, audit_every,
                                       tiny_pipeline):
    """process_segment with chunk_batches=3 writes subclips bit-identical
    to per-batch dispatch — including around audit probes (which flush the
    chunk and run per-batch) and the padded final batch."""
    import os

    import cv2

    from tests.test_video import write_synthetic_video
    from vr_video_generator_tpu.runtime.segment import process_segment
    from vr_video_generator_tpu.video.reader import VideoReader, probe_video
    from vr_video_generator_tpu.video.writer import SubclipWriter

    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 22, h=H, w=W)
    fps, *_ = probe_video(str(video))
    dirs = {}
    for tag, ck in (("per_batch", 1), ("chunked", 3)):
        cfg = RunConfig(batch_size=4, input_size=56, compute_dtype="float32",
                        depth_stride=stride, stride_audit_every=audit_every,
                        chunk_batches=ck)
        pipe = SbsPipeline(tiny_pipeline.model, tiny_pipeline.params, H, W,
                           run_cfg=cfg)
        out_dir = str(tmp_path / tag) + os.sep
        writer = SubclipWriter(out_dir, fps, 2 * W, H, backend="cv2")
        with VideoReader(str(video), begin=0) as reader:
            n = process_segment(pipe, reader, writer, 0, 22,
                                max_frame_count=8, batch_size=4)
        writer.close()
        assert n == 22
        dirs[tag] = out_dir

    names = sorted(f for f in os.listdir(dirs["per_batch"])
                   if f.endswith(".mp4"))
    assert names == sorted(f for f in os.listdir(dirs["chunked"])
                           if f.endswith(".mp4"))
    assert len(names) == 3  # 8 + 8 + 6
    for name in names:
        ca = cv2.VideoCapture(os.path.join(dirs["per_batch"], name))
        cb = cv2.VideoCapture(os.path.join(dirs["chunked"], name))
        while True:
            ra, fa = ca.read()
            rb, fb = cb.read()
            assert ra == rb
            if not ra:
                break
            np.testing.assert_array_equal(fa, fb)
        ca.release()
        cb.release()
