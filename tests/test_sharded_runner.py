"""Sharded multi-segment runtime: subclips must match per-segment
single-device conversion exactly."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pipeline import TINY, H, W
from tests.test_video import write_synthetic_video
from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
from vr_video_generator_tpu.models.factory import random_params
from vr_video_generator_tpu.parallel.mesh import make_mesh
from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline
from vr_video_generator_tpu.pipeline import SbsPipeline
from vr_video_generator_tpu.runtime.sharded_runner import (
    partition_segments,
    run_sharded,
)
from vr_video_generator_tpu.runtime.segment import process_segment
from vr_video_generator_tpu.utils.config import RunConfig
from vr_video_generator_tpu.video.check import check_subclips
from vr_video_generator_tpu.video.combine import sorted_subclips
from vr_video_generator_tpu.video.reader import VideoReader, probe_video
from vr_video_generator_tpu.video.writer import SubclipWriter


def test_partition_matches_reference_policy():
    # step = ceil(range/N), contiguous (reference PredictAndGenerate.py:274-275)
    assert partition_segments(0, 100, 4) == [(0, 25), (25, 50), (50, 75), (75, 100)]
    assert partition_segments(0, 10, 4) == [(0, 3), (3, 6), (6, 9), (9, 10)]
    assert partition_segments(5, 7, 4) == [(5, 6), (6, 7), (7, 7), (7, 7)]


def test_primed_states_globally_uniform_trip_count(tmp_path):
    """The warm-up step count must be decided by ALL slots' begins, not the
    local process's: a host owning only 0-start slots still runs the k
    global SPMD warm-up steps when any other host's slot has preceding
    frames (a per-process early return would desync the collectives)."""
    from collections import namedtuple

    from vr_video_generator_tpu.runtime.sharded_runner import _primed_states

    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 8, h=H, w=W)
    St = namedtuple("St", "overflow")

    class StubPipe:
        height, width = H, W

        def __init__(self):
            self.calls = 0

        def initial_state(self):
            return St(overflow=np.zeros((1,), np.int32))

        def step_local(self, local, states):
            self.calls += 1
            assert local.shape == (2, H, W, 3)
            return None, states

    pipe = StubPipe()
    _primed_states(pipe, [0], str(video), b=2, warmup=4,
                   reader_backend="cv2", multi_host=True, any_preceding=True,
                   global_begins=[0, 4])
    assert pipe.calls == 2  # k = ceil(warmup/b), despite the local lo == 0

    pipe = StubPipe()  # and the skip is likewise global
    _primed_states(pipe, [0], str(video), b=2, warmup=4,
                   reader_backend="cv2", multi_host=True, any_preceding=False,
                   global_begins=[0, 4])
    assert pipe.calls == 0


@pytest.mark.slow
def test_sharded_warmup_matches_full_sequential_run(tmp_path):
    """With halo warm-up covering each slot's whole prefix, the sharded
    runner's subclips are identical to one uninterrupted sequential run —
    the per-segment smoothing discontinuity is gone (better than the
    reference's per-worker reset, PredictAndGenerate.py:131-145)."""
    video = tmp_path / "in.mp4"
    n_frames = 16
    write_synthetic_video(video, n_frames, h=H, w=W)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32",
                    max_frame_count=4)
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)

    mesh = make_mesh((4, 2))
    sharded = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    shard_dir = str(tmp_path / "shard") + os.sep
    # 4 slots own [0,4) [4,8) [8,12) [12,16); warmup 12 >= every slot begin
    n = run_sharded(sharded, str(video), shard_dir, 0, n_frames,
                    max_frame_count=4, batch_size=2, writer_backend="cv2",
                    warmup=12)
    assert n == n_frames

    # oracle: ONE sequential segment over the whole range
    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    ref_dir = str(tmp_path / "ref") + os.sep
    fps, *_ = probe_video(str(video))
    writer = SubclipWriter(ref_dir, fps, 2 * W, H, backend="cv2")
    with VideoReader(str(video), begin=0) as reader:
        process_segment(single, reader, writer, 0, n_frames,
                        max_frame_count=4, batch_size=2)
    writer.close()

    assert sorted_subclips(shard_dir) == sorted_subclips(ref_dir)
    import cv2
    for name in sorted_subclips(shard_dir):
        ca = cv2.VideoCapture(os.path.join(shard_dir, name))
        cb = cv2.VideoCapture(os.path.join(ref_dir, name))
        while True:
            ra, fa = ca.read()
            rb, fb = cb.read()
            assert ra == rb
            if not ra:
                break
            np.testing.assert_array_equal(fa, fb)


def test_sharded_warmup_matches_single_chip_primed_state(tmp_path):
    """With warmup not a multiple of batch_size, the sharded warm-up must
    prime on exactly ``warmup`` real frames (front-padded to whole batches),
    bit-identical to SbsPipeline.primed_state — so a segment renders the
    same whether dispatched single-chip or through the mesh."""
    import jax

    from vr_video_generator_tpu.runtime.sharded_runner import _primed_states

    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 12, h=H, w=W)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32")
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    begins = [4, 9]

    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    sharded = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    states = _primed_states(sharded, begins, str(video), b=2, warmup=3,
                            reader_backend="cv2", multi_host=False,
                            any_preceding=True, global_begins=begins)

    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    for i, lo in enumerate(begins):
        with VideoReader(str(video), begin=lo - 3) as r:
            warm = np.stack(list(r.frames(lo - 3, lo)))
        assert warm.shape[0] == 3
        ref = single.primed_state(warm, batch_size=2)
        for got, want in zip(jax.tree.leaves(states), jax.tree.leaves(ref)):
            np.testing.assert_array_equal(np.asarray(got)[i],
                                          np.asarray(want))


def test_warmup_equal_across_runtimes_at_short_begin_with_stride(tmp_path):
    """begin < warmup AND depth_stride > 1: the warm-up window's front pads
    prime the anchor carry (they are NOT a fixed point like at stride 1), so
    the pad count is part of the trajectory. Both runtimes must pad to the
    same fixed k = ceil(warmup/b) batches — the case a per-window pad count
    used to get wrong (single-chip padded only to ceil(n_real/b))."""
    import jax

    from vr_video_generator_tpu.runtime.sharded_runner import _primed_states

    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 12, h=H, w=W)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32",
                    depth_stride=2)
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    begins, warmup = [2, 9], 4  # slot 0: only 2 preceding frames < warmup

    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    sharded = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    states = _primed_states(sharded, begins, str(video), b=2, warmup=warmup,
                            reader_backend="cv2", multi_host=False,
                            any_preceding=True, global_begins=begins)

    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    for i, lo in enumerate(begins):
        wu = max(0, lo - warmup)
        with VideoReader(str(video), begin=wu) as r:
            warm = np.stack(list(r.frames(wu, lo)))
        ref = single.primed_state(warm, batch_size=2,
                                  min_batches=-(-warmup // 2))
        for got, want in zip(jax.tree.leaves(states), jax.tree.leaves(ref)):
            np.testing.assert_array_equal(np.asarray(got)[i],
                                          np.asarray(want))


def test_overflow_diagnostic_counts_only_real_frames(tmp_path):
    """An over-cap depth (huge depth_scaler) on a segment whose final batch
    is host-padded must report exactly the real frame count — pads, and the
    all-zero batches of finished mesh slots, are masked out (n_valid)."""
    import dataclasses

    from vr_video_generator_tpu.utils.logging import WorkerLog

    video = tmp_path / "in.mp4"
    n_frames = 5
    write_synthetic_video(video, n_frames, h=H, w=W)
    hot = dataclasses.replace(TINY, depth_scaler=1e6)  # frames land over cap
    model = DepthAnythingV2(hot, dtype=jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32",
                    max_frame_count=4)

    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    # ground truth: which REAL frames are actually over the cap (a frame can
    # land at 0 if the random net's ReLU zeroes it — don't hardcode)
    with VideoReader(str(video), begin=0) as r:
        frames = np.stack(list(r.frames(0, n_frames)))
    cap = cfg.stereo().normalized().limit_step_cap
    over = np.asarray(single.depth_only(frames)).max(axis=(1, 2)) > cap
    expected = int(over.sum())
    assert 1 <= expected < n_frames  # meaningful, and distinguishable below
    assert over[-1]  # the padded copies duplicate an over-cap frame, so an
    #                  unmasked count would read expected + 1 (single-chip)

    # single-chip: batches (2, 2, 1+pad) — the pad must not count
    log_path = tmp_path / "seg.txt"
    fps, *_ = probe_video(str(video))
    writer = SubclipWriter(str(tmp_path / "out") + os.sep, fps, 2 * W, H,
                           backend="cv2")
    with VideoReader(str(video), begin=0) as reader:
        process_segment(single, reader, writer, 0, n_frames,
                        max_frame_count=4, batch_size=2,
                        log=WorkerLog(str(log_path)))
    writer.close()
    assert (f"exceeded limit_step_cap on {expected} frames"
            in log_path.read_text())

    # sharded: slots [0,2) [2,4) [4,5) [5,5) — the padded slot contributes
    # its 1 real frame and the empty (all-zeros) slot contributes 0
    mesh = make_mesh((4, 2))
    sharded = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    slog = tmp_path / "sharded.txt"
    n = run_sharded(sharded, str(video), str(tmp_path / "shard") + os.sep,
                    0, n_frames, max_frame_count=4, batch_size=2,
                    writer_backend="cv2", log=WorkerLog(str(slog)))
    assert n == n_frames
    assert (f"exceeded limit_step_cap on {expected} frames"
            in slog.read_text())


def test_sharded_packed_emit_is_loud_without_pallas():
    """--sbs_output packed must reach the sharded warp (not be silently
    dropped): on the XLA warp impl that is a ValueError at trace time."""
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32",
                    sbs_output="packed")
    mesh = make_mesh((4, 2))
    pipe = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    assert pipe.sbs_emit == "packed"
    frames = np.zeros((8, H, W, 3), np.uint8)
    with pytest.raises(ValueError, match="packed"):
        pipe.step(frames, pipe.initial_state())


@pytest.mark.slow
def test_sharded_runner_matches_single_device(tmp_path):
    video = tmp_path / "in.mp4"
    n_frames = 22
    write_synthetic_video(video, n_frames, h=H, w=W)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32",
                    max_frame_count=4)

    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)

    mesh = make_mesh((4, 2))
    sharded = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    shard_dir = str(tmp_path / "shard") + os.sep
    n = run_sharded(sharded, str(video), shard_dir, 0, n_frames,
                    max_frame_count=4, batch_size=2, writer_backend="cv2")
    assert n == n_frames
    assert check_subclips(shard_dir) == []

    # oracle: run each segment through the single-device pipeline
    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    ref_dir = str(tmp_path / "ref") + os.sep
    fps, *_ = probe_video(str(video))
    writer = SubclipWriter(ref_dir, fps, 2 * W, H, backend="cv2")
    for lo, hi in partition_segments(0, n_frames, 4):
        if hi > lo:
            with VideoReader(str(video), begin=lo) as reader:
                process_segment(single, reader, writer, lo, hi,
                                max_frame_count=4, batch_size=2)
    writer.close()

    assert sorted_subclips(shard_dir) == sorted_subclips(ref_dir)
    # compare decoded pixel content of every clip
    import cv2
    for name in sorted_subclips(shard_dir):
        for d in (shard_dir, ref_dir):
            assert os.path.exists(os.path.join(d, name))
        ca = cv2.VideoCapture(os.path.join(shard_dir, name))
        cb = cv2.VideoCapture(os.path.join(ref_dir, name))
        while True:
            ra, fa = ca.read()
            rb, fb = cb.read()
            assert ra == rb
            if not ra:
                break
            # codecs are lossy; require near-identical reconstruction
            assert np.abs(fa.astype(int) - fb.astype(int)).mean() < 2.0


def test_sharded_unaligned_start_keeps_absolute_anchor_grid(tmp_path,
                                                            monkeypatch):
    """depth_stride > 1 with a start off the stride grid: every slot
    processes from its aligned frame and discards the re-decided leading
    outputs, so the sharded output is bit-identical to one cold sequential
    strided run over the whole video — anchor phase is absolute, not
    slot-relative."""
    import vr_video_generator_tpu.runtime.sharded_runner as sr

    video = tmp_path / "in.mp4"
    n_frames = 14
    write_synthetic_video(video, n_frames, h=H, w=W)
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32",
                    depth_stride=2)

    # oracle: cold sequential strided run from frame 0
    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    with VideoReader(str(video), begin=0) as r:
        frames = np.stack(list(r.frames(0, n_frames)))
    st = single.initial_state()
    outs = []
    for i in range(0, n_frames, 2):
        sbs, st = single.step(frames[i:i + 2], st)
        outs.append(np.asarray(sbs))
    full = np.concatenate(outs)

    captured = {}

    class Grab:
        def __init__(self, *a, **k):
            pass

        def write_clip(self, begin, chunk):
            captured[begin] = np.stack(chunk)

        def close(self):
            pass

    monkeypatch.setattr(sr, "SubclipWriter", Grab)
    import jax
    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    pipe = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    # [1, 13) -> slots [1,7) [7,13): begins 1 and 7, both off the grid;
    # warmup 6 covers slot 1's whole aligned prefix [0, 6) pad-free
    n = run_sharded(pipe, str(video), str(tmp_path / "sub") + os.sep,
                    1, 13, max_frame_count=4, batch_size=2,
                    writer_backend="cv2", warmup=6)
    assert n == 12
    got = np.concatenate([captured[k] for k in sorted(captured)])
    np.testing.assert_array_equal(got, full[1:13])


def test_process_segment_discard_windows(tmp_path):
    """discard_first/discard_last: decode [begin-df, end+dl), write exactly
    [begin, end) — the trimmed outputs equal the same positions of a cold
    run over the full decode window (independent of plane quantization)."""
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32",
                    depth_stride=2)
    pipe = SbsPipeline(model, params, H, W, run_cfg=cfg)
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 12, h=H, w=W)

    with VideoReader(str(video), begin=0) as r:
        frames = np.stack(list(r.frames(0, 12)))
    # oracle: cold run over the decode window [4, 10)
    st = pipe.initial_state()
    outs = []
    for i in range(4, 10, 2):
        sbs, st = pipe.step(frames[i:i + 2], st)
        outs.append(np.asarray(sbs))
    oracle = np.concatenate(outs)  # frames 4..9

    clips = {}

    class Grab:
        def write_clip(self, begin, chunk):
            clips[begin] = np.stack(chunk)

        def wait(self):
            pass

    from vr_video_generator_tpu.runtime.segment import process_segment
    with VideoReader(str(video), begin=4) as reader:
        n = process_segment(pipe, reader, Grab(), 5, 9, max_frame_count=16,
                            batch_size=2, discard_first=1, discard_last=1)
    assert n == 4
    assert list(clips) == [5]
    np.testing.assert_array_equal(clips[5], oracle[1:5])  # frames 5..8


def test_segment_decode_failure_degrades_to_black(tmp_path):
    """A mid-stream decode failure must not kill the segment: the failed
    frame is processed as a black frame (reference PredictAndGenerate.py:
    222-225) and every other output is bit-identical to a clean run."""
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32")
    pipe = SbsPipeline(model, params, H, W, run_cfg=cfg)
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 6, h=H, w=W)

    with VideoReader(str(video), begin=0) as r:
        frames = np.stack(list(r.frames(0, 6)))
    bad = 3
    frames_oracle = frames.copy()
    frames_oracle[bad] = 0  # what the runtime should substitute
    st = pipe.initial_state()
    outs = []
    for i in range(0, 6, 2):
        sbs, st = pipe.step(frames_oracle[i:i + 2], st)
        outs.append(np.asarray(sbs))
    oracle = np.concatenate(outs)

    class FlakyReader:
        """VideoReader facade whose decode fails exactly once (frame 3)."""

        def __init__(self, path):
            self._inner = VideoReader(path, begin=0)
            self.height, self.width = self._inner.height, self._inner.width
            self._i = 0

        def read_into(self, out) -> bool:
            ok = self._inner.read_into(out)
            failed = self._i == bad
            self._i += 1
            return ok and not failed

        def close(self):
            self._inner.close()

    clips = {}

    class Grab:
        def write_clip(self, begin, chunk):
            clips[begin] = np.stack(chunk)

        def wait(self):
            pass

    reader = FlakyReader(str(video))
    try:
        n = process_segment(pipe, reader, Grab(), 0, 6, max_frame_count=16,
                            batch_size=2)
    finally:
        reader.close()
    assert n == 6
    np.testing.assert_array_equal(clips[0], oracle)


def test_segment_decoder_crash_raises_not_truncates(tmp_path):
    """A decode-thread CRASH (as opposed to a per-frame read failure, which
    degrades to black) must raise out of process_segment into the error
    funnel — the queue's EOF sentinel used to be put in a finally, so a
    crashed decoder masqueraded as a clean, silently short segment."""
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32")
    pipe = SbsPipeline(model, params, H, W, run_cfg=cfg)
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 6, h=H, w=W)

    class CrashingReader:
        def __init__(self, path):
            self._inner = VideoReader(path, begin=0)
            self.height, self.width = self._inner.height, self._inner.width
            self._i = 0

        def read_into(self, out) -> bool:
            if self._i == 3:
                raise OSError("decoder wedged mid-stream")
            self._i += 1
            return self._inner.read_into(out)

        def close(self):
            self._inner.close()

    class Grab:
        def write_clip(self, begin, chunk):
            pass

        def wait(self):
            pass

    reader = CrashingReader(str(video))
    try:
        with pytest.raises(RuntimeError, match="decode thread crashed"):
            process_segment(pipe, reader, Grab(), 0, 6, max_frame_count=16,
                            batch_size=2)
    finally:
        reader.close()


def test_sharded_decoder_crash_raises(tmp_path, monkeypatch):
    """Same contract for the sharded runner's decode thread: a reader crash
    surfaces as an exception from run_sharded (and the finally still closes
    readers/writer) instead of truncating segments silently."""
    import vr_video_generator_tpu.runtime.sharded_runner as sr

    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 8, h=H, w=W)
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32")

    class CrashingReader(VideoReader):
        def frames(self, lo, hi):
            for k, f in enumerate(super().frames(lo, hi)):
                if lo + k >= 5:
                    raise OSError("decoder wedged")
                yield f

    monkeypatch.setattr(sr, "VideoReader", CrashingReader)
    import jax
    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    pipe = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    with pytest.raises(RuntimeError, match="decode thread crashed"):
        run_sharded(pipe, str(video), str(tmp_path / "sub") + os.sep,
                    0, 8, max_frame_count=4, batch_size=2,
                    writer_backend="cv2")
