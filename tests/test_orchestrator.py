"""Orchestrator tests: repair modes, resume, check-and-repair loop."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_pipeline import TINY, H, W
from tests.test_video import write_synthetic_video, FPS
from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
from vr_video_generator_tpu.models.factory import random_params
from vr_video_generator_tpu.pipeline import SbsPipeline
from vr_video_generator_tpu.runtime import orchestrator
from vr_video_generator_tpu.utils.config import RunConfig
from vr_video_generator_tpu.video.check import check_subclips
from vr_video_generator_tpu.video.combine import sorted_subclips
from vr_video_generator_tpu.video.reader import probe_video


@pytest.fixture
def env(tmp_path):
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 12, h=H, w=W)
    cfg = RunConfig(
        video_dir=str(video),
        output_dir=str(tmp_path / "out.mkv"),
        debug_dir=str(tmp_path / "Debug") + os.sep,
        subclip_dir=str(tmp_path / "Subclip") + os.sep,
        max_frame_count=4, batch_size=4, input_size=56,
        compute_dtype="float32",
    )
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    pipeline = SbsPipeline(model, random_params(model), H, W, run_cfg=cfg)
    return cfg, pipeline


def test_convert_range_and_repair(env):
    cfg, pipeline = env
    n = orchestrator.convert_range(cfg, 0, 12, pipeline=pipeline)
    assert n == 12
    clips = sorted_subclips(cfg.subclip_dir)
    assert clips == ["0_3.mp4", "4_7.mp4", "8_11.mp4"]
    assert check_subclips(cfg.subclip_dir) == []

    # sabotage: delete the middle clip, then check-and-repair regenerates it
    os.remove(os.path.join(cfg.subclip_dir, "4_7.mp4"))
    issues = check_subclips(cfg.subclip_dir)
    assert len(issues) == 1 and issues[0].repair_range == (4, 8)
    orchestrator.convert_range(cfg, 4, 8, pipeline=pipeline)
    assert check_subclips(cfg.subclip_dir) == []


def test_repair_heals_clip_truncated_by_worker_death(env):
    """A worker killed mid-encode leaves a named-but-unreadable subclip
    (cv2 reports 0 frames for it). The checker must flag it as a length
    issue, remove it, and check_and_repair must regenerate the exact range
    (reference Check_Clips.py:19-37 recovery contract)."""
    cfg, pipeline = env
    orchestrator.convert_range(cfg, 0, 12, pipeline=pipeline)

    victim = os.path.join(cfg.subclip_dir, "4_7.mp4")
    with open(victim, "wb") as f:
        f.write(b"\x00\x01partial-write-then-SIGKILL")

    issues = orchestrator.check_and_repair(cfg, repair=True, pipeline=pipeline)
    assert [(i.kind, i.repair_range) for i in issues] == [("length", (4, 8))]
    assert check_subclips(cfg.subclip_dir) == []
    assert sorted_subclips(cfg.subclip_dir) == ["0_3.mp4", "4_7.mp4", "8_11.mp4"]


def test_repair_mode_2_combines_existing(env, monkeypatch, tmp_path):
    cfg, pipeline = env
    monkeypatch.chdir(os.path.dirname(cfg.video_dir))
    orchestrator.convert_range(cfg, 0, 12, pipeline=pipeline)
    import dataclasses
    cfg2 = dataclasses.replace(cfg, repair_mode=2)
    # run() would rebuild the pipeline with real weights; call combine via run
    # path for mode 2 only (no conversion happens)
    orchestrator.run(cfg2, allow_random=True)
    _, frames, w, h = probe_video(cfg.output_dir)
    assert (frames, w, h) == (12, 2 * W, H)


class _CaptureWriter:
    """write_clip-compatible stub capturing raw frames (no codec loss)."""

    def __init__(self, *a, **k):
        self.clips = {}

    def write_clip(self, begin, frames):
        self.clips[begin] = np.stack(frames)

    def wait(self):
        pass

    def close(self):
        pass


def test_repair_range_keeps_absolute_anchor_grid(tmp_path, monkeypatch):
    """depth_stride > 1: a repair range whose begin is NOT a stride multiple
    must regenerate frames bit-identical to the original full run — anchor
    groups align to absolute video frame indices (processing starts at the
    aligned frame, leading outputs discarded), not to the segment begin."""
    import dataclasses

    video = tmp_path / "in.mp4"
    n_frames = 16
    write_synthetic_video(video, n_frames, h=H, w=W)
    cfg = RunConfig(
        video_dir=str(video), debug_dir=str(tmp_path / "Debug") + os.sep,
        subclip_dir=str(tmp_path / "Subclip") + os.sep,
        max_frame_count=16, batch_size=4, input_size=56,
        compute_dtype="float32", depth_stride=2, warmup_frames=4,
    )
    os.makedirs(cfg.debug_dir, exist_ok=True)
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    pipeline = SbsPipeline(model, params, H, W, run_cfg=cfg)

    # oracle: one cold sequential strided run over the whole video
    oracle = SbsPipeline(model, params, H, W, run_cfg=cfg)
    st = oracle.initial_state()
    outs = []
    frames = []
    from vr_video_generator_tpu.video.reader import VideoReader
    with VideoReader(str(video), begin=0) as r:
        frames = np.stack(list(r.frames(0, n_frames)))
    for i in range(0, n_frames, 4):
        sbs, st = oracle.step(frames[i:i + 4], st)
        outs.append(np.asarray(sbs))
    full = np.concatenate(outs)

    captured = {}

    class Grab(_CaptureWriter):
        def __init__(self, *a, **k):
            self.clips = captured

    monkeypatch.setattr(orchestrator, "SubclipWriter", Grab)
    # repair begins at 5 (odd) and 9 (odd): both off the stride-2 grid
    n = orchestrator.convert_range(cfg, 5, 9, pipeline=pipeline)
    assert n == 4
    np.testing.assert_array_equal(captured[5], full[5:9])

    captured.clear()
    cfg2 = dataclasses.replace(cfg, warmup_frames=8)
    n = orchestrator.convert_range(cfg2, 9, 16, pipeline=pipeline)
    assert n == 7
    np.testing.assert_array_equal(captured[9], full[9:16])


def test_error_funnel_writes_error_txt(env, monkeypatch):
    """A segment failure must append context + traceback to the shared
    Debug/ERROR.txt (reference PredictAndGenerate.py:259-272 funnel) and to
    the per-segment log, then re-raise so the caller sees the failure."""
    cfg, pipeline = env

    def boom(*a, **k):
        raise RuntimeError("simulated mid-segment failure")

    monkeypatch.setattr(orchestrator, "process_segment", boom)
    with pytest.raises(RuntimeError, match="simulated mid-segment failure"):
        orchestrator.convert_range(cfg, 0, 12, pipeline=pipeline)

    error_txt = os.path.join(cfg.debug_dir, "ERROR.txt")
    assert os.path.exists(error_txt)
    text = open(error_txt).read()
    assert "[ERROR] Segment 0 failed: simulated mid-segment failure" in text
    assert "Traceback" in text and "RuntimeError" in text
    seg_log = open(os.path.join(cfg.debug_dir, "segment_0.txt")).read()
    assert "simulated mid-segment failure" in seg_log

    # a second failure APPENDS (a+), preserving the first record
    with pytest.raises(RuntimeError):
        orchestrator.convert_range(cfg, 4, 8, pipeline=pipeline)
    text2 = open(error_txt).read()
    assert text2.count("[ERROR]") == 2 and text2.startswith(text[:40])


def test_random_range_stride_sweep(tmp_path, monkeypatch):
    """Seeded sweep: convert_range over random (stride, begin, end) with a
    full-history warm-up must reproduce the corresponding slice of one cold
    sequential run bit-exactly — the absolute-anchor-grid + halo-warm-up
    contract, fuzzed instead of hand-picked."""
    import dataclasses

    from vr_video_generator_tpu.video.reader import VideoReader

    video = tmp_path / "in.mp4"
    n_frames = 16
    write_synthetic_video(video, n_frames, h=H, w=W)
    base = RunConfig(
        video_dir=str(video), debug_dir=str(tmp_path / "Debug") + os.sep,
        subclip_dir=str(tmp_path / "Subclip") + os.sep,
        max_frame_count=16, batch_size=4, input_size=56,
        compute_dtype="float32",
    )
    os.makedirs(base.debug_dir, exist_ok=True)
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    params = random_params(model)
    with VideoReader(str(video), begin=0) as r:
        frames = np.stack(list(r.frames(0, n_frames)))

    captured = {}

    class Grab(_CaptureWriter):
        def __init__(self, *a, **k):
            self.clips = captured

    monkeypatch.setattr(orchestrator, "SubclipWriter", Grab)

    pipes, fulls = {}, {}
    for s in (1, 2, 4):
        cfg = dataclasses.replace(base, depth_stride=s)
        pipes[s] = SbsPipeline(model, params, H, W, run_cfg=cfg)
        st = pipes[s].initial_state()
        outs = []
        for i in range(0, n_frames, 4):
            sbs, st = pipes[s].step(frames[i:i + 4], st)
            outs.append(np.asarray(sbs))
        fulls[s] = np.concatenate(outs)

    sweep = np.random.default_rng(16)
    for trial in range(6):
        s = int(sweep.choice([1, 2, 4]))
        begin = int(sweep.integers(0, n_frames - 1))
        end = int(sweep.integers(begin + 1, n_frames + 1))
        warm = begin + int(sweep.integers(0, 5))  # covers the full history
        cfg = dataclasses.replace(base, depth_stride=s, warmup_frames=warm)
        captured.clear()
        n = orchestrator.convert_range(cfg, begin, end, pipeline=pipes[s])
        assert n == end - begin, trial
        got = np.concatenate([captured[k] for k in sorted(captured)])
        np.testing.assert_array_equal(
            got, fulls[s][begin:end],
            err_msg=f"trial {trial}: stride={s} [{begin},{end}) warm={warm}")


def test_run_reports_post_combine_frame_count(env, monkeypatch, capsys):
    """run() must end with the reference's post-combine frame-count check
    (Combine_Clips.py:56-62): both counts and the difference, printed."""
    import dataclasses

    cfg, pipeline = env
    monkeypatch.chdir(os.path.dirname(cfg.video_dir))
    orchestrator.convert_range(cfg, 0, 12, pipeline=pipeline)
    orchestrator.run(dataclasses.replace(cfg, repair_mode=2),
                     allow_random=True)
    out = capsys.readouterr().out
    assert "These frames count should be the same" in out
    assert "Original: 12 output: 12, difference: 0" in out


def test_check_and_repair_builds_one_pipeline_for_all_ranges(env, monkeypatch):
    """Without a prebuilt pipeline, check_and_repair must build ONE pipeline
    lazily and reuse it across every broken range — its real entry point
    (checktool) passes none, and each range used to re-load and re-jit the
    model."""
    cfg, pipeline = env
    orchestrator.convert_range(cfg, 0, 12, pipeline=pipeline)
    # two independent broken ranges: a corrupt clip + an interior gap
    # (head/tail deletions are out of the checker's contract)
    with open(os.path.join(cfg.subclip_dir, "0_3.mp4"), "wb") as f:
        f.write(b"\x00corrupt")
    os.remove(os.path.join(cfg.subclip_dir, "4_7.mp4"))

    builds = []

    def counting_create(cls, *a, **k):
        builds.append(1)
        return pipeline  # fixture pipeline: same cfg and geometry

    monkeypatch.setattr(orchestrator.SbsPipeline, "create",
                        classmethod(counting_create))
    issues = orchestrator.check_and_repair(cfg, repair=True, allow_random=True)
    assert len(issues) == 2
    assert builds == [1]
    assert check_subclips(cfg.subclip_dir) == []


def test_convert_range_rejects_non_single_chip_pipeline(env):
    """A ShardedSbsPipeline (or anything else) fed to the single-chip loop
    would reinterpret the batch as n_data separate temporal segments —
    refuse loudly."""
    cfg, _ = env
    with pytest.raises(TypeError, match="single-chip"):
        orchestrator.convert_range(cfg, 0, 4, pipeline=object())


def test_combine_only_modes_skip_backend_probe(env, monkeypatch):
    """repair_mode 2/3 are pure ffmpeg/cv2 host work: run() must not kick
    the JAX backend-init probe (on a TPU host that would contend for — or
    hang on — the device just to concatenate files)."""
    import dataclasses

    from vr_video_generator_tpu.utils import devwatch

    cfg, pipeline = env
    orchestrator.convert_range(cfg, 0, 12, pipeline=pipeline)
    probes = []
    monkeypatch.setattr(devwatch, "watch_backend_init",
                        lambda *a, **k: probes.append(1))
    orchestrator.run(dataclasses.replace(cfg, repair_mode=2),
                     allow_random=True)
    assert probes == []
    _, frames, w, h = probe_video(cfg.output_dir)
    assert (frames, w, h) == (12, 2 * W, H)


def test_overflow_surfaces_through_run_and_reports(tmp_path, monkeypatch,
                                                   capsys):
    """VERDICT r3 #8: over-cap depth driven through the CLI-level run() must
    produce (a) a user-visible stdout warning with the clamp count and the
    recalibration hint, (b) a machine-readable OVERFLOW.jsonl in the debug
    dir, and (c) the same warning in the checktool report and the GUI
    integrity view — an operator never has to read per-segment logs.
    (The reference's equivalent condition is silently unbounded,
    PredictAndGenerate.py:101-118.)"""
    from vr_video_generator_tpu.utils import config as cfgmod
    from vr_video_generator_tpu.utils.logging import (overflow_path,
                                                      summarize_overflow)

    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 8, h=H, w=W)
    # a huge scaler lands every frame's scaled depth over limit_step_cap
    monkeypatch.setitem(cfgmod.DEPTH_SCALERS, "vits", 1e6)
    cfg = RunConfig(
        video_dir=str(video), output_dir=str(tmp_path / "out.mkv"),
        debug_dir=str(tmp_path / "Debug") + os.sep,
        subclip_dir=str(tmp_path / "Subclip") + os.sep,
        max_frame_count=4, batch_size=4, input_size=56,
        compute_dtype="float32", warmup_frames=0,
    )
    orchestrator.run(cfg, allow_random=True)

    out = capsys.readouterr().out
    assert "exceeded limit_step_cap" in out
    assert "recalibrate" in out.lower() and "(vits)" in out
    total, n_recs = summarize_overflow(overflow_path(cfg.debug_dir))
    assert total >= 1 and n_recs >= 1

    # checktool report mode surfaces it without touching segment logs
    from vr_video_generator_tpu.checktool import main as checktool_main
    rc = checktool_main(["--SubClipDir", cfg.subclip_dir,
                         "--DebugDir", cfg.debug_dir])
    assert rc == 0
    tool_out = capsys.readouterr().out
    assert "OK: no issues" in tool_out
    assert f"exceeded limit_step_cap on {total} frame(s)" in tool_out

    # GUI integrity view (tkapp Verify Integrity -> integrity_report)
    from vr_video_generator_tpu.ui.app import integrity_report
    report = integrity_report(cfg.subclip_dir, cfg.video_dir,
                              debug_dir=cfg.debug_dir)
    assert f"exceeded limit_step_cap on {total} frame(s)" in report
    assert "OVERFLOW.jsonl" in report


def test_no_overflow_no_warning(env, capsys):
    """Clean runs must stay quiet: no OVERFLOW.jsonl, no warning anywhere."""
    from vr_video_generator_tpu.ui.app import integrity_report
    from vr_video_generator_tpu.utils.logging import overflow_path

    cfg, pipeline = env
    orchestrator.convert_range(cfg, 0, 12, pipeline=pipeline)
    assert not os.path.exists(overflow_path(cfg.debug_dir))
    report = integrity_report(cfg.subclip_dir, cfg.video_dir,
                              debug_dir=cfg.debug_dir)
    assert "limit_step_cap" not in report
