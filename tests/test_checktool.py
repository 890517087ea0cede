"""python -m vr_video_generator_tpu.checktool — report and repair modes."""

import os

from tests.test_video import write_synthetic_video
from vr_video_generator_tpu import checktool
from vr_video_generator_tpu.video.check import check_subclips


def test_report_mode_lists_issues_without_touching_files(tmp_path, capsys):
    sub = tmp_path / "Subclip"
    sub.mkdir()
    write_synthetic_video(sub / "0_3.mp4", 4, h=48, w=64)
    write_synthetic_video(sub / "6_9.mp4", 4, h=48, w=64)  # gap at 4..5
    rc = checktool.main(["--SubClipDir", str(sub)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "continuity issue" in out and "(4, 6)" in out
    assert sorted(os.listdir(sub)) == ["0_3.mp4", "6_9.mp4"]  # untouched


def test_repair_mode_regenerates_broken_range(tmp_path):
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 8, h=70, w=126)
    sub = tmp_path / "Subclip"
    debug = tmp_path / "Debug"
    sub.mkdir()
    debug.mkdir()
    # full conversion first, via the CLI config surface checktool reuses
    from vr_video_generator_tpu.cli import parse_run_config
    from vr_video_generator_tpu.runtime.orchestrator import convert_range

    flags = ["--VideoDir", str(video), "--SubClipDir", str(sub) + os.sep,
             "--DebugDir", str(debug) + os.sep, "--Max_Frame_Count", "4",
             "--batch_size", "4", "--input_size", "56",
             "--compute_dtype", "float32", "--allow_random_weights"]
    cfg, _ = parse_run_config(flags)
    convert_range(cfg, 0, 8, allow_random=True)
    assert check_subclips(str(sub)) == []

    # kill one subclip mid-write, then repair through the module entry
    with open(sub / "4_7.mp4", "wb") as f:
        f.write(b"not a video")
    rc = checktool.main(["--SubClipDir", str(sub) + os.sep,
                         "--repair_mode", "1"] + flags)
    assert rc == 0
    assert check_subclips(str(sub)) == []


def test_random_sleep_bounds(capsys):
    """Parity helper (reference SupportFunction.py:64-71): sleeps within
    the range and announces the length."""
    import time

    from vr_video_generator_tpu.utils.fsutil import random_sleep

    t0 = time.monotonic()
    random_sleep((0.01, 0.05), message="stagger")
    elapsed = time.monotonic() - t0
    assert 0.005 <= elapsed < 1.0
    assert "stagger" in capsys.readouterr().out
