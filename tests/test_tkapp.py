"""FormModel (graphical-UI view-model) tests — headless.

The tkinter layer itself needs a display; everything it binds to
(field state, combo mapping, preview, validation, run/stop, debug listing)
lives in FormModel and is exercised here. Capability map: reference
UserInterface.py:30-50 (fields), :82-104 (preview/auto name), :106-140
(run/stop), :232/:253 (combos), :263 (debug browse).
"""

import os
import sys
import time

from vr_video_generator_tpu.ui.tkapp import (ENCODER_ITEMS, REPAIR_ITEMS,
                                             FormModel)


def test_defaults_and_preview_roundtrip():
    m = FormModel()
    assert m.fields["encoder"] == "vits"
    pv = m.preview()
    assert "--VideoDir" in pv and "--encoder vits" in pv
    # empty OutputDir is auto-derived in the preview (reference :100-104)
    assert "SBS input.mkv" in pv


def test_combo_label_value_mapping():
    m = FormModel()
    for label, value in ENCODER_ITEMS.items():
        m.set_encoder_item(label)
        assert m.fields["encoder"] == value
        assert m.encoder_label() == label
    for label, value in REPAIR_ITEMS.items():
        m.set_repair_item(label)
        assert m.fields["repair_mode"] == value
        assert m.repair_label() == label


def test_auto_output_and_validation():
    m = FormModel()
    m.set_field("VideoDir", "/data/movie night.mp4")
    assert m.auto_output() == "/data/SBS movie night.mkv"
    assert m.validate() is None
    m.set_field("batch_size", "eight")
    assert "batch_size" in m.validate()
    m.set_field("batch_size", "8")
    m.set_field("offset_fg", "big")
    assert "offset_fg" in m.validate()


def test_run_rejects_invalid_and_runs_valid(tmp_path):
    m = FormModel()
    m.set_field("batch_size", "nope")
    try:
        m.run()
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    # valid config: swap the command for a short sleep via PipelineProcess
    m.set_field("batch_size", "8")
    m.proc.start([sys.executable, "-c", "import time; time.sleep(30)"])
    assert m.running()
    m.stop()
    time.sleep(0.1)
    assert not m.running()


def test_debug_listing(tmp_path):
    m = FormModel()
    m.set_field("DebugDir", str(tmp_path))
    (tmp_path / "segment_0.txt").write_text("hi")
    (tmp_path / "ERROR.txt").write_text("boom")
    assert m.debug_listing() == ["ERROR.txt", "segment_0.txt"]
    m.set_field("DebugDir", str(tmp_path / "missing"))
    assert m.debug_listing() == []


def test_verify_report_ok_and_broken(tmp_path):
    """"Verify Integrity" (reference UserInterface.py:276 — a button with
    callback=None; implemented here): OK tree, then a gapped tree with the
    suggested repair command."""
    from tests.test_video import FPS, H, W, write_synthetic_video
    from vr_video_generator_tpu.video.writer import SubclipWriter
    import numpy as np

    m = FormModel()
    m.set_field("SubClipDir", str(tmp_path / "missing") + os.sep)
    assert "no subclip directory" in m.verify_report()

    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 10)
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    frames = np.random.default_rng(0).integers(0, 256, (10, H, W, 3),
                                               dtype=np.uint8)
    writer.write_clip(0, list(frames[:6]))
    writer.write_clip(6, list(frames[6:]))
    writer.close()
    m.set_field("SubClipDir", subdir)
    m.set_field("VideoDir", str(video))
    report = m.verify_report()
    assert "2 subclips covering frames [0, 9]" in report
    assert "all subclips OK" in report
    assert "coverage complete: 10/10" in report

    os.remove(os.path.join(subdir, "0_5.mp4"))
    writer2 = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    writer2.write_clip(0, list(frames[:4]))  # gap: frames 4-5 missing
    writer2.close()
    report = m.verify_report()
    assert "BAD continuity" in report
    assert "regenerate frames [4, 6)" in report
    assert "--repair_mode 1 --start_frame 4 --end_frame 6" in report
    assert "coverage: frames [0, 9] of 10" in report


def test_verify_report_survives_stray_files(tmp_path):
    """A leftover file that breaks the numeric subclip-name sort must produce
    a readable report line, not a traceback out of the UI callback."""
    subdir = tmp_path / "sub"
    subdir.mkdir()
    (subdir / "backup4").write_bytes(b"")  # ends in '4': picked up by sort
    m = FormModel()
    m.set_field("SubClipDir", str(subdir))
    report = m.verify_report()
    assert "cannot parse subclip names" in report
    assert "expected" in report


def test_repair_command_targets_checktool_with_repair_on():
    m = FormModel()
    m.set_field("VideoDir", "/tmp/in.mp4")
    m.set_field("repair_mode", "0")  # form value must NOT leak into repair
    cmd = m.repair_command()
    assert "vr_video_generator_tpu.checktool" in cmd
    assert "vr_video_generator_tpu.cli" not in cmd
    assert cmd[cmd.index("--repair_mode") + 1] == "1"
    assert cmd[cmd.index("--VideoDir") + 1] == "/tmp/in.mp4"


def test_repair_validates_and_spawns(monkeypatch):
    m = FormModel()
    m.set_field("batch_size", "nope")
    try:
        m.repair()
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    m.set_field("batch_size", "8")
    started = []
    monkeypatch.setattr(m.proc, "start", started.append)
    m.repair()
    assert started and "vr_video_generator_tpu.checktool" in started[0]
