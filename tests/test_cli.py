"""CLI flag-surface and UI tests."""


import pytest

from vr_video_generator_tpu.cli import parse_run_config
from vr_video_generator_tpu.ui.app import (
    auto_output_name,
    build_command,
    _with_auto_output,
    DEFAULT_FIELDS,
)
from vr_video_generator_tpu.utils.config import StereoConfig


def test_defaults_match_reference():
    cfg, args = parse_run_config([])
    assert cfg.debug_dir == "./Debug/"
    assert cfg.subclip_dir == "./Subclip/"
    assert cfg.encoder == "vits"
    assert cfg.offset_fg == 0.025
    assert cfg.offset_bg == -0.01
    assert cfg.offset_step_size == 1
    assert cfg.num_workers == 4
    assert cfg.max_frame_count == 15
    assert cfg.start_frame == 0
    assert cfg.repair_mode == 0
    assert not args.allow_random_weights
    assert cfg.mesh_shape is None


def test_unknown_flags_ignored():
    cfg, _ = parse_run_config(["--totally_unknown", "5", "--encoder", "vitb"])
    assert cfg.encoder == "vitb"


def test_offset_sign_fixup():
    # both positive -> bg flipped (reference PredictAndGenerate.py:387-393)
    cfg, _ = parse_run_config(["--offset_fg", "0.02", "--offset_bg", "0.01"])
    assert cfg.offset_bg == -0.01 and cfg.offset_fg == 0.02
    # both negative -> fg flipped
    cfg, _ = parse_run_config(["--offset_fg", "-0.02", "--offset_bg", "-0.01"])
    assert cfg.offset_fg == 0.02 and cfg.offset_bg == -0.01


def test_stereo_config_normalization_and_weights():
    s = StereoConfig(offset_fg=-0.03, offset_bg=-0.01).normalized()
    assert s.offset_fg == 0.03 and s.offset_bg == -0.01
    w = s.dampening_weights
    assert abs(w[0] - 0.58) < 1e-12
    assert abs(w[1] - 0.3) < 1e-12
    assert abs(w[2] - 0.12) < 1e-12
    assert s.max_planes(1080) > 0


def test_depth_scaler_override_reaches_model_config():
    """--depth_scaler (the value real_weights_runbook.py calibrates for
    off-family checkpoints) must override the shipped per-encoder constant
    in the ModelConfig the pipeline jits; 0 keeps the shipped value."""
    from vr_video_generator_tpu.utils.config import DEPTH_SCALERS

    cfg, _ = parse_run_config(["--encoder", "vitg"])
    assert cfg.model().depth_scaler == DEPTH_SCALERS["vitg"]
    cfg, _ = parse_run_config(["--encoder", "vitg", "--depth_scaler", "0.026"])
    assert cfg.model().depth_scaler == 0.026
    cfg, _ = parse_run_config(["--encoder", "vits", "--depth_scaler", "2.5"])
    assert cfg.model().depth_scaler == 2.5


def test_knob_flags_reach_their_subsystems(monkeypatch, tmp_path):
    """Every RunConfig knob is settable from the command line and lands in
    the component that consumes it (VERDICT r2 #8)."""
    cfg, _ = parse_run_config([
        "--sbs_output", "packed", "--mlp_fused", "xla", "--tail", "xla",
        "--reader_backend", "cv2", "--writer_backend", "cv2",
        "--warp_impl", "pallas",
    ])
    assert cfg.sbs_output == "packed"
    assert cfg.mlp_fused == "xla"
    assert cfg.tail == "xla"
    assert cfg.reader_backend == "cv2"
    assert cfg.writer_backend == "cv2"

    # model(): mlp_fused flows into the ModelConfig the ViT blocks read
    assert cfg.model().mlp_fused == "xla"

    # factory: tail/mlp_fused land on the flax module
    from vr_video_generator_tpu.models.factory import load_model

    model, _ = load_model("vits", None, allow_random=True,
                          mlp_fused="xla", tail="xla")
    assert model.tail == "xla" and model.cfg.mlp_fused == "xla"

    # pipeline: sbs_output selects the emit path
    import dataclasses

    from vr_video_generator_tpu.pipeline import SbsPipeline

    run_cfg = dataclasses.replace(cfg, warp_impl="xla", sbs_output="u8")
    pipe = SbsPipeline.create(run_cfg, 36, 64, allow_random=True)
    assert pipe.sbs_emit == "u8" and pipe.model.tail == "xla"

    # runtimes: backends are threaded into reader/writer constructors
    import vr_video_generator_tpu.runtime.orchestrator as orch

    seen = {}

    class FakeReader:
        def __init__(self, path, begin=0, backend="auto"):
            seen["reader"] = backend
            raise RuntimeError("stop here")

    monkeypatch.setattr(orch, "VideoReader", FakeReader)
    monkeypatch.setattr(orch, "probe_video", lambda p: (30.0, 10, 64, 36))
    monkeypatch.setattr(orch.SbsPipeline, "create",
                        staticmethod(lambda *a, **k: pipe))
    run_cfg2 = dataclasses.replace(
        run_cfg, reader_backend="cv2", writer_backend="cv2",
        subclip_dir=str(tmp_path), debug_dir=str(tmp_path),
        encoder_device="")
    try:
        orch.convert_range(run_cfg2, 0, 10)
    except RuntimeError:
        pass
    assert seen["reader"] == "cv2"


def test_ui_command_preview():
    fields = dict(DEFAULT_FIELDS)
    fields["VideoDir"] = "/tmp/My Movie.mp4"
    cmd = build_command(_with_auto_output(fields))
    assert "--VideoDir" in cmd
    out = cmd[cmd.index("--OutputDir") + 1]
    assert out == "/tmp/SBS My Movie.mkv"
    assert auto_output_name("a/b.mp4") == "a/SBS b.mkv"


def test_pipeline_process_run_stop():
    import sys
    import time

    from vr_video_generator_tpu.ui.app import PipelineProcess

    proc = PipelineProcess()
    assert not proc.running()
    proc.start([sys.executable, "-c", "import time; time.sleep(60)"])
    assert proc.running()
    t0 = time.time()
    proc.stop()
    assert time.time() - t0 < 12
    assert not proc.running()
    proc.stop()  # idempotent


def test_pipeline_process_stop_kills_process_group(tmp_path):
    """Stop must take down the WHOLE process group — grandchildren included —
    matching the reference's psutil child-tree kill (UserInterface.py:127-140).
    The pipeline child spawns encoder subprocesses; orphaning them would leak
    ffmpeg/cv2 writers after Stop."""
    import os
    import signal
    import sys
    import time

    from vr_video_generator_tpu.ui.app import PipelineProcess

    pidfile = tmp_path / "grandchild.pid"
    child_code = (
        "import subprocess, sys;"
        "p = subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(60)']);"
        f"open({str(pidfile)!r}, 'w').write(str(p.pid));"
        "p.wait()"
    )
    proc = PipelineProcess()
    proc.start([sys.executable, "-c", child_code])
    for _ in range(200):
        if pidfile.exists() and pidfile.read_text().strip():
            break
        time.sleep(0.05)
    else:
        proc.stop()
        raise AssertionError("grandchild never started")
    gpid = int(pidfile.read_text())

    proc.stop()

    def gone(pid: int) -> bool:
        try:
            with open(f"/proc/{pid}/stat") as fh:
                return fh.read().split(") ")[-1].split()[0] == "Z"
        except (FileNotFoundError, ProcessLookupError):
            return True

    for _ in range(200):
        if gone(gpid):
            break
        time.sleep(0.05)
    else:
        os.kill(gpid, signal.SIGKILL)
        raise AssertionError("grandchild survived stop() — group kill failed")


def test_cli_mesh_end_to_end(tmp_path):
    """Full CLI drive of the SHARDED runtime: --mesh 2x1 over two virtual
    CPU devices converts, subclips land, combine produces the double-width
    output, and the post-combine count check prints. This is the scale-out
    entry users of the reference's worker fleet would reach for
    (PredictAndGenerate.py:273-321)."""
    import os
    import subprocess
    import sys

    import cv2
    import numpy as np

    video = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (64, 48))
    rng = np.random.default_rng(3)
    for _ in range(12):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2").strip()
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    out = tmp_path / "out.mkv"
    # cwd=tmp_path so combine's temp files (input_list.txt, temp_video.mkv,
    # side-cars) land in the test dir, not the repo checkout
    p = subprocess.run(
        [sys.executable, "-m", "vr_video_generator_tpu.cli",
         "--VideoDir", str(video), "--OutputDir", str(out),
         "--DebugDir", str(tmp_path / "Debug") + os.sep,
         "--SubClipDir", str(tmp_path / "Subclip") + os.sep,
         "--mesh", "2x1", "--Max_Frame_Count", "6", "--batch_size", "2",
         "--input_size", "56", "--compute_dtype", "float32",
         "--allow_random_weights"],
        capture_output=True, text=True, timeout=900,
        cwd=str(tmp_path), env=env)
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    assert "difference: 0" in p.stdout
    cap = cv2.VideoCapture(str(out))
    assert (int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))) == (12, 128)


def test_swapped_offset_signs_rejected_clearly():
    """fg<0/bg>0 passes the reference's same-sign fixup untouched, then used
    to size a NEGATIVE plane table and crash with an obscure shape error —
    normalized() must reject it with a message naming the problem."""
    with pytest.raises(ValueError, match="swapped"):
        StereoConfig(offset_fg=-0.025, offset_bg=0.01).normalized()
