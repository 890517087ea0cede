"""CPU smoke of the endurance-soak harness (scripts/soak.py).

The real soak runs ~100k frames on the TPU (SOAK_r04.json); this test
drives the same harness end-to-end at toy scale so the artifact
machinery — sampler thread, subclip-cadence stats, RSS slope, checker +
frame-count gates — cannot rot between real runs. Matches the
reference's production shape (hours-long conversions,
reference Journal.txt:33,49-53) at smoke size.
"""

import json
import os
import subprocess
import sys

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_soak_harness_smoke(tmp_path):
    video = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (64, 48))
    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (48, 128, 3), dtype=np.uint8)
    for i in range(24):
        w.write(np.ascontiguousarray(base[:, i % 64:i % 64 + 64]))
    w.release()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = tmp_path / "SOAK_smoke.json"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "soak.py"),
         "--video", str(video), "--workdir", str(tmp_path / "work"),
         "--out", str(out), "--depth_stride", "2", "--batch_size", "4",
         "--max_frame_count", "8", "--num_workers", "2",
         "--sample_every", "0.2", "--input_size", "56",
         "--compute_dtype", "float32"],
        capture_output=True, text=True, timeout=900,
        cwd=str(tmp_path), env=env)
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    assert "soak PASS" in p.stdout

    art = json.loads(out.read_text())
    assert art["rc"] == 0
    assert art["frames"] == 24
    assert art["checker_issues"] == []
    assert art["frame_count_diff"] == 0
    assert art["clip_fps"]["clips"] >= 1
    assert art["rss_mb"]["peak"] >= art["rss_mb"]["start"] > 0
    assert art["samples"], "sampler thread recorded nothing"
    # conversion must have been driven through real subprocess I/O
    assert "double" in art["encoder_io"] or "ffmpeg" in art["encoder_io"]


def test_device_soak_smoke(tmp_path):
    """Device-only endurance mode: the loop that proves flat device memory
    at production cadence when the relay's ~6 MB/s readback makes a full
    e2e 100k-frame soak infeasible (docs/BENCHLOG.md round 2)."""
    video = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (64, 48))
    rng = np.random.default_rng(12)
    for _ in range(40):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = tmp_path / "SOAK_device_smoke.json"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "soak.py"),
         "--device_only", "200", "--video", str(video),
         "--out", str(out), "--depth_stride", "2", "--batch_size", "4",
         "--input_size", "56", "--compute_dtype", "float32"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env)
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    assert "device soak PASS" in p.stdout

    art = json.loads(out.read_text())
    assert art["mode"] == "device_only"
    assert art["frames"] >= 200
    assert art["step_ms_per_frame"]["p50"] > 0
    assert art["samples"], "no endurance samples recorded"
