"""Two-process multi-host sharded conversion over a virtual 8-device mesh.

Spawns two real python processes that jax.distributed-initialize against a
local coordinator, each owning 4 virtual CPU devices; every process decodes
and encodes only its own ``data`` slots (runtime/sharded_runner.py). The
parent then checks the combined subclip directory covers the whole video
contiguously — the same integrity contract Check_Clips.py enforces in the
reference (Check_Clips.py:15-37).
"""

import os
import socket
import subprocess
import sys

import cv2
import numpy as np
import pytest

from vr_video_generator_tpu.video.check import check_subclips

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_video(path, n=24, h=48, w=64):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    rng = np.random.default_rng(3)
    for i in range(n):
        f = np.full((h, w, 3), (i * 11) % 256, np.uint8)
        f[:, : w // 3] = rng.integers(0, 255, 3, dtype=np.uint8)
        vw.write(f)
    vw.release()


@pytest.mark.slow
def test_two_process_sharded_conversion(tmp_path):
    _write_video(str(tmp_path / "in.mp4"))
    os.makedirs(tmp_path / "Subclip", exist_ok=True)
    port = _free_port()

    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(_WORKER))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(port), str(pid), "2", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    issues = check_subclips(str(tmp_path / "Subclip"), remove_bad=False)
    assert issues == []
    total = 0
    for name in os.listdir(tmp_path / "Subclip"):
        lo, hi = os.path.splitext(name)[0].split("_")
        total += int(hi) - int(lo) + 1
    assert total == 24

    # Per-process stride-audit lines: each host logs ONLY its own slots.
    # partition_segments rounds the step to the stride grid: 24 frames over
    # 8 slots at stride 2 -> step 4 -> slots 0-5 own [0,4)..[20,24) (2 full
    # audited steps each), slots 6-7 are empty (never logged).
    for pid, expect in ((0, [0, 0, 1, 1, 2, 2, 3, 3]), (1, [4, 4, 5, 5])):
        text = (tmp_path / f"mh_{pid}.txt").read_text()
        lines = [ln for ln in text.splitlines() if "stride audit" in ln]
        got = sorted(int(ln.split("slot ")[1].split()[0]) for ln in lines)
        assert got == expect, text[-1500:]
