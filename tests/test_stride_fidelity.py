"""CPU smoke of scripts/stride_fidelity_tpu.py — the device-level fidelity
artifact tool for the recommended production point (depth_stride 2 +
adaptive audit, docs/PARITY.md). Mechanics only: the committed artifact
comes from the TPU run at 1080p."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_stride_fidelity_smoke(tmp_path):
    out = tmp_path / "fid.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts/stride_fidelity_tpu.py"),
         "--height", "72", "--width", "128", "--frames", "40",
         "--input_size", "56", "--compute_dtype", "float32",
         "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=900)
    assert p.returncode == 0, p.stdout + p.stderr
    a = json.loads(out.read_text())

    # The motion schedule is built to exercise BOTH adaptive transitions:
    # decorrelated random-weight depth drops to full fidelity immediately
    # (audit rms >> 0.05), and the static hold re-raises the stride.
    kinds = [e["event"] for e in a["model_arm"]["events"]]
    assert "drop_to_full_depth" in kinds
    assert "re_raise_to_stride" in kinds

    # While dropped, the audited program ships per-frame depth: its output
    # must be identical to the stride-1 reference, batch for batch.
    for row in a["model_arm"]["trace"]:
        if row["mode"] == "full_depth":
            assert row["sbs_diff_px_pct"] == 0.0
            assert row["sbs_max_abs_u8"] == 0

    # The static hold is a fixed point of the stride lerp: forced-stride
    # output converges to the reference (anchors equal), audit rms hits 0.
    stat = a["model_arm"]["static_hold"]
    assert stat["audit_rms"]["max"] == 0.0

    # Coherent arm: zero motion -> zero divergence; motion -> nonzero rms.
    co = a["coherent_arm"]["trace"]
    assert co[-1]["rms"] == 0.0 and co[-1]["sbs_diff_px_pct"] == 0.0
    assert co[1]["rms"] > 0.0
