"""Driver-artifact guards: bench.py and __graft_entry__ must run anywhere.

The driver produces BENCH_r{N}.json from bench.py and compile-checks
__graft_entry__.entry(); a crash in either loses the round's external
artifacts, so both get CPU smoke coverage (bench.py shrinks itself on
non-TPU backends; entry() is trace-checked without executing the 1080p
program).
"""

import sys

import jax
import numpy as np


def test_bench_run_config_cpu_smoke():
    sys.path.insert(0, "/root/repo")
    import bench

    out = bench.run_config(2)
    assert set(out) == {"metric", "value", "unit", "vs_baseline"}
    assert out["value"] > 0 and out["unit"] == "frames/s"


def test_graft_entry_traces():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    # trace + lower only (compiling the full 1080p program on CPU is slow);
    # shape/dtype errors and fusion-gate breakage surface at trace time.
    lowered = jax.jit(fn).lower(*args)
    sbs_shape = lowered.out_info[0].shape
    assert tuple(sbs_shape)[1:] == (1080, 3840, 3)


def test_bench_exits_nonzero_on_init_timeout(tmp_path):
    """End-to-end: with a relay that never answers, bench.py prints one JSON
    failure line and exits 2 within the deadline instead of blocking."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the (stubbed) TPU pin win
    env["VRVG_INIT_TIMEOUT"] = "1"
    # simulate the dead relay: a sitecustomize whose backend probe blocks
    stub = tmp_path / "jax_stub"
    stub.mkdir()
    (stub / "jax").mkdir()
    (stub / "jax" / "__init__.py").write_text(
        "import time\n"
        "def devices(*a, **k):\n"
        "    time.sleep(3600)\n"
        "class config:\n"
        "    @staticmethod\n"
        "    def update(*a, **k):\n"
        "        pass\n")
    env["PYTHONPATH"] = f"{stub}:{os.getcwd()}"
    p = subprocess.run([sys.executable, "bench.py"], env=env,
                       capture_output=True, text=True, timeout=120,
                       cwd=os.getcwd())
    assert p.returncode == 2, (p.returncode, p.stdout, p.stderr)
    line = json.loads(p.stdout.strip().splitlines()[-1])
    assert line["metric"] == "backend_init_timeout"
    assert line["value"] == 0.0 and "relay" in line["error"]
    # the failure line points the reader at the last real-chip artifacts
    assert "BENCH_MATRIX" in line["last_real_chip"]
