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


def test_bench_reps_median_and_spread(tmp_path, monkeypatch, capsys):
    """--reps N: config-major interleaving (rep 1 of every config before
    rep 2 of any) and a median value with min/max spread in the JSON line."""
    import json

    import bench

    calls = []

    def fake_run_config(c, gelu="exact", mesh_shape=None, depth_stride=1):
        calls.append(c)
        # drift: the second rep of every config is faster
        fps = 100.0 + c + (10.0 if calls.count(c) > 1 else 0.0)
        return bench._json_line(f"m{c}", fps)

    monkeypatch.setattr(bench, "run_config", fake_run_config)
    monkeypatch.setattr(
        sys, "argv", ["bench.py", "--all", "--reps", "3"])
    bench.main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert [l["config"] for l in lines] == [1, 2, 3, 4, 5]
    # interleaved config-major: 1..5, 1..5, 1..5 — not 1,1,1,2,2,2…
    assert calls == [1, 2, 3, 4, 5] * 3
    for l in lines:
        c = l["config"]
        assert l["spread"] == {"min": 100.0 + c, "max": 110.0 + c, "reps": 3}
        assert l["value"] == 110.0 + c  # median of [base, base+10, base+10]
        assert l["vs_baseline"] == round(l["value"] / bench.BASELINE_FPS, 2)


def test_bench_default_line_has_no_spread(monkeypatch, capsys):
    """Bare default (the driver's contract): exactly one JSON line, no
    spread key, no config key."""
    import json

    import bench

    monkeypatch.setattr(bench, "run_config",
                        lambda c, **kw: bench._json_line("m", 123.0))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    line = json.loads(out[0])
    assert set(line) == {"metric", "value", "unit", "vs_baseline"}
