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
