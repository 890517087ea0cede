"""Profiling hooks — jax.profiler traces + per-stage wall timing to CSV.

TPU-native replacement for the reference's line_profiler scaffolding and
bespoke CSV exporter (reference SupportFunction.py:13-40, integration points
PredictAndGenerate.py:58,217-219): stage timings are collected with
``StageTimer`` and dumped in a compatible function/line/hits/total-µs/per-hit
CSV; device-side profiles come from ``trace()`` (Perfetto/XProf via
jax.profiler.trace).
"""

from __future__ import annotations

import contextlib
import csv
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class StageTimer:
    """Accumulates wall-clock per named stage; CSV schema mirrors the
    reference's dump_line_profile_to_csv columns (SupportFunction.py:16-21)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.hits: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.hits[name] += 1

    def dump_csv(self, filename: str) -> None:
        file_exists = os.path.exists(filename)
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        with open(filename, "a", newline="", encoding="utf-8") as f:
            writer = csv.writer(f)
            if not file_exists:
                writer.writerow(["Function", "Line #", "Line Content",
                                 "Hits", "Total Time (µs)", "Per Hit (µs)"])
            for name in sorted(self.totals):
                total_us = self.totals[name] * 1e6
                hits = self.hits[name]
                writer.writerow([name, 0, "", hits, f"{total_us:.0f}",
                                 f"{total_us / max(hits, 1):.2f}"])


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Device-side profiler trace; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
