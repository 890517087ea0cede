#!/bin/bash
# Same-hour banded-resize A/B on the attached TPU.
#
# Chip-day drift is 174-193 fps on an identical binary (docs/BENCHLOG.md),
# so only interleaved same-hour arms are meaningful: each rep runs both
# VRVG_BANDED_RESIZE settings back-to-back, twice, for stage timings
# (scripts/stage_bench.py: the bicubic upsample rows move) and the headline
# config-2 fps; config 5 (4K — the largest dense-upsample FLOP share) gets
# one interleaved pass at the end.
set -e
cd "$(dirname "$0")/.."
# scripts/*.py put scripts/ (not the repo root) on sys.path[0]; make the
# package importable regardless of the caller's environment
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
for rep in 1 2; do
  for banded in 1 0; do
    echo "=== rep $rep banded=$banded stage_bench ==="
    VRVG_BANDED_RESIZE=$banded timeout 2400 python scripts/stage_bench.py
    echo "=== rep $rep banded=$banded bench config 2 ==="
    VRVG_BANDED_RESIZE=$banded timeout 2400 python bench.py
  done
done
for banded in 1 0; do
  echo "=== banded=$banded bench config 5 ==="
  VRVG_BANDED_RESIZE=$banded timeout 3600 python bench.py --config 5
done
