#!/bin/bash
# One-command runbook for when the axon TPU relay comes back after an
# outage (first observed 2026-08-17; see docs/BENCHLOG.md). Runs every
# TPU-gated task queued during the outage, in order, with bounded
# timeouts, logging to relay_return_<UTC>.log beside the artifacts.
#
#   1. bench.py at HEAD (headline config 2) — validates the driver entry
#   2. interleaved same-hour banded-resize A/B (scripts/banded_ab.sh)
#   3. full parity matrix regen  -> BENCH_MATRIX_r03.jsonl
#   4. stride-2 matrix regen     -> BENCH_MATRIX_r03_stride2.jsonl
#   5. sharded mesh=(1,1) spot check on the real chip
#
# Safe to re-run; every step is read-only except the two matrix files.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# the outage workaround (JAX_PLATFORMS=cpu) must NOT leak into the real
# measurements — bench/stage_bench honor it and would silently produce
# CPU-smoke numbers in the committed matrix artifacts
unset JAX_PLATFORMS
stamp=$(date -u +%Y%m%dT%H%M%SZ)
log="relay_return_${stamp}.log"
exec > >(tee "$log") 2>&1

echo "== 0. relay probe =="
timeout 180 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d; print(d)"

echo "== 1. bench.py at HEAD (config 2) =="
timeout 2400 python bench.py

echo "== 2. banded-resize A/B (interleaved) =="
bash scripts/banded_ab.sh

echo "== 3. parity matrix -> BENCH_MATRIX_r03.jsonl =="
timeout 7200 python bench.py --all > BENCH_MATRIX_r03.jsonl
cat BENCH_MATRIX_r03.jsonl

echo "== 4. stride-2 matrix -> BENCH_MATRIX_r03_stride2.jsonl =="
timeout 7200 python bench.py --all --depth_stride 2 > BENCH_MATRIX_r03_stride2.jsonl
cat BENCH_MATRIX_r03_stride2.jsonl

echo "== 5. sharded mesh=(1,1) spot check =="
timeout 2400 python bench.py --sharded 1x1

echo "relay_return: ALL DONE — update docs/BENCHLOG.md + README with the"
echo "banded A/B outcome and commit the regenerated matrix files."
