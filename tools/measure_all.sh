#!/bin/bash
# One-shot TPU measurement battery (VERDICT r2 items 1-4).
# Run from the repo root on a live TPU; outputs land in /tmp/measure_r3/.
set -u
OUT=${1:-/tmp/measure_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== 0. xplane profile of the fused render + train step (optimize from data)"
timeout 2400 env PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/profile_xplane.py bench >"$OUT/xplane_bench.txt" 2>"$OUT/xplane_bench.err"
timeout 2400 env PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/profile_xplane.py train >"$OUT/xplane_train.txt" 2>"$OUT/xplane_train.err"

echo "== 1. render bench (BENCH_r03 candidate)"
timeout 2400 python bench.py 2>"$OUT/bench.err" | tee "$OUT/bench.json"

echo "== 2. scaling bench (train-step rows + psum bound + cached-search row)"
timeout 3600 python tools/scaling_bench.py 2>"$OUT/scaling.err" \
  | tee "$OUT/scaling.jsonl"

echo "== 3. quality bench 540px (full budgets)"
timeout 14000 python tools/quality_bench.py --size 540 \
  2>"$OUT/quality.err" | tee "$OUT/quality.jsonl"

echo "== 4. demo artifact (30-epoch 540px + turntable FPS)"
timeout 10000 python tools/demo_artifact.py 2>"$OUT/demo.err" \
  | tee "$OUT/demo.jsonl"

echo "== done; outputs in $OUT (paste tables into PERF.md, commit artifacts/)"
