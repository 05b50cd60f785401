#!/bin/bash
# One-shot TPU measurement battery (VERDICT items: quality/scaling/demo
# evidence + animation row + measured 8-chip projection).
# Run from the repo root on a live TPU; outputs land in /tmp/measure_r4/.
set -u
OUT=${1:-/tmp/measure_r4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== 0. xplane profile of the fused render + train step (optimize from data)"
timeout 2400 env PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/profile_xplane.py bench >"$OUT/xplane_bench.txt" 2>"$OUT/xplane_bench.err"
timeout 2400 env PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/profile_xplane.py train >"$OUT/xplane_train.txt" 2>"$OUT/xplane_train.err"

echo "== 1. render bench: turntable + animation (pose-varying) rows"
timeout 2400 python bench.py 2>"$OUT/bench.err" | tee "$OUT/bench.json"
timeout 2400 python bench.py --animation 2>"$OUT/bench_anim.err" \
  | tee "$OUT/bench_anim.json"

echo "== 2. scaling bench (train-step rows + psum bound + cached-search row)"
timeout 3600 python tools/scaling_bench.py 2>"$OUT/scaling.err" \
  | tee "$OUT/scaling.jsonl"

echo "== 3. measured 8-chip projection (per-chip band program on one chip)"
timeout 2400 python tools/dp_overhead_bench.py 2>"$OUT/dp_overhead.err" \
  | tee "$OUT/dp_overhead.jsonl"

echo "== 4. quality bench 540px (production train budgets + eval-budget table)"
timeout 14000 python tools/quality_bench.py --size 540 \
  --save-state "$OUT/trained_540.pkl" \
  2>"$OUT/quality.err" | tee "$OUT/quality.jsonl"

echo "== 5. demo artifact (30-epoch 540px + turntable FPS)"
timeout 10000 python tools/demo_artifact.py 2>"$OUT/demo.err" \
  | tee "$OUT/demo.jsonl"

echo "== done; outputs in $OUT (paste tables into PERF.md, commit artifacts/)"
