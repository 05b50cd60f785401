#!/bin/bash
# Round-5 battery, pass B — re-measures everything whose meaning changed
# after the r5 mid-round levers landed:
#   * train_warp_cache default ON (on-device gate passed, r5_warp_gate)
#   * flat eval row-tile elimination (packed_cache pts_all path)
#   * dp_overhead_bench u8 payload fix (f16 fetch polluted pass A)
# Run with an OTHERWISE IDLE host: this box has ONE core, and concurrent
# CPU work inflates host-side dispatch in every wall-clock number.
set -u
OUT=${1:-/tmp/measure_r5b}
mkdir -p "$OUT" artifacts
cd "$(dirname "$0")/.."

stamp() { date -u +%H:%M:%S; }

echo "== [$(stamp)] 1. render bench A/B after the no-tile lever"
timeout 2400 python bench.py 2>"$OUT/bench.err" | tee "$OUT/bench.json"
timeout 2400 python bench.py --animation 2>"$OUT/bench_anim.err" \
  | tee "$OUT/bench_anim.json"

echo "== [$(stamp)] 2. measured 8-chip projection (u8 payload protocol)"
timeout 2400 python tools/dp_overhead_bench.py 2>"$OUT/dp_overhead.err" \
  | tee "$OUT/dp_overhead.jsonl"

echo "== [$(stamp)] 3. scaling bench (+ cached-search 512-ray row)"
timeout 3600 python tools/scaling_bench.py 2>"$OUT/scaling.err" \
  | tee "$OUT/scaling.jsonl"

echo "== [$(stamp)] 4. quality bench 540px under the NEW default (cached)"
timeout 10000 python tools/quality_bench.py --size 540 \
  --save-state "$OUT/trained_540.pkl" \
  2>"$OUT/quality.err" | tee "$OUT/quality.jsonl"

echo "== [$(stamp)] 5. demo artifact under the new default"
timeout 8000 python tools/demo_artifact.py 2>"$OUT/demo.err" \
  | tee "$OUT/demo.jsonl"

echo "== [$(stamp)] collect into artifacts/ (r5 files = final r5 numbers)"
for f in bench.json bench_anim.json dp_overhead.jsonl scaling.jsonl \
         quality.jsonl demo.jsonl; do
  [ -s "$OUT/$f" ] && cp "$OUT/$f" "artifacts/r5_$f"
done
echo "== [$(stamp)] done — fold into PERF.md"
