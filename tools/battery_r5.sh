#!/bin/bash
# Round-5 evidence battery — run AFTER any other TPU job has exited (the
# axon tunnel is exclusive: a second TPU process blocks until the first
# releases the chip). Strictly sequential; each stage tolerates failure.
# Quick stages run FIRST so evidence lands early. Outputs land in
# /tmp/measure_r5 AND the committed artifacts/ dir.
set -u
OUT=${1:-/tmp/measure_r5}
mkdir -p "$OUT" artifacts
cd "$(dirname "$0")/.."

stamp() { date -u +%H:%M:%S; }

echo "== [$(stamp)] 1. render bench: turntable + animation (production cfg)"
timeout 2400 python bench.py 2>"$OUT/bench.err" | tee "$OUT/bench.json"
timeout 2400 python bench.py --animation 2>"$OUT/bench_anim.err" \
  | tee "$OUT/bench_anim.json"

echo "== [$(stamp)] 2. measured 8-chip projection (per-chip band program)"
timeout 2400 python tools/dp_overhead_bench.py 2>"$OUT/dp_overhead.err" \
  | tee "$OUT/dp_overhead.jsonl"

echo "== [$(stamp)] 3. scaling bench (train-step rows + psum bound)"
timeout 3600 python tools/scaling_bench.py 2>"$OUT/scaling.err" \
  | tee "$OUT/scaling.jsonl"

echo "== [$(stamp)] 4. warp-cache quality gate (on-device A/B, 264px)"
timeout 7200 python tools/warp_cache_gate.py --size 264 \
  2>"$OUT/warp_gate.err" | tee "$OUT/warp_gate.jsonl"

echo "== [$(stamp)] 5. quality bench 540px (minutes-to-PSNR + budget table)"
timeout 10000 python tools/quality_bench.py --size 540 \
  --save-state "$OUT/trained_540.pkl" \
  2>"$OUT/quality.err" | tee "$OUT/quality.jsonl"

echo "== [$(stamp)] 6. demo artifact (30-epoch 540px + turntable FPS)"
timeout 8000 python tools/demo_artifact.py 2>"$OUT/demo.err" \
  | tee "$OUT/demo.jsonl"

echo "== [$(stamp)] collect into artifacts/"
for f in bench.json bench_anim.json dp_overhead.jsonl scaling.jsonl \
         warp_gate.jsonl quality.jsonl demo.jsonl; do
  [ -s "$OUT/$f" ] && cp "$OUT/$f" "artifacts/r5_$f"
done
echo "== [$(stamp)] done — commit artifacts/ and fold tables into PERF.md"
