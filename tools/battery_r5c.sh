#!/bin/bash
# Round-5 battery, pass C — measures the stride (block-row round-robin)
# ray-DP layout that replaced contiguous bands as the DPFrameRenderer
# default, and pins the last unmeasured term of the 60-s projection
# (the DP-step host term). Strictly sequential; the axon tunnel is
# exclusive and this box has ONE core.
set -u
OUT=${1:-/tmp/measure_r5c}
mkdir -p "$OUT" artifacts
cd "$(dirname "$0")/.."

stamp() { date -u +%H:%M:%S; }

echo "== [$(stamp)] 1. 8-chip projection, stride layout (opaque toy)"
timeout 2400 python tools/dp_overhead_bench.py --skip-band \
  2>"$OUT/dp_stride_toy.err" | tee "$OUT/dp_stride_toy.jsonl"

echo "== [$(stamp)] 2. regenerate the trained 540px state (30 epochs)"
timeout 4800 python tools/quality_bench.py --size 540 --epochs 30 \
  --save-state "$OUT/trained_540.pkl" --skip-table \
  2>"$OUT/trained_regen.err" | tee "$OUT/trained_regen.jsonl"

echo "== [$(stamp)] 3. 8-chip projection, stride layout (trained avatar)"
timeout 2400 python tools/dp_overhead_bench.py --skip-band \
  --trained "$OUT/trained_540.pkl" \
  2>"$OUT/dp_stride_trained.err" | tee "$OUT/dp_stride_trained.jsonl"

echo "== [$(stamp)] 4. DP-step host term (8-way virtual CPU mesh)"
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 2400 python tools/dp_step_host.py \
  2>"$OUT/dp_step_host.err" | tee "$OUT/dp_step_host.jsonl"

echo "== [$(stamp)] collect into artifacts/"
cat "$OUT/dp_stride_toy.jsonl" "$OUT/dp_stride_trained.jsonl" \
  > artifacts/r5_dp_stride.jsonl 2>/dev/null || true
[ -s "$OUT/dp_step_host.jsonl" ] \
  && cp "$OUT/dp_step_host.jsonl" artifacts/r5_dp_step_host.jsonl
echo "== [$(stamp)] done — fold into PERF.md"
