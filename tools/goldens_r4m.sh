#!/bin/bash
# Round-4m: first c/z GEMM + HERK golden rows (the reference treats
# cgemm/zgemm/cherk/zherk as first-class — include/blas.h:37-66; the r4e
# chunks that were meant to record them never ran). syrk with a complex
# dtype sweeps blocked.herk (tools/sweep.py point_syrk).
# Usage: WAIT_PIDS="..." bash tools/goldens_r4m.sh
set -u
cd "$(dirname "$0")/.."
OUT=bench_results

for p in ${WAIT_PIDS:-}; do
  while kill -0 "$p" 2>/dev/null; do sleep 15; done
done

run() {
  local d="$1" o="$2" s="$3" f="$4"; shift 4
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s $* ==="
  timeout 2400 python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

run c gemm 256,512,1024,2048,3072 golden_tpu_v5_lite_c.jsonl
run c syrk 256,512,1024,2048,3072 golden_tpu_v5_lite_c.jsonl
run z gemm 256,512,1024,2048 golden_tpu_v5_lite_z.jsonl
run z syrk 256,512,1024,2048 golden_tpu_v5_lite_z.jsonl
# trans-variant sample (reference sweeps nt/tn/tt too)
run c gemm 1024 golden_tpu_v5_lite_c.jsonl --config grid
run c syrk 1024 golden_tpu_v5_lite_c.jsonl --config grid

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4m done $(date +%H:%M:%S) ==="
