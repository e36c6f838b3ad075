#!/bin/bash
# Round-4o surplus: consume whatever chip time is left after r4n before
# the T-45min deadline killer fires. Variant grids at headline sizes
# (the reference's per-variant logs are full-size, not toy), then pure
# ladder extensions. Every chunk is --resume-safe and oracle-verified.
# Avoids known HBM-exhaust shapes (s@32768, d@12288 and up, z>=6144
# which embeds to a 12288-point f64 Ozaki factor).
# Usage: WAIT_PIDS="..." bash tools/goldens_r4o.sh
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

# variant grids at the reference's full-size granularity
run s trmm,trsm 4096 golden_tpu_v5_lite_s.jsonl --config grid
run s potrf,potri,trtri,lauum,logdet 4096 golden_tpu_v5_lite_s.jsonl \
    --config grid
run d potrf,trmm,trsm 4096 golden_tpu_v5_lite_d.jsonl --config grid
# ladder extensions
run c potrf 8192 golden_tpu_v5_lite_c.jsonl
run s gemm,syrk 16384 golden_tpu_v5_lite_s.jsonl
run s potrf 20480 golden_tpu_v5_lite_s.jsonl
run c gemm 6144 golden_tpu_v5_lite_c.jsonl
run s gemm,syrk 2560,3328,3840 golden_tpu_v5_lite_s.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4o done $(date +%H:%M:%S) ==="
