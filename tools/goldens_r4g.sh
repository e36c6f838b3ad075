#!/bin/bash
# Round-4g: stretch goals after the master queue — even-bigger-n headline
# points. A 32768^2 f32 operand is 4.3 GB (fits v5e HBM with factor +
# workspace); chunks that exceed memory or the 2400 s bound fail gracefully
# and record nothing. Run LAST: pass WAIT_PID=<master queue pid>.
set -u
cd "$(dirname "$0")/.."
OUT=bench_results

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
fi

run() {
  local d="$1" o="$2" s="$3" f="$4"; shift 4
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s $* ==="
  timeout 2400 python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

run s potrf 24576 golden_tpu_v5_lite_s.jsonl
run s potrf 32768 golden_tpu_v5_lite_s.jsonl
run s trtri 16384 golden_tpu_v5_lite_s.jsonl
run s gemm 6144,8192 golden_tpu_v5_lite_s.jsonl
run s syrk 6144,8192 golden_tpu_v5_lite_s.jsonl
run d potrf 12288 golden_tpu_v5_lite_d.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4g done $(date +%H:%M:%S) ==="
