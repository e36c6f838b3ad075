#!/bin/bash
# Round-4d: big-n s trmm/trsm (the reference sweeps custrsm/custrmm2 at
# n=15360 — test/test_gpublas.sh; our s ladders stopped at 4096) plus a
# d gemm ladder point. Run after goldens_r4b.sh; bounded + resume-safe.
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

# New-op coverage first (c/z gemm+herk, d logdet_diag): higher value per
# minute than the big-n s trmm/trsm points below; resume-safe either way.
bash tools/goldens_r4e.sh

run s trmm 6144 golden_tpu_v5_lite_s.jsonl
run s trsm 6144 golden_tpu_v5_lite_s.jsonl
run s trmm 8192 golden_tpu_v5_lite_s.jsonl
run s trsm 8192 golden_tpu_v5_lite_s.jsonl
run s trmm 15360 golden_tpu_v5_lite_s.jsonl
run s trsm 15360 golden_tpu_v5_lite_s.jsonl
run s lauum 8192 golden_tpu_v5_lite_s.jsonl
run s potri 8192 golden_tpu_v5_lite_s.jsonl
run d gemm 6144 golden_tpu_v5_lite_d.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4d done $(date +%H:%M:%S) ==="
