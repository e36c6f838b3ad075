#!/bin/bash
# Round-4e supplemental queue — coverage holes not in r4/r4b/r4c/r4d:
#   * c/z GEMM + HERK golden ladders (reference cgemm/zgemm, cherk/zherk are
#     full citizens — /root/reference/include/blas.h; our c/z files had no
#     L3 gemm/rank-k rows at all)
#   * z trmm/trsm below 1536 (r4b only records 1536/2048)
#   * d logdet_diag bandwidth ladder (VERDICT r3 #5: the committed d sweep
#     had 2 points vs the reference's cuslogdet ladder to n=2^20)
# Bounded + --resume-safe. Pass WAIT_PID to chain after a running queue.
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

run c gemm 256,512,1024 golden_tpu_v5_lite_c.jsonl
run c syrk 256,512,1024 golden_tpu_v5_lite_c.jsonl
run c gemm 2048 golden_tpu_v5_lite_c.jsonl
run c syrk 2048 golden_tpu_v5_lite_c.jsonl
run z gemm 256,512,1024 golden_tpu_v5_lite_z.jsonl
run z syrk 256,512,1024 golden_tpu_v5_lite_z.jsonl
run z trmm 256,512,1024 golden_tpu_v5_lite_z.jsonl
run z trsm 256,512,1024 golden_tpu_v5_lite_z.jsonl
run d logdet_diag 4096,16384,65536,262144,1048576 golden_tpu_v5_lite_d.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4e done $(date +%H:%M:%S) ==="
