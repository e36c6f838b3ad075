#!/bin/bash
# Round-4n stretch: fill the remaining big-n family holes, ordered by
# value per chip-minute. Chained after the final validation run
# (smoke/lookahead/bench) so it only consumes surplus chip time; the
# deadline killer stops it T-45min before round end.
#   P1  s potri/lauum/logdet 6144+8192 (family completeness: every other
#       s op already has >=8192 rows; these stop at 4096)
#   P2  c big-n extension to 4096 (trmm/trsm/trtri/lauum stop at 2048)
#   P3  z 4096 (embeds to an 8192 f64 Ozaki factor — d@8192 is proven)
#   P4  d BLAS to 8192 (gemm/trmm/trsm stop at 6144, syrk at 4096)
#   P5  c gemm@4096, c potrf@6144 (12288-real mega path)
#   P6  s gemm/syrk 12288 (pure-MXU ladder extension)
#   P7  z family densify at 3072
# Usage: WAIT_PIDS="..." bash tools/goldens_r4n.sh
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

# P1: complete the s driver family at headline sizes
run s potri,lauum,logdet 6144 golden_tpu_v5_lite_s.jsonl
run s potri,lauum,logdet 8192 golden_tpu_v5_lite_s.jsonl
# P2: c big-n
run c trmm,trsm 3072,4096 golden_tpu_v5_lite_c.jsonl
run c trtri,lauum 3072,4096 golden_tpu_v5_lite_c.jsonl
run c potri,logdet 4096 golden_tpu_v5_lite_c.jsonl
# P3: z 4096
run z potrf 4096 golden_tpu_v5_lite_z.jsonl
run z trmm,trsm 4096 golden_tpu_v5_lite_z.jsonl
# P4: d BLAS to 8192
run d syrk 6144,8192 golden_tpu_v5_lite_d.jsonl
run d gemm,trmm,trsm 8192 golden_tpu_v5_lite_d.jsonl
# P5: c gemm@4096 + potrf@6144
run c gemm 4096 golden_tpu_v5_lite_c.jsonl
run c potrf 6144 golden_tpu_v5_lite_c.jsonl
# P6: s pure-MXU ladder to 12288
run s gemm,syrk 12288 golden_tpu_v5_lite_s.jsonl
# P7: z densify at 3072
run z potri,trtri,lauum,logdet 3072 golden_tpu_v5_lite_z.jsonl
run z gemm,syrk 3072 golden_tpu_v5_lite_z.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4n done $(date +%H:%M:%S) ==="
