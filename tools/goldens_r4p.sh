#!/bin/bash
# Round-4p surplus (session 6).
#   P0  re-record the 96 stale pre-r4 s rows (archived to
#       golden_tpu_v5_lite_s_prer4_stale.jsonl): the whole s ladder at
#       n<=4096 predated the donated-alias fix, the HBM mono kernels and
#       the autotuned crossovers — the upper-variant rows at the same
#       sizes (fresh schema) run up to 2-4x faster, so the stale rows
#       both under-report the flagship dtype and mask regressions.
#   P1+ complete the per-dtype driver families at their recorded
#       ceilings, ordered by value per chip-minute.
# Avoids known HBM-exhaust shapes (s@32768, d@12288+, z@6144+ which
# embeds to a 12288-point f64 Ozaki factor). Every chunk is
# --resume-safe and oracle-verified.
# Usage: WAIT_PIDS="..." bash tools/goldens_r4p.sh
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

# P0: re-record the stripped pre-r4 s ladder on current code,
# headline-visible mid-range first
run s potrf,potri,trtri,lauum 1024,1280,1536,1792,2048 golden_tpu_v5_lite_s.jsonl
run s trmm,trsm,gemm,syrk,logdet 1024,1280,1536,1792,2048 golden_tpu_v5_lite_s.jsonl
run s potrf,potri,trtri,lauum 2560,3072,3584,4096 golden_tpu_v5_lite_s.jsonl
run s trmm 2560,3072,3584,4096 golden_tpu_v5_lite_s.jsonl
run s trsm 2560,3584 golden_tpu_v5_lite_s.jsonl
run s potrf,potri,trtri,lauum,trmm,trsm,gemm,syrk,logdet 256,512,768 golden_tpu_v5_lite_s.jsonl
run s potrf,trtri 128 golden_tpu_v5_lite_s.jsonl
# P1: s trmm/trsm at the 16384 headline size (family: potrf/trtri/gemm/
#     syrk@16384 recorded or queued in r4o)
run s trmm,trsm 16384 golden_tpu_v5_lite_s.jsonl
# P2: d driver family to 8192 (potrf/syrk/gemm/trmm/trsm already there)
run d trtri,lauum 8192 golden_tpu_v5_lite_d.jsonl
run d potri,logdet 8192 golden_tpu_v5_lite_d.jsonl
# P3: z family to 4096 (embeds to d@8192, proven by P2/r4n)
run z trtri,lauum 4096 golden_tpu_v5_lite_z.jsonl
run z potri,logdet 4096 golden_tpu_v5_lite_z.jsonl
run z gemm,syrk 4096 golden_tpu_v5_lite_z.jsonl
# P4: c herk@4096 (gemm@4096 in r4n P5) + c family densify at 6144
run c syrk 4096 golden_tpu_v5_lite_c.jsonl
run c trmm,trsm 6144 golden_tpu_v5_lite_c.jsonl
run c trtri,lauum 6144 golden_tpu_v5_lite_c.jsonl
# P5: d rectangular k-sweep (reference test_gpublas.sh parity for d)
run d gemm_k 256,512,1024,2048 golden_tpu_v5_lite_d.jsonl
# P6: c/z variant grids at 2048 (grids exist at 1024; the reference's
#     per-variant logs are full-size)
run c trmm,trsm 2048 golden_tpu_v5_lite_c.jsonl --config grid
run z trmm,trsm 2048 golden_tpu_v5_lite_z.jsonl --config grid
# P7: stretch — untested-but-plausible big shapes, one attempt each
run d potrf 10240 golden_tpu_v5_lite_d.jsonl
run s potrf 28672 golden_tpu_v5_lite_s.jsonl
run c potrf 6144 golden_tpu_v5_lite_c.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4p done $(date +%H:%M:%S) ==="
