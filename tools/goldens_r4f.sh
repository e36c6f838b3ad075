#!/bin/bash
# Round-4f MASTER continuation — the remaining r4/r4b/r4d/r4e work,
# reprioritized to fit the time left in the round (highest value per chip
# minute first).  Every chunk is bounded and --resume-safe: already-recorded
# golden rows skip instantly, so re-running after a kill loses nothing.
# ONE chip client at a time (CLAUDE.md rule 7).
#
#   F0  P2 remainder: d extension at 4096
#   F1  P4: z extension 640-1024 + z trmm/trsm rows      (VERDICT r3 #2)
#   F2  P6: variant-config grid rows, all four dtypes    (VERDICT r3 #4)
#   F3  P8: lookahead probe + bench + graft validation   (VERDICT r3 #5)
#   F4  P5: s gemm/syrk/logdet to 4096 + gemm_k sweep
#   F5  P7 core: logdet_diag ladder to 2^20 + s potrf densify (VERDICT r3 #7)
#   F6  r4b: d 6144/8192, production variant grids, c/z extension
#   F7  r4e: c/z gemm+herk goldens, d logdet_diag ladder
#   F8  P7 rest: densify the other 8 s ops
#   F9  r4d: big-n s trmm/trsm (reference custrsm n=15360 parity)
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

# --- F0: P2 remainder -------------------------------------------------------
for op in potri trtri lauum trsm gemm syrk logdet; do
  run d "$op" 4096 golden_tpu_v5_lite_d.jsonl
done

# --- F1: P4 z extension -----------------------------------------------------
for op in potrf potri trtri lauum logdet; do
  run z "$op" 640:1024:128 golden_tpu_v5_lite_z.jsonl
done
for op in trmm trsm; do
  run z "$op" 128,256,512,1024 golden_tpu_v5_lite_z.jsonl
done

# --- F2: P6 variant grids ---------------------------------------------------
run s potrf,potri,trtri,lauum,logdet 512,1024 golden_tpu_v5_lite_s.jsonl \
    --config grid
run s trmm,trsm 512,1024 golden_tpu_v5_lite_s.jsonl --config grid
run s gemm,syrk 1024 golden_tpu_v5_lite_s.jsonl --config grid
run d potrf,trmm,trsm 512 golden_tpu_v5_lite_d.jsonl --config grid
run c potrf,trmm,trsm 256 golden_tpu_v5_lite_c.jsonl --config grid
run z potrf 256 golden_tpu_v5_lite_z.jsonl --config grid

# --- F3: P8 probes + validation ----------------------------------------------
timeout 1800 python tools/probe_r3.py lookahead || echo "(lookahead exited $?)"
timeout 700 python bench.py || echo "(bench exited $?)"
timeout 1500 python __graft_entry__.py || echo "(graft exited $?)"

# --- F4: P5 s blas/logdet extension ------------------------------------------
for op in gemm syrk logdet; do
  run s "$op" 2560:4096:512 golden_tpu_v5_lite_s.jsonl
done
run s gemm_k 128:1024:128 golden_tpu_v5_lite_s.jsonl
run s gemm_k 1536,2048,3072,4096 golden_tpu_v5_lite_s.jsonl

# --- F5: P7 core --------------------------------------------------------------
run s logdet_diag 4096,16384,65536,131072,262144,524288,1048576 \
    golden_tpu_v5_lite_s.jsonl
run s potrf 384:1920:128 golden_tpu_v5_lite_s.jsonl

# --- F6: r4b (internally ordered B0, B4, B1, B2, B5, B3) ----------------------
bash tools/goldens_r4b.sh

# --- F7: r4e (new-op coverage) -------------------------------------------------
bash tools/goldens_r4e.sh

# --- F8: P7 rest ----------------------------------------------------------------
for op in potri trtri lauum trmm trsm gemm syrk logdet; do
  run s "$op" 384:1920:128 golden_tpu_v5_lite_s.jsonl
done
for op in potrf potri trtri lauum trmm trsm gemm syrk logdet; do
  run s "$op" 64:192:64 golden_tpu_v5_lite_s.jsonl
done

# --- F9: r4d big-n s trmm/trsm (r4e inside it resume-skips) -------------------
bash tools/goldens_r4d.sh

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4f done $(date +%H:%M:%S) ==="
