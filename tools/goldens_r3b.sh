#!/bin/bash
# Round-3 golden continuation, judge-priority order (replaces the tail of
# gen_goldens_r3.sh, whose P1 potrf ladder would have starved the NEW
# c-precision file out of the round budget):
#   1. c-precision file — VERDICT r2 Missing #6 ("no c golden at all"),
#      incl. the n=2048 chip artifact Next #7 asks for
#   2. z extension past 512 (Next #7)
#   3. s headline potrf ladder + trtri 8192 (consistency with bench.py)
#   4. s P1 leftovers (gemm/syrk/logdet to 4096)
#   5. d missing ops + large-n extension
#   6. s densify + large-n logdet bandwidth sweep
# Usage: WAIT_PID=<running sweep pid> nohup bash tools/goldens_r3b.sh ...
set -u
cd "$(dirname "$0")/.."
OUT=bench_results

# hand-off: wait for a currently-running sweep chunk to release the chip
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 5; done
fi

run() { # dtype ops sizes outfile
  echo "=== $(date +%H:%M:%S) sweep dtype=$1 ops=$2 sizes=$3 ==="
  timeout 2400 python tools/sweep.py --dtype "$1" --ops "$2" --sizes "$3" \
      --resume --out "$OUT/$4" || echo "(chunk exited $?)"
}

# --- P1: NEW c-precision golden file (pair/f32-embedding path) ---
run c potrf 64:512:64 golden_tpu_v5_lite_c.jsonl
for op in potri trtri lauum logdet; do
  run c "$op" 128:512:128 golden_tpu_v5_lite_c.jsonl
done
for op in trmm trsm; do run c "$op" 128,256,512 golden_tpu_v5_lite_c.jsonl; done
run c potrf 768,1024,2048 golden_tpu_v5_lite_c.jsonl

# --- P2: z extension to 1024 ---
for op in potrf potri trtri lauum logdet; do
  run z "$op" 640:1024:128 golden_tpu_v5_lite_z.jsonl
done

# --- P3: s headline ladder ---
run s potrf 6144,8192,16384 golden_tpu_v5_lite_s.jsonl
run s trtri 8192 golden_tpu_v5_lite_s.jsonl

# --- P4: s P1 leftovers ---
for op in gemm syrk logdet; do
  run s "$op" 2560:4096:512 golden_tpu_v5_lite_s.jsonl
done

# --- P5: d missing ops at existing density, then extension ---
for op in lauum trsm gemm syrk logdet; do
  run d "$op" 256:1536:256 golden_tpu_v5_lite_d.jsonl
done
for op in potrf potri trtri lauum trmm trsm gemm syrk logdet; do
  run d "$op" 2048,3072,4096 golden_tpu_v5_lite_d.jsonl
done

# --- P6: s densify + logdet diag bandwidth sweep ---
run s logdet_diag 4096,16384,65536,262144,1048576 golden_tpu_v5_lite_s.jsonl
for op in potrf potri trtri lauum trmm trsm gemm syrk logdet; do
  run s "$op" 384:1920:128 golden_tpu_v5_lite_s.jsonl
done
for op in potrf potri trtri lauum trmm trsm gemm syrk logdet; do
  run s "$op" 64:192:64 golden_tpu_v5_lite_s.jsonl
done

echo "=== goldens_r3b done $(date +%H:%M:%S) ==="
