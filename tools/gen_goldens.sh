#!/bin/bash
# Canonical golden-sweep regeneration, all four precisions — reproduces the
# round-4 coverage (base ladders, variant-config grids, rectangular GEMM
# k-sweeps, big-n headline points, logdet bandwidth ladders) from scratch.
# Reference bar: benchmark_base.tar.gz's 51 logs sweep every routine at
# u+l × per-variant granularity (test_gpulapack.sh, test_gpublas.sh).
#
# Many small --resume invocations: partial progress lands on disk after
# every call, so a killed run loses at most one op × size-band chunk.
# Takes hours on a cold compile cache.
# Run detached:  nohup bash tools/gen_goldens.sh > /tmp/goldens.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=bench_results
TRI_OPS="potrf potri trtri lauum trmm trsm"
ALL_OPS="$TRI_OPS gemm syrk logdet"

run() { # dtype ops sizes outfile [extra args...]
  local d="$1" o="$2" s="$3" f="$4"; shift 4
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s $* ==="
  timeout 5400 python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

# 1. base ladders, coverage first
for op in $ALL_OPS; do run s "$op" 256:2048:256 golden_tpu_v5_lite_s.jsonl; done
for op in $ALL_OPS; do run d "$op" 256:1536:256 golden_tpu_v5_lite_d.jsonl; done
for op in $ALL_OPS; do
  run c "$op" 128,256,384,512,768,1024 golden_tpu_v5_lite_c.jsonl
done
for op in $ALL_OPS; do
  run z "$op" 128,256,384,512 golden_tpu_v5_lite_z.jsonl
done

# 2. mid/large extensions per dtype
for op in $ALL_OPS; do run s "$op" 2560:4096:512 golden_tpu_v5_lite_s.jsonl; done
for op in $ALL_OPS; do run d "$op" 2048,3072,4096 golden_tpu_v5_lite_d.jsonl; done
for op in $TRI_OPS logdet; do
  run c "$op" 1536,2048 golden_tpu_v5_lite_c.jsonl
done
for op in potrf potri trtri lauum logdet trmm trsm; do
  run z "$op" 640:1024:128 golden_tpu_v5_lite_z.jsonl
done

# 3. headline big-n points
run s potrf 6144 golden_tpu_v5_lite_s.jsonl
run s potrf 8192 golden_tpu_v5_lite_s.jsonl
run s potrf 12288 golden_tpu_v5_lite_s.jsonl
run s potrf 16384 golden_tpu_v5_lite_s.jsonl
run s potrf 24576 golden_tpu_v5_lite_s.jsonl   # recorded single-chip ceiling
run s trtri 8192,16384 golden_tpu_v5_lite_s.jsonl
run s gemm,syrk 6144,8192,12288 golden_tpu_v5_lite_s.jsonl
run s trmm,trsm 8192,15360 golden_tpu_v5_lite_s.jsonl
run s potri,lauum,logdet 6144,8192 golden_tpu_v5_lite_s.jsonl
run d potrf 6144 golden_tpu_v5_lite_d.jsonl
run d potrf 8192 golden_tpu_v5_lite_d.jsonl
run d trmm 6144 golden_tpu_v5_lite_d.jsonl
run d syrk 6144,8192 golden_tpu_v5_lite_d.jsonl
run d gemm,trmm,trsm 8192 golden_tpu_v5_lite_d.jsonl
run c potrf 3072,4096,6144 golden_tpu_v5_lite_c.jsonl
run c trmm,trsm,trtri,lauum 3072,4096 golden_tpu_v5_lite_c.jsonl
run c potri,logdet 4096 golden_tpu_v5_lite_c.jsonl
run z potrf,trmm,trsm 1536,2048 golden_tpu_v5_lite_z.jsonl
run z potrf,trmm,trsm 3072,4096 golden_tpu_v5_lite_z.jsonl
run z potri,trtri,lauum,logdet 3072 golden_tpu_v5_lite_z.jsonl

# 3b. c/z GEMM + HERK ladders (reference include/blas.h:37-66 treats
# cgemm/zgemm/cherk/zherk as first-class; syrk with a complex dtype
# sweeps blocked.herk)
run c gemm 256,512,1024,2048,3072,4096 golden_tpu_v5_lite_c.jsonl
run c syrk 256,512,1024,2048,3072 golden_tpu_v5_lite_c.jsonl
run z gemm 256,512,1024,2048,3072 golden_tpu_v5_lite_z.jsonl
run z syrk 256,512,1024,2048,3072 golden_tpu_v5_lite_z.jsonl
run c gemm,syrk 1024 golden_tpu_v5_lite_c.jsonl --config grid

# 4. variant-config grids (rows with config != auto for every driver)
run s potrf,potri,trtri,lauum,logdet 512,1024,2048 golden_tpu_v5_lite_s.jsonl \
    --config grid
run s trmm,trsm 512,1024,2048 golden_tpu_v5_lite_s.jsonl --config grid
run s gemm,syrk 1024 golden_tpu_v5_lite_s.jsonl --config grid
run d potrf,trmm,trsm 512,1024,2048 golden_tpu_v5_lite_d.jsonl --config grid
run c potrf,trmm,trsm 256,512,1024 golden_tpu_v5_lite_c.jsonl --config grid
run z potrf,trmm,trsm 256,512 golden_tpu_v5_lite_z.jsonl --config grid

# 5. rectangular GEMM k-sweep (reference test_gpublas.sh:5-25)
run s gemm_k 128:1024:128 golden_tpu_v5_lite_s.jsonl
run s gemm_k 1536,2048,3072,4096 golden_tpu_v5_lite_s.jsonl
run s gemm_k 256,512,1024 golden_tpu_v5_lite_s.jsonl --config grid

# 6. logdet bandwidth ladders (reference cuslogdet to n=2^20)
run s logdet_diag 4096,16384,65536,131072,262144,524288,1048576 \
    golden_tpu_v5_lite_s.jsonl
run d logdet_diag 4096,16384,65536,262144,1048576 golden_tpu_v5_lite_d.jsonl

# 7. densify s to reference granularity (resume skips the done points)
for op in $ALL_OPS; do run s "$op" 64:192:64 golden_tpu_v5_lite_s.jsonl; done
for op in $ALL_OPS; do run s "$op" 384:1920:128 golden_tpu_v5_lite_s.jsonl; done

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== gen_goldens done $(date +%H:%M:%S) ==="
