#!/bin/bash
# Golden-sweep generation for all precisions (VERDICT r1 Next #7).
# Many small --resume invocations: partial progress lands on disk after
# every call, so a killed run loses at most one op x size-band chunk.
# Run detached:  nohup bash tools/gen_goldens.sh > /tmp/goldens.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=bench_results
TRI_OPS="potrf potri trtri lauum trmm trsm"
ALL_OPS="$TRI_OPS gemm syrk logdet"

run() { # dtype ops sizes outfile
  echo "=== sweep dtype=$1 ops=$2 sizes=$3 ==="
  timeout 5400 python tools/sweep.py --dtype "$1" --ops "$2" --sizes "$3" \
      --resume --out "$OUT/$4" || echo "(chunk exited $?)"
}

# 1. coverage first: >=60 points per precision file
for op in $ALL_OPS; do run s "$op" 256:2048:256 golden_tpu_v5_lite_s.jsonl; done
for op in $TRI_OPS; do run d "$op" 128:1536:128 golden_tpu_v5_lite_d.jsonl; done
for op in potrf potri trtri lauum logdet; do
  run z "$op" 64:768:64 golden_tpu_v5_lite_z.jsonl
done

# 2. large-n logdet bandwidth sweep (reference cuslogdet to n=2^20)
run s logdet_diag 4096,16384,65536,262144,1048576 golden_tpu_v5_lite_s.jsonl

# 3. densify s to reference granularity (resume skips the done points)
for op in $TRI_OPS; do run s "$op" 64:1024:64 golden_tpu_v5_lite_s.jsonl; done
for op in $TRI_OPS; do run s "$op" 2560:4096:512 golden_tpu_v5_lite_s.jsonl; done
for op in $TRI_OPS; do run s "$op" 1152:2048:128 golden_tpu_v5_lite_s.jsonl; done

echo "=== gen_goldens done ==="
