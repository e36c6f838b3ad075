#!/bin/bash
# Round-4 EXTENSION chip queue — runs after tools/goldens_r4.sh completes
# (pass WAIT_PID=<pid of goldens_r4.sh> to chain).  Everything is bounded
# and --resume-safe; rerunning continues where a kill or outage stopped it.
# ONE chip client at a time (CLAUDE.md rule 7).
#
#   B0  d-precision big-n: Ozaki f64 at 6144/8192 (reference dpotrf is a
#       full citizen at every size — BASELINE.md cudpotrf ladders)
#   B1  c-precision extension: drivers to 2048, potrf to 4096
#   B2  z-precision extension: drivers to 2048
#   B3  s mid-ladder densify 2304..3840 (between the 2048 and 4096 rows)
#   B4  variant grid at production sizes (2048/4096) for the headline ops
#   B5  gemm_k transpose variants (reference test_gpublas.sh sweeps NT/TN/TT)
set -u
cd "$(dirname "$0")/.."
OUT=bench_results
mkdir -p "$OUT"

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
fi

run() { # dtype ops sizes outfile [extra args...]
  local d="$1" o="$2" s="$3" f="$4"; shift 4
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s $* ==="
  timeout 2400 python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

# --- B0: d big-n (Ozaki f64 at scale) --------------------------------------
run d potrf 6144 golden_tpu_v5_lite_d.jsonl
run d trmm 6144 golden_tpu_v5_lite_d.jsonl
run d potrf 8192 golden_tpu_v5_lite_d.jsonl
for op in trtri potri lauum trsm logdet; do
  run d "$op" 6144 golden_tpu_v5_lite_d.jsonl
done

# --- B4: variant grid at production sizes ----------------------------------
run s potrf,trtri 2048,4096 golden_tpu_v5_lite_s.jsonl --config grid
run s trmm,trsm 2048 golden_tpu_v5_lite_s.jsonl --config grid
run s potri,lauum,logdet 2048 golden_tpu_v5_lite_s.jsonl --config grid
run d potrf,trmm 1024,2048 golden_tpu_v5_lite_d.jsonl --config grid
run c potrf,trmm,trsm 512,1024 golden_tpu_v5_lite_c.jsonl --config grid
run z potrf,trmm,trsm 256,512 golden_tpu_v5_lite_z.jsonl --config grid

# --- B1: c extension --------------------------------------------------------
for op in potri trtri lauum logdet; do
  run c "$op" 768,1024,1536,2048 golden_tpu_v5_lite_c.jsonl
done
run c trmm 1536,2048 golden_tpu_v5_lite_c.jsonl
run c trsm 1536,2048 golden_tpu_v5_lite_c.jsonl
run c potrf 3072 golden_tpu_v5_lite_c.jsonl
run c potrf 4096 golden_tpu_v5_lite_c.jsonl

# --- B2: z extension --------------------------------------------------------
for op in potrf potri trtri lauum logdet; do
  run z "$op" 1280,1536,2048 golden_tpu_v5_lite_z.jsonl
done
run z trmm 1536,2048 golden_tpu_v5_lite_z.jsonl
run z trsm 1536,2048 golden_tpu_v5_lite_z.jsonl

# --- B5: gemm_k transpose variants (reference test_gpublas.sh parity) ------
run s gemm_k 256,512,1024 golden_tpu_v5_lite_s.jsonl --config grid

# --- B3: s mid-ladder densify ----------------------------------------------
for op in potrf potri trtri lauum trmm trsm; do
  run s "$op" 2304,2816,3328,3840 golden_tpu_v5_lite_s.jsonl
done
run s potrf 5120 golden_tpu_v5_lite_s.jsonl
run s potrf 12288 golden_tpu_v5_lite_s.jsonl

# regenerate the perf ledger from the committed artifacts
python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true

echo "=== goldens_r4b done $(date +%H:%M:%S) ==="
