#!/bin/bash
# Round-5 tail v4 — post-gate chip plan (session 3).
#
# Context: the hoist A/B probe completed at 8192 (same-day, both configs);
# the hoisted Ozaki bundle is size-gated by ozaki_f64.hoist_min_n and the
# d re-records below run on the shipped default.  The 21:18 d chunk's
# rows were lost to the sweep exit-only-write bug (fixed: incremental
# flush), so d potrf/trtri@4096-8192 are holes again along with the rest
# of the archive-stripped d family.
#
# Order = headline d factor ops at top sizes first (a deadline cut loses
# the cheapest points), then the d family completion, then the cheap
# s small-n ladders, z grid densify, and c/z ceilings as stretch.
# Usage: bash tools/goldens_r5_tail4.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
OUT=bench_results
DEADLINE_UTC="2026-08-20 00:45:00"
DEADLINE=$(date -d "$DEADLINE_UTC UTC" +%s)

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting on pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
  echo "pid $1 gone at $(date -u +%H:%M:%S)"
fi

left() { echo $(( DEADLINE - $(date +%s) )); }

run() {
  local budget="$1" d="$2" o="$3" s="$4" f="$5"; shift 5
  local rem; rem=$(left)
  if [ "$rem" -lt 120 ]; then
    echo "=== deadline: skipping $d/$o/$s ($rem s left) ==="
    return
  fi
  local t=$(( budget < rem ? budget : rem ))
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s timeout=$t ==="
  timeout "$t" python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

# P1: mandatory d re-records on the gated default, top sizes first.
run 2700 d potrf,trtri 8192,6144,4096 golden_tpu_v5_lite_d.jsonl
run 2100 d trsm,syrk 8192,6144,4096 golden_tpu_v5_lite_d.jsonl
run 2700 d potri,lauum,logdet 8192,6144,4096 golden_tpu_v5_lite_d.jsonl

# P2: s small-n 64-step ladders + mid-gap fill (cheap, many rows).
run 1500 s potrf,trtri,potri 64,192,320,448,576,704,832,960 golden_tpu_v5_lite_s.jsonl
run 1500 s trtri,potri 384,640,896,1152,1408,1664,1920 golden_tpu_v5_lite_s.jsonl
run 1200 s trtri,potri 2304,2816,3328,3840 golden_tpu_v5_lite_s.jsonl

# P3: z gemm/herk grid densify (VERDICT #5 "approx 10-point z grids").
run 1500 z gemm,syrk 256,512,768,1024,1536 golden_tpu_v5_lite_z.jsonl
run 1200 z gemm,syrk 2560,3072 golden_tpu_v5_lite_z.jsonl

# P4: ceilings as time allows (c first: embeds to proven s@16384).
run 1500 c potrf 8192 golden_tpu_v5_lite_c.jsonl
run 1500 c trmm,trsm 8192 golden_tpu_v5_lite_c.jsonl
run 1500 z potrf 5120 golden_tpu_v5_lite_z.jsonl
run 1500 c trtri,lauum 8192 golden_tpu_v5_lite_c.jsonl
run 1500 c potri,logdet 8192 golden_tpu_v5_lite_c.jsonl
run 1200 z trmm,trsm 5120 golden_tpu_v5_lite_z.jsonl

# P5: stretch — re-record the (hoisted-era) d potrf@10240 on the gated
# default and one big trtri.
run 1500 d potrf 10240 golden_tpu_v5_lite_d.jsonl
run 1200 s trtri 20480 golden_tpu_v5_lite_s.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r5_tail4 done $(date +%H:%M:%S) ==="
