#!/bin/bash
# Round-5 tail v3 — post-A/B-probe chip plan (replaces goldens_r5_tail.sh
# from its decision gate; launched by the session once the probe lands).
#
# Decision recorded in bench_results/dhoist_ab_r5.json + ROUND_NOTES.md:
# no code-default change this session (a trace-level change would cold-
# recompile every d point at ~5-15 min each — undoing the warm compile
# cache that makes the remaining d re-records affordable).
#
# Budget reality: ~90 min of chip to the handoff deadline; d compiles
# dominate. Order = mandatory d holes first (top sizes before 4096 so a
# deadline cut loses the cheapest points), then the cheap s ladders, then
# z grid densify, then ceilings/stretch.
# Usage: bash tools/goldens_r5_tail3.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
OUT=bench_results
DEADLINE_UTC="2026-08-19 23:38:00"
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

# P1: mandatory d re-records (rows archive-stripped; resume skips the
# potrf 4096-8192 + trtri 4096 points already recorded). Top sizes first.
run 1800 d trtri 8192,6144 golden_tpu_v5_lite_d.jsonl
run 1500 d trsm,syrk 8192 golden_tpu_v5_lite_d.jsonl
run 1800 d potri,lauum,logdet 8192 golden_tpu_v5_lite_d.jsonl
run 1500 d trsm,syrk 6144,4096 golden_tpu_v5_lite_d.jsonl
run 1800 d potri,lauum,logdet 6144,4096 golden_tpu_v5_lite_d.jsonl

# P2: s small-n 64-step ladders + mid-gap fill (cheap, many rows).
run 1800 s potrf,trtri,potri 64,192,320,448,576,704,832,960 golden_tpu_v5_lite_s.jsonl
run 1800 s trtri,potri 384,640,896,1152,1408,1664,1920 golden_tpu_v5_lite_s.jsonl
run 1200 s trtri,potri 2304,2816,3328,3840 golden_tpu_v5_lite_s.jsonl

# P3: z gemm/herk grid densify (VERDICT #5 "≥10-point z grids").
run 1500 z gemm,syrk 256,512,768,1024,1536 golden_tpu_v5_lite_z.jsonl
run 1200 z gemm,syrk 2560,3072 golden_tpu_v5_lite_z.jsonl

# P4: ceilings as time allows (c first: embeds to proven s@16384).
run 1500 c potrf 8192 golden_tpu_v5_lite_c.jsonl
run 1500 c trmm,trsm 8192 golden_tpu_v5_lite_c.jsonl
run 1500 z potrf 5120 golden_tpu_v5_lite_z.jsonl
run 1500 c trtri,lauum 8192 golden_tpu_v5_lite_c.jsonl
run 1500 c potri,logdet 8192 golden_tpu_v5_lite_c.jsonl
run 1200 z trmm,trsm 5120 golden_tpu_v5_lite_z.jsonl

# P5: stretch — nb-probe evidence + one big shape each.
if [ "$(left)" -gt 900 ]; then
  echo "=== $(date +%H:%M:%S) probe_dnb 8192 512 ==="
  timeout $(( $(left) > 1200 ? 1200 : $(left) )) \
      python tools/probe_dnb.py 8192 512,1024 || echo "(probe exited $?)"
fi
run 1200 d potrf 11264 golden_tpu_v5_lite_d.jsonl
run 1200 s trtri 20480 golden_tpu_v5_lite_s.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r5_tail3 done $(date +%H:%M:%S) ==="
