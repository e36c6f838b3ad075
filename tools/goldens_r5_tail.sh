#!/bin/bash
# Round-5 reordered tail queue (takes over from goldens_r5.sh mid-flight).
# Why: goldens_r5.sh's static order would spend the remaining chip window
# on expensive c@8192 points and never reach the cheap high-row-count
# stages (s small-n ladders, z gemm/herk grid densify) — and the d-family
# rows were already archive-stripped, so finishing the P1 d re-records is
# mandatory before anything else.
# NEW in v2: the r5 re-record measured dpotrf@4096/6144 ~19% BELOW the
# archived pre-hoist rows, so before burning ~40 min of chip on d
# re-records we A/B the hoisted Ozaki peel (tools/probe_dhoist.py) and
# pause briefly at a decision gate (touch /tmp/r5s/go to release early;
# auto-releases after 15 min) so the session can revert/gate the hoist
# first if it measures as a loss.
# Every stage is deadline-aware: stage timeout = min(stage budget,
# seconds until DEADLINE_UTC), so nothing holds the chip past the
# driver's round-end bench window (CLAUDE.md rule 7).
# Usage: bash tools/goldens_r5_tail.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
OUT=bench_results
DEADLINE_UTC="2026-08-19 23:38:00"
DEADLINE=$(date -d "$DEADLINE_UTC UTC" +%s)

# Wait for a prior chip client to exit before touching the chip.
if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting on pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
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

# P-1: the hoist A/B probe, then the decision gate.
echo "=== $(date +%H:%M:%S) probe_dhoist 6144,8192 ==="
timeout 1800 python tools/probe_dhoist.py 6144,8192 \
    || echo "(probe exited $?)"
touch /tmp/r5s/probe_done
GATE_END=$(( $(date +%s) + 900 ))
while [ ! -f /tmp/r5s/go ] && [ "$(date +%s)" -lt "$GATE_END" ] \
      && [ "$(left)" -gt 300 ]; do sleep 10; done
echo "=== gate released at $(date -u +%H:%M:%S) (go=$([ -f /tmp/r5s/go ] && echo yes || echo timeout)) ==="

# P1 completion (mandatory: the old rows are archive-stripped).
run 2400 d potrf,trtri 4096,6144,8192 golden_tpu_v5_lite_d.jsonl
run 2400 d potri,lauum,logdet 4096,6144,8192 golden_tpu_v5_lite_d.jsonl
run 2400 d trsm,syrk 4096,6144,8192 golden_tpu_v5_lite_d.jsonl

# P4: s small-n 64-step ladders + mid-gap fill (cheap, many rows).
run 1800 s potrf,trtri,potri 64,192,320,448,576,704,832,960 golden_tpu_v5_lite_s.jsonl
run 1800 s trtri,potri 384,640,896,1152,1408,1664,1920 golden_tpu_v5_lite_s.jsonl
run 1200 s trtri,potri 2304,2816,3328,3840 golden_tpu_v5_lite_s.jsonl

# P3a: z gemm/herk grid densify (VERDICT #5 "≥10-point z grids").
run 1800 z gemm,syrk 256,512,768,1024,1536 golden_tpu_v5_lite_z.jsonl
run 1500 z gemm,syrk 2560,3072 golden_tpu_v5_lite_z.jsonl

# P2: c ceilings to 8192 (headline ops first).
run 1800 c potrf 8192 golden_tpu_v5_lite_c.jsonl
run 1800 c trmm,trsm 8192 golden_tpu_v5_lite_c.jsonl
run 1800 c trtri,lauum 8192 golden_tpu_v5_lite_c.jsonl
run 1800 c potri,logdet 8192 golden_tpu_v5_lite_c.jsonl
run 1500 c gemm,syrk 6144 golden_tpu_v5_lite_c.jsonl

# P3b: z ceiling to 5120.
run 1800 z potrf 5120 golden_tpu_v5_lite_z.jsonl
run 1800 z trmm,trsm 5120 golden_tpu_v5_lite_z.jsonl
run 1800 z trtri,lauum,potri,logdet 5120 golden_tpu_v5_lite_z.jsonl

# P5: stretch.
run 1500 d potrf 11264 golden_tpu_v5_lite_d.jsonl
run 1500 c potrf 10240 golden_tpu_v5_lite_c.jsonl
run 1500 s trtri 20480 golden_tpu_v5_lite_s.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r5_tail done $(date +%H:%M:%S) ==="
