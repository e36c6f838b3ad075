#!/bin/bash
# Round-4k: cleanup after the trtri-init fix (0e500e5).
#   - s trtri@16384 failed its oracle because that chunk imported the
#     broken intermediate state between the two kernel edits: strip + re-run.
#   - s potrf@32768 is a genuine HBM RESOURCE_EXHAUSTED (4.3 GB operand +
#     generator/factor workspace exceeds the 16 GB chip): strip the FAILED
#     row and leave 24576 as the recorded ceiling (ROUND_NOTES documents it).
# Usage: WAIT_PIDS="..." bash tools/goldens_r4k.sh
set -u
cd "$(dirname "$0")/.."
OUT=bench_results

for p in ${WAIT_PIDS:-}; do
  while kill -0 "$p" 2>/dev/null; do sleep 15; done
done

python - <<'EOF'
import json
p = "bench_results/golden_tpu_v5_lite_s.jsonl"
rows = [json.loads(l) for l in open(p) if l.strip()]
keep = [r for r in rows if r.get("passed")]
if len(keep) != len(rows):
    with open(p, "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    print(f"stripped {len(rows) - len(keep)} failed row(s)")
EOF

run() {
  local d="$1" o="$2" s="$3" f="$4"; shift 4
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s $* ==="
  timeout 2400 python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

run s trtri 16384 golden_tpu_v5_lite_s.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4k done $(date +%H:%M:%S) ==="
