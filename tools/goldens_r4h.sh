#!/bin/bash
# Round-4h: retry pass after the stretch queue. The closure-literal fix in
# tools/sweep.py (operands as jit arguments, not closures — closed-over
# device arrays inline into the HLO as literals and overflow the relay's
# remote-compile request at >~256 MB, HTTP 413) makes big-n gemm/syrk/
# trmm/trsm points compilable; this pass strips any recorded FAILED rows
# (--resume treats them as done) and re-sweeps the points they blocked.
set -u
cd "$(dirname "$0")/.."
OUT=bench_results

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
fi

# strip non-passed rows so --resume re-attempts them
python - <<'EOF'
import json
for dt in "sdcz":
    p = f"bench_results/golden_tpu_v5_lite_{dt}.jsonl"
    try:
        rows = [l for l in open(p) if l.strip()]
    except FileNotFoundError:
        continue
    keep = [l for l in rows if json.loads(l).get("passed")]
    if len(keep) != len(rows):
        open(p, "w").writelines(keep)
        print(f"{p}: stripped {len(rows)-len(keep)} failed row(s)")
EOF

run() {
  local d="$1" o="$2" s="$3" f="$4"; shift 4
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s $* ==="
  timeout 2400 python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

# the known 413 victim, first
run d gemm 4096 golden_tpu_v5_lite_d.jsonl
# big-n retries (no-ops if the earlier pass already recorded them)
run s trmm 8192 golden_tpu_v5_lite_s.jsonl
run s trsm 8192 golden_tpu_v5_lite_s.jsonl
run d trmm 6144 golden_tpu_v5_lite_d.jsonl
run d gemm 6144 golden_tpu_v5_lite_d.jsonl
run s gemm 6144,8192 golden_tpu_v5_lite_s.jsonl
run s syrk 6144,8192 golden_tpu_v5_lite_s.jsonl
run s trmm 15360 golden_tpu_v5_lite_s.jsonl
run s trsm 15360 golden_tpu_v5_lite_s.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4h done $(date +%H:%M:%S) ==="
