#!/bin/bash
# Round-4i: post-fix re-records (donated-alias corruption + embed OOM,
# commit f626f39).
#   - c trsm llnn@2048 was recorded 0.02925 vs tol 0.0293: a WRONG result
#     that passed on tolerance width — the alias bug's footprint. Strip it
#     and every row the fixes invalidate, then re-sweep on fixed code.
#   - c potrf@3072 (405 GF/s) and the c trmm/trsm 1536/2048 rows measured
#     the 64x-padded embed; current code is ~10x faster there.
#   - s trsm llnn@3072 is the regression row for the donated-alias bug
#     (the corrupting shape class: wide rhs, 3072-size recursion).
set -u
cd "$(dirname "$0")/.."
OUT=bench_results

python - <<'EOF'
import json
p = "bench_results/golden_tpu_v5_lite_c.jsonl"
rows = [json.loads(l) for l in open(p) if l.strip()]
drop = {("trsm", 2048, "llnn"), ("potrf", 3072, "l"),
        ("trmm", 1536, "llnn"), ("trmm", 2048, "llnn"),
        ("trsm", 1536, "llnn")}
keep = [r for r in rows if (r["op"], r["n"], r.get("config")) not in drop]
with open(p, "w") as f:
    for r in keep:
        f.write(json.dumps(r) + "\n")
print(f"{p}: {len(rows) - len(keep)} stale/tainted row(s) stripped")
EOF

run() {
  local d="$1" o="$2" s="$3" f="$4"; shift 4
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s $* ==="
  timeout 2400 python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

run s trsm 3072 golden_tpu_v5_lite_s.jsonl
run c trsm 1536,2048 golden_tpu_v5_lite_c.jsonl
run c trmm 1536,2048 golden_tpu_v5_lite_c.jsonl
run c potrf 1536,3072,4096 golden_tpu_v5_lite_c.jsonl
run c potri 3072 golden_tpu_v5_lite_c.jsonl
run c logdet 3072 golden_tpu_v5_lite_c.jsonl
run z potrf 3072 golden_tpu_v5_lite_z.jsonl
run z trmm 3072 golden_tpu_v5_lite_z.jsonl
run z trsm 3072 golden_tpu_v5_lite_z.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r4i done $(date +%H:%M:%S) ==="
