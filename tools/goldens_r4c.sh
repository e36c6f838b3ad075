#!/bin/bash
# Round-4c: re-record the Ozaki-affected goldens on the FUSED group-sum
# kernel + regridded peel (bench_results/ozaki_fused_probe.json is the
# measured justification), then continue the main r4 queue.
#
# The fused default (ops/ozaki.use_fused) changes the compiled program of
# every d-precision op and every z op (embedding over Ozaki tiles), and
# the trmm ragged-leaf absorption changes non-multiple-of-nb routings for
# d/z/c trmm — so every previously recorded d/z row understates the
# shipped code and the c trmm rows at ragged sizes measure a dead routing.
# Archive those files (the VERDICT r3 "stale goldens are a regression
# trap" lesson, applied in the fast direction) and re-record.
set -u
cd "$(dirname "$0")/.."
OUT=bench_results

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 5; done
fi

run() { # dtype ops sizes outfile [extra args...]
  local d="$1" o="$2" s="$3" f="$4"; shift 4
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s $* ==="
  timeout 2400 python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

# --- archive pre-fused d/z rows, drop c trmm/trsm (ragged-leaf change) ----
if [ ! -f "$OUT/golden_tpu_v5_lite_d_prefused_stale.jsonl" ]; then
  mv "$OUT/golden_tpu_v5_lite_d.jsonl" \
     "$OUT/golden_tpu_v5_lite_d_prefused_stale.jsonl"
  mv "$OUT/golden_tpu_v5_lite_z.jsonl" \
     "$OUT/golden_tpu_v5_lite_z_prefused_stale.jsonl"
  python - <<'EOF'
import json
p = "bench_results/golden_tpu_v5_lite_c.jsonl"
rows = [json.loads(l) for l in open(p)]
keep = [r for r in rows if r["op"] not in ("trmm", "trsm")]
with open(p, "w") as f:
    for r in keep:
        f.write(json.dumps(r) + "\n")
print(f"dropped {len(rows)-len(keep)} c trmm/trsm rows (ragged-leaf)")
EOF
fi

# --- d re-records the main queue's P2 does not revisit --------------------
run d potrf,potri,trtri 256:1536:256 golden_tpu_v5_lite_d.jsonl
# --- z base ladder (main queue only extends 640+) --------------------------
for op in potrf potri trtri lauum logdet; do
  run z "$op" 128,256,384,512 golden_tpu_v5_lite_z.jsonl
done
# --- c trmm/trsm re-records -------------------------------------------------
run c trmm 128,256,384,512,768,1024 golden_tpu_v5_lite_c.jsonl
run c trsm 128,256,384,512,768,1024 golden_tpu_v5_lite_c.jsonl

# --- continue the main r4 queue (P1 skips, P2 re-records d on fused code) --
SKIP_P0=1 bash tools/goldens_r4.sh

# --- then the extension queue ----------------------------------------------
bash tools/goldens_r4b.sh

echo "=== goldens_r4c done $(date +%H:%M:%S) ==="
