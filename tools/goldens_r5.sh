#!/bin/bash
# Round-5 golden queue (VERDICT r4 Next #2/#4/#5/#7).
#   P0  s trtri@8192/16384 re-record on the lifted mono kernel (the old
#       rows measured the 4096-capped recursion).
#   P1  d family re-record at 4096/6144/8192 on the hoisted-peel Ozaki
#       recursions (old rows predate the hoist: potrf 2915 -> 3926 GF/s
#       class improvement; trmm/gemm keep their r4 rows — their paths
#       didn't change).
#   P2  c ceilings to 8192 (embeds to s@16384, a proven shape).
#   P3  z to 5120 (embeds to d@10240, proven) + z gemm/herk densify to
#       a 10+-point grid (VERDICT r4 Next #5).
#   P4  s small-n 64-step ladders below 1024 + trtri/potri mid-gap fill
#       (VERDICT r4 Next #7; reference test_gpulapack.sh n=64..4096/64).
# Stale rows being re-recorded are ARCHIVED first (never deleted).
# Every chunk is --resume-safe and oracle-verified.
# Usage: bash tools/goldens_r5.sh
set -u
cd "$(dirname "$0")/.."
OUT=bench_results

run() {
  local d="$1" o="$2" s="$3" f="$4"; shift 4
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s $* ==="
  timeout 2400 python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

# archive + strip the rows this queue re-records (idempotent)
python - <<'EOF'
import json, os
def strip(path, arch, pred):
    if not os.path.exists(path):
        return
    keep, drop = [], []
    for line in open(path):
        try:
            r = json.loads(line)
        except ValueError:
            keep.append(line); continue
        (drop if pred(r) else keep).append(line)
    if drop:
        with open(arch, "a") as fh:
            fh.writelines(drop)
        with open(path, "w") as fh:
            fh.writelines(keep)
        print(f"archived {len(drop)} rows {path} -> {arch}")

strip("bench_results/golden_tpu_v5_lite_s.jsonl",
      "bench_results/golden_tpu_v5_lite_s_prer5_stale.jsonl",
      lambda r: r["op"] == "trtri" and r["n"] in (8192, 16384))
strip("bench_results/golden_tpu_v5_lite_d.jsonl",
      "bench_results/golden_tpu_v5_lite_d_prer5_stale.jsonl",
      lambda r: r["op"] in ("potrf", "trtri", "potri", "lauum", "logdet",
                            "trsm", "syrk")
      and r["n"] in (4096, 6144, 8192))
EOF

# P0b (conditional): if the autotune stage ahead of this queue moved the
# potrf mono-kernel crossover past 2048 (VERDICT r4 Weak #3: the r4 fori
# kernel reaches 8192 but the shipped crossover was never re-measured),
# archive the s potrf rows inside the new mono range so the run below
# re-records them on the mono path; if the crossover stayed at 2048 the
# rows survive and --resume skips the chunk for free.
python - <<'EOF'
import json
tab = json.load(open("cholesky_tpu/tuning/tables/tpu_v5_lite.json"))
cap = tab.get("potrf_f32", {}).get("mega_max_n", 2048)
if cap > 2048:
    path = "bench_results/golden_tpu_v5_lite_s.jsonl"
    arch = "bench_results/golden_tpu_v5_lite_s_prer5_stale.jsonl"
    keep, drop = [], []
    for line in open(path):
        try:
            r = json.loads(line)
        except ValueError:
            keep.append(line); continue
        (drop if r["op"] == "potrf" and 2048 < r["n"] <= cap else
         keep).append(line)
    if drop:
        with open(arch, "a") as fh:
            fh.writelines(drop)
        with open(path, "w") as fh:
            fh.writelines(keep)
        print(f"potrf crossover moved to {cap}: archived {len(drop)} rows")
EOF
# P0: the lifted trtri mono kernel at the sizes the cap was blocking
run s trtri 8192,16384 golden_tpu_v5_lite_s.jsonl

# P0b runs (no-ops unless the strip above archived rows)
run s potrf 4096,6144,8192 golden_tpu_v5_lite_s.jsonl
run s potrf 2560,3072,3584 golden_tpu_v5_lite_s.jsonl
run s potrf 2304,2816,3328,3840 golden_tpu_v5_lite_s.jsonl

# P1: d family on the hoisted-peel recursions
run d potrf,trtri 4096,6144,8192 golden_tpu_v5_lite_d.jsonl
run d potri,lauum,logdet 4096,6144,8192 golden_tpu_v5_lite_d.jsonl
run d trsm,syrk 4096,6144,8192 golden_tpu_v5_lite_d.jsonl

# P2: c ceilings to 8192
run c potrf 8192 golden_tpu_v5_lite_c.jsonl
run c trmm,trsm 8192 golden_tpu_v5_lite_c.jsonl
run c trtri,lauum 8192 golden_tpu_v5_lite_c.jsonl
run c potri,logdet 8192 golden_tpu_v5_lite_c.jsonl
run c gemm,syrk 6144 golden_tpu_v5_lite_c.jsonl

# P3: z ceiling to 5120 + gemm/herk grid densify
run z potrf 5120 golden_tpu_v5_lite_z.jsonl
run z trmm,trsm 5120 golden_tpu_v5_lite_z.jsonl
run z trtri,lauum,potri,logdet 5120 golden_tpu_v5_lite_z.jsonl
run z gemm,syrk 256,512,768,1024,1536 golden_tpu_v5_lite_z.jsonl
run z gemm,syrk 2560,3072 golden_tpu_v5_lite_z.jsonl

# P4: s small-n 64-step ladders + mid-gap fill (latency-floor map)
run s potrf,trtri,potri 64,192,320,448,576,704,832,960 golden_tpu_v5_lite_s.jsonl
run s trtri,potri 384,640,896,1152,1408,1664,1920 golden_tpu_v5_lite_s.jsonl
run s trtri,potri 2304,2816,3328,3840 golden_tpu_v5_lite_s.jsonl

# P5: stretch — one attempt each, plausible-but-unrecorded shapes
run d potrf 11264 golden_tpu_v5_lite_d.jsonl
run c potrf 10240 golden_tpu_v5_lite_c.jsonl
run s trtri 20480 golden_tpu_v5_lite_s.jsonl

python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true
echo "=== goldens_r5 done $(date +%H:%M:%S) ==="
