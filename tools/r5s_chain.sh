#!/bin/bash
# Round-5 session chip chain — ONE chip client at a time (CLAUDE.md rule 7).
# Order: bench headline FIRST (VERDICT r4 Next #1: land a nonzero round
# artifact while the tunnel is alive), then the 2-min smoke gate, then the
# autotune refresh (VERDICT r4 Next #3), then the golden harvest queue
# (VERDICT r4 Next #2/#4/#5/#7 re-records).
# A detached killer (launched by the session, not this script) frees the
# chip ~45 min before the expected round end so the driver's bench.py and
# dryrun get an uncontended tunnel (the r2/r3 zero-bench root cause).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5s bench_results

echo "=== chain start $(date -u) pid=$$ ==="

echo "--- stage 1: bench.py headline ($(date -u +%H:%M:%S)) ---"
timeout 2100 python bench.py > /tmp/r5s/bench_headline.json \
    2> /tmp/r5s/bench_headline.log
echo "bench rc=$?"
cat /tmp/r5s/bench_headline.json

echo "--- stage 2: smoke gate ($(date -u +%H:%M:%S)) ---"
timeout 1200 python tools/smoke_tpu.py --out bench_results/smoke_tpu.json \
    2> /tmp/r5s/smoke.log
echo "smoke rc=$?"

echo "--- stage 3: autotune --quick ($(date -u +%H:%M:%S)) ---"
timeout 3000 python tools/autotune.py --quick > /tmp/r5s/autotune.json \
    2> /tmp/r5s/autotune.log
echo "autotune rc=$?"

echo "--- stage 4: goldens_r5 queue ($(date -u +%H:%M:%S)) ---"
bash tools/goldens_r5.sh

echo "=== chain done $(date -u) ==="
