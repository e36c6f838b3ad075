#!/bin/bash
# Bounded tunnel-watch (round-3 outage recovery): probe the axon tunnel
# with a tiny dispatch; if it comes back inside the window, record the
# highest-value missing golden rows (d live-block TRMM ≥1792, z to 1024,
# c to 1024). Hard-stops long before the driver's end-of-round bench so
# nothing contends with it. Safe to re-run; every chunk is --resume.
set -u
cd "$(dirname "$0")/.."
END=$(( $(date +%s) + ${WATCH_S:-2280} ))
while [ "$(date +%s)" -lt "$END" ]; do
  if timeout 40 python -c "import jax, jax.numpy as jnp; float(jnp.ones((4,128)).sum())" >/dev/null 2>&1; then
    echo "tunnel back at $(date)"
    timeout 420 python tools/sweep.py --dtype d --ops trmm --sizes 1792,2048 \
      --resume --out bench_results/golden_tpu_v5_lite_d.jsonl
    timeout 480 python tools/sweep.py --dtype z --ops potrf --sizes 640:1024:128 \
      --resume --out bench_results/golden_tpu_v5_lite_z.jsonl
    timeout 300 python tools/sweep.py --dtype c --ops potrf --sizes 768,1024 \
      --resume --out bench_results/golden_tpu_v5_lite_c.jsonl
    break
  fi
  sleep 45
done
echo "tunnel-watch done $(date)"
