#!/bin/bash
# Round-4 tunnel watch: probe the axon relay every 120s with a tiny
# 40s-timeout dispatch subprocess (CLAUDE.md rule 7). Appends one line per
# probe to /tmp/tunnel_watch_r4.log; exits 0 the first time the tunnel is
# ALIVE so callers can chain chip work, or exits 1 after MAX_PROBES.
MAX_PROBES=${1:-300}
LOG=/tmp/tunnel_watch_r4.log
for i in $(seq 1 "$MAX_PROBES"); do
  # first probe gets a patient window: a cold-boot VM's first dispatch
  # includes the remote TPU claim (269 s measured, r4 session 6)
  W=40; [ "$i" -eq 1 ] && W=320
  if timeout "$W" python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8))
assert float((x @ x).sum()) == 512.0
print(jax.default_backend())
" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) ALIVE (probe $i)" >> "$LOG"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) dead (probe $i)" >> "$LOG"
  sleep 120
done
exit 1
