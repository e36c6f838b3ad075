#!/usr/bin/env python
"""Headline benchmark: blocked f32 POTRF on one TPU chip.

Prints ONE JSON line:
  {"metric": "spotrf_gflops_n4096", "value": ..., "unit": "GFLOP/s",
   "vs_baseline": ...}

Baseline: the reference's cuSpotrf lower at n=4096 — 175 GFlop/s on its
development GPU (BASELINE.md, benchmark_base.tar.gz cuspotrf_l.txt).
Flop count uses the reference's formula n³/3 + n²/2 + n/6
(reference test/lapack/cuspotrf.c:146-148).

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from cholesky_tpu.ops import blocked
from cholesky_tpu.rng import latmc
from cholesky_tpu.utils.benchlib import bench_op

BASELINE_GFLOPS = 175.0
N = 4096
NB = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    backend = jax.default_backend()
    log(f"device: {jax.devices()[0]} (backend={backend})")
    n = N if backend == "tpu" else 512  # CPU fallback keeps CI meaningful

    A = latmc(jax.random.PRNGKey(0), n, 100.0, jnp.float32)
    f = jax.jit(functools.partial(blocked.potrf, "L",
                                  backend="pallas" if backend == "tpu" else "xla",
                                  block_size=NB))
    t0 = time.perf_counter()
    F, info = f(A)
    jax.block_until_ready(F)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s, info={int(info)}")

    # accuracy (measured on host in f64 — on-device matmul would round)
    Lnp = np.tril(np.asarray(F, np.float64))
    Anp = np.asarray(A, np.float64)
    resid = float(np.max(np.abs(Lnp @ Lnp.T - Anp)) / np.max(np.abs(Anp)))
    log(f"relative backward residual: {resid:.2e}")
    if int(info) != 0 or resid > 1e-5:
        print(json.dumps({"metric": f"spotrf_gflops_n{n}", "value": 0.0,
                          "unit": "GFLOP/s", "vs_baseline": 0.0,
                          "error": f"accuracy failure resid={resid}"}))
        return

    # forced-completion timing (utils/benchlib.py): chained dependent
    # iterations inside one jit + host fetch — block_until_ready alone can
    # return before remote execution finishes on this runtime
    dt = bench_op(lambda x: f(x)[0], A, chain=4, reps=3)
    flops = n ** 3 / 3 + n ** 2 / 2 + n / 6
    gf = flops / dt / 1e9
    log(f"potrf n={n}: {dt * 1e3:.2f} ms -> {gf:.0f} GFLOP/s")

    print(json.dumps({
        "metric": f"spotrf_gflops_n{n}",
        "value": round(gf, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gf / BASELINE_GFLOPS, 2),
    }))


if __name__ == "__main__":
    main()
