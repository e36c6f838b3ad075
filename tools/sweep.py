#!/usr/bin/env python
"""Benchmark + accuracy sweep suite with golden results.

Rebuild of the reference's sweep scripts and golden logs
(reference test/test_gpulapack.sh:4-13 — cuspotrf n=64..4096 step 64 etc.,
tee'd into the 51 text logs of test/benchmark_base.tar.gz): each sweep
point times the op on the device, checks max elementwise error against a
float64 numpy oracle with the eps-scaled analytic tolerance
(test/blas/sgemm.c:160-166), and emits one JSON line
  {"op", "config", "n", "time_ms", "gflops", "max_err", "tol", "passed"}.

Oracles run on host cores in parallel with device work via the native task
runtime (cholesky_tpu/runtime) — the reference's CPU/GPU overlap, repurposed.

Usage:
  python tools/sweep.py --ops potrf,potri --sizes 256:2048:256 \
      --out bench_results/sweep.jsonl
  python tools/sweep.py ... --golden bench_results/golden.jsonl   # compare
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_sweep_cache")

from cholesky_tpu.ops import blocked
from cholesky_tpu.rng import latmc, generators
from cholesky_tpu.runtime import TaskPool

EPS32 = float(np.finfo(np.float32).eps)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _force(out):
    """Force real completion: block_until_ready alone can return before
    remote execution finishes on this runtime (see utils/benchlib.py)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).real)
    return out


def _time(f, *args, iters=10):
    out = _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters, out


def _tol(fpe, scale):
    return fpe * 2.0 * EPS32 * max(1.0, scale)


# --- per-op sweep points: (run, oracle, flops, fpe) ------------------------

def point_potrf(n, backend):
    A = latmc(jax.random.PRNGKey(n), n, 100.0, jnp.float32)
    f = jax.jit(functools.partial(blocked.potrf, "L", backend=backend))
    dt, (F, info) = _time(f, A)
    Fnp = np.tril(np.asarray(F, np.float64))
    Anp = np.asarray(A, np.float64)

    def oracle():
        ref = np.linalg.cholesky(Anp)
        return float(np.max(np.abs(Fnp - ref))), float(np.max(np.abs(ref)))

    return dt, n ** 3 / 3 + n ** 2 / 2, oracle, 8 * n, int(info)


def point_potri(n, backend):
    A = latmc(jax.random.PRNGKey(n), n, 50.0, jnp.float32)
    fpo = jax.jit(functools.partial(blocked.potrf, "L", backend=backend))
    F, _ = fpo(A)
    f = jax.jit(functools.partial(blocked.potri, "L", backend=backend))
    dt, (Inv, info) = _time(f, F)
    Invnp = np.tril(np.asarray(Inv, np.float64))
    Anp = np.asarray(A, np.float64)

    def oracle():
        ref = np.tril(np.linalg.inv(Anp))
        return float(np.max(np.abs(Invnp - ref))), float(np.max(np.abs(ref)))

    return dt, 2 * n ** 3 / 3, oracle, 3000 * n, int(info)


def _chol_factor(n):
    """Well-conditioned lower-triangular fixture: the Cholesky factor of a
    latmc SPD matrix (cond ~ sqrt(100)). Raw random triangular matrices
    have cond ~ 2^n — at n=4096 even the f64 numpy oracle overflows."""
    A = latmc(jax.random.PRNGKey(n), n, 100.0, jnp.float32)
    F, _ = blocked.potrf("L", A, backend="xla" if n <= 512 else "pallas")
    return jnp.tril(F)


def point_trtri(n, backend):
    A = _chol_factor(n)
    f = jax.jit(functools.partial(blocked.trtri, "L", "N", backend=backend))
    dt, (R, info) = _time(f, A)
    Rnp = np.tril(np.asarray(R, np.float64))
    Anp = np.tril(np.asarray(A, np.float64))

    def oracle():
        ref = np.tril(np.linalg.inv(Anp))
        return float(np.max(np.abs(Rnp - ref))), float(np.max(np.abs(ref)))

    return dt, n ** 3 / 3, oracle, 60 * n, int(info)


def point_lauum(n, backend):
    A = _chol_factor(n)
    f = jax.jit(functools.partial(blocked.lauum, "L", backend=backend))
    dt, R = _time(f, A)
    Rnp = np.tril(np.asarray(R, np.float64))
    Anp = np.tril(np.asarray(A, np.float64))

    def oracle():
        ref = np.tril(Anp.T @ Anp)
        return float(np.max(np.abs(Rnp - ref))), float(np.max(np.abs(ref)))

    return dt, n ** 3 / 3, oracle, 2 * n + 3, 0


def point_logdet(n, backend):
    A = latmc(jax.random.PRNGKey(n), n, 30.0, jnp.float32)
    f = jax.jit(functools.partial(blocked.logdet, "L", backend=backend))
    dt, (val, info) = _time(f, A)
    Anp = np.asarray(A, np.float64)
    v = float(val)

    def oracle():
        _, ref = np.linalg.slogdet(Anp)
        return float(abs(v - ref)), float(abs(ref))

    return dt, n ** 3 / 3, oracle, 60 * n, int(info)


def point_gemm(n, backend):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(n), 3)
    A = (jax.random.uniform(k1, (n, n)) - 0.5).astype(jnp.float32)
    B = (jax.random.uniform(k2, (n, n)) - 0.5).astype(jnp.float32)
    C = (jax.random.uniform(k3, (n, n)) - 0.5).astype(jnp.float32)
    f = jax.jit(lambda a, b, c: blocked.gemm("N", "N", 1.0, a, b, -1.0, c,
                                             backend=backend))
    dt, D = _time(f, A, B, C)
    Dnp = np.asarray(D, np.float64)
    An, Bn, Cn = (np.asarray(x, np.float64) for x in (A, B, C))

    def oracle():
        ref = An @ Bn - Cn
        return float(np.max(np.abs(Dnp - ref))), float(np.max(np.abs(ref)))

    return dt, 2 * n ** 3, oracle, 2 * n + 3, 0


def point_syrk(n, backend):
    k1, k2 = jax.random.split(jax.random.PRNGKey(n))
    A = (jax.random.uniform(k1, (n, n)) - 0.5).astype(jnp.float32)
    C = (jax.random.uniform(k2, (n, n)) - 0.5).astype(jnp.float32)
    f = jax.jit(lambda a, c: blocked.syrk("L", "N", -1.0, a, 1.0, c,
                                          backend=backend))
    dt, D = _time(f, A, C)
    Dnp = np.tril(np.asarray(D, np.float64))
    An, Cn = np.asarray(A, np.float64), np.asarray(C, np.float64)

    def oracle():
        ref = np.tril(-An @ An.T + Cn)
        return float(np.max(np.abs(Dnp - ref))), float(np.max(np.abs(ref)))

    return dt, n ** 3, oracle, 2 * n + 3, 0


def point_trsm(n, backend):
    A = _chol_factor(n)
    B = (jax.random.uniform(jax.random.PRNGKey(n + 1), (n, n)) - 0.5) \
        .astype(jnp.float32)
    f = jax.jit(lambda a, b: blocked.trsm("L", "L", "N", "N", 1.0, a, b,
                                          backend=backend))
    dt, X = _time(f, A, B)
    Xnp = np.asarray(X, np.float64)
    An = np.tril(np.asarray(A, np.float64))
    Bn = np.asarray(B, np.float64)

    def oracle():
        # scaled residual — forward error is cond-limited for triangular
        # random matrices (reference custrsm tests use ≤1e-6 on tame inputs)
        res = np.max(np.abs(An @ Xnp - Bn))
        scale = np.max(np.abs(Xnp)) * np.max(np.abs(An))
        return float(res / max(scale, 1e-30)), 1.0

    return dt, n ** 3, oracle, 60 * n, 0


POINTS = {
    "potrf": point_potrf, "potri": point_potri, "trtri": point_trtri,
    "lauum": point_lauum, "logdet": point_logdet,
    "gemm": point_gemm, "syrk": point_syrk, "trsm": point_trsm,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="potrf,potri,trtri,lauum,logdet,gemm,syrk,trsm")
    ap.add_argument("--sizes", default="256:2048:256",
                    help="start:stop:step (inclusive stop)")
    ap.add_argument("--backend", default=None,
                    help="default: pallas on tpu, xla elsewhere")
    ap.add_argument("--out", default="bench_results/sweep.jsonl")
    ap.add_argument("--golden", default=None,
                    help="compare gflops against a golden jsonl (±30%%)")
    args = ap.parse_args()

    backend = args.backend or ("pallas" if jax.default_backend() == "tpu"
                               else "xla")
    start, stop, step = (int(x) for x in args.sizes.split(":"))
    sizes = list(range(start, stop + 1, step))
    ops = args.ops.split(",")

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    results = []
    with TaskPool(4) as pool:
        oracle_tasks = []
        for op in ops:
            for n in sizes:
                dt, flops, oracle, fpe, info = POINTS[op](n, backend)
                rec = {"op": op, "config": backend, "n": n,
                       "time_ms": round(dt * 1e3, 3),
                       "gflops": round(flops / dt / 1e9, 1), "info": info}
                holder = {}
                def run_oracle(oracle=oracle, holder=holder):
                    holder["err"], holder["scale"] = oracle()
                    return 0
                t = pool.run(len(oracle_tasks) % 4, run_oracle)
                oracle_tasks.append((rec, holder, t, fpe))
                log(f"{op} n={n}: {rec['gflops']} GF/s ({rec['time_ms']} ms)")
        for rec, holder, t, fpe in oracle_tasks:
            t.join()
            tol = _tol(fpe, holder["scale"])
            rec["max_err"] = float(f"{holder['err']:.3e}")
            rec["tol"] = float(f"{tol:.3e}")
            rec["passed"] = bool(holder["err"] <= tol and rec["info"] == 0)
            results.append(rec)

    with open(out_path, "w") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")
    npass = sum(r["passed"] for r in results)
    log(f"{npass}/{len(results)} PASSED -> {out_path}")

    if args.golden:
        golden = {}
        with open(args.golden) as f:
            for line in f:
                g = json.loads(line)
                golden[(g["op"], g["n"])] = g
        regressions = []
        for r in results:
            g = golden.get((r["op"], r["n"]))
            if g and r["gflops"] < 0.7 * g["gflops"]:
                regressions.append((r["op"], r["n"], r["gflops"], g["gflops"]))
        if regressions:
            log("PERF REGRESSIONS (>30% below golden):")
            for op, n, got, want in regressions:
                log(f"  {op} n={n}: {got} vs golden {want} GF/s")
            sys.exit(1)
        log("no perf regressions vs golden")

    sys.exit(0 if npass == len(results) else 2)


if __name__ == "__main__":
    main()
