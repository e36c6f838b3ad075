#!/usr/bin/env python
"""Benchmark + accuracy sweep suite with golden results, all four precisions.

Rebuild of the reference's sweep scripts and golden logs
(reference test/test_gpulapack.sh:4-13 — cuspotrf n=64..4096 step 64 etc.,
tee'd into the 51 text logs of test/benchmark_base.tar.gz): each sweep
point times the op on the device, checks max elementwise error against a
float64/complex128 numpy oracle with the eps-scaled analytic tolerance
(reference test/blas/sgemm.c:160-166), and emits one JSON line
  {"op", "config", "n", "time_ms", "gflops", "max_err", "tol", "passed"}.

Timing goes through utils.benchlib.bench_op (chained dependent iterations
inside ONE compiled program — CLAUDE.md rule 1): per-op cost is then
roundtrip/chain, not the ~30 ms tunnel dispatch floor that a naive
dispatch loop measures.

Precisions (reference single2double.sh / complex2doublecomplex.sh tiers):
  --dtype s   float32 (default)
  --dtype d   float64 (Ozaki int8 tiles on TPU)
  --dtype c/z complex; on TPU operands travel as (re, im) PAIRS through
              the real-embedding tier (c128 does not compile on TPU, and
              c64 results cannot be transferred — CLAUDE.md rule 4).

Oracles run on host cores in parallel with device work via the native task
runtime (cholesky_tpu/runtime) — the reference's CPU/GPU overlap, repurposed.

Usage:
  python tools/sweep.py --ops potrf,potri --sizes 256:2048:256 \
      --out bench_results/sweep.jsonl
  python tools/sweep.py ... --golden bench_results/golden.jsonl   # compare
  python tools/sweep.py --dtype d --resume --out golden_d.jsonl   # accumulate
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

EPS32 = float(np.finfo(np.float32).eps)
EPS64 = float(np.finfo(np.float64).eps)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class DT:
    """Per-letter dtype context (the s/d/c/z axis of the reference)."""

    def __init__(self, letter: str):
        assert letter in "sdcz"
        self.letter = letter
        self.real = letter in "sd"
        self.rdt = jnp.float32 if letter in "sc" else jnp.float64
        self.cdt = {"s": jnp.float32, "d": jnp.float64,
                    "c": jnp.complex64, "z": jnp.complex128}[letter]
        # on TPU complex operands travel as (re, im) pairs (CLAUDE.md rule 4)
        self.pair = (not self.real) and jax.default_backend() == "tpu"
        # complex arithmetic = 4 real flops per multiply-add
        self.flop_factor = 1.0 if self.real else 4.0
        self.eps = EPS32 if letter in "sc" else EPS64
        # d/z on TPU run on Ozaki int8 slices (s on the embedding of z):
        # the slice-split error model is wider than native-f64 rounding
        self.fudge = 16.0 if (letter in "dz"
                              and jax.default_backend() == "tpu") else 1.0

    # -- fixtures ----------------------------------------------------------

    def hpd(self, n, cond=100.0):
        from cholesky_tpu.rng import generators
        key = jax.random.PRNGKey(n)
        if self.pair:
            return generators.latmc_pair(key, n, cond, self.rdt)
        return generators.latmc(key, n, cond, self.cdt)

    def chol_factor(self, n):
        from cholesky_tpu.ops import blocked
        # one jitted program: eager tracing costs one remote dispatch per
        # XLA op (and the potrf point at the same n warms this compile)
        F, _ = jax.jit(lambda a: blocked.potrf("L", a, backend="auto"))(
            self.hpd(n))
        return self._tril(F)

    def rand(self, n, seed_off=0):
        key = jax.random.PRNGKey(n + seed_off)
        k1, k2 = jax.random.split(key)
        r = (jax.random.uniform(k1, (n, n), self.rdt) - 0.5)
        if self.real:
            return r
        i = (jax.random.uniform(k2, (n, n), self.rdt) - 0.5)
        if self.pair:
            return r, i
        return jax.lax.complex(r, i).astype(self.cdt)

    # -- pair/array helpers ------------------------------------------------

    def _tril(self, X, k=0):
        if isinstance(X, tuple):
            return jnp.tril(X[0], k), jnp.tril(X[1], k)
        return jnp.tril(X, k)

    def to_np(self, X):
        """numpy f64/c128 view of an array or an (re, im) pair."""
        if isinstance(X, tuple):
            return (np.asarray(X[0], np.float64)
                    + 1j * np.asarray(X[1], np.float64))
        x = np.asarray(X)
        return x.astype(np.complex128 if np.iscomplexobj(x) else np.float64)


def _chain_for(n, letter):
    """bench_op chain length: long enough that the ~30 ms tunnel roundtrip
    is amortized below the op's own runtime, short enough to keep each
    timed rep under ~1 s."""
    if n <= 256:
        c = 2048
    elif n <= 512:
        c = 1024
    elif n <= 1024:
        c = 512
    elif n <= 2048:
        c = 256
    elif n <= 4096:
        c = 128
    elif n <= 8192:
        c = 32
    else:
        c = 8
    if letter in ("d", "z"):
        c = max(16, c // 8)
    elif letter == "c":
        c = max(16, c // 2)
    return c


def _time(f, x, n, letter):
    """(median seconds/op, f(x)) — timing via the chained-program harness.
    The op value comes out of the SAME chained program (return_out): one
    remote compile per point instead of two."""
    from cholesky_tpu.utils.benchlib import bench_op
    return bench_op(f, x, chain=_chain_for(n, letter), reps=3,
                    return_out=True)


def _tol(dt: DT, fpe, scale, n=0):
    if dt.fudge > 1.0:
        # Ozaki tiers carry a slice-quantization floor (~2^-42 per
        # product) that does NOT shrink with the op's flop count — a
        # low-flop op like lauum (fpe=2n+3) would otherwise get a bound
        # below the representation floor of the int8-slice arithmetic
        fpe = max(fpe, 60 * n)
    return fpe * 2.0 * dt.eps * dt.fudge * max(1.0, scale)


# --- per-op sweep points: return (dt_sec, flops, oracle, fpe, info) --------

def point_potrf(n, backend, dt: DT):
    from cholesky_tpu.ops import blocked
    A = dt.hpd(n)
    f = jax.jit(lambda a: blocked.potrf("L", a, backend=backend))
    sec, (F, info) = _time(f, A, n, dt.letter)
    Fnp = np.tril(dt.to_np(dt._tril(F)))
    Anp = dt.to_np(A)

    def oracle():
        ref = np.linalg.cholesky(Anp)
        return float(np.max(np.abs(Fnp - ref))), float(np.max(np.abs(ref)))

    # fpe carries the fixture's cond=100 forward-error amplification: the
    # oracle is exact-f64 Cholesky, so |impl - ref| ~ kappa * eps * n unlike
    # the reference's same-precision naive-ref comparison where the
    # conditioning error largely cancels (test/lapack/cuspotrf.c:106-114)
    return sec, dt.flop_factor * (n ** 3 / 3 + n ** 2 / 2), oracle, 100 * n, int(info)


def point_potri(n, backend, dt: DT):
    from cholesky_tpu.ops import blocked
    F = dt.chol_factor(n)
    f = jax.jit(lambda a: blocked.potri("L", a, backend=backend))
    sec, (Inv, info) = _time(f, F, n, dt.letter)
    Invnp = np.tril(dt.to_np(dt._tril(Inv)))
    Fnp = np.tril(dt.to_np(F))
    Anp = Fnp @ Fnp.conj().T

    def oracle():
        ref = np.tril(np.linalg.inv(Anp))
        return float(np.max(np.abs(Invnp - ref))), float(np.max(np.abs(ref)))

    return sec, dt.flop_factor * 2 * n ** 3 / 3, oracle, 3000 * n, int(info)


def point_trtri(n, backend, dt: DT):
    from cholesky_tpu.ops import blocked
    A = dt.chol_factor(n)
    f = jax.jit(lambda a: blocked.trtri("L", "N", a, backend=backend))
    sec, (R, info) = _time(f, A, n, dt.letter)
    Rnp = np.tril(dt.to_np(dt._tril(R)))
    Anp = np.tril(dt.to_np(A))

    def oracle():
        ref = np.tril(np.linalg.inv(Anp))
        return float(np.max(np.abs(Rnp - ref))), float(np.max(np.abs(ref)))

    return sec, dt.flop_factor * n ** 3 / 3, oracle, 60 * n, int(info)


def point_lauum(n, backend, dt: DT):
    from cholesky_tpu.ops import blocked
    A = dt.chol_factor(n)
    f = jax.jit(lambda a: blocked.lauum("L", a, backend=backend))
    sec, R = _time(f, A, n, dt.letter)
    Rnp = np.tril(dt.to_np(dt._tril(R)))
    Anp = np.tril(dt.to_np(A))

    def oracle():
        ref = np.tril(Anp.conj().T @ Anp)
        return float(np.max(np.abs(Rnp - ref))), float(np.max(np.abs(ref)))

    return sec, dt.flop_factor * n ** 3 / 3, oracle, 2 * n + 3, 0


def point_logdet(n, backend, dt: DT):
    from cholesky_tpu.ops import blocked
    A = dt.hpd(n, cond=30.0)
    f = jax.jit(lambda a: blocked.logdet("L", a, backend=backend))
    sec, (val, info) = _time(f, A, n, dt.letter)
    Anp = dt.to_np(A)
    v = float(np.asarray(val))

    def oracle():
        _, ref = np.linalg.slogdet(Anp)
        return float(abs(v - ref)), float(abs(ref))

    return sec, dt.flop_factor * n ** 3 / 3, oracle, 60 * n, int(info)


def point_logdet_diag(n, backend, dt: DT):
    """Bandwidth-metric logdet from a factored diagonal, to n = 2^20 —
    the reference's cuslogdet sweep (test/benchmark_base cuslogdet.txt,
    strided-vector entry slogdet.c:10-25). 'gflops' field = GB/s here."""
    from cholesky_tpu.ops import lapack_ref
    d = (jax.random.uniform(jax.random.PRNGKey(n), (n,), dt.rdt) + 0.5)
    f = jax.jit(lapack_ref.logdet_from_factor)
    sec, val = _time(f, d, min(n, 8192), dt.letter)
    dn = np.asarray(d, np.float64)
    v = float(np.asarray(val))

    def oracle():
        ref = 2.0 * float(np.sum(np.log(dn)))
        return float(abs(v - ref)), float(abs(ref))

    # report bytes moved (one read of the vector) — bandwidth, not flops
    nbytes = n * np.dtype(np.float32 if dt.letter in "sc" else np.float64).itemsize
    return sec, nbytes, oracle, 60 * max(1, n // 1024), 0


def point_gemm(n, backend, dt: DT):
    from cholesky_tpu.ops import blocked
    A, B, C = dt.rand(n, 0), dt.rand(n, 1), dt.rand(n, 2)
    f = jax.jit(lambda a: blocked.gemm("N", "N", 1.0, a, B, -1.0, C,
                                       backend=backend))
    sec, D = _time(f, A, n, dt.letter)
    Dnp = dt.to_np(D)
    An, Bn, Cn = dt.to_np(A), dt.to_np(B), dt.to_np(C)

    def oracle():
        ref = An @ Bn - Cn
        return float(np.max(np.abs(Dnp - ref))), float(np.max(np.abs(ref)))

    return sec, dt.flop_factor * 2 * n ** 3, oracle, 2 * n + 3, 0


def point_syrk(n, backend, dt: DT):
    from cholesky_tpu.ops import blocked
    A, C = dt.rand(n, 0), dt.rand(n, 1)
    if dt.real:
        f = jax.jit(lambda a: blocked.syrk("L", "N", -1.0, a, 1.0, C,
                                           backend=backend))
    else:
        # complex tier: the Hermitian rank-k update is HERK
        Ch = dt._tril(C)  # only the triangle is read; diag im ignored
        f = jax.jit(lambda a: blocked.herk("L", "N", -1.0, a, 1.0, Ch,
                                           backend=backend))
    sec, D = _time(f, A, n, dt.letter)
    Dnp = np.tril(dt.to_np(dt._tril(D)))
    An = dt.to_np(A)
    Cn = np.tril(dt.to_np(dt._tril(C) if not dt.real else C))
    if not dt.real:
        Cn = Cn - 1j * np.diag(np.diag(Cn).imag)

    def oracle():
        ref = np.tril(-An @ An.conj().T + Cn)
        return float(np.max(np.abs(Dnp - ref))), float(np.max(np.abs(ref)))

    return sec, dt.flop_factor * n ** 3, oracle, 2 * n + 3, 0


def point_trmm(n, backend, dt: DT):
    from cholesky_tpu.ops import blocked
    A = dt.chol_factor(n)
    B = dt.rand(n, 1)
    f = jax.jit(lambda b: blocked.trmm("L", "L", "N", "N", 1.0, A, b,
                                       backend=backend))
    sec, D = _time(f, B, n, dt.letter)
    Dnp = dt.to_np(D)
    An = np.tril(dt.to_np(A))
    Bn = dt.to_np(B)

    def oracle():
        ref = An @ Bn
        return float(np.max(np.abs(Dnp - ref))), float(np.max(np.abs(ref)))

    return sec, dt.flop_factor * n ** 3, oracle, 2 * n + 3, 0


def point_trsm(n, backend, dt: DT):
    from cholesky_tpu.ops import blocked
    A = dt.chol_factor(n)
    B = dt.rand(n, 1)
    f = jax.jit(lambda b: blocked.trsm("L", "L", "N", "N", 1.0, A, b,
                                       backend=backend))
    sec, X = _time(f, B, n, dt.letter)
    Xnp = dt.to_np(X)
    An = np.tril(dt.to_np(A))
    Bn = dt.to_np(B)

    def oracle():
        # scaled residual — forward error is cond-limited for triangular
        # solves (reference custrsm tests use ≤1e-6 on tame inputs)
        res = np.max(np.abs(An @ Xnp - Bn))
        scale = np.max(np.abs(Xnp)) * np.max(np.abs(An))
        return float(res / max(scale, 1e-30)), 1.0

    return sec, dt.flop_factor * n ** 3, oracle, 60 * n, 0


POINTS = {
    "potrf": point_potrf, "potri": point_potri, "trtri": point_trtri,
    "lauum": point_lauum, "logdet": point_logdet,
    "logdet_diag": point_logdet_diag,
    "gemm": point_gemm, "syrk": point_syrk, "trmm": point_trmm,
    "trsm": point_trsm,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="potrf,potri,trtri,lauum,logdet,gemm,syrk,trmm,trsm")
    ap.add_argument("--sizes", default="256:2048:256",
                    help="start:stop:step (inclusive stop), or comma list")
    ap.add_argument("--dtype", default="s", choices=list("sdcz"))
    ap.add_argument("--backend", default=None,
                    help="default: auto (pallas/ozaki/embed on tpu)")
    ap.add_argument("--out", default="bench_results/sweep.jsonl")
    ap.add_argument("--golden", default=None,
                    help="compare gflops against a golden jsonl (±30%%)")
    ap.add_argument("--resume", action="store_true",
                    help="append to --out, skipping points already present")
    args = ap.parse_args()

    if args.dtype in "dz":
        jax.config.update("jax_enable_x64", True)

    dt = DT(args.dtype)
    backend = args.backend or "auto"
    if ":" in args.sizes:
        start, stop, step = (int(x) for x in args.sizes.split(":"))
        sizes = list(range(start, stop + 1, step))
    else:
        sizes = [int(x) for x in args.sizes.split(",")]
    ops = args.ops.split(",")

    from cholesky_tpu.runtime import TaskPool

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    done = set()
    results = []
    if args.resume and out_path.exists():
        with open(out_path) as f:
            for line in f:
                r = json.loads(line)
                results.append(r)
                done.add((r["op"], r.get("dtype", "s"), r["n"]))

    fresh = []
    with TaskPool(4) as pool:
        oracle_tasks = []
        for op in ops:
            for n in sizes:
                if (op, dt.letter, n) in done:
                    continue
                try:
                    sec, flops, oracle, fpe, info = POINTS[op](n, backend, dt)
                except Exception as e:
                    log(f"{op}[{dt.letter}] n={n}: FAILED "
                        f"{type(e).__name__}: {str(e)[:150]}")
                    fresh.append({"op": op, "dtype": dt.letter,
                                  "config": backend, "n": n,
                                  "passed": False,
                                  "error": f"{type(e).__name__}"})
                    continue
                rec = {"op": op, "dtype": dt.letter, "config": backend,
                       "n": n, "time_ms": round(sec * 1e3, 3),
                       "gflops": round(flops / sec / 1e9, 1), "info": info}
                holder = {}

                def run_oracle(oracle=oracle, holder=holder):
                    holder["err"], holder["scale"] = oracle()
                    return 0

                t = pool.run(len(oracle_tasks) % 4, run_oracle)
                oracle_tasks.append((rec, holder, t, fpe))
                log(f"{op}[{dt.letter}] n={n}: {rec['gflops']} GF/s "
                    f"({rec['time_ms']} ms)")
        for rec, holder, t, fpe in oracle_tasks:
            t.join()
            tol = _tol(dt, fpe, holder["scale"], rec["n"])
            rec["max_err"] = float(f"{holder['err']:.3e}")
            rec["tol"] = float(f"{tol:.3e}")
            rec["passed"] = bool(holder["err"] <= tol and rec["info"] == 0)
            fresh.append(rec)

    results.extend(fresh)
    with open(out_path, "w") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")
    scored = [r for r in results if "max_err" in r or not r["passed"]]
    npass = sum(r["passed"] for r in scored)
    log(f"{npass}/{len(scored)} PASSED -> {out_path}")

    if args.golden:
        golden = {}
        with open(args.golden) as f:
            for line in f:
                g = json.loads(line)
                golden[(g["op"], g.get("dtype", "s"), g["n"])] = g
        regressions = []
        for r in results:
            g = golden.get((r["op"], r.get("dtype", "s"), r["n"]))
            if g and "gflops" in r and r["gflops"] < 0.7 * g["gflops"]:
                regressions.append((r["op"], r["n"], r["gflops"], g["gflops"]))
        if regressions:
            log("PERF REGRESSIONS (>30% below golden):")
            for op, n, got, want in regressions:
                log(f"  {op} n={n}: {got} vs golden {want} GF/s")
            sys.exit(1)
        log("no perf regressions vs golden")

    sys.exit(0 if npass == len(scored) else 2)


if __name__ == "__main__":
    main()
