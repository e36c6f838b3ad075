#!/usr/bin/env python
"""Kernel block-shape autotuner — run on the target chip.

Rebuild of the reference's build-time autotuner (reference blas/config.c:
occupancy probing cuFuncMaxBlocksPerMP:328, bandwidth-reduction
factorization getMaxReduction:356, kb hill-climb cuSgemmBenchmark:389):
sweeps Pallas block shapes on the actual device and writes the winning
configuration to cholesky_tpu/tuning/tables/<device_kind>.json, which the
kernels consume at trace time (tuning/table.py).

Timing uses chained invocations inside one jit so the per-dispatch tunnel
overhead (~ms on remote-attached chips) cancels out.

Usage: python tools/autotune.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

# shared with the sweep/golden/bench cache so crossover probes reuse the
# warm compilations any prior on-chip session already paid for
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_sweep_cache")

from cholesky_tpu.ops.pallas import gemm as pgemm
from cholesky_tpu.ops.pallas import syrk as psyrk
from cholesky_tpu.ops import blocked
from cholesky_tpu.tuning.table import table_path


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from cholesky_tpu.utils.benchlib import bench_op


def _bench_chain(make_call, x0, iters=3, chain=6):
    """Median per-call time with forced completion (utils/benchlib.py)."""
    return bench_op(make_call, x0, chain=chain, reps=iters)


def tune_matmul(n=4096, quick=False):
    A = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    grid = [(bm, bn, bk)
            for bm in (128, 256, 512)
            for bn in (128, 256, 512)
            for bk in (256, 512, 1024)]
    if quick:
        grid = [(256, 256, 512), (512, 512, 512)]
    best, best_t = None, float("inf")
    for bm, bn, bk in grid:
        try:
            t = _bench_chain(
                lambda x, bm=bm, bn=bn, bk=bk: pgemm.matmul_f32(
                    x, x, alpha=1.0, beta=0.0, bm=bm, bn=bn, bk=bk), A)
        except Exception as e:
            log(f"  matmul {bm}x{bn}x{bk}: FAILED {str(e)[:80]}")
            continue
        tf = 2 * n ** 3 / t / 1e12
        log(f"  matmul {bm}x{bn}x{bk}: {tf:.1f} TF/s")
        if t < best_t:
            best, best_t = {"bm": bm, "bn": bn, "bk": bk}, t
    log(f"matmul best: {best} ({2 * n ** 3 / best_t / 1e12:.1f} TF/s)")
    return best, 2 * n ** 3 / best_t / 1e12


def tune_syrk(n=4096, quick=False):
    A = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
    grid = [(bn, bk) for bn in (128, 256, 512) for bk in (256, 512, 1024)]
    if quick:
        grid = [(256, 512), (512, 512)]
    best, best_t = None, float("inf")
    for bn, bk in grid:
        try:
            t = _bench_chain(
                lambda x, bn=bn, bk=bk: psyrk.syrk_f32(
                    x, x, alpha=-1.0, beta=1.0, bn=bn, bk=bk), A)
        except Exception as e:
            log(f"  syrk {bn}x{bk}: FAILED {str(e)[:80]}")
            continue
        tf = n ** 3 / t / 1e12   # useful flops (triangle)
        log(f"  syrk {bn}x{bk}: {tf:.1f} TF/s useful")
        if t < best_t:
            best, best_t = {"bn": bn, "bk": bk}, t
    log(f"syrk best: {best} ({n ** 3 / best_t / 1e12:.1f} TF/s useful)")
    return best, n ** 3 / best_t / 1e12


def tune_trmm(n=4096, quick=False):
    from cholesky_tpu.ops.pallas import trmm as ptrmm
    L = jnp.tril(jax.random.normal(jax.random.PRNGKey(3), (n, n),
                                   jnp.float32))
    B = jax.random.normal(jax.random.PRNGKey(4), (n, n), jnp.float32)
    grid = [(bn, bm) for bn in (128, 256, 512) for bm in (256, 512, 1024)]
    if quick:
        grid = [(256, 512), (512, 512)]
    best, best_t = None, float("inf")
    for bn, bm in grid:
        try:
            t = _bench_chain(
                lambda b, bn=bn, bm=bm: ptrmm.trmm_lln_f32(
                    L, b, bn=bn, bm=bm), B, chain=16)
        except Exception as e:
            log(f"  trmm {bn}x{bm}: FAILED {str(e)[:80]}")
            continue
        tf = n ** 3 / t / 1e12   # useful flops (triangle)
        log(f"  trmm {bn}x{bm}: {tf:.1f} TF/s useful")
        if t < best_t:
            best, best_t = {"bn": bn, "bm": bm}, t
    log(f"trmm best: {best} ({n ** 3 / best_t / 1e12:.1f} TF/s useful)")
    return best, n ** 3 / best_t / 1e12


def tune_potrf_leaf(n=4096, quick=False):
    from cholesky_tpu.rng import latmc
    A = latmc(jax.random.PRNGKey(2), n, 50.0, jnp.float32)
    best, best_t = None, float("inf")
    # mega-kernel leaves make 256-1024 viable; 4096 recursion measures the
    # leaf/tile balance directly
    for leaf in ((256, 512) if quick else (128, 256, 512, 1024)):
        t = bench_op(lambda x, leaf=leaf: blocked.potrf(
            "L", x, backend="pallas", block_size=leaf)[0], A, chain=32)
        gf = (n ** 3 / 3) / t / 1e9
        log(f"  potrf leaf={leaf}: {gf:.0f} GF/s")
        if t < best_t:
            best, best_t = {"leaf_nb": leaf}, t
    log(f"potrf best: {best}")
    return best, (n ** 3 / 3) / best_t / 1e9


def tune_mega_crossover(leaf_nb, quick=False, op="potrf"):
    """Largest n the single-dispatch HBM mega kernel should own (the
    mega_max_n tuning key, VERDICT r3 Next #6): time the mono-kernel
    against the blocked recursion (block_size forces the recursion path)
    and stop at the first size the recursion wins."""
    from cholesky_tpu.rng import latmc
    from cholesky_tpu.ops.pallas import mega as pmega
    if op == "potrf":
        hard = pmega.POTRF_HBM_MAX_N
        mono = lambda x: pmega.potrf_hbm_f32(x)[0]
        rec = lambda x: blocked.potrf("L", x, backend="pallas",
                                      block_size=leaf_nb)[0]
        sizes = (2048, 4096, 8192) if quick else (2048, 3072, 4096, 6144,
                                                  8192)
        flops = lambda n: n ** 3 / 3
    elif op == "lauum":
        hard = pmega.LAUUM_HBM_MAX_N
        mono = lambda x: pmega.lauum_hbm_f32(x)
        rec = lambda x: blocked.lauum("L", x, backend="pallas",
                                      block_size=leaf_nb)
        sizes = (2048, 4096, 8192) if quick else (2048, 3072, 4096, 8192)
        flops = lambda n: n ** 3 / 3
    else:
        hard = pmega.TRTRI_HBM_MAX_N   # r5: half-width k-stream lifts 4096->8192
        mono = lambda x: pmega.trtri_hbm_f32(x)[0]
        rec = lambda x: blocked.trtri("L", "N", x, backend="pallas",
                                      block_size=leaf_nb)[0]
        sizes = (2048, 4096, 8192) if quick else (2048, 3072, 4096, 6144,
                                                  8192)
        flops = lambda n: n ** 3 / 3
    cap = pmega.MAX_N        # the VMEM tier is mono-kernel by construction
    for n in sizes:
        if n > hard or n % pmega.NB:
            break
        A = latmc(jax.random.PRNGKey(5), n, 50.0, jnp.float32)
        if op in ("trtri", "lauum"):
            A = jnp.tril(blocked.potrf("L", A, backend="pallas")[0])
        try:
            t_mono = bench_op(mono, A, chain=16)
        except Exception as e:
            log(f"  mega {op} n={n}: mono FAILED {str(e)[:80]}")
            break
        t_rec = bench_op(rec, A, chain=16)
        gf = flops(n) / 1e9
        log(f"  mega {op} n={n}: mono {gf / t_mono:.0f} vs recursion "
            f"{gf / t_rec:.0f} GF/s")
        if t_mono <= t_rec:
            cap = n
        else:
            break
    log(f"mega {op} crossover: mega_max_n={cap}")
    return cap


def tune_ozaki_hoist(sizes=(4096, 6144, 8192, 10240)):
    """ozaki_f64.hoist_min_n: smallest driver n that uses the hoisted-peel
    d recursions (ops/blocked.py _ozaki_hoist; same A/B as
    tools/probe_dhoist.py, folded into the autotune table the way the
    reference re-runs config.c per build).  EXPENSIVE — two cold f64
    compiles per size — so it only runs under --ozaki."""
    from cholesky_tpu.rng import latmc
    jax.config.update("jax_enable_x64", True)
    best = None
    prev = None
    for n in sizes:
        A = latmc(jax.random.PRNGKey(7), n, 100.0, jnp.float64)
        rates = {}
        for hoisted in (True, False):
            blocked._OZAKI_HOIST_OVERRIDE = hoisted
            try:
                t = bench_op(lambda x: blocked.potrf("L", x,
                                                     backend="auto")[0],
                             A, chain=4)
            finally:
                blocked._OZAKI_HOIST_OVERRIDE = None
            rates[hoisted] = (n ** 3 / 3) / t / 1e9
        log(f"  ozaki hoist n={n}: hoisted {rates[True]:.0f} vs "
            f"per-call {rates[False]:.0f} GF/s")
        if rates[True] > rates[False] and best is None:
            # threshold = midpoint of the bracketing sizes, 128-aligned
            lo = prev if prev is not None else n // 2
            best = ((lo + n) // 2 + 127) // 128 * 128
        prev = n
    if best is None:
        best = 1 << 30      # hoisted never won: effectively off
    log(f"ozaki hoist_min_n = {best}")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--ozaki", action="store_true",
                    help="also re-measure ozaki_f64.hoist_min_n "
                         "(two cold f64 compiles per probe size)")
    args = ap.parse_args()

    kind = jax.devices()[0].device_kind
    log(f"tuning on: {kind}")
    table = {}
    mm, mm_tf = tune_matmul(quick=args.quick)
    table["matmul_f32"] = mm
    sy, sy_tf = tune_syrk(quick=args.quick)
    table["syrk_f32"] = sy
    tm, tm_tf = tune_trmm(quick=args.quick)
    table["trmm_f32"] = tm
    pf, pf_gf = tune_potrf_leaf(quick=args.quick)
    pf["mega_max_n"] = tune_mega_crossover(pf["leaf_nb"], quick=args.quick)
    table["potrf_f32"] = pf
    table["trtri_f32"] = {"mega_max_n": tune_mega_crossover(
        pf["leaf_nb"], quick=args.quick, op="trtri")}
    table["lauum_f32"] = {"mega_max_n": tune_mega_crossover(
        pf["leaf_nb"], quick=args.quick, op="lauum")}
    if args.ozaki:
        table["ozaki_f64"] = {"hoist_min_n": tune_ozaki_hoist()}
    table["_meta"] = {"device_kind": kind,
                      "matmul_tflops": round(mm_tf, 2),
                      "syrk_useful_tflops": round(sy_tf, 2),
                      "trmm_useful_tflops": round(tm_tf, 2),
                      "potrf_gflops": round(pf_gf, 1)}

    path = table_path(kind)
    path.parent.mkdir(parents=True, exist_ok=True)
    # merge into any existing table: keep keys (incl. _meta extras like
    # recorded headline numbers) this run did not re-measure
    merged = {}
    if path.exists():
        with open(path) as f:
            merged = json.load(f)
    for k, v in table.items():
        if isinstance(v, dict):
            merged.setdefault(k, {}).update(v)
        else:
            merged[k] = v
    with open(path, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
    log(f"wrote {path}")
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
