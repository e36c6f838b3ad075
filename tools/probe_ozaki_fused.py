#!/usr/bin/env python
"""On-chip A/B probe: fused Ozaki group-sum kernel vs the XLA per-group
formulation (ops/pallas/ozaki_mm.py vs ops/ozaki.matmul_presplit's loop).

Measures (a) the raw presplit matmul at driver block sizes, (b) end-to-end
d-precision trmm/potrf through the public drivers with the fused routing
flipped via CHOLESKY_TPU_OZAKI_FUSED (jit caches cleared between variants —
the flag is read at trace time).  Writes ONE JSON artifact; the decision to
flip ozaki.use_fused()'s default cites this file.

Run on a live tunnel with nothing else using the chip (CLAUDE.md rule 7).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")

from cholesky_tpu.ops import blocked
from cholesky_tpu.ops.ozaki import matmul_presplit, split_rows
from cholesky_tpu.rng import latmc
from cholesky_tpu.utils.benchlib import bench_op


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _chain(n):
    """d-tier chain lengths (tools/sweep._chain_for): long enough to
    amortize the ~30 ms tunnel roundtrip below the op's own runtime —
    chain=8 measured a flat 3.4 ms floor at every size up to 2048."""
    if n <= 512:
        return 128
    if n <= 1024:
        return 64
    if n <= 2048:
        return 32
    return 16


def bench_presplit(n, k, fused):
    r = np.random.RandomState(0)
    A = jnp.asarray(r.randn(n, k))
    B = jnp.asarray(r.randn(n, k))  # acts as B.T slices
    As, asc = split_rows(A, 6)
    Bs, bsc = split_rows(B, 6)
    jax.block_until_ready((As, Bs))

    # bench_op perturbs its first argument; ascale only enters at the
    # final scaling, so the dots would be loop-invariant and hoisted
    # (measured: 21 "dots" at 439 TOPS). Taint the int8 slices with a
    # data-dependent zero so every product stays on the chain.
    def op(sc):
        d = (sc[0] * 0.0).astype(jnp.int8)
        return matmul_presplit(As + d, sc, Bs, bsc, fused=fused)

    t = bench_op(op, asc, chain=_chain(max(n, k)))
    gf = 2.0 * n * n * k / t / 1e9
    return t * 1e3, gf


def bench_driver(op, n, fused):
    os.environ["CHOLESKY_TPU_OZAKI_FUSED"] = "1" if fused else "0"
    jax.clear_caches()
    r = np.random.RandomState(1)
    if op == "trmm":
        A = jnp.asarray(r.randn(n, n))
        B = jnp.asarray(r.randn(n, n))
        t = bench_op(lambda a: blocked.trmm("L", "L", "N", "N", 1.0, a, B,
                                            backend="ozaki"), A,
                     chain=_chain(n))
        flops = float(n) ** 3
    elif op == "potrf":
        A = latmc(jax.random.PRNGKey(0), n, 100.0, jnp.float64)
        t = bench_op(lambda a: blocked.potrf("L", a, backend="ozaki")[0],
                     A, chain=_chain(n))
        flops = float(n) ** 3 / 3.0
    else:
        raise SystemExit(f"unknown op {op}")
    return t * 1e3, flops / t / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results/ozaki_fused_probe.json")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    out = {"probe": "ozaki_fused_vs_xla", "backend": jax.default_backend(),
           "presplit": {}, "driver": {}}

    shapes = [(512, 512), (1024, 1024), (2048, 2048)]
    if not args.quick:
        shapes += [(4096, 4096), (512, 2048)]
    for n, k in shapes:
        row = {}
        for fused in (False, True):
            ms, gf = bench_presplit(n, k, fused)
            row["fused" if fused else "xla"] = {
                "ms": round(ms, 3), "gflops": round(gf, 1)}
            log(f"presplit n={n} k={k} fused={fused}: {ms:.3f} ms "
                f"{gf:.1f} GF/s")
        row["speedup"] = round(row["fused"]["gflops"]
                               / row["xla"]["gflops"], 3)
        out["presplit"][f"{n}x{k}"] = row

    for op, n in ([("trmm", 1536), ("potrf", 2048)] if args.quick else
                  [("trmm", 1280), ("trmm", 1536), ("trmm", 2048),
                   ("potrf", 2048), ("potrf", 4096)]):
        row = {}
        for fused in (False, True):
            ms, gf = bench_driver(op, n, fused)
            row["fused" if fused else "xla"] = {
                "ms": round(ms, 3), "gflops": round(gf, 1)}
            log(f"driver {op} n={n} fused={fused}: {ms:.3f} ms "
                f"{gf:.1f} GF/s")
        row["speedup"] = round(row["fused"]["gflops"]
                               / row["xla"]["gflops"], 3)
        out["driver"][f"{op}@{n}"] = row

    os.environ.pop("CHOLESKY_TPU_OZAKI_FUSED", None)
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
