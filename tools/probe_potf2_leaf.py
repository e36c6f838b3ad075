#!/usr/bin/env python
"""On-chip A/B probe: Ozaki potf2 refinement via Newton-inverse matmuls
(CHOLESKY_TPU_POTF2_INV=1) vs XLA triangular solves (the default).

Writes ONE JSON artifact; the decision to flip blocked._potf2_inverse_leaf
cites this file. Run on a live tunnel with nothing else using the chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")

from cholesky_tpu.ops import blocked
from cholesky_tpu.rng import latmc
from cholesky_tpu.utils.benchlib import bench_op


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _chain(n):
    return 64 if n <= 1024 else (32 if n <= 2048 else 16)


def bench(n, inv):
    os.environ["CHOLESKY_TPU_POTF2_INV"] = "1" if inv else "0"
    jax.clear_caches()
    A = latmc(jax.random.PRNGKey(0), n, 100.0, jnp.float64)
    t, L = bench_op(lambda a: blocked.potrf("L", a, backend="ozaki")[0],
                    A, chain=_chain(n), return_out=True)
    # host-side f64 residual: the A/B must not trade away accuracy
    An, Ln = np.asarray(A), np.tril(np.asarray(L))
    Af = np.tril(An) + np.tril(An, -1).T
    resid = float(np.max(np.abs(Ln @ Ln.T - Af)) / np.max(np.abs(Af)))
    return t * 1e3, (n ** 3 / 3.0) / t / 1e9, resid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results/potf2_leaf_probe.json")
    ap.add_argument("--sizes", default="1024,2048,4096")
    args = ap.parse_args()
    out = {"probe": "potf2_inverse_leaf_vs_solve",
           "backend": jax.default_backend(), "points": {}}
    for n in [int(s) for s in args.sizes.split(",")]:
        row = {}
        for inv in (False, True):
            ms, gf, resid = bench(n, inv)
            row["inv" if inv else "solve"] = {
                "ms": round(ms, 3), "gflops": round(gf, 1),
                "rel_resid": float(f"{resid:.3e}")}
            log(f"potrf n={n} inv={inv}: {ms:.3f} ms {gf:.1f} GF/s "
                f"resid {resid:.2e}")
        row["speedup"] = round(row["inv"]["gflops"]
                               / row["solve"]["gflops"], 3)
        out["points"][str(n)] = row
    os.environ.pop("CHOLESKY_TPU_POTF2_INV", None)
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
