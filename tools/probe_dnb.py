"""On-chip probe: dpotrf leaf block size (VERDICT r4 Next #2).

_OzakiTiles.default_nb = 128 was never swept on-chip.  The Ozaki potf2
leaf is mega-aware (the f32 factor is ONE whole-block kernel dispatch up
to the HBM cap, blocked.py _OzakiTiles.potf2), so large leaves are cheap:
leaf refinement overhead across the factorization is ~n·nb² flops at
f32/Ozaki rates (≈5% of n³/3 at nb=512, n=8192) while every doubling of
nb halves the depth of the sequential leaf→solve→update dispatch chain
that keeps dpotrf at ~25% of its own d-GEMM.

Usage: python tools/probe_dnb.py [n[,n...]] [nb[,nb...]] [--prehoist]
Defaults: n=8192, nb=256,512,1024.  --prehoist delattrs the five hoisted
methods first (tools/probe_dhoist.py semantics) so the probe measures the
configuration the A/B probe selected.  Emits one JSON line; appends to
bench_results/dnb_probe_r5.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_sweep_cache")
jax.config.update("jax_enable_x64", True)

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
PREHOIST = "--prehoist" in sys.argv[1:]
if "--cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

SIZES = [int(s) for s in (ARGS[0].split(",") if len(ARGS) > 0 else ["8192"])]
NBS = [int(s) for s in (ARGS[1].split(",") if len(ARGS) > 1
                        else ["256", "512", "1024"])]

HOIST_METHODS = ("syrk_ln", "trsm_rlt", "trsm_lln", "trsm_llt",
                 "trtri_lower")


def main():
    from cholesky_tpu.ops import blocked
    from cholesky_tpu.rng import generators
    from cholesky_tpu.utils.benchlib import bench_op
    sys.path.insert(0, str(Path(__file__).parent))
    from sweep import _chain_for

    if PREHOIST:
        for m in HOIST_METHODS:
            delattr(blocked._OzakiTiles, m)

    out = {"probe": "ozaki_leaf_nb", "prehoist": PREHOIST, "points": []}
    t0 = time.perf_counter()
    for n in SIZES:
        A = generators.latmc(jax.random.PRNGKey(7), n, 100.0, jnp.float64)
        A = jax.block_until_ready(A)
        for nb in NBS:
            f = jax.jit(lambda a, nb=nb: blocked.potrf(
                "L", a, backend="auto", block_size=nb))
            sec, (F, info) = bench_op(f, A, chain=_chain_for(n, "d"),
                                      reps=3, return_out=True)
            gf = (n ** 3 / 3.0) / sec / 1e9
            # cheap residual check on the factor (f64 host): ||A-LLt||/||A||
            L = np.asarray(F)
            An = np.asarray(A)
            resid = float(np.max(np.abs(np.tril(An) + np.tril(An, -1).T
                                        - np.tril(L) @ np.tril(L).T))
                          / np.max(np.abs(An)))
            row = {"n": n, "nb": nb, "gflops": round(gf, 1),
                   "info": int(info), "resid": f"{resid:.2e}"}
            out["points"].append(row)
            print(f"n={n} nb={nb}: {gf:.1f} GF/s resid={resid:.1e} "
                  f"info={int(info)} (t={time.perf_counter() - t0:.0f}s)",
                  file=sys.stderr, flush=True)

    print(json.dumps(out), flush=True)
    with open("bench_results/dnb_probe_r5.json", "a") as fh:
        fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
