"""On-chip A/B probe: is the r5 hoisted Ozaki peel (commit 7b0c59e) a win
or a loss for dpotrf at 6144/8192?

Context: the r5 re-record measured dpotrf@6144 = 2372 GF/s on the hoisted
code vs the archived pre-hoist golden row 2915 GF/s (@8192: 2802) — a ~19%
regression at mid sizes, while the hoist's own @10240 row (3926) looked
like a win.  Confounder: the old rows were recorded on a different VM
attachment/day.  This probe times BOTH configurations back-to-back on the
same chip, same matrices, same harness (benchlib.bench_op, sweep chain
lengths), so the comparison is same-day clean:

  config A  — as committed (hoisted trsm_rlt/lln/llt, trtri_lower,
              single-peel syrk_ln on _OzakiTiles)
  config B  — the hoist gate forced off (blocked._OZAKI_HOIST_OVERRIDE),
              restoring the exact pre-hoist dispatch (generic recursions +
              inherited _XlaTiles.syrk_ln over _OzakiTiles.mm)

Dispatch resolves at trace time via the t.hoist gate, so a fresh jit per
config compiles genuinely different programs.  Emits one JSON line.
Shares /tmp/jax_sweep_cache with tools/sweep.py so config-A executables
are reused by (or warm) the golden re-record sweeps.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_sweep_cache")
jax.config.update("jax_enable_x64", True)

ARGS = [a for a in sys.argv[1:] if a != "--cpu"]
if "--cpu" in sys.argv[1:]:
    # sanity mode: the axon sitecustomize overrides JAX_PLATFORMS=cpu, so
    # pin the platform the way tests/conftest.py does (CLAUDE.md rule 5)
    jax.config.update("jax_platforms", "cpu")

SIZES = [int(s) for s in (ARGS[0].split(",") if ARGS else ["6144", "8192"])]

def main():
    from cholesky_tpu.ops import blocked
    from cholesky_tpu.rng import generators
    from cholesky_tpu.utils.benchlib import bench_op
    sys.path.insert(0, str(Path(__file__).parent))
    from sweep import _chain_for  # same chain policy as the goldens

    out = {"probe": "ozaki_hoist_ab", "points": []}
    t0 = time.perf_counter()
    for n in SIZES:
        A = generators.latmc(jax.random.PRNGKey(7), n, 100.0, jnp.float64)
        A = jax.block_until_ready(A)
        row = {"n": n}
        for label, hoisted in (("hoisted", True), ("prehoist", False)):
            # force the config through the production gate (the tuned
            # ozaki_f64.hoist_min_n threshold would otherwise pick)
            blocked._OZAKI_HOIST_OVERRIDE = hoisted
            try:
                f = jax.jit(lambda a: blocked.potrf("L", a, backend="auto"))
                sec, (F, info) = bench_op(f, A, chain=_chain_for(n, "d"),
                                          reps=3, return_out=True)
                gf = (n ** 3 / 3.0) / sec / 1e9
                row[label] = round(gf, 1)
                row[f"{label}_info"] = int(info)
                print(f"n={n} {label}: {gf:.1f} GF/s "
                      f"(t={time.perf_counter() - t0:.0f}s)",
                      file=sys.stderr, flush=True)
            finally:
                blocked._OZAKI_HOIST_OVERRIDE = None
        row["hoist_speedup"] = round(row["hoisted"] / row["prehoist"], 3)
        out["points"].append(row)

    print(json.dumps(out), flush=True)
    Path("bench_results/dhoist_ab_r5.json").write_text(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
