"""On-chip probe for the r5 trtri mono-kernel cap lift (VERDICT r4 Next #4).

The r4 kernel's full-width 2-slot ktile put n=8192 at ~16 MB of VMEM
(over budget), capping TRTRI_HBM_MAX_N at 4096; the r5 half-width
2-slot stream cuts ktile in half (panel 4 + bpanel 4 + ktile 4 ≈ 12 MB
at 8192 — the same budget the potrf kernel already runs).  This probe:

  1. numerics: trtri_hbm_f32 at 2048/4096/5120/8192 vs a host-f64
     residual ‖W·L − I‖ (CLAUDE.md rule 2: measure on host);
  2. perf: forced-completion rate at each size, plus the blocked
     recursion at 8192 for the crossover decision
     (tuning key trtri_f32.mega_max_n).

Writes bench_results/trtri_hbm_r5.json.  Standalone diagnostic.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_sweep_cache")

from cholesky_tpu.ops.pallas import mega
from cholesky_tpu.ops import blocked
from cholesky_tpu.rng import generators
from cholesky_tpu.utils.benchlib import bench_op


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    out = {"kernel": "trtri_hbm_f32 half-width 2-slot k-stream (r5)",
           "points": []}

    for n in (2048, 4096, 5120, 8192):
        t0 = time.time()
        F, _ = (mega.potrf_hbm_f32 if n > mega.MAX_N else mega.potrf_vmem_f32)(
            generators.latmc(key, n, 100.0, jnp.float32))
        try:
            W, info = mega.trtri_hbm_f32(F)
            W.block_until_ready()
        except Exception as e:
            print(f"  n={n}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            out["points"].append({"n": n, "error": str(e)[:200]})
            continue
        # host-f64 residual on a column subset (full host matmul at 8192
        # takes minutes at host-numpy rates; 512 columns pins correctness)
        cols = slice(0, 512)
        Wn = np.tril(np.asarray(W, np.float64))
        Ln = np.tril(np.asarray(F, np.float64))
        R = Wn @ Ln[:, cols]
        I = np.zeros_like(R)
        I[np.arange(512), np.arange(512)] = 1.0
        resid = float(np.max(np.abs(R - I)))
        t = bench_op(lambda x: mega.trtri_hbm_f32(x)[0], F,
                     chain=max(2, 16384 // n), reps=3)
        gf = (n ** 3 / 3) / t / 1e9
        row = {"n": n, "info": int(info), "resid_cols512": resid,
               "time_ms": round(t * 1e3, 3), "gflops": round(gf, 1),
               "wall_s": round(time.time() - t0, 1)}
        print(f"  mono n={n:5d}  {t*1e3:9.2f} ms  {gf:8.1f} GF/s  "
              f"resid={resid:.2e} info={int(info)}", flush=True)
        out["points"].append(row)

    # crossover leg: blocked recursion at 8192 (recursing to the 4096
    # mono at the diagonal) vs the 8192 mono above
    F, _ = mega.potrf_hbm_f32(
        generators.latmc(key, 8192, 100.0, jnp.float32))
    t = bench_op(lambda x: blocked.trtri("L", "N", x, backend="pallas",
                                         block_size=4096)[0], F,
                 chain=2, reps=3)
    gf = (8192 ** 3 / 3) / t / 1e9
    out["blocked_8192_nb4096_gflops"] = round(gf, 1)
    print(f"  blocked n=8192 nb=4096  {t*1e3:9.2f} ms  {gf:8.1f} GF/s",
          flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_results", "trtri_hbm_r5.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
