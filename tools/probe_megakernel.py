"""On-chip probe for the round-2 mega-kernel work (VERDICT r1 Next #2).

Measures, with forced-completion timing:
  1. the existing potf2_f32 whole-block kernel at n = 128..1024
     (it already IS a single-kernel factorization for n % 128 == 0);
  2. the recursive blocked potrf at n = 1024..4096 for leaf_nb sweeps;
so the redesign targets the real bottleneck (in-kernel VPU sweep vs
trailing-update flops vs per-op dispatch).

Standalone diagnostic — not part of the library. Run on the real chip.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_autotune_cache")

from cholesky_tpu.ops.pallas import leaf
from cholesky_tpu.ops import blocked
from cholesky_tpu.rng import generators
from cholesky_tpu.utils.benchlib import bench_op


def flops_potrf(n):
    return n ** 3 / 3 + n ** 2 / 2 + n / 6


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)

    print("== potf2_f32 single-kernel (whole block in VMEM) ==", flush=True)
    for n in (128, 256, 512, 1024):
        A = generators.latmc(key, n, 10.0, jnp.float32)
        t = bench_op(lambda x: leaf.potf2_f32(x)[0], A, chain=8, reps=3)
        gf = flops_potrf(n) / t / 1e9
        print(f"  n={n:5d}  {t*1e6:9.1f} us  {gf:8.1f} GF/s", flush=True)

    print("== trti2_f32 single-kernel ==", flush=True)
    for n in (128, 256, 512, 1024):
        A = generators.random_triangular(key, n, "L", "N", jnp.float32)
        t = bench_op(lambda x: leaf.trti2_f32(x)[0], A, chain=8, reps=3)
        gf = (n ** 3 / 3) / t / 1e9
        print(f"  n={n:5d}  {t*1e6:9.1f} us  {gf:8.1f} GF/s", flush=True)

    print("== blocked potrf, leaf_nb sweep ==", flush=True)
    for n in (1024, 2048, 4096):
        A = generators.latmc(key, n, 10.0, jnp.float32)
        for nb in (128, 256, 512, 1024):
            if nb > n:
                continue
            try:
                t = bench_op(
                    lambda x: blocked.potrf("L", x, backend="pallas",
                                            block_size=nb)[0],
                    A, chain=4, reps=3)
                gf = flops_potrf(n) / t / 1e9
                print(f"  n={n:5d} nb={nb:5d}  "
                      f"{t*1e3:9.2f} ms  {gf:8.1f} GF/s", flush=True)
            except Exception as e:
                print(f"  n={n:5d} nb={nb:5d}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
