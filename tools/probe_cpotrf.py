"""On-chip bisection of the c potrf @4096 remote-compile crash.

Recorded: sweep point potrf[c/l] n=4096 failed with
``HTTP 500: tpu_compile_helper subprocess exit code 1`` (a Mosaic/XLA
compiler crash, not an OOM or a clean error), while c@3072 and the plain
real s potrf@8192 both pass.  The embedded inner problem at c@4096 is a
real f32 potrf at n=8192, so the crash must come from the embedding
wrapper ops around it or from a shape only this composition produces.

Stages (cheap first — compile-only where possible):
  A  inner real f32 potrf @8192 on the EMBEDDED matrix       (compile+run)
  B  public complex potrf @4096                              (the crasher)

Run under `timeout`, never concurrently with another chip client.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from sweep import DT  # noqa: E402
from cholesky_tpu.ops import blocked  # noqa: E402
from cholesky_tpu.ops import complex_embed as ce  # noqa: E402


def stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"{name}: {out}  ({time.time() - t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: EXC {type(e).__name__}: {str(e)[:300]}", flush=True)


def main(n=4096):
    dt = DT("c")
    A = dt.hpd(n)
    ar, ai = ce._split(A)

    @jax.jit
    def embedded(ar, ai):
        return ce.embed(ar, ai)

    MA = embedded(ar, ai)

    def st_a():
        L, info = jax.jit(lambda m: blocked.potrf(
            "L", m, backend="auto"))(MA)
        d = np.asarray(jnp.diagonal(L)[:8])
        return f"info={int(info)} diag0={d[0]:.4f}"
    stage(f"A inner real potrf @{2 * n}", st_a)

    def st_b():
        L, info = jax.jit(lambda a: blocked.potrf(
            "L", a, backend="auto"))(A)
        r = np.asarray(L.real[:4, :4])
        return f"info={int(info)} L00={r[0, 0]:.4f}"
    stage(f"B public c potrf @{n}", st_b)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
