"""On-chip bisection of the c trsm accuracy cliff at n >= 1536.

Recorded facts (golden sweeps, deterministic across runs):
  c trsm llnn @1024  scaled residual 3.2e-8   PASS
  c trsm llnn @1536  scaled residual 6.48e-2  FAIL (tol 2.2e-2)
  c trsm llnn @2048  scaled residual 2.93e-2  razor-thin pass
CPU interpret-mode with the identical tuning table (CHOLESKY_TPU_DEVICE_KIND
="TPU v5 lite") passes at 4e-8, so the cliff is compiled-Mosaic-path
behavior.  This probe isolates which layer breaks on the real chip:

  stage A  public complex trsm @1536            (reproduce)
  stage B  inner real f32 trsm @3072 on the embedded operands
  stage C  same with a 1-column rhs             (column-count dependence)
  stage D  plain random lower-tri real trsm @3072, 2-col rhs
           (embedded-matrix-structure dependence)
  stage E  per-leaf trti2 + recursion mms on the failing matrix
           (only if B fails)

Each stage prints one line; run under `timeout` and never concurrently
with another chip client (CLAUDE.md rule 7).
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

from sweep import DT  # noqa: E402  (tools/ on path)
from cholesky_tpu.ops import blocked  # noqa: E402
from cholesky_tpu.ops import complex_embed as ce  # noqa: E402


def scaled_res(T, X, B):
    r = np.max(np.abs(T @ X - B))
    return float(r / max(np.max(np.abs(X)) * np.max(np.abs(T)), 1e-30))


def stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"{name}: {out}  ({time.time() - t0:.0f}s)", flush=True)
        return out
    except Exception as e:  # keep probing the other stages
        print(f"{name}: EXC {type(e).__name__}: {e}", flush=True)
        return None


def main(n=1536):
    dt = DT("c")
    A = dt.chol_factor(n, "L")
    B = dt.rand(n, 1)
    An, Bn = dt.to_np(A), dt.to_np(B)

    # --- A: public complex trsm ------------------------------------------
    def st_a():
        X = jax.jit(lambda a, b: blocked.trsm(
            "L", "L", "N", "N", 1.0, a, b, backend="auto"))(A, B)
        return f"res={scaled_res(np.tril(An), dt.to_np(X), Bn):.3e}"
    stage(f"A public c trsm @{n}", st_a)

    # --- embedded operands, computed on chip exactly as trsm_split does ---
    ar, ai = ce._split(A)
    br, bi = ce._split(B)

    @jax.jit
    def make_embedded(ar, ai, br, bi):
        rep, imp, ur, ui = ce._real_diag_form(ar, ai)
        br2 = br * ur[:, None] - bi * ui[:, None]
        bi2 = br * ui[:, None] + bi * ur[:, None]
        return ce.embed(rep, imp), ce.embed(br2, bi2)

    MA, MB = make_embedded(ar, ai, br, bi)
    MAn = np.asarray(MA, np.float64)
    MBn = np.asarray(MB, np.float64)
    Tn = np.tril(MAn)

    def run_real(Mdev, Bdev):
        X = jax.jit(lambda a, b: blocked.trsm(
            "L", "L", "N", "N", 1.0, a, b, backend="auto"))(Mdev, Bdev)
        return np.asarray(X, np.float64)

    def st_b():
        X = run_real(MA, MB)
        return f"res={scaled_res(Tn, X, MBn):.3e}"
    rb = stage(f"B inner real trsm @{2 * n} 2col", st_b)

    def st_c():
        X = run_real(MA, MB[:, :1])
        return f"res={scaled_res(Tn, X, MBn[:, :1]):.3e}"
    stage(f"C inner real trsm @{2 * n} 1col", st_c)

    def st_d():
        key = jax.random.PRNGKey(7)
        G = jax.random.uniform(key, (2 * n, 2 * n), jnp.float32) - 0.5
        Ld = jnp.tril(G) + 2.0 * n * jnp.eye(2 * n, dtype=jnp.float32) / 64
        Bd = jax.random.uniform(jax.random.PRNGKey(8), (2 * n, 2),
                                jnp.float32) - 0.5
        X = run_real(Ld, Bd)
        Ln = np.asarray(Ld, np.float64)
        return f"res={scaled_res(Ln, X, np.asarray(Bd, np.float64)):.3e}"
    stage(f"D random real trsm @{2 * n} 2col", st_d)

    if rb is None or "res=" not in str(rb) or float(
            str(rb).split("res=")[1].split()[0]) < 1e-5:
        print("stage B clean; cliff is NOT in the inner real trsm",
              flush=True)
        return

    # --- E: walk the recursion by hand on the failing matrix --------------
    nb = 512
    N = 2 * n
    from cholesky_tpu.ops.blocked import _PallasTiles
    t = _PallasTiles()

    trti2_j = jax.jit(lambda L: t.trti2(L)[0])
    worst = 0.0
    for off in range(0, N, nb):
        Lblk = jnp.asarray(Tn[off:off + nb, off:off + nb], jnp.float32)
        W = np.asarray(trti2_j(Lblk), np.float64)
        err = np.max(np.abs(W @ Tn[off:off + nb, off:off + nb] - np.eye(nb)))
        worst = max(worst, err)
        if err > 1e-4:
            print(f"E leaf@{off}: |W·L−I|={err:.3e}", flush=True)
    print(f"E worst leaf inverse residual: {worst:.3e}", flush=True)

    # recursion mms: C = B2 − M·X1 at the top split
    n1 = N // 2
    X1n = np.linalg.solve(Tn[:n1, :n1], MBn[:n1])
    mm_j = jax.jit(lambda M, X, C: t.mm(M, X, alpha=-1.0, beta=1.0, C=C))
    got = np.asarray(mm_j(jnp.asarray(Tn[n1:, :n1], jnp.float32),
                          jnp.asarray(X1n, jnp.float32),
                          jnp.asarray(MBn[n1:], jnp.float32)), np.float64)
    want = MBn[n1:] - Tn[n1:, :n1] @ X1n
    scale = max(np.max(np.abs(want)), 1.0)
    print(f"E top-split mm residual: {np.max(np.abs(got - want)) / scale:.3e}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1536)
