"""Round-3 on-chip probes (run on the real TPU, after the golden sweeps).

1. Distributed potrf lookahead (VERDICT r2 Next #5): step-time of the
   1-device shard_map run at n=8192 with and without the pipelined
   diagonal carry.
2. check_vma=True validation on a real-TPU mesh (VERDICT r2 Next #6):
   the compiled-kernel path the CPU tests cannot exercise.

Prints one JSON line per probe; exits nonzero on any failure.
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from cholesky_tpu import config
from cholesky_tpu.utils import benchlib
from cholesky_tpu.rng import generators


def spd(n, seed=0):
    return generators.latmc(jax.random.PRNGKey(seed), n, 100.0, jnp.float32)



def probe_lookahead(n=8192, nb=256):
    from jax.sharding import Mesh
    from cholesky_tpu.parallel import blockcyclic, potrf as dpotrf
    mesh = Mesh(np.array(jax.devices()[:1]), ("d",))
    A = spd(n, seed=1)
    out = {}
    for la in (False, True):
        def run(a, la=la):
            bc = blockcyclic.distribute(a, mesh, nb=nb)
            fbc, info = dpotrf.potrf_dist(bc, lookahead=la)
            return fbc.local, info
        t = benchlib.bench_op(jax.jit(run), A)
        gf = (n ** 3 / 3.0) / t / 1e9
        out["lookahead" if la else "serial"] = round(gf, 1)
    print(json.dumps({"probe": "dist_lookahead", "n": n, "nb": nb, **out,
                      "speedup": round(out["lookahead"] / out["serial"], 3)}),
          flush=True)
    return out


def probe_check_vma_on_chip(n=1024, nb=256):
    """Real-TPU mesh: compiled Pallas kernels inside shard_map bodies with
    the vma checker ON (utils/vma.checker_on() is True off-interpret)."""
    from jax.sharding import Mesh
    from cholesky_tpu.parallel import blockcyclic, potrf as dpotrf
    from cholesky_tpu.parallel import blas as dblas
    from cholesky_tpu.utils import vma
    assert vma.checker_on(), "expected checker ON for compiled kernels"
    mesh = Mesh(np.array(jax.devices()[:1]), ("d",))
    A = spd(n, seed=2)
    F, info = dpotrf.potrf_sharded("L", A, mesh, nb=nb)
    assert int(info) == 0, int(info)
    host = np.asarray(F, np.float64)
    ref = np.linalg.cholesky(np.asarray(A, np.float64))
    err = float(np.max(np.abs(np.tril(host) - ref)))
    assert err < 1e-3, err
    B = jnp.ones((n, 256), jnp.float32)
    X = dblas.trsm_dist("L", "L", "N", "N", 1.0, jnp.tril(F), B, mesh)
    assert np.isfinite(np.asarray(X)).all()
    C = dblas.trmm_dist("L", "L", "N", "N", 1.0, jnp.tril(F), X, mesh)
    res = float(np.max(np.abs(np.asarray(C, np.float64) - np.asarray(B, np.float64))))
    print(json.dumps({"probe": "check_vma_on_chip", "n": n,
                      "potrf_err": err, "trmm_trsm_roundtrip": res,
                      "ok": bool(res < 1e-2)}), flush=True)
    assert res < 1e-2, res


if __name__ == "__main__":
    which = sys.argv[1:] or ["vma", "lookahead"]
    if "vma" in which:
        probe_check_vma_on_chip()
    if "lookahead" in which:
        probe_lookahead()
    print("probe_r3 done", file=sys.stderr)
