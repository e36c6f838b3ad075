"""Distributed trtri / lauum / potri on the CPU mesh (reference
cumultigpustrtri / cumultigpuslauum / cumultigpuspotri test analogs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cholesky_tpu.parallel import blockcyclic
from cholesky_tpu.parallel.potrf import potrf_dist
from cholesky_tpu.parallel.trtri import (
    lauum_dist, potri_dist, potri_sharded, trtri_dist,
)
from cholesky_tpu.rng import generators, latmc
from tests.util import assert_close, to_np128


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()), ("d",))


@pytest.mark.parametrize("n,nb", [(256, 16), (200, 16)])
def test_trtri_dist(mesh, n, nb):
    L = generators.random_triangular(jax.random.PRNGKey(0), n, "L", "N",
                                     jnp.float32)
    bc = blockcyclic.distribute(L, mesh, nb=nb)
    out, info = trtri_dist(bc)
    assert int(info) == 0
    W = np.tril(np.asarray(blockcyclic.collect(out)))
    ref = np.linalg.inv(np.tril(to_np128(L)))
    assert_close(W, np.tril(ref), jnp.float32, 60 * n, "trtri_dist")


def test_trtri_dist_singular_info(mesh):
    L = np.asarray(generators.random_triangular(
        jax.random.PRNGKey(1), 128, "L", "N", jnp.float32)).copy()
    L[37, 37] = 0.0
    bc = blockcyclic.distribute(jnp.asarray(L), mesh, nb=16)
    _, info = trtri_dist(bc)
    assert int(info) == 38


@pytest.mark.parametrize("n,nb", [(256, 16), (200, 16)])
def test_lauum_dist(mesh, n, nb):
    L = generators.random_triangular(jax.random.PRNGKey(2), n, "L", "N",
                                     jnp.float32)
    bc = blockcyclic.distribute(L, mesh, nb=nb, pad_identity=False)
    out = lauum_dist(bc)
    got = np.tril(np.asarray(blockcyclic.collect(out)))
    Lnp = np.tril(to_np128(L))
    ref = np.tril(Lnp.T @ Lnp)
    assert_close(got, ref, jnp.float32, 2 * n + 3, "lauum_dist")


@pytest.mark.parametrize("n,nb", [(256, 32),
                                  pytest.param(160, 16, marks=pytest.mark.slow)])
def test_potri_dist_roundtrip(mesh, n, nb):
    A = latmc(jax.random.PRNGKey(3), n, 30.0, jnp.float32)
    bc = blockcyclic.distribute(A, mesh, nb=nb)
    fbc, info0 = potrf_dist(bc)
    assert int(info0) == 0
    out, info = potri_dist(fbc)
    assert int(info) == 0
    Inv = np.tril(np.asarray(blockcyclic.collect(out)))
    InvFull = Inv + np.tril(Inv, -1).T
    ident = to_np128(A) @ InvFull
    assert np.max(np.abs(ident - np.eye(n))) < 5e-3
    ref = np.linalg.inv(to_np128(A))
    assert_close(Inv, np.tril(ref), jnp.float32, 3000 * n, "potri_dist")


@pytest.mark.slow   # thin wrapper over potri_dist, covered above
def test_potri_sharded_convenience(mesh):
    from cholesky_tpu.ops import blocked
    A = latmc(jax.random.PRNGKey(4), 192, 20.0, jnp.float32)
    F, _ = blocked.potrf("L", A, backend="xla", block_size=32)
    Inv, info = potri_sharded("L", F, mesh, nb=16)
    assert int(info) == 0
    ref = np.linalg.inv(to_np128(A))
    assert_close(np.tril(np.asarray(Inv)), np.tril(ref), jnp.float32,
                 3000 * 192, "potri_sharded")
    # strict upper of the input factor preserved
    np.testing.assert_array_equal(np.triu(np.asarray(Inv), 1),
                                  np.triu(np.asarray(F), 1))
