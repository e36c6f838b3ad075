"""Distributed triangular solve against the block-cyclic factor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cholesky_tpu.parallel import blockcyclic
from cholesky_tpu.parallel.potrf import potrf_dist
from cholesky_tpu.parallel.trsm import trsm_factor_dist as trsm_dist
from cholesky_tpu.rng import generators
from tests.util import assert_close, to_np128


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()), ("d",))


@pytest.mark.parametrize("n,nb,nrhs", [pytest.param(256, 16, 4, marks=pytest.mark.slow),
                                       (200, 16, 1)])
def test_solve_through_factor(mesh, n, nb, nrhs):
    A = generators.latmc(jax.random.PRNGKey(0), n, 40.0, jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, nrhs), jnp.float32)
    bc = blockcyclic.distribute(A, mesh, nb=nb)
    fbc, info = potrf_dist(bc)
    assert int(info) == 0
    z = trsm_dist(fbc, b, trans="N")
    x = trsm_dist(fbc, z, trans="T")
    # K x = b up to f32 backward error
    res = to_np128(A) @ to_np128(x) - to_np128(b)
    assert np.max(np.abs(res)) < 1e-3
    ref = np.linalg.solve(to_np128(A), to_np128(b))
    assert_close(np.asarray(x), ref, jnp.float32, 400 * n, "dist solve")


def test_vector_rhs(mesh):
    n = 256
    A = generators.latmc(jax.random.PRNGKey(2), n, 20.0, jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(3), (n,), jnp.float32)
    bc = blockcyclic.distribute(A, mesh, nb=32)
    fbc, _ = potrf_dist(bc)
    z = trsm_dist(fbc, b, trans="N")
    assert z.shape == (n,)
    L = np.linalg.cholesky(to_np128(A))
    ref = np.linalg.solve(L, to_np128(b))
    assert_close(np.asarray(z), ref, jnp.float32, 200 * n, "trsv fwd")
