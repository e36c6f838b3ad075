"""Test-matrix generators and RNG contracts (reference rng/ + slatmc.c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cholesky_tpu.rng import generators
from cholesky_tpu.rng.generators import Interval
from tests.util import ALL_DTYPES


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_latmc_spd_and_condition(dtype):
    n, cond = 64, 37.5
    A = generators.latmc(jax.random.PRNGKey(0), n, cond, dtype)
    Anp = np.asarray(A)
    # exactly Hermitian
    np.testing.assert_array_equal(Anp, Anp.conj().T)
    w = np.linalg.eigvalsh(Anp.astype(
        np.complex128 if np.iscomplexobj(Anp) else np.float64))
    assert w.min() > 0
    got_cond = w.max() / w.min()
    assert abs(got_cond - cond) / cond < 1e-2


def test_latmc_deterministic():
    A = generators.latmc(jax.random.PRNGKey(5), 16, 10.0)
    B = generators.latmc(jax.random.PRNGKey(5), 16, 10.0)
    np.testing.assert_array_equal(np.asarray(A), np.asarray(B))
    C = generators.latmc(jax.random.PRNGKey(6), 16, 10.0)
    assert np.max(np.abs(np.asarray(A) - np.asarray(C))) > 0


@pytest.mark.parametrize("interval,lo_ok,hi_ok", [
    (Interval.CLOSED, lambda x: x >= 0, lambda x: x <= 1),
    (Interval.OPEN, lambda x: x > 0, lambda x: x < 1),
    (Interval.HALF_OPEN_01, lambda x: x >= 0, lambda x: x < 1),
    (Interval.HALF_OPEN_10, lambda x: x > 0, lambda x: x <= 1),
])
def test_uniform_intervals(interval, lo_ok, hi_ok):
    # the four interval variants of the reference's rng.h:21-101
    u = np.asarray(generators.uniform(
        jax.random.PRNGKey(1), (100_000,), jnp.float32, interval))
    assert lo_ok(u.min()) and hi_ok(u.max())


def test_random_triangular_shapes():
    A = generators.random_triangular(jax.random.PRNGKey(2), 20, "L", "N")
    assert np.array_equal(np.asarray(jnp.triu(A, 1)), np.zeros((20, 20)))
    B = generators.random_triangular(jax.random.PRNGKey(2), 20, "U", "U")
    assert np.allclose(np.diag(np.asarray(B)), 1.0)
