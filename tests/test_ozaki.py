"""Ozaki int8-slice f64 matmul + d-precision drivers over it.

The f64-emulation subsystem (SURVEY.md §7 hard part #2): the successor of
the reference's hi/lo-int shared-memory double storage (dgemm.cu:3-10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cholesky_tpu.ops import blocked
from cholesky_tpu.ops.ozaki import matmul_f64, K_EXACT_MAX
from cholesky_tpu.rng import latmc, generators


def rnd(seed, shape, spread=False):
    r = np.random.RandomState(seed)
    x = r.randn(*shape)
    if spread:
        x = x * np.exp(2.0 * r.randn(*shape))   # wide dynamic range
    return jnp.asarray(x)


@pytest.mark.parametrize("k", [64, 300, 1024])
@pytest.mark.parametrize("spread", [False, True])
def test_matmul_f64_accuracy(k, spread):
    A = rnd(0, (160, k), spread)
    B = rnd(1, (k, 120), spread)
    ref = np.asarray(A) @ np.asarray(B)
    for S, bound in [(4, 3e-6), (6, 1e-9)]:
        C = matmul_f64(A, B, slices=S)
        rel = np.max(np.abs(np.asarray(C) - ref)) / np.max(np.abs(ref))
        assert rel < bound, (S, rel)


def test_matmul_f64_exact_small_ints():
    # integer-valued inputs within slice range reproduce exactly
    A = jnp.asarray(np.random.RandomState(2).randint(-50, 50, (64, 64)),
                    jnp.float64)
    B = jnp.asarray(np.random.RandomState(3).randint(-50, 50, (64, 64)),
                    jnp.float64)
    C = matmul_f64(A, B, slices=4)
    np.testing.assert_array_equal(np.asarray(C),
                                  np.asarray(A) @ np.asarray(B))


def test_k_guard():
    with pytest.raises(AssertionError):
        matmul_f64(jnp.zeros((8, K_EXACT_MAX + 128), jnp.float64),
                   jnp.zeros((K_EXACT_MAX + 128, 8), jnp.float64))


@pytest.mark.parametrize("uplo", ["L", "U"])
def test_dpotrf_ozaki(uplo):
    A = latmc(jax.random.PRNGKey(0), 200, 100.0, jnp.float64)
    F, info = blocked.potrf(uplo, A, backend="ozaki", block_size=64)
    assert int(info) == 0
    L = np.linalg.cholesky(np.asarray(A))
    ref = L if uplo == "L" else L.T
    tri = np.tril if uplo == "L" else np.triu
    err = np.max(np.abs(tri(np.asarray(F)) - tri(ref)))
    assert err < 1e-9, err   # slices=6 ⇒ far below the 1e-6 target


def test_dpotri_dlogdet_ozaki():
    A = latmc(jax.random.PRNGKey(1), 192, 30.0, jnp.float64)
    F, _ = blocked.potrf("L", A, backend="ozaki", block_size=64)
    Inv, info = blocked.potri("L", F, backend="ozaki", block_size=64)
    assert int(info) == 0
    ref = np.linalg.inv(np.asarray(A))
    assert np.max(np.abs(np.tril(np.asarray(Inv)) - np.tril(ref))) < 1e-7
    val, _ = blocked.logdet("L", A, backend="ozaki", block_size=64)
    _, refld = np.linalg.slogdet(np.asarray(A))
    assert abs(float(val) - refld) < 1e-9 * abs(refld) + 1e-9


def test_dtrtri_ozaki():
    L = generators.random_triangular(jax.random.PRNGKey(2), 200, "L", "N",
                                     jnp.float64)
    W, info = blocked.trtri("L", "N", L, backend="ozaki", block_size=64)
    assert int(info) == 0
    ref = np.linalg.inv(np.tril(np.asarray(L)))
    rel = np.max(np.abs(np.tril(np.asarray(W)) - np.tril(ref))) / \
        np.max(np.abs(ref))
    assert rel < 1e-8, rel


def test_dtrsm_ozaki_backend():
    # f64 trsm routes through the recursive driver with Ozaki tiles
    L = generators.random_triangular(jax.random.PRNGKey(5), 200, "L", "N",
                                     jnp.float64)
    B = jnp.asarray(np.random.RandomState(6).randn(200, 16))
    X = blocked.trsm("L", "L", "N", "N", 1.0, L, B, backend="ozaki",
                     block_size=64)
    ref = np.linalg.solve(np.tril(np.asarray(L)), np.asarray(B))
    scaled = np.max(np.abs(np.asarray(X) - ref)) / np.max(np.abs(ref))
    assert scaled < 1e-8, scaled


def test_dgemm_ozaki_backend():
    A = jnp.asarray(np.random.RandomState(7).randn(100, 80))
    B = jnp.asarray(np.random.RandomState(8).randn(80, 60))
    C = jnp.asarray(np.random.RandomState(9).randn(100, 60))
    out = blocked.gemm("N", "N", 0.5, A, B, -1.0, C, backend="ozaki")
    ref = 0.5 * np.asarray(A) @ np.asarray(B) - np.asarray(C)
    assert np.max(np.abs(np.asarray(out) - ref)) < 1e-9
