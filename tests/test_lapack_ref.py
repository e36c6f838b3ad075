"""Oracle-tier LAPACK drivers vs numpy, all four precisions.

Plays the role of the reference's test/lapack/{s,d,c,z}{potrf,trtri,lauum,
potri,logdet}.c binaries with their naive refs (test/lapack/ref/*_ref.c),
using latmc-generated SPD/HPD fixtures (test/lapack/util/slatmc.c).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cholesky_tpu.ops import lapack_ref as lp
from cholesky_tpu.rng import generators
from tests.util import ALL_DTYPES, assert_close, to_np128

N = 48


def spd(n, dtype, cond=100.0, seed=0):
    return generators.latmc(jax.random.PRNGKey(seed), n, cond, dtype)


def np_chol(A, uplo):
    L = np.linalg.cholesky(to_np128(A))
    return L if uplo == "L" else L.conj().T


@pytest.mark.parametrize("dtype", ALL_DTYPES)
@pytest.mark.parametrize("uplo", ["U", "L"])
@pytest.mark.parametrize("fn", [lp.potf2, lp.potrf])
def test_potrf(dtype, uplo, fn):
    A = spd(N, dtype)
    F, info = fn(uplo, A)
    assert int(info) == 0
    ref = np_chol(A, uplo)
    tri = np.tril if uplo == "L" else np.triu
    assert_close(tri(np.asarray(F)), tri(ref), dtype, 8 * N,
                 f"potrf {uplo}")
    # opposite strict triangle untouched (reference keeps original content)
    anti = np.triu(np.asarray(F), 1) if uplo == "L" else np.tril(np.asarray(F), -1)
    anti_in = np.triu(np.asarray(A), 1) if uplo == "L" else np.tril(np.asarray(A), -1)
    np.testing.assert_array_equal(anti, anti_in)


@pytest.mark.parametrize("uplo", ["U", "L"])
def test_potrf_non_pd_info(uplo):
    # non-PD: info = 1-based index of first failing pivot
    # (reference lapack/spotrf.c:47-51, 112-115)
    A = np.asarray(spd(N, jnp.float32, cond=10.0)).copy()
    A[20, 20] = -5.0  # breaks PD at pivot 21 (0-based 20)
    A = jnp.asarray(0.5 * (A + A.T))
    _, info2 = lp.potf2(uplo, A)
    _, infoB = lp.potrf(uplo, A, block_size=16)
    assert int(info2) >= 1
    assert int(info2) == int(infoB)
    # failing index must be <= 21: the pivot can only fail at or before col 21
    assert int(info2) <= 21


@pytest.mark.parametrize("uplo", ["U", "L"])
def test_potf2_nan_pivot_sets_info(uplo):
    # A NaN pivot must set info (the reference spotf2 checks
    # `aii <= zero || isnan(aii)`, lapack/spotrf.c:47-51); the naive
    # `ajj <= 0` predicate is False for NaN and silently reports success.
    A = np.asarray(spd(N, jnp.float32, cond=10.0)).copy()
    A[12, 12] = np.nan
    A = jnp.asarray(0.5 * (A + A.T))
    _, info = lp.potf2(uplo, A)
    assert 1 <= int(info) <= 13
    F, infoB = lp.potrf(uplo, A, block_size=16)
    assert 1 <= int(infoB) <= 13


@pytest.mark.parametrize("dtype", ALL_DTYPES)
@pytest.mark.parametrize("uplo", ["U", "L"])
@pytest.mark.parametrize("diag", ["N", "U"])
def test_trtri(dtype, uplo, diag):
    A = generators.random_triangular(jax.random.PRNGKey(3), N, uplo, diag, dtype)
    Ainv, info = lp.trtri(uplo, diag, A)
    assert int(info) == 0
    T = to_np128(A)
    T = np.tril(T) if uplo == "L" else np.triu(T)
    if diag == "U":
        np.fill_diagonal(T, 1.0)
    ref = np.linalg.inv(T)
    got = np.asarray(Ainv)
    tri = np.tril if uplo == "L" else np.triu
    if diag == "U":
        # unit-diag inverse: strict triangle only; diagonal stays untouched
        got_t = tri(got, -1 if uplo == "L" else None) if uplo == "L" else np.triu(got, 1)
        ref_t = np.tril(ref, -1) if uplo == "L" else np.triu(ref, 1)
        assert_close(got_t, ref_t, dtype, 40 * N, f"trtri {uplo}{diag}")
    else:
        assert_close(tri(got), tri(ref), dtype, 40 * N, f"trtri {uplo}{diag}")


@pytest.mark.parametrize("uplo", ["U", "L"])
def test_trtri_singular_info(uplo):
    A = np.asarray(generators.random_triangular(
        jax.random.PRNGKey(4), N, uplo, "N", jnp.float32)).copy()
    A[17, 17] = 0.0
    _, info = lp.trtri(uplo, "N", jnp.asarray(A))
    assert int(info) == 18


@pytest.mark.parametrize("dtype", ALL_DTYPES)
@pytest.mark.parametrize("uplo", ["U", "L"])
def test_lauum(dtype, uplo):
    A = generators.random_triangular(jax.random.PRNGKey(5), N, uplo, "N", dtype)
    out = lp.lauum(uplo, A)
    T = to_np128(A)
    if uplo == "U":
        T = np.triu(T)
        ref = T @ T.conj().T   # U·Uᴴ
        mask = np.triu(np.ones((N, N)))
    else:
        T = np.tril(T)
        ref = T.conj().T @ T   # Lᴴ·L
        mask = np.tril(np.ones((N, N)))
    full = np.where(mask > 0, ref, to_np128(A))
    assert_close(out, full, dtype, 2 * N + 3, f"lauum {uplo}")


@pytest.mark.parametrize("dtype", ALL_DTYPES)
@pytest.mark.parametrize("uplo", ["U", "L"])
def test_potri(dtype, uplo):
    A = spd(N, dtype, cond=50.0)
    F, info0 = lp.potrf(uplo, A)
    assert int(info0) == 0
    Inv, info = lp.potri(uplo, F)
    assert int(info) == 0
    ref = np.linalg.inv(to_np128(A))
    got = np.asarray(Inv)
    tri = np.tril if uplo == "L" else np.triu
    assert_close(tri(got), tri(ref), dtype, 3000 * N, f"potri {uplo}")


@pytest.mark.parametrize("dtype", ALL_DTYPES)
@pytest.mark.parametrize("uplo", ["U", "L"])
def test_logdet(dtype, uplo):
    A = spd(N, dtype, cond=30.0, seed=7)
    val, info = lp.logdet(uplo, A)
    assert int(info) == 0
    sign, ref = np.linalg.slogdet(to_np128(A))
    assert np.isclose(sign, 1.0)
    assert_close(np.asarray(val), np.asarray(ref), dtype, 50 * N, "logdet")


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_logdet_from_factor(dtype):
    A = spd(N, dtype, cond=30.0, seed=8)
    F, _ = lp.potrf("L", A)
    # accepts a factored matrix or a bare diagonal (the reference's strided
    # vector with incx=lda+1, slogdet.c:10-25)
    v1 = lp.logdet_from_factor(F)
    v2 = lp.logdet_from_factor(jnp.diagonal(F))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=0)
    _, ref = np.linalg.slogdet(to_np128(A))
    assert_close(np.asarray(v1), np.asarray(ref), dtype, 50 * N,
                 "logdet_from_factor")


def test_potrf_potri_roundtrip_identity():
    # A · potri(potrf(A)) ≈ I  — end-to-end composition check
    A = spd(N, jnp.float64, cond=10.0, seed=9)
    F, _ = lp.potrf("L", A)
    Inv, _ = lp.potri("L", F)
    InvFull = np.tril(np.asarray(Inv)) + np.tril(np.asarray(Inv), -1).T
    I = to_np128(A) @ InvFull
    assert np.max(np.abs(I - np.eye(N))) < 1e-9


@pytest.mark.parametrize("uplo", ["U", "L"])
def test_potf2_freezes_past_failure(uplo):
    """Columns past the first failed pivot keep their original values
    (reference spotf2 returns at the bad pivot, lapack/spotrf.c:47-51).
    The old continue-with-substituted-pivot behavior squared magnitudes
    every column — doubling-exponent growth that overflowed to ±Inf
    within ~12 columns (r5 verify drive, n=256 f64 via the Ozaki rescue
    leaf) — violating the finite-outputs contract."""
    n = 96
    A = np.asarray(spd(n, jnp.float64, cond=10.0)).copy()
    A[5, 5] = -2.0
    A = jnp.asarray(0.5 * (A + A.T))
    F, info = lp.potf2(uplo, A)
    assert int(info) == 6
    Fn = np.asarray(F)
    assert np.isfinite(Fn).all()
    # frozen region: columns (lower) / rows (upper) past the failing
    # pivot are bit-identical to the input
    if uplo == "L":
        np.testing.assert_array_equal(np.tril(Fn)[:, 6:], np.tril(np.asarray(A))[:, 6:])
    else:
        np.testing.assert_array_equal(np.triu(Fn)[6:, :], np.triu(np.asarray(A))[6:, :])
