"""Oracle-tier Level-3 BLAS vs numpy, all four precisions.

Plays the role of the reference's test/blas/{s,d,c,z}{gemm,syrk,trmm,trsm}.c
standalone binaries with their naive -O0 refs (test/blas/ref/*_ref.c).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cholesky_tpu.ops import blas_ref as blas
from tests.util import ALL_DTYPES, REAL_DTYPES, assert_close, to_np128


def rnd(key, shape, dtype):
    kr, ki = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.uniform(kr, shape, jnp.float64) - 0.5
    if jnp.issubdtype(dtype, jnp.complexfloating):
        y = jax.random.uniform(ki, shape, jnp.float64) - 0.5
        return (x + 1j * y).astype(dtype)
    return x.astype(dtype)


def np_op(A, t):
    return {"N": A, "T": A.T, "C": A.conj().T}[t]


M, N, K = 33, 29, 41


@pytest.mark.parametrize("dtype", ALL_DTYPES)
@pytest.mark.parametrize("ta", ["N", "T", "C"])
@pytest.mark.parametrize("tb", ["N", "T", "C"])
def test_gemm(dtype, ta, tb):
    A = rnd(1, (M, K) if ta == "N" else (K, M), dtype)
    B = rnd(2, (K, N) if tb == "N" else (N, K), dtype)
    C = rnd(3, (M, N), dtype)
    alpha, beta = 0.7, -0.3
    out = blas.gemm(ta, tb, alpha, A, B, beta, C)
    ref = alpha * (np_op(to_np128(A), ta) @ np_op(to_np128(B), tb)) \
        + beta * to_np128(C)
    assert_close(out, ref, dtype, 2 * K + 3, f"gemm {ta}{tb}")


@pytest.mark.parametrize("dtype", ALL_DTYPES)
@pytest.mark.parametrize("uplo", ["U", "L"])
@pytest.mark.parametrize("trans", ["N", "T"])
def test_syrk(dtype, uplo, trans):
    A = rnd(4, (N, K) if trans == "N" else (K, N), dtype)
    C = rnd(5, (N, N), dtype)
    out = blas.syrk(uplo, trans, 0.9, A, 0.4, C)
    Anp = to_np128(A)
    prod = np_op(Anp, trans) @ np_op(Anp, trans).T
    full = 0.9 * prod + 0.4 * to_np128(C)
    mask = np.tril(np.ones((N, N))) if uplo == "L" else np.triu(np.ones((N, N)))
    ref = np.where(mask > 0, full, to_np128(C))
    assert_close(out, ref, dtype, 2 * K + 3, f"syrk {uplo}{trans}")


@pytest.mark.parametrize("dtype", [jnp.complex64, jnp.complex128])
@pytest.mark.parametrize("uplo", ["U", "L"])
@pytest.mark.parametrize("trans", ["N", "C"])
def test_herk(dtype, uplo, trans):
    A = rnd(6, (N, K) if trans == "N" else (K, N), dtype)
    C = rnd(7, (N, N), dtype)
    C = C + C.conj().T  # make C hermitian so the semantics are natural
    out = blas.herk(uplo, trans, 0.9, A, 0.4, C)
    Anp = to_np128(A)
    oA = np_op(Anp, trans)
    full = 0.9 * (oA @ oA.conj().T) + 0.4 * to_np128(C)
    np.fill_diagonal(full, full.diagonal().real)
    mask = np.tril(np.ones((N, N))) if uplo == "L" else np.triu(np.ones((N, N)))
    ref = np.where(mask > 0, full, to_np128(C))
    assert_close(out, ref, dtype, 2 * K + 3, f"herk {uplo}{trans}")
    # diagonal must be exactly real (reference include/blas.h:57-66)
    assert np.all(np.imag(np.diagonal(np.asarray(out))) == 0)


@pytest.mark.parametrize("dtype", ALL_DTYPES)
@pytest.mark.parametrize("side", ["L", "R"])
@pytest.mark.parametrize("uplo", ["U", "L"])
@pytest.mark.parametrize("trans", ["N", "T", "C"])
@pytest.mark.parametrize("diag", ["N", "U"])
def test_trmm(dtype, side, uplo, trans, diag):
    na = M if side == "L" else N
    A = rnd(8, (na, na), dtype)
    B = rnd(9, (M, N), dtype)
    out = blas.trmm(side, uplo, trans, diag, 1.3, A, B)
    Anp = to_np128(A)
    T = np.tril(Anp) if uplo == "L" else np.triu(Anp)
    if diag == "U":
        np.fill_diagonal(T, 1.0)
    T = np_op(T, trans)
    ref = 1.3 * (T @ to_np128(B) if side == "L" else to_np128(B) @ T)
    assert_close(out, ref, dtype, 2 * na + 3, f"trmm {side}{uplo}{trans}{diag}")


@pytest.mark.parametrize("dtype", ALL_DTYPES)
@pytest.mark.parametrize("side", ["L", "R"])
@pytest.mark.parametrize("uplo", ["U", "L"])
@pytest.mark.parametrize("trans", ["N", "T", "C"])
@pytest.mark.parametrize("diag", ["N", "U"])
def test_trsm(dtype, side, uplo, trans, diag):
    from cholesky_tpu.rng import generators
    na = M if side == "L" else N
    A = generators.random_triangular(
        jax.random.PRNGKey(10), na, uplo, diag, dtype)
    B = rnd(11, (M, N), dtype)
    out = blas.trsm(side, uplo, trans, diag, 0.8, A, B)
    Anp = to_np128(A)
    T = np.tril(Anp) if uplo == "L" else np.triu(Anp)
    if diag == "U":
        np.fill_diagonal(T, 1.0)
    T = np_op(T, trans)
    if side == "L":
        ref = np.linalg.solve(T, 0.8 * to_np128(B))
    else:
        ref = np.linalg.solve(T.T, 0.8 * to_np128(B).T).T
    # triangular solves amplify error by the condition number; generous fpe
    assert_close(out, ref, dtype, 30 * na, f"trsm {side}{uplo}{trans}{diag}")


@pytest.mark.parametrize("dtype", REAL_DTYPES)
def test_gemm_degenerate_sizes(dtype):
    # early-outs for degenerate sizes (reference sgemm.c:38-72)
    A = rnd(1, (0, 5), dtype)
    B = rnd(2, (5, 4), dtype)
    C = jnp.zeros((0, 4), dtype)
    out = blas.gemm("N", "N", 1.0, A, B, 0.0, C)
    assert out.shape == (0, 4)


def test_gemm_shape_validation():
    A = jnp.zeros((3, 4), jnp.float32)
    B = jnp.zeros((5, 6), jnp.float32)
    C = jnp.zeros((3, 6), jnp.float32)
    with pytest.raises(ValueError):
        blas.gemm("N", "N", 1.0, A, B, 0.0, C)
