"""Distributed BLAS tier (reference cumultigpu{gemm,syrk,trmm} tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cholesky_tpu.parallel import blas as dblas
from cholesky_tpu.rng import generators
from tests.util import assert_close, to_np128


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()), ("d",))


def rnd(seed, shape):
    return (jax.random.uniform(jax.random.PRNGKey(seed), shape, jnp.float64)
            - 0.5).astype(jnp.float32)


@pytest.mark.parametrize("ta,tb", [("N", "N"), ("T", "N"), ("N", "T")])
@pytest.mark.parametrize("m", [256, 200])   # 200: row-padding path
def test_gemm_dist(mesh, ta, tb, m):
    k, n = 96, 80
    A = rnd(0, (m, k) if ta == "N" else (k, m))
    B = rnd(1, (k, n) if tb == "N" else (n, k))
    C = rnd(2, (m, n))
    out = dblas.gemm_dist(ta, tb, 0.9, A, B, -0.3, C, mesh)
    An, Bn = to_np128(A), to_np128(B)
    An = An if ta == "N" else An.T
    Bn = Bn if tb == "N" else Bn.T
    ref = 0.9 * An @ Bn - 0.3 * to_np128(C)
    assert_close(out, ref, jnp.float32, 2 * k + 3, f"gemm_dist {ta}{tb}")


def test_gemm_dist_output_sharded(mesh):
    A, B, C = rnd(3, (256, 64)), rnd(4, (64, 64)), rnd(5, (256, 64))
    out = dblas.gemm_dist("N", "N", 1.0, A, B, 0.0, C, mesh)
    # output stripes live one-per-device (the reference's output tiling)
    assert len(out.addressable_shards) == len(jax.devices())
    assert out.addressable_shards[0].data.shape[0] == 256 // len(jax.devices())


@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("trans", ["N", "T"])
@pytest.mark.parametrize("n", [200, 201, 333])   # 201/333: n % p != 0 (the
def test_syrk_dist(mesh, uplo, trans, n):        # round-1 padding crash)
    k = 96
    A = rnd(6, (n, k) if trans == "N" else (k, n))
    C = rnd(7, (n, n))
    out = dblas.syrk_dist(uplo, trans, -1.0, A, 1.0, C, mesh)
    An = to_np128(A)
    An = An if trans == "N" else An.T
    full = -An @ An.T + to_np128(C)
    mask = np.tril(np.ones((n, n))) if uplo == "L" else np.triu(np.ones((n, n)))
    ref = np.where(mask > 0, full, to_np128(C))
    assert_close(out, ref, jnp.float32, 2 * k + 3, f"syrk_dist {uplo}{trans}")
    # untouched triangle preserved
    anti = np.triu(np.asarray(out), 1) if uplo == "L" else np.tril(np.asarray(out), -1)
    anti_c = np.triu(np.asarray(C), 1) if uplo == "L" else np.tril(np.asarray(C), -1)
    np.testing.assert_array_equal(anti, anti_c)


@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("trans", ["N", "C"])
@pytest.mark.parametrize("n", [200, 201])
def test_herk_dist(mesh, uplo, trans, n):
    # reference cuMultiGPUCherk (include/blas.h:275-287)
    k = 64
    kr, ki = jax.random.split(jax.random.PRNGKey(10))
    shape = (n, k) if trans == "N" else (k, n)
    A = jax.lax.complex(jax.random.uniform(kr, shape) - 0.5,
                        jax.random.uniform(ki, shape) - 0.5
                        ).astype(jnp.complex64)
    Cr, Ci = jax.random.split(jax.random.PRNGKey(11))
    C = jax.lax.complex(jax.random.uniform(Cr, (n, n)) - 0.5,
                        jax.random.uniform(Ci, (n, n)) - 0.5
                        ).astype(jnp.complex64)
    out = dblas.herk_dist(uplo, trans, 0.7, A, -0.2, C, mesh)
    An = to_np128(A)
    An = An if trans == "N" else An.conj().T
    full = 0.7 * (An @ An.conj().T) - 0.2 * to_np128(C)
    np.fill_diagonal(full, full.diagonal().real)
    mask = np.tril(np.ones((n, n))) if uplo == "L" else np.triu(np.ones((n, n)))
    ref = np.where(mask > 0, full, to_np128(C))
    assert_close(out, ref, jnp.complex64, 8 * k + 6, f"herk_dist {uplo}{trans}")


@pytest.mark.parametrize("side", ["L", "R"])
@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("trans", ["N", "T"])
@pytest.mark.parametrize("diag", ["N", "U"])
@pytest.mark.parametrize("n", [200, pytest.param(333, marks=pytest.mark.slow)])
def test_trsm_dist_general(mesh, side, uplo, trans, diag, n):
    # reference cuMultiGPUStrsm family (include/blas.h:338-362): general
    # sharded B, all side/uplo/trans/diag combos, incl. n % p != 0
    m = 96
    na = m if side == "L" else n
    A = generators.random_triangular(jax.random.PRNGKey(12), na, uplo, diag,
                                     jnp.float32)
    B = rnd(13, (m, n))
    out = dblas.trsm_dist(side, uplo, trans, diag, 0.8, A, B, mesh)
    T = to_np128(A)
    T = np.tril(T) if uplo == "L" else np.triu(T)
    if diag == "U":
        np.fill_diagonal(T, 1.0)
    T = T if trans == "N" else T.T
    Bn = 0.8 * to_np128(B)
    ref = (np.linalg.solve(T, Bn) if side == "L"
           else np.linalg.solve(T.T, Bn.T).T)
    assert_close(out, ref, jnp.float32, 30 * na,
                 f"trsm_dist {side}{uplo}{trans}{diag}")


@pytest.mark.parametrize("side", ["L", "R"])
@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("trans", ["N", "T"])
def test_trmm_dist(mesh, side, uplo, trans):
    m, n = 200, 96
    na = m if side == "L" else n
    A = generators.random_triangular(jax.random.PRNGKey(8), na, uplo, "N",
                                     jnp.float32)
    B = rnd(9, (m, n))
    out = dblas.trmm_dist(side, uplo, trans, "N", 1.3, A, B, mesh)
    T = to_np128(A)
    T = np.tril(T) if uplo == "L" else np.triu(T)
    T = T if trans == "N" else T.T
    ref = 1.3 * (T @ to_np128(B) if side == "L" else to_np128(B) @ T)
    assert_close(out, ref, jnp.float32, 2 * na + 3,
                 f"trmm_dist {side}{uplo}{trans}")


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex64])
def test_trmm_dist_dtypes(mesh, dtype):
    # the r3 stripe decomposition must hold for every dtype the single-chip
    # driver serves (f64 live-block tiles / complex via the embedding)
    m, n = 160, 64
    A = generators.random_triangular(jax.random.PRNGKey(10), m, "L", "N",
                                     dtype)
    B = rnd(11, (m, n)).astype(dtype)
    out = dblas.trmm_dist("L", "L", "N", "N", 1.0, A, B, mesh)
    ref = np.tril(to_np128(A)) @ to_np128(B)
    assert_close(out, ref, dtype, 2 * m + 3, f"trmm_dist {np.dtype(dtype)}")


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex64])
def test_trsm_dist_dtypes(mesh, dtype):
    m, n = 160, 64
    A = generators.random_triangular(jax.random.PRNGKey(12), m, "L", "N",
                                     dtype, well_conditioned=True)
    B = rnd(13, (m, n)).astype(dtype)
    out = dblas.trsm_dist("L", "L", "N", "N", 1.0, A, B, mesh)
    ref = np.linalg.solve(np.tril(to_np128(A)), to_np128(B))
    assert_close(out, ref, dtype, 30 * m, f"trsm_dist {np.dtype(dtype)}")
