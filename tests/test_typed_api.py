"""s/d/c/z precision-prefixed API parity (reference include/blas.h naming)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cholesky_tpu as ct
from cholesky_tpu.rng import latmc


def test_all_typed_names_exist():
    for letter in "sdcz":
        for name in ["gemm", "trmm", "trmm2", "trsm", "potrf",
                     "potf2", "trtri", "trtri2", "trti2", "lauum", "lauu2",
                     "potri", "logdet"]:
            assert hasattr(ct, letter + name), letter + name
    # rank-k: syrk for real, herk for complex — exactly the reference's
    # surface (blas/ has ssyrk/dsyrk + cherk/zherk, no csyrk/zsyrk)
    assert hasattr(ct, "ssyrk") and hasattr(ct, "dsyrk")
    assert not hasattr(ct, "csyrk") and not hasattr(ct, "zsyrk")
    assert hasattr(ct, "cherk") and hasattr(ct, "zherk")


def test_spotrf_works_and_dpotrf_rejects_f32():
    A = latmc(jax.random.PRNGKey(0), 64, 10.0, jnp.float32)
    F, info = ct.spotrf("L", A)
    assert int(info) == 0
    ref = np.linalg.cholesky(np.asarray(A, np.float64))
    assert np.max(np.abs(np.tril(np.asarray(F)) - ref)) < 1e-4
    with pytest.raises(ValueError):
        ct.dpotrf("L", A)   # f32 into the d-variant must xerbla


def test_zpotrf_runs_complex128():
    A = latmc(jax.random.PRNGKey(1), 48, 10.0, jnp.complex128)
    F, info = ct.zpotrf("L", A)
    assert int(info) == 0
    ref = np.linalg.cholesky(np.asarray(A))
    assert np.max(np.abs(np.tril(np.asarray(F)) - ref)) < 1e-12


def test_cherk():
    A = (jax.random.normal(jax.random.PRNGKey(2), (32, 16))
         + 1j * jax.random.normal(jax.random.PRNGKey(3), (32, 16))
         ).astype(jnp.complex64)
    C = jnp.zeros((32, 32), jnp.complex64)
    out = ct.cherk("L", "N", 1.0, A, 0.0, C)
    ref = np.tril(np.asarray(A, np.complex128) @ np.asarray(A, np.complex128).conj().T)
    assert np.max(np.abs(np.tril(np.asarray(out)) - ref)) < 1e-4
