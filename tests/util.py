"""Shared test utilities: analytic eps-scaled tolerances + oracles.

Mirrors the reference's accuracy criterion: max elementwise |impl − ref|
vs an analytic per-element bound flops_per_element × 2 × eps
(reference test/blas/sgemm.c:160-166), with the bound scaled by the
magnitude of the reference result.
"""

import numpy as np
import jax.numpy as jnp


def eps_of(dtype):
    d = jnp.dtype(dtype)
    if d in (jnp.dtype(jnp.complex64),):
        return float(np.finfo(np.float32).eps)
    if d in (jnp.dtype(jnp.complex128),):
        return float(np.finfo(np.float64).eps)
    return float(np.finfo(d).eps)


def tol(dtype, flops_per_element, scale=1.0):
    """Analytic bound: fpe × 2 × eps × max(1, scale)."""
    return flops_per_element * 2.0 * eps_of(dtype) * max(1.0, float(scale))


def assert_close(actual, ref, dtype, flops_per_element, what=""):
    a = np.asarray(actual)
    r = np.asarray(ref)
    assert a.shape == r.shape, f"{what}: shape {a.shape} != {r.shape}"
    scale = float(np.max(np.abs(r))) if r.size else 1.0
    bound = tol(dtype, flops_per_element, scale)
    diff = float(np.max(np.abs(a - r))) if r.size else 0.0
    assert diff <= bound, (
        f"{what}: max abs diff {diff:.3e} > bound {bound:.3e} "
        f"(fpe={flops_per_element}, scale={scale:.3e})")


REAL_DTYPES = [jnp.float32, jnp.float64]
ALL_DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


def to_np128(x):
    """Promote to the widest numpy dtype for oracle computation."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return x.astype(np.complex128)
    return x.astype(np.float64)
