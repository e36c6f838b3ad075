"""Backend routing rules (the mangled-name dispatch analog, trace-time)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cholesky_tpu import config
from cholesky_tpu.ops import blocked
from cholesky_tpu.utils.benchlib import bench_op


def test_fast_tiles_routing():
    # f32 → Pallas regardless of platform
    t = blocked._fast_tiles_or_none(jnp.float32, "auto")
    assert isinstance(t, blocked._PallasTiles)
    # f64 'auto' off-TPU (CPU test mesh) → None ⇒ native-f64 blas_ref
    assert not config.on_tpu()
    assert blocked._fast_tiles_or_none(jnp.float64, "auto") is None
    # f64 explicit ozaki works anywhere
    assert isinstance(blocked._fast_tiles_or_none(jnp.float64, "ozaki"),
                      blocked._OzakiTiles)
    # complex never gets a fast tile here (native XLA complex wins)
    assert blocked._fast_tiles_or_none(jnp.complex64, "auto") is None
    assert blocked._fast_tiles_or_none(jnp.complex64, "xla") is None


def test_potf2_routes_to_pallas_leaf():
    # blocked.potf2 must honor its backend arg: f32 kernel-size blocks go
    # through the in-VMEM Pallas leaf, and upper storage canonicalizes
    import jax
    from cholesky_tpu.rng import generators
    A = generators.latmc(jax.random.PRNGKey(3), 128, 20.0, jnp.float32)
    for uplo in ("L", "U"):
        F, info = blocked.potf2(uplo, A, backend="pallas")
        Fr, info_r = blocked.potf2(uplo, A, backend="ref")
        assert int(info) == int(info_r) == 0
        tri = np.tril if uplo == "L" else np.triu
        np.testing.assert_allclose(tri(np.asarray(F)), tri(np.asarray(Fr)),
                                   rtol=0, atol=2e-4)
        # opposite strict triangle untouched
        anti = (np.triu(np.asarray(F), 1) if uplo == "L"
                else np.tril(np.asarray(F), -1))
        anti_in = (np.triu(np.asarray(A), 1) if uplo == "L"
                   else np.tril(np.asarray(A), -1))
        np.testing.assert_array_equal(anti, anti_in)


def test_tiles_for_backend_validation():
    with pytest.raises(ValueError):
        blocked._tiles_for(jnp.float64, "pallas")
    with pytest.raises(ValueError):
        blocked._tiles_for(jnp.float32, "ozaki")


def test_benchlib_measures_positive_time():
    x = jnp.ones((64, 64), jnp.float32)
    t = bench_op(lambda v: v * 2.0 + 1.0, x, chain=4, reps=2)
    assert t > 0.0
