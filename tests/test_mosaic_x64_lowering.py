"""Mosaic lowering of every Pallas kernel must succeed UNDER x64.

The d/z drivers always run with ``jax_enable_x64``; in that mode Python
literals inside a kernel trace as f64/i64 scalars and Mosaic's convert
lowering dies on them — on-chip as an unbounded ``RecursionError``, in
cross-platform AOT lowering as ``NotImplementedError: Unsupported cast``
(the r4 on-chip regression: every d-precision golden sweep FAILED at
trace time).  ``utils/pallas_x32.pallas_call`` traces kernels with x64
off; these tests pin that by AOT-lowering for the ``tpu`` platform from
the CPU test process — real Mosaic lowering, no chip needed.

Reference analog: the CUDA build compiles every kernel for the target
arch at build time (reference Makefile nvcc rules) — a broken kernel
cannot ship silently.
"""

import functools

import jax
import jax.numpy as jnp
import pytest

from cholesky_tpu import config
from cholesky_tpu.ops import blocked
from cholesky_tpu.ops.pallas import gemm, leaf, mega, ozaki_split, syrk, trmm


@pytest.fixture(autouse=True)
def _force_mosaic(monkeypatch):
    """Compiled-kernel (non-interpret) tracing + the TPU tuning table, so
    the lowering exercised is exactly what the chip sees."""
    monkeypatch.setattr(config, "pallas_interpret", lambda: False)
    monkeypatch.setattr(config, "on_tpu", lambda: True)
    monkeypatch.setenv("CHOLESKY_TPU_DEVICE_KIND", "TPU v5 lite")
    yield
    # the AOT .trace() calls above populate the caches of module-level
    # inner jits (matmul_f64, leaf kernels, mm_groups_f32pair, ...) with
    # interpret=False / on_tpu=True traces; a later CPU test hitting the
    # same inner shapes would re-use them and die with "Only interpret
    # mode is supported on CPU backend" (observed: the f64-rescue test
    # after the fused-Ozaki routing landed)
    jax.clear_caches()


def _lower(fn, *specs):
    jax.jit(fn).trace(*specs).lower(lowering_platforms=("tpu",))


def _s(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


KERNELS = [
    ("leaf_potf2", lambda: _lower(leaf.potf2_f32, _s((256, 256)))),
    ("leaf_trti2", lambda: _lower(leaf.trti2_f32, _s((256, 256)))),
    ("leaf_trti2_unit",
     lambda: _lower(functools.partial(leaf.trti2_f32, unit=True),
                    _s((256, 256)))),
    ("leaf_lauu2", lambda: _lower(leaf.lauu2_f32, _s((256, 256)))),
    ("mega_potrf_vmem", lambda: _lower(mega.potrf_vmem_f32, _s((512, 512)))),
    ("mega_trtri_vmem", lambda: _lower(mega.trtri_vmem_f32, _s((512, 512)))),
    ("mega_potrf_hbm", lambda: _lower(mega.potrf_hbm_f32, _s((2048, 2048)))),
    ("mega_trtri_hbm", lambda: _lower(mega.trtri_hbm_f32, _s((2048, 2048)))),
    ("mega_lauum_hbm", lambda: _lower(mega.lauum_hbm_f32, _s((2048, 2048)))),
    ("gemm", lambda: _lower(gemm.matmul_f32, _s((512, 512)), _s((512, 512)))),
    ("syrk", lambda: _lower(syrk.syrk_f32, _s((512, 512)),
                            _s((512, 512)))),
    ("trmm", lambda: _lower(trmm.trmm_lln_f32, _s((512, 512)),
                            _s((512, 512)))),
    ("ozaki_peel",
     lambda: _lower(lambda a, b: ozaki_split.peel_f32pair(a, b, slices=6),
                    _s((256, 256)), _s((256, 256)))),
]


@pytest.mark.parametrize("name,low", KERNELS, ids=[k[0] for k in KERNELS])
def test_kernel_lowers_for_tpu_under_x64(name, low):
    assert jax.config.jax_enable_x64  # conftest turns x64 on
    low()


DRIVERS = [
    ("potrf", lambda x: blocked.potrf("L", x, backend="auto")),
    ("trtri", lambda x: blocked.trtri("L", "N", x, backend="auto")),
    ("lauum", lambda x: blocked.lauum("L", x, backend="auto")),
    ("potri", lambda x: blocked.potri("L", x, backend="auto")),
    ("trmm", lambda x: blocked.trmm("L", "L", "N", "N", 1.0, x, x,
                                    backend="auto")),
    ("trsm", lambda x: blocked.trsm("L", "L", "N", "N", 1.0, x, x,
                                    backend="auto")),
]


@pytest.mark.parametrize("name,fn", DRIVERS, ids=[d[0] for d in DRIVERS])
def test_f64_driver_lowers_for_tpu(name, fn):
    """The exact r4 on-chip failure: every f64 driver's full auto-routed
    program (Ozaki leaves + mega kernels + peel) must Mosaic-lower."""
    _lower(fn, _s((256, 256), jnp.float64))


@pytest.mark.slow
def test_f64_potrf_lowers_at_mega_size():
    """n=2048 routes the Ozaki sub-factor through the HBM mono kernel."""
    _lower(lambda x: blocked.potrf("L", x, backend="auto"),
           _s((2048, 2048), jnp.float64))
