"""Pallas f32 TRMM: C := alpha·L·B with L lower triangular — live tiles only.

Rebuild of the reference's TRMM kernels (reference blas/strmm.cu — one
hand-written ``__global__`` per side/uplo/trans combo, ztrmm.cu:73-1005,
16 per dtype). The TPU-native move is the opposite factoring: ONE kernel
for the canonical (left, lower, no-trans) form whose grid enumerates only
the nt(nt+1)/2 live (row-block, k-block) tiles of the triangle — half the
MXU flops and half the A-traffic of the round-1 masked-full-GEMM tier —
plus XLA-level transposes/reversals that map all 16 combos onto it
(see blocked.trmm): a transpose is an O(n²) HBM copy against the O(n³/2)
multiply, the same price the reference pays in divergent code paths.

Tile coordinates are delivered via scalar prefetch exactly like the syrk
triangle grid (ops/pallas/syrk.py); the k-run of each output row-block is
consecutive (t is the fastest grid axis), accumulated in a VMEM scratch
and flushed at the diagonal tile (kk == ii, the last live k).

The operand is *contractually* lower triangular: callers mask/transpose
at the XLA level (which also enforces "only the selected triangle of A is
read"), so the kernel needs no triangle masks at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cholesky_tpu import config
from cholesky_tpu.utils.vma import out_struct
from cholesky_tpu.utils.pallas_x32 import pallas_call as pallas_call_x32

DEFAULT_BN, DEFAULT_BM = 256, 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _trmm_kernel(ii_ref, kk_ref, l_ref, b_ref, o_ref, acc_ref, *, alpha):
    t = pl.program_id(1)
    ii = ii_ref[t]
    kk = kk_ref[t]

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += lax.dot_general(
        l_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)

    @pl.when(kk == ii)          # diagonal tile = last live k of this row
    def _():
        o_ref[:] = alpha * acc_ref[:]


@functools.partial(jax.jit, static_argnames=("alpha", "bn", "bm"))
def trmm_lln_f32(L, B, *, alpha: float = 1.0, bn: int = None, bm: int = None):
    """C = alpha·L·B for an (n, n) lower-triangular f32 ``L`` (the strict
    upper triangle MUST already be zero — callers canonicalize) and an
    (n, m) ``B``. Only the nt(nt+1)/2 live tiles of L are enumerated."""
    if bn is None or bm is None:
        from cholesky_tpu.tuning import get_params
        p = get_params("trmm_f32")
        bn = bn or p["bn"]
        bm = bm or p["bm"]
    n, m = B.shape
    assert L.shape == (n, n) and L.dtype == B.dtype == jnp.float32

    bn_ = min(bn, _round_up(n, 128))
    bm_ = min(bm, _round_up(m, 128))
    np_, mp = _round_up(n, bn_), _round_up(m, bm_)
    Lp = jnp.pad(L, ((0, np_ - n), (0, np_ - n))) if np_ != n else L
    Bp = jnp.pad(B, ((0, np_ - n), (0, mp - m))) if (np_, mp) != (n, m) else B

    nt = np_ // bn_
    nj = mp // bm_
    # live (row-block, k-block) pairs, k-run consecutive per row
    ii = np.array([i for i in range(nt) for k in range(i + 1)], np.int32)
    kk = np.array([k for i in range(nt) for k in range(i + 1)], np.int32)
    T = len(ii)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nj, T),
        in_specs=[
            pl.BlockSpec((bn_, bn_), lambda j, t, ii, kk: (ii[t], kk[t])),
            pl.BlockSpec((bn_, bm_), lambda j, t, ii, kk: (kk[t], j)),
        ],
        out_specs=pl.BlockSpec((bn_, bm_), lambda j, t, ii, kk: (ii[t], j)),
        scratch_shapes=[pltpu.VMEM((bn_, bm_), jnp.float32)],
    )
    out = pallas_call_x32(
        functools.partial(_trmm_kernel, alpha=float(alpha)),
        grid_spec=grid_spec,
        out_shape=out_struct((np_, mp), jnp.float32, Lp, Bp),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * T * bn_ * bn_ * bm_ * nj),
            bytes_accessed=4 * (T * bn_ * bn_ + T * bn_ * bm_ * nj
                                + nt * bn_ * bm_ * nj),
            transcendentals=0),
        interpret=config.pallas_interpret(),
    )(jnp.asarray(ii), jnp.asarray(kk), Lp, Bp)
    if (np_, mp) != (n, m):
        out = out[:n, :m]
    return out
