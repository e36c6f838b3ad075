"""Pallas f32 SYRK: C := alpha·A·Aᵀ + beta·C, one triangle only.

Rebuild of the reference's SSYRK kernel (reference blas/ssyrk.cu — triangle-
only stores). The key structural win over a plain GEMM: the grid enumerates
only the nt(nt+1)/2 tiles of the requested triangle — half the MXU work and
half the DMA traffic of a full product. Tile coordinates are delivered via
scalar prefetch (PrefetchScalarGridSpec), the TPU-idiomatic version of the
reference's blockIdx→triangle index mapping (strtri.cu:10-20 upper/lower
helpers).

The untouched triangle is preserved by aliasing C into the output buffer:
grid-uncovered blocks keep their input values (the reference achieves the
same by simply never storing there).
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
from cholesky_tpu.utils.pallas_x32 import donated

DEFAULT_BN, DEFAULT_BK = 256, 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _syrk_kernel(ii_ref, jj_ref, ai_ref, aj_ref, c_ref, o_ref, acc_ref,
                 *, alpha, beta, nk, bn):
    t = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # A_i · A_jᵀ : contract the k axis of both row-blocks
    acc_ref[:] += lax.dot_general(
        ai_ref[:], aj_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)

    @pl.when(k == nk - 1)
    def _():
        res = alpha * acc_ref[:]
        if beta != 0.0:
            res = res + beta * c_ref[:]
        on_diag = ii_ref[t] == jj_ref[t]
        rows = lax.broadcasted_iota(jnp.int32, (bn, bn), 0)
        cols = lax.broadcasted_iota(jnp.int32, (bn, bn), 1)
        # on diagonal tiles, the strict upper stays C (lower-triangle store)
        keep = on_diag & (cols > rows)
        o_ref[:] = jnp.where(keep, c_ref[:], res)


@functools.partial(jax.jit,
                   static_argnames=("alpha", "beta", "bn", "bk"))
def syrk_f32(A, C, *, alpha: float = 1.0, beta: float = 1.0,
             bn: int = None, bk: int = None):
    """Lower-triangle C := alpha·A·Aᵀ + beta·C for f32; the strict upper
    triangle of C is returned unchanged. A is (n, k), C is (n, n).
    Block shapes default to the device's tuning table."""
    if bn is None or bk is None:
        from cholesky_tpu.tuning import get_params
        p = get_params("syrk_f32")
        bn = bn or p["bn"]
        bk = bk or p["bk"]
    n, k = A.shape
    assert C.shape == (n, n) and A.dtype == C.dtype == jnp.float32

    bn_ = min(bn, _round_up(n, 128))
    bk_ = min(bk, _round_up(k, 128))
    np_, kp = _round_up(n, bn_), _round_up(k, bk_)
    Ap = jnp.pad(A, ((0, np_ - n), (0, kp - k))) if (np_, kp) != (n, k) else A
    Cp = jnp.pad(C, ((0, np_ - n), (0, np_ - n))) if np_ != n else C

    nt = np_ // bn_
    nk = kp // bk_
    # triangle tile list: all (i, j) with i >= j
    ii = np.array([i for i in range(nt) for j in range(i + 1)], np.int32)
    jj = np.array([j for i in range(nt) for j in range(i + 1)], np.int32)
    T = len(ii)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, nk),
        in_specs=[
            pl.BlockSpec((bn_, bk_), lambda t, k, ii, jj: (ii[t], k)),
            pl.BlockSpec((bn_, bk_), lambda t, k, ii, jj: (jj[t], k)),
            pl.BlockSpec((bn_, bn_), lambda t, k, ii, jj: (ii[t], jj[t])),
        ],
        out_specs=pl.BlockSpec((bn_, bn_), lambda t, k, ii, jj: (ii[t], jj[t])),
        scratch_shapes=[pltpu.VMEM((bn_, bn_), jnp.float32)],
    )
    kernel = functools.partial(_syrk_kernel, alpha=alpha, beta=beta,
                               nk=nk, bn=bn_)
    out = pallas_call_x32(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_struct((np_, np_), jnp.float32, Ap, Cp),
        # alias C (input 4 counting the two scalar-prefetch operands) into
        # the output so grid-uncovered (strict upper) blocks keep C's values
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(T * bn_ * bn_ * kp * 2),
            bytes_accessed=4 * (2 * T * bn_ * kp + 2 * T * bn_ * bn_),
            transcendentals=0),
        interpret=config.pallas_interpret(),
    )(jnp.asarray(ii), jnp.asarray(jj), Ap, Ap, donated(Cp))
    if np_ != n:
        out = out[:n, :n]
    return out
