"""Pallas f32 GEMM: D = alpha·A@B + beta·C on the MXU.

Rebuild of the reference's SGEMM kernel (reference blas/sgemm.cu:29-171 —
shared-memory B staging, per-thread register column accumulators, rank-1
inner loop) as a Pallas grid kernel: the (mb, nb, kb) block-shape template
parameters (reference sgemm.cu:214-217) become runtime block sizes; the
k-loop streaming of panels becomes the third grid dimension with a VMEM
accumulator that lives across k steps.

f32 dots are issued with precision=HIGHEST — the MXU's native multiplier is
bf16 and the default lowering is a single bf16 pass (~2^-8 relative error,
measured on v5e), unacceptable for linear algebra.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cholesky_tpu import config
from cholesky_tpu.utils.vma import out_struct
from cholesky_tpu.utils.pallas_x32 import pallas_call as pallas_call_x32

# Default block shapes; overridden by the tuning table (tuning/table.py),
# the analog of the reference's build-time autotuned config.h.
DEFAULT_BM, DEFAULT_BN, DEFAULT_BK = 256, 256, 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad2(x, rows, cols):
    if x.shape == (rows, cols):
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


def _mm_kernel(a_ref, b_ref, c_ref, o_ref, acc_ref, *, alpha, beta, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)

    @pl.when(k == nk - 1)
    def _():
        out = alpha * acc_ref[:]
        if beta != 0.0:
            out = out + beta * c_ref[:]
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("alpha", "beta", "bm", "bn", "bk"))
def matmul_f32(A, B, C=None, *, alpha: float = 1.0, beta: float = 0.0,
               bm: int = None, bn: int = None, bk: int = None):
    """D = alpha·A@B (+ beta·C). f32 in, f32 out. Any shapes (padded
    internally to MXU tiles); alpha/beta are static floats. Block shapes
    default to the device's tuning table (tuning/table.py)."""
    if bm is None or bn is None or bk is None:
        from cholesky_tpu.tuning import get_params
        p = get_params("matmul_f32")
        bm = bm or p["bm"]
        bn = bn or p["bn"]
        bk = bk or p["bk"]
    m, k = A.shape
    k2, n = B.shape
    assert k == k2, (A.shape, B.shape)
    if C is None:
        assert beta == 0.0
    else:
        assert C.shape == (m, n)

    # Clamp block sizes for small problems, keeping MXU-aligned tiles.
    bm_ = min(bm, _round_up(m, 128))
    bn_ = min(bn, _round_up(n, 128))
    bk_ = min(bk, _round_up(k, 128))
    mp, np_, kp = _round_up(m, bm_), _round_up(n, bn_), _round_up(k, bk_)
    Ap = _pad2(A, mp, kp)
    Bp = _pad2(B, kp, np_)
    Cp = _pad2(C, mp, np_) if C is not None else jnp.zeros((mp, np_), A.dtype)

    nk = kp // bk_
    grid = (mp // bm_, np_ // bn_, nk)
    kernel = functools.partial(_mm_kernel, alpha=alpha, beta=beta, nk=nk)
    flops = 2 * mp * np_ * kp
    out = pallas_call_x32(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_, bk_), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk_, bn_), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bm_, bn_), lambda i, j, kk: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm_, bn_), lambda i, j, kk: (i, j)),
        out_shape=out_struct((mp, np_), jnp.float32, Ap, Bp, Cp),
        scratch_shapes=[pltpu.VMEM((bm_, bn_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * (mp * kp + kp * np_ + mp * np_),
            transcendentals=0),
        interpret=config.pallas_interpret(),
    )(Ap, Bp, Cp)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out
