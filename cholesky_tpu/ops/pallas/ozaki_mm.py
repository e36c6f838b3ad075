"""Fused Ozaki group-sum GEMM: all int8 slice products + the f64-bound
epilogue of ``ops/ozaki.matmul_presplit`` in ONE Pallas kernel.

The XLA formulation materializes every int32 group sum in HBM and converts
it to emulated f64 one group at a time: for S=6 that is 21 int32 matmul
outputs round-tripped through HBM plus ~6 full-matrix emulated-f64
convert/scale/add passes — measured to dominate the Ozaki matmul at the
block sizes the drivers actually use (the 512..1024 live blocks of
blocked.py, where the r4 d-trmm sweep showed the live-block recursion's
~2× MXU-work saving fully eaten by the doubled epilogue traffic).

This kernel keeps the whole pipeline in VMEM: the S(S+1)/2 int8x int8
MXU products of one output tile, the exact 12-bit-split int32 -> f32
conversion, and a compensated double-float accumulation. It emits the
result as an exact f32 (hi, lo) pair; the caller applies the f64 row/column
scales in a single elementwise pass. Accuracy: the pair carries ~48
mantissa bits through Knuth two-sum updates, the same budget as the f32
pair the peel itself runs on (ozaki_split.py) and far inside the
2^{-7S} dropped-pair bound that dominates the Ozaki error.

The TPU answer to the reference keeping its hi/lo double representation
resident in shared memory for the whole multiply (reference dgemm.cu:3-10);
a continuation of the fused-peel kernel (ozaki_split.py), which removed the
other HBM-bound half of the pipeline.

Mosaic constraints (CLAUDE.md rule 3): all in-kernel dtypes are
int8/int32/f32; traced via utils/pallas_x32 so the d tier's x64 mode never
reaches the kernel or its grid machinery.
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

SLICE_BITS = 7  # must match ops/ozaki.SLICE_BITS (asserted by the router)

# Default output-tile / contraction block shapes. The operands are int8, so
# VMEM cost is S*(bm + bn)*bk bytes + 2 f32 accumulators: ~2.5 MiB at the
# defaults with S=6.
DEFAULT_BM, DEFAULT_BN, DEFAULT_BK = 256, 256, 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _two_sum_into(acc_hi, acc_lo, t):
    """acc += t with Knuth two-sum: the pair (hi, lo) absorbs t exactly."""
    a = acc_hi[:]
    s = a + t
    z = s - a
    e = (a - (s - z)) + (t - z)
    acc_hi[:] = s
    acc_lo[:] += e


def _make_kernel(S: int, nk: int):
    def kernel(a_ref, b_ref, hi_ref, lo_ref, acc_hi, acc_lo):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_hi[:] = jnp.zeros_like(acc_hi)
            acc_lo[:] = jnp.zeros_like(acc_lo)

        for g in range(S):              # weight group: s + t == g
            G = None
            for s in range(g + 1):
                # (bm, bk) . (bn, bk)^T on the MXU, exact int32
                P = lax.dot_general(a_ref[s], b_ref[g - s],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                G = P if G is None else G + P
            # exact int32 -> f32: per k-step |G| <= 65^2*bk < 2^22 so the
            # 12-bit split halves (<=2^10 and <2^12) convert exactly, and
            # the power-of-two group weight keeps them exact
            ghi = lax.shift_right_arithmetic(G, 12)      # floor(G/4096)
            glo = G - ghi * 4096                         # in [0, 4095]
            w = 2.0 ** (-SLICE_BITS * (g + 2))
            _two_sum_into(acc_hi, acc_lo,
                          ghi.astype(jnp.float32) * (4096.0 * w))
            _two_sum_into(acc_hi, acc_lo, glo.astype(jnp.float32) * w)

        @pl.when(kk == nk - 1)
        def _():
            h = acc_hi[:]
            l = acc_lo[:]
            s = h + l                   # renormalize: |lo| <= ulp(hi)/2
            hi_ref[:] = s
            lo_ref[:] = l - (s - h)
    return kernel


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def mm_groups_f32pair(As, Bs, *, bm: int = None, bn: int = None,
                      bk: int = None):
    """Group-weighted slice-product sum as an exact f32 (hi, lo) pair.

    ``As (S, m, k)`` int8 row slices of A (from ``ozaki.split_rows``),
    ``Bs (S, n, k)`` int8 column slices of B (from ``split_rows(B.T)``).
    Returns ``(hi, lo)`` f32 ``(m, n)`` with
    ``hi + lo = sum_g 2^{-7(g+2)} * sum_{s+t=g} As[s] . Bs[t]^T`` to ~48
    mantissa bits. The caller applies the f64 row/column scales.
    """
    assert As.dtype == jnp.int8 and Bs.dtype == jnp.int8
    S, m, k = As.shape
    S2, n, k2 = Bs.shape
    assert S == S2 and k == k2, (As.shape, Bs.shape)
    bm = bm or DEFAULT_BM
    bn = bn or DEFAULT_BN
    bk = bk or DEFAULT_BK
    # int8 min tile is (32, 128); clamp blocks for small problems
    bm_ = min(bm, _round_up(m, 128))
    bn_ = min(bn, _round_up(n, 128))
    bk_ = min(bk, _round_up(k, 128))
    mp, np_, kp = _round_up(m, bm_), _round_up(n, bn_), _round_up(k, bk_)
    if (mp, kp) != (m, k):
        As = jnp.pad(As, ((0, 0), (0, mp - m), (0, kp - k)))
    if (np_, kp) != (n, k):
        Bs = jnp.pad(Bs, ((0, 0), (0, np_ - n), (0, kp - k)))

    nk = kp // bk_
    grid = (mp // bm_, np_ // bn_, nk)
    pair_mults = S * (S + 1) // 2
    hi, lo = pallas_call_x32(
        _make_kernel(S, nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, bm_, bk_), lambda i, j, kk: (0, i, kk)),
            pl.BlockSpec((S, bn_, bk_), lambda i, j, kk: (0, j, kk)),
        ],
        out_specs=[pl.BlockSpec((bm_, bn_), lambda i, j, kk: (i, j)),
                   pl.BlockSpec((bm_, bn_), lambda i, j, kk: (i, j))],
        out_shape=[out_struct((mp, np_), jnp.float32, As, Bs),
                   out_struct((mp, np_), jnp.float32, As, Bs)],
        scratch_shapes=[pltpu.VMEM((bm_, bn_), jnp.float32),
                        pltpu.VMEM((bm_, bn_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp * pair_mults,
            bytes_accessed=S * (mp * kp + np_ * kp) + 8 * mp * np_,
            transcendentals=0),
        interpret=config.pallas_interpret(),
    )(As, Bs)
    if (mp, np_) != (m, n):
        hi = hi[:m, :n]
        lo = lo[:m, :n]
    return hi, lo
