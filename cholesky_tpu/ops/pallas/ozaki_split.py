"""Fused int8 slice-peel kernel for the Ozaki f64 matmul (ops/ozaki.py).

The XLA formulation of the round-and-subtract peel materializes the
(rh, rl) working pair in HBM once per slice — ~17·S bytes of traffic per
element. Measured on-chip (2026-08-17): 1.18 ms per 2048² operand, which
DOMINATES the whole Ozaki matmul (the int8 MXU products take ~0.9 ms).
This kernel runs the entire S-round peel over a VMEM-resident block in one
pass: read 8 bytes, write S bytes per element — the d-tier analog of the
reference keeping its hi/lo double representation resident in shared
memory across the whole multiply (reference dgemm.cu:3-10).

Mosaic constraints honored (CLAUDE.md rule 3): no int64, no dynamic lane
slices. Originally grid-free (under x64 the grid index machinery itself
went int64 and crashed the Mosaic compiler — callers chunked at the XLA
level); utils/pallas_x32 now traces the grid machinery with x64 off, so
the peel is a plain 2D-parallel grid — the peel is purely elementwise, and
the XLA-level chunk calls + concatenate were costing ~15x the DMA bound
(r4 measured 0.3 ms per 1024^2 operand vs a ~20 us traffic floor).
"""

from __future__ import annotations

import functools

from cholesky_tpu.utils.vma import out_struct
from cholesky_tpu.utils.pallas_x32 import pallas_call as pallas_call_x32

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RADIX = 128.0

#: peel grid block (rows, cols): VMEM ≈ rb·cb·(8 in + S out + scratch)
#: bytes ≈ 4.5 MiB at S=6 — the peel is elementwise, so both axes are
#: fully parallel
_PEEL_RB, _PEEL_CB = 512, 512


def _make_peel_kernel(slices: int):
    def kernel(rh_ref, rl_ref, out_ref):
        rh = rh_ref[:]
        rl = rl_ref[:]
        for s in range(slices):
            q = jnp.round(rh * _RADIX)       # native f32 round, |q| ≤ 65
            out_ref[s, :, :] = q.astype(jnp.int8)
            d = rh * _RADIX - q              # |d| ≤ ½ ⇒ exact (Sterbenz)
            rlb = rl * _RADIX
            t = d + rlb                      # two-sum: new hi …
            rl = rlb - (t - d)               # … and its exact error term
            rh = t
    return kernel


@functools.partial(jax.jit, static_argnames=("slices",))
def peel_f32pair(rh, rl, *, slices: int):
    """int8 slices (S, m, k) of the exact pair value rh + rl, all S rounds
    fused in VMEM. Inputs must already be scaled into [-1/2, 1/2] (the
    caller applies the power-of-two row scale — exact in f32)."""
    assert rh.dtype == jnp.float32 and rl.dtype == jnp.float32
    from cholesky_tpu import config
    m, k = rh.shape
    rb = min(_PEEL_RB, max(8, -(-m // 8) * 8))
    cb = min(_PEEL_CB, max(128, -(-k // 128) * 128))
    mp, kp = -(-m // rb) * rb, -(-k // cb) * cb
    if (mp, kp) != (m, k):
        rh = jnp.pad(rh, ((0, mp - m), (0, kp - k)))
        rl = jnp.pad(rl, ((0, mp - m), (0, kp - k)))
    out = pallas_call_x32(
        _make_peel_kernel(slices),
        grid=(mp // rb, kp // cb),
        in_specs=[pl.BlockSpec((rb, cb), lambda i, j: (i, j)),
                  pl.BlockSpec((rb, cb), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((slices, rb, cb), lambda i, j: (0, i, j)),
        out_shape=out_struct((slices, mp, kp), jnp.int8, rh, rl),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=10 * slices * mp * kp,
            bytes_accessed=(8 + slices) * mp * kp, transcendentals=0),
        interpret=config.pallas_interpret(),
    )(rh, rl)
    return out[:, :m, :k]
