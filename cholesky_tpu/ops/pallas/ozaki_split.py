"""Fused int8 slice-peel kernel for the Ozaki f64 matmul (ops/ozaki.py).

The XLA formulation of the round-and-subtract peel materializes the
(rh, rl) working pair in HBM once per slice — ~17·S bytes of traffic per
element. Measured on-chip (2026-08-17): 1.18 ms per 2048² operand, which
DOMINATES the whole Ozaki matmul (the int8 MXU products take ~0.9 ms).
This kernel runs the entire S-round peel over a VMEM-resident block in one
pass: read 8 bytes, write S bytes per element — the d-tier analog of the
reference keeping its hi/lo double representation resident in shared
memory across the whole multiply (reference dgemm.cu:3-10).

Mosaic constraints honored (CLAUDE.md rule 3): GRID-FREE on purpose — the
d tier always runs under x64, where the pallas grid index machinery itself
goes int64 and crashes the Mosaic compiler; callers chunk at the XLA level
with one kernel call per row block (same workaround as
rng/pallas_prng._fill_kernel64). No int64, no dynamic lane slices.
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

#: elements per grid-free kernel call: block VMEM ≈ elems·(8 in + S out +
#: ~8 scratch) bytes → ≈ 5.5 MiB at S=6, comfortably inside VMEM
_ELEMS_PER_BLOCK = 256 * 1024


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
    m, k = rh.shape
    kp = -(-k // 128) * 128
    # rows per grid-free call: VMEM-bounded, sublane-aligned, ≥ 8
    rb = max(8, min(-(-m // 8) * 8, (_ELEMS_PER_BLOCK // max(kp, 1)) // 8 * 8))
    mp = -(-m // rb) * rb
    if (mp, kp) != (m, k):
        rh = jnp.pad(rh, ((0, mp - m), (0, kp - k)))
        rl = jnp.pad(rl, ((0, mp - m), (0, kp - k)))
    call = pallas_call_x32(
        _make_peel_kernel(slices),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_struct((slices, rb, kp), jnp.int8, rh, rl),
    )
    outs = [call(rh[r:r + rb], rl[r:r + rb]) for r in range(0, mp, rb)]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return out[:, :m, :k]
