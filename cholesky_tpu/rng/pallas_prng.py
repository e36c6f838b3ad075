"""On-device bulk random fills: a Pallas kernel over the TPU hardware PRNG.

Rebuild of the reference's GPU MTGP32/64 generators (reference rng/mtgp32.cu
kernels + rng/mtgp32.c:1-117 host drivers + 11k-line parameter tables): the
role — filling large device buffers with uniform floats without host
round-trips — is played by the TPU per-core PRNG (pltpu.prng_seed /
prng_random_bits) inside a grid kernel; the Mersenne parameter tables have
no TPU analog and are not needed (counter/seed-based hardware generator).

The four interval variants of the reference's rng.h:21-101 are supported via
the same transforms as rng/generators.py. Off-TPU (the CPU test mesh) the
hardware PRNG does not exist even in interpret mode, so a threefry fallback
with identical interval semantics is used — the sequential-runtime analog.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cholesky_tpu import config
from cholesky_tpu.utils.vma import out_struct
from cholesky_tpu.utils.pallas_x32 import pallas_call as pallas_call_x32
from cholesky_tpu.rng.generators import Interval, uniform as _threefry_uniform

_ROWS_PER_BLOCK = 256


def _mix_seeds(seed, n: int, salt: int = 0):
    """n decorrelated per-block seeds from (seed, block index, salt) via a
    splitmix32-style finalizer. The former additive scheme (seed + i) made
    chunk i of seed s identical to chunk i-1 of seed s+1 — fills from
    adjacent base seeds shared whole row blocks (ADVICE r2). The hash
    makes distinct (seed, i, salt) triples land on unrelated streams."""
    z = (jnp.asarray(seed, jnp.uint32) ^ jnp.uint32(salt)) \
        + (1 + jnp.arange(n, dtype=jnp.uint32)) * jnp.uint32(0x9E3779B9)
    z = (z ^ (z >> 16)) * jnp.uint32(0x7FEB352D)
    z = (z ^ (z >> 15)) * jnp.uint32(0x846CA68B)
    z = z ^ (z >> 16)
    return jax.lax.bitcast_convert_type(z, jnp.int32)


def _fill_kernel(seed_ref, o_ref):
    # decorrelate grid blocks: per-block seed hashed host-side (_mix_seeds)
    pltpu.prng_seed(seed_ref[pl.program_id(0)])
    # prng_random_bits yields int32 on this toolchain — bitcast to uint32
    # before shifting, or the arithmetic shift smears the sign bit into the
    # exponent (NaNs)
    bits = pltpu.bitcast(pltpu.prng_random_bits(o_ref.shape), jnp.uint32)
    # uint32 → [1, 2) via mantissa stuffing, then subtract 1 → [0, 1)
    f = pltpu.bitcast(jnp.uint32(0x3F800000) | (bits >> 9), jnp.float32)
    o_ref[:] = f - 1.0


@functools.partial(jax.jit, static_argnames=("shape", "interval"))
def uniform_device(seed: int, shape, interval=Interval.HALF_OPEN_01):
    """Uniform f32 fill of ``shape`` (2-D) using the on-chip PRNG.
    Deterministic in (seed, shape). Interval semantics per rng.h variants."""
    interval = Interval(interval)
    if config.pallas_interpret():
        # no hardware PRNG off-TPU; threefry fallback with same contract
        return _threefry_uniform(jax.random.PRNGKey(seed), shape,
                                 jnp.float32, interval)
    rows, cols = shape
    rp = min(_ROWS_PER_BLOCK, -(-rows // 8) * 8)
    rows_p = -(-rows // rp) * rp
    cols_p = -(-cols // 128) * 128
    u = pallas_call_x32(
        _fill_kernel,
        grid=(rows_p // rp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rp, cols_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((rows_p, cols_p), jnp.float32, seed),
    )(_mix_seeds(seed, rows_p // rp))
    u = u[:rows, :cols]
    eps = jnp.finfo(jnp.float32).eps
    if interval == Interval.HALF_OPEN_01:
        return u
    if interval == Interval.HALF_OPEN_10:
        return 1.0 - u
    if interval == Interval.CLOSED:
        return u / (1.0 - eps)
    return u * (1.0 - eps) + eps


def _fill_kernel64(seed_ref, hi_ref, lo_ref):
    """Two decorrelated uint32 planes — the raw material for a 53-bit f64
    mantissa, combined OUTSIDE the kernel (Mosaic has no f64 or int64;
    CLAUDE.md rule 3/4). GRID-FREE on purpose: under x64 the pallas grid
    index machinery itself goes int64 and crashes the Mosaic compiler, so
    callers chunk at the XLA level with one kernel call per row block."""
    pltpu.prng_seed(seed_ref[0])
    bh = pltpu.bitcast(pltpu.prng_random_bits(hi_ref.shape), jnp.uint32)
    bl = pltpu.bitcast(pltpu.prng_random_bits(lo_ref.shape), jnp.uint32)
    # stash as int32 views; sign handling happens in the f64 combine
    hi_ref[:] = pltpu.bitcast(bh, jnp.int32)
    lo_ref[:] = pltpu.bitcast(bl, jnp.int32)


@functools.partial(jax.jit, static_argnames=("shape", "interval"))
def uniform_device64(seed: int, shape, interval=Interval.HALF_OPEN_01):
    """Uniform f64 fill of ``shape`` (2-D) with full 53-bit resolution —
    the rng64/MTGP64 tier of the reference (rng.h:131-235, rng/mtgp64.cu):
    the kernel produces two uint32 planes on the hardware PRNG; the f64
    combine u = (hi·2³² + lo) ∈ [0, 2⁶⁴) scaled by 2⁻⁶⁴ runs in XLA's
    emulated f64 outside the kernel (Mosaic has no int64/f64). Requires
    x64 mode. Off-TPU falls back to threefry with the same contract."""
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "uniform_device64 requires x64 mode (jax_enable_x64): without "
            "it the f64 combine silently degrades to f32 and the 53-bit "
            "construction can round to exactly 1.0, violating [0, 1)")
    interval = Interval(interval)
    if config.pallas_interpret():
        return _threefry_uniform(jax.random.PRNGKey(seed), shape,
                                 jnp.float64, interval)
    rows, cols = shape
    rp = min(_ROWS_PER_BLOCK, -(-rows // 8) * 8)
    rows_p = -(-rows // rp) * rp
    cols_p = -(-cols // 128) * 128
    call = pallas_call_x32(
        _fill_kernel64,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(out_struct((rp, cols_p), jnp.int32, seed),
                   out_struct((rp, cols_p), jnp.int32, seed)),
    )
    # one grid-free kernel per row chunk (see _fill_kernel64 docstring),
    # chunk seeds hashed (salt separates the 64-bit family from the f32
    # fills of uniform_device)
    seeds = _mix_seeds(seed, rows_p // rp, salt=0x64646464)
    his, los = zip(*(call(seeds[i:i + 1])
                     for i in range(rows_p // rp)))
    hi = jnp.concatenate(his, axis=0)[:rows, :cols]
    lo = jnp.concatenate(los, axis=0)[:rows, :cols]
    # int32 → [0, 2³²) exactly, in f64 (no int64 anywhere on this TPU)
    fh = hi.astype(jnp.float64) + jnp.where(hi < 0, 2.0 ** 32, 0.0)
    fl = lo.astype(jnp.float64) + jnp.where(lo < 0, 2.0 ** 32, 0.0)
    # EXACT 53-bit construction: hi·2²¹ + ⌊lo/2¹¹⌋ ≤ 2⁵³−1 is exactly
    # representable, so u < 1 strictly — the naive (hi·2³² + lo)·2⁻⁶⁴
    # can round up to 2⁶⁴ and return exactly 1.0, violating [0, 1)
    u = (fh * (2.0 ** 21) + jnp.floor(fl * (2.0 ** -11))) * (2.0 ** -53)
    eps = jnp.finfo(jnp.float64).eps
    if interval == Interval.HALF_OPEN_01:
        return u
    if interval == Interval.HALF_OPEN_10:
        return 1.0 - u
    if interval == Interval.CLOSED:
        return u / (1.0 - eps)
    return u * (1.0 - eps) + eps
