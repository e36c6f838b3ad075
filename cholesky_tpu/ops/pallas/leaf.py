"""In-VMEM leaf kernels: potf2, trti2, lauu2 on a single diagonal block.

Rebuild of the reference's device-side diagonal-block kernels:
- potf2_f32   ← spotf2/spptf2 packed-shared-memory Cholesky
                (reference lapack/spotrf.cu:26-107,115-178)
- trti2_f32   ← stpti2/strti2 packed triangular inverse
                (reference lapack/strtri.cu:36-141)
- lauu2_f32   ← cuSlauu2 single-block kernel (reference lapack/slauum.c:131-152)

The reference packs the triangle into shared memory to fit 64×64 blocks in
16 KB; VMEM is ~16 MB so blocks live unpacked and the packing trick is
unnecessary — the design constraint it served (fit the diagonal block
on-chip) is met directly.

Mosaic cannot dynamically slice the lane (last) dimension except at
multiples of 128, so the column sweeps are written as masked full-block
VPU ops: column extraction is a masked lane-reduction, the rank-1 trailing
update is a dot_general outer product, and the column write is a masked
select. Each sweep step is O(n²) VPU work — same asymptotics as the
reference's one-column-per-thread shared-memory sweep.

``info`` is produced in SMEM, the traced analog of the reference kernels
writing info to global memory (spotrf.cu:145-147).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cholesky_tpu import config

LEAF_N = 128  # default diagonal-block size (the reference's nb=64 analog)

_OUTER = (((1,), (1,)), ((), ()))   # (n,1)·(n,1) → (n,n) outer product
_MATVEC = (((1,), (0,)), ((), ()))  # (n,n)·(n,1) → (n,1)


def _iota2(n):
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return rows, cols


def _col_of(O, cols, j):
    """Extract column j of O as an (n, 1) vector via masked lane-reduction."""
    return jnp.sum(jnp.where(cols == j, O, 0.0), axis=1, keepdims=True)


PANEL = 128  # lane-aligned panel width (Mosaic can slice lanes at ×128)


def _potf2_kernel(a_ref, o_ref, info_ref, *, n):
    """Two-level in-VMEM Cholesky: 128-wide panel column sweeps (VPU) + one
    rank-128 MXU trailing update per panel. The panel split is what the
    reference's spptf2 packed-shared-memory kernel achieves with its 64-wide
    thread block (spotrf.cu:26-107) — here the panel is the lane width."""
    panel = n if n < PANEL else PANEL       # small leaves: single panel
    rows, cols = _iota2(n)
    # build small index arrays directly — Mosaic's layout pass crashes on
    # static slices of iotas (vector_extract_strided_slice) for n > 128
    rcol = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    rowsp = lax.broadcasted_iota(jnp.int32, (n, panel), 0)
    colsp = lax.broadcasted_iota(jnp.int32, (n, panel), 1)
    o_ref[:] = a_ref[:]

    def panel_body(jp, info):
        base = jp * panel
        # Mosaic crashes on dynamic lane-dim slices (even 128-aligned), so
        # the panel is gathered/scattered with an exact 0/1 selector matmul:
        # S[r, c] = 1 iff r == base + c  ⇒  O·S = O[:, base:base+PANEL].
        S = (rowsp == colsp + base).astype(jnp.float32)
        O = o_ref[:]
        P = lax.dot_general(O, S, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)

        def col_body(jj, carry):
            P, info = carry
            j = base + jj                   # global pivot row
            col = jnp.sum(jnp.where(colsp == jj, P, 0.0), axis=1,
                          keepdims=True)
            d2 = jnp.sum(jnp.where(rcol == j, col, 0.0))
            bad = d2 <= 0.0
            info = jnp.where(bad & (info == 0), j + 1, info)
            d = jnp.sqrt(jnp.where(bad, 1.0, d2))
            newcol = jnp.where(rcol == j, d,
                               jnp.where(rcol > j, col / d, 0.0))
            P = jnp.where(colsp == jj, newcol, P)
            # newcol's panel-row segment as a (1, PANEL) row: masked
            # diagonal reduction (Mosaic has no cheap (n,1)→(1,n) transpose)
            rowv = jnp.sum(jnp.where(rowsp == colsp + base, newcol, 0.0),
                           axis=0, keepdims=True)
            upd = lax.dot_general(newcol, rowv, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=lax.Precision.HIGHEST)
            P = jnp.where(colsp > jj, P - upd, P)
            return P, info

        P, info = lax.fori_loop(0, panel, col_body, (P, info))
        # scatter the panel back: (P·Sᵀ)[r, c] = P[r, c−base] inside the
        # panel's columns, 0 elsewhere
        PS = lax.dot_general(P, S, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)
        in_panel = (cols >= base) & (cols < base + panel)
        # rank-`panel` trailing update on the MXU:
        # A[:, base+P:] -= L₂·L₂ᵀ with L₂ = panel rows below the pivot block
        Lpan = jnp.where(rowsp >= base + panel, P, 0.0)
        G = lax.dot_general(Lpan, Lpan, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        o_ref[:] = jnp.where(in_panel, PS,
                             jnp.where(cols >= base + panel,
                                       o_ref[:] - G, o_ref[:]))
        return info

    if n <= panel:
        info = panel_body(0, jnp.int32(0))
    else:
        info = lax.fori_loop(0, n // panel, panel_body, jnp.int32(0))
    # zero the strict upper triangle (driver contract)
    o_ref[:] = jnp.where(cols > rows, 0.0, o_ref[:])
    info_ref[0, 0] = info


@jax.jit
def potf2_f32(A):
    """Lower Cholesky of one leaf block; returns (L, info). The strict upper
    triangle of the output is zeroed."""
    n = A.shape[0]
    assert A.shape == (n, n) and A.dtype == jnp.float32
    assert n <= PANEL or n % PANEL == 0, \
        f"potf2_f32 leaf size {n} must be <= {PANEL} or a multiple of it"
    L, info = pl.pallas_call(
        functools.partial(_potf2_kernel, n=n),
        out_shape=(jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=config.pallas_interpret(),
    )(A)
    return L, info[0, 0]


def _trti2_kernel(a_ref, o_ref, info_ref, *, n, unit):
    rows, cols = _iota2(n)
    rcol = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    # keep only the (strict, if unit) lower triangle; junk above must not
    # pollute the column sweeps
    if unit:
        o_ref[:] = jnp.where(cols < rows, a_ref[:], 0.0)
    else:
        o_ref[:] = jnp.where(cols <= rows, a_ref[:], 0.0)

    def body(i, info):
        j = n - 1 - i
        O = o_ref[:]
        col = _col_of(O, cols, j)
        colm = jnp.where(rcol > j, col, 0.0)
        if unit:
            dinv = jnp.float32(1.0)
        else:
            d = jnp.sum(jnp.where(rcol == j, col, 0.0))
            bad = d == 0.0
            info = jnp.where(bad & (info == 0), j + 1, info)
            dinv = 1.0 / jnp.where(bad, 1.0, d)
        # v = L₂₂⁻¹·x over the already-inverted trailing block
        v = lax.dot_general(O, colm, _MATVEC,
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        if unit:
            v = v + colm
        newcol = jnp.where(rcol == j,
                           jnp.float32(0.0) if unit else dinv,
                           jnp.where(rcol > j, -dinv * v, 0.0))
        o_ref[:] = jnp.where(cols == j, newcol, O)
        return info

    info = lax.fori_loop(0, n, body, jnp.int32(0))
    if unit:
        # unit diagonal is implicit; LAPACK leaves diagonal entries untouched
        o_ref[:] = jnp.where(rows == cols, a_ref[:], o_ref[:])
    info_ref[0, 0] = info


@functools.partial(jax.jit, static_argnames=("unit",))
def trti2_f32(A, *, unit: bool = False):
    """Inverse of one lower-triangular leaf block; returns (T, info).
    Strict upper triangle of the output is zeroed; with ``unit`` the
    diagonal entries pass through untouched (LAPACK xtrti2 contract)."""
    n = A.shape[0]
    assert A.shape == (n, n) and A.dtype == jnp.float32
    T, info = pl.pallas_call(
        functools.partial(_trti2_kernel, n=n, unit=unit),
        out_shape=(jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=config.pallas_interpret(),
    )(A)
    return T, info[0, 0]


def _lauu2_kernel(a_ref, o_ref, *, n):
    rows, cols = _iota2(n)
    L = jnp.where(cols <= rows, a_ref[:], 0.0)
    # Lᵀ·L on the MXU (lower-lauum semantics), lower triangle stored,
    # strict upper passes the input through.
    P = lax.dot_general(L, L, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
    o_ref[:] = jnp.where(cols <= rows, P, a_ref[:])


@jax.jit
def lauu2_f32(A):
    """Lᵀ·L of one lower-triangular leaf block (lower triangle of the
    result; strict upper passes through)."""
    n = A.shape[0]
    assert A.shape == (n, n) and A.dtype == jnp.float32
    return pl.pallas_call(
        functools.partial(_lauu2_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=config.pallas_interpret(),
    )(A)
