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
from cholesky_tpu.utils.vma import out_struct
from cholesky_tpu.utils.pallas_x32 import pallas_call as pallas_call_x32

LEAF_N = 128  # default diagonal-block size (the reference's nb=64 analog)

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
        # pin loop indices to int32: under x64 fori_loop carries int64 and
        # Mosaic's convert-element-type lowering recurses forever on it
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
            bad = ~(d2 > 0.0)   # NaN-safe: flags NaN pivots like the
            # reference's `aii <= zero || isnan(aii)` (spotrf.c:47-51)
            alive = info == 0
            info = jnp.where(bad & alive, j + 1, info)
            d = jnp.sqrt(jnp.where(bad, 1.0, d2))
            newcol = jnp.where(rcol == j, d,
                               jnp.where(rcol > j, col / d, 0.0))
            Pn = jnp.where(colsp == jj, newcol, P)
            # newcol's panel-row segment as a (1, PANEL) row: masked
            # diagonal reduction (Mosaic has no cheap (n,1)→(1,n) transpose)
            rowv = jnp.sum(jnp.where(rowsp == colsp + base, newcol, 0.0),
                           axis=0, keepdims=True)
            upd = lax.dot_general(newcol, rowv, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=lax.Precision.HIGHEST)
            Pn = jnp.where(colsp > jj, Pn - upd, Pn)
            # reference spotf2 BREAKS at a failed pivot (spotrf.c:47-51):
            # freeze the sweep so clamped garbage cannot compound
            P = jnp.where(alive & ~bad, Pn, P)
            return P, info

        P, info = lax.fori_loop(jnp.int32(0), jnp.int32(panel), col_body,
                                (P, info))
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
        # trailing update is skipped past a failure (break semantics)
        o_ref[:] = jnp.where(in_panel, PS,
                             jnp.where((info == 0) & (cols >= base + panel),
                                       o_ref[:] - G, o_ref[:]))
        return info

    if n <= panel:
        info = panel_body(jnp.int32(0), jnp.int32(0))
    else:
        # int32 bounds keep the induction variable int32 — under x64 an
        # int64 index reaches Mosaic's convert lowering, which recurses
        info = lax.fori_loop(jnp.int32(0), jnp.int32(n // panel), panel_body,
                             jnp.int32(0))
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
    L, info = pallas_call_x32(
        functools.partial(_potf2_kernel, n=n),
        out_shape=(out_struct((n, n), jnp.float32, A),
                   out_struct((1, 1), jnp.int32, A)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=config.pallas_interpret(),
    )(A)
    return L, info[0, 0]


def _trti2_unit_kernel(a_ref, o_ref, info_ref, *, n):
    """Single-level descending column sweep for the unit-diagonal case
    (rare path — the potrf/trtri fast paths use the non-unit panel kernel)."""
    rows, cols = _iota2(n)
    rcol = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    o_ref[:] = jnp.where(cols < rows, a_ref[:], 0.0)

    def body(i, info):
        j = n - 1 - i
        O = o_ref[:]
        col = _col_of(O, cols, j)
        colm = jnp.where(rcol > j, col, 0.0)
        # v = L₂₂⁻¹·x over the already-inverted trailing block (unit diag
        # contributes x itself)
        v = lax.dot_general(O, colm, _MATVEC,
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST) + colm
        newcol = jnp.where(rcol > j, -v, 0.0)
        o_ref[:] = jnp.where(cols == j, newcol, O)
        return info

    info = lax.fori_loop(jnp.int32(0), jnp.int32(n), body, jnp.int32(0))
    # unit diagonal is implicit; LAPACK leaves diagonal entries untouched
    o_ref[:] = jnp.where(rows == cols, a_ref[:], o_ref[:])
    info_ref[0, 0] = info


def _trti2_kernel(a_ref, o_ref, info_ref, *, n):
    """Two-level in-VMEM lower triangular inverse (non-unit), descending
    128-wide panels: per panel, ONE MXU op folds the already-inverted
    trailing columns into all panel columns at once, and the in-panel
    descending sweep handles only panel-local terms — the panel analog of
    the reference's stpti2 packed kernel (strtri.cu:36-141)."""
    panel = n if n < PANEL else PANEL
    npanels = max(1, n // panel)
    rows, cols = _iota2(n)
    rcol = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    rowsp = lax.broadcasted_iota(jnp.int32, (n, panel), 0)
    colsp = lax.broadcasted_iota(jnp.int32, (n, panel), 1)
    o_ref[:] = jnp.where(cols <= rows, a_ref[:], 0.0)

    def panel_body(ip, info):
        base = (npanels - 1 - ip) * panel
        S = (rowsp == colsp + base).astype(jnp.float32)
        O = o_ref[:]
        Cp = lax.dot_general(O, S, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)  # original L cols
        # beyond-panel fold: T2[:, c] = Σ_{k>base+panel-1} W[:,k]·L[k, base+c]
        Ok = jnp.where(cols > base + panel - 1, O, 0.0)
        Cpm = jnp.where(rowsp > base + panel - 1, Cp, 0.0)
        T2 = lax.dot_general(Ok, Cpm, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)  # (n, panel)

        def col_body(ii, carry):
            P, info = carry
            jj = panel - 1 - ii
            j = base + jj
            col = jnp.sum(jnp.where(colsp == jj, Cp, 0.0), axis=1,
                          keepdims=True)
            d = jnp.sum(jnp.where(rcol == j, col, 0.0))
            bad = d == 0.0
            info = jnp.where(bad & (info == 0), j + 1, info)
            dinv = 1.0 / jnp.where(bad, 1.0, d)
            colm = jnp.where(rcol > j, col, 0.0)
            # in-panel row segment of colm as a (1, panel) row
            colseg = jnp.sum(jnp.where(rowsp == colsp + base, colm, 0.0),
                             axis=0, keepdims=True)
            # (n,128)·(1,128)ᵀ as multiply+lane-reduce — Mosaic rejects the
            # dot_general form ("only constant accumulators supported")
            v = jnp.sum(P * colseg, axis=1, keepdims=True)
            v = v + jnp.sum(jnp.where(colsp == jj, T2, 0.0), axis=1,
                            keepdims=True)
            newcol = jnp.where(rcol == j, dinv,
                               jnp.where(rcol > j, -dinv * v, 0.0))
            P = jnp.where(colsp == jj, newcol, P)
            return P, info

        P0 = jnp.zeros((n, panel), jnp.float32)
        P, info = lax.fori_loop(jnp.int32(0), jnp.int32(panel), col_body,
                                (P0, info))
        PS = lax.dot_general(P, S, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)
        in_panel = (cols >= base) & (cols < base + panel)
        o_ref[:] = jnp.where(in_panel, PS, o_ref[:])
        return info

    if npanels == 1:
        info = panel_body(jnp.int32(0), jnp.int32(0))
    else:
        info = lax.fori_loop(jnp.int32(0), jnp.int32(npanels), panel_body,
                             jnp.int32(0))
    info_ref[0, 0] = info


@functools.partial(jax.jit, static_argnames=("unit",))
def trti2_f32(A, *, unit: bool = False):
    """Inverse of one lower-triangular leaf block; returns (T, info).
    Strict upper triangle of the output is zeroed; with ``unit`` the
    diagonal entries pass through untouched (LAPACK xtrti2 contract)."""
    n = A.shape[0]
    assert A.shape == (n, n) and A.dtype == jnp.float32
    assert n <= PANEL or n % PANEL == 0, \
        f"trti2_f32 leaf size {n} must be <= {PANEL} or a multiple of it"
    kernel = functools.partial(_trti2_unit_kernel, n=n) if unit \
        else functools.partial(_trti2_kernel, n=n)
    T, info = pallas_call_x32(
        kernel,
        out_shape=(out_struct((n, n), jnp.float32, A),
                   out_struct((1, 1), jnp.int32, A)),
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
    return pallas_call_x32(
        functools.partial(_lauu2_kernel, n=n),
        out_shape=out_struct((n, n), jnp.float32, A),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=config.pallas_interpret(),
    )(A)
