"""Whole-factorization in-VMEM mega-kernels (the MXU-era spotfimm2).

The reference fuses the diagonal-block factorization with the trailing
update in one grid (`spotfimm2`, reference lapack/spotrf.cu:200-318) to cut
kernel-launch count; these kernels take the idea to its TPU limit: the
ENTIRE factorization of an n ≤ 1024 matrix runs as ONE Pallas kernel with
the matrix resident in VMEM — zero per-step dispatch, every panel solve and
trailing update on the MXU.

Design (vs the round-1 leaf kernels in ops/pallas/leaf.py):
- ROW panels, not column panels. Mosaic allows dynamic SUBLANE (row)
  slices; only the lane (column) dimension is restricted. Working on the
  UPPER factor of a symmetric input makes every panel extraction and
  write-back a free `o_ref[pl.ds(base, 128), :]` — the round-1 kernels
  spent two n×128×n selector matmuls per panel on gather/scatter.
- The per-column sweeps run on the 128×128 DIAGONAL TILE only (the
  round-1 kernels swept full (n, 128) panel columns): O(nb³) VPU work per
  panel instead of O(n·nb²).
- The panel solve is ONE MXU op: factor the tile T = L_t·L_tᵀ, invert
  L_t in-tile, then U_panel = L_t⁻¹·P — the diagonal-inverse trick
  (reference hybridSpotrf spotrf.c:252-256) applied inside the kernel.
- ONE masked MXU trailing update per panel: A -= U_panelᵀ·U_panel on
  rows below the panel.

MXU flops ≈ 2n³ + O(n²·nb) vs n³/3 useful — the 6× overhead is the price
of static shapes, paid at full MXU rate; VPU cost is O(n·nb²). At n=1024
this is ~20× less VPU work and ~3× less MXU work than the round-1
two-level kernel.

The kernel factors the UPPER form (input must be symmetric-full); the f32
wrapper transposes at the XLA level (cheap HBM copy) so the public
contract stays lower-Cholesky like the leaf kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cholesky_tpu import config

NB = 128            # panel width = lane width
MAX_N = 1024        # VMEM budget: in + out + 2 panels ≈ 10 MB at 1024

_MATVEC = (((1,), (0,)), ((), ()))


def _chol_tile(T, base, info, rows_t, cols_t, rcol_t, nb=NB):
    """Lower Cholesky of a symmetric 128×128 tile by column sweep (VPU).
    Returns (L_t, info); failed pivots clamp to 1 and set info to the
    1-based GLOBAL index (base + j + 1)."""

    def body(j, carry):
        T, info = carry
        col = jnp.sum(jnp.where(cols_t == j, T, 0.0), axis=1, keepdims=True)
        d2 = jnp.sum(jnp.where(rcol_t == j, col, 0.0))
        bad = ~(d2 > 0.0)            # NaN-safe (reference spotrf.c:47-51)
        info = jnp.where(bad & (info == 0), base + j + 1, info)
        d = jnp.sqrt(jnp.where(bad, 1.0, d2))
        newcol = jnp.where(rcol_t == j, d,
                           jnp.where(rcol_t > j, col / d, 0.0))
        T = jnp.where(cols_t == j, newcol, T)
        rowv = jnp.sum(jnp.where(rows_t == cols_t, newcol, 0.0),
                       axis=0, keepdims=True)         # newcolᵀ (1, 128)
        upd = lax.dot_general(newcol, rowv, _MATVEC,
                              preferred_element_type=jnp.float32,
                              precision=lax.Precision.HIGHEST)
        T = jnp.where(cols_t > j, T - upd, T)
        return T, info

    return lax.fori_loop(jnp.int32(0), jnp.int32(nb), body, (T, info))


def _trti2_tile(Lt, base, info, cols_t, rcol_t, nb=NB):
    """Inverse of a lower-triangular 128×128 tile by descending column
    sweep (VPU): W[:, j] = −(W[:, >j]·L[>j, j])/L[j,j], diag 1/L[j,j]
    (the W·L = I recursion, reference stpti2 strtri.cu:36-141)."""

    def body(ii, carry):
        W, info = carry
        j = nb - 1 - ii
        col = jnp.sum(jnp.where(cols_t == j, Lt, 0.0), axis=1,
                      keepdims=True)
        d = jnp.sum(jnp.where(rcol_t == j, col, 0.0))
        bad = d == 0.0
        info = jnp.where(bad & (info == 0), base + j + 1, info)
        dinv = 1.0 / jnp.where(bad, 1.0, d)
        colm = jnp.where(rcol_t > j, col, 0.0)
        v = lax.dot_general(W, colm, _MATVEC,
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        newcol = jnp.where(rcol_t == j, dinv,
                           jnp.where(rcol_t > j, -dinv * v, 0.0))
        W = jnp.where(cols_t == j, newcol, W)
        return W, info

    W0 = jnp.zeros((nb, nb), jnp.float32)
    return lax.fori_loop(jnp.int32(0), jnp.int32(nb), body, (W0, info))


def _potrf_vmem_kernel(a_ref, o_ref, info_ref, *, n):
    """U = upper Cholesky factor of the symmetric-full input; strict lower
    zeroed. One fori_loop over 128-row panels; see module docstring."""
    nb = n if n < NB else NB
    rows_t = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols_t = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    rcol_t = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    rows_s = lax.broadcasted_iota(jnp.int32, (n, nb), 0)
    cols_s = lax.broadcasted_iota(jnp.int32, (n, nb), 1)
    colsp = lax.broadcasted_iota(jnp.int32, (nb, n), 1)
    # (n, 1) row-index vector; broadcast in comparisons instead of
    # materializing (n, n) iotas (VMEM budget: round-1's leaf kernel OOMed
    # scoped vmem at n=1024 from exactly such (n,n) index temporaries)
    rows_n1 = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def panel(jp, info):
        base = jp * nb
        # first panel reads the (aliased) input; later panels read rows
        # updated in place
        P = o_ref[pl.ds(base, nb), :]                 # free sublane slice
        # diagonal tile T[i, c] = P[i, base + c] via a selector matmul
        # (the LANE dim cannot be dynamically sliced)
        S = (rows_s == cols_s + base).astype(jnp.float32)
        T = lax.dot_general(P, S, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        Lt, info = _chol_tile(T, base, info, rows_t, cols_t, rcol_t, nb)
        Wt, info = _trti2_tile(Lt, base, info, cols_t, rcol_t, nb)
        # panel solve on the MXU: rows = L_t⁻¹·P; the tile columns land
        # exactly on L_tᵀ, dead columns (< base) are masked off
        U = lax.dot_general(Wt, P, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        U = jnp.where(colsp >= base, U, 0.0)
        o_ref[pl.ds(base, nb), :] = U

        @pl.when(base + nb < n)
        def _():
            # masked MXU trailing update: A[i, j] -= Σ_k U[k,i]·U[k,j]
            # for rows below the panel (dead columns there are never read)
            G = lax.dot_general(U, U, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)
            o_ref[:] = jnp.where(rows_n1 > base + nb - 1,
                                 o_ref[:] - G, o_ref[:])

        return info

    o_ref[:] = a_ref[:]      # self-copy when aliased; real copy otherwise
    if n <= NB:
        info = panel(jnp.int32(0), jnp.int32(0))
    else:
        info = lax.fori_loop(jnp.int32(0), jnp.int32(n // nb), panel,
                             jnp.int32(0))
    # exact zeros below the diagonal (panel solves leave O(eps) noise in
    # the tile's sub-diagonal region); (n,1) vs (1,n) comparisons broadcast
    # without an (n,n) index temporary
    cols_1n = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    o_ref[:] = jnp.where(rows_n1 > cols_1n, 0.0, o_ref[:])
    info_ref[0, 0] = info


@jax.jit
def potrf_vmem_f32(A):
    """Whole-matrix lower Cholesky in ONE kernel; returns (L, info) with
    the strict upper triangle zeroed. Only the lower triangle of ``A`` is
    read. n ≤ 1024, n ≤ 128 or n % 128 == 0.

    This is the library's `spotfimm2` analog (reference
    lapack/spotrf.cu:200-318): the entire factorization — every diagonal
    tile, panel solve, and trailing update — is fused into a single
    dispatch with the matrix VMEM-resident."""
    n = A.shape[0]
    assert A.shape == (n, n) and A.dtype == jnp.float32
    assert n <= MAX_N, f"potrf_vmem_f32 holds the matrix in VMEM: n={n} > {MAX_N}"
    assert n <= NB or n % NB == 0, \
        f"n={n} must be <= {NB} or a multiple of it"
    # upper-form kernel ⇔ lower contract: symmetrize + transpose at the
    # XLA level (cheap HBM-side copies, fused where possible)
    Afull = jnp.tril(A) + jnp.tril(A, -1).T
    U, info = pl.pallas_call(
        functools.partial(_potrf_vmem_kernel, n=n),
        out_shape=(jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        # factor in place: halves the VMEM footprint (n=1024 with separate
        # in/out buffers + the (n,n) trailing product exceeds the 16 MB
        # scoped-vmem limit)
        input_output_aliases={0: 0},
        interpret=config.pallas_interpret(),
    )(Afull)
    return U.T, info[0, 0]


def _trtri_vmem_kernel(a_ref, o_ref, info_ref, *, n):
    """W = inverse of the lower-triangular input, built bottom-up in row
    panels of the TRANSPOSED (upper) form: with V = Wᵀ = (Lᵀ)⁻¹ upper,
    ascending-from-the-bottom row panels of V satisfy
        V[panel, panel] = (L_tᵀ)⁻¹,
        V[panel, cols > end] = −(L_tᵀ)⁻¹ · Aᵀ[panel, > end] · V[> end]
    so each panel is one tile inverse (VPU) + two MXU matmuls. Input is
    the TRANSPOSE of the lower factor (an upper matrix); output is V; the
    wrapper transposes both sides."""
    nb = n if n < NB else NB
    cols_t = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    rcol_t = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    rows_s = lax.broadcasted_iota(jnp.int32, (n, nb), 0)
    cols_s = lax.broadcasted_iota(jnp.int32, (n, nb), 1)
    colsp = lax.broadcasted_iota(jnp.int32, (nb, n), 1)
    npanels = max(1, n // nb)
    # in-place (aliased input): rows above the current panel still hold
    # the ORIGINAL upper matrix, rows at/below hold the inverse already
    # built bottom-up; stale rows never contribute (P's dead columns are
    # masked before the fold), and every row is overwritten exactly once.

    def panel(ip, info):
        base = (npanels - 1 - ip) * nb
        P = a_ref[pl.ds(base, nb), :]                 # Aᵀ row panel (upper)
        S = (rows_s == cols_s + base).astype(jnp.float32)
        Tt = lax.dot_general(P, S, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)
        # Tt = (L tile)ᵀ — invert the LOWER tile Ttᵀ... the tile of Aᵀ is
        # upper; its transpose is the lower tile. Build it by a masked
        # swap: lower_tile[i,j] = Tt[j,i] via the diag-spread trick twice
        # is wasteful — instead invert the UPPER tile directly with the
        # ascending-column sweep (the mirror recursion of _trti2_tile).
        def body(ii, carry):
            W, info = carry
            j = ii
            col = jnp.sum(jnp.where(cols_t == j, Tt, 0.0), axis=1,
                          keepdims=True)
            d = jnp.sum(jnp.where(rcol_t == j, col, 0.0))
            bad = d == 0.0
            info = jnp.where(bad & (info == 0), base + j + 1, info)
            dinv = 1.0 / jnp.where(bad, 1.0, d)
            colm = jnp.where(rcol_t < j, col, 0.0)
            v = lax.dot_general(W, colm, _MATVEC,
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)
            newcol = jnp.where(rcol_t == j, dinv,
                               jnp.where(rcol_t < j, -dinv * v, 0.0))
            W = jnp.where(cols_t == j, newcol, W)
            return W, info

        Wt, info = lax.fori_loop(jnp.int32(0), jnp.int32(nb), body,
                                 (jnp.zeros((nb, nb), jnp.float32), info))
        # beyond-panel fold: V[panel, :] = −Wt·(P·V_trailing) + Wt on tile
        Vtrail = o_ref[:]                              # rows > base+127 set
        PV = lax.dot_general(jnp.where(colsp > base + nb - 1, P, 0.0),
                             Vtrail, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)
        row = -lax.dot_general(Wt, PV, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.HIGHEST)
        # tile columns: place Wt at columns [base, base+128)
        WtS = lax.dot_general(Wt, S, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=lax.Precision.HIGHEST)
        in_tile = (colsp >= base) & (colsp < base + nb)
        row = jnp.where(in_tile, WtS, jnp.where(colsp > base + nb - 1,
                                                row, 0.0))
        o_ref[pl.ds(base, nb), :] = row
        return info

    if npanels == 1:
        info = panel(jnp.int32(0), jnp.int32(0))
    else:
        info = lax.fori_loop(jnp.int32(0), jnp.int32(npanels), panel,
                             jnp.int32(0))
    info_ref[0, 0] = info


@jax.jit
def trtri_vmem_f32(A):
    """Whole-matrix lower-triangular inverse in ONE kernel; returns
    (W, info), strict upper zeroed. n ≤ 1024, n ≤ 128 or n % 128 == 0.
    Single-dispatch analog of the reference's strtimm2 fused kernel
    (reference lapack/strtri.cu:209+)."""
    n = A.shape[0]
    assert A.shape == (n, n) and A.dtype == jnp.float32
    assert n <= MAX_N
    assert n <= NB or n % NB == 0
    V, info = pl.pallas_call(
        functools.partial(_trtri_vmem_kernel, n=n),
        out_shape=(jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        input_output_aliases={0: 0},      # invert in place (VMEM budget)
        interpret=config.pallas_interpret(),
    )(jnp.tril(A).T)
    return V.T, info[0, 0]
