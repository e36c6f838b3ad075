"""Distributed block-cyclic Cholesky over a mesh axis (shard_map SPMD).

TPU-native rebuild of the reference's multi-GPU tier
(reference cuMultiGPUSpotrf, lapack/spotrf.c:400-468): there, a host loop
tiled trailing updates into per-GPU task closures with an explicit
synchronize barrier before each CPU diagonal factor; here the whole
factorization is ONE compiled SPMD program per device:

  step j:   psum-broadcast the owner's diagonal block        (≈ the barrier
            + host diag factor, spotrf.c:428,450 — but every device factors
            the nb×nb block redundantly, cheaper than a broadcast round-trip)
            panel update via the diagonal-inverse trick      (hybridSpotrf's
            TRMM-by-inverse, spotrf.c:252-256)
            all_gather the panel column over ICI             (≈ the PCIe
            HtoD panel streaming, sgemm.c:280-302)
            local masked trailing SYRK on owned row blocks

Communication per step: one psum(nb²) + one all_gather(n·nb) — both ride
ICI; there is no host staging and no task queue (SURVEY.md §2.5 mapping).

The trailing update runs full-width with masking (static shapes under jit);
this wastes ≈2× FLOPs vs a shrinking update but keeps one shape per step —
the lookahead/width optimization is a later-round item.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from cholesky_tpu import config
from cholesky_tpu.ops import lapack_ref
from cholesky_tpu.parallel.blockcyclic import BlockCyclic, collect, distribute
from cholesky_tpu.types import Uplo, norm_uplo, is_complex, real_dtype


def _conj(x):
    return x.conj() if is_complex(x.dtype) else x


def _potrf_dist_body(local, *, nblk, nb, npad, axis, dtype):
    """shard_map body: local is (nlocal, nb, npad) on each device."""
    p = lax.axis_size(axis)
    me = lax.axis_index(axis)
    nlocal = local.shape[0]
    g = me + jnp.arange(nlocal, dtype=jnp.int32) * p      # global block ids
    gmask = g[:, None, None]

    def step(j, carry):
        local, info = carry
        owner = j % p
        lloc = j // p
        # --- diagonal block: owner's slab row lloc, columns j·nb.. ---
        dl = lax.dynamic_slice(local, (lloc, 0, j * nb), (1, nb, nb))[0]
        diag = lax.psum(jnp.where(me == owner, dl, jnp.zeros_like(dl)), axis)
        Ljj, linfo = lapack_ref.potf2(Uplo.LOWER, diag)
        Ljj = jnp.tril(Ljj)
        info = jnp.where((info == 0) & (linfo > 0),
                         linfo + j * nb, info).astype(jnp.int32)
        # inverse trick: panel TRSM → GEMM by L_jj⁻¹
        Tjj, _ = lapack_ref.trti2(Uplo.LOWER, "N", Ljj)
        Tjj = jnp.tril(Tjj)
        # --- panel: my row blocks i>j get A[i,j]·L_jj⁻ᴴ; block j gets L_jj ---
        col = lax.dynamic_slice(local, (0, 0, j * nb), (nlocal, nb, nb))
        newcol = jnp.einsum("lrk,ck->lrc", col, _conj(Tjj),
                            precision=config.matmul_precision)
        sel = jnp.where(gmask > j, newcol,
                        jnp.where(gmask == j, Ljj[None], col))
        local = lax.dynamic_update_slice(local, sel.astype(dtype),
                                         (0, 0, j * nb))
        # --- gather the panel column (zero for blocks ≤ j) over ICI ---
        contrib = jnp.where(gmask > j, newcol, jnp.zeros_like(newcol))
        gathered = lax.all_gather(contrib, axis)          # (p, nlocal, nb, nb)
        panel = gathered.transpose(1, 0, 2, 3).reshape(npad, nb)
        # --- masked trailing update on my row blocks:
        #     A[i, :] -= L[i,j] · panelᴴ   (columns ≤ j·nb are zero in panel)
        upd = jnp.einsum("lrt,ct->lrc", contrib, _conj(panel),
                         precision=config.matmul_precision)
        local = jnp.where(gmask > j, local - upd.astype(dtype), local)
        return local, info

    # initial info must carry the same varying-axes signature as the loop
    # output: psum over this axis of a local-derived zero gives exactly the
    # vma of the in-loop info (invariant over `axis`, varying over any
    # outer batch axes the caller sharded `local` on).
    info0 = (lax.psum(local[0, 0, 0].real, axis) * 0).astype(jnp.int32)
    local, info = lax.fori_loop(0, nblk, step, (local, info0))
    return local, info


def potrf_dist(bc: BlockCyclic):
    """Distributed lower Cholesky of a block-cyclic matrix.
    Returns (BlockCyclic factor, info). Lower triangle of the logical
    matrix holds L; the strict upper region is left as-is (garbage)."""
    nblk, nb, npad = bc.local.shape
    body = functools.partial(_potrf_dist_body, nblk=nblk, nb=nb, npad=npad,
                             axis=bc.axis, dtype=bc.local.dtype)
    fn = jax.shard_map(body, mesh=bc.mesh,
                       in_specs=P(bc.axis, None, None),
                       out_specs=(P(bc.axis, None, None), P()))
    local, info = fn(bc.local)
    return BlockCyclic(local=local, n=bc.n, nb=bc.nb, mesh=bc.mesh,
                       axis=bc.axis), info


def potrf_sharded(uplo, A, mesh, axis: str = "d", nb: int = 256):
    """Convenience driver: distribute → factor → collect.

    Upper storage is canonicalized to lower by conjugate transposition, as
    in ops/blocked.py; the opposite strict triangle of A is restored.
    """
    uplo = norm_uplo(uplo)
    W = A.conj().T if uplo == Uplo.UPPER else A
    bc = distribute(W, mesh, axis=axis, nb=nb)
    fbc, info = potrf_dist(bc)
    F = collect(fbc)
    if uplo == Uplo.UPPER:
        return jnp.triu(F.conj().T) + jnp.tril(A, -1), info
    return jnp.tril(F) + jnp.triu(A, 1), info


def _logdet_body(local, *, nb, n, axis):
    """Per-device log-det contribution of a distributed factor:
    2·Σ log(diag) over owned blocks, psum'd over the mesh axis."""
    p = lax.axis_size(axis)
    me = lax.axis_index(axis)
    rdt = real_dtype(local.dtype)
    nlocal = local.shape[0]
    g = me + jnp.arange(nlocal, dtype=jnp.int32) * p
    r = jnp.arange(nb, dtype=jnp.int32)
    cols = g[:, None] * nb + r[None, :]                   # (nlocal, nb)
    # d[l, r] = local[l, r, g[l]*nb + r] — the diagonal of block l
    d = jax.vmap(lambda blk, c: blk[r, c])(local, cols)
    valid = cols < n                                      # mask identity pad
    logs = jnp.where(valid, jnp.log(d.real.astype(rdt)), 0.0)
    return lax.psum(2.0 * jnp.sum(logs), axis)


def logdet_dist(bc: BlockCyclic):
    """Distributed SPD log-determinant: factor + local log-diag + psum.
    Returns (value, info). (The reference has no multi-GPU logdet —
    this closes that gap.)"""
    fbc, info = potrf_dist(bc)
    nblk, nb, npad = fbc.local.shape
    body = functools.partial(_logdet_body, nb=nb, n=fbc.n, axis=fbc.axis)
    val = jax.shard_map(body, mesh=fbc.mesh,
                        in_specs=P(fbc.axis, None, None),
                        out_specs=P())(fbc.local)
    return val, info


def logdet_sharded(uplo, A, mesh, axis: str = "d", nb: int = 256):
    uplo = norm_uplo(uplo)
    W = A.conj().T if uplo == Uplo.UPPER else A
    bc = distribute(W, mesh, axis=axis, nb=nb)
    return logdet_dist(bc)
