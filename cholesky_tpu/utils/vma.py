"""Varying-mesh-axes plumbing for Pallas call sites.

ADVICE r2 / VERDICT r2 Weak #3: the distributed tier ran every shard_map
with ``check_vma=False`` because a ``pallas_call``'s ``out_shape`` carries
no vma annotation and the checker rejects it inside an SPMD body.  The
kernels themselves are pure per-device compute, so the correct annotation
is simply the union of the operands' varying axes, known at trace time via
``jax.typeof``.  Every tile kernel builds its out_shape through
:func:`out_struct`, which lets the callers keep the checker ON.
"""

from __future__ import annotations

import jax


def vma_of(*operands) -> frozenset:
    """Union of the operands' varying-mesh-axes (empty outside shard_map)."""
    vma = frozenset()
    for a in operands:
        vma = vma | jax.typeof(a).vma
    return vma


def out_struct(shape, dtype, *operands) -> jax.ShapeDtypeStruct:
    """``ShapeDtypeStruct`` whose vma is inherited from ``operands`` —
    the pallas_call analog of an elementwise op's vma rule."""
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma_of(*operands))


def checker_on(has_pallas: bool = True) -> bool:
    """``check_vma`` value for the distributed tier's shard_maps: the
    checker is ON except when an interpret-mode Pallas kernel would run
    inside the body.  (The interpreter evaluates the kernel jaxpr under
    vma rules, where kernel-internal constants — iotas, selector matrices,
    scratch zeros — are unvarying and trip the checker on any mix with
    varying block data; compiled Mosaic kernels are opaque to the checker,
    so on real TPU only the :func:`out_struct` boundary annotation is
    needed.)  ``has_pallas=False`` (oracle-tile bodies) keeps it on
    everywhere, including the CPU test mesh."""
    from cholesky_tpu import config
    return not (has_pallas and config.pallas_interpret())
