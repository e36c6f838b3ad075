"""x64-proof ``pallas_call``: trace kernel bodies with x64 DISABLED.

Under ``jax_enable_x64`` (always on for the d/z drivers) plain Python
literals inside a kernel trace as 64-bit scalars: ``jnp.where(m, x, 0.0)``
passes the ``0.0`` into its ``_where`` sub-jit as ``f64[]`` with a
``convert_element_type f64->f32`` inside, and ``ref[0, 0] = v`` binds its
store (``swap``) with ``i64`` index operands.  Mosaic cannot lower either:
on the chip the convert lowering recurses until Python's recursion limit
(the r4 on-chip signature was ``RecursionError`` from every d-precision
driver), and cross-platform AOT lowering raises ``NotImplementedError:
Unsupported cast: float64 -> float32``.  (CLAUDE.md rule 3 — this is the
general form of the "no int64 anywhere" rule.)

Every kernel in this library is f32/int8/int32 by DESIGN (the TPU has no
64-bit compute; the d tier is Ozaki slices, the z tier embeds into d), so
the structural fix is to trace the kernel with x64 off: operand and result
dtypes are all explicit and unaffected by the flag; only the implicit
types of Python literals change — back to the 32-bit types the kernels
were written for.

Use :func:`pallas_call` here instead of ``pl.pallas_call`` for every
kernel in this package.  The wrapper also covers the grid index machinery
(previously grids crashed the Mosaic compiler under x64, forcing grid-free
kernels chunked at the XLA level — rng/pallas_prng._fill_kernel64).
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl


def pallas_call(*args, **kwargs):
    """Drop-in ``pl.pallas_call`` whose returned callable traces the kernel
    (and everything else bound inside the call, including grid indexing)
    under ``jax.enable_x64(False)``."""
    call = pl.pallas_call(*args, **kwargs)

    def wrapped(*operands):
        with jax.enable_x64(False):
            return call(*operands)

    return wrapped


def donated(x):
    """Materialize an operand that is aliased into a kernel output.

    An operand that is BOTH produced by a fusion (``jnp.tril``/transpose/
    pad) AND donated via ``input_output_aliases`` can arrive corrupted on
    the chip when the surrounding compiled program is large: observed as
    ``blocked.trsm`` n=3072 with a (3072, 3072) rhs returning garbage in
    rows 2688-2943 — value-independent, deterministic per program, clean
    in isolation and in interpret mode (tools/probe_ctrsm.py bisection,
    round 4).  Forcing the fused producer through an optimization barrier
    materializes the buffer before XLA donates it, which removes the
    corruption at no measured cost (the buffer had to be materialized for
    the kernel anyway).  Apply to EVERY aliased pallas operand.
    """
    return jax.lax.optimization_barrier(x)
