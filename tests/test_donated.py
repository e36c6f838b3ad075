"""Every aliased pallas operand must pass through utils.pallas_x32.donated.

Pin for the round-4 donated-alias corruption (commit f626f39): a pallas
input that is BOTH produced by a fusion (tril/transpose/pad) AND aliased
into the kernel output via ``input_output_aliases`` can arrive corrupted
on the chip inside large compiled programs (observed: blocked.trsm@3072
with a wide rhs, garbage rows 2688-2943, value-independent, clean in
isolation/interpret).  The fix materializes the operand with
``lax.optimization_barrier`` before donation.  These tests pin the
barrier structurally (the corruption itself is invisible on CPU), by
asserting an ``optimization_barrier`` eqn exists in the jaxpr of every
wrapper that aliases its input.
"""
import jax
import jax.numpy as jnp
import pytest

from cholesky_tpu.ops.pallas import mega, syrk


def _has_barrier(jaxpr) -> bool:
    # robust across jax versions: the printed jaxpr names every primitive,
    # including those inside nested (pjit/custom-call) sub-jaxprs
    return "optimization_barrier" in str(jaxpr)


@pytest.mark.parametrize("fn,n", [
    (mega.potrf_vmem_f32, 256),
    (mega.trtri_vmem_f32, 256),
    (mega.potrf_hbm_f32, 1280),
    (mega.trtri_hbm_f32, 1280),
    (mega.lauum_hbm_f32, 1280),
])
def test_aliased_mega_wrappers_barrier_their_input(fn, n):
    A = jnp.eye(n, dtype=jnp.float32)
    jaxpr = jax.make_jaxpr(fn)(A)
    assert _has_barrier(jaxpr.jaxpr), (
        f"{fn.__name__} aliases its input but does not materialize it "
        "with donated() — reintroduces the f626f39 corruption")


def test_aliased_syrk_barriers_c_operand():
    A = jnp.ones((256, 128), jnp.float32)
    C = jnp.ones((256, 256), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda a, c: syrk.syrk_f32(a, c, alpha=1.0, beta=1.0))(A, C)
    assert _has_barrier(jaxpr.jaxpr)


def test_donated_is_identity():
    from cholesky_tpu.utils.pallas_x32 import donated
    x = jnp.arange(8.0)
    assert jnp.array_equal(donated(x), x)
