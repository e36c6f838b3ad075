"""BLAS/LAPACK flag enums and the precision registry.

Mirrors the reference's enums (reference include/blas.h:24-27), which are
castable to the Fortran characters 'N'/'T'/'C', 'U'/'L', 'L'/'R', 'U'/'N'.
Here they are str-valued enums so plain characters are accepted anywhere.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class Side(str, enum.Enum):
    LEFT = "L"
    RIGHT = "R"


class Uplo(str, enum.Enum):
    UPPER = "U"
    LOWER = "L"


class Trans(str, enum.Enum):
    NO_TRANS = "N"
    TRANS = "T"
    CONJ_TRANS = "C"


class Diag(str, enum.Enum):
    NON_UNIT = "N"
    UNIT = "U"


def _norm(value, enum_cls, name: str):
    """Normalize a char or enum into the enum; raise via xerbla-style check."""
    if isinstance(value, enum_cls):
        return value
    if isinstance(value, str):
        v = value.upper()
        for member in enum_cls:
            if member.value == v:
                return member
    raise ValueError(f"invalid {name}: {value!r} (expected one of "
                     f"{[m.value for m in enum_cls]})")


def norm_side(side) -> Side:
    return _norm(side, Side, "side")


def norm_uplo(uplo) -> Uplo:
    return _norm(uplo, Uplo, "uplo")


def norm_trans(trans) -> Trans:
    return _norm(trans, Trans, "trans")


def norm_diag(diag) -> Diag:
    return _norm(diag, Diag, "diag")


# ---------------------------------------------------------------------------
# Precision registry — the s/d/c/z axis of the reference (generated there by
# single2double.sh / complex2doublecomplex.sh; here a single generic source
# parameterized by dtype).
# ---------------------------------------------------------------------------

#: LAPACK precision letter -> jnp dtype
PRECISIONS = {
    "s": jnp.float32,
    "d": jnp.float64,
    "c": jnp.complex64,
    "z": jnp.complex128,
}

#: complex dtype -> underlying real dtype
REAL_OF = {
    jnp.dtype(jnp.complex64): jnp.dtype(jnp.float32),
    jnp.dtype(jnp.complex128): jnp.dtype(jnp.float64),
    jnp.dtype(jnp.float32): jnp.dtype(jnp.float32),
    jnp.dtype(jnp.float64): jnp.dtype(jnp.float64),
}


def is_complex(dtype) -> bool:
    return jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)


def real_dtype(dtype):
    return REAL_OF[jnp.dtype(dtype)]


def precision_letter(dtype) -> str:
    d = jnp.dtype(dtype)
    for letter, dt in PRECISIONS.items():
        if jnp.dtype(dt) == d:
            return letter
    raise ValueError(f"unsupported precision: {d}")
