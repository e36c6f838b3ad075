"""Tuning-table resolution must never initialize the jax backend.

VERDICT r3 Weak #5: `tuning.get_params` used to call `jax.devices()` at
trace time, so tracing `blocked.potrf(backend="auto")` could hang forever
on a dead device tunnel before the caller's own first backend use.  The
reference analog is a build-time #include <config.h> — pure data, no
device query at consumption time (reference blas/config.c).
"""

import json

import pytest

from cholesky_tpu.tuning import table


@pytest.fixture(autouse=True)
def _clear_cache():
    table._load_table_cached.cache_clear()
    yield
    table._load_table_cached.cache_clear()


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("CHOLESKY_TPU_DEVICE_KIND", "TPU v5 lite")
    # jax.devices must NOT be consulted when the env override is present
    monkeypatch.setattr(table.jax, "devices",
                        lambda *a, **k: pytest.fail("backend initialized"))
    assert table._resolve_device_kind() == "TPU v5 lite"
    p = table.table_path()
    assert p.name == "tpu_v5_lite.json"


def test_get_params_without_backend(monkeypatch):
    """With no env override and no initialized backend, DEFAULTS apply and
    nothing attempts backend initialization."""
    monkeypatch.delenv("CHOLESKY_TPU_DEVICE_KIND", raising=False)
    monkeypatch.setattr(table.jax, "devices",
                        lambda *a, **k: pytest.fail("backend initialized"))
    monkeypatch.setattr(table, "_resolve_device_kind", lambda: None)
    params = table.get_params("matmul_f32")
    assert params == table.DEFAULTS["matmul_f32"]


def test_unresolved_not_cached(monkeypatch, tmp_path):
    """An early pre-init call must not pin the DEFAULTS answer: once the
    device kind becomes resolvable, tuned values take over."""
    monkeypatch.delenv("CHOLESKY_TPU_DEVICE_KIND", raising=False)
    monkeypatch.setattr(table, "_resolve_device_kind", lambda: None)
    assert table.load_table() == {}

    tuned = {"matmul_f32": {"bm": 512, "bn": 128, "bk": 256}}
    tbl = tmp_path / "stub_kind.json"
    tbl.write_text(json.dumps(tuned))
    monkeypatch.setattr(table, "_TABLES_DIR", tmp_path)
    monkeypatch.setattr(table, "_resolve_device_kind", lambda: "stub kind")
    assert table.get_params("matmul_f32") == tuned["matmul_f32"]


def test_shipped_tpu_table_loads():
    params = table.get_params("matmul_f32", device_kind="TPU v5 lite")
    assert set(params) >= {"bm", "bn", "bk"}
