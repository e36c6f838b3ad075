"""Device PRNG fill contracts (threefry fallback on the CPU mesh; the
hardware-PRNG kernel path is exercised on real TPU by the verify drive)."""

import numpy as np
import pytest

from cholesky_tpu.rng.generators import Interval
from cholesky_tpu.rng.pallas_prng import uniform_device


def test_deterministic_and_uniform():
    a = np.asarray(uniform_device(7, (512, 256)))
    b = np.asarray(uniform_device(7, (512, 256)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(uniform_device(8, (512, 256)))
    assert np.max(np.abs(a - c)) > 0
    assert 0.45 < a.mean() < 0.55
    assert a.min() >= 0.0 and a.max() < 1.0


@pytest.mark.parametrize("interval,lo_ok,hi_ok", [
    (Interval.CLOSED, lambda x: x >= 0, lambda x: x <= 1),
    (Interval.OPEN, lambda x: x > 0, lambda x: x < 1),
    (Interval.HALF_OPEN_01, lambda x: x >= 0, lambda x: x < 1),
    (Interval.HALF_OPEN_10, lambda x: x > 0, lambda x: x <= 1),
])
def test_intervals(interval, lo_ok, hi_ok):
    u = np.asarray(uniform_device(3, (256, 256), interval))
    assert lo_ok(u.min()) and hi_ok(u.max())


def test_odd_shapes():
    u = np.asarray(uniform_device(1, (100, 57)))
    assert u.shape == (100, 57)


def test_uniform_device64():
    # the rng64/MTGP64 tier (reference rng.h:131-235): full 53-bit f64
    # resolution, deterministic, interval contract
    from cholesky_tpu.rng.pallas_prng import uniform_device64
    a = np.asarray(uniform_device64(7, (256, 128)))
    assert a.dtype == np.float64
    b = np.asarray(uniform_device64(7, (256, 128)))
    np.testing.assert_array_equal(a, b)
    assert 0.45 < a.mean() < 0.55
    assert a.min() >= 0.0 and a.max() < 1.0
    # resolution: f32-rounded copy must differ (values use > 24 bits)
    assert np.max(np.abs(a - a.astype(np.float32).astype(np.float64))) > 0
