from cholesky_tpu.rng.generators import (
    latmc,
    uniform,
    Interval,
)
