from cholesky_tpu.parallel.blockcyclic import (
    BlockCyclic,
    distribute,
    collect,
)
from cholesky_tpu.parallel.potrf import potrf_dist, logdet_dist
