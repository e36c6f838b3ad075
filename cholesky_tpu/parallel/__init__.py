from cholesky_tpu.parallel.blockcyclic import (
    BlockCyclic,
    distribute,
    collect,
)
from cholesky_tpu.parallel.potrf import potrf_dist, logdet_dist
from cholesky_tpu.parallel.trsm import trsm_factor_dist
from cholesky_tpu.parallel.trtri import (
    lauum_dist,
    potri_dist,
    potri_sharded,
    trtri_dist,
)
from cholesky_tpu.parallel.blas import (
    gemm_dist,
    herk_dist,
    syrk_dist,
    trmm_dist,
    trsm_dist,
)
from cholesky_tpu.parallel.potrf import logdet_sharded, potrf_sharded
