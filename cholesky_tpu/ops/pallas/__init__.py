"""Hand-written Pallas TPU MXU tile kernels (the cu*/.cu analog).

The reference's CUDA kernels (blas/sgemm.cu shared-memory tiles + register
accumulators, lapack/spotrf.cu packed-shared-memory potf2, strtri.cu trti2)
map here to Pallas kernels: BlockSpec grids play the mb/nb/kb template
parameters, VMEM plays shared memory, and Python specialization replaces
runtime mangled-name dispatch (reference blas/sgemm.c:184-190).
"""

from cholesky_tpu.ops.pallas.gemm import matmul_f32
from cholesky_tpu.ops.pallas.syrk import syrk_f32
from cholesky_tpu.ops.pallas.leaf import potf2_f32, trti2_f32, lauu2_f32
