from cholesky_tpu.utils.errors import set_error_handler, set_xerbla, xerbla
