from cholesky_tpu.models.gp import GPParams, gp_nll, gp_nll_and_grads, \
    gp_train_step, rbf_kernel
