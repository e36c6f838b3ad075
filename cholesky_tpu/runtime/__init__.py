from cholesky_tpu.runtime.taskpool import Task, TaskPool, TaskPoolError
