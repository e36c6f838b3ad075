from cholesky_tpu.tuning.table import get_params, load_table, table_path
