from vinsat_tpu.dist import mesh, tridiag  # noqa: F401
