from detprocess_tpu.parallel import mesh, multihost  # noqa: F401
