from detprocess_tpu.parallel import mesh  # noqa: F401
