from detprocess_tpu.io.filterfile import FilterData  # noqa: F401
