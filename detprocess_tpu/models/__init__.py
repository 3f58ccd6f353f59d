from detprocess_tpu.models import pulse  # noqa: F401
