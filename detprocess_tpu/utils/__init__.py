from detprocess_tpu.utils import channels, windows, freq, misc  # noqa: F401
