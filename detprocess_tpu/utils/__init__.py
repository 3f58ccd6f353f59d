from detprocess_tpu.utils import channels, windows, freq, misc, logging  # noqa: F401
