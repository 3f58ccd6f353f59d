"""detprocess_tpu — a TPU-native framework for cryogenic TES detector data processing.

A from-scratch rebuild (JAX/XLA/Pallas) of the capabilities of
`spice-herald/detprocess` plus the QETpy numerical kernels it delegates to.
The design inverts the reference's per-event Python loop: fixed-shape batches
of traces ``[batch, channel, samples]`` flow through jit-compiled, vmapped
kernels; filter precomputation (optimal filters, weight matrices) is done once
as arrays; sharding over a TPU mesh replaces the reference's
multiprocessing.Pool-over-series (reference: detprocess/process/features.py:391-420).

Layers
------
- ``ops``       : device kernels — FFT/PSD, optimal filters, trigger, autocuts, fits
- ``models``    : physics models — pulse templates, dIdV admittance, TES noise, IV bias
- ``parallel``  : device-mesh sharding helpers (shard_map/pjit over an `events` axis)
- ``io``        : host-side HDF5 IO — raw pytesdaq-format data, filter files, tables
- ``config``    : YAML processing-configuration compiler
- ``pipelines`` : orchestration — feature extraction, triggering, randoms, noise,
                  filter generation, IV sweep, salting
- ``utils``     : channel-name algebra, windowing, frequency helpers
"""

__version__ = "0.1.0"

from detprocess_tpu.utils import channels, windows, freq  # noqa: F401
