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


def __getattr__(name):
    """Lazy top-level access to the main user-facing classes."""
    _exports = {
        "FeatureProcessing": "detprocess_tpu.pipelines.features",
        "TriggerProcessing": "detprocess_tpu.pipelines.triggers",
        "EventBuilder": "detprocess_tpu.pipelines.triggers",
        "OptimumFilterTrigger": "detprocess_tpu.pipelines.oftrigger",
        "Randoms": "detprocess_tpu.pipelines.randoms",
        "Salting": "detprocess_tpu.pipelines.salting",
        "Noise": "detprocess_tpu.pipelines.noise",
        "NoiseModel": "detprocess_tpu.pipelines.noisemodel",
        "DIDVAnalysis": "detprocess_tpu.pipelines.didv",
        "IVSweepProcessing": "detprocess_tpu.pipelines.ivsweep",
        "IVSweepAnalysis": "detprocess_tpu.pipelines.ivsweep",
        "Template": "detprocess_tpu.pipelines.template",
        "FilterBuilder": "detprocess_tpu.pipelines.template",
        "FilterDataProcessing": "detprocess_tpu.pipelines.filtergen",
        "FilterData": "detprocess_tpu.io.filterfile",
        "RawData": "detprocess_tpu.io.rawdata",
        "YamlConfig": "detprocess_tpu.config.yamlconfig",
    }
    if name in _exports:
        import importlib
        module = importlib.import_module(_exports[name])
        return getattr(module, name)
    if name == "cli":
        import importlib
        return importlib.import_module("detprocess_tpu.cli")
    raise AttributeError(f"module 'detprocess_tpu' has no attribute {name!r}")
