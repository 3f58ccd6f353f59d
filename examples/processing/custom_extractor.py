"""Example user feature-extractor plug-in.

The reference loads per-user algorithm modules at runtime
(detprocess/process/features.py:1002-1029); here the contract is
jax-traceable batched functions:

    EXTRACTORS = {name: fn}
    fn(traces [B, N], fs=..., nb_pretrigger_samples=..., **kwargs)
        -> {feature_name: [B] array}

Every returned key becomes a column ``{feature_name}_{channel}`` —
include the algorithm name in your keys if you want it in the column.

Use from YAML:

    feature:
      external_file: /path/to/custom_extractor.py
      Mv2301:
        pulse_shape:
          run: True
          tail_fraction_start_usec: 400.0

and the functions run inside the same jit-compiled batch step as the
built-ins — no per-event Python.
"""

import jax.numpy as jnp


def pulse_shape(traces, fs=None, nb_pretrigger_samples=0,
                tail_fraction_start_usec=400.0, **kwargs):
    """Simple pulse-shape discriminators: peak-to-integral ratio and the
    fraction of area in the tail."""
    pre = int(nb_pretrigger_samples)
    base = jnp.mean(traces[:, :max(pre, 1)], axis=-1, keepdims=True)
    x = traces - base
    area = jnp.sum(x[:, pre:], axis=-1) / fs
    peak = jnp.max(x, axis=-1)
    tail_start = pre + int(tail_fraction_start_usec * 1e-6 * fs)
    tail = jnp.sum(x[:, tail_start:], axis=-1) / fs
    safe = jnp.where(area == 0, 1.0, area)
    return {
        "peak_over_area": peak / safe,
        "tail_fraction": tail / safe,
    }


EXTRACTORS = {"pulse_shape": pulse_shape}
