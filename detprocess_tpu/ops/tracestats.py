"""Windowed trace statistics — baseline, integral, max/min, energy absorbed.

Batched device equivalents of the reference's trace-based feature extractors
(detprocess/core/algorithms.py:651-949). All windows are static Python ints
resolved at config-compile time (utils.windows.extract_window_indices), so
each call lowers to a fused slice+reduction under jit.

Window semantics match the reference exactly: a feature over window
``[min_index, max_index]`` reduces the slice ``trace[min:max]`` (max
exclusive; the reference's default max is ``nb_samples - 1``, i.e. the last
sample is excluded by default).
"""

from __future__ import annotations

import jax.numpy as jnp


def _trapz(y: jnp.ndarray, dx: float = 1.0) -> jnp.ndarray:
    """Trapezoidal integral over the last axis (np.trapz equivalent)."""
    return dx * (jnp.sum(y, axis=-1) - 0.5 * (y[..., 0] + y[..., -1]))


def baseline(traces: jnp.ndarray, window_min_index: int = 0,
             window_max_index: int | None = None) -> jnp.ndarray:
    """Mean of trace[min:max] (core/algorithms.py:651-704)."""
    if window_max_index is None:
        window_max_index = traces.shape[-1] - 1
    return jnp.mean(traces[..., window_min_index:window_max_index], axis=-1)


def integral(traces: jnp.ndarray, fs: float, window_min_index: int = 0,
             window_max_index: int | None = None) -> jnp.ndarray:
    """trapz(trace[min:max]) / fs (core/algorithms.py:709-765)."""
    if window_max_index is None:
        window_max_index = traces.shape[-1] - 1
    return _trapz(traces[..., window_min_index:window_max_index]) / fs


def maximum(traces: jnp.ndarray, window_min_index: int = 0,
            window_max_index: int | None = None) -> jnp.ndarray:
    if window_max_index is None:
        window_max_index = traces.shape[-1] - 1
    return jnp.max(traces[..., window_min_index:window_max_index], axis=-1)


def minimum(traces: jnp.ndarray, window_min_index: int = 0,
            window_max_index: int | None = None) -> jnp.ndarray:
    if window_max_index is None:
        window_max_index = traces.shape[-1] - 1
    return jnp.min(traces[..., window_min_index:window_max_index], axis=-1)


def energyabsorbed(traces: jnp.ndarray, fs: float, vb: float, i0: float,
                   rl: float, window_min_index: int = 0,
                   window_max_index: int | None = None) -> jnp.ndarray:
    """Energy absorbed by the TES (core/algorithms.py:889-949).

    baseline from trace[:min]; p0 = δi·(vb − 2·i0·rl) − δi²·rl integrated
    with dx = 1/fs.
    """
    if window_max_index is None:
        window_max_index = traces.shape[-1]
    base = jnp.mean(traces[..., :window_min_index], axis=-1, keepdims=True)
    i_trace = traces[..., window_min_index:window_max_index] - base
    p0 = i_trace * (vb - 2.0 * i0 * rl) - i_trace**2 * rl
    return _trapz(p0, dx=1.0 / fs)
