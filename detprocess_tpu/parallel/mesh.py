"""Device-mesh sharding: SPMD event parallelism over TPU chips.

This replaces the reference's only parallelism mechanism —
multiprocessing.Pool over data series (detprocess/process/features.py:391-420,
SURVEY.md §2.2) — with jax.sharding over a device mesh:

- the **events** axis shards event batches across chips (the Pool-split
  equivalent; results are exactly shard-count invariant because each event
  is independent),
- cross-chip reductions (PSD/CSD averaging over noise randoms) ride ICI via
  ``psum`` — collectives the reference never needed because workers shared
  nothing and wrote disjoint files.

All helpers are backend-agnostic: they work identically on a real TPU pod
slice and on a virtual CPU mesh (``--xla_force_host_platform_device_count``)
used in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


EVENTS_AXIS = "events"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = EVENTS_AXIS) -> Mesh:
    """1-D mesh over (up to) all available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = EVENTS_AXIS):
    """Place a host batch (leading axis = events) sharded across the mesh."""
    def put(x):
        spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate (e.g. filter banks) across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(put, tree)


def sharded_map(mesh: Mesh, fn, axis_name: str = EVENTS_AXIS):
    """shard_map wrapper: ``fn(local_batch, replicated_args)`` runs per
    shard; outputs are event-sharded. fn must be shape-polymorphic in the
    leading (event) axis."""
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis_name), P()), out_specs=P(axis_name))
    def wrapped(batch, args):
        return fn(batch, args)
    return wrapped


def sharded_psd(mesh: Mesh, fs: float, axis_name: str = EVENTS_AXIS):
    """Welch PSD over an event-sharded trace batch with a psum mean —
    the cross-chip version of Noise.calc_psd (core/noise.py:216-373).

    Returns a jitted fn(traces [B, N] sharded) -> two-sided PSD [N]
    (replicated).
    """
    from detprocess_tpu.ops import spectral

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis_name),
             out_specs=P())
    def _psd(local_traces):
        local_sum = jnp.sum(spectral.periodogram(local_traces, fs), axis=-2)
        total = jax.lax.psum(local_sum, axis_name)
        count = jax.lax.psum(
            jnp.asarray(local_traces.shape[-2], local_sum.dtype), axis_name)
        return total / count

    return jax.jit(_psd)


def sharded_csd(mesh: Mesh, fs: float, axis_name: str = EVENTS_AXIS):
    """CSD over an event-sharded [B, C, N] batch with psum averaging.

    Complex CSD cannot cross the host boundary on TPU, so the result is
    returned as a stacked (re, im) real array [C, C, N, 2].
    """
    from detprocess_tpu.ops import fft as dfft

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis_name),
             out_specs=P())
    def _csd(local_traces):
        n = local_traces.shape[-1]
        vfft = dfft.fft(local_traces, axis=-1)
        local = jnp.einsum("bik,bjk->ijk", vfft, jnp.conj(vfft))
        total = jax.lax.psum(local, axis_name)
        count = jax.lax.psum(
            jnp.asarray(local_traces.shape[0], jnp.float32), axis_name)
        csd = total / count.astype(total.dtype) / (n * fs)
        return jnp.stack([csd.real, csd.imag], axis=-1)

    return jax.jit(_csd)


def sharded_trigger(mesh: Mesh, kernel, threshold: float,
                    pileup_window: int, capacity: int,
                    axis_name: str = EVENTS_AXIS):
    """Continuous-trace OF triggering sharded over the events axis — the
    multi-chip version of TriggerProcessing's per-event dispatch (the
    reference splits series across a multiprocessing Pool instead,
    process/triggers.py:337-377).

    Each chip runs the full FIR + Δχ² + pileup-merge kernel on its local
    events; no collectives are needed because continuous events are
    independent. Returns a jitted fn(traces [E, C, L] event-sharded) →
    (indices [E, K], dchi2 [E, K], amplitudes [E, M, K], count [E]),
    all event-sharded. Outputs are shard-count invariant.
    """
    from detprocess_tpu.ops import trigger as trig_ops

    iw = jnp.asarray(kernel.iw_matrix)

    def _one(tr):
        qb, _ = trig_ops.of_fir_blocks(tr, kernel)
        d, a = trig_ops.delta_chi2_blocks(qb, iw)
        ts = trig_ops.find_triggers_blocks(d, a, threshold,
                                           pileup_window, capacity)
        return ts.indices, ts.dchi2, ts.amplitudes, ts.count

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis_name),
             out_specs=P(axis_name))
    def _trig(local_traces):
        return jax.vmap(_one)(local_traces)

    return jax.jit(_trig)
