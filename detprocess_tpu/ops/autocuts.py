"""Automated quality cuts on trace batches (jittable).

Replacement for qetpy.autocuts_noise / autocuts_didv as used at
detprocess/core/noise.py:331, core/didv.py:1631, process/ivprocess.py:587.
QETpy's cuts run data-dependent outlier-removal loops on per-trace
statistics **until convergence**; here the same sigma-clipping runs as a
``lax.while_loop`` on device — the mask only ever shrinks
(``mask & keep``), so the loop terminates and the result is the exact
fixed point of the clipping operator, matching the reference's
converge-until-done semantics without leaving the device.

Pass ``niter`` to opt into a fixed iteration count instead (static cost,
useful inside larger jitted programs where a bounded step count is
preferred; on well-behaved data the loop converges in 2-3 passes so
``niter=5`` usually yields the identical mask — the convergence default
removes the "usually": tests/test_autocuts_convergence.py constructs a
heavy-tailed batch where 2 iterations are NOT converged).

Metrics per trace (the qetpy autocuts family):
- ``std``      : overall RMS (catches noisy / glitchy traces)
- ``range``    : max − min (catches pulses in "noise" randoms)
- ``slope``    : end-mean − start-mean (catches baseline drifts)
- ``baseline`` : overall mean (catches jumps between traces)

For dIdV data the periodic square-wave response is first removed by
subtracting the batch mean before computing metrics
(`autocuts_didv` behavior).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _clip_pass(metric: jnp.ndarray, mask: jnp.ndarray,
               nsigma: float) -> jnp.ndarray:
    """One sigma-clip pass: keep entries within nsigma of the masked
    mean/std."""
    cnt = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(metric * mask) / cnt
    var = jnp.sum((metric - mean) ** 2 * mask) / cnt
    std = jnp.sqrt(var)
    keep = jnp.abs(metric - mean) <= nsigma * std + 1e-30
    return mask & keep


def _iterative_cut(metric: jnp.ndarray, mask: jnp.ndarray, nsigma: float,
                   niter: Optional[int]) -> jnp.ndarray:
    """Sigma-clip one metric. niter=None iterates to convergence (the
    mask shrinks monotonically, so the while_loop terminates); an int
    runs that many passes."""
    if niter is not None:
        return jax.lax.fori_loop(
            0, niter, lambda _, m: _clip_pass(metric, m, nsigma), mask)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        m, _ = state
        new = _clip_pass(metric, m, nsigma)
        return new, jnp.any(new != m)

    final, _ = jax.lax.while_loop(cond, body, (mask, jnp.asarray(True)))
    return final


def autocuts(traces: jnp.ndarray, nsigma: float = 2.5,
             niter: Optional[int] = None,
             remove_mean: bool = False) -> jnp.ndarray:
    """Boolean keep-mask [B] for a trace batch [B, N] (or [B, C, N] —
    a trace passes only if every channel passes).

    niter=None (default) iterates each metric's sigma-clip to its exact
    fixed point; pass an int for a fixed pass count.
    """
    if traces.ndim == 3:
        masks = jax.vmap(lambda t: autocuts(t, nsigma, niter, remove_mean),
                         in_axes=1)(traces)
        return jnp.all(masks, axis=0)

    x = traces
    if remove_mean:
        x = x - jnp.mean(x, axis=0, keepdims=True)

    n = x.shape[-1]
    k = max(n // 10, 1)
    std = jnp.std(x, axis=-1)
    rng = jnp.max(x, axis=-1) - jnp.min(x, axis=-1)
    slope = jnp.mean(x[:, -k:], axis=-1) - jnp.mean(x[:, :k], axis=-1)
    base = jnp.mean(x, axis=-1)

    mask = jnp.ones(x.shape[0], dtype=bool)
    for metric in (std, rng, slope, base):
        mask = _iterative_cut(metric, mask, nsigma, niter)
    return mask


def autocuts_noise(traces: jnp.ndarray, nsigma: float = 2.5,
                   niter: Optional[int] = None) -> jnp.ndarray:
    """Quality cuts for noise randoms (qetpy.autocuts_noise equivalent,
    converge-until-done by default)."""
    return autocuts(traces, nsigma=nsigma, niter=niter, remove_mean=False)


def autocuts_didv(traces: jnp.ndarray, nsigma: float = 2.5,
                  niter: Optional[int] = None) -> jnp.ndarray:
    """Quality cuts for dIdV square-wave data: metrics computed after
    removing the batch-mean periodic response (qetpy.autocuts_didv
    equivalent, converge-until-done by default)."""
    return autocuts(traces, nsigma=nsigma, niter=niter, remove_mean=True)
