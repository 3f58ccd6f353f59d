"""Stage-level trigger profiling + roofline accounting on the real chip.

Measures, with the transfer-sync harness (see run_all.timeit_pipelined),
the cumulative time of: FIR only → +Δχ² → +scan (old flat path) →
+scan (tiled path) → fused tiled path without amps materialization.
Prints one JSON line per stage with ms/10Msamples and effective GB/s.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from detprocess_tpu.models import pulse
from detprocess_tpu.ops import filterbank, trigger

FS = 1.25e6


def _sync(x):
    np.asarray(x).ravel()[:1]


def timeit(fn, args, k=24):
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(k)]
    last = outs[-1]
    _sync(last[0] if isinstance(last, tuple) else last)
    return (time.perf_counter() - t0) / k


def main():
    nt, pretrig = 4096, 1024
    l = 1_250_000
    e = 8
    window = 125
    tmpl = pulse.make_template(FS, nt, pretrig, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    psd = np.full(nt, 4e-18)
    bank = filterbank.make_ofnxm_bank(tmpl, psd.astype(complex), FS,
                                      pretrig)
    kernel = trigger.make_trigger_kernel(bank)
    thr = trigger.chi2_threshold(5.0, 1)
    iw = jnp.asarray(kernel.iw_matrix)

    @jax.jit
    def make_x(key):
        return jax.random.normal(key, (e, 1, l), jnp.float32) * np.sqrt(
            psd[0] * FS).astype(np.float32)

    x = jax.block_until_ready(make_x(jax.random.PRNGKey(0)))

    # stage probes return small reductions — returning the full q/Δχ²
    # arrays would time the ~20 MB/s host tunnel, not the kernels (the
    # reduction adds one cheap fused pass)
    def fir_only(x):
        qb, _ = jax.vmap(lambda t: trigger.of_fir_blocks(t, kernel))(x)
        return jnp.sum(qb, axis=(-1, -2))

    def fir_dchi2(x):
        def one(t):
            qb, _ = trigger.of_fir_blocks(t, kernel)
            return jnp.sum(trigger.delta_chi2_from_q(qb, iw), axis=-1)
        return jax.vmap(one)(x)

    def full_flat(x):
        def one(t):
            qb, _ = trigger.of_fir_blocks(t, kernel)
            d, a = trigger.delta_chi2_blocks(qb, iw)
            d2, a2 = trigger._retile_rows(d, a)
            # force the flat scan path (winners_per_row engages top-k)
            return trigger.find_triggers_blocks(
                d2, a2, thr, window, 512,
                winners_per_row=d2.shape[1] // (window + 1) + 2)
        ts = jax.vmap(one)(x)
        return ts.indices, ts.count

    def full_tiled(x):
        def one(t):
            qb, _ = trigger.of_fir_blocks(t, kernel)
            d, a = trigger.delta_chi2_blocks(qb, iw)
            return trigger.find_triggers_tiled(d, a, thr, window, 512)
        ts = jax.vmap(one)(x)
        return ts.indices, ts.count

    def full_tiled_fused(x):
        def one(t):
            qb, _ = trigger.of_fir_blocks(t, kernel)
            d = trigger.delta_chi2_from_q(qb, iw)
            return trigger.find_triggers_tiled(d, qb, thr, window, 512,
                                               amps_transform=iw)
        ts = jax.vmap(one)(x)
        return ts.indices, ts.count

    stages = [
        ("fir_only", jax.jit(fir_only)),
        ("fir+dchi2", jax.jit(fir_dchi2)),
        ("full_flat_scan", jax.jit(full_flat)),
        ("full_tiled_scan", jax.jit(full_tiled)),
        ("full_tiled_fused", jax.jit(full_tiled_fused)),
    ]
    for name, fn in stages:
        dt = timeit(fn, (x,))
        msamples = e * l / 1e6
        ms_per_10ms = dt * 1e3 / (msamples / 10)
        rate = e * l / dt / 1e6
        print(json.dumps({
            "stage": name,
            "ms_per_10Msamples": round(ms_per_10ms, 2),
            "Msamples_per_sec": round(rate, 1),
        }))


if __name__ == "__main__":
    main()
