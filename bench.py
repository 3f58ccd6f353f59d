"""Benchmark: of1x1 optimal-filter feature extraction events/sec on one chip.

BASELINE.json config 1: of1x1 (nodelay + unconstrained delay scan) +
baseline/integral on synthetic 32768-sample TES pulse batches (1024 events).
The baseline is the reference's processing model — a single-CPU-core
per-event Python loop over the same float64 numpy math
(tests/reference_impl.py, standing in for detprocess+QETpy which run exactly
such a loop, detprocess/process/features.py:533-851).

Prints ONE JSON line:
    {"metric": ..., "value": events_per_sec, "unit": "events/s",
     "vs_baseline": speedup_vs_single_cpu_core}
"""

import json
import sys
import time

import numpy as np


FS = 1.25e6
N = 32768
PRETRIG = N // 2
BATCH = 1024
CPU_BASELINE_EVENTS = 24


def build_data():
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank

    rng = np.random.default_rng(0)
    template = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=20e-6,
                                   tau_f1=200e-6)
    f = np.abs(np.fft.fftfreq(N, 1 / FS))
    f[0] = f[1]
    psd = 1e-20 * (1.0 + 100.0 / f)
    bank = filterbank.make_of1x1_bank(template, psd, FS, PRETRIG)
    amps = rng.uniform(1e-6, 5e-6, BATCH)
    traces = (rng.standard_normal((BATCH, N)) * 3e-9
              + amps[:, None] * template[None, :]).astype(np.float32)
    return template, psd, bank, traces, amps


def bench_tpu(bank, traces):
    import jax
    import jax.numpy as jnp
    from detprocess_tpu.ops import filterbank, of1x1, tracestats

    dev_bank = jax.tree.map(jnp.asarray, bank.to_device(np.float32))

    @jax.jit
    def feature_step(traces, dev):
        bh = filterbank.device_bank_1x1_half(dev)
        vr = of1x1.signal_rfft(traces[:, None, :])
        nod = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                       bh.s_fft, bh.bin_w, n=N)
        wd = of1x1.of1x1_withdelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                        bh.s_fft, bh.bin_w, PRETRIG, FS)
        return (nod.amp, nod.chi2, wd.amp, wd.t0, wd.chi2,
                tracestats.baseline(traces),
                tracestats.integral(traces, FS))

    dev_traces = jnp.asarray(traces)
    out = feature_step(dev_traces, dev_bank)
    np.asarray(out[2])  # compile + host sync (block_until_ready does not
    # reliably synchronize on this backend)
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = feature_step(dev_traces, dev_bank)
        amps = np.asarray(out[2])[:, 0]  # D2H forces completion (4 KB)
    dt = (time.perf_counter() - t0) / n_iter
    return BATCH / dt, amps


def bench_cpu_baseline(template, psd, traces):
    sys.path.insert(0, "tests")
    from reference_impl import RefOF1x1

    ref = RefOF1x1(template, psd, FS, PRETRIG)
    sub = traces[:CPU_BASELINE_EVENTS].astype(np.float64)
    t0 = time.perf_counter()
    for i in range(len(sub)):
        ref.fit_nodelay(sub[i])
        ref.fit_withdelay(sub[i])
        np.mean(sub[i][: N - 1])
        np.trapezoid(sub[i][: N - 1]) / FS
    dt = time.perf_counter() - t0
    return len(sub) / dt


def main():
    template, psd, bank, traces, amps_true = build_data()
    events_per_sec, amps = bench_tpu(bank, traces)
    # sanity: recovered amplitudes must match injection
    err = np.abs(amps - amps_true)
    if not np.all(err < 1e-7):
        raise RuntimeError(f"benchmark correctness check failed: "
                           f"max amp error {err.max():.3e}")
    cpu_rate = bench_cpu_baseline(template, psd, traces)
    print(json.dumps({
        "metric": "of1x1 feature extraction (32k samples, nodelay+delay-scan"
                  "+trace stats)",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / cpu_rate, 1),
    }))


if __name__ == "__main__":
    main()
