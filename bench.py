"""Benchmark: of1x1 optimal-filter feature extraction events/sec on one chip.

BASELINE.json config 1: of1x1 (nodelay + unconstrained delay scan) +
baseline/integral on synthetic 32768-sample TES pulse batches. The
baseline is the reference's processing model — a single-CPU-core per-event
Python loop over the same float64 numpy math (tests/reference_impl.py,
standing in for detprocess+QETpy, which run exactly such a loop:
detprocess/process/features.py:533-851).

Measurement notes:
- Test traces are synthesized ON DEVICE (jax.random): this session's TPU
  is reached through a tunnel whose host↔device link runs at ~20 MB/s,
  which would otherwise dominate; on-device staging reflects the real
  pipeline design (io feeds batches asynchronously).
- Batches are PIPELINED (several dispatches in flight, one sync at the
  end) — the tunnel adds ~30 ms round-trip latency per synchronous call,
  which production batch processing does not pay per batch.

Prints ONE JSON line:
    {"metric": ..., "value": events_per_sec, "unit": "events/s",
     "vs_baseline": speedup_vs_single_cpu_core}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


FS = 1.25e6
N = 32768
PRETRIG = N // 2
BATCH = 8192
NBATCH = 8
CPU_BASELINE_EVENTS = 24


def probe_device(tries=3, timeout=150, sleep_s=60):
    """True when the accelerator answers a tiny compute+transfer probe.

    A dead TPU tunnel makes ``jax.devices()`` hang forever with no error
    (observed round 3), so the probe runs in a SUBPROCESS under a hard
    timeout. Retries cover short blips; a persistent outage falls back
    to a clearly-flagged CPU run instead of hanging the driver.
    """
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return False
    code = ("import jax, numpy as np, jax.numpy as jnp\n"
            "x = jnp.asarray(np.ones(8, np.float32))\n"
            "print('PROBE_OK', float(np.asarray(x.sum())))\n")
    for i in range(tries):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=timeout)
            if r.returncode == 0 and b"PROBE_OK 8.0" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < tries:
            time.sleep(sleep_s)
    return False


def build_bank():
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank

    template = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=20e-6,
                                   tau_f1=200e-6)
    f = np.abs(np.fft.fftfreq(N, 1 / FS))
    f[0] = f[1]
    psd = 1e-20 * (1.0 + 100.0 / f)
    bank = filterbank.make_of1x1_bank(template, psd, FS, PRETRIG)
    return template, psd, bank


def bench_tpu(bank, template):
    import jax
    import jax.numpy as jnp
    from detprocess_tpu.ops import fft as dfft
    from detprocess_tpu.ops import filterbank, of1x1, tracestats

    # same layout dispatch as the feature plan (pipelines/features.py):
    # the packed Z-domain chain when the four-step FFT engages
    # (BASELINE.md "Packed of1x1 chain" — the measured-fastest layout),
    # natural half-spectrum otherwise.
    packed = dfft.site_packed(N, "feature")
    hperm = None if packed else dfft.site_half_perm_indices(N, "feature")
    host_bank = bank.to_device(np.float32)
    if hperm is not None:
        host_bank = filterbank.permute_half_bank(host_bank, hperm)
    dev_bank = jax.tree.map(jnp.asarray, host_bank)
    if packed:
        dev_bank = dict(dev_bank)
        dev_bank["pk"] = jax.tree.map(
            jnp.asarray, filterbank.packed_half_coeffs(bank, np.float32))
    spec_k = None if hperm is None else jnp.asarray(hperm)
    tmpl_dev = jnp.asarray(template, jnp.float32)

    @jax.jit
    def make_batch(key):
        """Synthesize a batch on device: noise + random-amplitude pulses."""
        knoise, kamp = jax.random.split(key)
        noise = jax.random.normal(knoise, (BATCH, N), jnp.float32) * 3e-9
        amps = jax.random.uniform(kamp, (BATCH,), jnp.float32,
                                  1e-6, 5e-6)
        return noise + amps[:, None] * tmpl_dev[None, :], amps

    @jax.jit
    def feature_step(traces, dev):
        bh = filterbank.device_bank_1x1_half(dev)
        if packed:
            pk = of1x1.device_packed_1x1(dev["pk"])
            z, zr = dfft.packed_spectrum(traces[:, None, :])
            wd = of1x1.of1x1_withdelay_packed(z, zr, pk, PRETRIG, FS, N)
            nod = of1x1.of1x1_nodelay_packed(z, zr, pk, N)
        elif hperm is not None:
            vr = of1x1.signal_rfft_perm(traces[:, None, :])
            wd = of1x1.of1x1_withdelay_half_perm(
                vr, bh.phi, bh.norm, bh.denom_inv, bh.s_fft, bh.bin_w,
                PRETRIG, FS, N, spec_k)
            nod = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm,
                                           bh.denom_inv, bh.s_fft,
                                           bh.bin_w, n=N, spec_k=spec_k)
        else:
            vr = of1x1.signal_rfft(traces[:, None, :])
            wd = of1x1.of1x1_withdelay_half(vr, bh.phi, bh.norm,
                                            bh.denom_inv, bh.s_fft,
                                            bh.bin_w, PRETRIG, FS)
            nod = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm,
                                           bh.denom_inv, bh.s_fft,
                                           bh.bin_w, n=N)
        return (nod.amp[:, 0], nod.chi2[:, 0], wd.amp[:, 0], wd.t0[:, 0],
                wd.chi2[:, 0], tracestats.baseline(traces),
                tracestats.integral(traces, FS))

    keys = jax.random.split(jax.random.PRNGKey(0), NBATCH)
    batches = [make_batch(k) for k in keys]
    # compile + warm up (block via host transfer so compile cost and any
    # deferred backend errors surface before timing)
    out = feature_step(batches[0][0], dev_bank)
    np.asarray(out[2])

    t0 = time.perf_counter()
    outs = [feature_step(tr, dev_bank) for tr, _ in batches]
    # sync with ONE device→host transfer of the last output: the stream
    # is FIFO so its availability implies all batches completed. (Do NOT
    # use jax.block_until_ready here — on this backend it returns before
    # queued computation finishes; and do not transfer every output —
    # that pays one ~30 ms tunnel round-trip per batch.)
    np.asarray(outs[-1][2]).ravel()[:1]
    dt = time.perf_counter() - t0
    events_per_sec = BATCH * NBATCH / dt
    amps_rec = [np.asarray(o[2]) for o in outs]   # post-timing readback

    # correctness: recovered amplitudes match the injected ones
    amps_true = np.asarray(batches[0][1])
    err = np.abs(amps_rec[0] - amps_true)
    if not np.all(err < 1e-7):
        raise RuntimeError(f"benchmark correctness check failed: "
                           f"max amp error {err.max():.3e}")
    return events_per_sec


def bench_cpu_baseline(template, psd):
    sys.path.insert(0, "tests")
    from reference_impl import RefOF1x1

    rng = np.random.default_rng(0)
    ref = RefOF1x1(template, psd, FS, PRETRIG)
    sub = (rng.standard_normal((CPU_BASELINE_EVENTS, N)) * 3e-9
           + 2e-6 * template[None, :])
    # pinned core (round-3 CPU protocol — see benchmarks/run_all.py)
    import os
    try:
        os.sched_setaffinity(0, {0})
    except (AttributeError, OSError):
        pass
    # best of 3 passes: the fastest CPU run gives the most conservative
    # speedup (the host is shared, single runs swing with contention)
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(len(sub)):
            ref.fit_nodelay(sub[i])
            ref.fit_withdelay(sub[i])
            np.mean(sub[i][: N - 1])
            np.trapezoid(sub[i][: N - 1]) / FS
        best_dt = min(best_dt, time.perf_counter() - t0)
    return len(sub) / best_dt


def main():
    global BATCH, NBATCH
    forced_cpu = os.environ.get("JAX_PLATFORMS", "").lower() == "cpu"
    on_device = False if forced_cpu else probe_device(
        tries=int(os.environ.get("DETPROC_BENCH_PROBE_TRIES", "3")),
        timeout=int(os.environ.get("DETPROC_BENCH_PROBE_TIMEOUT", "150")))
    if not on_device:
        # tunnel down (or CPU forced): run the SAME benchmark on host CPU
        # with a batch size that finishes, and say so in the JSON — a
        # flagged CPU number beats a silently hung driver. The env var
        # alone is NOT enough: the preinstalled TPU plugin can override
        # JAX_PLATFORMS (see tests/conftest.py), and its init hangs
        # forever when the tunnel is dead — the config update below must
        # land before any backend initialization.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        BATCH, NBATCH = 256, 2
    template, psd, bank = build_bank()
    events_per_sec = bench_tpu(bank, template)
    cpu_rate = bench_cpu_baseline(template, psd)
    result = {
        "metric": "of1x1 feature extraction (32k samples, nodelay+delay-scan"
                  "+trace stats)",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / cpu_rate, 1),
    }
    if forced_cpu:
        result["platform"] = "cpu (JAX_PLATFORMS=cpu set by caller)"
    elif not on_device:
        result["platform"] = ("cpu-fallback: TPU tunnel unreachable at "
                              "bench time (probe timed out); see "
                              "BASELINE.md for on-chip numbers")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
