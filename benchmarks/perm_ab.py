"""A/B: natural-order four-step FFT path vs the transpose-free permuted
layout (ops/fft.py `*_perm` family).

The permuted-layout rewrite landed with numerical-equality tests while
the TPU tunnel was down (round 3); this script measures the actual
throughput delta on the chip at each dispatch site:

  1. of1x1 feature chain (nodelay + unconstrained delay scan, 32k)
  2. continuous-trigger overlap-save FIR + tiled merge (10 Msamples)
  3. Welch two-sided PSD build (32k)

The natural variant is produced the same way the equality tests do
(tests/test_feature_pipeline_perm.py): the storage→spectral index
functions are patched to return None while the natural kernel is built
and traced, which routes every consumer onto the natural-order
four-step transforms.

Usage: python benchmarks/perm_ab.py [--quick]
Prints one JSON line per A/B pair.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from contextlib import contextmanager

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FS = 1.25e6


def _sync(x):
    np.asarray(x).ravel()[:1]


def timeit_pipelined(fn, args_list, warmup_args):
    """Same transfer-sync protocol as benchmarks/run_all.py (see its
    docstring: block_until_ready does not sync on this backend; one
    final-output transfer is the only reliable fence)."""
    out = fn(*warmup_args)
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    last = outs[-1]
    _sync(last[0] if isinstance(last, tuple) else last)
    return time.perf_counter() - t0


@contextmanager
def force_natural():
    """Route all four-step FFT consumers onto the natural-order path for
    kernel builds / jit traces performed inside the block. Compiled
    executables keep whichever path they were traced with."""
    from detprocess_tpu.ops import fft as dfft
    hp, pi = dfft.half_perm_indices, dfft.perm_indices
    dfft.half_perm_indices = lambda n: None
    dfft.perm_indices = lambda n: None
    try:
        yield
    finally:
        dfft.half_perm_indices, dfft.perm_indices = hp, pi


def ab_feature(quick=False):
    """of1x1 nodelay + unconstrained delay scan, 1024 x 32k."""
    import jax
    import jax.numpy as jnp
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import fft as dfft
    from detprocess_tpu.ops import filterbank, of1x1

    n, pretrig, b = 32768, 16384, 1024
    k = 4 if quick else 16
    tmpl = pulse.make_template(FS, n, pretrig, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    f = np.abs(np.fft.fftfreq(n, 1 / FS))
    f[0] = f[1]
    psd = 1e-20 * (1.0 + 100.0 / f)
    bank = filterbank.make_of1x1_bank(tmpl, psd, FS, pretrig)
    host = bank.to_device(np.float32)

    hperm = dfft.half_perm_indices(n)
    assert hperm is not None, "perm path does not engage at this N"
    host_p = filterbank.permute_half_bank(host, hperm)
    dev_n = jax.tree.map(jnp.asarray, host)
    dev_p = jax.tree.map(jnp.asarray, host_p)
    spec_k = jnp.asarray(hperm)

    def step_perm(traces, dev):
        bh = filterbank.device_bank_1x1_half(dev)
        vr = of1x1.signal_rfft_perm(traces[:, None, :])
        wd = of1x1.of1x1_withdelay_half_perm(
            vr, bh.phi, bh.norm, bh.denom_inv, bh.s_fft, bh.bin_w,
            pretrig, FS, n, spec_k)
        nod = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                       bh.s_fft, bh.bin_w, n=n,
                                       spec_k=spec_k)
        return wd.amp, wd.t0, wd.chi2, nod.amp, nod.chi2

    def step_nat(traces, dev):
        bh = filterbank.device_bank_1x1_half(dev)
        vr = of1x1.signal_rfft(traces[:, None, :])
        wd = of1x1.of1x1_withdelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                        bh.s_fft, bh.bin_w, pretrig, FS)
        nod = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                       bh.s_fft, bh.bin_w, n=n)
        return wd.amp, wd.t0, wd.chi2, nod.amp, nod.chi2

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n), jnp.float32) * 3e-9 \
        + 2e-6 * jnp.asarray(tmpl, jnp.float32)[None, :]
    _sync(x[0, :1])

    jp = jax.jit(step_perm)
    dt_p = timeit_pipelined(jp, [(x, dev_p)] * k, (x, dev_p))
    with force_natural():
        jn = jax.jit(step_nat)
        out = jn(x, dev_n)          # trace+compile inside the patch
        _sync(out[0])
    dt_n = timeit_pipelined(jn, [(x, dev_n)] * k, (x, dev_n))

    # equality spot-check (same data, both paths)
    a_p = np.asarray(jp(x, dev_p)[0])
    a_n = np.asarray(jn(x, dev_n)[0])
    rel = float(np.max(np.abs(a_p - a_n) / np.maximum(np.abs(a_n), 1e-30)))
    return {"config": "feature of1x1 nodelay+withdelay 1024x32k",
            "natural_ms": round(dt_n / k * 1e3, 2),
            "perm_ms": round(dt_p / k * 1e3, 2),
            "natural_events_per_sec": round(b * k / dt_n, 0),
            "perm_events_per_sec": round(b * k / dt_p, 0),
            "perm_speedup": round(dt_n / dt_p, 3),
            "max_rel_amp_diff": rel}


def ab_trigger(quick=False):
    """Continuous trigger (FIR + delta-chi2 + tiled merge), 8 x 1.25 Ms."""
    import jax
    import jax.numpy as jnp
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank, trigger

    nt, pretrig = 4096, 1024
    l, e = 1_250_000, 8
    k = 4 if quick else 32
    tmpl = pulse.make_template(FS, nt, pretrig, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    psd = np.full(nt, 4e-18)
    bank = filterbank.make_ofnxm_bank(tmpl, psd.astype(complex), FS,
                                      pretrig)
    thr = trigger.chi2_threshold(5.0, 1)

    def make_step(kernel):
        def one(x):
            qb, _ = trigger.of_fir_blocks(x, kernel)
            iw = jnp.asarray(kernel.iw_matrix)
            d = trigger.delta_chi2_from_q(qb, iw)
            ts = trigger.find_triggers_tiled(d, qb, thr, 125, 512,
                                             amps_transform=iw)
            return ts.indices, ts.count
        return jax.jit(jax.vmap(one))

    @jax.jit
    def make_x(key):
        return jax.random.normal(key, (e, 1, l), jnp.float32) * np.sqrt(
            psd[0] * FS).astype(np.float32)

    xs = [make_x(kk) for kk in jax.random.split(jax.random.PRNGKey(4), 4)]
    _sync(xs[-1][0, 0, :1])

    kern_p = trigger.make_trigger_kernel(bank)
    step_p = make_step(kern_p)
    dt_p = timeit_pipelined(step_p, [(xs[i % 4],) for i in range(k)],
                            (xs[0],))
    with force_natural():
        kern_n = trigger.make_trigger_kernel(bank)
        step_n = make_step(kern_n)
        out = step_n(xs[0])
        _sync(out[1])
    dt_n = timeit_pipelined(step_n, [(xs[i % 4],) for i in range(k)],
                            (xs[0],))

    c_p = int(np.asarray(step_p(xs[0])[1]).sum())
    c_n = int(np.asarray(step_n(xs[0])[1]).sum())
    return {"config": "continuous trigger 8x1.25Ms",
            "natural_msamples_per_sec": round(k * e * l / dt_n / 1e6, 1),
            "perm_msamples_per_sec": round(k * e * l / dt_p / 1e6, 1),
            "perm_speedup": round(dt_n / dt_p, 3),
            "count_match": c_p == c_n}


def ab_psd(quick=False):
    """Welch two-sided PSD, 1024 traces x 32k."""
    import jax
    import jax.numpy as jnp
    from detprocess_tpu.ops import spectral

    n, b = 32768, 1024
    k = 4 if quick else 16
    x = jax.random.normal(jax.random.PRNGKey(7), (b, n), jnp.float32)
    _sync(x[0, :1])

    jp = jax.jit(lambda t: spectral.welch_psd(t, FS))
    dt_p = timeit_pipelined(jp, [(x,)] * k, (x,))
    with force_natural():
        jn = jax.jit(lambda t: spectral.welch_psd(t, FS))
        _sync(jn(x))
    dt_n = timeit_pipelined(jn, [(x,)] * k, (x,))
    # candidate C: packed half-size FFT, reversal-free per trace
    # (spectral.welch_psd_packed — promote to the default if it wins)
    jc = jax.jit(lambda t: spectral.welch_psd_packed(t, FS))
    dt_c = timeit_pipelined(jc, [(x,)] * k, (x,))

    p_p, p_n = np.asarray(jp(x)), np.asarray(jn(x))
    p_c = np.asarray(jc(x))
    rel = float(np.max(np.abs(p_p - p_n) / np.maximum(np.abs(p_n), 1e-40)))
    rel_c = float(np.max(np.abs(p_c - p_p)
                         / np.maximum(np.abs(p_p), 1e-40)))
    return {"config": "welch PSD 1024x32k",
            "natural_traces_per_sec": round(b * k / dt_n, 0),
            "perm_traces_per_sec": round(b * k / dt_p, 0),
            "packed_traces_per_sec": round(b * k / dt_c, 0),
            "perm_speedup": round(dt_n / dt_p, 3),
            "packed_speedup_vs_perm": round(dt_p / dt_c, 3),
            "max_rel_psd_diff": rel,
            "max_rel_packed_diff": rel_c}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", choices=["feature", "trigger", "psd"])
    ap.add_argument("--cpu", action="store_true",
                    help="force host CPU (env var alone is not enough: "
                         "the TPU plugin overrides JAX_PLATFORMS and "
                         "hangs when the tunnel is down)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    benches = {"feature": ab_feature, "trigger": ab_trigger,
               "psd": ab_psd}
    names = [args.only] if args.only else list(benches)
    for name in names:
        res = benches[name](quick=args.quick)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
