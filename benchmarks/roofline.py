"""Roofline accounting for the five BASELINE kernels (round-3 VERDICT
item 1): measure the chip's achievable HBM bandwidth and MXU rate with
micro-kernels, then place each pipeline kernel against exact bytes-moved
and FLOP counts.

Outputs one JSON line per row; the numbers go into BASELINE.md's
roofline table.
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
from detprocess_tpu.ops import filterbank, of1x1, spectral, trigger
from detprocess_tpu.ops import fft as dfft

FS = 1.25e6


def _sync(x):
    np.asarray(x).ravel()[:1]


def timeit(fn, args, k=16):
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(k)]
    last = outs[-1]
    _sync(last[0] if isinstance(last, tuple) else last)
    return (time.perf_counter() - t0) / k


def peak_hbm():
    """Achievable HBM read bandwidth: full-array reduction of a 256 MB
    array (returning the scaled array itself would push 256 MB through
    the ~20 MB/s host tunnel at sync time and corrupt the timing; the
    reduction reads every element once and returns a scalar)."""
    n = 64 * 1024 * 1024
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def step(x):
        return jnp.sum(x * jnp.float32(1.0000001))

    dt = timeit(step, (x,))
    gb = n * 4 / 1e9
    return {"row": "peak_hbm_read", "gb_per_s": round(gb / dt, 1),
            "ms": round(dt * 1e3, 3)}


def peak_mxu():
    """Achievable MXU rate: large bf16 matmul (scalar-reduced output —
    see peak_hbm for why)."""
    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def step(a, b):
        return jnp.sum(jnp.dot(a, b,
                               preferred_element_type=jnp.float32))

    dt = timeit(step, (a, b), k=8)
    tflops = 2 * n**3 / dt / 1e12
    return {"row": "peak_mxu_bf16", "tflops": round(tflops, 1),
            "ms": round(dt * 1e3, 3)}


def feature_of1x1():
    """Feature of1x1 chain at the BASELINE shape (1024 × 32k)."""
    n, pretrig, b = 32768, 16384, 1024
    tmpl = pulse.make_template(FS, n, pretrig, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    psd = np.full(n, 1e-20)
    bank = filterbank.make_of1x1_bank(tmpl, psd, FS, pretrig)
    dev = jax.tree.map(jnp.asarray, bank.to_device(np.float32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

    def rfft_only(x, d):
        # sum of |V| — complex arrays can't cross the host boundary on
        # this backend, and the reduction adds one cheap pass
        return jnp.sum(jnp.abs(of1x1.signal_rfft(x[:, None, :])),
                       axis=-1)

    def nodelay(x, d):
        bh = filterbank.device_bank_1x1_half(d)
        vr = of1x1.signal_rfft(x[:, None, :])
        r = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                     bh.s_fft, bh.bin_w, n=n)
        return r.amp[:, 0], r.chi2[:, 0]

    def withdelay(x, d):
        bh = filterbank.device_bank_1x1_half(d)
        vr = of1x1.signal_rfft(x[:, None, :])
        r = of1x1.of1x1_withdelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                       bh.s_fft, bh.bin_w, pretrig, FS)
        return r.amp[:, 0], r.t0[:, 0]

    rows = []
    for name, fn in (("feature_rfft_only", rfft_only),
                     ("feature_nodelay", nodelay),
                     ("feature_withdelay", withdelay)):
        dt = timeit(jax.jit(fn), (x, dev))
        in_gb = b * n * 4 / 1e9
        # matmul-FFT flops: four-step real FFT ≈ 2 complex matmuls over
        # the factorized axes ≈ 8·N·sqrt(N) real MACs per event (exact
        # count depends on the factorization; this is the bf16-pass-1
        # number — HIGHEST precision multiplies it by 6)
        fft_flops = 2 * 8 * n * int(np.sqrt(n)) * b
        rows.append({"row": name, "ms": round(dt * 1e3, 2),
                     "events_per_s": round(b / dt, 1),
                     "input_gb_per_s": round(in_gb / dt, 1),
                     "fft_tflops_1pass_equiv": round(
                         fft_flops / dt / 1e12, 2)})
    return rows


def psd_build():
    n, b = 32768, 2048
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

    @jax.jit
    def step(x):
        return spectral.welch_psd(x, FS)

    dt = timeit(step, (x,))
    in_gb = b * n * 4 / 1e9
    return {"row": "psd_welch", "ms": round(dt * 1e3, 2),
            "events_per_s": round(b / dt, 1),
            "input_gb_per_s": round(in_gb / dt, 1)}


def nxm_chain():
    """NxM withdelay chain at the BASELINE config-4 shape (1024×4×8k).

    Bytes accounting for the packed chain (per dispatch, complex64
    spectra), used in BASELINE.md's roofline table:
      forward half-size FFT    : r 0.134 + w 0.134 GB (Z [B,C,N/2] c64)
      channel mix P·Z+Q·conj(Zr): r 0.268 (Z fwd+rev) + w 0.067 (zp, M=2)
      inverse FFT + retangle   : r 0.067 + w 0.067 (q_scan [B,M,N] f32)
      dchi2 einsum             : r 0.067 + w 0.034
      pick/argmax + q_best     : r 0.034 + r 0.067(gather)
      chi2_base (re-reads Z,Zr): r 0.268
    ≈ 1.2 GB/dispatch ⇒ ~12.5 ms at the measured 96 GB/s bound.
    """
    c, m, n, pretrig, b = 4, 2, 8192, 4096, 1024
    t1 = pulse.make_template(FS, n, pretrig, A=1.0, tau_r=10e-6,
                             tau_f1=80e-6)
    t2 = pulse.make_template(FS, n, pretrig, A=1.0, tau_r=20e-6,
                             tau_f1=300e-6)
    tmpl = np.zeros((c, m, n))
    for ch in range(c):
        tmpl[ch, 0] = t1 * (1.0 if ch % 2 == 0 else 0.3)
        tmpl[ch, 1] = t2 * (1.0 if ch % 2 == 1 else 0.3)
    csd = np.zeros((c, c, n), dtype=complex)
    for ch in range(c):
        csd[ch, ch] = 1e-20
    bank = filterbank.make_ofnxm_bank(tmpl, csd, FS, pretrig)
    from detprocess_tpu.ops import fft as dfft
    from detprocess_tpu.ops import ofnxm
    packed = dfft.site_packed(n, "feature")
    host = dict(bank.to_device(np.float32))
    if packed:
        host["pk"] = filterbank.packed_nxm_coeffs(bank, np.float32)
    dev = jax.tree.map(jnp.asarray, host)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((b, c, n)).astype(np.float32))

    def withdelay(x, d):
        nb = filterbank.device_bank_nxm(d)
        if packed:
            z, zr = dfft.packed_spectrum(x)
            r = ofnxm.ofnxm_withdelay_packed(z, zr,
                                             ofnxm.device_packed_nxm(
                                                 d["pk"]),
                                             nb.iw_matrix, pretrig, FS, n)
        else:
            vfft = of1x1.signal_fft(x)
            r = ofnxm.ofnxm_withdelay(vfft, nb.phi, nb.w_matrix,
                                      nb.iw_matrix, nb.icsd, pretrig, FS)
        return r.amps, r.t0

    dt = timeit(jax.jit(withdelay), (x, dev))
    moved_gb = 1.2 if packed else 2.2       # accounting above
    return {"row": "nxm_withdelay" + ("_packed" if packed else ""),
            "ms": round(dt * 1e3, 2),
            "events_per_s": round(b / dt, 1),
            "accounted_gb": moved_gb,
            "achieved_gb_per_s": round(moved_gb / dt, 1)}


def trigger_stages():
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
    rng = np.random.default_rng(4)
    x = jnp.asarray((rng.standard_normal((e, 1, l))
                     * np.sqrt(psd[0] * FS)).astype(np.float32))

    def fir_dchi2(x):
        def one(t):
            qb, _ = trigger.of_fir_blocks(t, kernel)
            return jnp.sum(trigger.delta_chi2_from_q(qb, iw), axis=-1)
        return jax.vmap(one)(x)

    def full_tiled(x):
        def one(t):
            qb, _ = trigger.of_fir_blocks(t, kernel)
            d = trigger.delta_chi2_from_q(qb, iw)
            ts = trigger.find_triggers_tiled(d, qb, thr, window, 512,
                                             amps_transform=iw)
            return ts.indices, ts.count
        return jax.vmap(one)(x)

    rows = []
    for name, fn in (("trigger_fir+dchi2", fir_dchi2),
                     ("trigger_full_tiled", full_tiled)):
        dt = timeit(jax.jit(fn), (x,))
        ms10 = dt * 1e3 / (e * l / 1e7)
        rows.append({"row": name,
                     "ms_per_10Msamples": round(ms10, 2),
                     "Msamples_per_sec": round(e * l / dt / 1e6, 1),
                     "input_gb_per_s": round(e * l * 4 / dt / 1e9, 1)})
    return rows


def main():
    print(json.dumps(peak_hbm()), flush=True)
    print(json.dumps(peak_mxu()), flush=True)
    for r in feature_of1x1():
        print(json.dumps(r), flush=True)
    print(json.dumps(psd_build()), flush=True)
    print(json.dumps(nxm_chain()), flush=True)
    for r in trigger_stages():
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
