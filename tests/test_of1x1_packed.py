"""Packed (Z-domain) of1x1 chain equals the half-spectrum kernels.

The packed chain (ops/fft.packed_spectrum + ops/of1x1 ``*_packed``)
never materializes the half spectrum: the forward untangle, the OF
filter multiply, the inverse retangle, the χ²-base reduction, and the
no-delay fit all run as host-precomputed per-bin combinations of the
packed pair (Z, Z_rev) (ops/filterbank.packed_half_coeffs). These tests
pin it to the shipping half-spectrum kernels in float64, where the only
difference is summation order (~1e-12), across: no-delay, unconstrained
and masked delay scans, parabolic interpolation, the low-frequency
residual χ² (gather table), and multi-slot banks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detprocess_tpu.models import pulse
from detprocess_tpu.ops import filterbank, of1x1
from detprocess_tpu.ops import fft as dfft

FS = 1.25e6
N = 16384                # n//2 = 8192 > MAX_NATIVE_FFT → packed engages
PRETRIG = 4096
NB = 8


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(17)
    t1 = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=20e-6,
                             tau_f1=200e-6)
    t2 = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=12e-6,
                             tau_f1=90e-6)
    f = np.abs(np.fft.fftfreq(N, 1 / FS))
    f[0] = f[1]
    psd1 = 1e-20 * (1 + 100 / f)
    psd2 = 3e-20 * (1 + 20 / f)
    traces = rng.standard_normal((NB, N)) * 1e-8
    traces += rng.uniform(1e-6, 3e-6, NB)[:, None] * np.stack(
        [np.roll(t1, s) for s in rng.integers(-150, 150, NB)])
    bank = filterbank.make_of1x1_bank(np.stack([t1, t2]),
                                      np.stack([psd1, psd2]),
                                      FS, PRETRIG)
    assert dfft.half_perm_indices(N) is not None
    dev = jax.tree.map(jnp.asarray, bank.to_device(np.float64))
    pk_host = filterbank.packed_half_coeffs(bank, np.float64)
    pk = of1x1.device_packed_1x1(jax.tree.map(jnp.asarray, pk_host))
    lmask = of1x1.lowfreq_mask_half(N, FS, 20000.0)
    low_host = filterbank.packed_low_table(bank, lmask, np.float64)
    low = jax.tree.map(jnp.asarray, low_host)
    vr = of1x1.signal_rfft(jnp.asarray(traces)[:, None, :])
    Z, Zr = dfft.packed_spectrum(jnp.asarray(traces)[:, None, :])
    return traces, bank, dev, pk, low, lmask, vr, Z, Zr


def _half_bank(dev):
    return filterbank.device_bank_1x1_half(dev)


def _slot_low(low, s):
    low_s = dict(low)
    for key in ("lw_s", "lw_u", "lw_nyq_s", "lw_nyq_u"):
        low_s[key] = low[key][s]
    return low_s


def _cmp(res_p, res_h, t0_exact=True):
    np.testing.assert_allclose(np.asarray(res_p.amp), np.asarray(res_h.amp),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(res_p.chi2),
                               np.asarray(res_h.chi2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res_p.lowchi2),
                               np.asarray(res_h.lowchi2), rtol=1e-9)
    if t0_exact:
        np.testing.assert_array_equal(np.asarray(res_p.t0),
                                      np.asarray(res_h.t0))
    else:
        np.testing.assert_allclose(np.asarray(res_p.t0),
                                   np.asarray(res_h.t0), rtol=0,
                                   atol=1e-12)


@pytest.mark.parametrize("slot", [0, 1])
def test_nodelay_packed_equals_half(setup, slot):
    traces, bank, dev, pk, low, lmask, vr, Z, Zr = setup
    bh = _half_bank(dev)
    s = slice(slot, slot + 1)
    res_h = of1x1.of1x1_nodelay_half(vr, bh.phi[s], bh.norm[s],
                                     bh.denom_inv[s], bh.s_fft[s],
                                     bh.bin_w, low_mask_h=jnp.asarray(lmask),
                                     n=N)
    pk_s = of1x1.DevicePacked1x1(pk.P[s], pk.Q[s], pk.alpha[s], pk.g[s],
                                 pk.H[s], pk.norm[s])
    low_s = _slot_low(low, s)
    res_p = of1x1.of1x1_nodelay_packed(Z, Zr, pk_s, N, low=low_s)
    _cmp(res_p, res_h)


@pytest.mark.parametrize("mode", ["free", "masked", "interp"])
def test_withdelay_packed_equals_half(setup, mode):
    traces, bank, dev, pk, low, lmask, vr, Z, Zr = setup
    bh = _half_bank(dev)
    s = slice(0, 1)
    wmask = None
    if mode == "masked":
        wmask = np.zeros(N, bool)
        wmask[PRETRIG - 400:PRETRIG + 400] = True
    res_h = of1x1.of1x1_withdelay_half(
        vr, bh.phi[s], bh.norm[s], bh.denom_inv[s], bh.s_fft[s], bh.bin_w,
        PRETRIG, FS,
        window_mask=(None if wmask is None else jnp.asarray(wmask)),
        low_mask_h=jnp.asarray(lmask),
        interpolate_t0=(mode == "interp"), n=N)
    pk_s = of1x1.DevicePacked1x1(pk.P[s], pk.Q[s], pk.alpha[s], pk.g[s],
                                 pk.H[s], pk.norm[s])
    low_s = _slot_low(low, s)
    res_p = of1x1.of1x1_withdelay_packed(
        Z, Zr, pk_s, PRETRIG, FS, N, window_mask=wmask, low=low_s,
        interpolate_t0=(mode == "interp"))
    _cmp(res_p, res_h, t0_exact=(mode != "interp"))
    if mode == "interp":
        np.testing.assert_allclose(np.asarray(res_p.t0),
                                   np.asarray(res_h.t0), rtol=1e-8,
                                   atol=1e-12)


def test_chi2_base_packed_equals_half(setup):
    traces, bank, dev, pk, low, lmask, vr, Z, Zr = setup
    bh = _half_bank(dev)
    c0_h = np.asarray(of1x1.chi2_base_half(vr, bh.denom_inv, bh.bin_w))
    c0_p = np.asarray(of1x1.chi2_base_packed(Z, Zr, pk.alpha, pk.g))
    np.testing.assert_allclose(c0_p, c0_h, rtol=1e-11)


def test_packed_spectrum_matches_rfft(setup):
    """The packed pair reconstructs the half spectrum through the
    untangle identity V = A·Z + B·conj(Z_rev)."""
    traces, *_ = setup
    m = N // 2
    Z, Zr = dfft.packed_spectrum(jnp.asarray(traces))
    Z = np.asarray(Z)
    Zr = np.asarray(Zr)
    pm = dfft.perm_indices(m)
    k = pm.astype(float)
    w = np.exp(-2j * np.pi * k / N)
    A = 0.5 * (1 - 1j * w)
    B = 0.5 * (1 + 1j * w)
    v_st = A * Z + B * np.conj(Zr)
    vr = np.fft.rfft(traces)
    np.testing.assert_allclose(v_st, vr[:, pm], rtol=0,
                               atol=1e-9 * np.max(np.abs(vr)))
    # Nyquist from Z_0
    nyq = Z[..., 0].real - Z[..., 0].imag
    np.testing.assert_allclose(nyq, vr[:, m].real, rtol=0,
                               atol=1e-9 * np.max(np.abs(vr)))


def test_low_table_nyquist_bin(setup):
    """lowchi2_fcutoff ≥ fs/2 selects the Nyquist bin — the packed low
    table must carry it (as the separate Z_0 combination) and match the
    half-spectrum residual χ² over the same full mask (this crashed at
    plan build before the lw_nyq_* term existed)."""
    traces, bank, dev, pk, low, lmask, vr, Z, Zr = setup
    bh = _half_bank(dev)
    mask = of1x1.lowfreq_mask_half(N, FS, FS)      # all bins incl. Nyquist
    assert mask[-1]
    lt = jax.tree.map(jnp.asarray,
                      filterbank.packed_low_table(bank, mask, np.float64))
    s = slice(0, 1)
    res_h = of1x1.of1x1_withdelay_half(
        vr, bh.phi[s], bh.norm[s], bh.denom_inv[s], bh.s_fft[s], bh.bin_w,
        PRETRIG, FS, low_mask_h=jnp.asarray(mask), n=N)
    pk_s = of1x1.DevicePacked1x1(pk.P[s], pk.Q[s], pk.alpha[s], pk.g[s],
                                 pk.H[s], pk.norm[s])
    res_p = of1x1.of1x1_withdelay_packed(
        Z, Zr, pk_s, PRETRIG, FS, N, low=_slot_low(lt, s))
    np.testing.assert_allclose(np.asarray(res_p.lowchi2),
                               np.asarray(res_h.lowchi2), rtol=1e-9)
