"""Packed (Z-domain) NxM kernels equal the full-spectrum kernels.

Float64 equality against ofnxm_nodelay / ofnxm_withdelay / chi2_base_nxm
on a CSD with frequency-dependent cross-channel phase (the regression
class that caught the round-2 conjugation bug), covering the no-delay
fit, unconstrained and masked delay scans, and parabolic interpolation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detprocess_tpu.models import pulse
from detprocess_tpu.ops import filterbank, of1x1, ofnxm
from detprocess_tpu.ops import fft as dfft

from reference_impl import generate_correlated_noise

FS = 1.25e6
N = 16384               # four-step engages (n > MAX_NATIVE_FFT)
PRETRIG = 4096
NB = 4
C = 2


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(23)
    t1 = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=20e-6,
                             tau_f1=200e-6)
    t2 = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=12e-6,
                             tau_f1=90e-6)
    tmpl = np.zeros((C, 2, N))
    tmpl[0, 0] = t1
    tmpl[1, 1] = t2
    f = np.abs(np.fft.fftfreq(N, 1 / FS))
    f[0] = f[1]
    # cross-channel term with frequency-dependent phase, Hermitian and
    # J(-f) = J(f)* per element (physical CSD of real noise)
    csd = np.zeros((C, C, N), complex)
    csd[0, 0] = 1e-20 * (1 + 50 / f)
    csd[1, 1] = 2e-20
    ph = np.exp(1j * 2 * np.pi * np.fft.fftfreq(N) * 37.0)
    csd[0, 1] = 3e-21 * ph
    csd[1, 0] = np.conj(csd[0, 1])
    bank = filterbank.make_ofnxm_bank(tmpl, csd, FS, PRETRIG)
    assert dfft.half_perm_indices(N) is not None

    traces = generate_correlated_noise(csd, FS, NB, rng)
    traces[:, 0] += 2e-6 * np.roll(t1, 40)
    traces[:, 1] += 1e-6 * np.roll(t2, 40)

    dev = jax.tree.map(jnp.asarray, bank.to_device(np.float64))
    nb = filterbank.device_bank_nxm(dev)
    pk = ofnxm.device_packed_nxm(jax.tree.map(
        jnp.asarray, filterbank.packed_nxm_coeffs(bank, np.float64)))
    vfft = of1x1.signal_fft(jnp.asarray(traces))
    Z, Zr = dfft.packed_spectrum(jnp.asarray(traces))
    return bank, nb, pk, vfft, Z, Zr


def test_chi2_base_packed(setup):
    bank, nb, pk, vfft, Z, Zr = setup
    c0_f = np.asarray(ofnxm.chi2_base_nxm(vfft, nb.icsd, FS))
    c0_p = np.asarray(ofnxm.chi2_base_nxm_packed(Z, Zr, pk, N))
    np.testing.assert_allclose(c0_p, c0_f, rtol=1e-10)


def test_nodelay_packed(setup):
    bank, nb, pk, vfft, Z, Zr = setup
    rf = ofnxm.ofnxm_nodelay(vfft, nb.phi, nb.iw_matrix, nb.icsd, FS)
    rp = ofnxm.ofnxm_nodelay_packed(Z, Zr, pk, nb.iw_matrix, N)
    np.testing.assert_allclose(np.asarray(rp.amps), np.asarray(rf.amps),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(rp.chi2), np.asarray(rf.chi2),
                               rtol=1e-9)


@pytest.mark.parametrize("mode", ["free", "masked", "interp"])
def test_withdelay_packed(setup, mode):
    bank, nb, pk, vfft, Z, Zr = setup
    wmask = None
    if mode != "free":
        wmask = np.zeros(N, bool)
        wmask[PRETRIG - 300:PRETRIG + 300] = True
    rf = ofnxm.ofnxm_withdelay(
        vfft, nb.phi, nb.w_matrix, nb.iw_matrix, nb.icsd, PRETRIG, FS,
        window_mask=(None if wmask is None else jnp.asarray(wmask)),
        interpolate_t0=(mode == "interp"))
    rp = ofnxm.ofnxm_withdelay_packed(
        Z, Zr, pk, nb.iw_matrix, PRETRIG, FS, N, window_mask=wmask,
        interpolate_t0=(mode == "interp"))
    np.testing.assert_allclose(np.asarray(rp.amps), np.asarray(rf.amps),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(rp.chi2), np.asarray(rf.chi2),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(rp.t0), np.asarray(rf.t0),
                               rtol=0, atol=1e-9 / FS if mode != "interp"
                               else 1e-6 / FS)


def test_packed_exact_on_asymmetric_bank(setup):
    """The packed fold must equal the full-spectrum kernels even when
    phi / icsd break the J(−f) = J(f)* mirror symmetry (asymmetric
    notching or a user-supplied CSD): packed_nxm_coeffs folds from the
    FULL arrays with φ_sym = (φ_k + conj φ_{n−k})/2 and
    J_sym = (J_k + J_{n−k}ᵀ)/2 — exactly the projection the comparator
    kernels' trailing .real applies. Before that fold the packed chain
    silently assumed symmetry and diverged here."""
    bank, nb, pk, vfft, Z, Zr = setup
    k0 = 1234                       # positive-frequency bin, mirror kept
    phi2 = bank.phi.copy()
    phi2[..., k0] = 0.0
    icsd2 = bank.icsd.copy()
    icsd2[k0] *= 0.35
    bank2 = bank._replace(phi=phi2, icsd=icsd2)
    dev2 = jax.tree.map(jnp.asarray, bank2.to_device(np.float64))
    nb2 = filterbank.device_bank_nxm(dev2)
    pk2 = ofnxm.device_packed_nxm(jax.tree.map(
        jnp.asarray, filterbank.packed_nxm_coeffs(bank2, np.float64)))
    rf = ofnxm.ofnxm_withdelay(vfft, nb2.phi, nb2.w_matrix, nb2.iw_matrix,
                               nb2.icsd, PRETRIG, FS)
    rp = ofnxm.ofnxm_withdelay_packed(Z, Zr, pk2, nb2.iw_matrix,
                                      PRETRIG, FS, N)
    np.testing.assert_allclose(np.asarray(rp.amps), np.asarray(rf.amps),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(rp.chi2), np.asarray(rf.chi2),
                               rtol=1e-8)
    np.testing.assert_array_equal(np.asarray(rp.t0), np.asarray(rf.t0))
    r0f = ofnxm.ofnxm_nodelay(vfft, nb2.phi, nb2.iw_matrix, nb2.icsd, FS)
    r0p = ofnxm.ofnxm_nodelay_packed(Z, Zr, pk2, nb2.iw_matrix, N)
    np.testing.assert_allclose(np.asarray(r0p.amps), np.asarray(r0f.amps),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(r0p.chi2), np.asarray(r0f.chi2),
                               rtol=1e-9)


def test_notch_mask_symmetric_drops():
    """notch_bin_mask drops both ±f partners of every notched bin, so
    the mask keeps the Hermitian symmetry the half-spectrum and packed
    chains fold over — including when the target frequency falls exactly
    between bins and the per-side argmin tie-breaks differ."""
    n, fs = 4096, 1.25e6
    df = fs / n
    # exactly between two bins: f = (k + 1/2)·df
    peaks = [10.5 * df, 700.25 * df, 60.0]
    keep = filterbank.notch_bin_mask(n, fs, peaks, ignore_harmonics=True)
    mirrored = keep[(n - np.arange(n)) % n]
    np.testing.assert_array_equal(keep, mirrored)
