"""Permuted (blocked four-step) storage-order transforms and the OF
kernels that consume them.

The transpose-free path (ops/fft.fft_perm / rfft_perm / ifft_fromperm /
irfft_fromperm) keeps the forward spectrum in the four-step FFT's blocked
[k1, k2] storage order and runs the inverse decomposition that consumes
exactly that order while emitting natural time order — eliminating the
transpose HBM passes that bound the feature OF chain (BASELINE.md
roofline). These tests prove the permuted path is numerically identical
to the natural-order path, both at the transform level (vs numpy) and at
the OF-kernel level (vs the natural half-spectrum kernels), and that the
feature pipeline produces the same tables with the path on and off.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detprocess_tpu.models import pulse
from detprocess_tpu.ops import fft as dfft
from detprocess_tpu.ops import filterbank, of1x1

FS = 1.25e6
N = 16384            # m = N//2 = 8192 > MAX_NATIVE_FFT → perm path engages
PRETRIG = 4096


# ---------------------------------------------------------------------------
# transform primitives
# ---------------------------------------------------------------------------

def test_perm_indices_is_permutation():
    for n in (8192, 16384, 12000):
        pm = dfft.perm_indices(n)
        assert pm is not None
        assert np.array_equal(np.sort(pm), np.arange(n))
    assert dfft.perm_indices(4096) is None


def test_fft_perm_matches_numpy_under_permutation():
    rng = np.random.default_rng(7)
    for n in (8192, 16384, 12000):
        x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
        pm = dfft.perm_indices(n)
        got = np.asarray(dfft.fft_perm(jnp.asarray(x)))
        ref = np.fft.fft(x, axis=-1)
        scale = np.max(np.abs(ref))
        np.testing.assert_allclose(got, ref[:, pm], rtol=0,
                                   atol=1e-9 * scale)


def test_ifft_fromperm_inverts_in_natural_order():
    rng = np.random.default_rng(8)
    for n in (8192, 16384, 12000):
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        xp = dfft.fft_perm(jnp.asarray(x))
        back = np.asarray(dfft.ifft_fromperm(xp))
        np.testing.assert_allclose(back, x, rtol=0,
                                   atol=1e-9 * np.max(np.abs(x)))
        # and against numpy consuming the same permuted input
        pm = dfft.perm_indices(n)
        inv = np.argsort(pm)
        ref = np.fft.ifft(np.asarray(xp)[:, inv], axis=-1)
        np.testing.assert_allclose(back, ref, rtol=0,
                                   atol=1e-9 * np.max(np.abs(ref)))


def test_half_perm_indices_layout():
    n = N
    hp = dfft.half_perm_indices(n)
    m = n // 2
    assert hp is not None and len(hp) == m + 1
    assert hp[-1] == m                       # Nyquist last
    assert np.array_equal(np.sort(hp), np.arange(m + 1))
    assert dfft.half_perm_indices(8192 + 1) is None   # odd n
    assert dfft.half_perm_indices(4096) is None       # m native


def test_rfft_perm_matches_numpy_under_permutation():
    rng = np.random.default_rng(9)
    for n in (16384, 32768, 12000, 20000):
        x = rng.standard_normal((3, n))
        hp = dfft.half_perm_indices(n)
        got = np.asarray(dfft.rfft_perm(jnp.asarray(x)))
        ref = np.fft.rfft(x, axis=-1)
        np.testing.assert_allclose(got, ref[:, hp], rtol=0,
                                   atol=1e-9 * np.max(np.abs(ref)))


def test_irfft_fromperm_roundtrip_and_numpy():
    rng = np.random.default_rng(10)
    for n in (16384, 32768, 12000):
        x = rng.standard_normal((2, n))
        xp = dfft.rfft_perm(jnp.asarray(x))
        back = np.asarray(dfft.irfft_fromperm(xp, n))
        np.testing.assert_allclose(back, x, atol=1e-9)
        # arbitrary (non-conjugate-consistent-free) half spectrum too:
        hp = dfft.half_perm_indices(n)
        half = (rng.standard_normal((2, n // 2 + 1))
                + 1j * rng.standard_normal((2, n // 2 + 1)))
        half[:, 0] = half[:, 0].real
        half[:, -1] = half[:, -1].real
        ref = np.fft.irfft(half, n, axis=-1)
        got = np.asarray(dfft.irfft_fromperm(jnp.asarray(half[:, hp]), n))
        np.testing.assert_allclose(got, ref, rtol=0,
                                   atol=1e-9 * np.max(np.abs(ref)))


# ---------------------------------------------------------------------------
# OF kernels on the permuted layout
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    template = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=20e-6,
                                   tau_f1=200e-6)
    f = np.abs(np.fft.fftfreq(N, 1 / FS))
    f[0] = f[1]
    psd = 1e-20 * (1 + 100 / f)
    traces = rng.standard_normal((8, N)) * 1e-8
    traces += rng.uniform(1e-6, 3e-6, 8)[:, None] * np.stack(
        [np.roll(template, s) for s in rng.integers(-150, 150, 8)])
    bank = filterbank.make_of1x1_bank(template, psd, FS, PRETRIG)
    dev = bank.to_device(np.float64)
    hp = dfft.half_perm_indices(N)
    devp = filterbank.permute_half_bank(dev, hp)
    bh = filterbank.device_bank_1x1_half(jax.tree.map(jnp.asarray, dev))
    bp = filterbank.device_bank_1x1_half(jax.tree.map(jnp.asarray, devp))
    vr = of1x1.signal_rfft(jnp.asarray(traces)[:, None, :])
    vp = of1x1.signal_rfft_perm(jnp.asarray(traces)[:, None, :])
    return traces, bh, bp, vr, vp, hp


def test_signal_rfft_perm_is_permuted_rfft(setup):
    _, _, _, vr, vp, hp = setup
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vr)[..., hp],
                               rtol=0,
                               atol=1e-9 * np.max(np.abs(np.asarray(vr))))


def test_nodelay_half_perm_equals_natural(setup):
    _, bh, bp, vr, vp, hp = setup
    lm = of1x1.lowfreq_mask_half(N, FS, 10000.0)
    nat = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                   bh.s_fft, bh.bin_w,
                                   jnp.asarray(lm), n=N)
    prm = of1x1.of1x1_nodelay_half(vp, bp.phi, bp.norm, bp.denom_inv,
                                   bp.s_fft, bp.bin_w,
                                   jnp.asarray(lm[hp]), n=N,
                                   spec_k=jnp.asarray(hp))
    for a, b in zip(nat, prm):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-9)


def test_withdelay_half_perm_equals_natural(setup):
    _, bh, bp, vr, vp, hp = setup
    lm = of1x1.lowfreq_mask_half(N, FS, 10000.0)
    wmask = np.zeros(N, dtype=bool)
    wmask[PRETRIG - 300:PRETRIG + 300] = True
    cases = [
        dict(),
        dict(window_mask=wmask),
        dict(window_mask=wmask, interpolate_t0=True),
        dict(interpolate_t0=True),
        dict(window_mask=wmask, low_mask_h=lm),
    ]
    for kw in cases:
        nat = of1x1.of1x1_withdelay_half(
            vr, bh.phi, bh.norm, bh.denom_inv, bh.s_fft, bh.bin_w,
            PRETRIG, FS,
            window_mask=(jnp.asarray(kw["window_mask"])
                         if "window_mask" in kw else None),
            low_mask_h=(jnp.asarray(kw["low_mask_h"])
                        if "low_mask_h" in kw else None),
            interpolate_t0=kw.get("interpolate_t0", False), n=N)
        prm = of1x1.of1x1_withdelay_half_perm(
            vp, bp.phi, bp.norm, bp.denom_inv, bp.s_fft, bp.bin_w,
            PRETRIG, FS, N, jnp.asarray(hp),
            window_mask=kw.get("window_mask"),
            low_mask_h=(jnp.asarray(kw["low_mask_h"][hp])
                        if "low_mask_h" in kw else None),
            interpolate_t0=kw.get("interpolate_t0", False))
        np.testing.assert_allclose(np.asarray(prm.amp), np.asarray(nat.amp),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(prm.t0), np.asarray(nat.t0),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(prm.chi2),
                                   np.asarray(nat.chi2), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(prm.lowchi2),
                                   np.asarray(nat.lowchi2), rtol=1e-9)


def test_windowed_direct_perm_equals_natural(setup):
    """The direct windowed DFT kernel fed permuted spectra (rows of
    cos/sin permuted to storage order) must match its natural-order
    run including the low-frequency residual chi2 (spec_k path)."""
    _, bh, bp, vr, vp, hp = setup
    lm = of1x1.lowfreq_mask_half(N, FS, 10000.0)
    wmask = np.zeros(N, dtype=bool)
    wmask[PRETRIG - 64:PRETRIG + 64] = True
    binw_host = np.asarray(bh.bin_w)
    eidx, valid, cmat, smat = of1x1.prepare_delay_window(
        wmask, PRETRIG, N, binw_host)
    nat = of1x1.of1x1_windowed_direct_half(
        vr, bh.phi, bh.norm, bh.denom_inv, bh.s_fft,
        bh.bin_w, PRETRIG, FS, eidx, valid,
        jnp.asarray(cmat), jnp.asarray(smat),
        low_mask_h=jnp.asarray(lm), interpolate_t0=True, n=N)
    prm = of1x1.of1x1_windowed_direct_half(
        vp, bp.phi, bp.norm, bp.denom_inv, bp.s_fft,
        bp.bin_w, PRETRIG, FS, eidx, valid,
        jnp.asarray(cmat[hp]), jnp.asarray(smat[hp]),
        low_mask_h=jnp.asarray(lm[hp]), interpolate_t0=True, n=N,
        spec_k=jnp.asarray(hp))
    for a, b in zip(nat, prm):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-9)


def test_ofnxm_perm_equals_natural():
    """NxM delay-scan kernels on the permuted full-spectrum layout
    (signal_fft_perm + permute_nxm_bank) equal the natural path: wide
    masked scan, narrow direct DFT matmul, nodelay, and ofnxmx2 (both
    the direct union branch and the wide ifft branch)."""
    from detprocess_tpu.ops import ofnxm

    n, pretrig = 16384, 4096
    rng = np.random.default_rng(12)
    t1 = pulse.make_template(FS, n, pretrig, A=1.0, tau_r=20e-6,
                             tau_f1=200e-6)
    t2 = pulse.make_template(FS, n, pretrig, A=1.0, tau_r=15e-6,
                             tau_f1=120e-6)
    tmpl = np.zeros((2, 2, n))
    tmpl[0, 0] = t1
    tmpl[1, 1] = t2
    f = np.abs(np.fft.fftfreq(n, 1 / FS))
    f[0] = f[1]
    csd = np.zeros((2, 2, n), complex)
    csd[0, 0] = 1e-20 * (1 + 50 / f)
    csd[1, 1] = 2e-20
    csd[0, 1] = csd[1, 0] = 2e-21
    bank = filterbank.make_ofnxm_bank(tmpl, csd, FS, pretrig)
    devn = bank.to_device(np.float64)
    pm = dfft.perm_indices(n)
    devp = filterbank.permute_nxm_bank(devn, pm)
    nb = filterbank.device_bank_nxm(jax.tree.map(jnp.asarray, devn))
    pb = filterbank.device_bank_nxm(jax.tree.map(jnp.asarray, devp))

    traces = rng.standard_normal((4, 2, n)) * 1e-8
    traces[:, 0] += 2e-6 * t1
    traces[:, 1] += 1e-6 * t2
    vf = of1x1.signal_fft(jnp.asarray(traces))
    vp = of1x1.signal_fft_perm(jnp.asarray(traces))

    wmask = np.zeros(n, bool)
    wmask[pretrig - 200:pretrig + 200] = True

    nat = ofnxm.ofnxm_withdelay(vf, nb.phi, nb.w_matrix, nb.iw_matrix,
                                nb.icsd, pretrig, FS,
                                window_mask=jnp.asarray(wmask),
                                interpolate_t0=True)
    prm = ofnxm.ofnxm_withdelay(vp, pb.phi, pb.w_matrix, pb.iw_matrix,
                                pb.icsd, pretrig, FS, window_mask=wmask,
                                interpolate_t0=True, spec_perm=pm)
    for a, b in zip(nat, prm):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8)

    # unconstrained scan too (no mask)
    nat_u = ofnxm.ofnxm_withdelay(vf, nb.phi, nb.w_matrix, nb.iw_matrix,
                                  nb.icsd, pretrig, FS)
    prm_u = ofnxm.ofnxm_withdelay(vp, pb.phi, pb.w_matrix, pb.iw_matrix,
                                  pb.icsd, pretrig, FS, spec_perm=pm)
    for a, b in zip(nat_u, prm_u):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8)

    # direct windowed DFT matmul with permuted rows
    eidx, valid, cmat, smat = of1x1.prepare_delay_window(wmask, pretrig, n)
    nat_d = ofnxm.ofnxm_withdelay_direct(
        vf, nb.phi, nb.w_matrix, nb.iw_matrix, nb.icsd, pretrig, FS,
        eidx, valid, cmat, smat, interpolate_t0=True)
    prm_d = ofnxm.ofnxm_withdelay_direct(
        vp, pb.phi, pb.w_matrix, pb.iw_matrix, pb.icsd, pretrig, FS,
        eidx, valid, cmat[pm], smat[pm], interpolate_t0=True)
    for a, b in zip(nat_d, prm_d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8)

    # nodelay is order-agnostic with consistently permuted inputs
    nat_n = ofnxm.ofnxm_nodelay(vf, nb.phi, nb.iw_matrix, nb.icsd, FS)
    prm_n = ofnxm.ofnxm_nodelay(vp, pb.phi, pb.iw_matrix, pb.icsd, FS)
    for a, b in zip(nat_n, prm_n):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8)

    # ofnxmx2: narrow windows (direct union branch) and a wide window2
    # (ifft branch; union > DIRECT_UNION_MAX)
    gids = np.array([0, 1])
    w1 = np.zeros(n, bool)
    w1[pretrig - 30:pretrig + 30] = True
    for w2_width in (40, 400):
        w2 = np.zeros(n, bool)
        w2[pretrig - w2_width:pretrig + w2_width] = True
        union = np.union1d(np.where(w1)[0], np.where(w2)[0])
        if w2_width == 400:
            assert len(union) > ofnxm.DIRECT_UNION_MAX
        (nat2, _) = ofnxm.ofnxmx2(vf, nb.s_fft, nb.icsd, gids, w1, w2,
                                  pretrig, FS)
        (prm2, _) = ofnxm.ofnxmx2(vp, pb.s_fft, pb.icsd, gids, w1, w2,
                                  pretrig, FS, spec_perm=pm)
        for a, b in zip(nat2, prm2):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-8)
