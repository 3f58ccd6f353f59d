"""On-device (real TPU) regression tests — the `-m tpu` lane.

Run:  DETPROC_TPU_TESTS=1 python -m pytest tests -m tpu -q

All other tests run float64 CPU goldens; a device-only regression (e.g.
in the four-step matmul FFT precision path, ops/fft.py, or the complex
split/join transfer conventions) would otherwise surface only as a
silently wrong benchmark. These tests pin the core kernels on the chip
with float32 tolerances. Kept deliberately small (~1 min warm) so they
can run every round next to bench.py.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


FS = 1.25e6
N = 32768
PRETRIG = N // 2


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if jax.devices()[0].platform not in ("tpu", "axon"):
        pytest.skip("no TPU device available")


@pytest.fixture(scope="module")
def bank_and_template():
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank

    template = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=20e-6,
                                   tau_f1=200e-6)
    psd = np.full(N, 1e-16)
    psd[0] = np.inf
    bank = filterbank.make_of1x1_bank(template, psd, FS, PRETRIG)
    dev = jax.tree.map(jnp.asarray, bank.to_device(np.float32))
    return template, bank, dev


def test_fft_large_n_roundtrip_f32():
    """32k four-step matmul FFT vs numpy, f32 tolerances."""
    from detprocess_tpu.ops import fft as dfft

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, N)).astype(np.float32)
    ref = np.fft.fft(x)

    @jax.jit
    def rt(x):
        xf = dfft.rfft(x, axis=-1)
        back = dfft.irfft(xf, N, axis=-1)
        return jnp.stack([xf.real, xf.imag], 0), back

    (ri, back) = rt(jnp.asarray(x))
    got = np.asarray(ri[0]) + 1j * np.asarray(ri[1])
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref[..., : N // 2 + 1])) < 2e-5 * scale
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-6)


def test_of1x1_full_equals_half_on_device(bank_and_template):
    from detprocess_tpu.ops import filterbank, of1x1

    template, bank, dev = bank_and_template
    rng = np.random.default_rng(1)
    traces = (rng.standard_normal((16, N)) * 1e-8
              + 3e-6 * template[None, :]).astype(np.float32)

    @jax.jit
    def both(tr, dev):
        bk = filterbank.device_bank_1x1(dev)
        bh = filterbank.device_bank_1x1_half(dev)
        vf = of1x1.signal_fft(tr[:, None, :])
        vr = of1x1.signal_rfft(tr[:, None, :])
        full = of1x1.of1x1_withdelay(vf, bk.phi, bk.norm, bk.denom_inv,
                                     bk.s_fft, PRETRIG, FS)
        half = of1x1.of1x1_withdelay_half(vr, bh.phi, bh.norm,
                                          bh.denom_inv, bh.s_fft,
                                          bh.bin_w, PRETRIG, FS)
        return full.amp, half.amp, full.chi2, half.chi2, half.t0

    fa, ha, fc, hc, t0 = map(np.asarray, both(jnp.asarray(traces), dev))
    np.testing.assert_allclose(ha, fa, rtol=1e-4)
    np.testing.assert_allclose(hc, fc, rtol=1e-3)
    # physics: amplitude recovered at f32 accuracy
    np.testing.assert_allclose(ha[:, 0], 3e-6, rtol=1e-3)
    assert np.all(np.abs(t0) < 2 / FS)


def test_welch_psd_white_level_on_device():
    from detprocess_tpu.ops import spectral

    rng = np.random.default_rng(2)
    sigma = 1e-8
    x = (rng.standard_normal((64, 16384)) * sigma).astype(np.float32)
    psd = np.asarray(jax.jit(lambda t: spectral.welch_psd(t, FS))(
        jnp.asarray(x)))
    assert abs(psd[10:].mean() / (sigma**2 / FS) - 1.0) < 0.05


def test_trigger_finds_injected_pulses_on_device():
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank, trigger as trig

    nt, pre = 4096, 1024
    tmpl = pulse.make_template(FS, nt, pre, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    psd = np.full(nt, 4e-18)
    bank = filterbank.make_ofnxm_bank(tmpl, psd.astype(complex), FS, pre)
    kernel = trig.make_trigger_kernel(bank)
    thr = trig.chi2_threshold(6.0, 1)
    iw = jnp.asarray(kernel.iw_matrix)

    rng = np.random.default_rng(3)
    l = 2**19
    x = (rng.standard_normal((1, l)) * np.sqrt(psd[0] * FS)).astype(
        np.float32)
    inj = list(range(40_000, l - 40_000, 61_337))
    for t0 in inj:
        x[0, t0 - pre: t0 - pre + nt] += 3e-6 * tmpl   # ~13 sigma_amp

    @jax.jit
    def step(x):
        qb, _ = trig.of_fir_blocks(x, kernel)
        d, a = trig.delta_chi2_blocks(qb, iw)
        return trig.find_triggers_blocks(d, a, thr, 125, 64)

    ts = step(jnp.asarray(x))
    cnt = int(np.asarray(ts.count))
    idx = np.asarray(ts.indices)[:cnt]
    for t0 in inj:
        assert any(abs(int(i) - t0) <= 10 for i in idx), t0
    assert cnt <= len(inj) + 2


def test_trigger_fused_tiled_on_device():
    """Round-3 fast path on the real chip: Δχ² straight from q, tiled
    merge, amplitudes reconstructed at the winners only — must agree
    with the amps-materializing path bit-for-bit on indices."""
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank, trigger as trig

    nt, pre = 4096, 1024
    tmpl = pulse.make_template(FS, nt, pre, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    psd = np.full(nt, 4e-18)
    bank = filterbank.make_ofnxm_bank(tmpl, psd.astype(complex), FS, pre)
    kernel = trig.make_trigger_kernel(bank)
    thr = trig.chi2_threshold(6.0, 1)
    iw = jnp.asarray(kernel.iw_matrix)

    rng = np.random.default_rng(5)
    l = 2**19
    x = (rng.standard_normal((1, l)) * np.sqrt(psd[0] * FS)).astype(
        np.float32)
    inj = list(range(40_000, l - 40_000, 61_337))
    for t0 in inj:
        x[0, t0 - pre: t0 - pre + nt] += 3e-6 * tmpl

    @jax.jit
    def fused(x):
        qb, _ = trig.of_fir_blocks(x, kernel)
        d = trig.delta_chi2_from_q(qb, iw)
        return trig.find_triggers_tiled(d, qb, thr, 125, 64,
                                        amps_transform=iw)

    @jax.jit
    def materialized(x):
        qb, _ = trig.of_fir_blocks(x, kernel)
        d, a = trig.delta_chi2_blocks(qb, iw)
        return trig.find_triggers_tiled(d, a, thr, 125, 64)

    ts_f = fused(jnp.asarray(x))
    ts_m = materialized(jnp.asarray(x))
    cnt = int(np.asarray(ts_f.count))
    assert cnt == int(np.asarray(ts_m.count))
    np.testing.assert_array_equal(np.asarray(ts_f.indices)[:cnt],
                                  np.asarray(ts_m.indices)[:cnt])
    np.testing.assert_allclose(np.asarray(ts_f.amplitudes)[:, :cnt],
                               np.asarray(ts_m.amplitudes)[:, :cnt],
                               rtol=2e-5)
    # every injection found; amplitudes near truth
    idx = np.asarray(ts_f.indices)[:cnt]
    amps = np.asarray(ts_f.amplitudes)[0, :cnt]
    for t0 in inj:
        k = int(np.argmin(np.abs(idx - t0)))
        assert abs(int(idx[k]) - t0) <= 10, t0
        # winner amplitude = unconstrained FIR value at the noisy argmax
        # (biased high by selection) — 20% window, exact fit is the
        # feature OF's job
        assert abs(amps[k] - 3e-6) / 3e-6 < 0.2, (t0, amps[k])


def test_residual_subtract_on_device():
    """The fori_loop dynamic-slice residual subtraction runs on the real
    chip and kills a clean trigger's Δχ² peak."""
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank, trigger as trig

    nt, pre = 4096, 1024
    tmpl = pulse.make_template(FS, nt, pre, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    psd = np.full(nt, 4e-18)
    bank = filterbank.make_ofnxm_bank(tmpl, psd.astype(complex), FS, pre)
    kernel = trig.make_trigger_kernel(bank)
    thr = trig.chi2_threshold(6.0, 1)
    iw = jnp.asarray(kernel.iw_matrix)

    rng = np.random.default_rng(6)
    l = 2**18
    x = (rng.standard_normal((1, l)) * np.sqrt(psd[0] * FS)).astype(
        np.float32)
    t0 = l // 2
    x[0, t0 - pre: t0 - pre + nt] += 5e-6 * tmpl

    @jax.jit
    def step(x):
        qb, _ = trig.of_fir_blocks(x, kernel)
        d, a = trig.delta_chi2_blocks(qb, iw)
        dflat = d.reshape(-1)[: x.shape[-1]]
        ts = trig.find_triggers_kernel(
            dflat, a.reshape(a.shape[0], -1)[:, : x.shape[-1]],
            thr, 125, 16)
        resid = trig.residual_subtract(dflat, ts, kernel)
        return ts, dflat, resid

    ts, dflat, resid = step(jnp.asarray(x))
    cnt = int(np.asarray(ts.count))
    assert cnt >= 1
    # indices are sorted by position; pick the strongest trigger (a
    # 22 sigma pulse also raises sidelobe triggers near the main cluster)
    dv = np.asarray(ts.dchi2)[:cnt]
    i0 = int(np.asarray(ts.indices)[:cnt][int(np.argmax(dv))])
    assert abs(i0 - t0) <= 2
    assert float(np.asarray(resid[i0])) < 0.02 * float(
        np.asarray(dflat[i0]))


def test_residual_subtract_conv_on_device():
    """The spike+FFT-convolution subtraction (the pipeline default)
    matches the sequential loop on the real chip at f32 leakage scale."""
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank, trigger as trig

    nt, pre = 4096, 1024
    tmpl = pulse.make_template(FS, nt, pre, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    psd = np.full(nt, 4e-18)
    bank = filterbank.make_ofnxm_bank(tmpl, psd.astype(complex), FS, pre)
    kernel = trig.make_trigger_kernel(bank)
    basis = trig.make_residual_basis(kernel)
    thr = trig.chi2_threshold(6.0, 1)
    iw = jnp.asarray(kernel.iw_matrix)

    rng = np.random.default_rng(6)
    l = 2**18
    x = (rng.standard_normal((1, l)) * np.sqrt(psd[0] * FS)).astype(
        np.float32)
    for t0 in (l // 2, l // 4):
        x[0, t0 - pre: t0 - pre + nt] += 5e-6 * tmpl

    @jax.jit
    def step(x):
        qb, _ = trig.of_fir_blocks(x, kernel)
        d = trig.delta_chi2_from_q(qb, iw)
        ts = trig.find_triggers_tiled(d, qb, thr, 125, 16,
                                      amps_transform=iw)
        dflat = d.reshape(-1)[: x.shape[-1]]
        loop = trig.residual_subtract(dflat, ts, kernel)
        conv = trig.residual_subtract_conv(d, ts, kernel, basis)
        return dflat, loop, conv.reshape(-1)[: x.shape[-1]]

    dflat, loop, conv = map(np.asarray, step(jnp.asarray(x)))
    # f32 FFT leakage scatters ~eps × the subtraction peak; the chip's
    # matmul four-step FFT carries a slightly larger constant than the
    # CPU FFT (measured 2.9e-5 relative at this size)
    tol = 6e-5 * np.max(np.abs(loop - dflat))
    assert np.max(np.abs(conv - loop)) < tol
    # both paths kill the injected peaks
    i0 = l // 2
    assert abs(conv[i0]) < 0.02 * dflat[i0]


def test_autocuts_while_loop_on_device():
    from detprocess_tpu.ops import autocuts

    rng = np.random.default_rng(4)
    x = rng.standard_normal((256, 512)).astype(np.float32)
    x[5] *= 30.0
    mask = np.asarray(jax.jit(autocuts.autocuts_noise)(jnp.asarray(x)))
    assert not mask[5]
    assert mask.sum() > 200


def test_of1x2_joint_on_device(bank_and_template):
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank, of1x1

    template, bank, dev = bank_and_template
    t2 = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=50e-6,
                             tau_f1=800e-6)
    psd = np.full(N, 1e-16)
    psd[0] = np.inf
    b2 = filterbank.make_of1x1_bank(t2, psd, FS, PRETRIG)
    dev2 = jax.tree.map(jnp.asarray, b2.to_device(np.float32))
    sep = 200
    tr = (np.random.default_rng(5).standard_normal((4, N)) * 1e-8
          + 5e-6 * template + 3e-6 * np.roll(t2, sep)).astype(np.float32)

    @jax.jit
    def step(tr, d1, d2):
        bk1 = filterbank.device_bank_1x1(d1)
        bk2 = filterbank.device_bank_1x1(d2)
        v = of1x1.signal_fft(tr[:, None, :])
        return of1x1.of1x2(v, bk1.phi, bk1.norm, bk1.s_fft,
                           bk2.phi, bk2.norm, bk2.s_fft, bk1.denom_inv,
                           PRETRIG, FS, delta_window=np.arange(0, 256))

    r = step(jnp.asarray(tr), dev, dev2)
    np.testing.assert_allclose(np.asarray(r.amp1)[:, 0], 5e-6, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(r.amp2)[:, 0], 3e-6, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(r.time_diff)[:, 0] * FS, sep,
                               atol=1.5)


def test_perm_feature_equals_natural_on_device(bank_and_template):
    """The transpose-free permuted-FFT feature path (what the pipeline
    ships at this N) matches the natural-order half path on the chip."""
    from detprocess_tpu.ops import fft as dfft
    from detprocess_tpu.ops import filterbank, of1x1

    template, bank, dev = bank_and_template
    hperm = dfft.half_perm_indices(N)
    assert hperm is not None
    dev_p = jax.tree.map(jnp.asarray, filterbank.permute_half_bank(
        bank.to_device(np.float32), hperm))
    spec_k = jnp.asarray(hperm)

    rng = np.random.default_rng(5)
    traces = (rng.standard_normal((8, N)) * 1e-8
              + 3e-6 * np.roll(template, 7)[None, :]).astype(np.float32)

    @jax.jit
    def nat(tr, dev):
        bh = filterbank.device_bank_1x1_half(dev)
        vr = of1x1.signal_rfft(tr[:, None, :])
        wd = of1x1.of1x1_withdelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                        bh.s_fft, bh.bin_w, PRETRIG, FS)
        nd = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                      bh.s_fft, bh.bin_w, n=N)
        return wd.amp, wd.t0, wd.chi2, nd.amp

    @jax.jit
    def perm(tr, dev):
        bh = filterbank.device_bank_1x1_half(dev)
        vr = of1x1.signal_rfft_perm(tr[:, None, :])
        wd = of1x1.of1x1_withdelay_half_perm(
            vr, bh.phi, bh.norm, bh.denom_inv, bh.s_fft, bh.bin_w,
            PRETRIG, FS, N, spec_k)
        nd = of1x1.of1x1_nodelay_half(vr, bh.phi, bh.norm, bh.denom_inv,
                                      bh.s_fft, bh.bin_w, n=N,
                                      spec_k=spec_k)
        return wd.amp, wd.t0, wd.chi2, nd.amp

    na, nt0, nc, nnd = map(np.asarray, nat(jnp.asarray(traces), dev))
    pa, pt0, pc, pnd = map(np.asarray, perm(jnp.asarray(traces), dev_p))
    np.testing.assert_allclose(pa, na, rtol=1e-4)
    np.testing.assert_allclose(pnd, nnd, rtol=1e-4)
    np.testing.assert_allclose(pt0, nt0, atol=1.5 / FS)
    np.testing.assert_allclose(pc, nc, rtol=1e-3)
    # physics: the injected amp and offset are recovered
    np.testing.assert_allclose(pa[:, 0], 3e-6, rtol=1e-3)
    assert np.all(np.abs(pt0 - 7 / FS) < 1.5 / FS)


def test_rfft_perm_matches_rfft_on_device():
    """rfft_perm gathered to natural order == rfft; irfft_fromperm
    round-trips to the input (the permuted pair the pipeline ships)."""
    from detprocess_tpu.ops import fft as dfft

    hperm = dfft.half_perm_indices(N)
    pos = dfft.half_unperm_indices(N)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((4, N)).astype(np.float32)

    @jax.jit
    def rt(x):
        xp = dfft.rfft_perm(x)
        nat = jnp.take(xp, jnp.asarray(pos), axis=-1)
        back = dfft.irfft_fromperm(xp, N)
        return jnp.stack([nat.real, nat.imag], 0), back

    ri, back = rt(jnp.asarray(x))
    got = np.asarray(ri[0]) + 1j * np.asarray(ri[1])
    ref = np.fft.rfft(x)
    assert np.max(np.abs(got - ref)) < 2e-5 * np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-6)
    assert hperm is not None and len(hperm) == N // 2 + 1


def test_windowed_direct_equals_masked_on_device(bank_and_template):
    """The direct windowed DFT-matmul constrained OF (dispatched for
    windows <= DIRECT_WINDOW_MAX) matches the masked irfft scan on the
    chip, on the permuted layout the pipeline ships."""
    from detprocess_tpu.ops import fft as dfft
    from detprocess_tpu.ops import filterbank, of1x1

    template, bank, dev = bank_and_template
    hperm = dfft.half_perm_indices(N)
    dev_p = jax.tree.map(jnp.asarray, filterbank.permute_half_bank(
        bank.to_device(np.float32), hperm))
    spec_k = jnp.asarray(hperm)

    wmask = np.zeros(N, bool)
    wmask[PRETRIG - 50:PRETRIG + 51] = True
    binw_host = filterbank.half_bin_weights(N)
    eidx, valid, cmat, smat = of1x1.prepare_delay_window(
        wmask, PRETRIG, N, binw_host)
    cmat_p, smat_p = cmat[hperm], smat[hperm]

    rng = np.random.default_rng(7)
    traces = (rng.standard_normal((8, N)) * 1e-8
              + 3e-6 * np.roll(template, 21)[None, :]).astype(np.float32)
    wmask_dev = jnp.asarray(wmask)

    @jax.jit
    def both(tr, dev, cm, sm):
        bh = filterbank.device_bank_1x1_half(dev)
        vr = of1x1.signal_rfft_perm(tr[:, None, :])
        direct = of1x1.of1x1_windowed_direct_half(
            vr, bh.phi, bh.norm, bh.denom_inv, bh.s_fft, bh.bin_w,
            PRETRIG, FS, eidx, valid, cm, sm, n=N, spec_k=spec_k)
        masked = of1x1.of1x1_withdelay_half_perm(
            vr, bh.phi, bh.norm, bh.denom_inv, bh.s_fft, bh.bin_w,
            PRETRIG, FS, N, spec_k, window_mask=wmask_dev)
        return direct.amp, direct.t0, masked.amp, masked.t0

    da, dt0, ma, mt0 = map(np.asarray, both(
        jnp.asarray(traces), dev_p, jnp.asarray(cmat_p),
        jnp.asarray(smat_p)))
    np.testing.assert_allclose(da, ma, rtol=2e-4)
    np.testing.assert_allclose(dt0, mt0, atol=1e-9)
    np.testing.assert_allclose(da[:, 0], 3e-6, rtol=1e-3)
    assert np.all(np.abs(dt0 - 21 / FS) < 1.5 / FS)


def test_dynamic_batched_on_device():
    """The batch-shared early-exit dynamic-window walk
    (find_triggers_dynamic_batched) matches vmap of the single-trace
    kernel field-for-field on the real chip, with a constant window
    reproducing the static tiled merge's trigger indices."""
    from detprocess_tpu.models import pulse
    from detprocess_tpu.ops import filterbank, trigger as trig

    nt, pre = 4096, 1024
    tmpl = pulse.make_template(FS, nt, pre, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    psd = np.full(nt, 4e-18)
    bank = filterbank.make_ofnxm_bank(tmpl, psd.astype(complex), FS, pre)
    kernel = trig.make_trigger_kernel(bank)
    thr = trig.chi2_threshold(6.0, 1)
    iw = jnp.asarray(kernel.iw_matrix)

    rng = np.random.default_rng(11)
    e, l = 3, 2**18
    x = (rng.standard_normal((e, 1, l)) * np.sqrt(psd[0] * FS)).astype(
        np.float32)
    inj = list(range(30_000, l - 30_000, 41_113))
    for ev in range(e):
        for t0 in inj:
            x[ev, 0, t0 - pre: t0 - pre + nt] += 3e-6 * tmpl

    def window_fn(m):
        return 125.0 + 0.0 * m          # constant == static merge

    def pre_stage(t):
        qb, _ = trig.of_fir_blocks(t, kernel)
        d = trig.delta_chi2_from_q(qb, iw).reshape(-1)[:l]
        q = qb.reshape(qb.shape[0], -1)[:, :l]
        return d, q

    @jax.jit
    def batched(x):
        d, q = jax.vmap(pre_stage)(x[:, 0:1])
        return trig.find_triggers_dynamic_batched(
            d, q, thr, window_fn, 64, candidate_capacity=1024,
            amps_transform=iw)

    @jax.jit
    def vmapped(x):
        d, q = jax.vmap(pre_stage)(x[:, 0:1])
        return jax.vmap(lambda dd, qq: trig.find_triggers_dynamic_kernel(
            dd, qq, thr, window_fn, 64, candidate_capacity=1024,
            amps_transform=iw))(d, q)

    @jax.jit
    def static(x):
        def one(t):
            qb, _ = trig.of_fir_blocks(t, kernel)
            d = trig.delta_chi2_from_q(qb, iw)
            return trig.find_triggers_tiled(d, qb, thr, 125, 64,
                                            amps_transform=iw)
        return jax.vmap(one)(x[:, 0:1])

    ts_b = batched(jnp.asarray(x))
    ts_v = vmapped(jnp.asarray(x))
    ts_s = static(jnp.asarray(x))
    for name in trig.TriggerSet._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ts_b, name)),
            np.asarray(getattr(ts_v, name)), err_msg=name)
    cnt_b = np.asarray(ts_b.count)
    cnt_s = np.asarray(ts_s.count)
    np.testing.assert_array_equal(cnt_b, cnt_s)
    for ev in range(e):
        np.testing.assert_array_equal(
            np.sort(np.asarray(ts_b.indices)[ev, :cnt_b[ev]]),
            np.sort(np.asarray(ts_s.indices)[ev, :cnt_s[ev]]))
        # every injection present (argmax of the noisy unconstrained
        # delta-chi2 lands within ~1 rise time of the injection point)
        idx = np.asarray(ts_b.indices)[ev, :cnt_b[ev]]
        for t0 in inj:
            assert np.any(np.abs(idx - t0) <= 30), (ev, t0)


def test_int16_convert_and_inject_on_device():
    """Round-3 staging path on the real chip: int16 codes upload as
    stored, ADC->amps conversion and salt injection run on device
    (ops.saltinject) — must match the host float math."""
    from detprocess_tpu.ops import saltinject

    rng = np.random.default_rng(9)
    e, c, l, nt = 4, 2, 65536, 4096
    codes = np.rint(rng.standard_normal((e, c, l)) * 500).astype(np.int16)
    conv = np.array([2.0 ** -22, 2.0 ** -23], np.float32)
    convs = np.tile(conv, (e, 1))

    amps = np.asarray(saltinject.adc_convert(jnp.asarray(codes),
                                             jnp.asarray(convs)))
    np.testing.assert_array_equal(
        amps, codes.astype(np.float32) * conv[None, :, None])

    tmpl = np.zeros((1, nt), np.float32)
    tmpl[0, 100:1100] = 1.0
    idx = np.array([[100], [-500], [l - 600], [0]], np.int32)
    chan = np.array([[0], [1], [0], [1]], np.int32)
    tid = np.zeros((e, 1), np.int32)
    amp = np.array([[1e-5], [2e-5], [3e-5], [0.0]], np.float32)
    out = np.asarray(saltinject.inject_salts(
        jnp.asarray(amps), jnp.asarray(idx), jnp.asarray(chan),
        jnp.asarray(tid), jnp.asarray(amp), jnp.asarray(tmpl)))
    diff = out - amps
    # full add inside
    np.testing.assert_allclose(diff[0, 0, 200:1200], 1e-5, rtol=1e-4)
    # clipped head: template samples 500.. land at trace 0..
    np.testing.assert_allclose(diff[1, 1, 0:600], 2e-5, rtol=1e-4)
    assert np.all(diff[1, 0] == 0)
    # clipped tail
    np.testing.assert_allclose(diff[2, 0, l - 500:], 3e-5, rtol=1e-4)
    # amp=0 slot is a no-op
    assert np.all(diff[3] == 0)
