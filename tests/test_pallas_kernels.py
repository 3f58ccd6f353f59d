"""Interpreter-mode tests for the Pallas kernels (ops/pallas_fft.py,
ops/pallas_of.py). On-device behavior is exercised opportunistically (the
dev chip's Mosaic compiler has 2-D-only restrictions documented in the
kernel docstrings)."""

import numpy as np
import jax.numpy as jnp
import pytest

from detprocess_tpu.models import pulse
from detprocess_tpu.ops import filterbank, of1x1
from detprocess_tpu.ops.pallas_fft import fft_pallas
from detprocess_tpu.ops.pallas_of import FusedNodelayOF

FS = 1.25e6


def test_pallas_fft_interpret():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 2048)).astype(np.float32)
    re, im = fft_pallas(jnp.asarray(x), 64, 32, tile=8, interpret=True)
    got = np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)
    ref = np.fft.fft(x.astype(np.float64))
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 1e-5


def test_fused_nodelay_interpret():
    rng = np.random.default_rng(1)
    n, pretrig = 2048, 512
    tmpl = pulse.make_template(FS, n, pretrig, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    f = np.abs(np.fft.fftfreq(n, 1 / FS))
    f[0] = f[1]
    psd = 1e-20 * (1 + 100 / f)
    bank = filterbank.make_of1x1_bank(tmpl, psd, FS, pretrig)
    amps = rng.uniform(1e-6, 3e-6, 16)
    traces = (rng.standard_normal((16, n)) * 1e-8
              + amps[:, None] * tmpl[None, :])

    fused = FusedNodelayOF(bank, slot=0, n1=64, n2=32, tile=8,
                           interpret=True)
    amp_f, chi2_f = fused(jnp.asarray(traces, jnp.float32))

    v = of1x1.signal_fft(jnp.asarray(traces)[:, None, :])
    ref = of1x1.of1x1_nodelay(v, jnp.asarray(bank.phi),
                              jnp.asarray(bank.norm),
                              jnp.asarray(bank.denom_inv),
                              jnp.asarray(bank.s_fft))
    np.testing.assert_allclose(np.asarray(amp_f),
                               np.asarray(ref.amp[:, 0]), rtol=1e-5)
    # χ² agrees to f32 accumulation accuracy
    np.testing.assert_allclose(np.asarray(chi2_f),
                               np.asarray(ref.chi2[:, 0]), rtol=5e-3)


def test_fused_nodelay_padding():
    """Batch not a multiple of the tile is padded internally."""
    rng = np.random.default_rng(2)
    n, pretrig = 1024, 256
    tmpl = pulse.make_template(FS, n, pretrig, A=1.0, tau_r=20e-6,
                               tau_f1=200e-6)
    psd = np.full(n, 1e-20)
    bank = filterbank.make_of1x1_bank(tmpl, psd, FS, pretrig)
    traces = rng.standard_normal((5, n)).astype(np.float32) * 1e-8
    fused = FusedNodelayOF(bank, slot=0, n1=32, n2=32, tile=8,
                           interpret=True)
    amp, chi2 = fused(jnp.asarray(traces))
    assert amp.shape == (5,) and chi2.shape == (5,)
    assert np.all(np.isfinite(np.asarray(amp)))
