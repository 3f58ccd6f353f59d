"""Tests for the four-step / Bluestein large-N FFT (ops/fft.py).

The TPU backend only supports native FFTs up to N=4096; these verify the
decomposition used for larger sizes is exact against numpy on CPU.
"""

import numpy as np
import jax.numpy as jnp

from detprocess_tpu.ops import fft as dfft


def _check(n, rtol=1e-9):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    got = np.asarray(dfft.fft(jnp.asarray(x)))
    ref = np.fft.fft(x, axis=-1)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, rtol=0, atol=rtol * scale)
    got_i = np.asarray(dfft.ifft(jnp.asarray(x)))
    ref_i = np.fft.ifft(x, axis=-1)
    np.testing.assert_allclose(got_i, ref_i, rtol=0,
                               atol=rtol * np.max(np.abs(ref_i)))


def test_small_native():
    _check(1024)


def test_four_step_pow2():
    for n in (8192, 16384, 32768, 65536):
        _check(n)


def test_four_step_composite():
    _check(12000)   # 2^5·3·5^3 — factors into ≤4096 pieces
    _check(4096 * 3)


def test_bluestein_prime():
    _check(8191, rtol=1e-8)   # Mersenne prime > native limit


def test_real_input_fft():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32768))
    got = np.asarray(dfft.fft(jnp.asarray(x)))
    ref = np.fft.fft(x, axis=-1)
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=1e-9 * np.max(np.abs(ref)))


def test_rfft_irfft_roundtrip():
    rng = np.random.default_rng(1)
    for n in (4096, 32768, 255):
        x = rng.standard_normal((2, n))
        r = dfft.rfft(jnp.asarray(x))
        ref = np.fft.rfft(x, axis=-1)
        np.testing.assert_allclose(np.asarray(r), ref, rtol=0,
                                   atol=1e-9 * np.max(np.abs(ref)))
        back = np.asarray(dfft.irfft(r, n))
        np.testing.assert_allclose(back, x, atol=1e-9)


def test_fft_axis_argument():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8192, 3))
    got = np.asarray(dfft.fft(jnp.asarray(x), axis=0))
    ref = np.fft.fft(x, axis=0)
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=1e-9 * np.max(np.abs(ref)))
