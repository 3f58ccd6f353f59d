"""Spectral device kernels: FFT helpers, Welch PSD/CSD estimation, spectrum
folding, zero-phase low-pass filtering.

Conventions (these are the QETpy conventions the reference relies on —
see SURVEY.md §2.3 and detprocess/core/noise.py:344-346):

- PSDs are **two-sided**, in units of A²/Hz, on the numpy ``fftfreq`` axis.
- ``psd = mean_over_traces |FFT(x)|²| / (N · fs)`` so that
  ``Var(x_t) = Σ_k psd_k · fs / N`` (Parseval).
- CSD: ``csd[i, j, k] = mean( FFT(x_i)_k · conj(FFT(x_j)_k) ) / (N · fs)`` —
  an [nchan, nchan, nfreq] Hermitian array per frequency.

All kernels are jit-friendly, batched, and dtype-polymorphic: float32 inputs
give complex64 FFTs (TPU fast path); float64 inputs (CPU golden tests) give
complex128.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from detprocess_tpu.ops import fft as dfft


def periodogram_perm(traces: jnp.ndarray, fs: float) -> jnp.ndarray:
    """Two-sided periodogram in the permuted (blocked four-step) storage
    order of ops/fft.fft_perm — spectral bin ``perm_indices(n)[j]`` at
    position j. |·|² is order-agnostic, so skipping the forward FFT's
    final transpose pass is free; callers restore natural order after
    their trace-axis reduction (see :func:`welch_psd`). Caller must have
    checked ``dfft.perm_split(n) is not None``."""
    n = traces.shape[-1]
    return (jnp.abs(dfft.fft_perm(traces)) ** 2) / (n * fs)


def fold_spectrum(psd: jnp.ndarray, n: int | None = None):
    """Fold a two-sided PSD (last axis) onto positive frequencies.

    Doubles all bins except DC (and Nyquist for even N). Device analog of
    detprocess_tpu.utils.freq.fold_spectrum.
    """
    n = psd.shape[-1] if n is None else n
    nfold = n // 2 + 1
    folded = psd[..., :nfold]
    if n % 2 == 0:
        scale = jnp.concatenate(
            [jnp.ones((1,), psd.dtype),
             jnp.full((nfold - 2,), 2, psd.dtype),
             jnp.ones((1,), psd.dtype)]
        )
    else:
        scale = jnp.concatenate(
            [jnp.ones((1,), psd.dtype), jnp.full((nfold - 1,), 2, psd.dtype)]
        )
    return folded * scale


def periodogram(traces: jnp.ndarray, fs: float) -> jnp.ndarray:
    """Two-sided periodogram of each trace: |FFT|² / (N·fs). Shape preserved.

    Deliberately the FULL complex transform: an rfft+mirror variant was
    measured 18% SLOWER at 2048×32k (115.6k vs 141k ev/s) — the packed
    half-size FFT saves 2.5× matmul FLOPs but its untangle needs a
    reversed-axis copy and two extra complex passes over [B, N/2]
    intermediates, which dominate on this HBM-bound shape. Revisit only
    with a fused untangle (e.g. Pallas) that avoids the relayout."""
    n = traces.shape[-1]
    vfft = dfft.fft(traces, axis=-1)
    return (jnp.abs(vfft) ** 2) / (n * fs)


def welch_psd_packed(traces: jnp.ndarray, fs: float,
                     window: str | None = None):
    """Average two-sided PSD via the packed half-size FFT, WITHOUT the
    rfft untangle. Numerically equal to :func:`welch_psd` (even N).

    The rfft+mirror periodogram measured slower than the full complex
    FFT (see :func:`periodogram`) because the untangle's reversed-axis
    combine runs per TRACE over [B, M] intermediates. But the mean PSD
    never needs X_k per trace: with z_m = x_{2m} + i·x_{2m+1},
    Z = FFT_M(z), and the rfft identity X_k = a_k Z_k + b_k conj(Z_{M−k})
    (a = ½(1 − i·w), b = ½(1 + i·w), w = e^{−2πik/N}),

        |X_k|² = |a_k|²·U_k + |b_k|²·U_{M−k} + 2·Re(a_k·conj(b_k)·V_k)
        U_k = |Z_k|²,   V_k = Z_k·Z_{(M−k) mod M}

    and U, V are plain per-trace elementwise products whose trace-mean
    XLA fuses into their producers — so the reversal-dependent combine
    moves AFTER the reduction, onto [M]-sized arrays. Total per-trace
    work: one half-size complex FFT (≈2.5× fewer matmul FLOPs, half the
    HBM intermediates of the full-N transform) + two fused elementwise
    passes. DC and Nyquist come from U_0 and Im(V_0)
    (X_0 = Re Z_0 + Im Z_0, X_M = Re Z_0 − Im Z_0). The half-size
    transform rides the blocked (permuted) storage when the four-step
    path engages; natural order is restored by one [M] gather on the
    REDUCED spectra.
    """
    n = traces.shape[-1]
    if n % 2 != 0 or n < 4:
        return welch_psd(traces, fs, window=window)
    if window == "hann":
        w = jnp.hanning(n).astype(traces.dtype)
        scale = 1.0 / jnp.mean(w**2)
        traces = traces * w
    elif window is None:
        scale = 1.0
    else:
        raise ValueError(f"unknown window: {window}")
    m = n // 2
    z = jax.lax.complex(traces[..., 0::2], traces[..., 1::2])
    perm = dfft.site_perm_indices(m, "spectral")
    if perm is None:
        zf = dfft.fft(z, axis=-1)
        zf_rev = jnp.concatenate([zf[..., :1], zf[..., :0:-1]], axis=-1)
    else:
        zf = dfft.fft_perm(z)
        zf_rev = dfft._blocked_rev(
            zf.reshape(zf.shape[:-1] + dfft.perm_split(m))
        ).reshape(zf.shape)
    u = zf.real**2 + zf.imag**2                     # [..., B, M]
    v = zf * zf_rev                                 # [..., B, M]
    u_mean = jnp.mean(u, axis=-2)                   # reductions fuse into
    v_mean = jnp.mean(v, axis=-2)                   # the products above
    if perm is not None:
        pos = jnp.asarray(dfft.unperm_indices(m))
        u_mean = jnp.take(u_mean, pos, axis=-1)
        v_mean = jnp.take(v_mean, pos, axis=-1)
    # combine on the REDUCED [M] spectra (host-precomputed coefficients)
    k = np.arange(m)
    wk = np.exp(-2j * np.pi * k / n)
    a = 0.5 * (1.0 - 1j * wk)
    b = 0.5 * (1.0 + 1j * wk)
    aa = jnp.asarray(np.abs(a) ** 2, u_mean.dtype)
    bb = jnp.asarray(np.abs(b) ** 2, u_mean.dtype)
    ab = dfft.const_complex(2.0 * a * np.conj(b), v_mean.dtype)
    u_rev = jnp.concatenate(
        [u_mean[..., :1], u_mean[..., :0:-1]], axis=-1)
    s_half = aa * u_mean + bb * u_rev + (ab * v_mean).real   # k ∈ [0, M)
    s_nyq = u_mean[..., :1] - (v_mean[..., :1]).imag
    # two-sided mirror: S[N−k] = S[k] (real input)
    s_neg = jnp.concatenate([s_nyq, s_half[..., :0:-1]], axis=-1)
    two_sided = jnp.concatenate([s_half, s_neg], axis=-1)
    return two_sided * (scale / (n * fs))


def welch_psd(traces: jnp.ndarray, fs: float, window: str | None = None):
    """Average two-sided PSD over the leading (trace) axis.

    Parameters
    ----------
    traces : [ntraces, nsamples] (or [..., ntraces, nsamples])
    fs : sampling rate (Hz)
    window : None (boxcar, the QETpy default used by the reference at
        detprocess/core/noise.py:344) or 'hann'. Windowed estimates are
        normalized by the window power so white-noise levels are unbiased.

    Returns two-sided PSD with the trace axis reduced.
    """
    n = traces.shape[-1]
    if window == "hann":
        w = jnp.hanning(n).astype(traces.dtype)
        scale = 1.0 / jnp.mean(w**2)
        traces = traces * w
    elif window is None:
        scale = 1.0
    else:
        raise ValueError(f"unknown window: {window}")
    pos = dfft.site_unperm_indices(n, "spectral")
    if pos is None:
        pxx = periodogram(traces, fs) * scale
        return jnp.mean(pxx, axis=-2)
    # transpose-free: permuted periodogram, reduce the trace axis, then
    # restore natural frequency order with one [.., N] gather (the
    # reduced array is ntraces× smaller than the FFT intermediates)
    pxx = periodogram_perm(traces, fs) * scale
    return jnp.take(jnp.mean(pxx, axis=-2), jnp.asarray(pos), axis=-1)


def welch_csd_packed(traces: jnp.ndarray, fs: float,
                     window: str | None = None):
    """Averaged CSD via the packed half-size FFT — the cross-spectral
    analog of :func:`welch_psd_packed`; equal to :func:`welch_csd`.

    With Z_c = FFT_M(x_c,even + i·x_c,odd) and the rfft identity
    X_k = a_k Z_k + b_k conj(Z_{M−k}),

        X_i·conj(X_j)|_k = |a_k|²·P_ij,k + |b_k|²·conj(P_ij,(M−k))
                         + a_k·conj(b_k)·Q_ij,k
                         + conj(a_k)·b_k·conj(Q_ij,(M−k))
        P_ij = Z_i·conj(Z_j),   Q_ij = Z_i·Z_j,reversed

    (using Q_ji,k = Q_ij,(M−k)). P and Q are per-trace einsums whose
    trace-mean fuses; every reversal lands on the REDUCED [C, C, M]
    spectra. DC/Nyquist: Re(P_0) ± Im(Q_0); negative frequencies are the
    conjugate mirror (real input).
    """
    n = traces.shape[-1]
    if n % 2 != 0 or n < 4:
        return welch_csd(traces, fs, window=window)
    if window == "hann":
        w = jnp.hanning(n).astype(traces.dtype)
        scale = 1.0 / jnp.mean(w**2)
        traces = traces * w
    elif window is None:
        scale = 1.0
    else:
        raise ValueError(f"unknown window: {window}")
    m = n // 2
    z = jax.lax.complex(traces[..., 0::2], traces[..., 1::2])
    perm = dfft.site_perm_indices(m, "spectral")
    if perm is None:
        zf = dfft.fft(z, axis=-1)                       # [B, C, M]
        zf_rev = jnp.concatenate([zf[..., :1], zf[..., :0:-1]], axis=-1)
    else:
        zf = dfft.fft_perm(z)
        zf_rev = dfft._blocked_rev(
            zf.reshape(zf.shape[:-1] + dfft.perm_split(m))
        ).reshape(zf.shape)
    p = dfft.einsum("bik,bjk->ijk", zf, jnp.conj(zf))   # [C, C, M]
    q = dfft.einsum("bik,bjk->ijk", zf, zf_rev)
    if perm is not None:
        pos = jnp.asarray(dfft.unperm_indices(m))
        p = jnp.take(p, pos, axis=-1)
        q = jnp.take(q, pos, axis=-1)
    k = np.arange(m)
    wk = np.exp(-2j * np.pi * k / n)
    a = 0.5 * (1.0 - 1j * wk)
    b = 0.5 * (1.0 + 1j * wk)
    aa = jnp.asarray(np.abs(a) ** 2, traces.dtype)
    bb = jnp.asarray(np.abs(b) ** 2, traces.dtype)
    ab = dfft.const_complex(a * np.conj(b), p.dtype)
    ba = dfft.const_complex(np.conj(a) * b, p.dtype)

    def rev_m(x):
        return jnp.concatenate([x[..., :1], x[..., :0:-1]], axis=-1)

    s_half = (aa * p + bb * jnp.conj(rev_m(p))
              + ab * q + ba * jnp.conj(rev_m(q)))       # k ∈ [0, M)
    s_nyq = (p[..., :1].real - q[..., :1].imag).astype(p.dtype)
    s_neg = jnp.concatenate([s_nyq, jnp.conj(s_half[..., :0:-1])],
                            axis=-1)
    two_sided = jnp.concatenate([s_half, s_neg], axis=-1)
    return two_sided * (scale / (n * fs * traces.shape[0]))


def welch_csd(traces: jnp.ndarray, fs: float, window: str | None = None):
    """Cross-spectral density matrix averaged over traces.

    Parameters
    ----------
    traces : [ntraces, nchan, nsamples]

    Returns
    -------
    csd : [nchan, nchan, nsamples] complex, Hermitian in the channel axes:
        ``csd[i, j] = mean(FFT_i · conj(FFT_j)) / (N·fs)``.
    """
    n = traces.shape[-1]
    if window == "hann":
        w = jnp.hanning(n).astype(traces.dtype)
        scale = 1.0 / jnp.mean(w**2)
        traces = traces * w
    elif window is None:
        scale = 1.0
    else:
        raise ValueError(f"unknown window: {window}")
    # full complex transform on purpose — see the periodogram note (the
    # rfft untangle's relayout costs beat its FLOP savings here)
    pos = dfft.site_unperm_indices(n, "spectral")
    if pos is None:
        vfft = dfft.fft(traces, axis=-1)  # [B, C, N]
        csd = dfft.einsum("bik,bjk->ijk", vfft, jnp.conj(vfft))
    else:
        # transpose-free permuted layout; the cross-spectral average is
        # per-frequency, so natural order is restored on the reduced
        # [C, C, N] result instead of the [B, C, N] FFT intermediates
        vfft = dfft.fft_perm(traces)
        csd = dfft.einsum("bik,bjk->ijk", vfft, jnp.conj(vfft))
        csd = jnp.take(csd, jnp.asarray(pos), axis=-1)
    return csd * (scale / (n * fs * traces.shape[0]))


@partial(jax.jit, static_argnames=("order",))
def lowpass_filter(traces: jnp.ndarray, cut_off_freq: float, fs: float,
                   order: int = 2) -> jnp.ndarray:
    """Zero-phase Butterworth low-pass via frequency-domain multiply.

    The reference uses qetpy.utils.lowpassfilter (scipy butter+filtfilt) for
    the 50 kHz saturation-veto trace (detprocess/core/oftrigger.py:627-633).
    filtfilt's transfer function is |H(f)|² with zero phase; we apply exactly
    that in the Fourier domain: gain = 1 / (1 + (f/fc)^(2·order)).
    This is circular rather than reflect-padded, which only differs near the
    trace edges (excluded from triggering anyway).
    """
    n = traces.shape[-1]
    pm = dfft.site_perm_indices(n, "spectral")
    # |k/n| is fs-free so the frequency grid stays static (fs and the
    # cutoff may be traced); |f|/fc = |k|/n · fs/fc
    kabs = np.abs(np.fft.fftfreq(n))                       # |k|/n, host
    if pm is not None:
        # gain is diagonal in frequency → permute it instead of the data
        # and run the transpose-free blocked-layout transform pair
        kabs = kabs[pm]
    gain = 1.0 / (1.0 + (jnp.asarray(kabs) * fs / cut_off_freq)
                  ** (2 * order))
    if pm is None:
        out = dfft.ifft(dfft.fft(traces, axis=-1) * gain, axis=-1)
    else:
        out = dfft.ifft_fromperm(dfft.fft_perm(traces) * gain)
    return jnp.real(out).astype(traces.dtype)
