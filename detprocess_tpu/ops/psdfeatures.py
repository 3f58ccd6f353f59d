"""Per-event PSD features: band amplitudes, peak finding, phase at peaks.

Device equivalents of FeatureExtractors.psd_amp / psd_peaks / phase
(detprocess/core/algorithms.py:952-1343). These consume the already-computed
per-event signal FFT (ops.of1x1.signal_fft) exactly as the reference reuses
the OFBase FFT cache.

Conventions: per-event PSD = |ṽ|²·/(fs·N)·N = |ṽ|²/fs... matching the
reference's ``psd = |fft/N|²·N/fs = |fft|²/(N·fs)``; the folded amplitude
spectral density is ``sqrt(folded psd)`` with DC dropped.

Peak finding mirrors scipy.signal.find_peaks-with-distance semantics used at
utils/utils.py:559-711: local maxima in the band, selected greedily from the
highest with ±distance suppression; if the band contains no local maxima,
fall back to the largest bins with the same suppression. Returns fixed-size
[npeaks] arrays with -999999.0 sentinels (the framework-wide missing-value
marker, core/algorithms.py:112-115).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = -999999.0


def event_psd_folded(vfft: jnp.ndarray, fs: float) -> jnp.ndarray:
    """Folded amplitude-spectral-density (sqrt PSD) per event, DC dropped.

    vfft [..., N] -> asd [..., N//2] (bins 1..N//2 inclusive of Nyquist).
    """
    n = vfft.shape[-1]
    nfold = n // 2 + 1
    psd = (vfft.real**2 + vfft.imag**2) / (n * fs)
    folded = psd[..., :nfold]
    if n % 2 == 0:
        scale = np.ones(nfold)
        scale[1:-1] = 2.0
    else:
        scale = np.ones(nfold)
        scale[1:] = 2.0
    folded = folded * jnp.asarray(scale, dtype=psd.dtype)
    return jnp.sqrt(folded[..., 1:]), jnp.sqrt(folded[..., 0])


def event_psd_folded_half(vr_h: jnp.ndarray, fs: float, n: int):
    """:func:`event_psd_folded` from the half spectrum (ops.of1x1
    signal_rfft, NATURAL order): the folded PSD is exactly the
    non-negative-frequency bins, so the packed rfft provides it with
    half the transform work. vr_h [..., N//2+1] -> (asd [..., N//2],
    dc [...])."""
    nfold = n // 2 + 1
    psd = (vr_h.real**2 + vr_h.imag**2) / (n * fs)
    scale = np.ones(nfold)
    if n % 2 == 0:
        scale[1:-1] = 2.0
    else:
        scale[1:] = 2.0
    folded = psd * jnp.asarray(scale, dtype=psd.dtype)
    return jnp.sqrt(folded[..., 1:]), jnp.sqrt(folded[..., 0])


def psd_amp_half(vr_h: jnp.ndarray, fs: float, n: int,
                 ind_ranges) -> jnp.ndarray:
    """:func:`psd_amp` from the natural-order half spectrum."""
    asd, _ = event_psd_folded_half(vr_h, fs, n)
    outs = [jnp.mean(asd[..., lo:hi], axis=-1) for lo, hi in ind_ranges]
    return jnp.stack(outs, axis=-1)


def psd_amp(vfft: jnp.ndarray, fs: float, ind_ranges) -> jnp.ndarray:
    """Average folded ASD over index ranges.

    ``ind_ranges``: list of static (ind_low, ind_high) pairs on the folded,
    DC-dropped axis (from utils.freq.get_ind_freq_ranges on freqs[1:]).
    Returns [..., nranges].
    """
    asd, _ = event_psd_folded(vfft, fs)
    outs = [jnp.mean(asd[..., lo:hi], axis=-1) for lo, hi in ind_ranges]
    return jnp.stack(outs, axis=-1)


def _local_max_mask(y: jnp.ndarray) -> jnp.ndarray:
    """Strict local maxima (interior bins), scipy.find_peaks-style."""
    left = jnp.concatenate([jnp.full_like(y[..., :1], jnp.inf), y[..., :-1]],
                           axis=-1)
    right = jnp.concatenate([y[..., 1:], jnp.full_like(y[..., :1], jnp.inf)],
                            axis=-1)
    return (y > left) & (y > right)


def find_peaks_topk(
    y: jnp.ndarray,
    band_mask: jnp.ndarray,
    npeaks: int,
    distance_bins: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy top-npeaks peak finder with ±distance suppression.

    y [..., F]; band_mask static bool [F]. Returns (indices [..., npeaks]
    int32 with -1 sentinel, amplitudes [..., npeaks] with SENTINEL).
    """
    neg_inf = jnp.asarray(-jnp.inf, y.dtype)
    localmax = _local_max_mask(y) & band_mask
    any_local = jnp.any(localmax, axis=-1, keepdims=True)
    # fall back to all band bins when no local maxima exist in the band
    candidates = jnp.where(any_local, localmax, band_mask)
    work = jnp.where(candidates, y, neg_inf)

    f = y.shape[-1]
    pos = jnp.arange(f)

    def body(work, _):
        idx = jnp.argmax(work, axis=-1)
        val = jnp.take_along_axis(work, idx[..., None], axis=-1)[..., 0]
        good = jnp.isfinite(val)
        # suppress ±distance_bins around the pick
        dist = jnp.abs(pos - idx[..., None])
        suppress = dist <= max(distance_bins, 0)
        work = jnp.where(suppress, neg_inf, work)
        idx = jnp.where(good, idx, -1)
        val = jnp.where(good, val, SENTINEL)
        return work, (idx, val)

    _, (idxs, vals) = jax.lax.scan(body, work, None, length=npeaks)
    # scan stacks on axis 0; move peaks to the last axis
    idxs = jnp.moveaxis(idxs, 0, -1).astype(jnp.int32)
    vals = jnp.moveaxis(vals, 0, -1)
    return idxs, vals


def psd_peaks(
    vfft: jnp.ndarray,
    fs: float,
    band_mask: np.ndarray,
    npeaks: int,
    distance_bins: int,
):
    """Top-N PSD peaks in a band (core/algorithms.py:1047-1180).

    band_mask: static bool on the folded DC-dropped frequency axis.
    Returns (peak_freqs [..., npeaks], peak_amps [..., npeaks], dc_amp [...]).
    """
    asd, dc_amp = event_psd_folded(vfft, fs)
    n = vfft.shape[-1]
    freqs_fold = np.abs(np.fft.fftfreq(n, d=1.0 / fs)[: n // 2 + 1])[1:]
    idxs, amps = find_peaks_topk(asd, jnp.asarray(band_mask), npeaks,
                                 distance_bins)
    freqs = jnp.where(idxs >= 0,
                      jnp.asarray(freqs_fold, asd.dtype)[jnp.clip(idxs, 0)],
                      SENTINEL)
    return freqs, amps, dc_amp


def psd_peaks_half(
    vr_h: jnp.ndarray,
    fs: float,
    n: int,
    band_mask: np.ndarray,
    npeaks: int,
    distance_bins: int,
):
    """:func:`psd_peaks` from the natural-order half spectrum."""
    asd, dc_amp = event_psd_folded_half(vr_h, fs, n)
    freqs_fold = np.abs(np.fft.fftfreq(n, d=1.0 / fs)[: n // 2 + 1])[1:]
    idxs, amps = find_peaks_topk(asd, jnp.asarray(band_mask), npeaks,
                                 distance_bins)
    freqs = jnp.where(idxs >= 0,
                      jnp.asarray(freqs_fold, asd.dtype)[jnp.clip(idxs, 0)],
                      SENTINEL)
    return freqs, amps, dc_amp


def phase_at_peaks_half(
    vr_h: jnp.ndarray,
    fs: float,
    n: int,
    band_mask: np.ndarray,
    npeaks: int,
    distance_bins: int,
    pretrigger: int = 0,
    threshold_factor: float = 0.0,
):
    """:func:`phase_at_peaks` from the natural-order half spectrum.

    max|ṽ| over the half bins equals the full-spectrum max (mirror bins
    have equal magnitude), so the threshold is unchanged."""
    asd, _ = event_psd_folded_half(vr_h, fs, n)
    freqs_fold = np.abs(np.fft.fftfreq(n, d=1.0 / fs)[: n // 2 + 1])[1:]

    k = jnp.arange(n // 2 + 1)
    shifted = vr_h * jnp.exp(2j * jnp.pi * k * (pretrigger / n))
    mag = jnp.abs(vr_h)
    thr = jnp.max(mag, axis=-1, keepdims=True) * threshold_factor
    phase_half = jnp.angle(shifted)
    phase_half = jnp.where(mag >= thr, phase_half, SENTINEL)
    phase_fold = phase_half[..., 1:]

    idxs, _ = find_peaks_topk(asd, jnp.asarray(band_mask), npeaks,
                              distance_bins)
    safe = jnp.clip(idxs, 0)
    phases = jnp.take_along_axis(phase_fold, safe, axis=-1)
    phases = jnp.where(idxs >= 0, phases, SENTINEL)
    freqs = jnp.where(idxs >= 0,
                      jnp.asarray(freqs_fold, asd.dtype)[safe], SENTINEL)
    return freqs, phases


def phase_at_peaks(
    vfft: jnp.ndarray,
    fs: float,
    band_mask: np.ndarray,
    npeaks: int,
    distance_bins: int,
    pretrigger: int = 0,
    threshold_factor: float = 0.0,
):
    """Phase (radians) at PSD peak frequencies (core/algorithms.py:1183-1343).

    The FFT phase is referenced to the pretrigger sample
    (multiply by e^{+2πi f t0}, t0 = pretrigger/fs) and bins whose magnitude
    is below threshold_factor·max|ṽ| return the sentinel.
    """
    n = vfft.shape[-1]
    asd, _ = event_psd_folded(vfft, fs)
    freqs_fold = np.abs(np.fft.fftfreq(n, d=1.0 / fs)[: n // 2 + 1])[1:]

    k = jnp.arange(n)
    shifted = vfft * jnp.exp(2j * jnp.pi * k * (pretrigger / n))
    mag = jnp.abs(vfft)
    thr = jnp.max(mag, axis=-1, keepdims=True) * threshold_factor
    phase_full = jnp.angle(shifted)
    phase_full = jnp.where(mag >= thr, phase_full, SENTINEL)
    # fold: positive-frequency bins, DC dropped
    phase_fold = phase_full[..., 1 : n // 2 + 1]

    idxs, _ = find_peaks_topk(asd, jnp.asarray(band_mask), npeaks,
                              distance_bins)
    safe = jnp.clip(idxs, 0)
    phases = jnp.take_along_axis(phase_fold, safe, axis=-1)
    phases = jnp.where(idxs >= 0, phases, SENTINEL)
    freqs = jnp.where(idxs >= 0,
                      jnp.asarray(freqs_fold, asd.dtype)[safe], SENTINEL)
    return freqs, phases
