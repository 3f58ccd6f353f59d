"""Continuous-trace optimal-filter trigger kernels.

TPU-native replacement for the reference OptimumFilterTrigger
(detprocess/core/oftrigger.py:324-1037). The reference runs
scipy.signal.oaconvolve + einsum per continuous trace in Python
(oftrigger.py:659-672) and merges threshold crossings with a Python loop;
here everything runs on device with static shapes:

1. **FIR filter bank** (`of_fir`): overlap-save FFT convolution of the
   C-channel continuous trace with the M matched filters, giving the
   amplitude-numerator time series q [M, L].
2. **Δχ²(t) = q(t)ᵀ W⁻¹ q(t)** and amplitudes a(t) = W⁻¹ q(t)
   (oftrigger.py:666-672).
3. **Threshold + pileup merge** (`find_triggers_kernel`): above-threshold
   samples whose gaps are ≤ pileup_window merge into one trigger at the
   max-Δχ² sample (oftrigger.py:975-1019, _getchangeslessthanthresh) —
   implemented as a cummax-based segmented argmax with a fixed trigger
   capacity K (data-dependent counts become masks).
4. **Residual re-trigger** (`residual_subtract`): subtract each first-pass
   trigger's best-fit Δχ² response and re-threshold
   (oftrigger.py:752-842), with the 50 kHz-LPF saturation veto.

Time alignment: the matched filter is built so that a pulse whose *trigger
point* (template pretrigger sample) sits at continuous-trace index T puts
the Δχ² maximum exactly at index T — equivalent to the reference's
'same'-mode convolution plus its ``pretrigger − N//2`` index shift
(oftrigger.py:456, :1005).

χ² thresholds: a sigma-level ``thresh`` maps to a χ²_M threshold via
``gammainccinv(M/2, 2·norm.sf(thresh))·2`` for thresh < 25, else thresh²
(oftrigger.py:961-973) — computed on host (static).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special, stats

from detprocess_tpu.ops import fft as dfft
from detprocess_tpu.ops.filterbank import OFNxMBank, split_complex, join_complex


# ---------------------------------------------------------------------------
# host precompute
# ---------------------------------------------------------------------------

def chi2_threshold(thresh_sigma: float, m_amplitudes: int) -> float:
    """Sigma-level → χ²_M threshold (oftrigger.py:961-973)."""
    if thresh_sigma < 25:
        sf = stats.norm.sf(thresh_sigma) * 2
        return float(special.gammainccinv(m_amplitudes / 2, sf) * 2)
    return float(thresh_sigma**2)


class TriggerKernel(NamedTuple):
    """Host-side trigger precompute, transferable as real arrays."""

    g_fft: np.ndarray          # [C, M, F, 2] split re/im — FFT of flipped
                               # linear matched filters, padded to F
    iw_matrix: np.ndarray      # [M, M]
    response: np.ndarray       # [M, M, 2·Nt-1] Δχ²-subtraction responses:
                               # response[i, j] = (filter_i ⋆ template_j)
    nt: int                    # template length
    pretrigger: int
    fs: float
    block: int                 # overlap-save block size B
    fft_size: int              # F ≥ B + Nt − 1
    resolution: np.ndarray     # per-amplitude σ


def make_trigger_kernel(bank: OFNxMBank, block: int = 16384,
                        real_dtype=np.float32) -> TriggerKernel:
    """Build the continuous-trigger kernel from an NxM OF bank.

    The linear matched filter for amplitude i, channel c is
    ``w[c,i,τ] = N·ifft(Phi[c,i])(τ mod N)`` re-rolled so τ is measured
    from the window start; convolution uses the flipped kernel.
    """
    c, m, n = bank.templates.shape
    p = bank.pretrigger
    # circular matched filter w(τ) = N·ifft(Phi). The linear FIR kernel is
    # h(j) = w((j−(N−1)) mod N), j ∈ [0, N), so that with y = conv(x, h)
    # the amplitude numerator is q(T) = y[T + N−1−pretrigger]: a pulse
    # whose trigger point sits at continuous index T peaks at q[T]
    # (equivalent to the reference's conv-with-phi_td + index shift,
    # oftrigger.py:659-664, :1005; alignment tested in test_trigger.py)
    w_circ = np.real(np.fft.ifft(bank.phi, axis=-1)) * n    # [C, M, N]
    g = np.roll(w_circ, n - 1, axis=-1)
    f_size = int(2 ** np.ceil(np.log2(block + n)))
    g_pad = np.zeros((c, m, f_size))
    g_pad[..., :n] = g
    g_fft = np.fft.fft(g_pad, axis=-1)

    # Δχ² subtraction responses: filter i applied to a unit pulse of
    # template j, as a function of lag d around the pulse position:
    # resp_ij(d) = Re Σ_{c,k} Phi[c,i,k]·S̃[c,j,k]·e^{2πikd/N}  (circular);
    # stored on a symmetric lag axis −(N−1)..(N−1).
    cross = np.einsum("cik,cjk->ijk", bank.phi, bank.s_fft)
    resp_circ = np.real(np.fft.ifft(cross, axis=-1)) * n     # [M, M, N]
    resp = np.concatenate([resp_circ[..., -(n - 1):], resp_circ],
                          axis=-1)

    return TriggerKernel(
        g_fft=split_complex(g_fft, real_dtype),
        iw_matrix=bank.iw_matrix.astype(real_dtype),
        response=resp.astype(real_dtype),
        nt=n, pretrigger=p, fs=bank.fs, block=block, fft_size=f_size,
        resolution=bank.resolution.astype(real_dtype),
    )


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def of_fir(trace: jnp.ndarray, kernel: TriggerKernel) -> jnp.ndarray:
    """Overlap-save FIR: continuous trace [C, L] → q [M, L].

    Edge samples (first/last Nt) are zeroed, mirroring the reference's
    padding cut (oftrigger.py:674-679).
    """
    c, l = trace.shape
    nt, p = kernel.nt, kernel.pretrigger
    b, f = kernel.block, kernel.fft_size
    g_fft = join_complex(jnp.asarray(kernel.g_fft))

    # full convolution y = conv(x, h); q(T) = y[T + nt−1−p] for T ∈ [0, L)
    y_len = l + nt
    nblocks = -(-y_len // b)
    pad_left = nt - 1
    pad_right = nblocks * b + f - (pad_left + l)
    xpad = jnp.pad(trace, ((0, 0), (pad_left, max(pad_right, 0))))

    starts = jnp.arange(nblocks) * b
    idx = starts[:, None] + jnp.arange(f)[None, :]            # [nb, F]
    segments = xpad[:, idx]                                    # [C, nb, F]
    seg_fft = dfft.fft(segments, axis=-1)                      # [C, nb, F]
    prod = jnp.einsum("cbf,cmf->mbf", seg_fft, g_fft)
    y_blocks = dfft.ifft(prod, axis=-1).real[..., nt - 1: nt - 1 + b]
    y = y_blocks.reshape(y_blocks.shape[0], -1)                # [M, ≥y_len]
    start = nt - 1 - p
    q = y[:, start:start + l]                                  # [M, L]

    # zero the edge regions (reference padding cut, oftrigger.py:674-679)
    t = jnp.arange(l)
    valid = (t >= nt) & (t < l - nt)
    return q * valid[None, :]


def delta_chi2(q: jnp.ndarray, iw_matrix: jnp.ndarray):
    """(Δχ²(t) [L], amplitudes a(t) [M, L]) from q [M, L]."""
    amps = jnp.einsum("ij,jt->it", iw_matrix, q)
    dchi2 = jnp.einsum("it,it->t", amps, q)
    return dchi2, amps


class TriggerSet(NamedTuple):
    """Fixed-capacity trigger list (mask-compacted on host)."""

    indices: jnp.ndarray      # [K] int32, -1 = empty slot
    dchi2: jnp.ndarray        # [K]
    amplitudes: jnp.ndarray   # [M, K]
    count: jnp.ndarray        # scalar int32


def find_triggers_kernel(dchi2: jnp.ndarray, amps: jnp.ndarray,
                         threshold: float, pileup_window: int,
                         capacity: int) -> TriggerSet:
    """Threshold + pileup merge, fixed capacity.

    Above-threshold samples with successive gaps ≤ pileup_window form one
    trigger at their max-Δχ² sample (_getchangeslessthanthresh semantics,
    oftrigger.py:29-74, :996-1019).
    """
    l = dchi2.shape[-1]
    t = jnp.arange(l)
    above = dchi2 > threshold

    # previous above-sample index (exclusive)
    marked = jnp.where(above, t, -1)
    prev_incl = jax.lax.associative_scan(jnp.maximum, marked)
    prev_excl = jnp.concatenate([jnp.full((1,), -1, marked.dtype),
                                 prev_incl[:-1]])
    gap = t - prev_excl
    new_group = above & ((prev_excl < 0) | (gap > pileup_window))
    group_id = jnp.cumsum(new_group.astype(jnp.int32)) - 1     # valid where above
    gid = jnp.where(above, jnp.clip(group_id, 0, capacity - 1), capacity)

    # segmented max of dchi2 per group
    best = jnp.full((capacity + 1,), -jnp.inf, dchi2.dtype)
    best = best.at[gid].max(dchi2)
    # first index achieving the max in each group
    is_best = above & (dchi2 == best[gid])
    first_idx = jnp.full((capacity + 1,), l, jnp.int32)
    first_idx = first_idx.at[jnp.where(is_best, gid, capacity)].min(
        t.astype(jnp.int32))

    count = jnp.minimum(jnp.sum(new_group.astype(jnp.int32)), capacity)
    slot = jnp.arange(capacity)
    valid = slot < count
    indices = jnp.where(valid, first_idx[:capacity], -1)
    safe = jnp.clip(indices, 0)
    return TriggerSet(
        indices=indices,
        dchi2=jnp.where(valid, dchi2[safe], 0.0),
        amplitudes=jnp.where(valid[None, :], amps[:, safe], 0.0),
        count=count,
    )


def find_triggers_dynamic(dchi2: np.ndarray, amps: np.ndarray,
                          threshold: float, threshold_function,
                          capacity: int | None = None):
    """Host-side dynamic-pileup-window triggering.

    Equivalent of the reference's ``dynamic=True`` path
    (oftrigger.py:78-142, :982-985): the merge window between successive
    above-threshold samples is a user function of the running maximum
    amplitude in the current group — inherently sequential and
    user-code-driven, so it runs on host over the (compacted)
    above-threshold samples.

    Returns (indices, dchi2_values, amplitudes [M, K]).
    """
    dchi2 = np.asarray(dchi2)
    amps = np.asarray(amps)
    above = np.where(dchi2 > threshold)[0]
    if len(above) == 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0),
                np.zeros((amps.shape[0], 0)))
    starts = [0]
    current = 0
    for i in range(1, len(above)):
        window = threshold_function(
            float(np.max(dchi2[above[current: i + 1]])))
        if above[i] - above[i - 1] > window:
            starts.append(i)
            current = i
    starts.append(len(above))
    idx_out, d_out = [], []
    for a, b in zip(starts[:-1], starts[1:]):
        group = above[a:b]
        best = group[np.argmax(dchi2[group])]
        idx_out.append(best)
        d_out.append(dchi2[best])
        if capacity is not None and len(idx_out) >= capacity:
            break
    idx_out = np.asarray(idx_out, dtype=np.int64)
    return idx_out, np.asarray(d_out), amps[:, idx_out]


def shift_templates_to_match_chi2(fs: float, primary_template,
                                  secondary_templates, noisecsd,
                                  relative_amplitudes=None,
                                  block: int = 16384):
    """Shift secondary templates so the primary trigger peaks at the same
    time on all of them (oftrigger.py:146-259 equivalent).

    Runs the primary trigger kernel over each template rendered as a trace
    and rolls the secondaries by the Δχ²-peak offset. Returns
    (shifted_templates, shift_samples).
    """
    from detprocess_tpu.ops.filterbank import (make_ofnxm_bank,
                                               _reshape_template_3d)

    primary = _reshape_template_3d(np.asarray(primary_template))
    c, m, n = primary.shape
    if relative_amplitudes is None:
        relative_amplitudes = np.ones(m)
    bank = make_ofnxm_bank(primary, np.asarray(noisecsd), fs, n // 2)
    kernel = make_trigger_kernel(bank, block=block, real_dtype=np.float64)

    def peak_time(template_3d):
        trace = np.einsum("cmn,m->cn", template_3d, relative_amplitudes)
        # embed in a longer trace so edge zeroing doesn't clip the pulse
        pad = np.zeros((c, 4 * n))
        pad[:, int(1.5 * n):int(2.5 * n)] = trace
        q = of_fir(jnp.asarray(pad), kernel)
        d, _ = delta_chi2(q, jnp.asarray(kernel.iw_matrix))
        return int(jnp.argmax(d))

    t_primary = peak_time(primary)
    shifted, shifts = [], np.zeros(len(secondary_templates), dtype=int)
    for i, sec in enumerate(secondary_templates):
        sec3 = _reshape_template_3d(np.asarray(sec))
        t_sec = peak_time(sec3)
        shifts[i] = t_primary - t_sec
        shifted.append(np.roll(sec3, shifts[i], axis=-1))
    return shifted, shifts


def saturation_mask(lpf_trace: jnp.ndarray, sat_amplitudes,
                    window: int, positive_pulses: bool = True) -> jnp.ndarray:
    """Per-sample saturation flag: any channel's LPF trace beyond its
    saturation amplitude within ±window samples (oftrigger.py:776-787)."""
    sat = jnp.asarray(sat_amplitudes)[:, None]
    over = (lpf_trace > sat) if positive_pulses else (lpf_trace < -sat)
    over_any = jnp.any(over, axis=0).astype(jnp.float32)
    # dilate with a running max over ±window
    dil = jax.lax.reduce_window(
        over_any, -jnp.inf, jax.lax.max,
        window_dimensions=(2 * window + 1,), window_strides=(1,),
        padding=((window, window),))
    return dil > 0


def residual_subtract(dchi2: jnp.ndarray, triggers: TriggerSet,
                      kernel: TriggerKernel,
                      saturated: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Subtract each trigger's best-fit Δχ² response from the Δχ² trace
    (oftrigger.py:789-817), skipping saturated triggers.

    The response of filter i to the best-fit pulse (amplitudes â at index
    T) is q_resp_i(t) = Σ_j response[i, j, (t−T) + Nt−1]·â_j; the
    subtracted trace is q_respᵀ W⁻¹ q_resp centered on its own argmax
    aligned to T.
    """
    nt = kernel.nt
    iw = jnp.asarray(kernel.iw_matrix)
    resp = jnp.asarray(kernel.response)                    # [M, M, 2Nt−1]
    l = dchi2.shape[-1]
    k = triggers.indices.shape[0]

    # per-trigger q response on the 2Nt−1 lag axis: [K, M, 2Nt−1]
    q_resp = jnp.einsum("ijl,jk->kil", resp, triggers.amplitudes)
    d_resp = jnp.einsum("kil,ij,kjl->kl", q_resp, iw, q_resp)  # [K, 2Nt−1]
    # align each response's peak to the trigger index
    peak = jnp.argmax(d_resp, axis=-1)                         # [K]

    valid = triggers.indices >= 0
    if saturated is not None:
        sat_at = saturated[jnp.clip(triggers.indices, 0)]
        valid = valid & ~sat_at
    start = triggers.indices - peak                            # [K]

    # scatter-subtract all responses at once
    lag = jnp.arange(d_resp.shape[-1])
    pos = start[:, None] + lag[None, :]                        # [K, 2Nt−1]
    inbounds = (pos >= 0) & (pos < l) & valid[:, None]
    contrib = jnp.where(inbounds, d_resp, 0.0)
    flat_pos = jnp.clip(pos, 0, l - 1).reshape(-1)
    out = dchi2.at[flat_pos].add(-contrib.reshape(-1))
    return out
