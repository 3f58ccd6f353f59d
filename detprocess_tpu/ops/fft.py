"""Large-N FFTs for TPU: four-step (Bailey) decomposition + Bluestein.

The TPU backend's native XLA FFT only supports small transforms (empirically
N ≤ 4096 on v5e/axon; larger sizes raise UNIMPLEMENTED). Detector traces are
16k–32k samples (SURVEY.md §3, BASELINE.md), so every hot kernel needs big
FFTs. This module implements them the TPU-native way:

**Four-step FFT** — for composite N = N1·N2 (both ≤ 4096):

    x[n1·N2 + n2]  →  reshape to [N1, N2]
    (1) length-N1 FFTs along axis 0 (batched over N2 columns)
    (2) multiply by twiddles  W_N^(k1·n2)
    (3) length-N2 FFTs along axis 1 (batched over N1 rows)
    (4) X[k1 + N1·k2] = H[k1, k2]  (transpose + reshape)

Every step is a batched small FFT or an elementwise multiply — exactly the
shapes the TPU vector unit wants. Recursion handles N up to 4096³.

**Bluestein / chirp-z** — for large sizes with no ≤4096 factorization
(e.g. large primes): converts the DFT into a power-of-two convolution which
reuses the four-step path.

The decomposition is mathematically exact, so the same code path runs on CPU
(float64 golden tests) and TPU (float32/complex64).


Reference role: stands in for every np.fft/scipy.fft call in the
reference and QETpy (e.g. qetpy OFBase FFTs, detprocess
core/oftrigger.py:659-672 oaconvolve internals) — those run host
FFTW/pocketfft; here large-N transforms must be MXU matmuls because
the TPU backend's native FFT stops at N=4096.
"""

from __future__ import annotations

from functools import partial

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

# Largest FFT the TPU backend handles natively (empirical, v5e).
MAX_NATIVE_FFT = 4096

# Largest DFT factor implemented as an explicit matrix multiply. Balanced
# matmul-DFT stages (e.g. 32768 = 128×256) run ~2× faster than native-FFT
# stages on the TPU: both stages ride the MXU and avoid the strided
# transposes of an axis-(-2) FFT. float32 matmuls use Precision.HIGHEST
# (≈4e-7 relative error; the bf16 default loses ~1e-3).
MATMUL_DFT_MAX = 512


def _split_size(n: int) -> tuple[int, int] | None:
    """Find (n1, n2) with n1·n2 = n, n2 ≤ MAX_NATIVE, preferring large,
    balanced factors. Returns None if n has no such factorization."""
    best = None
    # prefer n2 as big as possible (deep pipelined inner FFT), n1 minimal
    for n2 in range(min(n, MAX_NATIVE_FFT), 1, -1):
        if n % n2 == 0:
            n1 = n // n2
            return (n1, n2)
    return None


def _real_dtype(cdtype):
    return jnp.float64 if cdtype == jnp.complex128 else jnp.float32


def const_complex(arr: np.ndarray, cdtype) -> jnp.ndarray:
    """Bring a host complex constant on device as split re/im real arrays.

    The TPU backend does not implement complex host↔device transfers
    (empirical: UNIMPLEMENTED on axon/v5e); complex values must be
    *constructed on device* from real parts. This helper is the one
    sanctioned path for host complex constants into device code.
    """
    rdt = _real_dtype(cdtype)
    return jax.lax.complex(jnp.asarray(np.asarray(arr).real, rdt),
                           jnp.asarray(np.asarray(arr).imag, rdt))


def _twiddle(n1: int, n2: int, n: int, dtype) -> jnp.ndarray:
    """W_N^(k1·n2) twiddle matrix [n1, n2], computed in float64 on host for
    accuracy, shipped as real cos/sin and joined on device."""
    k1 = np.arange(n1)[:, None]
    m2 = np.arange(n2)[None, :]
    ang = -2.0 * np.pi * ((k1 * m2) % n) / n  # mod n keeps angles small/exact
    return const_complex(np.cos(ang) + 1j * np.sin(ang), dtype)


def fft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """FFT along ``axis`` supporting arbitrary N on TPU."""
    if axis not in (-1, x.ndim - 1):
        x = jnp.moveaxis(x, axis, -1)
        out = _fft_last(x)
        return jnp.moveaxis(out, -1, axis)
    return _fft_last(x)


def ifft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inverse FFT via conj(FFT(conj(x)))/N."""
    n = x.shape[axis]
    return jnp.conj(fft(jnp.conj(x), axis=axis)) / n


def rfft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Real-input FFT, returning the N//2+1 non-negative-frequency bins.

    For even N the classic packing is used: the real sequence is viewed as
    N/2 complex samples z_m = x_{2m} + i·x_{2m+1}; one half-size complex
    FFT plus an O(N) untangling yields the half spectrum — half the work
    and memory traffic of a full complex FFT.
    """
    if axis not in (-1, x.ndim - 1):
        return jnp.moveaxis(rfft(jnp.moveaxis(x, axis, -1)), -1, axis)
    n = x.shape[-1]
    if n % 2 != 0 or n < 4:
        full = fft(x.astype(_complex_dtype(x.dtype)), axis=-1)
        return full[..., : n // 2 + 1]
    m = n // 2
    cdtype = _complex_dtype(x.dtype)
    z = jax.lax.complex(x[..., 0::2], x[..., 1::2]).astype(cdtype)
    zf = _fft_last(z)                                   # [.., M]
    # untangle in one fused pass: with even/odd recombination folded into
    # precomputed coefficients, half_k = a_k·zf_k + b_k·conj(zf_{M−k}):
    #   a = ½(1 − i·w), b = ½(1 + i·w), w = e^{−2πik/n}
    # (the naive even/odd form materializes two extra [.., M] complex
    # intermediates — measured ~4.5 ms overhead vs ~2 ms for this form on
    # 1024×32k batches, more than the core FFT itself)
    k = np.arange(m)
    w = np.exp(-2j * np.pi * k / n)
    a = const_complex(0.5 * (1.0 - 1j * w), cdtype)
    b = const_complex(0.5 * (1.0 + 1j * w), cdtype)
    zf_rev = jnp.concatenate([zf[..., :1], zf[..., :0:-1]], axis=-1)
    half = a * zf + b * jnp.conj(zf_rev)                 # k ∈ [0, M)
    nyq = (zf[..., :1].real - zf[..., :1].imag).astype(x.dtype)
    return jnp.concatenate([half, nyq.astype(cdtype)], axis=-1)


def irfft(x: jnp.ndarray, n: int, axis: int = -1) -> jnp.ndarray:
    """Inverse of rfft (length-n real output), via the inverse packing:
    one half-size complex inverse FFT."""
    if axis not in (-1, x.ndim - 1):
        return jnp.moveaxis(irfft(jnp.moveaxis(x, axis, -1), n), -1, axis)
    if n % 2 != 0 or n < 4:
        if n % 2 == 0:
            neg = jnp.conj(x[..., 1:-1][..., ::-1])
        else:
            neg = jnp.conj(x[..., 1:][..., ::-1])
        full = jnp.concatenate([x, neg], axis=-1)
        return ifft(full, axis=-1).real
    m = n // 2
    cdtype = _complex_dtype(x.dtype)
    xk = x[..., :m]                                      # k ∈ [0, M)
    x_rev = jnp.concatenate([x[..., m:m + 1], x[..., m - 1:0:-1]], axis=-1)
    # inverse packing in one fused pass (see rfft): with the even/odd
    # recombination folded into coefficients,
    #   z_k = c_k·X_k + d_k·conj(X_{M−k}),
    #   c = ½(1 + i·w⁻¹), d = ½(1 − i·w⁻¹), w⁻¹ = e^{+2πik/n}
    k = np.arange(m)
    w_inv = np.exp(2j * np.pi * k / n)
    c = const_complex(0.5 * (1.0 + 1j * w_inv), cdtype)
    d = const_complex(0.5 * (1.0 - 1j * w_inv), cdtype)
    z = c * xk + d * jnp.conj(x_rev)
    zt = ifft(z, axis=-1)                                # [.., M] complex
    out = jnp.stack([zt.real, zt.imag], axis=-1)
    return jnp.reshape(out, x.shape[:-1] + (n,)).astype(zt.real.dtype)


def _complex_dtype(dtype):
    if dtype in (jnp.float64, jnp.complex128):
        return jnp.complex128
    return jnp.complex64


def _balanced_split(n: int):
    """Most balanced factor pair (n1, n2), n1 ≤ n2, both ≤ MATMUL_DFT_MAX."""
    for d in range(int(np.sqrt(n)), 0, -1):
        if n % d == 0:
            n1, n2 = d, n // d
            if n2 <= MATMUL_DFT_MAX:
                return (n1, n2)
            return None
    return None


def _dft_matrix(n: int, cdtype) -> jnp.ndarray:
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k % n) / n
    return const_complex(np.cos(ang) + 1j * np.sin(ang), cdtype)


def _dft_mats_real(n: int, rdtype):
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    return (jnp.asarray(np.cos(ang), rdtype),
            jnp.asarray(np.sin(ang), rdtype))


def _twiddle_real(n1: int, n2: int, n: int, rdtype):
    k1 = np.arange(n1)[:, None]
    m2 = np.arange(n2)[None, :]
    ang = -2.0 * np.pi * ((k1 * m2) % n) / n
    return (jnp.asarray(np.cos(ang), rdtype),
            jnp.asarray(np.sin(ang), rdtype))


_MATMUL_PRECISION = [jax.lax.Precision.HIGHEST]


def current_matmul_precision():
    """The DFT-matmul precision active in this trace context — for
    kernels outside this module (e.g. the windowed direct delay
    evaluation in ops/of1x1.py) that should honor the same override."""
    return _MATMUL_PRECISION[-1]


def einsum(subs, *ops):
    """``jnp.einsum`` at the trace-context DFT-matmul precision.

    On TPU a DEFAULT-precision einsum rounds its f32 inputs to bf16
    (~2⁻⁸ relative error — measured 3.5e-3 amplitude error and
    delay-argmax jitter vs the f64 goldens on chip), so every
    contraction on f32 device data must carry the same precision as the
    DFT matmuls. Use this instead of ``jnp.einsum`` anywhere in the
    compute path."""
    return jnp.einsum(subs, *ops, precision=current_matmul_precision())


@contextmanager
def matmul_precision(prec):
    """Override the DFT-matmul precision within this trace context.

    'highest' (default, 6-pass bf16, ~4e-7 rel err) for physics-grade
    amplitudes; 'high' (3-pass bf16, ~f32 accuracy, ~2x faster on the MXU)
    where downstream only thresholds — e.g. the continuous trigger FIR.
    Takes effect at trace time: wrap the jit-traced computation, not the
    dispatch.
    """
    if isinstance(prec, str):
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[prec.lower()]
    _MATMUL_PRECISION.append(prec)
    try:
        yield
    finally:
        _MATMUL_PRECISION.pop()


def _matmul_fft_stages(x: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """Four-step FFT stages as DFT matmuls (MXU path), WITHOUT the final
    transpose: output is blocked storage ``h[k1, k2]`` holding spectral
    bin ``k1 + n1·k2`` (see :func:`perm_indices`).

    Complex arithmetic is explicit re/im so every contraction is a REAL
    matmul — XLA's complex dot lowers poorly on TPU. Precision comes from
    the ``matmul_precision`` context (HIGHEST unless overridden).
    """
    n = x.shape[-1]
    cdtype = _complex_dtype(x.dtype)
    rdtype = jnp.float64 if cdtype == jnp.complex128 else jnp.float32
    hi = _MATMUL_PRECISION[-1]

    xc = x.astype(cdtype)
    xm_re = jnp.reshape(xc.real.astype(rdtype), x.shape[:-1] + (n1, n2))
    xm_im = jnp.reshape(xc.imag.astype(rdtype), x.shape[:-1] + (n1, n2))
    c1, s1 = _dft_mats_real(n1, rdtype)

    def mm1(w, a):
        return jnp.einsum("ij,...jk->...ik", w, a, precision=hi)

    g_re = mm1(c1, xm_re) - mm1(s1, xm_im)
    g_im = mm1(s1, xm_re) + mm1(c1, xm_im)

    twc, tws = _twiddle_real(n1, n2, n, rdtype)
    h_re = g_re * twc - g_im * tws
    h_im = g_re * tws + g_im * twc

    c2, s2 = _dft_mats_real(n2, rdtype)

    def mm2(w, a):
        return jnp.einsum("kl,...il->...ik", w, a, precision=hi)

    o_re = mm2(c2, h_re) - mm2(s2, h_im)
    o_im = mm2(s2, h_re) + mm2(c2, h_im)
    return jax.lax.complex(o_re, o_im)                 # [..., n1, n2]


def _matmul_fft_last(x: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """Four-step matmul FFT in natural output order (blocked stages + one
    final transpose pass)."""
    out = jnp.swapaxes(_matmul_fft_stages(x, n1, n2), -1, -2)
    return jnp.reshape(out, x.shape[:-1] + (n1 * n2,))


# ---------------------------------------------------------------------------
# permuted-layout (transpose-free) transforms
#
# The four-step FFT's only non-matmul HBM passes are the final transpose and
# (for real input) the untangle's reversed-index read. But every optimal-
# filter consumer is either order-agnostic (weighted reductions over k) or
# ends in an inverse transform — so the spectrum never NEEDS to be in
# natural order. These variants keep the forward output in its blocked
# [k1, k2] storage order and derive the inverse decomposition that CONSUMES
# exactly that order while emitting natural-order output:
#
#     x[m2 + n2·m1] = Σ_{k1} e^{+2πik1(m2+n2·m1)/M} ·
#                      (Σ_{k2} h[k1,k2] e^{+2πik2·m2/n2}) / M
#
# i.e. stage A = n2-point IDFT along the LAST storage axis, twiddle, stage
# C = n1-point IDFT along the PENULTIMATE axis — both leave the storage
# layout untouched and the [m1, m2] result flattens row-major into natural
# time order. Zero transposes in either direction; k-space weights are
# pre-permuted on the host (perm_indices/half_perm_indices). Measured
# round-3: the feature OF chain is bound by exactly these intermediate
# passes (BASELINE.md roofline), not by matmul FLOPs.
# ---------------------------------------------------------------------------

def perm_split(n: int):
    """(n1, n2) when the blocked matmul four-step path applies to an
    n-point complex transform; None otherwise (native FFT sizes run in
    natural order already)."""
    if n <= MAX_NATIVE_FFT:
        return None
    return _balanced_split(n)


def perm_indices(n: int):
    """Storage→spectral map of the blocked forward transform: entry j is
    the spectral bin held at storage position j (j = k1·n2 + k2 holds
    k1 + n1·k2). None when the transform runs in natural order."""
    sp = perm_split(n)
    if sp is None:
        return None
    n1, n2 = sp
    k1 = np.arange(n1)[:, None]
    k2 = np.arange(n2)[None, :]
    return np.reshape(k1 + n1 * k2, -1)


def half_perm_indices(n: int):
    """Storage→spectral map for :func:`rfft_perm` of even length n:
    length M+1 (M = n//2); positions [0, M) follow perm_indices(M),
    position M holds the Nyquist bin. None when rfft_perm does not apply
    (odd n, or M small enough for the native path)."""
    if n % 2 != 0:
        return None
    pm = perm_indices(n // 2)
    if pm is None:
        return None
    return np.concatenate([pm, [n // 2]])


def unperm_indices(n: int):
    """Inverse of :func:`perm_indices`: entry k is the storage position of
    spectral bin k in the blocked layout — the ONE small gather that
    restores natural frequency order after an order-agnostic reduction.
    None when the transform runs in natural order."""
    pm = perm_indices(n)
    return None if pm is None else np.argsort(pm)


def half_unperm_indices(n: int):
    """Inverse of :func:`half_perm_indices` (same convention)."""
    pm = half_perm_indices(n)
    return None if pm is None else np.argsort(pm)


# Per-SITE dispatch of the spectral storage layout, set from the
# on-chip A/Bs (benchmarks/perm_ab.py; BASELINE.md "Permuted layout on
# chip" and "Packed of1x1 chain"): the trigger FIR (+2.7%) and Welch
# spectra (+3.9%) keep the permuted (transpose-free) layout; the
# feature site runs the PACKED Z-domain chain ("packed" — 1.3× over the
# natural chain, which itself beat plain-perm 1.2×). Under "packed" the
# site helpers still return the permuted indices (consumers that need
# an explicit half spectrum — psd features, of1x2, the direct windowed
# kernels — see the permuted layout, derived from the packed pair by
# ops/fft.untangle_pair). Tests force a path by patching this dict (or
# the raw index functions, which the helpers call through); False =
# natural order, True = permuted half/full-spectrum chain.
PERM_SITES = {"feature": "packed", "trigger": "packed", "spectral": True}


def site_perm_indices(n: int, site: str):
    """:func:`perm_indices` gated by the per-site dispatch table."""
    if not PERM_SITES.get(site, True):
        return None
    return perm_indices(n)


def site_half_perm_indices(n: int, site: str):
    """:func:`half_perm_indices` gated by the per-site dispatch table."""
    if not PERM_SITES.get(site, True):
        return None
    return half_perm_indices(n)


def site_unperm_indices(n: int, site: str):
    """:func:`unperm_indices` gated by the per-site dispatch table."""
    if not PERM_SITES.get(site, True):
        return None
    return unperm_indices(n)


def site_packed(n: int, site: str) -> bool:
    """True when the packed (Z-domain) real chain is the dispatch for
    ``site`` at this trace length — the single owner of the
    "PERM_SITES says packed AND the four-step transform engages" test
    every plan/bench/entry site needs."""
    return (PERM_SITES.get(site, True) == "packed"
            and half_perm_indices(n) is not None)


def _blocked_rev(x2: jnp.ndarray) -> jnp.ndarray:
    """Negate the spectral index in blocked storage: returns y with
    y[storage j] = x[storage of spectral (M − k_j) mod M].

    In blocked coords (k1, k2) ↔ k = k1 + n1·k2 the map is
    k1 → (n1−k1)%n1 with k2 → n2−1−k2 for k1>0, and k2 → (n2−k2)%n2 on
    the k1=0 row — i.e. a double flip, a roll, and a one-row fix: all
    structured relayouts (lax.rev/concat), no general gather.
    """
    t = jnp.flip(x2, axis=(-2, -1))
    t = jnp.roll(t, 1, axis=-2)
    row0 = jnp.roll(t[..., :1, :], 1, axis=-1)
    return jnp.concatenate([row0, t[..., 1:, :]], axis=-2)


def fft_perm(x: jnp.ndarray) -> jnp.ndarray:
    """Forward FFT along the last axis in permuted (blocked) storage
    order — spectral bin perm_indices(n)[j] at position j. Caller must
    have checked ``perm_split(n) is not None``."""
    n1, n2 = perm_split(x.shape[-1])
    out = _matmul_fft_stages(x, n1, n2)
    return jnp.reshape(out, x.shape[:-1] + (n1 * n2,))


def ifft_fromperm(xp: jnp.ndarray) -> jnp.ndarray:
    """Inverse FFT consuming permuted (blocked) storage order and
    emitting NATURAL time order — with zero transpose passes (see module
    comment for the derivation). Includes the 1/M normalization."""
    m = xp.shape[-1]
    n1, n2 = perm_split(m)
    cdtype = _complex_dtype(xp.dtype)
    rdtype = jnp.float64 if cdtype == jnp.complex128 else jnp.float32
    hi = _MATMUL_PRECISION[-1]

    h_re = jnp.reshape(xp.real.astype(rdtype), xp.shape[:-1] + (n1, n2))
    h_im = jnp.reshape(xp.imag.astype(rdtype), xp.shape[:-1] + (n1, n2))

    # stage A: G[k1, m2] = Σ_{k2} h[k1,k2]·e^{+2πik2·m2/n2}
    c2, s2 = _dft_mats_real(n2, rdtype)    # cos(θ), sin(−θ)=−sin for e^{−}

    def mmA(w, a):
        return jnp.einsum("...ik,km->...im", a, w, precision=hi)

    g_re = mmA(c2, h_re) + mmA(s2, h_im)   # e^{+} = conj(e^{−}) = (c, −s)
    g_im = mmA(c2, h_im) - mmA(s2, h_re)

    # twiddle e^{+2πik1·m2/M}
    twc, tws = _twiddle_real(n1, n2, m, rdtype)
    t_re = g_re * twc + g_im * tws
    t_im = g_im * twc - g_re * tws

    # stage C: x[m1, m2] = Σ_{k1} T[k1,m2]·e^{+2πik1·m1/n1} / M
    c1, s1 = _dft_mats_real(n1, rdtype)
    c1 = c1 / m
    s1 = s1 / m

    def mmC(w, a):
        return jnp.einsum("...km,kl->...lm", a, w, precision=hi)

    o_re = mmC(c1, t_re) + mmC(s1, t_im)
    o_im = mmC(c1, t_im) - mmC(s1, t_re)
    out = jax.lax.complex(o_re, o_im)      # [..., m1, m2] → natural flatten
    return jnp.reshape(out, xp.shape[:-1] + (m,))


def packed_spectrum(x: jnp.ndarray):
    """Packed spectrum pair (Z, Z_rev) of real traces — the raw material
    of the fused of1x1 chain (ops/of1x1.py ``*_packed`` kernels).

    Z = FFT_m(x_even + i·x_odd) in blocked (four-step) storage order,
    Z_rev its spectral reversal (storage j holds bin (m − k_j) mod m).
    The half spectrum satisfies V_k = A_k·Z_k + B_k·conj(Z_{(m−k)%m}),
    so every half-spectrum consumer is a per-bin combination of this
    pair — the packed kernels fold their own combination coefficients
    (filter multiply, inverse retangle, reduction weights) into host
    constants and never materialize V. Caller must have checked
    ``half_perm_indices(n) is not None``.
    """
    n = x.shape[-1]
    m = n // 2
    n1, n2 = perm_split(m)
    cdtype = _complex_dtype(x.dtype)
    z = jax.lax.complex(x[..., 0::2], x[..., 1::2]).astype(cdtype)
    z2 = _matmul_fft_stages(z, n1, n2)                   # [..., n1, n2]
    zrev = jnp.reshape(_blocked_rev(z2), z.shape)
    return jnp.reshape(z2, z.shape), zrev


def rfft_perm(x: jnp.ndarray) -> jnp.ndarray:
    """Half-spectrum FFT of real traces in permuted storage order.

    Returns [..., M+1] (M = n//2): position j < M holds spectral bin
    half_perm_indices(n)[j]; position M holds the Nyquist bin. Numerics
    identical to :func:`rfft` up to the (static) permutation. Caller must
    have checked ``half_perm_indices(n) is not None``.
    """
    zf, zrev = packed_spectrum(x)
    return untangle_pair(zf, zrev, x.shape[-1])


def untangle_coeffs(n: int, k: np.ndarray | None = None):
    """Host: the rfft untangle coefficients on the packed pair — the
    single owner of the algebra every packed-chain builder folds over:

        V_k = A_k·Z_k + B_k·conj(Z_rev,k),   k ∈ [0, M)

    with A = (1 − i·w)/2, B = (1 + i·w)/2, w = exp(−2πik/n). Returns
    (A, B, r) where r = (M − k) % M is the spectral-reversal partner
    index (meaningful for full-range ``k`` only). ``k`` defaults to
    arange(M); pass a subset (e.g. a low-frequency gather's bins, or
    permuted storage order) to evaluate just those bins."""
    m = n // 2
    if k is None:
        k = np.arange(m)
    k = np.asarray(k)
    w = np.exp(-2j * np.pi * k / n)
    a = 0.5 * (1.0 - 1j * w)
    b = 0.5 * (1.0 + 1j * w)
    return a, b, (m - k) % m


def packed_multiply_coeffs(h_half: np.ndarray, n: int):
    """Host: fold untangle → diagonal multiply by ``h_half`` → inverse
    retangle into one coefficient pair (P, Q) on the packed pair of
    :func:`packed_spectrum`:

        interleave(ifft_fromperm(P·Z + Q·conj(Z_rev))) == irfft(h·rfft(x), n)

    ``h_half``: natural-order half spectrum [..., M+1] (Nyquist folded
    into the k = 0 coefficients). Returns (P, Q) [..., M] in NATURAL bin
    order — permute by ``perm_indices(n//2)`` for the storage layout.
    Pure numpy float64; runs once at kernel/plan build.
    """
    h_half = np.asarray(h_half)
    m = n // 2
    if h_half.shape[-1] != m + 1:
        raise ValueError("h_half must be the natural half spectrum [M+1]")
    k = np.arange(m)
    a, b, r = untangle_coeffs(n)
    wi = np.exp(2j * np.pi * k / n)
    c = 0.5 * (1.0 + 1j * wi)
    d = 0.5 * (1.0 - 1j * wi)
    h = h_half[..., :m]
    hr = h_half[..., r]
    p = c * h * a + d * np.conj(hr * b[r])
    q = c * h * b + d * np.conj(hr * a[r])
    p[..., 0] = (c[0] * h_half[..., 0] * a[0]
                 + d[0] * np.conj(h_half[..., m]) * (1.0 + 1j) / 2.0)
    q[..., 0] = (c[0] * h_half[..., 0] * b[0]
                 + d[0] * np.conj(h_half[..., m]) * (1.0 - 1j) / 2.0)
    return p, q


def untangle_pair(zf: jnp.ndarray, zrev: jnp.ndarray, n: int) -> jnp.ndarray:
    """Half spectrum (permuted storage order, [..., M+1]) from the packed
    pair of :func:`packed_spectrum`: V = A·Z + B·conj(Z_rev) with the
    Nyquist bin (Re Z₀ − Im Z₀) appended at position M."""
    m = n // 2
    cdtype = zf.dtype
    # untangle with coefficients pre-permuted to storage order
    ah, bh, _ = untangle_coeffs(n, perm_indices(m))
    a = const_complex(ah, cdtype)
    b = const_complex(bh, cdtype)
    half = a * zf + b * jnp.conj(zrev)
    nyq = (zf[..., :1].real - zf[..., :1].imag)          # storage 0 = DC
    return jnp.concatenate([half, nyq.astype(cdtype)], axis=-1)


def irfft_fromperm(xp: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse of :func:`rfft_perm`: permuted half spectrum [..., M+1] →
    length-n real series in NATURAL order, zero transpose passes."""
    m = n // 2
    n1, n2 = perm_split(m)
    cdtype = _complex_dtype(xp.dtype)
    xk = xp[..., :m]
    rev = jnp.reshape(
        _blocked_rev(jnp.reshape(xk, xp.shape[:-1] + (n1, n2))),
        xk.shape)
    # storage 0 asks for spectral M−0 → the Nyquist bin, which lives at
    # position M, not in the blocked rev (which wraps to DC)
    rev = jnp.concatenate([xp[..., m:m + 1], rev[..., 1:]], axis=-1)
    pm = perm_indices(m)
    w_inv = np.exp(2j * np.pi * pm / n)
    c = const_complex(0.5 * (1.0 + 1j * w_inv), cdtype)
    d = const_complex(0.5 * (1.0 - 1j * w_inv), cdtype)
    z = c * xk + d * jnp.conj(rev)
    zt = ifft_fromperm(z)                                # natural order
    out = jnp.stack([zt.real, zt.imag], axis=-1)
    return jnp.reshape(out, xp.shape[:-1] + (n,)).astype(zt.real.dtype)


def _fft_last(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[-1]
    if n <= MAX_NATIVE_FFT:
        return jnp.fft.fft(x, axis=-1)
    bal = _balanced_split(n)
    if bal is not None:
        return _matmul_fft_last(x, *bal)
    split = _split_size(n)
    if split is None:
        return _bluestein_last(x)
    n1, n2 = split
    cdtype = _complex_dtype(x.dtype)
    xm = jnp.reshape(x.astype(cdtype), x.shape[:-1] + (n1, n2))
    # (1) length-n1 FFTs down the columns (recurse if n1 > native limit)
    if n1 <= MAX_NATIVE_FFT:
        g = jnp.fft.fft(xm, axis=-2)
    else:
        g = jnp.moveaxis(_fft_last(jnp.moveaxis(xm, -2, -1)), -1, -2)
    # (2) twiddles
    g = g * _twiddle(n1, n2, n, cdtype)
    # (3) length-n2 FFTs along the rows (n2 ≤ native limit by construction)
    h = jnp.fft.fft(g, axis=-1)
    # (4) X[k1 + n1·k2] = h[k1, k2] → swap, flatten
    out = jnp.swapaxes(h, -1, -2)
    return jnp.reshape(out, x.shape[:-1] + (n,))


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _bluestein_last(x: jnp.ndarray) -> jnp.ndarray:
    """Chirp-z transform: DFT of arbitrary N via a 2^k convolution."""
    n = x.shape[-1]
    cdtype = _complex_dtype(x.dtype)
    m = _next_pow2(2 * n - 1)
    # host-side chirp in float64
    k = np.arange(n)
    w = np.exp(-1j * np.pi * (k * k % (2 * n)) / n)  # exact phase mod 2n
    w_dev = const_complex(w, cdtype)
    a = x.astype(cdtype) * w_dev
    b = np.zeros(m, dtype=np.complex128)
    b[:n] = np.conj(w)
    b[m - n + 1:] = np.conj(w[1:][::-1])
    bf = const_complex(np.fft.fft(b), cdtype)
    a_pad = jnp.concatenate(
        [a, jnp.zeros(x.shape[:-1] + (m - n,), cdtype)], axis=-1
    )
    conv = ifft(fft(a_pad) * bf)
    return conv[..., :n] * w_dev


def fftfreq(n: int, fs: float) -> np.ndarray:
    """Two-sided frequency axis (host numpy — static under jit)."""
    return np.fft.fftfreq(n, d=1.0 / fs)


# convenience partial used by kernels that need a specific axis
fft_last = partial(fft, axis=-1)
ifft_last = partial(ifft, axis=-1)
