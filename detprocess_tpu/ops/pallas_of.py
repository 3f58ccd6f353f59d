"""RETIRED EXPERIMENT — not dispatched by any default path; kept as a
documented negative result (see BASELINE.md "Pallas vs XLA").

Pallas TPU kernel: fused FFT + no-delay optimal-filter reduction.

The no-delay OF per event is ``amp = Re Σ_k φ_k ṽ_k / norm`` and
``χ²₀ = Σ_k |ṽ_k|²·denom_k`` — an FFT followed by two weighted reductions.
Stock XLA materializes the FFT result in HBM (≥3 passes over the batch);
this kernel runs the whole chain per event tile inside VMEM: two DFT-matmul
stages on the MXU, then the reductions — ONE HBM read of the traces and two
scalars out per event.

STATUS — RETIRED EXPERIMENT (round 2, v5e dev chip, honest timing).
Correct on device (amp agrees with the XLA half-spectrum kernel to
~6e-7 relative) but **7× slower**: 55.5 ms vs 7.8 ms per 1024×32k-event
dispatch, measured with transfer-based sync (round 1's "2× slower" used
`block_until_ready`, which does not reliably wait on this backend — see
BASELINE.md "Measurement methodology"). Structural reasons, measured and
reasoned in BASELINE.md's Pallas table:

- the Mosaic compiler here accepts only tile=8 event blocks (16+ crashes
  the remote compile service) and only 2-D ops, forcing the scrambled
  layout, full complex arithmetic (no rfft packing → 2× flops), and
  reductions as selector matmuls;
- the expanded per-tile OF weights (3×[n1·tile, n2]) stream per grid
  step;
- XLA's own four-step matmul FFT (ops/fft.py) already keeps the MXU busy
  and fuses the OF reductions into the last stage — there is no HBM
  round trip left to save at these shapes.

Kept as the documented reference implementation of the fused
rFFT+reduce design for future backends with a full Mosaic; the default
pipelines use the XLA kernels (ops/of1x1.py).

Backend constraint: this TPU's Mosaic compiler only accepts 2-D operations
(3-D dot_general/transpose crash), so the four-step FFT runs in a
"scrambled" 2-D layout throughout:

- host pre-transpose:  xt[j, b·n2+k] = x[b, j·n2+k]          (one XLA pass)
- stage 1 (2-D matmul): y = W(n1) @ xt                       [n1, TB·n2]
- twiddle (tiled host constant), reshape → [n1·TB, n2]
- stage 2 (2-D matmul): z = h @ W(n2)ᵀ                       [n1·TB, n2]
  where row r = k1·TB + b and column = k2, i.e. frequency bin
  f = k2·n1 + k1 of event b — the OF weights are pre-scrambled to this
  layout on host, so the reductions never need the natural order.


Reference role: experimental fused alternative to the XLA path of
ops/of1x1.py (FeatureExtractors of1x1*, detprocess
core/algorithms.py:278-567).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from detprocess_tpu.ops.filterbank import OF1x1Bank


def _host_consts(bank: OF1x1Bank, slot: int, n1: int, n2: int, tile: int):
    """DFT matrices, tiled twiddles, and scrambled OF weights (host f32)."""
    n = n1 * n2
    k1 = np.arange(n1)
    c1 = np.cos(-2 * np.pi * np.outer(k1, k1) / n1).astype(np.float32)
    s1 = np.sin(-2 * np.pi * np.outer(k1, k1) / n1).astype(np.float32)
    k2 = np.arange(n2)
    # stage-2 matmul is h @ W2ᵀ: W2ᵀ[k, l] = W2[l, k] (symmetric) → same
    c2 = np.cos(-2 * np.pi * np.outer(k2, k2) / n2).astype(np.float32)
    s2 = np.sin(-2 * np.pi * np.outer(k2, k2) / n2).astype(np.float32)
    ang = -2 * np.pi * (np.outer(k1, np.arange(n2)) % n) / n
    # tiled twiddles [n1, tile·n2]: column t·n2 + k ↔ (event t, index k)
    twc = np.tile(np.cos(ang).astype(np.float32), (1, tile))
    tws = np.tile(np.sin(ang).astype(np.float32), (1, tile))

    # scrambled OF weights: freq bin f = k2·n1 + k1 → row k1·tile + b
    def scramble(vec):
        per_k1k2 = np.asarray(vec).reshape(n2, n1).T            # [n1, n2]
        return np.repeat(per_k1k2, tile, axis=0).astype(np.float32)

    phi_re = scramble(bank.phi[slot].real)
    phi_im = scramble(bank.phi[slot].imag)
    denom = scramble(bank.denom_inv[slot])

    # event-selector matrix: row b picks rows r ≡ b (mod tile) of the
    # scrambled [n1·tile, n2] stage-2 output (reductions as matmuls — this
    # backend's Mosaic rejects (X, 1)-shaped intermediates)
    sel = np.zeros((tile, n1 * tile), dtype=np.float32)
    r = np.arange(n1 * tile)
    sel[r % tile, r] = 1.0
    ones_cols = np.ones((n2, 128), dtype=np.float32)
    return (c1, s1, c2, s2, twc, tws, phi_re, phi_im, denom, sel,
            ones_cols)


def _kernel(xt_ref, c1_ref, s1_ref, c2_ref, s2_ref, twc_ref, tws_ref,
            phr_ref, phi_ref, den_ref, sel_ref, ones_ref, q_ref, c0_ref,
            *, n1, n2, tb):
    hi = jax.lax.Precision.HIGHEST
    xt = xt_ref[:]                                   # [n1, TB·n2] real

    y_re = jnp.dot(c1_ref[:], xt, precision=hi,
                   preferred_element_type=jnp.float32)
    y_im = jnp.dot(s1_ref[:], xt, precision=hi,
                   preferred_element_type=jnp.float32)
    h_re = y_re * twc_ref[:] - y_im * tws_ref[:]
    h_im = y_re * tws_ref[:] + y_im * twc_ref[:]

    h_re2 = h_re.reshape(n1 * tb, n2)
    h_im2 = h_im.reshape(n1 * tb, n2)
    c2 = c2_ref[:]
    s2 = s2_ref[:]
    z_re = (jnp.dot(h_re2, c2, precision=hi,
                    preferred_element_type=jnp.float32)
            - jnp.dot(h_im2, s2, precision=hi,
                      preferred_element_type=jnp.float32))
    z_im = (jnp.dot(h_re2, s2, precision=hi,
                    preferred_element_type=jnp.float32)
            + jnp.dot(h_im2, c2, precision=hi,
                      preferred_element_type=jnp.float32))

    # OF reductions in the scrambled layout (row = k1·TB + b), expressed
    # as matmuls: sel [TB, n1·TB] groups rows per event, ones [n2, 128]
    # sums columns (all 128 output lanes carry the same value)
    sel = sel_ref[:]
    ones_cols = ones_ref[:]
    q_contrib = z_re * phr_ref[:] - z_im * phi_ref[:]
    c0_contrib = (z_re * z_re + z_im * z_im) * den_ref[:]
    q_ev = jnp.dot(jnp.dot(sel, q_contrib, precision=hi,
                           preferred_element_type=jnp.float32),
                   ones_cols, precision=hi,
                   preferred_element_type=jnp.float32)     # [TB, 128]
    c0_ev = jnp.dot(jnp.dot(sel, c0_contrib, precision=hi,
                            preferred_element_type=jnp.float32),
                    ones_cols, precision=hi,
                    preferred_element_type=jnp.float32)
    q_ref[:] = q_ev
    c0_ref[:] = c0_ev


@partial(jax.jit, static_argnames=("n1", "n2", "tile", "interpret"))
def _fused_call(x, consts, n1, n2, tile, interpret):
    b, n = x.shape
    c1, s1, c2, s2, twc, tws, phr, phi, den, sel, ones_cols = consts
    # pre-transpose to [n1, B·n2] (blocks of TB events are contiguous)
    xt = (x.reshape(b, n1, n2).transpose(1, 0, 2)
          .reshape(n1, b * n2).astype(jnp.float32))
    grid = (b // tile,)
    kern = partial(_kernel, n1=n1, n2=n2, tb=tile)
    q, c0 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n1, tile * n2), lambda i: (0, i)),
            pl.BlockSpec((n1, n1), lambda i: (0, 0)),
            pl.BlockSpec((n1, n1), lambda i: (0, 0)),
            pl.BlockSpec((n2, n2), lambda i: (0, 0)),
            pl.BlockSpec((n2, n2), lambda i: (0, 0)),
            pl.BlockSpec((n1, tile * n2), lambda i: (0, 0)),
            pl.BlockSpec((n1, tile * n2), lambda i: (0, 0)),
            pl.BlockSpec((n1 * tile, n2), lambda i: (0, 0)),
            pl.BlockSpec((n1 * tile, n2), lambda i: (0, 0)),
            pl.BlockSpec((n1 * tile, n2), lambda i: (0, 0)),
            pl.BlockSpec((tile, n1 * tile), lambda i: (0, 0)),
            pl.BlockSpec((n2, 128), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0)),
                   pl.BlockSpec((tile, 128), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, 128), jnp.float32),
                   jax.ShapeDtypeStruct((b, 128), jnp.float32)],
        interpret=interpret,
    )(xt, *[jnp.asarray(a) for a in
            (c1, s1, c2, s2, twc, tws, phr, phi, den, sel, ones_cols)])
    return q[:, 0], c0[:, 0]


class FusedNodelayOF:
    """Precompiled fused FFT+OF kernel for one bank slot.

    >>> fused = FusedNodelayOF(bank, slot=0, n1=128, n2=256)
    >>> amp, chi2 = fused(traces)        # [B] each
    """

    def __init__(self, bank: OF1x1Bank, slot: int = 0,
                 n1: int | None = None, n2: int | None = None,
                 tile: int = 8, interpret: bool = False):
        n = bank.nbins
        if n1 is None or n2 is None:
            from detprocess_tpu.ops.fft import _balanced_split
            split = _balanced_split(n)
            if split is None:
                raise ValueError(f"no balanced split for N={n}")
            n1, n2 = split
        self.n1, self.n2, self.tile = n1, n2, tile
        self.interpret = interpret
        self.norm = float(bank.norm[slot])
        self.consts = _host_consts(bank, slot, n1, n2, tile)

    def __call__(self, traces):
        b = traces.shape[0]
        pad = (-b) % self.tile
        if pad:
            traces = jnp.concatenate(
                [traces, jnp.zeros((pad, traces.shape[1]),
                                   traces.dtype)], axis=0)
        q, c0 = _fused_call(traces, self.consts, self.n1, self.n2,
                            self.tile, self.interpret)
        amp = q[:b] / self.norm
        chi2 = c0[:b] - q[:b] * q[:b] / self.norm
        return amp, chi2
