"""RETIRED EXPERIMENT — not dispatched by any default path; kept as a
documented negative result (see BASELINE.md "Pallas vs XLA").

Pallas TPU kernel: fused four-step FFT (real input → split re/im).

The XLA four-step FFT (ops/fft.py) materializes every stage in HBM
(~6 passes over a [B, N] complex batch). This kernel processes a tile of
events entirely in VMEM: load the tile once, run both DFT-matmul stages +
twiddles on the MXU, transpose, and store the (re, im) result — one HBM
read and one write per element.

Layout per tile (TB events, N = n1·n2 samples, n1/n2 ≤ 256):

    x   [TB, n1, n2]  (natural reshape of the trace tile)
    y   = W(n1) @ x            — stage-1 DFT along n1 (re/im matmuls)
    h   = y · twiddle(n1, n2)  — elementwise complex multiply
    z   = h @ W(n2)ᵀ           — stage-2 DFT along n2
    X[b, k2·n1 + k1] = z[b, k1, k2]   — digit-reversal transpose

All matrices are f32; complex arithmetic is explicit re/im so every
contraction is a real MXU matmul (XLA's complex dot does not map well to
the MXU, and bf16 default precision is insufficient — see ops/fft.py).


Reference role: experimental Pallas variant of ops/fft.py (see that
module for the reference mapping).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def _host_mats(n1: int, n2: int, n: int):
    k1 = np.arange(n1)
    c1 = np.cos(-2 * np.pi * np.outer(k1, k1) / n1).astype(np.float32)
    s1 = np.sin(-2 * np.pi * np.outer(k1, k1) / n1).astype(np.float32)
    k2 = np.arange(n2)
    c2 = np.cos(-2 * np.pi * np.outer(k2, k2) / n2).astype(np.float32)
    s2 = np.sin(-2 * np.pi * np.outer(k2, k2) / n2).astype(np.float32)
    ang = -2 * np.pi * (np.outer(k1, np.arange(n2)) % n) / n
    twc = np.cos(ang).astype(np.float32)
    tws = np.sin(ang).astype(np.float32)
    return c1, s1, c2, s2, twc, tws


def _fft_kernel(x_ref, c1_ref, s1_ref, c2_ref, s2_ref, twc_ref, tws_ref,
                re_ref, im_ref, *, n1, n2, tb):
    """One tile: [TB, n1·n2] real → re/im [TB, n1·n2]."""
    hi = jax.lax.Precision.HIGHEST
    x = x_ref[:].reshape(tb, n1, n2)

    c1 = c1_ref[:]
    s1 = s1_ref[:]
    # stage 1: contract n1 (x is real)
    y_re = jax.lax.dot_general(c1, x, (((1,), (1,)), ((), ())),
                               precision=hi,
                               preferred_element_type=jnp.float32)
    y_im = jax.lax.dot_general(s1, x, (((1,), (1,)), ((), ())),
                               precision=hi,
                               preferred_element_type=jnp.float32)
    # y_* : [n1, TB, n2]
    twc = twc_ref[:][:, None, :]
    tws = tws_ref[:][:, None, :]
    h_re = y_re * twc - y_im * tws
    h_im = y_re * tws + y_im * twc

    c2 = c2_ref[:]
    s2 = s2_ref[:]
    # stage 2: contract n2 → z[k1, TB, k2]
    def mm(a, w):
        return jax.lax.dot_general(a, w, (((2,), (1,)), ((), ())),
                                   precision=hi,
                                   preferred_element_type=jnp.float32)
    z_re = mm(h_re, c2) - mm(h_im, s2)
    z_im = mm(h_re, s2) + mm(h_im, c2)

    # output ordering X[b, k2·n1 + k1] = z[k1, b, k2]
    re_ref[:] = jnp.transpose(z_re, (1, 2, 0)).reshape(tb, n1 * n2)
    im_ref[:] = jnp.transpose(z_im, (1, 2, 0)).reshape(tb, n1 * n2)


@partial(jax.jit, static_argnames=("n1", "n2", "tile", "interpret"))
def fft_pallas(x: jnp.ndarray, n1: int, n2: int, tile: int = 8,
               interpret: bool = False):
    """Batched FFT of real traces [B, N] → (re, im) [B, N], N = n1·n2.

    ``tile`` events are processed per grid step fully in VMEM. B must be a
    multiple of tile (pad on the caller side).
    """
    b, n = x.shape
    assert n == n1 * n2, (n, n1, n2)
    assert b % tile == 0, (b, tile)
    c1, s1, c2, s2, twc, tws = _host_mats(n1, n2, n)

    grid = (b // tile,)
    kernel = partial(_fft_kernel, n1=n1, n2=n2, tb=tile)

    def mk_spec(shape, mapped=False):
        if mapped:
            return pl.BlockSpec((tile, n), lambda i: (i, 0))
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    out_shape = [jax.ShapeDtypeStruct((b, n), jnp.float32),
                 jax.ShapeDtypeStruct((b, n), jnp.float32)]
    re, im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            mk_spec(None, mapped=True),
            mk_spec((n1, n1)), mk_spec((n1, n1)),
            mk_spec((n2, n2)), mk_spec((n2, n2)),
            mk_spec((n1, n2)), mk_spec((n1, n2)),
        ],
        out_specs=[mk_spec(None, mapped=True), mk_spec(None, mapped=True)],
        out_shape=out_shape,
        interpret=interpret,
    )(x.astype(jnp.float32), jnp.asarray(c1), jnp.asarray(s1),
      jnp.asarray(c2), jnp.asarray(s2), jnp.asarray(twc), jnp.asarray(tws))
    return re, im
