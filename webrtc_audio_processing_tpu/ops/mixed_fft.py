"""Mixed-radix FFT for non-power-of-2 sizes.

The TPU backend lowers non-power-of-2 FFT sizes (e.g. the RNN-VAD's
480-point analysis) to a naive O(N^2) DFT, ~600x slower in a loop than a
power-of-2 FFT. This module implements the Cooley-Tukey split N = N1*N2
with a power-of-2 N1 (fast XLA FFT) and a small dense DFT matmul for N2.

Constants are stored as separate float32 real/imag tables (module-level
complex arrays must never be created eagerly; see utils/complex_boundary).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _twiddles(n1: int, n2: int):
    n = n1 * n2
    k1 = np.arange(n1)
    j2 = np.arange(n2)
    tw = np.exp(-2j * np.pi * np.outer(k1, j2) / n)  # (n1, n2)
    d = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    return (
        tw.real.astype(np.float32), tw.imag.astype(np.float32),
        d.real.astype(np.float32), d.imag.astype(np.float32),
    )


_TW_CACHE: dict = {}


def fft_mixed(x, n1: int, n2: int):
    """Complex FFT of real or complex `x` (..., n1*n2) via the Cooley-Tukey
    decimation n = n2*i1 + i2, k = n1*k2 + k1:

        A[k1, i2]  = FFT_n1(x[:, i2])[k1]
        B[k1, i2]  = A[k1, i2] * W_N^(k1*i2)
        X[k2, k1]  = sum_i2 B[k1, i2] * W_n2^(k2*i2)
    """
    key = (n1, n2)
    if key not in _TW_CACHE:
        _TW_CACHE[key] = _twiddles(n1, n2)
    twr, twi, dr, di = (jnp.asarray(t) for t in _TW_CACHE[key])
    tw = jax.lax.complex(twr, twi)
    d = jax.lax.complex(dr, di)

    xr = x.reshape(x.shape[:-1] + (n1, n2))  # [i1, i2]
    A = jnp.fft.fft(xr, axis=-2)  # over i1 -> [k1, i2]
    B = A * tw  # (.., n1, n2)
    X = jnp.einsum("...kj,mj->...mk", B, d)  # [k2, k1]
    return X.reshape(x.shape[:-1] + (n1 * n2,))


def rfft480(x):
    """Drop-in for jnp.fft.rfft on length-480 real input: (..., 480) ->
    (..., 241) complex64."""
    return fft_mixed(x.astype(jnp.float32), 32, 15)[..., :241]
