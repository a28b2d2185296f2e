"""Streaming FIR filter.

Reference: common_audio/fir_filter.h (interface),
fir_filter_c.cc / fir_filter_sse.cc etc. (streaming convolution with a
(num_taps-1)-sample history carried between Filter() calls).

TPU re-design: the per-call loop is one `jnp.convolve` over the history-
extended chunk; the state is a (taps-1, ...batch) pytree leaf so the
filter composes with vmap/scan like every other op in this package.
"""

from __future__ import annotations

import jax.numpy as jnp


def init_state(coefficients, batch_shape=()):
    """Zero history of num_taps-1 samples."""
    k = len(coefficients) - 1
    return jnp.zeros((max(k, 0), *batch_shape))


def filter(coefficients, state, x):
    """One streaming Filter() call.

    coefficients: (taps,) b_0..b_{taps-1}; x: (n, ...batch) with leading
    time axis. Returns (y, new_state) with y[t] = sum_j b_j * x[t-j]
    reaching into the carried history.
    """
    c = jnp.asarray(coefficients)
    k = c.shape[0] - 1
    if k == 0:
        return c[0] * x, state
    ext = jnp.concatenate([state, x], axis=0)  # (k+n, ...)
    n = x.shape[0]
    # y[t] = sum_j c[j] * ext[k + t - j]
    y = jnp.zeros_like(x)
    for j in range(c.shape[0]):
        y = y + c[j] * ext[k - j:k - j + n]
    return y, ext[n:]
