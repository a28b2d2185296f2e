"""128-point FFT helpers for AEC3.

Reference: aec3/aec3_fft.{h,cc} + aec3/fft_data.h. The reference wraps the
unnormalized Ooura rdft whose packed (R, I) layout equals the standard
``rfft`` real/imag parts; its unnormalized inverse returns ``64 * irfft``.
We represent ``FftData`` as complex64 arrays of shape (..., 65) and keep the
reference's normalization at each call site.

Windows: kHanning64 (aec3_fft.cc:40-54) and kSqrtHanning128 (:57-87).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.ops import mxu_fft

FFT_LENGTH = 128
BLOCK_SIZE = 64
NUM_BINS = 65

# kHanning64 (aec3_fft.cc:40-54) = symmetric Hann: sin^2(pi k / 63).
_k = np.arange(64)
HANNING64 = jnp.asarray((np.sin(np.pi * _k / 63.0) ** 2).astype(np.float32))

# kSqrtHanning128 = sqrt(hanning-periodic(128)) = sin(pi k / 128).
SQRT_HANNING128 = jnp.asarray(
    np.sin(np.pi * np.arange(128) / 128.0).astype(np.float32)
)


def fft(x):
    """Unnormalized forward FFT of (..., 128) -> (..., 65) complex.

    MXU matmul-DFT on TPU, jnp.fft elsewhere (ops/mxu_fft.py)."""
    return mxu_fft.rfft(x, FFT_LENGTH)


def ifft_unnormalized(X):
    """Equivalent of Aec3Fft::Ifft: returns 64 * exact inverse (..., 128)."""
    return mxu_fft.irfft(X, FFT_LENGTH) * float(BLOCK_SIZE)


def zero_padded_fft(x, window: str = "rectangular"):
    """Aec3Fft::ZeroPaddedFft (aec3_fft.cc:116-140): 64 zeros + (windowed) x.

    x: (..., 64). window: 'rectangular' | 'hanning'.
    """
    if window == "hanning":
        x = x * HANNING64
    pad = jnp.zeros(x.shape[:-1] + (BLOCK_SIZE,), x.dtype)
    return fft(jnp.concatenate([pad, x], axis=-1))


def padded_fft(x, x_old, window: str = "rectangular"):
    """Aec3Fft::PaddedFft (aec3_fft.cc:142-170): [x_old, x] (windowed).

    x, x_old: (..., 64). window: 'rectangular' | 'sqrt_hanning'.
    """
    v = jnp.concatenate([x_old, x], axis=-1)
    if window == "sqrt_hanning":
        v = v * SQRT_HANNING128
    return fft(v)


def spectrum(X):
    """FftData::Spectrum: |X|^2 per bin (fft_data.h:60-78)."""
    return X.real**2 + X.imag**2
