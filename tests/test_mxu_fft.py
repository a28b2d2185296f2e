"""MXU matmul-DFT vs jnp.fft reference (ops/mxu_fft.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webrtc_audio_processing_tpu.ops import mxu_fft  # noqa: E402


@pytest.mark.parametrize("n", [128, 256])
def test_rfft_matmul_matches_fft(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, n)).astype(np.float32)
    ref = np.fft.rfft(x, axis=-1)
    got = np.asarray(mxu_fft.rfft_matmul(jnp.asarray(x)))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale, rtol=0)


@pytest.mark.parametrize("n", [128, 256])
def test_irfft_matmul_roundtrip(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((32, n)).astype(np.float32)
    X = np.fft.rfft(x, axis=-1)
    got = np.asarray(mxu_fft.irfft_matmul(jnp.asarray(X), n))
    np.testing.assert_allclose(got, x, atol=2e-4 * np.abs(x).max(), rtol=0)


def test_dispatch_uses_fft_on_cpu():
    x = jnp.zeros((4, 128))
    out = mxu_fft.rfft(x)
    assert out.shape == (4, 65)
