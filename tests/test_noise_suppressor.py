"""Noise suppressor vs the sequential numpy oracle (reference_ns.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.config import NoiseSuppressionLevel
from webrtc_audio_processing_tpu.models import noise_suppressor as ns

from tests.reference_ns import NoiseSuppressorRef

RNG = np.random.default_rng(42)


def _run_pair(level, num_bands, num_channels, num_frames, signal_fn):
    params = ns.SUPPRESSION_PARAMS[level]
    state = ns.init_state(num_channels, num_bands)
    ref = NoiseSuppressorRef(level.value, num_bands, num_channels)

    @jax.jit
    def step(state, bands):
        state = ns.analyze(params, state, bands[0])
        return ns.process(params, state, bands)

    max_rel = 0.0
    for f in range(num_frames):
        bands = signal_fn(f).astype(np.float32)
        ref.analyze(bands)
        want = ref.process(bands)
        state, got = step(state, jnp.asarray(bands))
        got = np.asarray(got)
        scale = max(np.abs(want).max(), 1.0)
        max_rel = max(max_rel, np.abs(got - want).max() / scale)
    return max_rel


def noisy_speechlike(f, num_bands=1, num_channels=1):
    n = np.arange(160) + f * 160
    tone = 4000.0 * np.sin(2 * np.pi * 440.0 * n / 16000.0) * (f % 7 < 3)
    noise = RNG.standard_normal((num_bands, 160, num_channels)) * 600.0
    out = noise
    out[0, :, :] += tone[:, None]
    return out


def test_mono_16k_matches_oracle_through_startup():
    # 260 frames crosses the 50-frame short startup and the 200-frame
    # long-startup/quantile transitions.
    max_rel = _run_pair(
        NoiseSuppressionLevel.MODERATE, 1, 1, 260,
        functools.partial(noisy_speechlike, num_bands=1, num_channels=1),
    )
    assert max_rel < 2e-3, max_rel


def test_mono_histogram_cycle():
    # 520 frames crosses the 500-frame histogram/prior-model update.
    max_rel = _run_pair(
        NoiseSuppressionLevel.HIGH, 1, 1, 520,
        functools.partial(noisy_speechlike, num_bands=1, num_channels=1),
    )
    assert max_rel < 2e-3, max_rel


def test_stereo_three_band():
    max_rel = _run_pair(
        NoiseSuppressionLevel.VERY_HIGH, 3, 2, 120,
        functools.partial(noisy_speechlike, num_bands=3, num_channels=2),
    )
    assert max_rel < 2e-3, max_rel


def test_zero_frames_do_not_update_state():
    params = ns.SUPPRESSION_PARAMS[NoiseSuppressionLevel.MODERATE]
    state = ns.init_state(1, 1)
    zero = jnp.zeros((160, 1))
    st2 = ns.analyze(params, state, zero)
    assert int(st2.num_analyzed_frames) == -1
    np.testing.assert_array_equal(
        np.asarray(st2.noise_spectrum), np.asarray(state.noise_spectrum)
    )


def test_suppresses_stationary_noise():
    params = ns.SUPPRESSION_PARAMS[NoiseSuppressionLevel.HIGH]
    state = ns.init_state(1, 1)

    @jax.jit
    def step(state, bands):
        state = ns.analyze(params, state, bands[0])
        return ns.process(params, state, bands)

    in_e = out_e = 0.0
    for f in range(300):
        x = (RNG.standard_normal((1, 160, 1)) * 1000).astype(np.float32)
        state, y = step(state, jnp.asarray(x))
        if f >= 250:
            in_e += float(np.sum(x**2))
            out_e += float(np.sum(np.asarray(y) ** 2))
    # 18 dB target attenuation; allow convergence slack.
    assert out_e < in_e * 0.1
