"""NoiseSuppressor invariance tests (ns/noise_suppressor_unittest.cc).

IdenticalChannelEffects: the same noise reduction must be applied to all
channels (the per-channel Wiener filters are aggregated with a min before
filtering, noise_suppressor.cc:270-284)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.config import NoiseSuppressionLevel
from webrtc_audio_processing_tpu.models import noise_suppressor as ns

F = np.float32


def _input_frame(num_bands, frame_index, num_channels):
    """PopulateInputFrameWithIdenticalChannels (noise_suppressor_unittest
    .cc:33-45): band b sample i = 5000*b + global ramp value."""
    i = np.arange(160, dtype=F)
    value = frame_index * 160 + i
    bands = np.stack(
        [np.where(value > 0, 5000.0 * b + value, 0.0) for b in range(num_bands)]
    )  # (bands, 160)
    return np.repeat(bands[:, :, None], num_channels, axis=2).astype(F)


@pytest.mark.parametrize("rate", [16000, 48000])
@pytest.mark.parametrize("num_channels", [1, 4])
@pytest.mark.parametrize(
    "level", [NoiseSuppressionLevel.LOW, NoiseSuppressionLevel.VERY_HIGH]
)
def test_identical_channel_effects(rate, num_channels, level):
    num_bands = rate // 16000
    params = ns.SUPPRESSION_PARAMS[level]
    state = ns.init_state(num_channels, num_bands)

    @jax.jit
    def step(state, bands):
        state = ns.analyze(params, state, bands[0])
        state, out = ns.process(params, state, bands)
        return state, out

    out = None
    for frame_index in range(60):
        bands = jnp.asarray(_input_frame(num_bands, frame_index, num_channels))
        state, out = step(state, bands)

    out = np.asarray(out)  # (bands, 160, C)
    assert out.shape == (num_bands, 160, num_channels)
    assert np.all(np.isfinite(out))
    if num_channels > 1:
        for ch in range(1, num_channels):
            np.testing.assert_array_equal(out[:, :, ch], out[:, :, 0])
    # The suppressor is active: output differs from input but remains
    # bounded by it in energy for this deterministic ramp.
    x = np.asarray(_input_frame(num_bands, 59, num_channels))
    assert np.mean(out**2) <= np.mean(x**2) * 1.01


def test_stronger_level_attenuates_more():
    """minimum_attenuating_gain ordering across presets
    (suppression_params.cc:19-47)."""
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal((300, 160, 1)) * 1000).astype(F)

    def run(level):
        params = ns.SUPPRESSION_PARAMS[level]
        state = ns.init_state(1, 1)

        @jax.jit
        def step(state, band0):
            state = ns.analyze(params, state, band0)
            state, out = ns.process(params, state, band0[None])
            return state, out

        e = 0.0
        for k in range(300):
            state, out = step(state, jnp.asarray(noise[k]))
            if k >= 200:
                e += float(jnp.mean(out**2))
        return e

    e_low = run(NoiseSuppressionLevel.LOW)
    e_vh = run(NoiseSuppressionLevel.VERY_HIGH)
    assert e_vh < e_low, (e_vh, e_low)
