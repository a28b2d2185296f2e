"""Tests for the AudioBuffer equivalent (rate/channel adaptation + bands)."""

import numpy as np
import jax
import jax.numpy as jnp

from webrtc_audio_processing_tpu.models import audio_buffer as ab
from webrtc_audio_processing_tpu.ops import splitting

RNG = np.random.default_rng(5)


def _cfg(**kw):
    base = dict(
        input_rate=32000,
        input_num_channels=1,
        buffer_rate=32000,
        buffer_num_channels=1,
        output_rate=32000,
        output_num_channels=1,
    )
    base.update(kw)
    return ab.BufferConfig(**base)


def test_passthrough_scaling():
    cfg = _cfg()
    state = ab.init_state(cfg)
    x = jnp.asarray(RNG.uniform(-1, 1, (320, 1)).astype(np.float32))
    state, y = ab.copy_from(cfg, state, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 32768.0, atol=1e-3)
    state, out = ab.copy_to(cfg, state, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_downmix_average():
    cfg = _cfg(input_num_channels=2)
    state = ab.init_state(cfg)
    x = RNG.uniform(-0.5, 0.5, (320, 2)).astype(np.float32)
    state, y = ab.copy_from(cfg, state, jnp.asarray(x))
    want = x.mean(axis=1, keepdims=True) * 32768.0
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-2)


def test_downmix_first_channel():
    from webrtc_audio_processing_tpu.config import DownmixMethod

    cfg = _cfg(input_num_channels=2, downmix_method=DownmixMethod.USE_FIRST_CHANNEL)
    state = ab.init_state(cfg)
    x = RNG.uniform(-0.5, 0.5, (320, 2)).astype(np.float32)
    state, y = ab.copy_from(cfg, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x[:, :1] * 32768.0, atol=1e-2)


def test_resampled_input_48_to_32():
    cfg = _cfg(input_rate=48000)
    state = ab.init_state(cfg)
    f = 1000.0
    outs = []
    step = jax.jit(lambda s, x: ab.copy_from(cfg, s, x))
    for k in range(20):
        t = (np.arange(480) + k * 480) / 48000.0
        x = (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)[:, None]
        state, y = step(state, jnp.asarray(x))
        outs.append(np.asarray(y))
    y = np.concatenate(outs)[:, 0] / 32768.0
    # Output should be the 1 kHz tone at 32 kHz (16.5-source-sample latency
    # for this ratio: kernel_size/2 plus priming phase).
    n = np.arange(len(y))
    want = 0.5 * np.sin(2 * np.pi * f * (n / 32000.0 - 16.5 / 48000.0))
    err = y[640:] - want[640:]
    snr = 10 * np.log10(np.mean(want[640:] ** 2) / np.mean(err**2))
    assert snr > 50, f"SNR {snr:.1f}"


def test_output_channel_replication():
    cfg = _cfg(output_num_channels=2)
    state = ab.init_state(cfg)
    y = jnp.asarray(RNG.uniform(-100, 100, (320, 1)).astype(np.float32))
    state, out = ab.copy_to(cfg, state, y)
    assert out.shape == (320, 2)
    np.testing.assert_array_equal(np.asarray(out)[:, 0], np.asarray(out)[:, 1])


def test_band_split_merge_2band():
    cfg = _cfg()
    assert cfg.num_bands == 2
    state = ab.init_state(cfg)
    y = jnp.asarray((RNG.standard_normal((320, 1)) * 1000).astype(np.float32))
    state, bands = ab.split_into_frequency_bands(cfg, state, y)
    assert bands.shape == (2, 160, 1)
    state, merged = ab.merge_frequency_bands(cfg, state, bands)
    assert merged.shape == (320, 1)


def test_band_split_48k_3band():
    cfg = _cfg(input_rate=48000, buffer_rate=48000, output_rate=48000)
    assert cfg.num_bands == 3
    state = ab.init_state(cfg)
    y = jnp.asarray((RNG.standard_normal((480, 2)) * 1000).astype(np.float32))
    cfg2 = _cfg(
        input_rate=48000,
        buffer_rate=48000,
        output_rate=48000,
        input_num_channels=2,
        buffer_num_channels=2,
        output_num_channels=2,
    )
    state = ab.init_state(cfg2)
    state, bands = ab.split_into_frequency_bands(cfg2, state, y)
    assert bands.shape == (3, 160, 2)
    state, merged = ab.merge_frequency_bands(cfg2, state, bands)
    assert merged.shape == (480, 2)


def test_num_bands_for_rate():
    assert splitting.num_bands_for_rate(8000) == 1
    assert splitting.num_bands_for_rate(16000) == 1
    assert splitting.num_bands_for_rate(32000) == 2
    assert splitting.num_bands_for_rate(48000) == 3
