"""Tests for the 3-band filter bank."""

import numpy as np
import jax
import jax.numpy as jnp

from webrtc_audio_processing_tpu.ops import three_band

from tests.reference_dsp import ThreeBandFilterBankSim

RNG = np.random.default_rng(11)


def test_analysis_matches_reference_loop():
    sim = ThreeBandFilterBankSim()
    state = three_band.init_state()
    ana = jax.jit(three_band.analysis)
    for f in range(4):
        x = (RNG.standard_normal(480) * 8000).astype(np.float32)
        want = sim.analysis(x)
        bands, state = ana(jnp.asarray(x), state)
        np.testing.assert_allclose(np.asarray(bands), want, rtol=1e-4, atol=3e-2)


def test_synthesis_matches_reference_loop():
    sim = ThreeBandFilterBankSim()
    state = three_band.init_state()
    syn = jax.jit(three_band.synthesis)
    for f in range(4):
        bands = (RNG.standard_normal((3, 160)) * 5000).astype(np.float32)
        want = sim.synthesis(bands)
        out, state = syn(jnp.asarray(bands), state)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=6e-2)


def test_round_trip_snr():
    # The filter bank is non-perfect-reconstruction by design: analysis +
    # synthesis SNR is ~9.5 dB (three_band_filter_bank.h:41-43). Measured
    # total delay is 46 samples at 48 kHz.
    fs = 48000
    x = (RNG.standard_normal(fs // 2) * 5000).astype(np.float32)
    state = three_band.init_state()
    ana = jax.jit(three_band.analysis)
    syn = jax.jit(three_band.synthesis)
    out = []
    for k in range(0, len(x), 480):
        bands, state = ana(jnp.asarray(x[k : k + 480]), state)
        y, state = syn(bands, state)
        out.append(np.asarray(y))
    y = np.concatenate(out)
    delay = 46
    err = y[delay:] - x[: len(x) - delay]
    snr = 10 * np.log10(np.mean(x**2) / np.mean(err[480:] ** 2))
    assert snr > 9, f"SNR {snr:.1f} dB"


def test_band_separation():
    # A 12 kHz tone (band 2 territory: 8-16 kHz -> band1 4-8? bands are
    # 0-8/8-16/16-24 kHz at 48k) should land dominantly outside band 0.
    fs = 48000
    t = np.arange(4800) / fs
    x = (np.sin(2 * np.pi * 12000 * t) * 8000).astype(np.float32)
    state = three_band.init_state()
    ana = jax.jit(three_band.analysis)
    powers = np.zeros(3)
    for k in range(0, len(x), 480):
        bands, state = ana(jnp.asarray(x[k : k + 480]), state)
        powers += np.mean(np.asarray(bands) ** 2, axis=1)
    assert powers[1] > 10 * powers[0]
    assert powers[1] > 10 * powers[2]


def test_batched():
    sim0 = ThreeBandFilterBankSim()
    sim1 = ThreeBandFilterBankSim()
    state = three_band.init_state((2,))
    ana = jax.jit(three_band.analysis)
    for f in range(3):
        x = (RNG.standard_normal((480, 2)) * 1000).astype(np.float32)
        bands, state = ana(jnp.asarray(x), state)
        w0 = sim0.analysis(x[:, 0])
        w1 = sim1.analysis(x[:, 1])
        np.testing.assert_allclose(np.asarray(bands[..., 0]), w0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(bands[..., 1]), w1, atol=1e-2)
