"""AGC1 legacy fixed-point twins: behavioral + table tests."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.agc1 import (
    analog,
    digital,
    gain_control,
)
from webrtc_audio_processing_tpu.config import Agc1Mode, GainController1

RNG = np.random.default_rng(7)


def speechlike(n, amp):
    t = np.arange(n) / 16000
    burst = (np.sin(2 * np.pi * 2.3 * t) > 0).astype(float)
    sig = (np.sin(2 * np.pi * 311 * t) + 0.6 * np.sin(2 * np.pi * 650 * t + 1))
    return (amp * sig * burst + RNG.integers(-200, 200, n)).astype(np.int32)


def test_gain_table_matches_float_model():
    # The table encodes round(2^16 * 10^(gain_db/20)) along the compressor
    # curve (digital_agc.cc:16-31); check the fixed-point build approximates
    # the float model within ~0.2 dB away from the clamped ends.
    table = digital.calculate_gain_table(9, 3, True, 11)
    db = 20 * np.log10(table.astype(np.float64) / 65536.0)
    # Max gain for comp 9 / target 3 / analog target 11 is
    # max(analogTarget-target, ...) = 8 dB (digital_agc.cc:91-96).
    assert db[-1] > 7.0 and db[-1] < 9.0
    # Monotone (up to LSB wobble at saturation from the Q14 power approx).
    assert (np.diff(table.astype(np.int64)) >= -64).all()


def test_fixed_digital_gain():
    cfg = analog.LegacyAgcConfig(
        agc_mode=digital.AGC_MODE_FIXED_DIGITAL, compression_gain_db=12
    )
    st = analog.init_state(cfg)
    x = (500 * np.sin(2 * np.pi * 300 * np.arange(160 * 50) / 16000)).astype(
        np.int32
    )

    @jax.jit
    def step(st, frame):
        st, bands = analog.add_mic(cfg, st, frame[None])
        st, gains, lvl, warn = analog.analyze(cfg, st, bands, 128, 0)
        return st, analog.process(gains, bands)

    for f in range(50):
        st, out = step(st, jnp.asarray(x[f * 160 : (f + 1) * 160]))
    gain_db = 20 * np.log10(np.abs(np.asarray(out)).max() / 500)
    assert 10.0 < gain_db < 14.0, gain_db


def test_adaptive_analog_level_moves():
    cfg = analog.LegacyAgcConfig(agc_mode=digital.AGC_MODE_ADAPTIVE_ANALOG)

    @jax.jit
    def step(st, frame, lvl):
        st, bands = analog.add_mic(cfg, st, frame[None])
        st, gains, lvl2, warn = analog.analyze(cfg, st, bands, lvl, 0)
        return st, lvl2

    st = analog.init_state(cfg)
    x = speechlike(160 * 300, 1200)
    lvl = 100
    for f in range(300):
        st, lvl_j = step(st, jnp.asarray(x[f * 160 : (f + 1) * 160]), lvl)
        lvl = int(lvl_j)
    assert lvl > 100, lvl

    st = analog.init_state(cfg)
    x = speechlike(160 * 300, 27000)
    lvl2 = 200
    for f in range(300):
        st, lvl_j = step(st, jnp.asarray(x[f * 160 : (f + 1) * 160]), lvl2)
        lvl2 = int(lvl_j)
    assert lvl2 < 150, lvl2


def test_gain_control_impl_front():
    c = GainController1(enabled=True, mode=Agc1Mode.ADAPTIVE_DIGITAL)
    cfg = gain_control.make_config(c, 16000)
    st = gain_control.init_state(cfg, num_channels=2)
    x = speechlike(160 * 20, 3000)

    @jax.jit
    def step(st, bands):
        st = gain_control.process_render_audio(
            cfg, st, jnp.zeros((160,), jnp.int32)
        )
        st, bands = gain_control.analyze_capture_audio(cfg, st, bands)
        return gain_control.process_capture_audio(cfg, st, bands, False)

    for f in range(20):
        frame = jnp.asarray(
            np.stack([x[f * 160 : (f + 1) * 160]] * 2, axis=-1)
        )[None]
        st, out = step(st, frame)
    assert out.shape == (1, 160, 2)
    assert int(jnp.max(jnp.abs(out))) <= 32767
