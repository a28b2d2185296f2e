"""GainController2 fixed-digital tests ported from
gain_controller2_unittest.cc (GainShouldChangeOnSetGain, time invariance,
CheckSaturationBehaviorWithLimiter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.models.agc2 import gain_controller2 as gc2

# test::kLimiterMaxInputLevelDbFs (agc2_testing_common.h): the limiter's
# knee start in dBFS relative to full scale.
LIMITER_MAX_INPUT_LEVEL_DBFS = -(20.0 * np.log10(32768.0 / 36766.300710566735))


def _mk(gain_db):
    from webrtc_audio_processing_tpu import config as cfg_mod

    c = cfg_mod.GainController2(
        enabled=True,
        fixed_digital=cfg_mod.FixedDigital(gain_db=gain_db),
        adaptive_digital=cfg_mod.AdaptiveDigital(enabled=False),
    )
    return c


def _run_constant(config, level, num_frames, rate):
    state = gc2.init_state(config, rate, use_internal_vad=False)
    frame = jnp.full((rate // 100, 1), level, jnp.float32)
    y = None
    for _ in range(num_frames):
        state, y, _ = gc2.process(
            config, state, frame, rate,
            speech_probability=jnp.asarray(0.0, jnp.float32),
        )
    return float(np.asarray(y)[-1, 0]), state


class TestFixedDigital:
    def test_gain_changes_on_set_gain(self):
        level, rate = 1000.0, 8000
        out0, _ = _run_constant(_mk(0.0), level, 5, rate)
        assert abs(out0 - level) < 1e-3 * level
        out20, _ = _run_constant(_mk(20.0), level, 5, rate)
        assert abs(out20 - 10.0 * level) < 1e-3 * 10 * level

    def test_change_fixed_gain_fast_and_time_invariant(self):
        level, rate = 1000.0, 8000
        pre, _ = _run_constant(_mk(0.0), level, 5, rate)
        # Raise then restore; output must return to the original level.
        config_hi = _mk(25.0)
        state = gc2.init_state(config_hi, rate, use_internal_vad=False)
        frame = jnp.full((rate // 100, 1), level, jnp.float32)
        for _ in range(5):
            state, _, _ = gc2.process(
                config_hi, state, frame, rate,
                speech_probability=jnp.asarray(0.0, jnp.float32),
            )
        config_lo = _mk(0.0)
        y = None
        for _ in range(5):
            state, y, _ = gc2.process(
                config_lo, state, frame, rate,
                speech_probability=jnp.asarray(0.0, jnp.float32),
            )
        post = float(np.asarray(y)[-1, 0])
        assert abs(pre - post) < 1e-3 * level

    @pytest.mark.parametrize("rate", [8000, 48000])
    def test_no_saturation_below_limiter_max_input_level(self, rate):
        for gain_db in np.linspace(0.1, LIMITER_MAX_INPUT_LEVEL_DBFS - 0.01, 4):
            out, _ = _run_constant(_mk(float(gain_db)), 32767.0, 5, rate)
            assert out < 32767.0, (gain_db, out)

    @pytest.mark.parametrize("rate", [8000, 48000])
    def test_saturation_above_limiter_max_input_level(self, rate):
        for gain_db in np.linspace(LIMITER_MAX_INPUT_LEVEL_DBFS + 0.01, 10.0, 4):
            out, _ = _run_constant(_mk(float(gain_db)), 32767.0, 5, rate)
            np.testing.assert_allclose(out, 32767.0, rtol=1e-5), gain_db
