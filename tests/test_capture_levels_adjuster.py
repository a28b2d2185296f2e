"""CaptureLevelsAdjuster tests ported from
tests/unit/capture_levels_adjuster/capture_levels_adjuster_unittest.cc."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.models import capture_levels_adjuster as cla

F = np.float32
N = 160


def _expected_pre(emulated, level, pre_gain):
    return pre_gain * (level / 255.0) if emulated else pre_gain


def _frame(value=100.0, ch=2):
    return jnp.full((N, ch), value, jnp.float32)


@pytest.mark.parametrize("emulated,level", [(False, 255), (True, 50), (True, 200)])
@pytest.mark.parametrize("pre_gain,post_gain", [(0.5, 2.0), (1.0, 1.0), (4.0, 0.25)])
def test_initial_gain_is_instantly_achieved(emulated, level, pre_gain, post_gain):
    st = cla.init_state(pre_gain, post_gain, level, emulated)
    exp_pre = _expected_pre(emulated, level, pre_gain)
    exp_post = exp_pre * post_gain

    pre = jax.jit(lambda s, x: cla.apply_pre_level_adjustment(s, x, emulated))
    post = jax.jit(cla.apply_post_level_adjustment)
    for _ in range(10):
        st, y = pre(st, _frame())
        np.testing.assert_allclose(np.asarray(y), 100.0 * exp_pre, rtol=1e-5)
        st, z = post(st, y)
        np.testing.assert_allclose(np.asarray(z), 100.0 * exp_post, rtol=1e-5)


@pytest.mark.parametrize("emulated", [False, True])
def test_new_gains_are_achieved_after_ramp(emulated):
    lo_level, lo_pre, lo_post = 100, 0.5, 1.0
    hi_level, hi_pre, hi_post = 200, 1.0, 2.0
    st = cla.init_state(lo_pre, lo_post, lo_level, emulated)

    st = st.replace(pre_gain=jnp.float32(hi_pre), post_gain=jnp.float32(hi_post))
    st = cla.set_analog_mic_gain_level(st, hi_level)
    assert int(st.emulated_level) == hi_level

    exp_pre = _expected_pre(emulated, hi_level, hi_pre)
    exp_post = exp_pre * hi_post

    pre = jax.jit(lambda s, x: cla.apply_pre_level_adjustment(s, x, emulated))
    post = jax.jit(cla.apply_post_level_adjustment)
    # First frame ramps; from the second frame on the new gain holds
    # exactly (capture_levels_adjuster_unittest.cc:123-180).
    st, y = pre(st, _frame())
    st, z = post(st, y)
    for _ in range(5):
        st, y = pre(st, _frame())
        np.testing.assert_allclose(np.asarray(y), 100.0 * exp_pre, rtol=1e-5)
        st, z = post(st, y)
        np.testing.assert_allclose(np.asarray(z), 100.0 * exp_post, rtol=1e-5)


def test_mic_gain_level_clamped():
    st = cla.init_state(1.0, 1.0, 100, True)
    st = cla.set_analog_mic_gain_level(st, 999)
    assert int(st.emulated_level) == cla.MAX_ANALOG_MIC_GAIN_LEVEL
    st = cla.set_analog_mic_gain_level(st, -5)
    assert int(st.emulated_level) == cla.MIN_ANALOG_MIC_GAIN_LEVEL


def test_gain_change_ramps_within_frame():
    # The scaler interpolates from the old gain to the new one inside the
    # first frame (audio_samples_scaler_unittest.cc VerifyGainAdjustment).
    st = cla.init_state(1.0, 1.0, 255, False)
    st, _ = cla.apply_pre_level_adjustment(st, _frame(), False)
    st = st.replace(pre_gain=jnp.float32(2.0))
    st, y = cla.apply_pre_level_adjustment(st, _frame(), False)
    y = np.asarray(y)[:, 0]
    assert y[0] < y[-1]
    assert y[0] >= 100.0 - 1e-3 and y[-1] <= 200.0 + 1e-3
    # Steady at the new gain afterwards.
    st, y2 = cla.apply_pre_level_adjustment(st, _frame(), False)
    np.testing.assert_allclose(np.asarray(y2), 200.0, rtol=1e-5)
