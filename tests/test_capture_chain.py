"""Tests for HPF/PostFilter/CaptureLevelsAdjuster/RmsLevel submodules."""

import numpy as np
import jax.numpy as jnp

from webrtc_audio_processing_tpu.models import (
    capture_levels_adjuster as cla,
    high_pass_filter as hpf,
    post_filter,
    rms_level,
)
from webrtc_audio_processing_tpu.ops import gain_ramp

RNG = np.random.default_rng(13)


class TestGainRamp:
    def test_scaler_ramp_matches_loop(self):
        n = 160
        prev, target = 1.0, 2.0
        g = np.asarray(gain_ramp.ramped_gains_scaler(prev, target, n))
        inc = (target - prev) / n
        want = np.minimum(prev + inc * np.arange(1, n + 1), target)
        np.testing.assert_allclose(g, want, rtol=1e-6)

    def test_scaler_decreasing(self):
        g = np.asarray(gain_ramp.ramped_gains_scaler(2.0, 0.5, 160))
        assert g[0] < 2.0 and abs(g[-1] - 0.5) < 1e-6
        assert (np.diff(g) <= 1e-7).all()

    def test_constant_gain(self):
        g = np.asarray(gain_ramp.ramped_gains_scaler(1.5, 1.5, 160))
        np.testing.assert_allclose(g, 1.5)

    def test_apply_scaler_clamps(self):
        x = jnp.full((10, 1), 30000.0)
        y, _ = gain_ramp.apply_scaler(jnp.float32(2.0), jnp.float32(2.0), x)
        assert float(y.max()) <= 32767.0


class TestHighPassFilter:
    def test_runs_and_attenuates_dc(self):
        st = hpf.init_state(2)
        x = jnp.ones((160, 2)) * 1000.0
        for _ in range(20):
            st, y = hpf.process(st, x, 16000)
        assert float(jnp.abs(y).max()) < 10.0


class TestPostFilter:
    def test_needed_only_at_48k(self):
        assert post_filter.is_needed(48000)
        assert not post_filter.is_needed(32000)

    def test_removes_high_band_keeps_low(self):
        fs = 48000
        t = np.arange(fs // 2) / fs
        x_lo = (np.sin(2 * np.pi * 1000 * t) * 1000).astype(np.float32)
        x_hi = (np.sin(2 * np.pi * 21000 * t) * 1000).astype(np.float32)
        st = post_filter.init_state(1)
        _, y_lo = post_filter.process(st, jnp.asarray(x_lo[:, None]))
        st = post_filter.init_state(1)
        _, y_hi = post_filter.process(st, jnp.asarray(x_hi[:, None]))
        rms = lambda v: float(jnp.sqrt(jnp.mean(v[4800:] ** 2)))
        assert rms(y_hi) < 0.15 * rms(jnp.asarray(x_hi[:, None]))
        assert abs(rms(y_lo) / rms(jnp.asarray(x_lo[:, None])) - 1) < 0.2


class TestCaptureLevelsAdjuster:
    def test_pre_gain_with_emulation(self):
        st = cla.init_state(pre_gain=2.0, post_gain=1.0, initial_level=128, emulation_enabled=True)
        x = jnp.ones((160, 1)) * 1000.0
        st, y = cla.apply_pre_level_adjustment(st, x, True)
        # steady-state gain 2.0 * 128/255
        np.testing.assert_allclose(float(y[-1, 0]), 1000.0 * 2.0 * 128 / 255, rtol=1e-4)

    def test_level_clamping(self):
        st = cla.init_state(1.0, 1.0, 255, True)
        st = cla.set_analog_mic_gain_level(st, 400)
        assert int(st.emulated_level) == 255

    def test_post_gain(self):
        st = cla.init_state(1.0, 0.5, 255, False)
        x = jnp.ones((160, 1)) * 1000.0
        st, y = cla.apply_post_level_adjustment(st, x)
        np.testing.assert_allclose(float(y[-1, 0]), 500.0, rtol=1e-4)


class TestRmsLevel:
    def test_full_scale_square_is_zero_db(self):
        st = rms_level.init_state()
        x = jnp.full((160, 1), 32767.0)
        st = rms_level.analyze(st, x)
        st, avg = rms_level.average_and_peak(st)
        assert int(avg) == 0

    def test_silence(self):
        st = rms_level.init_state()
        st = rms_level.analyze(st, jnp.zeros((160, 1)))
        st, avg = rms_level.average_and_peak(st)
        assert int(avg) == rms_level.MIN_LEVEL_DB

    def test_half_scale(self):
        st = rms_level.init_state()
        x = jnp.full((160, 1), 16384.0)
        st = rms_level.analyze(st, x)
        st, avg, peak = rms_level.average_and_peak_with_block_size(st, 160)
        # 20*log10(0.5) = -6.02 -> 6
        assert int(avg) == 6 and int(peak) == 6


class TestPostFilterWiring:
    """PostFilter::CreateIfNeeded requires proc rate == 48 kHz exactly
    (post_filter.cc:44-52); the APM must not attach one at 32 kHz."""

    def _state_for(self, rate, mobile=False, max_internal=48000):
        from webrtc_audio_processing_tpu import apm, config as cfg_mod

        c = cfg_mod.Config().replace(
            pipeline=cfg_mod.Pipeline(
                maximum_internal_processing_rate=max_internal
            ),
            echo_canceller=cfg_mod.EchoCanceller(
                enabled=True, mobile_mode=mobile
            ),
        )
        geo = apm.ApmGeometry.create(c, rate)
        return apm.init_state(geo)

    def test_no_post_filter_at_32k(self):
        assert self._state_for(32000).pf is None

    def test_no_post_filter_at_16k(self):
        assert self._state_for(16000).pf is None

    def test_post_filter_at_48k(self):
        assert self._state_for(48000).pf is not None

    def test_no_post_filter_for_mobile_mode(self):
        assert self._state_for(48000, mobile=True).pf is None

    def test_no_post_filter_with_default_32k_internal_cap(self):
        # Config::Pipeline defaults maximum_internal_processing_rate to
        # 32000 (audio_processing.h:148): a 48 kHz stream processes at
        # 32 kHz and must not get the 48 kHz-designed post filter.
        assert self._state_for(48000, max_internal=32000).pf is None
