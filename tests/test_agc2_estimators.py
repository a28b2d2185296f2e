"""AGC2 estimator tests modeled on the reference's agc2 suites.

SpeechLevelEstimator (speech_level_estimator_unittest.cc),
SaturationProtector (saturation_protector_unittest.cc) and the
InterpolatedGainCurve (interpolated_gain_curve_unittest.cc)."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.config import AdaptiveDigital
from webrtc_audio_processing_tpu.models.agc2 import adaptive_digital as ad
from webrtc_audio_processing_tpu.models.agc2 import limiter

CFG = AdaptiveDigital(enabled=True)
MAX_P = 0.999  # kMaxSpeechProbability
NO_P = 0.001
# kNumFramesToConfidence: time-to-confidence / frame duration, plus the
# adjacent-speech threshold the production config requires to engage.
N_CONF = ad.LEVEL_ESTIMATOR_TIME_TO_CONFIDENCE_MS // ad.FRAME_DURATION_MS


def _run_level(state, n, rms_dbfs, prob):
    def body(st, _):
        return ad.speech_level_update(
            st, jnp.asarray(rms_dbfs, jnp.float32),
            jnp.asarray(prob, jnp.float32),
        ), None

    state, _ = jax.lax.scan(body, state, None, length=n)
    return state


class TestSpeechLevelEstimator:
    LEVEL = -31.0  # kConvergenceSpeedTestsLevel-ish constant input

    def test_level_stabilizes(self):
        st = ad.init_speech_level(CFG)
        st = _run_level(st, N_CONF + 20, self.LEVEL, MAX_P)
        level = float(st.level_dbfs)
        st = _run_level(st, 1, self.LEVEL, MAX_P)
        assert abs(float(st.level_dbfs) - level) < 0.1

    def test_is_not_confident_with_few_frames(self):
        st = ad.init_speech_level(CFG)
        st = _run_level(st, N_CONF // 2, self.LEVEL, MAX_P)
        assert not bool(st.is_confident)

    def test_is_confident_with_enough_frames(self):
        st = ad.init_speech_level(CFG)
        st = _run_level(st, N_CONF + ad.ADJACENT_SPEECH_FRAMES_THRESHOLD,
                        self.LEVEL, MAX_P)
        assert bool(st.is_confident)

    def test_ignores_non_speech_frames(self):
        st = ad.init_speech_level(CFG)
        st = _run_level(st, N_CONF + 20, self.LEVEL, MAX_P)
        level = float(st.level_dbfs)
        st = _run_level(st, N_CONF, 0.0, NO_P)  # full-scale non-speech
        assert float(st.level_dbfs) == level

    def test_converges_to_input_level(self):
        st = ad.init_speech_level(CFG)
        st = _run_level(st, N_CONF + 20, self.LEVEL, MAX_P)
        assert abs(float(st.level_dbfs) - self.LEVEL) < 0.5


def _run_sat(state, n, prob, peak, level):
    def body(st, _):
        return ad.saturation_protector_analyze(
            st, jnp.asarray(prob, jnp.float32),
            jnp.asarray(peak, jnp.float32), jnp.asarray(level, jnp.float32),
        ), None

    state, _ = jax.lax.scan(body, state, None, length=n)
    return state


class TestSaturationProtector:
    """saturation_protector_unittest.cc EstimatesCrestRatio/ChangeSlowly."""

    def test_estimates_crest_ratio(self):
        # saturation_protector_unittest.cc:65-81: the crest factor is set
        # 1 dB away from the initial headroom (adaptation is deliberately
        # slow), tolerance = 0.5 * |initial - crest|.
        crest = ad.SATURATION_PROTECTOR_INITIAL_HEADROOM_DB + 1.0
        peak = -20.0
        level = peak - crest
        st = ad.init_saturation_protector()
        st = _run_sat(st, 2000, MAX_P, peak, level)
        assert abs(float(st.headroom_db) - crest) < 0.5

    def test_initial_headroom(self):
        st = ad.init_saturation_protector()
        assert float(st.headroom_db) == ad.SATURATION_PROTECTOR_INITIAL_HEADROOM_DB

    def test_changes_slowly(self):
        # One frame must not move the headroom by more than the reference's
        # max change rate per frame region (saturation_protector.cc).
        st = ad.init_saturation_protector()
        st = _run_sat(st, ad.ADJACENT_SPEECH_FRAMES_THRESHOLD + 1,
                      MAX_P, 0.0, -40.0)
        delta = abs(
            float(st.headroom_db) - ad.SATURATION_PROTECTOR_INITIAL_HEADROOM_DB
        )
        assert delta < 1.0, delta

    def test_no_adaptation_for_nonspeech(self):
        st = ad.init_saturation_protector()
        st = _run_sat(st, 500, NO_P, 0.0, -40.0)
        assert float(st.headroom_db) == ad.SATURATION_PROTECTOR_INITIAL_HEADROOM_DB


class TestInterpolatedGainCurve:
    """interpolated_gain_curve_unittest.cc (identity region, monotonicity,
    valid output, saturation region)."""

    LEVELS = np.linspace(1.0, 4.0 * 32768.0, 4001).astype(np.float32)

    def test_identity_region(self):
        # Below the knee the gain is exactly 1.
        knee_start = float(np.asarray(limiter._X)[0])
        levels = jnp.asarray([1.0, knee_start * 0.5, knee_start * 0.99])
        g = np.asarray(limiter.look_up_gain(levels))
        np.testing.assert_array_equal(g, np.ones(3, np.float32))

    def test_valid_output_and_monotonic_output_level(self):
        g = np.asarray(limiter.look_up_gain(jnp.asarray(self.LEVELS)))
        assert np.all(g > 0.0)
        assert np.all(g <= 1.0 + 1e-6)
        # Applied level (gain * level) is non-decreasing in input level
        # (up to f32 rounding in the saturation region's 32768/level).
        applied = g * self.LEVELS
        assert np.all(np.diff(applied) >= -1e-2)

    def test_gain_monotonically_nonincreasing(self):
        g = np.asarray(limiter.look_up_gain(jnp.asarray(self.LEVELS)))
        assert np.all(np.diff(g) <= 1e-7)

    def test_saturation_region_clamps_to_full_scale(self):
        # Above kMaxInputLevelLinear the output is exactly full scale.
        lv = np.asarray([limiter.MAX_INPUT_LEVEL_LINEAR * 1.5,
                         limiter.MAX_INPUT_LEVEL_LINEAR * 4.0], np.float32)
        g = np.asarray(limiter.look_up_gain(jnp.asarray(lv)))
        np.testing.assert_allclose(g * lv, 32768.0, rtol=1e-6)

    def test_limiter_output_never_exceeds_full_scale(self):
        st = limiter.init_state()
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((480, 1)) * 60000).astype(np.float32)

        @jax.jit
        def step(st, fr):
            return limiter.process(st, fr)

        for k in range(3):
            st, y = step(st, jnp.asarray(x[k * 160 : (k + 1) * 160]))
            assert float(jnp.max(jnp.abs(y))) <= 32768.0 + 1e-3
