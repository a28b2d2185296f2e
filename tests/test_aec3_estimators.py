"""AEC3 estimator tests modeled on the reference's per-component suites.

ClockdriftDetector (clockdrift_detector_unittest.cc), ErlEstimator
(erl_estimator_unittest.cc: Estimates) and the subband ERLE estimator
(erle_estimator_unittest.cc: VerifyErleIncreaseAndHold).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.models.aec3 import (
    aec_state,
    config as aec3_config,
    delay_estimator as de,
)

CFG = aec3_config.EchoCanceller3Config()
BPS = 250  # blocks per second at the 16 kHz block rate


def _drift_many(state, delay, n):
    def body(st, _):
        return de._clockdrift_update(
            st, jnp.asarray(delay, jnp.int32), jnp.asarray(True)
        ), None

    state, _ = jax.lax.scan(body, state, None, length=n)
    return state


class TestClockdriftDetector:
    """clockdrift_detector_unittest.cc, ported 1:1 (levels 0/1/2)."""

    def test_detection_sequence(self):
        st = de.DelayEstimatorState.__new__  # placeholder guard
        st = de.ClockdriftState(
            delay_history=jnp.full((3,), 0, jnp.int32),
            stability_counter=jnp.asarray(0, jnp.int32),
            level=jnp.asarray(0, jnp.int32),
        )
        assert int(st.level) == 0

        for d in (1000, 1001):
            st = _drift_many(st, d, 100)
            assert int(st.level) == 0, int(st.level)
        st = _drift_many(st, 1002, 100)
        assert int(st.level) == 1  # probable
        st = _drift_many(st, 1003, 100)
        assert int(st.level) == 2  # verified

        st = _drift_many(st, 1003, 10000)
        assert int(st.level) == 0  # stable -> none

        st = _drift_many(st, 1001, 100)
        st = _drift_many(st, 999, 100)
        assert int(st.level) == 1  # probable (decreasing)
        st = _drift_many(st, 1000, 100)
        st = _drift_many(st, 998, 100)
        assert int(st.level) == 2  # verified

    def test_disabled_keeps_state(self):
        st = de.ClockdriftState(
            delay_history=jnp.full((3,), 7, jnp.int32),
            stability_counter=jnp.asarray(3, jnp.int32),
            level=jnp.asarray(1, jnp.int32),
        )
        out = de._clockdrift_update(
            st, jnp.asarray(123, jnp.int32), jnp.asarray(False)
        )
        assert int(out.level) == 1
        np.testing.assert_array_equal(
            np.asarray(out.delay_history), np.asarray(st.delay_history)
        )


def _erl_many(state, converged, X2, Y2, n):
    def body(st, _):
        return aec_state.erl_update(st, converged, X2, Y2), None

    state, _ = jax.lax.scan(body, state, None, length=n)
    return state


class TestErlEstimator:
    """erl_estimator_unittest.cc Estimates, on the (1 render, 1 capture)
    and (2, 2) shapes."""

    @pytest.mark.parametrize("ren,cap", [(1, 1), (2, 2)])
    def test_estimates(self, ren, cap):
        st = aec_state.init_erl()
        converged = jnp.asarray([False] * (cap - 1) + [True])
        X2 = jnp.full((ren, 65), 500e6, jnp.float32)
        Y2 = jnp.where(
            converged[:, None], 10.0 * 500e6, 0.0
        ) * jnp.ones((cap, 65), jnp.float32)

        # Burn through the 2 s startup phase (the reference test constructs
        # ErlEstimator(0); this port keeps the production startup).
        st = _erl_many(st, converged, X2, Y2, 2 * BPS)
        st = _erl_many(st, converged, X2, Y2, 200)
        np.testing.assert_allclose(np.asarray(st.erl), 10.0, atol=1e-3)
        np.testing.assert_allclose(float(st.erl_time_domain), 10.0, atol=1e-3)

        # An increased ERL in the data is held off for 999 updates...
        Y2_hi = jnp.where(converged[:, None], 10000.0 * 500e6, 0.0) * jnp.ones(
            (cap, 65), jnp.float32
        )
        st = _erl_many(st, converged, X2, Y2_hi, 998)
        np.testing.assert_allclose(np.asarray(st.erl), 10.0, atol=1e-3)
        # ...then raised at 3 dB per update...
        st = _erl_many(st, converged, X2, Y2_hi, 1)
        np.testing.assert_allclose(np.asarray(st.erl), 20.0, atol=1e-3)
        # ...to the maximum.
        st = _erl_many(st, converged, X2, Y2_hi, 1000)
        np.testing.assert_allclose(np.asarray(st.erl), 1000.0, atol=1e-3)

        # Not updated for low-level render.
        X2_low = jnp.full((ren, 65), 1000.0 * 1000.0, jnp.float32)
        Y2_low = jnp.where(
            converged[:, None], 10.0 * 1000e3, 0.0
        ) * jnp.ones((cap, 65), jnp.float32)
        st = _erl_many(st, converged, X2_low, Y2_low, 200)
        np.testing.assert_allclose(np.asarray(st.erl), 1000.0, atol=1e-3)


def _erle_many(state, X2, Y2, E2, converged, n):
    def body(st, _):
        return aec_state.erle_update(
            CFG, st, X2, Y2, E2, converged
        ), None

    state, _ = jax.lax.scan(body, state, None, length=n)
    return state


class TestErleEstimator:
    """erle_estimator_unittest.cc VerifyErleIncreaseAndHold (subband)."""

    def test_erle_increase_and_hold(self):
        cap = 1
        st = aec_state.init_erle(CFG, cap)
        converged = jnp.ones((cap,), bool)
        X2 = jnp.full((65,), 500e6, jnp.float32)  # strong render
        Y2 = jnp.full((cap, 65), 500e6, jnp.float32)
        E2 = Y2 / 64.0  # strong echo removal

        st = _erle_many(st, X2, Y2, E2, converged, 2 * BPS + 1000)
        erle, _, _ = aec_state.erle_arrays(CFG, st)
        erle = np.asarray(erle)[0, 1:64]
        # ERLE rises to the configured band maxima (max_l = 4.0 -> 6 dB,
        # max_h = 1.5) and never exceeds them.
        assert np.all(erle >= CFG.erle.min), erle.min()
        assert erle.max() <= CFG.erle.max_l + 1e-3
        assert erle[:20].max() >= CFG.erle.max_l - 0.5, erle[:20].max()

        # With no echo removal (E2 == Y2) the ERLE decays back toward min.
        st2 = _erle_many(st, X2, Y2, Y2, converged, 2000)
        erle2, _, _ = aec_state.erle_arrays(CFG, st2)
        erle2 = np.asarray(erle2)[0, 1:64]
        assert erle2.max() <= erle.max() + 1e-6
        assert erle2.mean() < erle.mean()

    def test_no_update_when_not_converged(self):
        cap = 1
        st = aec_state.init_erle(CFG, cap)
        converged = jnp.zeros((cap,), bool)
        X2 = jnp.full((65,), 500e6, jnp.float32)
        Y2 = jnp.full((cap, 65), 500e6, jnp.float32)
        st2 = _erle_many(st, X2, Y2, Y2 / 64.0, converged, 2 * BPS + 200)
        erle, _, _ = aec_state.erle_arrays(CFG, st2)
        np.testing.assert_allclose(
            np.asarray(erle), CFG.erle.min, atol=1e-6
        )
