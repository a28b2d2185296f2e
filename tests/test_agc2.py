"""AGC2 chain vs the sequential numpy oracle (reference_agc2.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu import config as cfg
from webrtc_audio_processing_tpu.models.agc2 import (
    adaptive_digital as ad,
    gain_controller2 as gc2,
    limiter as limiter_mod,
)

from tests import reference_agc2 as ref

RNG = np.random.default_rng(3)


class TestLimiter:
    def test_matches_oracle(self):
        state = limiter_mod.init_state()
        oracle = ref.Limiter()
        step = jax.jit(limiter_mod.process)
        for f in range(40):
            amp = [500, 5000, 20000, 40000][f % 4]
            x = (RNG.standard_normal((480, 2)) * amp).astype(np.float32)
            want = oracle.process(x.astype(np.float64))
            state, got = step(state, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(got), want, atol=0.5)

    def test_identity_below_knee(self):
        state = limiter_mod.init_state()
        x = jnp.asarray(RNG.standard_normal((160, 1)) * 1000, jnp.float32)
        state, y = limiter_mod.process(state, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)

    def test_limits_loud_signal(self):
        state = limiter_mod.init_state()
        x = jnp.full((160, 1), 60000.0)
        for _ in range(5):
            state, y = limiter_mod.process(state, x)
        assert float(jnp.abs(y).max()) <= 32767.0


class TestGainCurve:
    def test_regions(self):
        lv = jnp.asarray([0.0, 10000.0, 30057.0, 31000.0, 36000.0, 50000.0, 80000.0])
        g = np.asarray(limiter_mod.look_up_gain(lv))
        np.testing.assert_allclose(g[:3], 1.0)
        assert 0.9 < g[3] < 1.0 or g[3] <= 1.0
        np.testing.assert_allclose(g[5], 32768.0 / 50000.0, rtol=1e-6)
        for i, x in enumerate(np.asarray(lv)):
            np.testing.assert_allclose(
                g[i], ref.look_up_gain(float(x)), rtol=1e-5
            )


class TestFullAgc2:
    def test_matches_oracle_speech_pattern(self):
        config = cfg.GainController2(
            enabled=True,
            adaptive_digital=cfg.AdaptiveDigital(enabled=True),
            fixed_digital=cfg.FixedDigital(gain_db=2.0),
        )
        rate = 16000
        state = gc2.init_state(config, rate)
        oracle = ref.GainController2Ref(
            rate,
            dict(
                initial_gain_db=15.0, headroom_db=5.0, max_gain_db=50.0,
                max_gain_change_db_per_second=6.0,
                max_output_noise_level_dbfs=-50.0,
            ),
            fixed_gain_db=2.0,
        )

        def step(state, x, p):
            return gc2.process(config, state, x, rate, speech_probability=p)

        step = jax.jit(step)
        n = rate // 100
        for f in range(200):
            # Alternate speech bursts and silence-ish noise.
            speech = (f // 30) % 2 == 0
            amp = 6000.0 if speech else 300.0
            p = 0.99 if speech else 0.1
            x = (RNG.standard_normal((n, 1)) * amp).astype(np.float32)
            want = oracle.process(x, p)
            state, got, info = step(state, jnp.asarray(x), jnp.float32(p))
            got = np.asarray(got)
            scale = max(np.abs(want).max(), 1.0)
            assert np.abs(got - want).max() / scale < 5e-3, f"frame {f}"

    def test_fixed_digital_only(self):
        config = cfg.GainController2(
            enabled=True, fixed_digital=cfg.FixedDigital(gain_db=6.0)
        )
        state = gc2.init_state(config, 48000)
        x = (RNG.standard_normal((480, 2)) * 1000).astype(np.float32)
        state, y, _ = gc2.process(config, state, jnp.asarray(x), 48000)
        # ~2x gain (6 dB). First frame ramps from the initial factor = target,
        # so gain is constant.
        np.testing.assert_allclose(
            np.asarray(y), x * 10 ** (6 / 20), rtol=1e-4
        )


class TestSaturationProtector:
    def test_headroom_converges(self):
        st = ad.init_saturation_protector()
        for _ in range(100):
            st = ad.saturation_protector_analyze(
                st, jnp.float32(0.99), jnp.float32(-5.0), jnp.float32(-20.0)
            )
        # difference_db = 15 > initial won't hold; headroom in [12, 25].
        assert 12.0 <= float(st.headroom_db) <= 25.0


class TestNoiseFloor:
    def test_tracks_floor(self):
        st = ad.init_noise_floor(16000)
        oracle = ref.NoiseFloorEstimator(16000)
        for f in range(60):
            x = (RNG.standard_normal((160, 1)) * (200 + f)).astype(np.float32)
            want = oracle.analyze(x.astype(np.float64))
            st, got = ad.noise_floor_analyze(st, jnp.asarray(x), 16000)
            np.testing.assert_allclose(float(got), want, atol=1e-2)
