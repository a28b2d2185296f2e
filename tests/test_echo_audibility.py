"""EchoAudibility / StationarityEstimator unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aec3 import echo_audibility as ea


def test_noise_floor_tracks_minimum():
    st = ea.init_state().stationarity
    up = jax.jit(ea._noise_update)
    for _ in range(200):
        st = up(st, jnp.full((65,), 100.0))
    # Noise floor converges toward the stationary level.
    assert 50.0 < float(st.noise_spectrum[10]) < 300.0
    # A loud transient barely moves it (asymmetric smoothing).
    st2 = up(st, jnp.full((65,), 1e6))
    assert float(st2.noise_spectrum[10]) < 2.0 * float(st.noise_spectrum[10])


def test_stationary_band_flags_and_scaling():
    st = ea.init_state()
    L, C = 30, 1
    spectra = jnp.full((L, C, 65), 100.0)
    up = jax.jit(lambda s, sp, eds: ea.update(
        s, sp, jnp.asarray(5), jnp.asarray(0), L,
        jnp.full((64, 1), 50.0), jnp.zeros((65,)), jnp.asarray(2),
        jnp.asarray(6), eds, False,
    ))
    # Loud render is observed before the delay is reported (as in a real
    # call): non_zero_render_seen latches while external_delay_seen=False.
    for _ in range(3):
        st = up(st, spectra, jnp.asarray(False))
    for _ in range(100):
        st = up(st, spectra, jnp.asarray(True))
    # Stationary render: all bands flagged after the hangover drains.
    assert bool(jnp.all(st.stationarity.flags))
    assert int(jnp.max(st.stationarity.hangovers)) == 0
    scaling = ea.residual_echo_scaling(st, jnp.asarray(True), False)
    np.testing.assert_array_equal(np.asarray(scaling), np.zeros(65))
    # Not yet converged: no scaling.
    scaling2 = ea.residual_echo_scaling(st, jnp.asarray(False), False)
    np.testing.assert_array_equal(np.asarray(scaling2), np.ones(65))


def test_nonstationary_render_keeps_scaling_one():
    st = ea.init_state()
    L = 30
    rng = np.random.default_rng(3)
    up = jax.jit(lambda s, sp: ea.update(
        s, sp, jnp.asarray(5), jnp.asarray(0), L,
        jnp.full((64, 1), 500.0), jnp.zeros((65,)), jnp.asarray(2),
        jnp.asarray(6), jnp.asarray(True), False,
    ))
    for k in range(100):
        level = 10.0 if k % 7 < 3 else 1e5  # bursty
        spectra = jnp.asarray(
            rng.uniform(0.5, 1.5, (L, 1, 65)) * level, jnp.float32
        )
        st = up(st, spectra)
    scaling = ea.residual_echo_scaling(st, jnp.asarray(True), False)
    assert float(jnp.mean(scaling)) > 0.5
