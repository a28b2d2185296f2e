"""EchoAudibility / StationarityEstimator unit tests.

Drives echo_audibility.update through the real ring types (BufferGeometry
+ RenderDelayBufferState + RenderView) with the spectrum region of the sf
ring set directly, so the tests exercise the same sf_span read path the
AEC3 block loop uses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aec3 import echo_audibility as ea
from webrtc_audio_processing_tpu.models.aec3 import render_buffer as rb
from webrtc_audio_processing_tpu.models.aec3.config import (
    EchoCanceller3Config,
)
from webrtc_audio_processing_tpu.models.aec3.echo_canceller3 import (
    Aec3Geometry,
)


def _setup():
    cfg = EchoCanceller3Config()
    geo = Aec3Geometry.create(cfg, 16000, 1, 1).buffer
    return geo, rb.init_state(geo, cfg)


def _with_spectra(geo, buf, spectra):
    """Return buf with every readable sf ring row's spectrum region set to
    spectra[row % L] (mirror rows kept consistent)."""
    L = geo.num_blocks
    rows = buf.sf.shape[0]
    idx = np.arange(rows) % L
    sf = np.array(buf.sf)
    sf[:, geo.fft_row_f : geo.fft_row_f + geo.spec_row_f] = (
        spectra[idx].reshape(rows, -1)
    )
    return buf.replace(sf=jnp.asarray(sf, buf.sf.dtype))


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
    geo, buf = _setup()
    buf = _with_spectra(
        geo, buf, np.full((geo.num_blocks, 1, 65), 100.0, np.float32)
    )
    st = ea.init_state()
    # pending_count is STATIC: build the RenderView inside the jitted fn.
    up = jax.jit(lambda s, b, eds: ea.update(
        s, rb.RenderView(b, jnp.asarray(0)), jnp.asarray(5),
        jnp.asarray(0), geo,
        jnp.full((64, 1), 50.0), jnp.zeros((65,)), jnp.asarray(2),
        jnp.asarray(6), eds, False,
    ))
    # Loud render is observed before the delay is reported (as in a real
    # call): non_zero_render_seen latches while external_delay_seen=False.
    for _ in range(3):
        st = up(st, buf, jnp.asarray(False))
    for _ in range(100):
        st = up(st, buf, jnp.asarray(True))
    # Stationary render: all bands flagged after the hangover drains.
    assert bool(jnp.all(st.stationarity.flags))
    assert int(jnp.max(st.stationarity.hangovers)) == 0
    scaling = ea.residual_echo_scaling(st, jnp.asarray(True), False)
    np.testing.assert_array_equal(np.asarray(scaling), np.zeros(65))
    # Not yet converged: no scaling.
    scaling2 = ea.residual_echo_scaling(st, jnp.asarray(False), False)
    np.testing.assert_array_equal(np.asarray(scaling2), np.ones(65))


def test_nonstationary_render_keeps_scaling_one():
    geo, buf = _setup()
    rng = np.random.default_rng(3)
    st = ea.init_state()
    up = jax.jit(lambda s, b: ea.update(
        s, rb.RenderView(b, jnp.asarray(0)), jnp.asarray(5),
        jnp.asarray(0), geo,
        jnp.full((64, 1), 500.0), jnp.zeros((65,)), jnp.asarray(2),
        jnp.asarray(6), jnp.asarray(True), False,
    ))
    for k in range(100):
        level = 10.0 if k % 7 < 3 else 1e5  # bursty
        spectra = np.asarray(
            rng.uniform(0.5, 1.5, (geo.num_blocks, 1, 65)) * level,
            np.float32,
        )
        st = up(st, _with_spectra(geo, buf, spectra))
    scaling = ea.residual_echo_scaling(st, jnp.asarray(True), False)
    assert float(jnp.mean(scaling)) > 0.5
