"""AEC3 analyzer tests modeled on the reference's per-component suites.

RenderSignalAnalyzer (render_signal_analyzer_unittest.cc), echo-path-change
handling (echo_path_variability_unittest.cc / aec_state.cc:146-176) and
SuppressionGain bounds (suppression_gain_unittest.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.models.aec3 import (
    aec_state,
    config as aec3_config,
    echo_remover as er,
    render_buffer as rb,
    subtractor as sub,
)

CFG = aec3_config.EchoCanceller3Config()
F = np.float32


def _drive_analyzer(signal_fn, n_blocks=100, num_channels=1):
    geo = rb.BufferGeometry.create(CFG, 48000, num_channels)
    buf = rb.init_state(geo, CFG)
    st = sub.init_analyzer()

    @jax.jit
    def step(buf, st, block, n):
        buf, _ = rb.insert(geo, CFG, buf, block, n)
        buf, _, _ = rb.prepare_capture_processing(geo, CFG, buf)
        view = rb.RenderView(state=buf, n=n)
        st = sub.analyzer_update(
            CFG, st, geo, view, jnp.asarray(0, jnp.int32), jnp.asarray(True)
        )
        return buf, st

    for k in range(n_blocks):
        block = signal_fn(k, num_channels)  # (bands, 64, C)
        buf, st = step(buf, st, jnp.asarray(block), jnp.asarray(k + 1, jnp.int32))
    return st


class TestRenderSignalAnalyzer:
    """render_signal_analyzer_unittest.cc:131-175."""

    @pytest.mark.parametrize("ch", [1, 2])
    def test_no_false_detection_on_noise(self, ch):
        rng = np.random.default_rng(42)

        def noise(_k, c):
            return (rng.standard_normal((3, 64, c)) * 10000).astype(F)

        st = _drive_analyzer(noise, 100, ch)
        assert not bool(sub.poor_signal_excitation(st))
        assert int(st.narrow_peak_band) == -1
        mask = sub.mask_narrow_bands(st, jnp.ones((65,), jnp.float32))
        np.testing.assert_array_equal(np.asarray(mask), np.ones(65, F))

    def test_narrow_band_detection_on_sinusoid(self):
        # A pure tone on band 0 must trip the narrow-band counters and
        # zero the mask around the peak bin.
        f_bin = 32  # 32 * 16000/128 = 4 kHz... bin on the 64-bin grid
        phase = 2 * np.pi * f_bin / 128.0

        def tone(k, c):
            t = np.arange(k * 64, (k + 1) * 64)
            x = (np.sin(phase * t) * 8000).astype(F)
            blk = np.zeros((3, 64, c), F)
            for cc in range(c):
                blk[0, :, cc] = x
            return blk

        st = _drive_analyzer(tone, 60, 1)
        assert bool(sub.poor_signal_excitation(st))
        mask = np.asarray(sub.mask_narrow_bands(st, jnp.ones((65,), F)))
        assert mask.min() == 0.0
        # The masked region surrounds the tone bin.
        zeroed = np.nonzero(mask == 0.0)[0]
        assert np.any(np.abs(zeroed - f_bin) <= 2), zeroed


class TestEchoPathChange:
    """aec_state.cc:146-176 via handle_echo_path_change."""

    def _state(self):
        return aec_state.init_state(CFG, 1, 1)

    def test_delay_change_resets(self):
        st = self._state()
        st = st.replace(
            blocks_with_active_render=jnp.asarray(500, jnp.int32),
            capture_signal_saturation=jnp.asarray(True),
            usable_linear_estimate=jnp.asarray(True),
        )
        out = aec_state.handle_echo_path_change(
            CFG, st, jnp.asarray(True), jnp.asarray(False)
        )
        assert int(out.blocks_with_active_render) == 0
        assert not bool(out.capture_signal_saturation)
        assert not bool(out.usable_linear_estimate)
        assert bool(out.initial_state)

    def test_no_change_keeps_state(self):
        st = self._state()
        st = st.replace(blocks_with_active_render=jnp.asarray(500, jnp.int32))
        out = aec_state.handle_echo_path_change(
            CFG, st, jnp.asarray(False), jnp.asarray(False)
        )
        assert int(out.blocks_with_active_render) == 500

    def test_gain_change_resets_erle_only(self):
        st = self._state()
        st = st.replace(blocks_with_active_render=jnp.asarray(500, jnp.int32))
        out = aec_state.handle_echo_path_change(
            CFG, st, jnp.asarray(False), jnp.asarray(True)
        )
        # Render activity is preserved on a pure gain change...
        assert int(out.blocks_with_active_render) == 500
        # ...but the ERLE estimator restarted its block counter.
        assert int(out.erle.blocks_since_reset) == 0


class TestSuppressionGainBounds:
    """suppression_gain_unittest.cc BasicGainComputation (bounds part)."""

    def _run(self, nearend_level, echo_level, n=100):
        st = er.init_suppression_gain(CFG, 1)
        E2 = jnp.full((1, 65), nearend_level, jnp.float32)
        R2 = jnp.full((1, 65), echo_level, jnp.float32)
        N2 = jnp.full((1, 65), 1.0, jnp.float32)
        render = jnp.zeros((3, 64, 1), jnp.float32)

        @jax.jit
        def step(st):
            return er.suppression_gain_compute(
                CFG, st, E2, R2, R2, R2, N2,
                jnp.asarray(-1, jnp.int32), jnp.asarray(False), render,
                clock_drift=False,
            )

        g = None
        for _ in range(n):
            st, g, g_high = step(st)
        return np.asarray(g), float(g_high)

    def test_strong_echo_suppressed(self):
        g, g_high = self._run(nearend_level=10.0, echo_level=1.0e6)
        assert g[1:64].max() < 0.02, g.max()

    def test_nearend_only_passes(self):
        g, g_high = self._run(nearend_level=1.0e6, echo_level=10.0)
        assert g[1:64].min() > 0.9, g.min()

    def test_gain_in_unit_interval(self):
        for ne, ec in [(1e5, 1e5), (0.0, 0.0), (1e7, 1e2)]:
            g, g_high = self._run(ne, ec, n=30)
            assert np.all(g >= 0.0) and np.all(g <= 1.0)
            assert 0.0 <= g_high <= 1.0
