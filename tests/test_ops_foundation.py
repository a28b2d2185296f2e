"""Tests for recurrence, biquad/HPF, QMF, and audio_util primitives."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.signal

from webrtc_audio_processing_tpu.ops import audio_util, biquad, qmf, recurrence

from tests import reference_dsp


RNG = np.random.default_rng(42)


class TestRecurrence:
    def test_affine_scan_1_matches_loop(self):
        n = 160
        m = np.float32(-0.87)
        b = RNG.standard_normal(n).astype(np.float32)
        y_init = np.float32(0.3)
        got = recurrence.affine_scan_1(jnp.asarray(m), jnp.asarray(b), jnp.asarray(y_init))
        want = np.empty(n, np.float32)
        y = y_init
        for i in range(n):
            y = m * y + b[i]
            want[i] = y
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    def test_affine_scan_1_batched(self):
        n, batch = 80, 7
        b = RNG.standard_normal((n, batch)).astype(np.float32)
        y0 = RNG.standard_normal(batch).astype(np.float32)
        got = recurrence.affine_scan_1(jnp.float32(0.5), jnp.asarray(b), jnp.asarray(y0))
        want = recurrence.scan_recurrence_1(jnp.float32(0.5), jnp.asarray(b), jnp.asarray(y0))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_affine_scan_2_matches_loop(self):
        n = 160
        a1, a2 = np.float32(-1.88), np.float32(0.888)
        f = RNG.standard_normal(n).astype(np.float32)
        y_init = np.array([0.1, -0.2], np.float32)
        got = recurrence.affine_scan_2(a1, a2, jnp.asarray(f), jnp.asarray(y_init))
        want = np.empty(n, np.float32)
        y1, y2 = y_init
        for i in range(n):
            y = f[i] - a1 * y1 - a2 * y2
            y2, y1 = y1, y
            want[i] = y
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestBiquad:
    @pytest.mark.parametrize("rate", [16000, 32000, 48000])
    def test_hpf_matches_reference_loop(self, rate):
        b, a = biquad.HPF_COEFFS[rate]
        n = rate // 100
        x = (RNG.standard_normal(n * 3) * 1000).astype(np.float32)
        state = biquad.init_state(3)
        outs = []
        for k in range(3):
            state, y = biquad.process(b, a, state, jnp.asarray(x[k * n : (k + 1) * n]))
            outs.append(np.asarray(y))
        got = np.concatenate(outs)
        want, _, _ = reference_dsp.biquad_cascade(np.asarray(b), np.asarray(a), x)
        # float32 IIR vs float64 oracle: error accumulates over the frames
        # (the HPF pole sits near DC), so bound it relative to signal scale.
        scale = float(np.sqrt(np.mean(x**2)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3 * scale)

    def test_matches_scipy_sos(self):
        b, a = biquad.HPF_COEFFS[16000]
        n = 480
        x = RNG.standard_normal(n).astype(np.float32)
        state = biquad.init_state(3)
        state, y = biquad.process(b, a, state, jnp.asarray(x))
        sos = np.concatenate(
            [np.asarray(b), np.ones((3, 1), np.float32), np.asarray(a)], axis=1
        )
        want = scipy.signal.sosfilt(sos.astype(np.float64), x.astype(np.float64))
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-3, atol=1e-4)

    def test_streaming_equals_oneshot(self):
        b, a = biquad.HPF_COEFFS[48000]
        x = RNG.standard_normal(960).astype(np.float32)
        st = biquad.init_state(3)
        st, y_once = biquad.process(b, a, st, jnp.asarray(x))
        st2 = biquad.init_state(3)
        parts = []
        for k in range(0, 960, 480):
            st2, yk = biquad.process(b, a, st2, jnp.asarray(x[k : k + 480]))
            parts.append(np.asarray(yk))
        np.testing.assert_allclose(
            np.concatenate(parts), np.asarray(y_once), rtol=1e-4, atol=1e-4
        )

    def test_hpf_removes_dc_passes_speech_band(self):
        b, a = biquad.HPF_COEFFS[16000]
        n = 16000
        t = np.arange(n) / 16000.0
        dc = np.ones(n, np.float32) * 1000.0
        tone1k = np.sin(2 * np.pi * 1000 * t).astype(np.float32) * 1000.0
        st = biquad.init_state(3)
        _, y_dc = biquad.process(b, a, st, jnp.asarray(dc))
        st = biquad.init_state(3)
        _, y_tone = biquad.process(b, a, st, jnp.asarray(tone1k))
        assert np.abs(np.asarray(y_dc)[8000:]).max() < 1.0
        ratio = np.std(np.asarray(y_tone)[8000:]) / np.std(tone1k[8000:])
        assert 0.9 < ratio < 1.1


class TestQmf:
    def test_analysis_matches_reference_loop(self):
        n = 320
        x = (RNG.standard_normal(n * 2) * 8000).astype(np.float32)
        st = qmf.init_state()
        (low, high), st = qmf.analysis(jnp.asarray(x[:n]), st)
        (low2, high2), st = qmf.analysis(jnp.asarray(x[n:]), st)
        got_low = np.concatenate([low, low2])
        got_high = np.concatenate([high, high2])

        s1 = np.zeros(6, np.float32)
        s2 = np.zeros(6, np.float32)
        w_low1, w_high1, s1, s2 = reference_dsp.analysis_qmf(x[:n], s1, s2)
        w_low2, w_high2, s1, s2 = reference_dsp.analysis_qmf(x[n:], s1, s2)
        np.testing.assert_allclose(got_low, np.concatenate([w_low1, w_low2]), rtol=1e-4, atol=2e-2)
        np.testing.assert_allclose(got_high, np.concatenate([w_high1, w_high2]), rtol=1e-4, atol=2e-2)

    def test_synthesis_matches_reference_loop(self):
        n = 160
        low = (RNG.standard_normal(n) * 5000).astype(np.float32)
        high = (RNG.standard_normal(n) * 2000).astype(np.float32)
        st = qmf.init_state()
        out, _ = qmf.synthesis(jnp.asarray(low), jnp.asarray(high), st)
        s1 = np.zeros(6, np.float32)
        s2 = np.zeros(6, np.float32)
        want, _, _ = reference_dsp.synthesis_qmf(low, high, s1, s2)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=2e-2)

    def test_round_trip_reconstruction(self):
        # QMF analysis+synthesis should reconstruct (delayed) input well.
        fs = 32000
        t = np.arange(fs) / fs
        x = (
            np.sin(2 * np.pi * 440 * t) * 3000 + np.sin(2 * np.pi * 3000 * t) * 2000
        ).astype(np.float32)
        st_a = qmf.init_state()
        st_s = qmf.init_state()
        out = []
        for k in range(0, fs, 320):
            (low, high), st_a = qmf.analysis(jnp.asarray(x[k : k + 320]), st_a)
            y, st_s = qmf.synthesis(low, high, st_s)
            out.append(np.asarray(y))
        y = np.concatenate(out)
        # Compensate the QMF delay (~4 samples at full rate; the filterbank is
        # non-perfect-reconstruction so ~32 dB is the design ceiling).
        delay = 4
        err = y[delay : fs // 2] - x[: fs // 2 - delay]
        snr = 10 * np.log10(np.mean(x[: fs // 2 - delay] ** 2) / np.mean(err**2))
        assert snr > 30, f"round-trip SNR too low: {snr:.1f} dB"


class TestAudioUtil:
    def test_s16_float_round_trip(self):
        x = np.array([-32768, -1, 0, 1, 32767], np.int16)
        f = audio_util.s16_to_float(x)
        back = audio_util.float_to_s16(f)
        np.testing.assert_array_equal(np.asarray(back), x)

    def test_float_s16_to_s16_rounding(self):
        x = jnp.array([-1.5, -0.5, -0.4, 0.4, 0.5, 1.5, 32767.9, -32768.9])
        got = np.asarray(audio_util.float_s16_to_s16(x))
        np.testing.assert_array_equal(got, [-2, -1, 0, 0, 1, 2, 32767, -32768])

    def test_dbfs(self):
        np.testing.assert_allclose(
            float(audio_util.float_s16_to_dbfs(jnp.float32(32768.0))), 0.0, atol=1e-4
        )
        assert float(audio_util.float_s16_to_dbfs(jnp.float32(0.5))) == pytest.approx(
            audio_util.MIN_DBFS
        )

    def test_interleave_round_trip(self):
        x = RNG.standard_normal((2, 160)).astype(np.float32)
        inter = audio_util.interleave(jnp.asarray(x))
        back = audio_util.deinterleave(inter, 2)
        np.testing.assert_array_equal(np.asarray(back), x)
