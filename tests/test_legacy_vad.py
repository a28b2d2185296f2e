"""Legacy GMM VAD: bit-exact vs the numpy oracle + behavioral checks."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.vad import legacy_vad as LV
from tests import reference_vad

RNG = np.random.default_rng(17)


def _speechlike(n, fs, amp=6000):
    t = np.arange(n) / fs
    f0 = 130 * (1 + 0.05 * np.sin(2 * np.pi * 2.9 * t))
    ph = 2 * np.pi * np.cumsum(f0) / fs
    saw = sum((1.0 / k) * np.sin(k * ph) for k in range(1, 9))
    burst = (np.sin(2 * np.pi * 1.9 * t) > -0.2)
    sig = amp * saw / np.abs(saw).max() * burst
    return np.trunc(sig + RNG.normal(size=n) * 60).astype(np.int64)


def test_bitexact_vs_oracle_8k():
    fs = 8000
    x = _speechlike(80 * 120, fs)
    oracle = reference_vad.Oracle(mode=0)
    st = LV.init_state()
    step = jax.jit(functools.partial(LV.process, sample_rate_hz=fs, mode=0))
    for k in range(120):
        frame = x[k * 80 : (k + 1) * 80]
        want = oracle.process(frame, fs)
        st, got = step(st, jnp.asarray(frame, jnp.int32))
        assert int(got) == want, f"frame {k}: {int(got)} != {want}"
    # State parity: GMM parameters identical after 120 frames.
    np.testing.assert_array_equal(np.asarray(st.noise_means),
                                  oracle.noise_means)
    np.testing.assert_array_equal(np.asarray(st.speech_means),
                                  oracle.speech_means)
    np.testing.assert_array_equal(np.asarray(st.noise_stds),
                                  oracle.noise_stds)
    np.testing.assert_array_equal(np.asarray(st.speech_stds),
                                  oracle.speech_stds)
    np.testing.assert_array_equal(np.asarray(st.low_value_vector),
                                  oracle.low_value_vector)
    np.testing.assert_array_equal(np.asarray(st.mean_value),
                                  oracle.mean_value)


def test_bitexact_vs_oracle_16k_mode2():
    fs = 16000
    x = _speechlike(160 * 80, fs)
    oracle = reference_vad.Oracle(mode=2)
    st = LV.init_state()
    step = jax.jit(functools.partial(LV.process, sample_rate_hz=fs, mode=2))
    for k in range(80):
        frame = x[k * 160 : (k + 1) * 160]
        want = oracle.process(frame, fs)
        st, got = step(st, jnp.asarray(frame, jnp.int32))
        assert int(got) == want, f"frame {k}"


def test_bitexact_vs_oracle_32k():
    fs = 32000
    x = _speechlike(320 * 50, fs)
    oracle = reference_vad.Oracle(mode=0)
    st = LV.init_state()
    step = jax.jit(functools.partial(LV.process, sample_rate_hz=fs, mode=0))
    for k in range(50):
        frame = x[k * 320 : (k + 1) * 320]
        want = oracle.process(frame, fs)
        st, got = step(st, jnp.asarray(frame, jnp.int32))
        assert int(got) == want, f"frame {k}"


def test_detects_speech_vs_silence():
    fs = 8000
    st = LV.init_state()
    step = jax.jit(functools.partial(LV.process, sample_rate_hz=fs, mode=0))
    speech = _speechlike(80 * 50, fs)
    flags = []
    for k in range(50):
        st, f = step(st, jnp.asarray(speech[k * 80 : (k + 1) * 80],
                                     jnp.int32))
        flags.append(int(f))
    assert np.mean(flags[10:]) > 0.5
    silence = (RNG.normal(size=80 * 30) * 3).astype(np.int64)
    flags2 = []
    for k in range(30):
        st, f = step(st, jnp.asarray(silence[k * 80 : (k + 1) * 80],
                                     jnp.int32))
        flags2.append(int(f))
    # After the hangover the VAD must settle on 0 for near-silence.
    assert np.mean(flags2[15:]) < 0.5
