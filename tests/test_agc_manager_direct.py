"""AgcManagerDirect behavioral tests (hybrid analog AGC)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.agc1 import agc_manager_direct as amd

RNG = np.random.default_rng(29)


def _voiced(n, fs=16000, amp=2500.0):
    t = np.arange(n) / fs
    f0 = 120 * (1 + 0.05 * np.sin(2 * np.pi * 3.0 * t))
    ph = 2 * np.pi * np.cumsum(f0) / fs
    w = {1: 0.3, 2: 0.6, 3: 1.0, 4: 1.0, 5: 0.7}
    saw = sum(w.get(k, 1.0 / k) * np.sin(k * ph) for k in range(1, 10))
    env = 0.7 + 0.3 * np.sin(2 * np.pi * 1.5 * t)
    x = saw * env
    return amp * x / np.abs(x).max() + RNG.normal(size=n) * 15.0


def test_loudness_histogram():
    st = amd.init_histogram()
    up = jax.jit(amd.histogram_update)
    for _ in range(120):
        st = up(st, jnp.asarray(1000.0), jnp.asarray(0.9))
    rms = float(amd.histogram_current_rms(st))
    # Mean sits near the bin containing 1000.
    assert 800.0 < rms < 1300.0, rms
    assert int(st.num_updates) == 120
    # Low-probability frames right after a short burst remove the burst.
    st2 = amd.init_histogram()
    for _ in range(3):
        st2 = up(st2, jnp.asarray(500.0), jnp.asarray(0.9))
    st2 = up(st2, jnp.asarray(500.0), jnp.asarray(0.05))
    assert int(st2.audio_content_q10) == 0


def test_volume_rises_for_quiet_speech():
    fs = 16000
    n = 160 * 600
    x = _voiced(n, amp=700.0)  # quiet speech
    st = amd.init_state(1)
    st = amd.set_stream_analog_level(st, 100)
    steps = [
        jax.jit(functools.partial(amd.process, phase=ph)) for ph in range(3)
    ]
    level = 100
    comp = 7
    for k in range(n // 160):
        frame = jnp.asarray(
            np.trunc(x[k * 160 : (k + 1) * 160]), jnp.int32
        )[:, None]
        st = amd.set_stream_analog_level(st, level)
        st, vol, c, vp = steps[k % 3](st, frame)
        level = int(vol)
        comp = int(c)
    assert level > 100, level
    assert 2 <= comp <= 18


def test_volume_drops_for_loud_speech():
    fs = 16000
    n = 160 * 600
    x = _voiced(n, amp=26000.0)
    st = amd.init_state(1)
    st = amd.set_stream_analog_level(st, 220)
    steps = [
        jax.jit(functools.partial(amd.process, phase=ph)) for ph in range(3)
    ]
    level = 220
    for k in range(n // 160):
        frame = jnp.asarray(
            np.trunc(np.clip(x[k * 160 : (k + 1) * 160], -32768, 32767)),
            jnp.int32,
        )[:, None]
        st = amd.set_stream_analog_level(st, level)
        st, vol, c, vp = steps[k % 3](st, frame)
        level = int(vol)
    assert level < 220, level


def test_clipping_drops_volume():
    st = amd.init_state(1)
    st = amd.set_stream_analog_level(st, 200)
    # Establish the stored level via one Process call.
    frame = jnp.zeros((160, 1), jnp.int32)
    st, vol, c, vp = jax.jit(
        functools.partial(amd.process, phase=0)
    )(st, frame)
    clipped = jnp.full((160, 1), 32767.5, jnp.float32)
    st2 = jax.jit(amd.analyze_pre_process)(st, clipped)
    assert int(st2.recommended_input_volume) == 200 - 15
    # Wait window prevents immediate repeat.
    st3 = jax.jit(amd.analyze_pre_process)(st2, clipped)
    assert int(st3.recommended_input_volume) == 200 - 15
