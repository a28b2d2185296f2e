"""AGC2 InputVolumeController behavioral tests."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.agc2 import (
    input_volume_controller as ivc,
)


def test_gain_map_matches_reference_table():
    # First 15 entries of kGainMap (gain_map_internal.h:25).
    expected = [-56, -54, -52, -50, -48, -47, -45, -43, -42, -40, -38, -37,
                -35, -34, -33]
    assert list(ivc.GAIN_MAP[:15]) == expected
    assert ivc.GAIN_MAP[255] == 64
    assert ivc.GAIN_MAP[128] == 31


def test_compute_volume_update():
    # Positive error walks up the gain map until the gain gap is covered.
    up = int(ivc.compute_volume_update(
        jnp.asarray(6), jnp.asarray(100), 20))
    assert ivc.GAIN_MAP[up] - ivc.GAIN_MAP[100] >= 6
    assert ivc.GAIN_MAP[up - 1] - ivc.GAIN_MAP[100] < 6
    # Negative error walks down.
    down = int(ivc.compute_volume_update(
        jnp.asarray(-6), jnp.asarray(100), 20))
    assert ivc.GAIN_MAP[down] - ivc.GAIN_MAP[100] <= -6
    # Zero error: unchanged.
    assert int(ivc.compute_volume_update(
        jnp.asarray(0), jnp.asarray(100), 20)) == 100
    # Floors at min_input_volume.
    assert int(ivc.compute_volume_update(
        jnp.asarray(-100), jnp.asarray(30), 20)) == 20


def _run(cfg, frames, applied_volume, speech_level, speech_prob,
         audio_peak=1000.0):
    st = ivc.init_state(cfg, 1)
    audio = jnp.full((160, 1), audio_peak, jnp.float32)

    @jax.jit
    def step(st, vol):
        st = ivc.analyze_input_audio(cfg, st, vol, audio)
        st, rec, valid = ivc.recommend_input_volume(
            cfg, st, jnp.asarray(speech_prob, jnp.float32),
            jnp.asarray(speech_level, jnp.float32), jnp.asarray(True),
        )
        return st, rec

    vol = applied_volume
    for _ in range(frames):
        st, rec = step(st, jnp.asarray(vol, jnp.int32))
        vol = int(rec)
    return vol


def test_raises_volume_when_speech_too_quiet():
    cfg = ivc.InputVolumeControllerConfig(enable_clipping_predictor=False)
    # Speech at -60 dBFS, below [-50, -30] target range -> volume goes up.
    vol = _run(cfg, frames=250, applied_volume=100, speech_level=-60.0,
               speech_prob=0.9)
    assert vol > 100, vol


def test_lowers_volume_when_speech_too_loud():
    cfg = ivc.InputVolumeControllerConfig(enable_clipping_predictor=False)
    vol = _run(cfg, frames=250, applied_volume=200, speech_level=-10.0,
               speech_prob=0.9)
    assert vol < 200, vol


def test_no_update_without_speech():
    cfg = ivc.InputVolumeControllerConfig(enable_clipping_predictor=False)
    vol = _run(cfg, frames=250, applied_volume=100, speech_level=-60.0,
               speech_prob=0.0)
    assert vol == 100, vol


def test_clipping_drops_volume():
    cfg = ivc.InputVolumeControllerConfig(enable_clipping_predictor=False)
    st = ivc.init_state(cfg, 1)

    @jax.jit
    def step(st, vol, audio):
        st = ivc.analyze_input_audio(cfg, st, vol, audio)
        st, rec, _ = ivc.recommend_input_volume(
            cfg, st, jnp.asarray(0.0), jnp.asarray(-40.0), jnp.asarray(True)
        )
        return st, rec

    quiet = jnp.full((160, 1), 1000.0, jnp.float32)
    clipped = jnp.full((160, 1), 32767.5, jnp.float32)
    # Establish the stored volume first (the reference takes no clipping
    # action before the first Process sets last_recommended, :239-249).
    st, rec = step(st, jnp.asarray(200, jnp.int32), quiet)
    assert int(rec) == 200
    st, rec = step(st, rec, clipped)
    assert int(rec) == 200 - cfg.clipped_level_step
    # Within the wait window no further drop happens.
    st, rec2 = step(st, rec, clipped)
    assert int(rec2) == int(rec)


def test_min_volume_enforced():
    cfg = ivc.InputVolumeControllerConfig(enable_clipping_predictor=False)
    vol = _run(cfg, frames=10, applied_volume=5, speech_level=-40.0,
               speech_prob=0.9)
    assert vol >= cfg.min_input_volume
