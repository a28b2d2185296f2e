"""End-to-end AEC3: echo cancellation on synthetic scenes (mono 16 kHz)."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aec3 import (
    config as aec3_config,
    echo_canceller3 as ec3,
)

RNG = np.random.default_rng(11)
F = np.float32


_CACHE = {}


def _get_steps(rate):
    # One compiled parity pair shared by all tests (compiles dominate CI time).
    if rate not in _CACHE:
        cfg = aec3_config.EchoCanceller3Config()
        geo = ec3.Aec3Geometry.create(cfg, rate, 1, 1)
        steps = [
            jax.jit(lambda s, r, y, n0: ec3.process_frame(geo, s, r, y, 0,
                                                          n0=n0)),
            jax.jit(lambda s, r, y, n0: ec3.process_frame(geo, s, r, y, 1,
                                                          n0=n0)),
        ]
        _CACHE[rate] = (geo, steps)
    return _CACHE[rate]


def run_aec3(far, near, rate=16000, frames=None):
    geo, steps = _get_steps(rate)
    state = ec3.init_state(geo)
    n = frames or len(far) // 160
    outs = []
    for f in range(n):
        r = jnp.asarray(far[f * 160 : (f + 1) * 160])[None, :, None]
        y = jnp.asarray(near[f * 160 : (f + 1) * 160])[None, :, None]
        n0 = 5 * (f // 2) + 2 * (f % 2)
        state, out, linear = steps[f % 2](state, r, y,
                                          jnp.asarray(n0, jnp.int32))
        outs.append(np.asarray(out[0, :, 0]))
    return np.concatenate(outs), state, geo


def test_cancels_pure_echo():
    n_frames = 400
    n = n_frames * 160
    far = (RNG.standard_normal(n + 2000) * 2000).astype(F)
    # Echo: 6 ms delay, 0.4 gain plus a small tail.
    h = np.zeros(400, F)
    h[100] = 0.4
    h[130] = -0.15
    h[220] = 0.05
    near = np.convolve(far, h)[: n + 2000].astype(F)

    out, state, geo = run_aec3(far[: n], near[: n], frames=n_frames)

    # Measure suppression over the last second vs the echo level.
    echo_in = near[(n_frames - 100) * 160 : n_frames * 160]
    echo_out = out[(n_frames - 100) * 160 :]
    erle = 10 * np.log10(
        np.mean(echo_in**2) / max(np.mean(echo_out**2), 1e-10)
    )
    assert erle > 20.0, f"echo suppression only {erle:.1f} dB"


def test_preserves_nearend_speech():
    n_frames = 400
    n = n_frames * 160
    t = np.arange(n) / 16000.0
    far = (RNG.standard_normal(n) * 1500).astype(F)
    h = np.zeros(300, F)
    h[96] = 0.3
    echo = np.convolve(far, h)[:n].astype(F)
    # Near-end speech-ish: AM tone bursts, clearly not correlated with far.
    nearend = (
        3000.0 * np.sin(2 * np.pi * 300 * t) * (np.sin(2 * np.pi * 1.5 * t) > 0.3)
    ).astype(F)
    near = echo + nearend

    out, state, geo = run_aec3(far, near, frames=n_frames)
    tail = slice((n_frames - 150) * 160, None)
    # The near-end component should survive: compare output power against
    # the nearend power in active regions.
    active = np.abs(nearend[tail]) > 500
    kept = np.mean(out[tail][active] ** 2) / np.mean(nearend[tail][active] ** 2)
    assert kept > 0.25, f"nearend kept ratio {kept:.3f}"


def test_metrics_report():
    n_frames = 150
    n = n_frames * 160
    far = (RNG.standard_normal(n) * 2000).astype(F)
    near = 0.3 * np.roll(far, 640)
    out, state, geo = run_aec3(far, near, frames=n_frames)
    m = ec3.get_metrics(geo, state)
    assert np.isfinite(float(m["echo_return_loss"]))
    assert np.isfinite(float(m["echo_return_loss_enhancement"]))
