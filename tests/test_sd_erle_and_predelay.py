"""SignalDependentErleEstimator + BlockDelayBuffer tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aec3 import (
    echo_canceller3 as ec3,
    signal_dependent_erle as sde,
)
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config


def _oracle_boundaries(headroom, num_blocks, num_sections):
    """Direct transliteration of SetSectionsBoundaries for cross-checking."""
    bounds = [0] * (num_sections + 1)
    if len(bounds) == 2:
        return [0, num_blocks]
    sizes = []
    remaining_blocks = num_blocks - headroom
    remaining_sections, est = num_sections, 2
    while remaining_sections > 1 and remaining_blocks > est * remaining_sections:
        sizes.append(est)
        remaining_blocks -= est
        remaining_sections -= 1
        est *= 2
    last = remaining_blocks // remaining_sections
    while len(sizes) < num_sections:
        sizes.append(last)
    sizes[-1] += remaining_blocks - last * remaining_sections
    idx, cur = 0, 0
    bounds[0] = headroom
    for k in range(headroom, num_blocks):
        cur += 1
        if cur >= sizes[idx]:
            idx += 1
            if idx == len(sizes):
                break
            bounds[idx] = k + 1
            cur = 0
    bounds[len(sizes)] = num_blocks
    return bounds


def test_section_boundaries_match_oracle():
    for headroom, blocks, sections in [(5, 13, 2), (5, 13, 3), (2, 20, 4),
                                       (0, 30, 5), (5, 13, 1)]:
        got = sde.section_boundaries(headroom, blocks, sections)
        want = _oracle_boundaries(headroom, blocks, sections)
        assert got == want, (headroom, blocks, sections, got, want)
        assert got[-1] == blocks


def test_subband_map():
    m = sde.form_subband_map()
    assert len(m) == 65
    assert m[0] == 0 and m[1] == 0 and m[7] == 0
    assert m[8] == 1 and m[47] == 4 and m[48] == 5 and m[64] == 5


def test_active_sections_pick_energy_concentration():
    cfg = EchoCanceller3Config()
    cfg = dataclasses.replace(cfg, erle=dataclasses.replace(
        cfg.erle, num_sections=3))
    st = sde.init_state(cfg, 1)
    nb = cfg.filter.refined.length_blocks
    # All render energy and filter response in the first section: a single
    # section captures 90% of the echo estimate -> n_active == 0.
    X2 = np.zeros((nb, 65), np.float32)
    X2[: cfg.delay.delay_headroom_samples // 64 + 2] = 1.0
    H2 = np.zeros((1, nb, 65), np.float32)
    H2[:, : cfg.delay.delay_headroom_samples // 64 + 2] = 1.0
    st2, _ = sde._active_sections(cfg, st, jnp.asarray(X2), jnp.asarray(H2))
    assert int(jnp.max(st2.n_active_sections)) == 0
    # Energy spread to the deep tail forces the last section in.
    X2[:] = 1.0
    H2[:] = 0.0
    H2[:, -2:] = 10.0
    st3, _ = sde._active_sections(cfg, st, jnp.asarray(X2), jnp.asarray(H2))
    assert int(jnp.min(st3.n_active_sections)) == 2


def test_aec3_with_signal_dependent_erle_converges():
    cfg = EchoCanceller3Config()
    cfg = dataclasses.replace(cfg, erle=dataclasses.replace(
        cfg.erle, num_sections=3))
    geo = ec3.Aec3Geometry.create(cfg, 16000, 1, 1)
    state = ec3.init_state(geo)

    steps = [
        jax.jit(
            lambda s, r, c, n0, p=p: ec3.process_frame(geo, s, r, c, p,
                                                       n0=n0),
            static_argnames=(),
        )
        for p in (0, 1)
    ]
    rng = np.random.default_rng(7)
    echo_tail = np.zeros(3, np.float32)
    h = np.asarray([0.6, -0.3, 0.1], np.float32)
    nears, outs = [], []
    far_hist = np.zeros(480, np.float32)
    for k in range(700):
        far = (rng.normal(size=160) * 2000).astype(np.float32)
        far_hist = np.concatenate([far_hist[160:], far])
        echo = np.convolve(far_hist, h)[320:480]
        near = echo.astype(np.float32)
        state, out, _ = steps[k % 2](
            state, jnp.asarray(far, jnp.float32)[None, :, None],
            jnp.asarray(near, jnp.float32)[None, :, None],
            jnp.asarray(5 * (k // 2) + 2 * (k % 2), jnp.int32),
        )
        nears.append(near)
        outs.append(np.asarray(out)[0, :, 0])
    near_t = np.concatenate(nears)[-16000:]
    out_t = np.concatenate(outs)[-16000:]
    erle = 10 * np.log10(
        (np.mean(near_t**2) + 1e-9) / (np.mean(out_t**2) + 1e-9)
    )
    assert erle > 15.0, erle
    # The signal-dependent state must actually have adapted.
    assert int(jnp.max(state.remover.aec.erle.sd.num_updates)) > 0


def test_fixed_capture_predelay_shifts_output():
    def run(delay_samples):
        cfg = EchoCanceller3Config()
        cfg = dataclasses.replace(cfg, delay=dataclasses.replace(
            cfg.delay, fixed_capture_delay_samples=delay_samples))
        geo = ec3.Aec3Geometry.create(cfg, 16000, 1, 1)
        state = ec3.init_state(geo)
        steps = [
            jax.jit(lambda s, r, c, n0, p=p: ec3.process_frame(geo, s, r, c,
                                                               p, n0=n0))
            for p in (0, 1)
        ]
        outs = []
        for k in range(8):
            far = np.zeros(160, np.float32)
            near = np.zeros(160, np.float32)
            if k == 4:
                near[10] = 8000.0
            state, out, _ = steps[k % 2](
                state, jnp.asarray(far)[None, :, None],
                jnp.asarray(near)[None, :, None],
                jnp.asarray(5 * (k // 2) + 2 * (k % 2), jnp.int32),
            )
            outs.append(np.asarray(out)[0, :, 0])
        return np.concatenate(outs)

    base = run(0)
    delayed = run(64)
    assert np.argmax(np.abs(delayed)) - np.argmax(np.abs(base)) == 64
