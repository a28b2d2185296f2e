"""RenderDelayBuffer behavioral invariants, ported from the reference's
tests/unit/aec3/render_delay_buffer_unittest.cc:

- BufferOverflow (:36): sustained render inserts without capture-side
  consumption must eventually report an overrun event.
- AvailableBlock (:63): an inserted block survives the ring round-trip and
  PrepareCaptureProcessing (content-checked here, stronger than the
  reference's no-crash assertion).
- AlignFromDelay (:76): after AlignFromDelay(delay), Delay() == delay for
  a range of delays.

Plus the suppression-gain sanity port from suppression_gain_unittest.cc:71
(BasicGainComputation): noise-masked and strong-nearend conditions give
unity gain; a strong echo on one channel forces ~zero gain on all (gains
are a min across capture channels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.models.aec3 import (
    config as aec3_config,
    echo_remover as er,
    render_buffer as rb,
)

F = np.float32


def _mk(geo):
    cfg = aec3_config.EchoCanceller3Config()
    return cfg, rb.init_state(geo, cfg)


@pytest.mark.parametrize("num_channels", [1, 2])
@pytest.mark.parametrize("rate", [16000, 48000])
def test_buffer_overflow(rate, num_channels):
    cfg = aec3_config.EchoCanceller3Config()
    geo = rb.BufferGeometry.create(cfg, rate, num_channels)
    buf = rb.init_state(geo, cfg)
    bands = rate // 16000
    block = jnp.zeros((bands, 64, num_channels))

    @jax.jit
    def ins(buf, n):
        return rb.insert(geo, cfg, buf, block, n)

    events = []
    for k in range(10):
        buf, ev = ins(buf, jnp.asarray(k + 1, jnp.int32))
        events.append(int(ev))
    assert all(e == rb.EVENT_NONE for e in events), events

    overrun_occurred = False
    for k in range(10, geo.num_blocks + 20):
        buf, ev = ins(buf, jnp.asarray(k + 1, jnp.int32))
        overrun_occurred = overrun_occurred or int(ev) == rb.EVENT_RENDER_OVERRUN
    assert overrun_occurred


def test_available_block_round_trips():
    """Insert + PrepareCaptureProcessing round-trip: the aligned read block
    tracks the write side at a constant delay distance and reproduces the
    inserted content exactly (content check — stronger than the
    reference's no-crash assertion)."""
    cfg = aec3_config.EchoCanceller3Config()
    geo = rb.BufferGeometry.create(cfg, 48000, 1)
    buf = rb.init_state(geo, cfg)

    @jax.jit
    def step(buf, val, n):
        block = jnp.full((3, 64, 1), val)
        buf, ev = rb.insert(geo, cfg, buf, block, n)
        buf, ev2, _ = rb.prepare_capture_processing(geo, cfg, buf)
        view = rb.RenderView(buf, n)
        return buf, ev, rb.block_at(geo, view)

    offsets = []
    for k in range(1, 25):
        buf, ev, got = step(buf, float(k), jnp.asarray(k, jnp.int32))
        assert int(ev) == rb.EVENT_NONE
        got = np.asarray(got)
        assert (got == got.flat[0]).all()  # one whole block, un-torn
        if got.flat[0] > 0:
            offsets.append(k - int(got.flat[0]))
    # The read must have reached real content and track at a constant lag.
    assert offsets and len(set(offsets)) == 1, offsets


def test_align_from_delay():
    cfg = aec3_config.EchoCanceller3Config()
    geo = rb.BufferGeometry.create(cfg, 16000, 1)
    buf = rb.init_state(geo, cfg)
    for delay in range(20):
        buf2, changed = rb.align_from_delay(
            geo, cfg, buf, jnp.asarray(delay, jnp.int32))
        assert int(rb.compute_delay(geo, buf2)) == delay, delay
        # Re-aligning to the same delay is a no-op.
        buf3, changed2 = rb.align_from_delay(
            geo, cfg, buf2, jnp.asarray(delay, jnp.int32))
        assert not bool(changed2)
        assert int(rb.compute_delay(geo, buf3)) == delay


class TestSuppressionGainBasic:
    """suppression_gain_unittest.cc:71 BasicGainComputation."""

    C = 2

    def _drive(self, nearend, echo, r2, n2, iters, state=None):
        cfg = aec3_config.EchoCanceller3Config()
        if state is None:
            state = er.init_suppression_gain(cfg, self.C)
            state = er.set_initial_state(cfg, state, jnp.asarray(False))
        ones = np.ones((self.C, 65), F)
        args = dict(
            nearend_spectrum=jnp.asarray(nearend * ones),
            echo_spectrum=jnp.asarray(echo * ones),
            R2=jnp.asarray(r2 * ones),
            R2_unbounded=jnp.asarray(r2 * ones),
            comfort_noise_spectrum=jnp.asarray(n2 * ones),
        )

        @jax.jit
        def step(st):
            return er.suppression_gain_compute(
                cfg, st, args["nearend_spectrum"], args["echo_spectrum"],
                args["R2"], args["R2_unbounded"],
                args["comfort_noise_spectrum"],
                jnp.asarray(-1, jnp.int32), jnp.asarray(False),
                jnp.zeros((1, 64, 1)), False,
            )

        for _ in range(iters):
            state, g, _hi = step(state)
        return state, np.asarray(g)

    def test_noise_masks_echo_unity_gain(self):
        _, g = self._drive(nearend=10.0, echo=0.1, r2=0.1, n2=100.0,
                           iters=100)
        np.testing.assert_allclose(g, 1.0, atol=1e-3)

    def test_strong_nearend_unity_gain(self):
        _, g = self._drive(nearend=100.0, echo=0.1, r2=0.1, n2=0.0,
                           iters=100)
        np.testing.assert_allclose(g, 1.0, atol=1e-3)

    def test_strong_echo_on_one_channel_suppresses_all(self):
        cfg = aec3_config.EchoCanceller3Config()
        state = er.init_suppression_gain(cfg, self.C)
        state = er.set_initial_state(cfg, state, jnp.asarray(False))
        ne = np.full((self.C, 65), 100.0, F)
        r2 = np.full((self.C, 65), 0.1, F)
        ne[1] = 1e9
        r2[1] = 1e13

        @jax.jit
        def step(st):
            return er.suppression_gain_compute(
                cfg, st, jnp.asarray(ne), jnp.asarray(0.1 * np.ones_like(ne)),
                jnp.asarray(r2), jnp.asarray(r2),
                jnp.zeros((self.C, 65)),
                jnp.asarray(-1, jnp.int32), jnp.asarray(False),
                jnp.zeros((1, 64, 1)), False,
            )

        for _ in range(10):
            state, g, _hi = step(state)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-3)
