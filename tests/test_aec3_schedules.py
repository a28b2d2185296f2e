"""AEC3 render/capture call-schedule permutations through the public API.

Mirrors the reference's jitter coverage (tests/unit/aec3/
block_processor_unittest.cc + render_delay_buffer_unittest.cc buffer
over/underrun schedules, and audio_processing_impl locking tests): the
render SwapQueue must absorb bursts, drains on overflow
(audio_processing_impl.cc:1107-1115), and capture must keep producing
finite audio with no render at all (underrun -> delay controller resets,
block_processor.cc:137-156).
"""

import numpy as np
import pytest

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.api import AudioProcessing, kNoError

RNG = np.random.default_rng(5)
FS = 16000
F = FS // 100


def _speechlike(n):
    t = np.arange(n) / FS
    burst = (np.sin(2 * np.pi * 2.9 * t) > -0.4).astype(np.float64)
    return RNG.normal(size=n) * 0.25 * burst


def _make_apm():
    c = cfg_mod.Config().replace(
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
    )
    ap = AudioProcessing(c)
    ap.set_stream_delay_ms(0)
    return ap


def _run_schedule(schedule, seconds=3):
    """schedule(k) -> how many render frames to push before capture k."""
    n = FS * seconds
    far = _speechlike(n)
    near = 0.5 * far + 0.2 * np.roll(far, 1)
    ap = _make_apm()
    outs = []
    ri = 0
    for k in range(n // F):
        for _ in range(schedule(k)):
            if ri < n // F:
                err, _ = ap.process_reverse_stream(
                    far[ri * F:(ri + 1) * F], FS)
                assert err == kNoError
                ri += 1
        err, out = ap.process_stream(near[k * F:(k + 1) * F], FS)
        assert err == kNoError
        outs.append(out[:, 0])
    out = np.concatenate(outs)
    assert np.all(np.isfinite(out))
    return far, near, out


def _erle_db(far, near, out):
    tail = slice(2 * len(far) // 3, len(far) - F)
    act = np.abs(far[tail]) > 1e-4
    e_in = float(np.mean(near[tail][act] ** 2)) + 1e-12
    e_out = float(np.mean(out[tail][act] ** 2)) + 1e-12
    return 10 * np.log10(e_in / e_out)


class TestRenderCaptureSchedules:
    def test_steady_one_to_one(self):
        far, near, out = _run_schedule(lambda k: 1)
        assert _erle_db(far, near, out) > 6.0

    @pytest.mark.parametrize("burst", [2, 5, 10])
    def test_render_bursts(self, burst):
        # Renders arrive in bursts of `burst`; captures still consume one
        # frame per call from the queue, so alignment is preserved.
        far, near, out = _run_schedule(
            lambda k: burst if k % burst == 0 else 0)
        assert _erle_db(far, near, out) > 6.0

    def test_render_one_frame_late(self):
        # Render k arrives after capture k (1-frame jitter); the delay
        # estimator must still converge.
        far, near, out = _run_schedule(lambda k: 0 if k == 0 else 1)
        assert _erle_db(far, near, out) > 3.0

    def test_capture_only_underrun(self):
        # No render at all: output must stay finite and the nearend must
        # pass through (no echo reference -> no suppression of nearend).
        n = FS * 2
        near = _speechlike(n)
        ap = _make_apm()
        outs = []
        for k in range(n // F):
            err, out = ap.process_stream(near[k * F:(k + 1) * F], FS)
            assert err == kNoError
            outs.append(out[:, 0])
        out = np.concatenate(outs)
        assert np.all(np.isfinite(out))
        tail = slice(FS, n - F)
        assert np.mean(out[tail] ** 2) > 0.05 * np.mean(near[tail] ** 2)

    def test_underrun_then_recover(self):
        # 50 captures with no render, then steady pairing: the canceller
        # must recover and converge on the tail.
        far, near, out = _run_schedule(
            lambda k: 0 if k < 50 else (51 if k == 50 else 1), seconds=4)
        assert _erle_db(far, near, out) > 3.0

    def test_render_overrun_drain(self):
        # Push far more render than the 100-frame SwapQueue capacity in one
        # burst; the oldest frames are dropped synchronously and processing
        # continues (audio_processing_impl.cc:1107-1115).
        n = FS * 3
        far = _speechlike(n)
        near = 0.5 * far + 0.2 * np.roll(far, 1)
        ap = _make_apm()
        for r in range(150):  # > RENDER_QUEUE_SIZE_FRAMES
            err, _ = ap.process_reverse_stream(far[r * F:(r + 1) * F], FS)
            assert err == kNoError
        outs = []
        for k in range(n // F):
            err, out = ap.process_stream(near[k * F:(k + 1) * F], FS)
            assert err == kNoError
            if k >= 150:
                err, _ = ap.process_reverse_stream(
                    far[k * F:(k + 1) * F], FS)
                assert err == kNoError
            outs.append(out[:, 0])
        out = np.concatenate(outs)
        assert np.all(np.isfinite(out))

    def test_alternating_rate_of_two(self):
        # Two renders for every capture (clock mismatch): queue keeps the
        # freshest 100 frames; output stays finite.
        far, near, out = _run_schedule(lambda k: 2, seconds=2)
        assert np.all(np.isfinite(out))


class TestScheduleDeterminism:
    def test_same_schedule_is_deterministic(self):
        outs = []
        for _ in range(2):
            global RNG
            RNG = np.random.default_rng(5)
            far, near, out = _run_schedule(lambda k: 1, seconds=1)
            outs.append(out)
        np.testing.assert_array_equal(outs[0], outs[1])
