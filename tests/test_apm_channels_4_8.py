"""4x4 and the reference-max 8x8 channel geometries trace and process.

The reference supports up to 8 render and 8 capture channels
(aec3/aec3_common.h:35-55); EchoControlMobileImpl sizes its canceller
array as capture x render (echo_control_mobile_impl.cc:158-162). No
conformance vectors exist at these widths, so these are
geometry/e2e-sanity gates: the pipelines must compile, run, produce
finite output of the right shape, and keep per-channel identity where
the reference guarantees it (identical input channels -> identical
output channels).
"""

import numpy as np
import pytest

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.api import AudioProcessing, kNoError

RNG = np.random.default_rng(9)


def _run(c, rate, n_ch, n_rev, frames=6):
    ap = AudioProcessing(c)
    F = rate // 100
    outs = []
    for k in range(frames):
        far = (RNG.normal(size=(F, n_rev)) * 0.1).astype(np.float32)
        near = (RNG.normal(size=(F, n_ch)) * 0.1).astype(np.float32)
        err, _ = ap.process_reverse_stream(far, rate)
        assert err == kNoError
        ap.set_stream_delay_ms(0)
        err, out = ap.process_stream(near, rate)
        assert err == kNoError
        outs.append(out)
    out = np.concatenate(outs)
    assert out.shape == (frames * F, n_ch)
    assert np.all(np.isfinite(out))
    return ap, out


@pytest.mark.parametrize(
    "n", [4, pytest.param(8, marks=pytest.mark.slow)])
def test_aec3_multichannel_geometry(n):
    c = cfg_mod.Config().replace(
        pipeline=cfg_mod.Pipeline(multi_channel_capture=True,
                                  multi_channel_render=True),
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
        high_pass_filter=cfg_mod.HighPassFilter(enabled=True),
    )
    _run(c, 16000, n, n)


@pytest.mark.parametrize(
    "n", [4, pytest.param(8, marks=pytest.mark.slow)])
def test_aecm_multichannel_cascade(n):
    # n capture x n render cancellers (echo_control_mobile_impl.cc:158-162)
    # with the render channels processed one cascade stage each.
    c = cfg_mod.Config().replace(
        pipeline=cfg_mod.Pipeline(multi_channel_capture=True,
                                  multi_channel_render=True),
        echo_canceller=cfg_mod.EchoCanceller(enabled=True, mobile_mode=True),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
    )
    ap, _ = _run(c, 16000, n, n)
    a = ap._state.aecm
    assert a.ec_startup.shape == (n * n,)


def test_identical_channels_invariance_4ch():
    """IdenticalInputChannelsResultInIdenticalOutputChannels at 4 capture
    channels (audio_processing_unittest.cc) — float-rounding tolerance as
    in test_api_contract.TestIdenticalChannelInvariance."""
    c = cfg_mod.Config().replace(
        pipeline=cfg_mod.Pipeline(multi_channel_capture=True),
        high_pass_filter=cfg_mod.HighPassFilter(enabled=True),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
    )
    ap = AudioProcessing(c)
    F = 160
    for k in range(10):
        mono = RNG.normal(size=(F, 1)).astype(np.float32) * 0.1
        x = np.repeat(mono, 4, axis=1)
        err, out = ap.process_stream(x, 16000)
        assert err == kNoError
        for ch in range(1, 4):
            np.testing.assert_allclose(out[:, 0], out[:, ch], rtol=0,
                                       atol=2e-5)
