"""Multichannel-render AEC3 end-to-end: dynamic stereo-content detection,
config fallback/reinit, echo reduction with a true multichannel render.

Reference: echo_canceller3.cc:977-1005 (stereo-content reinit),
config_selector.cc (mono vs CreateDefaultMultichannelConfig), the
multichannel default config path of audio_processing_impl.cc:1928-1944.
"""

import numpy as np
import pytest

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.api import AudioProcessing

RNG = np.random.default_rng(19)


def _stereo_far(n, correlated):
    l = RNG.normal(size=n).astype(np.float32) * 0.2
    if correlated:
        return np.stack([l, l], -1)
    r = RNG.normal(size=n).astype(np.float32) * 0.2
    return np.stack([l, r], -1)


@pytest.mark.slow
def test_stereo_content_triggers_multichannel_reinit():
    fs = 16000
    F = fs // 100
    n = fs * 4
    far = _stereo_far(n, correlated=False)
    near = 0.3 * far[:, :1] + RNG.normal(size=(n, 1)).astype(np.float32) * 0.01

    c = cfg_mod.Config().replace(
        pipeline=cfg_mod.Pipeline(multi_channel_render=True),
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
    )
    ap = AudioProcessing(c)
    ap.set_stream_delay_ms(0)

    flipped_at = None
    for k in range(n // F):
        ap.process_reverse_stream(far[k * F:(k + 1) * F], fs)
        err, out = ap.process_stream(near[k * F:(k + 1) * F], fs)
        assert err == 0
        if flipped_at is None and ap._aec3_stereo_active:
            flipped_at = k
    # Default hysteresis is 2 s of continuous stereo content
    # (stereo_detection_hysteresis_seconds).
    assert flipped_at is not None, "proper stereo never detected"
    assert 195 <= flipped_at <= 215, flipped_at
    # After the flip the AEC processes the full render channel count with
    # the multichannel config.
    assert ap._geo.aec3.num_render_channels == 2
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_correlated_render_stays_mono_and_cancels():
    """Mono-ish (identical channels) stereo render: the detector never
    flips; the mono-downmix AEC cancels the echo."""
    fs = 16000
    F = fs // 100
    n = fs * 3
    t = np.arange(n) / fs
    burst = (np.sin(2 * np.pi * 2.0 * t) > -0.3).astype(np.float32)
    far = _stereo_far(n, correlated=True) * burst[:, None]
    near = 0.4 * far[:, :1] + RNG.normal(size=(n, 1)).astype(np.float32) * 0.003

    c = cfg_mod.Config().replace(
        pipeline=cfg_mod.Pipeline(multi_channel_render=True),
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
    )
    ap = AudioProcessing(c)
    ap.set_stream_delay_ms(0)

    outs = []
    for k in range(n // F):
        ap.process_reverse_stream(far[k * F:(k + 1) * F], fs)
        err, out = ap.process_stream(near[k * F:(k + 1) * F], fs)
        assert err == 0
        outs.append(out)
    assert not ap._aec3_stereo_active
    assert ap._geo.aec3.num_render_channels == 1

    out = np.concatenate(outs)
    tail = slice(2 * n // 3, n - F)
    act = np.abs(far[tail, 0]) > 1e-4
    e_in = float(np.mean(near[tail][act] ** 2)) + 1e-12
    e_out = float(np.mean(out[tail][act] ** 2)) + 1e-12
    erle_db = 10 * np.log10(e_in / e_out)
    assert erle_db > 8.0, erle_db


def test_detection_off_uses_multichannel_immediately():
    """detect_stereo_content=False + stereo render: the multichannel config
    is active from the start (ConfigSelector ctor)."""
    import dataclasses as dc

    from webrtc_audio_processing_tpu.models.aec3 import config as aec3_cfg

    fs = 16000
    F = fs // 100
    mono_cfg = aec3_cfg.EchoCanceller3Config()
    custom = mono_cfg.replace(
        multi_channel=dc.replace(
            mono_cfg.multi_channel, detect_stereo_content=False
        )
    )
    c = cfg_mod.Config().replace(
        pipeline=cfg_mod.Pipeline(multi_channel_render=True),
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
    )
    ap = AudioProcessing(c, echo_canceller3_config=custom)
    far = RNG.normal(size=(F, 2)).astype(np.float32) * 0.1
    near = RNG.normal(size=(F, 1)).astype(np.float32) * 0.1
    ap.process_reverse_stream(far, fs)
    err, _ = ap.process_stream(near, fs)
    assert err == 0
    assert ap._geo.aec3.num_render_channels == 2
    assert not ap._geo.aec3_dynamic_stereo
