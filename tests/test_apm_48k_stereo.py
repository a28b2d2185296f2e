"""Full APM at 48 kHz stereo: 3-band split + multichannel AEC3 + NS + AGC2.

The BASELINE ladder's top rung: stereo 48 kHz full APM (3-band QMF +
multichannel AEC3).
"""

import numpy as np
import pytest

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.api import AudioProcessing

RNG = np.random.default_rng(41)


@pytest.mark.slow
def test_48k_stereo_full_apm_cancels_echo():
    fs = 48000
    F = fs // 100
    n = fs * 3

    t = np.arange(n) / fs
    burst = (np.sin(2 * np.pi * 2.3 * t) > -0.2).astype(np.float64)
    level = 0.15 + 0.85 * np.abs(np.sin(2 * np.pi * 0.4 * t))
    far_l = RNG.normal(size=n) * 0.2 * burst * level
    far_r = far_l  # mono-ish content downmixed render (common case)
    echo_l = 0.4 * far_l + 0.15 * np.roll(far_l, 5)
    echo_r = 0.35 * far_r + 0.12 * np.roll(far_r, 9)
    near = np.stack([echo_l, echo_r], axis=-1)
    far = np.stack([far_l, far_r], axis=-1)

    c = cfg_mod.Config().replace(
        pipeline=cfg_mod.Pipeline(multi_channel_capture=True,
                                  multi_channel_render=False),
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
        gain_controller2=cfg_mod.GainController2(enabled=True),
    )
    ap = AudioProcessing(c)
    ap.set_stream_delay_ms(0)

    outs = []
    for k in range(n // F):
        ap.process_reverse_stream(far[k * F : (k + 1) * F], fs)
        err, out = ap.process_stream(near[k * F : (k + 1) * F], fs)
        assert err == 0
        assert out.shape == (F, 2)
        outs.append(out)
    out = np.concatenate(outs)

    tail = slice(2 * n // 3, n - F)
    act = np.abs(far_l[tail]) > 1e-4
    e_in = float(np.mean(near[tail][act] ** 2)) + 1e-12
    e_out = float(np.mean(out[tail][act] ** 2)) + 1e-12
    erle_db = 10 * np.log10(e_in / e_out)
    assert erle_db > 6.0, erle_db
    assert np.isfinite(out).all()
