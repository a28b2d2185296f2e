"""AECM through the full APM pipeline (mobile_mode=True)."""

import numpy as np

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.api import AudioProcessing

RNG = np.random.default_rng(11)


def _speechlike_far(n, fs):
    t = np.arange(n) / fs
    burst = (np.sin(2 * np.pi * 2.7 * t) > -0.3).astype(np.float64)
    level = 0.08 + 0.92 * np.abs(np.sin(2 * np.pi * 0.31 * t))
    return RNG.normal(size=n) * 0.28 * burst * level


def test_mobile_mode_suppresses_echo_16k():
    fs = 16000
    c = cfg_mod.Config().replace(
        echo_canceller=cfg_mod.EchoCanceller(enabled=True, mobile_mode=True)
    )
    ap = AudioProcessing(c)
    ap.set_stream_delay_ms(0)

    n = fs * 6
    far = _speechlike_far(n, fs)
    near = 0.5 * far + 0.2 * np.roll(far, 1) + 0.1 * np.roll(far, 2)

    F = fs // 100
    outs = []
    for k in range(n // F):
        ap.process_reverse_stream(far[k * F : (k + 1) * F], fs)
        err, out = ap.process_stream(near[k * F : (k + 1) * F], fs)
        assert err == 0
        outs.append(out[:, 0])
    out = np.concatenate(outs)

    tail = slice(2 * n // 3, n - F)
    active = np.abs(far[tail]) > 1e-4
    e_in = float(np.mean(near[tail][active] ** 2)) + 1e-12
    e_out = float(np.mean(out[tail][active] ** 2)) + 1e-12
    erle_db = 10 * np.log10(e_in / e_out)
    assert erle_db > 8.0, erle_db


def test_mobile_mode_zeroes_upper_band_32k():
    # At 32 kHz the APM splits bands and AECM zeroes bands >= 1
    # (echo_control_mobile_impl.cc:219-224): a pure 10 kHz tone in the
    # upper band must vanish from the output.
    fs = 32000
    c = cfg_mod.Config().replace(
        echo_canceller=cfg_mod.EchoCanceller(enabled=True, mobile_mode=True)
    )
    ap = AudioProcessing(c)

    n = fs  # 1 s
    t = np.arange(n) / fs
    near = 0.3 * np.sin(2 * np.pi * 10000 * t)
    far = np.zeros(n)

    F = fs // 100
    outs = []
    for k in range(n // F):
        ap.process_reverse_stream(far[k * F : (k + 1) * F], fs)
        err, out = ap.process_stream(near[k * F : (k + 1) * F], fs)
        assert err == 0
        outs.append(out[:, 0])
    out = np.concatenate(outs)
    # Skip the filterbank transient.
    e_out = float(np.mean(out[fs // 2 :] ** 2))
    e_in = float(np.mean(near[fs // 2 :] ** 2))
    assert e_out < 0.01 * e_in, (e_out, e_in)
