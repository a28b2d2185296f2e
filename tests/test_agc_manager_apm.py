"""Hybrid analog AGC (AgcManagerDirect) through the full APM."""

import numpy as np

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.api import AudioProcessing

RNG = np.random.default_rng(31)


def _voiced(n, fs, amp):
    t = np.arange(n) / fs
    f0 = 120 * (1 + 0.05 * np.sin(2 * np.pi * 3.0 * t))
    ph = 2 * np.pi * np.cumsum(f0) / fs
    w = {1: 0.3, 2: 0.6, 3: 1.0, 4: 1.0, 5: 0.7}
    saw = sum(w.get(k, 1.0 / k) * np.sin(k * ph) for k in range(1, 10))
    env = 0.7 + 0.3 * np.sin(2 * np.pi * 1.5 * t)
    x = saw * env
    return amp * x / np.abs(x).max()


def test_hybrid_agc_raises_volume_and_applies_gain():
    fs = 16000
    c = cfg_mod.Config().replace(
        gain_controller1=cfg_mod.GainController1(enabled=True)
    )
    ap = AudioProcessing(c)
    assert ap._geo is None

    n = fs * 7
    x = _voiced(n, fs, amp=0.02)  # quiet speech (~-34 dBFS peak)
    F = fs // 100
    level = 100
    outs = []
    for k in range(n // F):
        ap.set_stream_analog_level(level)
        err, out = ap.process_stream(x[k * F : (k + 1) * F], fs)
        assert err == 0
        outs.append(out[:, 0])
        level = ap.recommended_stream_analog_level()
    out = np.concatenate(outs)

    assert level > 100, level
    # The fixed-digital compressor applies positive gain (default 7 dB
    # slewing from the initial compression).
    tail = slice(3 * n // 4, n - F)
    g_db = 10 * np.log10(
        np.mean(out[tail] ** 2) / np.mean(x[tail] ** 2)
    )
    assert g_db > 2.0, g_db
