"""Input volume controller through the full APM (AGC2 path)."""

import numpy as np

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.api import AudioProcessing

RNG = np.random.default_rng(21)


def _speech(n, fs, amp):
    # Voiced-speech-like: pitch vibrato sawtooth with slow amplitude
    # modulation; drives the RNN VAD above the 0.95 confidence threshold
    # (agc2_common.h kVadConfidenceThreshold) like real voiced speech.
    t = np.arange(n) / fs
    f0 = 120 * (1 + 0.06 * np.sin(2 * np.pi * 3.1 * t))
    phase = 2 * np.pi * np.cumsum(f0) / fs
    saw = sum((1.0 / k) * np.sin(k * phase) for k in range(1, 12))
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 1.7 * t)
    x = saw * env
    return amp * x / np.abs(x).max()


def _make_apm():
    c = cfg_mod.Config().replace(
        gain_controller2=cfg_mod.GainController2(
            enabled=True,
            input_volume_controller=cfg_mod.InputVolumeController(
                enabled=True
            ),
            adaptive_digital=cfg_mod.AdaptiveDigital(enabled=True),
        )
    )
    return AudioProcessing(c)


def test_recommends_higher_volume_for_quiet_speech():
    fs = 16000
    ap = _make_apm()
    n = fs * 8
    x = _speech(n, fs, amp=0.003)  # ~-50 dBFS speech: below target range
    F = fs // 100
    level = 80
    for k in range(n // F):
        ap.set_stream_analog_level(level)
        err, _ = ap.process_stream(x[k * F : (k + 1) * F], fs)
        assert err == 0
        level = ap.recommended_stream_analog_level()
    assert level > 80, level


def test_recommends_lower_volume_for_loud_speech():
    fs = 16000
    ap = _make_apm()
    n = fs * 8
    x = _speech(n, fs, amp=0.5)  # ~-6 dBFS speech: above target range
    F = fs // 100
    level = 200
    for k in range(n // F):
        ap.set_stream_analog_level(level)
        err, _ = ap.process_stream(x[k * F : (k + 1) * F], fs)
        level = ap.recommended_stream_analog_level()
    assert level < 200, level
