"""AecDump record/replay: bit-exact round trip through the APM."""

import os
import tempfile

import numpy as np

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.api import AudioProcessing
from webrtc_audio_processing_tpu.utils import aec_dump

RNG = np.random.default_rng(37)


def test_record_and_replay_bit_exact():
    fs = 16000
    F = fs // 100
    n_frames = 30
    c = cfg_mod.Config().replace(
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
        high_pass_filter=cfg_mod.HighPassFilter(enabled=True),
    )
    ap = AudioProcessing(c)
    path = os.path.join(tempfile.mkdtemp(), "dump.npz")
    ap.attach_aec_dump(path)

    far = RNG.normal(size=(n_frames, F)).astype(np.float32) * 0.05
    near = RNG.normal(size=(n_frames, F)).astype(np.float32) * 0.1
    for k in range(n_frames):
        ap.process_reverse_stream(far[k], fs)
        ap.set_stream_delay_ms(0)
        err, out = ap.process_stream(near[k], fs)
        assert err == 0
    ap.detach_aec_dump()

    events, arrays = aec_dump.load_dump(path)
    types = [e["type"] for e in events]
    assert types.count(aec_dump.EVENT_CONFIG) == 1
    assert types.count(aec_dump.EVENT_REVERSE_STREAM) == n_frames
    assert types.count(aec_dump.EVENT_STREAM) == n_frames

    # Replay with the recorded config: outputs must match bit-exactly.
    pairs = aec_dump.replay(path)
    assert len(pairs) == n_frames
    for recorded, replayed in pairs:
        np.testing.assert_array_equal(recorded, replayed)


def test_config_snapshot_roundtrip():
    c = cfg_mod.Config().replace(
        noise_suppression=cfg_mod.NoiseSuppression(
            enabled=True, level=cfg_mod.NoiseSuppressionLevel.HIGH
        )
    )
    path = os.path.join(tempfile.mkdtemp(), "d.npz")
    rec = aec_dump.AecDumpRecorder(path)
    rec.on_config(c)
    rec.close()
    events, _ = aec_dump.load_dump(path)
    assert "noise_suppression" in events[0]["config"]
    assert "Config(" in events[0]["config_repr"]
