"""AecDump in the reference debug.proto wire format: record, parse,
bit-exact replay (ApmTest.VerifyDebugDump* analog, audioproc_f replay)."""

import os
import tempfile

import numpy as np

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.api import AudioProcessing
from webrtc_audio_processing_tpu.utils import aec_dump, debug_proto as dp

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
    path = os.path.join(tempfile.mkdtemp(), "dump.aecdump")
    ap.attach_aec_dump(path)

    far = RNG.normal(size=(n_frames, F)).astype(np.float32) * 0.05
    near = RNG.normal(size=(n_frames, F)).astype(np.float32) * 0.1
    for k in range(n_frames):
        ap.process_reverse_stream(far[k], fs)
        ap.set_stream_delay_ms(0)
        err, out = ap.process_stream(near[k], fs)
        assert err == 0
    ap.detach_aec_dump()

    events = aec_dump.load_dump(path)
    types = [e["type"] for e in events]
    assert types.count(dp.CONFIG) == 1
    assert types.count(dp.REVERSE_STREAM) == n_frames
    assert types.count(dp.STREAM) == n_frames

    # The stream events carry the float deinterleaved data per the schema.
    stream_ev = events[types.index(dp.STREAM)]
    assert len(stream_ev["input_channels"]) == 1
    assert stream_ev["input_channels"][0].shape == (F,)
    np.testing.assert_array_equal(stream_ev["input_channels"][0], near[0])

    # Replay with the recorded config: outputs must match bit-exactly.
    pairs = aec_dump.replay(path)
    assert len(pairs) == n_frames
    for recorded, replayed in pairs:
        np.testing.assert_array_equal(recorded, replayed)


def test_wire_format_parses_under_reference_schema():
    """Every event round-trips through the proto2 wire codec with the
    field numbers of tests/proto/debug.proto."""
    c = cfg_mod.Config().replace(
        noise_suppression=cfg_mod.NoiseSuppression(
            enabled=True, level=cfg_mod.NoiseSuppressionLevel.HIGH
        ),
        pre_amplifier=cfg_mod.PreAmplifier(
            enabled=True, fixed_gain_factor=1.5
        ),
    )
    path = os.path.join(tempfile.mkdtemp(), "d.aecdump")
    rec = aec_dump.AecDumpRecorder(path)
    rec.on_init(16000, 1, 1, 32000, 2, 16000)
    rec.on_config(c)
    ren = RNG.normal(size=(320, 2)).astype(np.float32)
    rec.on_reverse_stream(ren)
    cap_in = RNG.normal(size=(160, 1)).astype(np.float32)
    cap_out = RNG.normal(size=(160, 1)).astype(np.float32)
    rec.on_stream(cap_in, cap_out, delay_ms=30, applied_input_volume=120,
                  keypress=True)
    rec.on_runtime_setting(1, 2.0)   # kCapturePreGain
    rec.on_runtime_setting(8, False)  # kCaptureOutputUsed
    rec.close()

    events = dp.read_dump(path)
    assert [e["type"] for e in events] == [
        dp.INIT, dp.CONFIG, dp.REVERSE_STREAM, dp.STREAM,
        dp.RUNTIME_SETTING, dp.RUNTIME_SETTING,
    ]
    init = events[0]
    assert init["sample_rate"] == 16000
    assert init["reverse_sample_rate"] == 32000
    assert init["num_reverse_channels"] == 2
    cfg = events[1]
    assert cfg["ns_enabled"] == 1 and cfg["ns_level"] == 2
    assert cfg["pre_amplifier_enabled"] == 1
    assert abs(cfg["pre_amplifier_fixed_gain_factor"] - 1.5) < 1e-6
    rev = events[2]
    assert len(rev["channels"]) == 2
    np.testing.assert_array_equal(rev["channels"][1], ren[:, 1])
    st = events[3]
    assert st["delay"] == 30 and st["applied_input_volume"] == 120
    assert st["keypress"] is True
    np.testing.assert_array_equal(st["output_channels"][0], cap_out[:, 0])
    assert abs(events[4]["capture_pre_gain"] - 2.0) < 1e-6
    assert events[5]["capture_output_used"] == 0


def test_config_reconstruction_from_legacy_fields():
    c = cfg_mod.Config().replace(
        echo_canceller=cfg_mod.EchoCanceller(enabled=True, mobile_mode=True),
        noise_suppression=cfg_mod.NoiseSuppression(
            enabled=True, level=cfg_mod.NoiseSuppressionLevel.VERY_HIGH
        ),
    )
    path = os.path.join(tempfile.mkdtemp(), "d.aecdump")
    rec = aec_dump.AecDumpRecorder(path)
    rec.on_config(c)
    rec.close()
    ev = dp.read_dump(path)[0]
    assert ev["aecm_enabled"] == 1 and ev["aec_enabled"] == 0
    assert ev["ns_level"] == 3
