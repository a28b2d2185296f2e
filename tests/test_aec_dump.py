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


# ---------------------------------------------------------------- cross-
# validation against the reference's own proto schema and compiled APM
# (VerifyDebugDump analog, audio_processing_unittest.cc:1597-1652).

def _reference_schema(tmp_path):
    """Compiles tests/proto/debug.proto from the reference tree with
    protoc at test time and imports the generated module — the actual
    reference schema, not our hand-rolled codec."""
    import shutil
    import subprocess
    import sys

    import pytest

    proto = "/root/reference/tests/proto/debug.proto"
    if shutil.which("protoc") is None or not os.path.exists(proto):
        pytest.skip("protoc or reference debug.proto unavailable")
    out = tmp_path / "gen"
    out.mkdir(exist_ok=True)
    subprocess.run(
        ["protoc", "-I", os.path.dirname(proto), f"--python_out={out}",
         proto],
        check=True,
    )
    sys.path.insert(0, str(out))
    try:
        import importlib

        return importlib.import_module("debug_pb2")
    finally:
        sys.path.pop(0)


def _framed_events(path):
    """Raw length-prefixed event payloads (protobuf_utils.cc framing)."""
    import struct

    out = []
    with open(path, "rb") as fh:
        while True:
            hdr = fh.read(4)
            if len(hdr) < 4:
                return out
            (n,) = struct.unpack("<i", hdr)
            out.append(fh.read(n))


def test_our_dump_parses_under_reference_schema(tmp_path):
    """A dump written here must parse field-for-field under the
    reference's protoc-compiled debug.proto."""
    pb = _reference_schema(tmp_path)

    c = cfg_mod.Config().replace(
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
        noise_suppression=cfg_mod.NoiseSuppression(
            enabled=True, level=cfg_mod.NoiseSuppressionLevel.HIGH
        ),
    )
    path = str(tmp_path / "ours.aecdump")
    rec = aec_dump.AecDumpRecorder(path)
    rec.on_init(32000, 2, 2, 16000, 1, 32000)
    rec.on_config(c)
    ren = RNG.normal(size=(160, 1)).astype(np.float32)
    rec.on_reverse_stream(ren)
    cap_in = RNG.normal(size=(320, 2)).astype(np.float32)
    cap_out = RNG.normal(size=(320, 2)).astype(np.float32)
    rec.on_stream(cap_in, cap_out, delay_ms=40, applied_input_volume=100,
                  keypress=False)
    rec.on_runtime_setting(1, 2.5)  # kCapturePreGain
    rec.close()

    raw = _framed_events(path)
    evs = []
    for payload in raw:
        ev = pb.Event()
        ev.ParseFromString(payload)
        evs.append(ev)

    assert [e.type for e in evs] == [
        pb.Event.INIT, pb.Event.CONFIG, pb.Event.REVERSE_STREAM,
        pb.Event.STREAM, pb.Event.RUNTIME_SETTING,
    ]
    init = evs[0].init
    assert init.sample_rate == 32000
    assert init.num_input_channels == 2
    assert init.num_reverse_channels == 1
    assert init.reverse_sample_rate == 16000
    assert init.output_sample_rate == 32000
    cfg = evs[1].config
    assert cfg.aec_enabled and not cfg.aecm_enabled
    assert cfg.ns_enabled and cfg.ns_level == 2
    rev = evs[2].reverse_stream
    assert len(rev.channel) == 1
    np.testing.assert_array_equal(
        np.frombuffer(rev.channel[0], np.float32), ren[:, 0])
    st = evs[3].stream
    assert st.delay == 40 and st.applied_input_volume == 100
    assert len(st.input_channel) == 2 and len(st.output_channel) == 2
    np.testing.assert_array_equal(
        np.frombuffer(st.input_channel[1], np.float32), cap_in[:, 1])
    np.testing.assert_array_equal(
        np.frombuffer(st.output_channel[0], np.float32), cap_out[:, 0])
    assert abs(evs[4].runtime_setting.capture_pre_gain - 2.5) < 1e-6


def test_reference_schema_dump_parses_under_our_reader(tmp_path):
    """The reverse direction: events serialized by the protoc-generated
    reference schema must decode under our hand-rolled reader."""
    import struct

    pb = _reference_schema(tmp_path)
    path = str(tmp_path / "ref.aecdump")
    with open(path, "wb") as fh:
        def emit(ev):
            b = ev.SerializeToString()
            fh.write(struct.pack("<i", len(b)) + b)

        ev = pb.Event()
        ev.type = pb.Event.INIT
        ev.init.sample_rate = 16000
        ev.init.num_input_channels = 1
        ev.init.num_output_channels = 1
        ev.init.num_reverse_channels = 2
        ev.init.reverse_sample_rate = 48000
        emit(ev)

        ev = pb.Event()
        ev.type = pb.Event.STREAM
        cap = RNG.normal(size=(160,)).astype(np.float32)
        outp = RNG.normal(size=(160,)).astype(np.float32)
        ev.stream.input_channel.append(cap.tobytes())
        ev.stream.output_channel.append(outp.tobytes())
        ev.stream.delay = 25
        ev.stream.applied_input_volume = 90
        ev.stream.keypress = True
        emit(ev)

        ev = pb.Event()
        ev.type = pb.Event.RUNTIME_SETTING
        ev.runtime_setting.capture_fixed_post_gain = 1.25
        emit(ev)

    events = dp.read_dump(path)
    assert [e["type"] for e in events] == [dp.INIT, dp.STREAM,
                                           dp.RUNTIME_SETTING]
    assert events[0]["sample_rate"] == 16000
    assert events[0]["reverse_sample_rate"] == 48000
    assert events[0]["num_reverse_channels"] == 2
    st = events[1]
    assert st["delay"] == 25 and st["applied_input_volume"] == 90
    assert st["keypress"] is True
    assert len(st["input_channels"]) == 1
    assert st["input_channels"][0].dtype == np.float32
    assert abs(events[2]["capture_fixed_post_gain"] - 1.25) < 1e-6


def test_oracle_dump_replays_through_our_apm(tmp_path):
    """A dump whose stream events carry the COMPILED REFERENCE's outputs
    (the oracle .so) replays through our APM with closely matching
    outputs — the cross-implementation VerifyDebugDump analog. Runs only
    when the oracle library is built (tools/build_ref_apm.sh)."""
    import sys

    import pytest

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    try:
        import ref_apm
    finally:
        sys.path.pop(0)
    if not ref_apm.available():
        pytest.skip("oracle libapm.so not built")

    res = "/root/reference/tests/resources"
    far = np.fromfile(f"{res}/far16_stereo.pcm", np.int16)
    near = np.fromfile(f"{res}/near16_stereo.pcm", np.int16)
    F = 160
    n_frames = 100

    def mono(pcm):
        n = len(pcm) // (2 * F)
        return pcm[: n * 2 * F].reshape(n, F, 2)[..., :1]

    far_f = mono(far)[:n_frames].astype(np.float32) / 32768.0
    near_f = mono(near)[:n_frames].astype(np.float32) / 32768.0

    ref = ref_apm.RefApm(ns=True, hpf=True)
    path = str(tmp_path / "oracle.aecdump")
    c = cfg_mod.Config().replace(
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
        high_pass_filter=cfg_mod.HighPassFilter(enabled=True),
    )
    rec = aec_dump.AecDumpRecorder(path)
    rec.on_init(16000, 1, 1, 16000, 1, 16000)
    rec.on_config(c)
    for k in range(n_frames):
        ref.process_reverse(far_f[k], 16000)
        ref.set_stream_delay_ms(0)
        rc, out = ref.process(near_f[k], 16000)
        assert rc == 0
        rec.on_reverse_stream(far_f[k])
        rec.on_stream(near_f[k], out.astype(np.float32), 0, 0)
    rec.close()
    ref.close()

    pairs = aec_dump.replay(path)
    assert len(pairs) == n_frames
    recs = np.concatenate([r for r, _ in pairs]).ravel()
    reps = np.concatenate([p for _, p in pairs]).ravel()
    denom = np.sqrt(np.mean(recs**2)) + 1e-9
    rel = np.sqrt(np.mean((recs - reps) ** 2)) / denom
    # NS+HPF profile conformance: rel RMS ~1e-3 (PERF.md r04 triage);
    # allow slack for the float CopyFrom path differences.
    assert rel < 0.02, rel
