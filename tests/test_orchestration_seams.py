"""Mock-seam orchestration tests: pin the CALL ORDER and call counts of
the pipeline independently of numerics.

Reference model: the gmock delegation tests that drive
AudioProcessingImpl / EchoCanceller3 / BlockProcessor against mocked
internals (tests/test_utils/mock/mock_echo_remover.cc,
mock_render_delay_buffer.cc, mock_block_processor.cc;
tests/meson.build:55-59) and assert the orchestration sequence of
ProcessCaptureStreamLocked (audio_processing_impl.cc:1264-1561) and
ProcessRenderStreamLocked (:1653-1687). Here the seams are the module
functions the orchestrator dispatches to: each is wrapped with a
recorder that logs (name, static args) at trace time and then delegates
to the real implementation, so a call-order regression is caught even
when it happens to be numerically benign on the test vectors.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from webrtc_audio_processing_tpu import apm, config as cfg_mod
from webrtc_audio_processing_tpu.models import (
    high_pass_filter as hpf_mod,
    noise_suppressor as ns_mod,
)
from webrtc_audio_processing_tpu.models.aec3 import (
    echo_canceller3 as ec3_mod,
    echo_remover as er_mod,
)
from webrtc_audio_processing_tpu.models.aecm import echo_control_mobile as ecm_mod
from webrtc_audio_processing_tpu.models.agc2 import gain_controller2 as gc2_mod

RNG = np.random.default_rng(5)


def _record(monkeypatch, calls, module, name, tag=None, static=None):
    """Wrap module.name with a recorder that logs the call and delegates."""
    real = getattr(module, name)
    tag = tag or name

    def wrapper(*args, **kwargs):
        entry = [tag]
        if static is not None:
            entry.append(static(*args, **kwargs))
        calls.append(tuple(entry))
        return real(*args, **kwargs)

    monkeypatch.setattr(module, name, wrapper)


def _frames(rate, cap_ch, ren_ch):
    F = rate // 100
    cap = RNG.standard_normal((F, cap_ch)).astype(np.float32) * 0.1
    ren = RNG.standard_normal((F, ren_ch)).astype(np.float32) * 0.1
    return jnp.asarray(cap), jnp.asarray(ren)


def _names(calls):
    return [c[0] for c in calls]


def test_desktop_capture_call_order(monkeypatch):
    """HPF -> GC2.Analyze -> NS.Analyze -> AEC3 -> NS.Process ->
    GC2.Process, one call each per frame (ProcessCaptureStreamLocked
    :1282-1477, desktop branch)."""
    c = cfg_mod.Config().replace(
        high_pass_filter=cfg_mod.HighPassFilter(enabled=True),
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
        gain_controller2=cfg_mod.GainController2(
            enabled=True,
            adaptive_digital=cfg_mod.AdaptiveDigital(enabled=True),
            input_volume_controller=cfg_mod.InputVolumeController(
                enabled=True
            ),
        ),
    )
    geo = apm.ApmGeometry.create(c, 32000, 1, render_input_rate=32000,
                                 num_render_channels=1)
    state = apm.init_state(geo)

    calls = []
    _record(monkeypatch, calls, hpf_mod, "process", tag="hpf",
            static=lambda st, y, rate: rate)
    _record(monkeypatch, calls, ns_mod, "analyze", tag="ns.analyze")
    _record(monkeypatch, calls, ns_mod, "process", tag="ns.process")
    _record(monkeypatch, calls, ec3_mod, "process_frame", tag="aec3")
    _record(monkeypatch, calls, gc2_mod, "analyze", tag="gc2.analyze")
    _record(monkeypatch, calls, gc2_mod, "process", tag="gc2.process")

    cap, ren = _frames(32000, 1, 1)
    apm.process_stream_pair(geo, state, cap, ren, 0,
                            stream_delay_ms=jnp.asarray(0, jnp.int32),
                            applied_input_volume=jnp.asarray(100, jnp.int32),
                            n0=jnp.asarray(0, jnp.int32))

    names = _names(calls)
    # One call each per frame — a duplicated or dropped dispatch is an
    # orchestration bug even if numerically benign.
    expected = ["hpf", "gc2.analyze", "ns.analyze", "aec3", "ns.process",
                "gc2.process"]
    assert names == expected, names
    # The default full-band HPF runs at the processing rate (32 kHz here;
    # InitializeHighPassFilter pairing, audio_processing_impl.cc
    # :1891-1896).
    assert calls[0][1] == 32000


def test_hpf_rate_pairing_48k_output(monkeypatch):
    """proc 32 kHz with 48 kHz output selects the reference's quirky
    48 kHz HPF coefficient rate (InitializeHighPassFilter :1891-1896)."""
    c = cfg_mod.Config().replace(
        pipeline=cfg_mod.Pipeline(maximum_internal_processing_rate=32000),
        high_pass_filter=cfg_mod.HighPassFilter(enabled=True),
    )
    geo = apm.ApmGeometry.create(c, 48000, 1)
    state = apm.init_state(geo)
    calls = []
    _record(monkeypatch, calls, hpf_mod, "process", tag="hpf",
            static=lambda st, y, rate: rate)
    cap, _ = _frames(48000, 1, 1)
    apm.process_stream_pair(geo, state, cap, None, 0)
    assert calls == [("hpf", 48000)]


def test_mobile_branch_ns_runs_before_aecm(monkeypatch):
    """Mobile branch: NS.Process BEFORE the AECM and exactly once — the
    inverse of the desktop order (audio_processing_impl.cc:1393-1405)."""
    c = cfg_mod.Config().replace(
        echo_canceller=cfg_mod.EchoCanceller(enabled=True, mobile_mode=True),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
    )
    geo = apm.ApmGeometry.create(c, 16000, 1, render_input_rate=16000,
                                 num_render_channels=1)
    state = apm.init_state(geo)

    calls = []
    _record(monkeypatch, calls, ns_mod, "analyze", tag="ns.analyze")
    _record(monkeypatch, calls, ns_mod, "process", tag="ns.process")
    _record(monkeypatch, calls, ecm_mod, "process_frame", tag="aecm")
    _record(monkeypatch, calls, ecm_mod, "buffer_farend", tag="aecm.far")

    cap, ren = _frames(16000, 1, 1)
    apm.process_stream_pair(geo, state, cap, ren, 0,
                            stream_delay_ms=jnp.asarray(0, jnp.int32))

    names = _names(calls)
    # Render-side far buffering precedes every capture-side consumer, and
    # ns.process precedes the AECM dispatch (exactly one of each; the
    # desktop-position NS.Process must NOT run again after the AECM).
    assert names == ["aecm.far", "ns.analyze", "ns.process", "aecm"], names


def test_render_consumers_fed_before_capture(monkeypatch):
    """process_stream_pair runs the full render half (render queue
    drain analog) before any capture-side processing
    (EmptyQueuedRenderAudioLocked at :1265, first thing in
    ProcessCaptureStreamLocked)."""
    c = cfg_mod.Config().replace(
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
    )
    geo = apm.ApmGeometry.create(c, 16000, 1, render_input_rate=16000,
                                 num_render_channels=1)
    state = apm.init_state(geo)

    calls = []
    _record(monkeypatch, calls, apm, "process_render_stream", tag="render")
    _record(monkeypatch, calls, ns_mod, "analyze", tag="ns.analyze")
    _record(monkeypatch, calls, ec3_mod, "process_frame", tag="aec3")

    cap, ren = _frames(16000, 1, 1)
    apm.process_stream_pair(geo, state, cap, ren, 0,
                            n0=jnp.asarray(0, jnp.int32))
    assert _names(calls) == ["render", "ns.analyze", "aec3"]


@pytest.mark.parametrize("parity,nblocks", [(0, 2), (1, 3)])
def test_aec3_delay_stack_runs_per_block_before_remover(monkeypatch,
                                                        parity, nblocks):
    """Inside EchoCanceller3.process_frame (pair-phase path): the delay
    stack (_delay_phase_block — RenderDelayController::GetDelay +
    AlignFromDelay analog) runs once per 64-sample block, all ahead of a
    single EchoRemover pair dispatch (block_processor.cc:104-200 call
    order; 2 blocks on even parity, 3 on odd — the 80<->64 cadence)."""
    from webrtc_audio_processing_tpu.models.aec3 import (
        config as aec3_config,
    )

    cfg = aec3_config.EchoCanceller3Config()
    geo = ec3_mod.Aec3Geometry.create(cfg, 16000, 1, 1, pair_phase=True,
                                      pair_kernel=False)
    state = ec3_mod.init_state(geo)

    calls = []
    _record(monkeypatch, calls, ec3_mod, "_delay_phase_block", tag="delay")
    _record(monkeypatch, calls, er_mod, "process_capture_pair",
            tag="remover", static=lambda *a, **k: len(a[3]))

    r = jnp.asarray(RNG.standard_normal((1, 160, 1)).astype(np.float32))
    c = jnp.asarray(RNG.standard_normal((1, 160, 1)).astype(np.float32))
    ec3_mod.process_frame(geo, state, r, c, parity,
                          n0=jnp.asarray(0, jnp.int32))

    names = _names(calls)
    assert names == ["delay"] * nblocks + ["remover"], names
    # The remover receives one RenderView per block.
    assert calls[-1][1] == nblocks


def test_aec3_per_block_path_interleaves_delay_and_remover(monkeypatch):
    """The non-pair (strictly interleaved) path dispatches delay stack and
    per-block remover alternately, matching the reference's per-block
    BlockProcessor::ProcessCapture loop exactly."""
    from webrtc_audio_processing_tpu.models.aec3 import (
        config as aec3_config,
    )

    cfg = aec3_config.EchoCanceller3Config()
    geo = ec3_mod.Aec3Geometry.create(cfg, 16000, 1, 1, pair_phase=False,
                                      pair_kernel=False)
    state = ec3_mod.init_state(geo)

    calls = []
    _record(monkeypatch, calls, ec3_mod, "_delay_phase_block", tag="delay")
    _record(monkeypatch, calls, er_mod, "process_capture",
            tag="remover")

    r = jnp.asarray(RNG.standard_normal((1, 160, 1)).astype(np.float32))
    c = jnp.asarray(RNG.standard_normal((1, 160, 1)).astype(np.float32))
    ec3_mod.process_frame(geo, state, r, c, 1,
                          n0=jnp.asarray(0, jnp.int32))

    assert _names(calls) == ["delay", "remover"] * 3, _names(calls)
