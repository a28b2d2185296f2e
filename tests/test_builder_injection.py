"""Builder, injection seams, field trials, checkpoint/resume.

Reference behaviors: api/audio/builtin_audio_processing_builder.{h,cc}
(component injection), audio_processing.h:743-878 (CustomProcessing /
CustomAudioAnalyzer / EchoDetector seams), aec3/echo_canceller3.cc:279-700
(AdjustConfig from field trials).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webrtc_audio_processing_tpu import config as cfg  # noqa: E402
from webrtc_audio_processing_tpu.builder import (  # noqa: E402
    AudioProcessingBuilder,
    CustomAudioAnalyzer,
    CustomProcessing,
    NeuralResidualEchoEstimator,
)
from webrtc_audio_processing_tpu.field_trials import (  # noqa: E402
    FieldTrials,
    adjust_aec3_config,
)
from webrtc_audio_processing_tpu.models.aec3.config import (  # noqa: E402
    EchoCanceller3Config,
)

RATE = 16000
FRAME = RATE // 100


def _frames(n, channels=1, seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, FRAME, channels)).astype(np.float32) * scale


# ------------------------------------------------------------- field trials


def test_field_trial_string_parsing():
    t = FieldTrials("WebRTC-Aec3OnsetDetectionKillSwitch/Enabled/"
                    "WebRTC-Aec3ConservativeTailFreqResponse/Disabled/")
    assert t.is_enabled("WebRTC-Aec3OnsetDetectionKillSwitch")
    assert t.is_disabled("WebRTC-Aec3ConservativeTailFreqResponse")
    assert not t.is_enabled("WebRTC-Aec3ShortHeadroomKillSwitch")
    assert t.lookup("WebRTC-Missing") == ""


def test_field_trial_invalid_strings():
    with pytest.raises(ValueError):
        FieldTrials("Odd/")
    with pytest.raises(ValueError):
        FieldTrials("A/Enabled/", strict=True)  # unregistered key


def test_adjust_config_kill_switches():
    t = FieldTrials(
        "WebRTC-Aec3OnsetDetectionKillSwitch/Enabled/"
        "WebRTC-Aec3UseDot3SecondsInitialStateDuration/Enabled/"
        "WebRTC-Aec3EchoSaturationDetectionKillSwitch/Enabled/"
        "WebRTC-Aec3ShortHeadroomKillSwitch/Enabled/"
    )
    c = adjust_aec3_config(EchoCanceller3Config(), t)
    assert c.erle.onset_detection is False
    assert c.filter.initial_state_seconds == pytest.approx(0.3)
    assert c.ep_strength.echo_can_saturate is False
    assert c.delay.delay_headroom_samples == 128


def test_adjust_config_param_trials():
    t = FieldTrials({
        "WebRTC-Aec3UseNearendReverbLen":
            "Enabled-default_len:0.6,nearend_len:-0.5",
        "WebRTC-Aec3SuppressorTuningOverride":
            "Enabled-normal_tuning_max_inc_factor:4.0,"
            "dominant_nearend_detection_trigger_threshold:5",
    })
    c = adjust_aec3_config(EchoCanceller3Config(), t)
    assert c.ep_strength.default_len == pytest.approx(0.6)
    assert c.ep_strength.nearend_len == pytest.approx(-0.5)
    assert c.suppressor.normal_tuning.max_inc_factor == pytest.approx(4.0)
    assert c.suppressor.dominant_nearend_detection.trigger_threshold == 5


def test_builder_applies_field_trials():
    ap = (AudioProcessingBuilder(cfg.Config())
          .set_field_trials("WebRTC-Aec3UseZeroInitialStateDuration/Enabled/")
          .build())
    assert ap._aec3_config.filter.initial_state_seconds == 0.0


# ------------------------------------------------------- custom processing


def _gain_processor(gain):
    return CustomProcessing(
        init=lambda rate, ch: {"applied": jnp.zeros(())},
        process=lambda st, frame: (
            {"applied": st["applied"] + 1}, frame * gain
        ),
    )


def test_injected_capture_post_processing_applies():
    c = cfg.Config()  # all-default (everything off) -> passthrough pipeline
    ap = (AudioProcessingBuilder(c)
          .set_capture_post_processing(_gain_processor(0.5))
          .build())
    x = _frames(3, seed=1)
    outs = []
    for f in x:
        err, y = ap.process_stream(f, RATE)
        assert err == 0
        outs.append(y)
    ref = AudioProcessingBuilder(c).build()
    for f, y in zip(x, outs):
        _, y_ref = ref.process_stream(f, RATE)
        np.testing.assert_allclose(y, y_ref * 0.5, rtol=1e-6, atol=1e-7)


def test_injected_render_pre_processing_modifies_render_out():
    c = cfg.Config()
    ap = (AudioProcessingBuilder(c)
          .set_render_pre_processing(_gain_processor(2.0))
          .build())
    r = _frames(1, seed=2)[0]
    # Initialize via one capture frame so the geometry exists.
    ap.process_stream(_frames(1, seed=3)[0], RATE)
    err, r_out = ap.process_reverse_stream(r, RATE)
    assert err == 0
    _, y = ap.process_stream(_frames(1, seed=4)[0], RATE)
    # The processed render (2x) flows through the pure step on the NEXT
    # capture call; the host wrapper returns the queued render unchanged
    # (the reference modifies in place inside ProcessRenderStreamLocked).
    assert np.isfinite(y).all()


def test_injected_capture_analyzer_state_advances():
    seen = {"init": 0}

    def init(rate, ch):
        seen["init"] += 1
        return {"count": jnp.zeros((), jnp.int32)}

    analyzer = CustomAudioAnalyzer(
        init=init,
        analyze=lambda st, frame: {"count": st["count"] + 1},
    )
    ap = (AudioProcessingBuilder(cfg.Config())
          .set_capture_analyzer(analyzer)
          .build())
    for f in _frames(4, seed=5):
        ap.process_stream(f, RATE)
    assert seen["init"] == 1
    assert int(ap._state.custom_analyzer["count"]) == 4


def test_injected_neural_residual_echo_estimator_runs():
    calls = {}

    def estimate(render, y, e, S2, Y2, E2, dominant_nearend):
        calls["shapes"] = (render.shape, y.shape, e.shape, S2.shape,
                           Y2.shape, E2.shape)
        R2 = jnp.ones_like(Y2) * 1e-3
        return R2, R2

    c = cfg.Config(echo_canceller=cfg.EchoCanceller(enabled=True))
    ap = (AudioProcessingBuilder(c)
          .set_neural_residual_echo_estimator(
              NeuralResidualEchoEstimator(estimate=estimate))
          .build())
    for cap, ren in zip(_frames(3, seed=6), _frames(3, seed=7)):
        ap.process_reverse_stream(ren, RATE)
        err, y = ap.process_stream(cap, RATE)
        assert err == 0
        assert np.isfinite(y).all()
    render_shape, y_shape, e_shape, s2, y2, e2 = calls["shapes"]
    assert render_shape == (1, 64)
    assert y_shape == e_shape == (1, 64)
    assert s2 == y2 == e2 == (1, 65)


# ------------------------------------------------------------- checkpoint


def test_checkpoint_roundtrip(tmp_path):
    from webrtc_audio_processing_tpu.utils import checkpoint

    c = cfg.Config(
        noise_suppression=cfg.NoiseSuppression(enabled=True),
        gain_controller2=cfg.GainController2(
            enabled=True,
            adaptive_digital=cfg.AdaptiveDigital(enabled=True),
        ),
    )
    ap = AudioProcessingBuilder(c).build()
    x = _frames(12, seed=8)
    for f in x[:6]:
        ap.process_stream(f, RATE)
    path = str(tmp_path / "stream.ckpt")
    checkpoint.save_stream(path, ap)
    cont = [ap.process_stream(f, RATE)[1] for f in x[6:]]

    ap2 = AudioProcessingBuilder(c).build()
    ap2.process_stream(x[0], RATE)  # build geometry
    checkpoint.load_stream(path, ap2)
    resumed = [ap2.process_stream(f, RATE)[1] for f in x[6:]]
    for a, b in zip(cont, resumed):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_checkpoint_pack_unpack_pytree():
    from webrtc_audio_processing_tpu.utils import checkpoint

    state = {"a": jnp.arange(6.0).reshape(2, 3),
             "nested": {"b": jnp.asarray(3, jnp.int32)}}
    blob = checkpoint.pack(state)
    like = {"a": jnp.zeros((2, 3)), "nested": {"b": jnp.zeros((), jnp.int32)}}
    out = checkpoint.unpack(blob, like)
    np.testing.assert_array_equal(out["a"], np.arange(6.0).reshape(2, 3))
    assert int(out["nested"]["b"]) == 3


def test_checkpoint_shape_mismatch_rejected():
    from webrtc_audio_processing_tpu.utils import checkpoint

    blob = checkpoint.pack({"a": jnp.zeros((2, 3))})
    with pytest.raises(ValueError):
        checkpoint.unpack(blob, {"a": jnp.zeros((3, 2))})
