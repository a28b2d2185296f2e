"""Builder and component-injection seams.

Reference: api/audio/builtin_audio_processing_builder.{h,cc} (the factory
that wires config + injected components into AudioProcessingImpl) and the
injection interfaces of api/audio/audio_processing.h:743-878
(CustomProcessing, CustomAudioAnalyzer, EchoDetector), api/audio/
echo_control.h (EchoControl/EchoControlFactory) and
api/audio/neural_residual_echo_estimator.h.

TPU-native design: an injected component is not a virtual C++ class but a
pair of pure functions — an ``init`` producing a state pytree and a jittable
step — traced directly into the APM step, so injected processing fuses with
the built-in pipeline under XLA instead of crossing an ABI boundary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.field_trials import (
    FieldTrials,
    adjust_aec3_config,
)

__all__ = [
    "CustomProcessing",
    "CustomAudioAnalyzer",
    "EchoDetectorInjection",
    "NeuralResidualEchoEstimator",
    "EchoControlFactory",
    "Injections",
    "AudioProcessingBuilder",
    "BuiltinAudioProcessingBuilder",
]


@dataclass(frozen=True)
class CustomProcessing:
    """Injected render pre-processor / capture post-processor
    (audio_processing.h:743-758 CustomProcessing).

    init:    (sample_rate_hz, num_channels) -> state pytree
    process: (state, frame (N, C)) -> (state, frame) — pure, jittable; runs
             inside the compiled APM step at the reference's pipeline
             position (render: audio_processing_impl.cc:1659-1661; capture
             post: :1483-1485).
    """

    init: Callable[[int, int], Any]
    process: Callable[[Any, Any], tuple]
    # Optional host hook for RuntimeSetting forwarding
    # (audio_processing.h:757 SetRuntimeSetting).
    set_runtime_setting: Callable | None = None


@dataclass(frozen=True)
class CustomAudioAnalyzer:
    """Injected capture-side analyzer (audio_processing.h:760-765); observes
    the fullband signal after band merge, modifies nothing
    (audio_processing_impl.cc:1468-1470)."""

    init: Callable[[int, int], Any]
    analyze: Callable[[Any, Any], Any]  # (state, frame) -> state


@dataclass(frozen=True)
class EchoDetectorInjection:
    """Injected residual-echo analytics (audio_processing.h:811-878,
    EchoDetector interface + SetEchoDetector seam).

    Functions mirror models/echo_detector.py's module surface so the
    built-in ResidualEchoDetector is itself expressible as one of these.
    """

    init: Callable[..., Any]  # (dtype) -> state
    analyze_render_audio: Callable[[Any, Any], Any]
    analyze_capture_audio: Callable[[Any, Any], Any]
    get_metrics: Callable[[Any], dict]


@dataclass(frozen=True)
class NeuralResidualEchoEstimator:
    """Injected neural residual-echo power estimator
    (api/audio/neural_residual_echo_estimator.h:26-59).

    estimate: (render_block (C_ren, 64), y (C, 64), e (C, 64),
               S2 (C, 65), Y2 (C, 65), E2 (C, 65), dominant_nearend ())
              -> (R2 (C, 65), R2_unbounded (C, 65)), pure and jittable —
              replaces ResidualEchoEstimator's model-based R2.
    get_configuration: (multi_channel: bool) -> EchoCanceller3Config the
              estimator was trained against.
    """

    estimate: Callable[..., tuple]
    get_configuration: Callable[[bool], Any] | None = None


@dataclass(frozen=True)
class EchoControlFactory:
    """Injected echo-control factory (api/audio/echo_control.h:51-60).

    create: (sample_rate_hz, num_render_channels, num_capture_channels) ->
            an object with ``init_state()``, ``process_frame(state,
            render_bands, capture_bands, parity)`` and ``get_metrics(state)``
            — the contract models/aec3/echo_canceller3.py satisfies. The
            built-in AEC3 is used when no factory is injected
            (audio_processing_impl.cc:1909-1984).
    """

    create: Callable[[int, int, int], Any]


@dataclass(frozen=True)
class Injections:
    """All injected components, attached statically to ApmGeometry."""

    capture_post_processing: CustomProcessing | None = None
    render_pre_processing: CustomProcessing | None = None
    capture_analyzer: CustomAudioAnalyzer | None = None
    echo_detector: EchoDetectorInjection | None = None
    neural_residual_echo_estimator: NeuralResidualEchoEstimator | None = None
    echo_control_factory: EchoControlFactory | None = None

    def __bool__(self):
        return any(
            getattr(self, f.name) is not None
            for f in self.__dataclass_fields__.values()
        )


# Sentinel default so field() keeps Injections() identity-stable per builder.
_EMPTY = Injections()


class AudioProcessingBuilder:
    """BuiltinAudioProcessingBuilder (builtin_audio_processing_builder.h:29-80)
    as a fluent factory over the TPU AudioProcessing wrapper."""

    def __init__(self, config: cfg_mod.Config | None = None):
        self._config = config or cfg_mod.Config()
        self._aec3_config = None
        self._field_trials: FieldTrials | None = None
        self._inj = {}

    # -- setters (builtin_audio_processing_builder.h:41-80) ---------------

    def set_config(self, config: cfg_mod.Config):
        self._config = config
        return self

    def set_echo_canceller3_config(self, aec3_config):
        self._aec3_config = aec3_config
        return self

    def set_field_trials(self, trials: FieldTrials | str | dict):
        if not isinstance(trials, FieldTrials):
            trials = FieldTrials(trials)
        self._field_trials = trials
        return self

    def set_echo_control_factory(self, factory: EchoControlFactory):
        self._inj["echo_control_factory"] = factory
        return self

    def set_echo_detector(self, detector: EchoDetectorInjection):
        self._inj["echo_detector"] = detector
        return self

    def set_capture_post_processing(self, processing: CustomProcessing):
        self._inj["capture_post_processing"] = processing
        return self

    def set_render_pre_processing(self, processing: CustomProcessing):
        self._inj["render_pre_processing"] = processing
        return self

    def set_capture_analyzer(self, analyzer: CustomAudioAnalyzer):
        self._inj["capture_analyzer"] = analyzer
        return self

    def set_neural_residual_echo_estimator(
        self, estimator: NeuralResidualEchoEstimator
    ):
        self._inj["neural_residual_echo_estimator"] = estimator
        return self

    # -- build (builtin_audio_processing_builder.cc:49-75) ----------------

    def build(self):
        from webrtc_audio_processing_tpu import api

        aec3_cfg = self._aec3_config
        nree = self._inj.get("neural_residual_echo_estimator")
        if nree is not None and nree.get_configuration is not None and (
            aec3_cfg is None
        ):
            multi = (
                self._config.pipeline.multi_channel_capture
                or self._config.pipeline.multi_channel_render
            )
            aec3_cfg = nree.get_configuration(multi)
        if self._field_trials is not None and aec3_cfg is None:
            # AdjustConfig runs on the default config when none is injected
            # (echo_canceller3.cc:758-764).
            from webrtc_audio_processing_tpu.models.aec3.config import (
                EchoCanceller3Config,
            )

            aec3_cfg = EchoCanceller3Config()
        if self._field_trials is not None:
            aec3_cfg = adjust_aec3_config(aec3_cfg, self._field_trials)

        injections = Injections(**self._inj) if self._inj else None
        return api.AudioProcessing(
            self._config,
            echo_canceller3_config=aec3_cfg,
            injections=injections,
        )


# Reference alias (builtin_audio_processing_builder.h:29).
BuiltinAudioProcessingBuilder = AudioProcessingBuilder
