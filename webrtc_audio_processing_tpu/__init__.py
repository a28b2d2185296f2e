"""TPU-native audio processing framework.

A from-scratch JAX/XLA/Pallas re-design of WebRTC's AudioProcessing module
(APM) as packaged by dignifiedquire/webrtc-audio-processing (reference:
/root/reference, WebRTC M145). The reference defines WHAT we build — the
stateful dual-stream 10 ms frame pipeline with AEC3 echo cancellation, noise
suppression, AGC1/AGC2 (+ RNN-VAD), mobile AECM, high-pass/post filtering,
QMF band splitting and resampling — while the architecture here is TPU-first:

* every submodule is a pure, shape-static step function
  ``(state, frame, ...) -> (state, frame_out, aux)`` whose state is a pytree
  of fixed-size arrays (the reference's C++ member variables);
* streams are batched with ``jax.vmap`` and sharded over device meshes with
  ``jax.sharding``/``shard_map`` (reference has no distributed runtime; its
  scaling story is one instance per stream — ours is thousands of vmapped
  stream states per chip);
* sequential DSP recurrences (biquads, QMF all-pass chains, NLMS) are
  expressed as associative scans / Pallas kernels instead of sample loops.

Public API mirrors the reference's ``AudioProcessing`` interface
(webrtc/api/audio/audio_processing.h) through a thin stateful wrapper.
"""

from webrtc_audio_processing_tpu import ops, utils
from webrtc_audio_processing_tpu.config import Config

__version__ = "0.1.0"

__all__ = [
    "Config",
    "ops",
    "utils",
    "__version__",
    "AudioProcessing",
    "AudioProcessingBuilder",
    "BuiltinAudioProcessingBuilder",
    "FieldTrials",
    "RuntimeSetting",
]


def __getattr__(name):
    # Lazy exports: importing the full API pulls in jax-heavy modules; keep
    # `import webrtc_audio_processing_tpu` light for config-only use.
    if name == "AudioProcessing" or name == "RuntimeSetting":
        from webrtc_audio_processing_tpu import api

        return getattr(api, name)
    if name in ("AudioProcessingBuilder", "BuiltinAudioProcessingBuilder"):
        from webrtc_audio_processing_tpu import builder

        return getattr(builder, name)
    if name == "FieldTrials":
        from webrtc_audio_processing_tpu import field_trials

        return field_trials.FieldTrials
    raise AttributeError(name)
