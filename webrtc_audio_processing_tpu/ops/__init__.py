"""TPU-native DSP primitive ops (reference layer: webrtc/common_audio/).

Everything here is a pure function over JAX arrays with static shapes, safe
under jit/vmap/scan. Sequential IIR recurrences are expressed through
associative scans (``recurrence``) so they map to log-depth VPU programs
instead of per-sample loops.
"""

from webrtc_audio_processing_tpu.ops import (
    audio_util,
    biquad,
    legacy_resampler,
    qmf,
    recurrence,
)

__all__ = ["audio_util", "biquad", "legacy_resampler", "qmf", "recurrence"]
