"""Native host runtime: C++ streaming plane + batching engine bindings."""

from webrtc_audio_processing_tpu.runtime.streaming import (  # noqa: F401
    BatchEngine,
    StreamingPlane,
)
