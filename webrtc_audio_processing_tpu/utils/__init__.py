"""Host-side utilities: WAV/PCM I/O, test helpers."""

from webrtc_audio_processing_tpu.utils import wav_io

__all__ = ["wav_io"]
