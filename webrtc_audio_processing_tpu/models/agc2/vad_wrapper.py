"""VAD wrapper: resample to 24 kHz, run RNN-VAD, periodic reset.

Reference: agc2/vad_wrapper.cc — resamples the first channel of each 10 ms
frame to 24 kHz (PushResampler), runs the RNN-VAD, and resets the RNN state
every 1.5 s (agc2_common.h:34 kVadResetPeriodMs).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.models.agc2.rnn_vad import features, rnn
from webrtc_audio_processing_tpu.ops import resampler

VAD_RESET_PERIOD_FRAMES = 150  # kVadResetPeriodMs / kFrameDurationMs


@struct.dataclass
class VadState:
    time_to_reset: jnp.ndarray  # () int32
    resampler: jnp.ndarray | None  # rolling buffer or None at 24 kHz
    features: features.FeatureState
    rnn: rnn.RnnState


def init_state(sample_rate_hz: int, dtype=jnp.float32) -> VadState:
    frame = sample_rate_hz // 100
    return VadState(
        time_to_reset=jnp.asarray(VAD_RESET_PERIOD_FRAMES, jnp.int32),
        resampler=(resampler.init_state(frame, (), dtype) if frame != 240 else None),
        features=features.init_state(dtype),
        rnn=rnn.init_state(dtype),
    )


def analyze(state: VadState, x, sample_rate_hz: int):
    """VoiceActivityDetectorWrapper::Analyze (vad_wrapper.cc:96-110).

    x: (N, C) floatS16 frame. Returns (state, speech_probability).
    """
    # Periodic reset of the RNN state only (MonoVadImpl::Reset, :42).
    t = state.time_to_reset - 1
    do_reset = t <= 0
    gru = jnp.where(do_reset[..., None], 0.0, state.rnn.gru)
    t = jnp.where(do_reset, VAD_RESET_PERIOD_FRAMES, t)

    ch0 = x[:, 0]
    if state.resampler is not None:
        new_buf, frame24 = resampler.resample_frame(
            state.resampler, ch0, sample_rate_hz // 100, 240
        )
        state = state.replace(resampler=new_buf)
    else:
        frame24 = ch0

    feat_state, feats, is_silence = features.extract_features(
        state.features, frame24
    )
    rnn_state, prob = rnn.compute_vad_probability(
        rnn.RnnState(gru=gru), feats, is_silence
    )
    return (
        state.replace(time_to_reset=t, features=feat_state, rnn=rnn_state),
        prob,
    )
