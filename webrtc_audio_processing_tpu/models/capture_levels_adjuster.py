"""Capture level adjustment: pre/post gain + emulated analog mic gain.

Reference:
modules/audio_processing/capture_levels_adjuster/capture_levels_adjuster.{h,cc}
— a pre scaler (pre_gain * level/255 when analog mic gain emulation is on,
capture_levels_adjuster.cc:23-44) and a post scaler, both sample-ramped
(audio_samples_scaler.cc). The pre-amplifier config folds into the pre gain
(audio_processing_impl.cc:2108-2130).

The emulated analog level is runtime state (driven by
set_stream_analog_level / AGC recommendations), so it is a traced scalar in
the state rather than static config.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.ops import gain_ramp

MIN_ANALOG_MIC_GAIN_LEVEL = 0
MAX_ANALOG_MIC_GAIN_LEVEL = 255


@struct.dataclass
class CaptureLevelsAdjusterState:
    pre_gain: jnp.ndarray  # configured pre gain (pre_amp * pre_gain_factor)
    post_gain: jnp.ndarray
    emulated_level: jnp.ndarray  # int32 [0, 255]
    pre_scaler_gain: jnp.ndarray  # previous applied gain (ramp start)
    post_scaler_gain: jnp.ndarray


def _pre_adjustment_gain(pre_gain, emulated_level, emulation_enabled: bool):
    """ComputePreGain (capture_levels_adjuster.cc:37-44)."""
    if not emulation_enabled:
        return pre_gain
    return pre_gain * (
        emulated_level.astype(jnp.float32) / MAX_ANALOG_MIC_GAIN_LEVEL
    )


def init_state(
    pre_gain: float, post_gain: float, initial_level: int, emulation_enabled: bool
) -> CaptureLevelsAdjusterState:
    pre = jnp.float32(pre_gain)
    level = jnp.int32(initial_level)
    return CaptureLevelsAdjusterState(
        pre_gain=pre,
        post_gain=jnp.float32(post_gain),
        emulated_level=level,
        pre_scaler_gain=_pre_adjustment_gain(pre, level, emulation_enabled),
        post_scaler_gain=jnp.float32(post_gain),
    )


def apply_pre_level_adjustment(
    state: CaptureLevelsAdjusterState, x, emulation_enabled: bool
):
    """Scale the (N, ch) capture frame by the ramped pre gain."""
    target = _pre_adjustment_gain(state.pre_gain, state.emulated_level, emulation_enabled)
    y, new_prev = gain_ramp.apply_scaler(state.pre_scaler_gain, target, x)
    return state.replace(pre_scaler_gain=new_prev), y


def apply_post_level_adjustment(state: CaptureLevelsAdjusterState, x):
    y, new_prev = gain_ramp.apply_scaler(state.post_scaler_gain, state.post_gain, x)
    return state.replace(post_scaler_gain=new_prev), y


def set_analog_mic_gain_level(state: CaptureLevelsAdjusterState, level):
    """CaptureLevelsAdjuster::SetAnalogMicGainLevel (.cc:80-88)."""
    level = jnp.clip(
        jnp.asarray(level, jnp.int32),
        MIN_ANALOG_MIC_GAIN_LEVEL,
        MAX_ANALOG_MIC_GAIN_LEVEL,
    )
    return state.replace(emulated_level=level)
