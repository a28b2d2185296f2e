"""GainController2 orchestrator: VAD -> levels -> adaptive gain -> limiter.

Reference: modules/audio_processing/gain_controller2.cc:183-263 (Process) —
composes the RNN-VAD wrapper, audio/noise/speech level estimators, the
saturation protector, the adaptive digital gain controller, the fixed gain
applier, and the limiter, in exactly that order.

The speech probability is computed by the internal RNN-VAD
(models/agc2/vad_wrapper.py) when ``use_internal_vad`` is set, else it is
passed in by the caller (mirroring the ``use_internal_vad`` ctor flag).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.config import GainController2 as Agc2Config
from webrtc_audio_processing_tpu.models.agc2 import adaptive_digital as ad
from webrtc_audio_processing_tpu.models.agc2 import (
    input_volume_controller as ivc_mod,
)
from webrtc_audio_processing_tpu.models.agc2 import limiter as limiter_mod
from webrtc_audio_processing_tpu.models.agc2 import vad_wrapper
from webrtc_audio_processing_tpu.ops.gain_ramp import ramped_gains_applier


@struct.dataclass
class Agc2State:
    fixed_gain_last_factor: jnp.ndarray  # GainApplier memory for fixed gain
    limiter: limiter_mod.LimiterState
    speech_level: ad.SpeechLevelState | None
    noise_floor: ad.NoiseFloorState | None
    saturation: ad.SaturationProtectorState | None
    adaptive: ad.AdaptiveDigitalState | None
    vad: object | None = None  # VadState when the internal VAD is used
    ivc: ivc_mod.InputVolumeControllerState | None = None


def init_state(
    config: Agc2Config, sample_rate_hz: int, use_internal_vad: bool = False,
    dtype=jnp.float32, num_channels: int = 1,
) -> Agc2State:
    adaptive_on = config.adaptive_digital.enabled
    ivc_on = config.input_volume_controller.enabled
    vad = None
    if use_internal_vad and (adaptive_on or ivc_on):
        vad = vad_wrapper.init_state(sample_rate_hz, dtype)
    return Agc2State(
        fixed_gain_last_factor=jnp.asarray(
            10.0 ** (config.fixed_digital.gain_db / 20.0), dtype
        ),
        limiter=limiter_mod.init_state(dtype),
        speech_level=(
            ad.init_speech_level(config.adaptive_digital, dtype)
            if (adaptive_on or ivc_on)
            else None
        ),
        noise_floor=(
            ad.init_noise_floor(sample_rate_hz, dtype) if adaptive_on else None
        ),
        saturation=ad.init_saturation_protector(dtype) if adaptive_on else None,
        adaptive=(
            ad.init_adaptive_digital(config.adaptive_digital, dtype)
            if adaptive_on
            else None
        ),
        vad=vad,
        ivc=(
            ivc_mod.init_state(
                ivc_mod.InputVolumeControllerConfig(), num_channels
            )
            if ivc_on else None
        ),
    )


def analyze(config: Agc2Config, state: Agc2State, applied_input_volume, x):
    """GainController2::Analyze (gain_controller2.cc:170-181): feed the
    pre-processing capture frame to the input volume controller."""
    if state.ivc is None:
        return state
    return state.replace(
        ivc=ivc_mod.analyze_input_audio(
            ivc_mod.InputVolumeControllerConfig(), state.ivc,
            applied_input_volume, x,
        )
    )


def process(
    config: Agc2Config,
    state: Agc2State,
    x,
    sample_rate_hz: int,
    speech_probability=None,
    input_volume_changed=False,
):
    """GainController2::Process (gain_controller2.cc:183-263).

    x: (N, C) floatS16 full-band frame. Returns (state, y, info dict).
    """
    if input_volume_changed is not False and state.speech_level is not None:
        # Reset level/saturation estimators on volume change (:188-194).
        import jax

        def _reset_where(pred, init, cur):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(pred, a, b), init, cur
            )

        state = state.replace(
            speech_level=_reset_where(
                input_volume_changed,
                ad.init_speech_level(config.adaptive_digital, x.dtype),
                state.speech_level,
            ),
            saturation=(
                _reset_where(
                    input_volume_changed,
                    ad.init_saturation_protector(x.dtype),
                    state.saturation,
                )
                if state.saturation is not None
                else None
            ),
        )

    if state.vad is not None:
        new_vad, speech_probability = vad_wrapper.analyze(
            state.vad, x, sample_rate_hz
        )
        state = state.replace(vad=new_vad)
    elif speech_probability is None:
        speech_probability = jnp.asarray(0.0, x.dtype)

    peak_dbfs, rms_dbfs = ad.compute_audio_levels(x)

    info = {"speech_probability": speech_probability}
    if state.noise_floor is not None:
        nf, noise_rms_dbfs = ad.noise_floor_analyze(
            state.noise_floor, x, sample_rate_hz
        )
        state = state.replace(noise_floor=nf)
        info["noise_rms_dbfs"] = noise_rms_dbfs

    if state.speech_level is not None:
        sl = ad.speech_level_update(state.speech_level, rms_dbfs, speech_probability)
        state = state.replace(speech_level=sl)
        info["speech_level_dbfs"] = sl.level_dbfs
        info["speech_level_is_confident"] = sl.is_confident

    # Input volume recommendation (:227-234) — uses the speech level only
    # when the estimator is confident.
    if state.ivc is not None:
        new_ivc, rec_vol, rec_valid = ivc_mod.recommend_input_volume(
            ivc_mod.InputVolumeControllerConfig(), state.ivc,
            speech_probability,
            state.speech_level.level_dbfs,
            state.speech_level.is_confident,
        )
        state = state.replace(ivc=new_ivc)
        info["recommended_input_volume"] = rec_vol
        info["recommended_input_volume_valid"] = rec_valid

    y = x
    if state.adaptive is not None:
        sat = ad.saturation_protector_analyze(
            state.saturation, speech_probability, peak_dbfs,
            state.speech_level.level_dbfs,
        )
        state = state.replace(saturation=sat)
        limiter_envelope_dbfs = ad.float_s16_to_dbfs(
            state.limiter.filter_state_level
        )
        adaptive, y = ad.adaptive_digital_process(
            config.adaptive_digital,
            state.adaptive,
            y,
            speech_probability,
            state.speech_level.level_dbfs,
            state.speech_level.is_confident,
            info["noise_rms_dbfs"],
            sat.headroom_db,
            limiter_envelope_dbfs,
        )
        state = state.replace(adaptive=adaptive)
        info["headroom_db"] = sat.headroom_db

    # Fixed gain applier (:257). The fixed gain is static config, so the ramp
    # only matters right after SetFixedGainDb runtime changes.
    fixed_factor = jnp.asarray(
        10.0 ** (config.fixed_digital.gain_db / 20.0), x.dtype
    )
    g = ramped_gains_applier(
        state.fixed_gain_last_factor, fixed_factor, y.shape[0], y.dtype
    )
    y = y * g[:, None]
    state = state.replace(fixed_gain_last_factor=fixed_factor)

    new_limiter, y = limiter_mod.process(state.limiter, y)
    state = state.replace(limiter=new_limiter)
    return state, y, info
