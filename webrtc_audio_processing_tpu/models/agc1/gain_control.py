"""GainControlImpl: the APM-facing AGC1 front.

Reference: modules/audio_processing/gain_control_impl.{h,cc} — wraps the
legacy WebRtcAgc per capture channel: render-side AddFarend from the packed
render queue, capture-side Analyze (digital gains + analog loop) and
Process (gain application), with the analog level loop arbitration.

Here channels share one state per capture channel (leading axis) like the
reference's per-channel mono AGCs; the packed render audio is the
band-limited mono mix (gain_control_impl.cc PackRenderAudioBuffer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.config import Agc1Mode, GainController1
from webrtc_audio_processing_tpu.models.agc1 import analog, digital


def mode_to_legacy(mode: Agc1Mode) -> int:
    return {
        Agc1Mode.ADAPTIVE_ANALOG: digital.AGC_MODE_ADAPTIVE_ANALOG,
        Agc1Mode.ADAPTIVE_DIGITAL: digital.AGC_MODE_ADAPTIVE_DIGITAL,
        Agc1Mode.FIXED_DIGITAL: digital.AGC_MODE_FIXED_DIGITAL,
    }[mode]


def make_config(config: GainController1, fs_band: int) -> analog.LegacyAgcConfig:
    """BuiltinAgc setup (gain_control_impl.cc Initialize + set_config)."""
    return analog.LegacyAgcConfig(
        min_level=0,
        max_level=255,
        agc_mode=mode_to_legacy(config.mode),
        fs=fs_band,
        target_level_dbfs=config.target_level_dbfs,
        compression_gain_db=config.compression_gain_db,
        limiter_enable=config.enable_limiter,
    )


@struct.dataclass
class GainControlState:
    agcs: analog.AnalogAgcState  # vmapped over capture channels
    gains: jnp.ndarray  # (C, 11) int32 — from Analyze, used by Process
    analog_level: jnp.ndarray  # () int32 shared recommended level
    saturation_warning: jnp.ndarray  # () bool


def init_state(cfg: analog.LegacyAgcConfig, num_channels: int,
               initial_level: int = 128) -> GainControlState:
    one = analog.init_state(cfg)
    agcs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_channels,) + x.shape), one
    )
    return GainControlState(
        agcs=agcs,
        gains=jnp.zeros((num_channels, 11), jnp.int32),
        analog_level=jnp.asarray(initial_level, jnp.int32),
        saturation_warning=jnp.asarray(False),
    )


def process_render_audio(cfg: analog.LegacyAgcConfig,
                         state: GainControlState, render_band0):
    """ProcessRenderAudio (gain_control_impl.cc): AddFarend per channel.

    render_band0: (N,) int32 mono render (already band-limited + packed).
    """
    agcs = jax.vmap(lambda st: analog.add_far_end(st, render_band0))(
        state.agcs
    )
    return state.replace(agcs=agcs)


def analyze_capture_audio(cfg: analog.LegacyAgcConfig,
                          state: GainControlState, bands):
    """AnalyzeCaptureAudio: AddMic (adaptive analog) or VirtualMic.

    bands: (num_bands, N, C) int32. Returns (state, possibly-modified bands).
    """
    x = jnp.moveaxis(bands, -1, 0)  # (C, B, N)

    def one(st, xb):
        return analog.add_mic(cfg, st, xb)

    agcs, xb = jax.vmap(one)(state.agcs, x)
    return (
        state.replace(agcs=agcs),
        jnp.moveaxis(xb, 0, -1),
    )


def process_capture_audio(cfg: analog.LegacyAgcConfig,
                          state: GainControlState, bands, stream_has_echo,
                          gain_table=None):
    """ProcessCaptureAudio: Analyze (gains + analog loop) then Process.

    bands: (num_bands, N, C) int32. gain_table: optional dynamic (32,)
    table for the hybrid analog AGC path. Returns (state, out bands).
    """
    x = jnp.moveaxis(bands, -1, 0)  # (C, B, N)
    echo = jnp.asarray(stream_has_echo, jnp.int32)

    def one(st, xb, lvl):
        st, gains, out_lvl, warn = analog.analyze(
            cfg, st, xb, lvl, echo, gain_table=gain_table
        )
        y = analog.process(gains, xb)
        return st, y, out_lvl, warn

    agcs, y, levels, warns = jax.vmap(one, in_axes=(0, 0, None))(
        state.agcs, x, state.analog_level
    )
    # Channel arbitration: lowest recommended level wins
    # (gain_control_impl.cc stream_analog_level aggregation).
    new_level = jnp.min(levels)
    return (
        state.replace(
            agcs=agcs,
            analog_level=new_level,
            saturation_warning=jnp.any(warns),
        ),
        jnp.moveaxis(y, 0, -1),
    )


def set_stream_analog_level(state: GainControlState, level):
    return state.replace(analog_level=jnp.asarray(level, jnp.int32))
