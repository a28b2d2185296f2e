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
    capture_levels: jnp.ndarray  # (C,) int32 per-channel level loop
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
        capture_levels=jnp.full((num_channels,), initial_level, jnp.int32),
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
    """AnalyzeCaptureAudio (gain_control_impl.cc:148-195): AddMic in
    adaptive analog, VirtualMic in adaptive digital, nothing in fixed
    digital mode.

    bands: (num_bands, N, C) int32. Returns (state, possibly-modified bands).
    """
    x = jnp.moveaxis(bands, -1, 0)  # (C, B, N)

    if cfg.agc_mode == digital.AGC_MODE_ADAPTIVE_ANALOG:
        # capture_levels_[ch] = analog_capture_level_ (:163).
        def one(st, xb):
            return analog.add_mic(cfg, st, xb)

        agcs, xb = jax.vmap(one)(state.agcs, x)
        levels = jnp.broadcast_to(
            state.analog_level, state.capture_levels.shape
        )
    elif cfg.agc_mode == digital.AGC_MODE_ADAPTIVE_DIGITAL:
        def one(st, xb):
            return analog.virtual_mic(cfg, st, xb, state.analog_level)

        agcs, xb, levels = jax.vmap(one)(state.agcs, x)
    else:  # fixed digital: no analysis stage
        return state, bands
    return (
        state.replace(agcs=agcs, capture_levels=levels),
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
        return analog.analyze(cfg, st, xb, lvl, echo,
                              gain_table=gain_table)

    agcs, gains_all, levels, warns = jax.vmap(one)(
        state.agcs, x, state.capture_levels
    )
    # One gain trajectory is applied to every channel: the one with the
    # largest end gain (gain_control_impl.cc:228-243).
    apply_idx = jnp.argmax(gains_all[:, 10])
    shared_gains = gains_all[apply_idx]
    y = jax.vmap(lambda xb: analog.process(shared_gains, xb))(x)
    # Analog-mode channel arbitration: lowest recommended level wins
    # (gain_control_impl.cc:246-252); digital modes keep the user level.
    new_level = (
        jnp.min(levels)
        if cfg.agc_mode == digital.AGC_MODE_ADAPTIVE_ANALOG
        else state.analog_level
    )
    return (
        state.replace(
            agcs=agcs,
            gains=gains_all,
            analog_level=new_level,
            capture_levels=levels,
            saturation_warning=jnp.any(warns),
        ),
        jnp.moveaxis(y, 0, -1),
    )


def set_stream_analog_level(state: GainControlState, level):
    lvl = jnp.asarray(level, jnp.int32)
    return state.replace(
        analog_level=lvl,
        capture_levels=jnp.broadcast_to(lvl, state.capture_levels.shape),
    )


def shared_gains(state: GainControlState):
    """The per-frame gain trajectory applied to every channel: the channel
    with the largest end gain wins (gain_control_impl.cc:228-236)."""
    return state.gains[jnp.argmax(state.gains[:, 10])]


def apply_digital_gain_float(gains, bands):
    """GainControlImpl's float ApplyDigitalGain (gain_control_impl.cc:50-77):
    Q16 gains interpolated over 16-sample subsections, applied to the float
    split bands with clamping — NOT the legacy int WebRtcAgc_ApplyDigitalGains
    path (the impl never calls WebRtcAgc_Process).

    gains: (11,) int32; bands: (num_bands, N, C) float. N must be 160 (the
    impl always runs bands at 16 kHz).
    """
    n = bands.shape[1]
    sub = n // 10  # 16 samples per subsection
    g = gains.astype(jnp.float32) * (1.0 / 65536.0)
    delta = (g[1:] - g[:10]) * (1.0 / 16.0)  # per-subsection slope
    steps = jnp.arange(sub, dtype=jnp.float32)
    per_sample = (g[:10, None] + delta[:, None] * steps[None, :]).reshape(-1)
    out = bands * per_sample[None, :, None]
    return jnp.clip(out, -32768.0, 32767.0)
