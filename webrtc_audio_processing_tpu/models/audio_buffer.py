"""AudioBuffer equivalent: rate/channel adaptation + band splitting.

Reference: modules/audio_processing/audio_buffer.{h,cc} — per-stream working
buffer that deinterleaves, downmixes (average or first channel), resamples
between API rate and processing rate (PushSincResampler per channel,
audio_buffer.cc:116-166), converts to float_s16 domain, and splits into
1-3 bands of 160 samples (audio_buffer.cc:374-380).

Functional design: a frozen ``BufferConfig`` (static) plus a pytree
``AudioBufferState`` holding the resampler rolling buffers and band-filter
states; ``copy_from``/``copy_to``/``split``/``merge`` are pure functions.
Array layout: full-band signals are (num_frames, num_channels); banded
signals are (num_bands, 160, num_channels). Channels ride as a trailing
batch axis of every DSP op; streams are vmapped outside.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.config import DownmixMethod
from webrtc_audio_processing_tpu.ops import resampler, splitting


@dataclass(frozen=True)
class BufferConfig:
    """Static geometry of one AudioBuffer (audio_buffer.h:41-52)."""

    input_rate: int
    input_num_channels: int
    buffer_rate: int
    buffer_num_channels: int
    output_rate: int
    output_num_channels: int
    downmix_method: DownmixMethod = DownmixMethod.AVERAGE_CHANNELS

    @property
    def input_num_frames(self) -> int:
        return self.input_rate // 100

    @property
    def buffer_num_frames(self) -> int:
        return self.buffer_rate // 100

    @property
    def output_num_frames(self) -> int:
        return self.output_rate // 100

    @property
    def num_bands(self) -> int:
        return splitting.num_bands_for_rate(self.buffer_rate)

    @property
    def input_resampling(self) -> bool:
        return self.input_num_frames != self.buffer_num_frames

    @property
    def output_resampling(self) -> bool:
        return self.output_num_frames != self.buffer_num_frames


@struct.dataclass
class AudioBufferState:
    input_resampler: jnp.ndarray | None
    output_resampler: jnp.ndarray | None
    split: splitting.SplittingState


def init_state(cfg: BufferConfig, dtype=jnp.float32) -> AudioBufferState:
    ch = (cfg.buffer_num_channels,)
    return AudioBufferState(
        input_resampler=(
            resampler.init_state(cfg.input_num_frames, ch, dtype)
            if cfg.input_resampling
            else None
        ),
        output_resampler=(
            resampler.init_state(cfg.buffer_num_frames, ch, dtype)
            if cfg.output_resampling
            else None
        ),
        split=splitting.init_state(cfg.num_bands, ch, dtype),
    )


def copy_from(cfg: BufferConfig, state: AudioBufferState, x):
    """API input frame -> processing-domain frame.

    Args:
      x: (input_num_frames, input_num_channels) float in [-1, 1].

    Returns:
      (state, y) with y (buffer_num_frames, buffer_num_channels) float_s16.

    Mirrors AudioBuffer::CopyFrom (audio_buffer.cc:116-166): downmix, then
    per-channel resample, then FloatToFloatS16 (clamping).
    """
    if cfg.input_num_channels > 1 and cfg.buffer_num_channels == 1:
        if cfg.downmix_method == DownmixMethod.AVERAGE_CHANNELS:
            x = jnp.mean(x, axis=-1, keepdims=True)
        else:
            x = x[..., :1]
    else:
        x = x[..., : cfg.buffer_num_channels]

    if cfg.input_resampling:
        new_buf, x = resampler.resample_frame(
            state.input_resampler, x, cfg.input_num_frames, cfg.buffer_num_frames
        )
        state = state.replace(input_resampler=new_buf)

    y = jnp.clip(x, -1.0, 1.0) * 32768.0
    return state, y


def copy_to(cfg: BufferConfig, state: AudioBufferState, y):
    """Processing-domain frame -> API output frame.

    Args:
      y: (buffer_num_frames, buffer_num_channels) float_s16.

    Returns:
      (state, out) with out (output_num_frames, output_num_channels) in
      [-1, 1].

    Mirrors AudioBuffer::CopyTo (audio_buffer.cc:168-192): FloatS16ToFloat
    (clamping), per-channel resample, replicate first channel into extra
    output channels.
    """
    x = jnp.clip(y, -32768.0, 32768.0) * (1.0 / 32768.0)
    if cfg.output_resampling:
        # The pipeline may have narrowed to mono (set_num_channels after
        # the band split, audio_processing_impl.cc:1365-1373): resample
        # only the live channels; the extra per-channel resampler state
        # columns go stale exactly like the reference's unused
        # PushSincResampler instances.
        st = state.output_resampler
        ch = x.shape[-1]
        new_buf, x = resampler.resample_frame(
            st[..., :ch], x, cfg.buffer_num_frames, cfg.output_num_frames
        )
        if ch != st.shape[-1]:
            new_buf = st.at[..., :ch].set(new_buf)
        state = state.replace(output_resampler=new_buf)

    extra = cfg.output_num_channels - x.shape[-1]
    if extra > 0:
        x = jnp.concatenate([x] + [x[..., :1]] * extra, axis=-1)
    return state, x


def split_into_frequency_bands(cfg: BufferConfig, state: AudioBufferState, y):
    """(buffer_num_frames, ch) -> (num_bands, 160, ch) (audio_buffer.cc:374)."""
    bands, new_split = splitting.analysis(y, state.split, cfg.num_bands)
    return state.replace(split=new_split), bands


def merge_frequency_bands(cfg: BufferConfig, state: AudioBufferState, bands):
    """(num_bands, 160, ch) -> (buffer_num_frames, ch) (audio_buffer.cc:378).

    Like copy_to, `bands` may carry fewer channels than the buffer when a
    mono-mode echo controller narrowed the pipeline after the band split
    (set_num_channels, audio_processing_impl.cc:1365-1373): only the live
    channels are merged and the extra per-channel synthesis state goes
    stale, as in the reference."""
    ch = bands.shape[-1]
    split = state.split
    if ch != cfg.buffer_num_channels:
        import jax

        sliced = jax.tree_util.tree_map(lambda a: a[..., :ch], split)
        y, new_sliced = splitting.synthesis(bands, sliced, cfg.num_bands)
        new_split = jax.tree_util.tree_map(
            lambda full, part: full.at[..., :ch].set(part), split, new_sliced
        )
    else:
        y, new_split = splitting.synthesis(bands, split, cfg.num_bands)
    return state.replace(split=new_split), y
