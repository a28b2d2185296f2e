"""Render-side buffering for AEC3: decimator, alignment mixer, delay buffer.

Reference: aec3/decimator.{h,cc}, aec3/alignment_mixer.cc,
aec3/render_delay_buffer.cc (+ block/spectrum/fft/downsampled ring buffers).

TPU re-design: the four C++ ring buffers become fixed-size arrays in one
state pytree with traced int32 read/write indices; the exact index algebra
of the reference is preserved (blocks increment forward, spectra/ffts
decrement, the low-rate buffer moves in -16 sample steps and stores each
decimated sub-block time-reversed). All window reads used by the filters are
static-size gathers modulo the buffer length.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from webrtc_audio_processing_tpu.models.aec3 import fft as aec3_fft
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config
from webrtc_audio_processing_tpu.ops import biquad

BLOCK_SIZE = 64
NUM_BINS = 65
NUM_BLOCKS_PER_SECOND = 250
MATCHED_FILTER_WINDOW_SUB_BLOCKS = 32
MATCHED_FILTER_SHIFT_SUB_BLOCKS = 24

# Decimator coefficient tables (decimator.cc:22-52).
_LOW_PASS_DS4_B = np.array(
    [[0.0180919877, 0.00320961363, 0.0180919877],
     [1.0, -1.24550459, 1.0],
     [1.0, -1.4221681, 1.0]], np.float32)
_LOW_PASS_DS4_A = np.array(
    [[-1.5183195, 0.633165865],
     [-1.49784254, 0.853586692],
     [-1.49791282, 0.969572384]], np.float32)
_BAND_PASS_DS8_B = np.tile(
    np.array([[0.103304783, 0.0, -0.103304783]], np.float32), (5, 1))
_BAND_PASS_DS8_A = np.tile(
    np.array([[-1.520363, 0.793390435]], np.float32), (5, 1))
_HIGH_PASS_B = np.array([[0.757076375, -1.51415275, 0.757076375]], np.float32)
_HIGH_PASS_A = np.array([[-1.45424359, 0.574061915]], np.float32)


def get_down_sampled_buffer_size(down_sampling_factor, num_filters):
    """GetDownSampledBufferSize (aec3_common.h:73-78)."""
    return (BLOCK_SIZE // down_sampling_factor) * (
        MATCHED_FILTER_SHIFT_SUB_BLOCKS * num_filters
        + MATCHED_FILTER_WINDOW_SUB_BLOCKS
        + 1
    )


def get_render_delay_buffer_size(down_sampling_factor, num_filters,
                                 filter_length_blocks):
    """GetRenderDelayBufferSize (aec3_common.h:80-87)."""
    return (
        get_down_sampled_buffer_size(down_sampling_factor, num_filters)
        // (BLOCK_SIZE // down_sampling_factor)
        + filter_length_blocks
        + 1
    )


@dataclass(frozen=True)
class BufferGeometry:
    """Static geometry derived from the config."""

    num_bands: int
    num_channels: int
    down_sampling_factor: int
    sub_block_size: int
    num_blocks: int  # L: block/spectrum/fft ring length
    ds_size: int  # low-rate ring length (samples)
    buffer_headroom: int  # refined filter length

    @staticmethod
    def create(config: EchoCanceller3Config, sample_rate_hz: int,
               num_channels: int) -> "BufferGeometry":
        ds = config.delay.down_sampling_factor
        return BufferGeometry(
            num_bands=sample_rate_hz // 16000,
            num_channels=num_channels,
            down_sampling_factor=ds,
            sub_block_size=BLOCK_SIZE // ds,
            num_blocks=get_render_delay_buffer_size(
                ds, config.delay.num_filters,
                config.filter.refined.length_blocks),
            ds_size=get_down_sampled_buffer_size(ds, config.delay.num_filters),
            buffer_headroom=config.filter.refined.length_blocks,
        )

    @property
    def max_delay(self) -> int:
        return self.num_blocks - 1 - self.buffer_headroom


@struct.dataclass
class AlignmentMixerState:
    """AlignmentMixer adaptive-selection state (alignment_mixer.cc:56-160)."""

    strong_block_counters: jnp.ndarray  # (2,) int32
    cumulative_energies: jnp.ndarray  # (C,)
    block_counter: jnp.ndarray  # () int32
    selected_channel: jnp.ndarray  # () int32


@struct.dataclass
class RenderDelayBufferState:
    blocks: jnp.ndarray  # (L, bands, 64, C)
    spectra: jnp.ndarray  # (L, C, 65)
    ffts: jnp.ndarray  # (L, C, 65) complex64
    lowrate: jnp.ndarray  # (DS,)
    b_write: jnp.ndarray  # () int32, increments
    b_read: jnp.ndarray
    s_write: jnp.ndarray  # () int32, decrements (shared by spectra+ffts)
    s_read: jnp.ndarray
    lr_write: jnp.ndarray  # () int32, steps of -sub_block_size
    lr_read: jnp.ndarray
    prev_band0: jnp.ndarray  # (C, 64) last inserted band-0 block

    delay: jnp.ndarray  # () int32 (valid when has_delay)
    has_delay: jnp.ndarray  # () bool

    render_activity: jnp.ndarray  # () bool
    render_activity_counter: jnp.ndarray  # () int32
    min_latency_blocks: jnp.ndarray  # () int32
    excess_render_detection_counter: jnp.ndarray  # () int32

    mixer: AlignmentMixerState
    decimator_aa: biquad.BiquadCascadeState  # anti-aliasing filter
    decimator_nr: biquad.BiquadCascadeState  # noise-reduction filter


EVENT_NONE = 0
EVENT_RENDER_OVERRUN = 1
EVENT_RENDER_UNDERRUN = 2


def init_state(geo: BufferGeometry, config: EchoCanceller3Config,
               dtype=jnp.float32) -> RenderDelayBufferState:
    aa_sections = 3 if geo.down_sampling_factor == 4 else 5
    nr_sections = 0 if geo.down_sampling_factor == 8 else 1
    state = RenderDelayBufferState(
        blocks=jnp.zeros((geo.num_blocks, geo.num_bands, BLOCK_SIZE,
                          geo.num_channels), dtype),
        spectra=jnp.zeros((geo.num_blocks, geo.num_channels, NUM_BINS), dtype),
        ffts=jnp.zeros((geo.num_blocks, geo.num_channels, NUM_BINS),
                       jnp.complex64),
        lowrate=jnp.zeros((geo.ds_size,), dtype),
        b_write=jnp.asarray(0, jnp.int32),
        b_read=jnp.asarray(0, jnp.int32),
        s_write=jnp.asarray(0, jnp.int32),
        s_read=jnp.asarray(0, jnp.int32),
        lr_write=jnp.asarray(0, jnp.int32),
        lr_read=jnp.asarray(0, jnp.int32),
        prev_band0=jnp.zeros((geo.num_channels, BLOCK_SIZE), dtype),
        delay=jnp.asarray(config.delay.default_delay, jnp.int32),
        has_delay=jnp.asarray(False),
        render_activity=jnp.asarray(False),
        render_activity_counter=jnp.asarray(0, jnp.int32),
        min_latency_blocks=jnp.asarray(0, jnp.int32),
        excess_render_detection_counter=jnp.asarray(0, jnp.int32),
        mixer=AlignmentMixerState(
            strong_block_counters=jnp.zeros((2,), jnp.int32),
            cumulative_energies=jnp.zeros((geo.num_channels,), dtype),
            block_counter=jnp.asarray(0, jnp.int32),
            selected_channel=jnp.asarray(0, jnp.int32),
        ),
        decimator_aa=biquad.init_state(aa_sections),
        decimator_nr=biquad.init_state(nr_sections),
    )
    return reset(geo, config, state)


def _apply_total_delay(geo: BufferGeometry, state, total_delay):
    """ApplyTotalDelay (render_delay_buffer.cc:349-355)."""
    return state.replace(
        b_read=jnp.mod(state.b_write - total_delay, geo.num_blocks),
        s_read=jnp.mod(state.s_write + total_delay, geo.num_blocks),
    )


def reset(geo: BufferGeometry, config: EchoCanceller3Config,
          state: RenderDelayBufferState) -> RenderDelayBufferState:
    """RenderDelayBufferImpl::Reset (render_delay_buffer.cc:148-186).

    No external audio buffer delay support yet: applies the default delay and
    unsets the delay estimate.
    """
    state = state.replace(
        min_latency_blocks=jnp.asarray(0, jnp.int32),
        excess_render_detection_counter=jnp.asarray(0, jnp.int32),
        lr_read=jnp.mod(state.lr_write + geo.sub_block_size, geo.ds_size),
    )
    state = _apply_total_delay(geo, state, config.delay.default_delay)
    return state.replace(has_delay=jnp.asarray(False))


def _select_state(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b
    )


def _alignment_mix(config_mixing, mixer: AlignmentMixerState, band0):
    """AlignmentMixer::ProduceOutput (alignment_mixer.cc:63-160).

    band0: (C, 64). Returns (new_mixer_state, (64,) mono signal).
    """
    num_channels = band0.shape[0]
    if num_channels == 1:
        return mixer, band0[0]
    if config_mixing.downmix:
        return mixer, jnp.mean(band0, axis=0)
    if not config_mixing.adaptive_selection:
        return mixer, band0[0]

    # Adaptive channel selection (SelectChannel, :97-160).
    threshold = BLOCK_SIZE * config_mixing.activity_power_threshold
    blocks_lr = NUM_BLOCKS_PER_SECOND // 2
    good_lr = config_mixing.prefer_first_two_channels & (
        (mixer.strong_block_counters[0] > blocks_lr)
        | (mixer.strong_block_counters[1] > blocks_lr)
    )
    x2 = jnp.sum(band0**2, axis=-1)  # (C,)
    analyze = jnp.where(
        good_lr, jnp.arange(num_channels) < 2,
        jnp.ones((num_channels,), bool)
    )

    block_counter = mixer.block_counter + 1
    strong = jnp.zeros((2,), jnp.int32)
    if num_channels >= 2:
        strong = ((x2[:2] > threshold) & analyze[:2]).astype(jnp.int32)
    strong_counters = mixer.strong_block_counters + strong

    smooth_after = 60 * NUM_BLOCKS_PER_SECOND
    cum = jnp.where(
        analyze,
        jnp.where(
            block_counter <= smooth_after,
            mixer.cumulative_energies + x2,
            mixer.cumulative_energies
            + (1.0 / (10 * NUM_BLOCKS_PER_SECOND))
            * (x2 - mixer.cumulative_energies),
        ),
        mixer.cumulative_energies,
    )
    cum = jnp.where(
        (block_counter == smooth_after) & analyze,
        cum * (1.0 / smooth_after), cum,
    )

    masked = jnp.where(analyze, cum, -jnp.inf)
    strongest = jnp.argmax(masked).astype(jnp.int32)
    switch = (good_lr & (mixer.selected_channel > 1)) | (
        cum[strongest] > 2.0 * cum[mixer.selected_channel]
    )
    selected = jnp.where(switch, strongest, mixer.selected_channel)

    new_mixer = AlignmentMixerState(
        strong_block_counters=strong_counters,
        cumulative_energies=cum,
        block_counter=block_counter,
        selected_channel=selected,
    )
    return new_mixer, band0[selected]


def _decimate(geo: BufferGeometry, state, x):
    """Decimator::Decimate (decimator.cc:74-91). x: (64,)."""
    if geo.down_sampling_factor == 4:
        aa_b, aa_a = _LOW_PASS_DS4_B, _LOW_PASS_DS4_A
    else:
        aa_b, aa_a = _BAND_PASS_DS8_B, _BAND_PASS_DS8_A
    new_aa, y = biquad.process(
        jnp.asarray(aa_b), jnp.asarray(aa_a), state.decimator_aa, x
    )
    if geo.down_sampling_factor != 8:
        new_nr, y = biquad.process(
            jnp.asarray(_HIGH_PASS_B), jnp.asarray(_HIGH_PASS_A),
            state.decimator_nr, y,
        )
    else:
        new_nr = state.decimator_nr
    return (
        state.replace(decimator_aa=new_aa, decimator_nr=new_nr),
        y[:: geo.down_sampling_factor],
    )


def insert(geo: BufferGeometry, config: EchoCanceller3Config,
           state: RenderDelayBufferState, block):
    """RenderDelayBufferImpl::Insert (render_delay_buffer.cc:189-231).

    block: (bands, 64, C). Returns (state, event).
    """
    previous_write = state.b_write

    # IncrementWriteIndices (:438-443).
    state = state.replace(
        lr_write=jnp.mod(state.lr_write - geo.sub_block_size, geo.ds_size),
        b_write=jnp.mod(state.b_write + 1, geo.num_blocks),
        s_write=jnp.mod(state.s_write - 1, geo.num_blocks),
    )

    overrun = (state.lr_read == state.lr_write) | (state.b_read == state.b_write)

    # Render activity detection (:214-218, :415-419).
    x0 = block[0, :, 0]
    active = jnp.sum(x0 * x0) > (
        config.render_levels.active_render_limit**2
    ) * BLOCK_SIZE
    counter = state.render_activity_counter + jnp.where(
        state.render_activity, 0, active.astype(jnp.int32)
    )
    state = state.replace(
        render_activity_counter=counter,
        render_activity=state.render_activity | (counter >= 20),
    )

    # InsertBlock (:367-407).
    gain = 10.0 ** (config.render_levels.render_power_gain_db / 20.0)
    if gain != 1.0:
        block = block * gain
    state = state.replace(
        blocks=state.blocks.at[state.b_write].set(block)
    )

    band0 = jnp.swapaxes(block[0], 0, 1)  # (C, 64)
    new_mixer, mono = _alignment_mix(
        config.delay.render_alignment_mixing, state.mixer, band0
    )
    state = state.replace(mixer=new_mixer)
    state, ds = _decimate(geo, state, mono)
    # Decimated sub-block stored time-reversed at the write index (:389).
    state = state.replace(
        lowrate=jax.lax.dynamic_update_slice(
            state.lowrate, ds[::-1], (state.lr_write,)
        )
    )

    X = aec3_fft.padded_fft(band0, state.prev_band0)  # (C, 65)
    state = state.replace(
        ffts=state.ffts.at[state.s_write].set(X),
        spectra=state.spectra.at[state.s_write].set(aec3_fft.spectrum(X)),
        prev_band0=band0,
    )

    # Overrun triggers a reset (:227-229).
    reset_state = reset(geo, config, state)
    state = _select_state(overrun, reset_state, state)
    event = jnp.where(overrun, EVENT_RENDER_OVERRUN, EVENT_NONE)
    return state, event


def buffer_latency(geo: BufferGeometry, state) -> jnp.ndarray:
    """BufferLatency (render_delay_buffer.cc:431-436), in blocks."""
    samples = jnp.mod(geo.ds_size + state.lr_read - state.lr_write, geo.ds_size)
    return samples // geo.sub_block_size


def prepare_capture_processing(geo: BufferGeometry,
                               config: EchoCanceller3Config,
                               state: RenderDelayBufferState):
    """RenderDelayBufferImpl::PrepareCaptureProcessing
    (render_delay_buffer.cc:238-289). Returns (state, event)."""
    latency = buffer_latency(geo, state)
    min_latency = jnp.minimum(state.min_latency_blocks, latency)
    counter = state.excess_render_detection_counter + 1
    check = counter >= config.buffering.excess_render_detection_interval_blocks
    excess = check & (
        min_latency > config.buffering.max_allowed_excess_render_blocks
    )
    state = state.replace(
        min_latency_blocks=jnp.where(check, latency, min_latency),
        excess_render_detection_counter=jnp.where(check, 0, counter),
    )

    underrun = state.lr_read == state.lr_write

    def inc_read(state):
        can_move = state.b_read != state.b_write
        return state.replace(
            b_read=jnp.where(
                can_move, jnp.mod(state.b_read + 1, geo.num_blocks), state.b_read
            ),
            s_read=jnp.where(
                can_move, jnp.mod(state.s_read - 1, geo.num_blocks), state.s_read
            ),
        )

    # Normal path: advance low-rate and block read indices.
    normal = inc_read(state).replace(
        lr_read=jnp.mod(state.lr_read - geo.sub_block_size, geo.ds_size)
    )
    # Underrun path: advance block read only; delay shrinks by one.
    under = inc_read(state)
    under = under.replace(
        delay=jnp.where(
            under.has_delay, jnp.maximum(under.delay - 1, 0), under.delay
        )
    )
    # Excess render: full reset.
    excess_state = reset(geo, config, state)

    state = _select_state(
        excess, excess_state, _select_state(underrun, under, normal)
    )
    event = jnp.where(
        excess,
        EVENT_RENDER_OVERRUN,
        jnp.where(underrun & ~excess, EVENT_RENDER_UNDERRUN, EVENT_NONE),
    )

    # Render activity hand-off (:283-287).
    activity = state.render_activity
    state = state.replace(
        render_activity_counter=jnp.where(
            activity, 0, state.render_activity_counter
        ),
        render_activity=state.render_activity & ~activity,
    )
    return state, event, activity


def align_from_delay(geo: BufferGeometry, config: EchoCanceller3Config,
                     state: RenderDelayBufferState, delay):
    """RenderDelayBufferImpl::AlignFromDelay (render_delay_buffer.cc:292-318).

    Returns (state, changed: bool).
    """
    unchanged = state.has_delay & (state.delay == delay)
    latency = buffer_latency(geo, state)
    total = jnp.clip(latency + delay, 0, geo.max_delay)
    applied = _apply_total_delay(geo, state, total).replace(
        delay=delay, has_delay=jnp.asarray(True)
    )
    return _select_state(unchanged, state, applied), ~unchanged


# ---------------------------------------------------------------- reads


def fft_window(geo: BufferGeometry, state, num_partitions: int):
    """The `num_partitions` FFTs starting at Position() (newest first).

    Returns (P, C, 65) complex."""
    idx = jnp.mod(state.s_read + jnp.arange(num_partitions), geo.num_blocks)
    return state.ffts[idx]


def spectrum_window(geo: BufferGeometry, state, num_partitions: int):
    """(P, C, 65) spectra starting at the read position."""
    idx = jnp.mod(state.s_read + jnp.arange(num_partitions), geo.num_blocks)
    return state.spectra[idx]


def spectrum_at(geo: BufferGeometry, state, offset):
    """RenderBuffer::Spectrum(offset): (C, 65)."""
    return state.spectra[jnp.mod(state.s_read + offset, geo.num_blocks)]


def block_at(geo: BufferGeometry, state, offset: int = 0):
    """RenderBuffer::GetBlock(offset): (bands, 64, C)."""
    return state.blocks[jnp.mod(state.b_read + offset, geo.num_blocks)]


def spectral_sum(geo: BufferGeometry, state, num_spectra: int):
    """RenderBuffer::SpectralSum (render_buffer.cc:29-41): (65,)."""
    return jnp.sum(spectrum_window(geo, state, num_spectra), axis=(0, 1))


def headroom(geo: BufferGeometry, state):
    """RenderBuffer::Headroom (render_buffer.h:80-92)."""
    return jnp.where(
        state.s_write < state.s_read,
        state.s_read - state.s_write,
        geo.num_blocks - state.s_write + state.s_read,
    )


def compute_delay(geo: BufferGeometry, state):
    """RenderDelayBufferImpl::ComputeDelay (render_delay_buffer.cc:338-346)."""
    latency = buffer_latency(geo, state)
    internal = jnp.where(
        state.s_read >= state.s_write,
        state.s_read - state.s_write,
        geo.num_blocks + state.s_read - state.s_write,
    )
    return internal - latency
