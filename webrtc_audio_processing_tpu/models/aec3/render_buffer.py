"""Render-side buffering for AEC3: decimator, alignment mixer, delay buffer.

Reference: aec3/decimator.{h,cc}, aec3/alignment_mixer.cc,
aec3/render_delay_buffer.cc (+ block/spectrum/fft/downsampled ring buffers).

TPU re-design: the four C++ ring buffers become fixed-size arrays in one
state pytree. The ring *write* positions are pure functions of the global
insert ordinal ``n`` (they advance deterministically and are never reset by
any event — render_delay_buffer.cc resets only the read side), so ``n`` is
threaded through as an UNBATCHED scalar: under ``vmap`` over a stream batch
every write lowers to one dynamic-update-slice at a batch-uniform index
instead of a per-stream scatter (which XLA's scatter expander would
serialize into a loop over streams). Per-stream state keeps only the two
read-side distances:

  * ``b_delay``   = (b_write - b_read) mod L = (s_read - s_write) mod L —
    the reference advances the block read/spectrum read pointers together
    (render_delay_buffer.cc:438-443, :349-355), so one distance covers both;
  * ``lr_latency`` = (lr_read - lr_write) mod DS in samples for the
    decimated low-rate buffer.

The exact index algebra of the reference is preserved: blocks increment
forward, spectra/ffts decrement, the low-rate buffer moves in -16 sample
steps and stores each decimated sub-block time-reversed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from webrtc_audio_processing_tpu.models.aec3 import fft as aec3_fft
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config
from webrtc_audio_processing_tpu.ops import biquad, pallas_span

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
    # Mirror rows appended to each ring: rows [L, L+pad) duplicate rows
    # [0, pad) so that every window read — all are *contiguous* spans of
    # ring rows [start, start+W), W <= pad+1 — needs no wrap handling and
    # can be a single per-stream DMA (ops/pallas_span.py). `ring_write`
    # maintains the mirror on insert.
    pad: int = 0
    # Storage dtype for the three large ring buffers (blocks/spectra/ffts).
    # "float32" (default) is reference-exact; "bfloat16" halves the
    # dominant per-stream HBM state (~500 KB -> ~250 KB at 48 kHz stereo)
    # and ring read/write bandwidth for large-scale serving. Reads are
    # upcast to f32 before any arithmetic, so only the stored render
    # history is quantized.
    ring_dtype: str = "float32"

    @staticmethod
    def create(config: EchoCanceller3Config, sample_rate_hz: int,
               num_channels: int,
               ring_dtype: str = "float32") -> "BufferGeometry":
        ds = config.delay.down_sampling_factor
        num_blocks = get_render_delay_buffer_size(
            ds, config.delay.num_filters,
            config.filter.refined.length_blocks)
        # Maximum contiguous window width any reader uses (the same
        # formulas as echo_remover's consolidated windows plus the
        # stationarity estimator's 13-row window); pad = maxW - 1.
        p_ref_max = max(config.filter.refined.length_blocks,
                        config.filter.refined_initial.length_blocks)
        p_coarse_max = max(config.filter.coarse.length_blocks,
                           config.filter.coarse_initial.length_blocks)
        headroom_blocks = int(config.delay.delay_headroom_samples) // BLOCK_SIZE
        delay_bound = max(config.filter.refined.length_blocks,
                          headroom_blocks + 1)
        spec_win_len = min(
            max(p_ref_max, delay_bound + 2)
            + max(config.echo_model.render_post_window_size, 1) + 1,
            num_blocks,
        )
        # +2: the pair path reads per-frame chains of width
        # spec_win_len + (nblocks_per_frame - 1), nblocks <= 3.
        max_w = max(spec_win_len + 2, min(delay_bound, num_blocks) + 2,
                    p_ref_max, p_coarse_max, 13)
        # The span-gather DMA loads 8-row-aligned wide windows
        # (pallas_span.aligned_rows); size the mirror so the widest
        # aligned load from any start < L stays in bounds.
        lp = max(
            ((num_blocks - 1) // 8) * 8 + pallas_span.aligned_rows(max_w),
            num_blocks,
        )
        return BufferGeometry(
            num_bands=sample_rate_hz // 16000,
            num_channels=num_channels,
            down_sampling_factor=ds,
            sub_block_size=BLOCK_SIZE // ds,
            num_blocks=num_blocks,
            ds_size=get_down_sampled_buffer_size(ds, config.delay.num_filters),
            buffer_headroom=config.filter.refined.length_blocks,
            ring_dtype=ring_dtype,
            pad=min(lp - num_blocks, num_blocks),
        )

    @property
    def ring_jnp_dtype(self):
        return jnp.dtype(self.ring_dtype)

    @property
    def max_delay(self) -> int:
        return self.num_blocks - 1 - self.buffer_headroom

    @property
    def block_row_shape(self) -> tuple:
        """Logical shape of one `blocks` ring row."""
        return (self.num_bands, BLOCK_SIZE, self.num_channels)

    @property
    def spec_row_shape(self) -> tuple:
        """Logical shape of one spectrum / FFT-plane ring row."""
        return (self.num_channels, NUM_BINS)

    # ---- flat row widths. The span-gather DMA (ops/pallas_span.py)
    # requires lane (last-dim) widths that are multiples of 128, so the
    # stored rows are zero-padded to `*_row_fp`; the FFT planes and the
    # spectrum share one ring row ([re | im | spectrum | 0-pad]) since
    # they are written at the same index and read from the same start.

    @property
    def blocks_row_f(self) -> int:
        return self.num_bands * BLOCK_SIZE * self.num_channels

    @property
    def blocks_row_fp(self) -> int:
        return ((self.blocks_row_f + 127) // 128) * 128

    @property
    def fft_row_f(self) -> int:
        return 2 * self.num_channels * NUM_BINS

    @property
    def spec_row_f(self) -> int:
        return self.num_channels * NUM_BINS

    @property
    def sf_row_fp(self) -> int:
        return ((self.fft_row_f + self.spec_row_f + 127) // 128) * 128


@struct.dataclass
class AlignmentMixerState:
    """AlignmentMixer adaptive-selection state (alignment_mixer.cc:56-160)."""

    strong_block_counters: jnp.ndarray  # (2,) int32
    cumulative_energies: jnp.ndarray  # (C,)
    block_counter: jnp.ndarray  # () int32
    selected_channel: jnp.ndarray  # () int32


@struct.dataclass
class RenderDelayBufferState:
    # The rings are stored FLAT per row — (L+pad, F) rather than (L, bands,
    # 64, C) / (L, C, 65):
    #  * flat rows keep one (batch-major, row-minor) layout for both the
    #    uniform-index row write (dynamic-update-slice) and the span-gather
    #    window reads (with multi-dim rows XLA's layout assignment
    #    materialized whole-ring copies per inserted block);
    #  * rows [L, L+pad) mirror rows [0, pad) so every window read is one
    #    contiguous per-stream DMA (ops/pallas_span.py), wrap-free;
    #  * row widths are zero-padded to 128-lane multiples (the DMA slice
    #    alignment requirement), and the FFT planes + spectrum pack into
    #    ONE row ([re | im | spectrum | 0]) — same write index, same read
    #    start, one DMA serves both windows;
    #  * the FFT planes are PLANAR-REAL rather than complex64: the ring
    #    keeps the (optionally bfloat16) ring dtype.
    blocks: jnp.ndarray  # (L+pad, blocks_row_fp) flat rows
    sf: jnp.ndarray  # (L+pad, sf_row_fp): [fft re | fft im | spectrum | 0]
    # Write-behind staging for the sf ring: the 5 rows of one frame pair
    # (2 for the even frame, 3 for the odd) accumulate here and are flushed
    # into `sf` as one uninterrupted dynamic-update-slice chain at the START
    # of the next pair (flush_sf_pending). Rationale: interleaving sf row
    # writes with the async span-gather reads inside one jitted step made
    # XLA's copy insertion materialize a full ring copy (B x 184 x 512,
    # ~1.2 ms/frame-batch at B=1024) before each write group that followed
    # a read group; with all writes in one chain and reads overlaid from
    # this staging buffer (sf_span), the ring updates in place.
    sf_pending: jnp.ndarray  # (5, sf_row_fp) float32
    # Same write-behind staging for the blocks ring (flush_pending /
    # blocks_span): without it the in-pair row writes interleaved with the
    # capture blocks' span-gather reads cost two full-ring copy insertions
    # per pair (2 x ~0.93 ms at B=1024, 48 kHz stereo).
    blocks_pending: jnp.ndarray  # (5, blocks_row_fp) float32
    lowrate: jnp.ndarray  # (DS,)
    b_delay: jnp.ndarray  # () int32: (b_write - b_read) mod L
    lr_latency: jnp.ndarray  # () int32: (lr_read - lr_write) mod DS, samples
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

# Blocks per 10 ms frame pair at the 16 kHz band rate: 2 on the even frame
# + 3 on the odd (echo_canceller3.py _split_blocks) — the size of the sf
# write-behind staging buffer.
PAIR_BLOCKS = 5

# Scratch rows past the mirror region: ring_write_group dumps its second
# dynamic-update-slice here when neither the mirror nor the wrap case
# applies, and mirror-case writes may spill up to PAIR_BLOCKS - 1 rows
# past L + pad. Never read.
RING_SLACK = 8


# --------------------------------------------------- write-position algebra
#
# After n inserts (n counts the post-increment ordinal of IncrementWriteIndices,
# render_delay_buffer.cc:438-443):
#   b_write(n)  =  n mod L          (blocks increment forward)
#   s_write(n)  = -n mod L          (spectra/ffts decrement)
#   lr_write(n) = -n*sub mod DS     (low-rate, -sub_block_size sample steps)
# Read positions follow from the per-stream distances:
#   b_read  = (b_write - b_delay) mod L
#   s_read  = (s_write + b_delay) mod L
#   lr_read = (lr_write + lr_latency) mod DS


def _as_n(n):
    return jnp.asarray(n, jnp.int32)


@jax.custom_batching.custom_vmap
def uniform_dus(buf, upd, idx):
    """dynamic_update_slice along axis 0 at a BATCH-UNIFORM index.

    jax's vmap batching rule for dynamic_update_slice emits a `scatter`
    even when the index is unbatched, and XLA:TPU lowers that scatter as
    a full-operand copy — for the AEC3 rings that materialized whole-ring
    copies (hundreds of KB/stream) on every block insert, the single
    largest cost of the 48 kHz step. This wrapper keeps the batched case
    a true batched dynamic_update_slice (in-place under buffer donation).

    buf: (L, ...); upd: (k, ...) with k static; idx: () int32, identical
    across the stream batch (all ring write indices are pure functions of
    the global insert ordinal `n`).
    """
    start = (idx,) + (jnp.zeros((), jnp.int32),) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, upd.astype(buf.dtype), start)


@uniform_dus.def_vmap
def _uniform_dus_vmap(axis_size, in_batched, buf, upd, idx):
    assert not in_batched[2], "ring write index must be batch-uniform"
    if not in_batched[0]:
        buf = jnp.broadcast_to(buf, (axis_size,) + buf.shape)
    if not in_batched[1]:
        upd = jnp.broadcast_to(upd, (axis_size,) + upd.shape)
    z = jnp.zeros((), jnp.int32)
    start = (z, idx) + (z,) * (buf.ndim - 2)
    return (
        jax.lax.dynamic_update_slice(buf, upd.astype(buf.dtype), start),
        True,
    )


_UNIFORM_DS = {}


def uniform_ds(buf, idx, k: int):
    """dynamic_slice of k rows at a BATCH-UNIFORM index (vmap keeps it a
    true batched dynamic_slice rather than a serialized gather)."""
    f = _UNIFORM_DS.get(k)
    if f is None:

        @jax.custom_batching.custom_vmap
        def ds(buf, idx):
            start = (idx,) + (jnp.zeros((), jnp.int32),) * (buf.ndim - 1)
            return jax.lax.dynamic_slice(buf, start, (k,) + buf.shape[1:])

        @ds.def_vmap
        def _ds_vmap(axis_size, in_batched, buf, idx):
            assert not in_batched[1], "ring read index must be batch-uniform"
            if not in_batched[0]:
                buf = jnp.broadcast_to(buf, (axis_size,) + buf.shape)
            z = jnp.zeros((), jnp.int32)
            start = (z, idx) + (z,) * (buf.ndim - 2)
            return (
                jax.lax.dynamic_slice(
                    buf, start, (buf.shape[0], k) + buf.shape[2:]
                ),
                True,
            )

        _UNIFORM_DS[k] = f = ds
    return f(buf, idx)


def ring_write_group(geo: BufferGeometry, buf, group, start):
    """Write K contiguous ring rows [start, start+K) with mirror upkeep in
    TWO dynamic-update-slices (instead of 2K single-row writes — on the
    (8, 128)-tiled ring a 1-row write read-modify-writes a full 8-row tile,
    an 8x amplification the grouped write amortizes).

    group: (K, F) rows in ASCENDING ring order; start: () batch-uniform
    int32 in [0, L); K static with K <= pad. Three cases for the second
    write: start < pad duplicates the group into the mirror region
    [start+L, ...); a wrapped tail (start+K > L, written by the first DUS
    into valid mirror rows) copies back to the primary rows [0, t); else
    the write lands in the RING_SLACK scratch rows and is never read.
    """
    K = group.shape[0]
    L, pad = geo.num_blocks, geo.pad
    assert K <= pad, (K, pad)
    group = group.astype(buf.dtype)
    buf = uniform_dus(buf, group, start)

    t = jnp.maximum(start + K - L, 0)  # wrapped tail length
    mirror_case = start < pad
    wrap_case = t > 0
    p2 = jnp.where(mirror_case, start + L,
                   jnp.where(wrap_case, 0, L + pad))
    cur = uniform_ds(buf, p2, K)
    # roll(group, t): row i <- group[(i - t) mod K]; t is batch-uniform so
    # a one-hot contraction keeps it vectorized under vmap.
    i = jnp.arange(K)
    oh = (jnp.mod(i[:, None] - t, K) == i[None, :]).astype(jnp.float32)
    rolled = jnp.matmul(
        oh, group.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(buf.dtype)
    sel = jnp.where(mirror_case, group, rolled)
    keep = mirror_case | (i < t) | (~mirror_case & ~wrap_case)
    blended = jnp.where(keep[:, None], sel, cur)
    return uniform_dus(buf, blended, p2)


def ring_write(geo: BufferGeometry, buf, row, idx):
    """Write one ring row at batch-uniform `idx`, maintaining the mirror.

    Rows [L, L+pad) duplicate rows [0, pad) so window reads are contiguous
    spans. When idx >= pad the second write lands on the same row (same
    data — a cheap no-op) which keeps the index batch-uniform."""
    buf = uniform_dus(buf, row, idx)
    if geo.pad == 0:
        return buf
    mirror = idx + jnp.where(idx < geo.pad, geo.num_blocks, 0)
    return uniform_dus(buf, row, mirror)


def b_write_index(geo: BufferGeometry, n):
    return jnp.mod(_as_n(n), geo.num_blocks)


def s_write_index(geo: BufferGeometry, n):
    return jnp.mod(-_as_n(n), geo.num_blocks)


def lr_write_index(geo: BufferGeometry, n):
    return jnp.mod(-_as_n(n) * geo.sub_block_size, geo.ds_size)


def s_read_index(geo: BufferGeometry, state, n):
    return jnp.mod(-_as_n(n) + state.b_delay, geo.num_blocks)


def b_read_index(geo: BufferGeometry, state, n):
    return jnp.mod(_as_n(n) - state.b_delay, geo.num_blocks)


def lr_read_index(geo: BufferGeometry, state, n):
    return jnp.mod(
        -_as_n(n) * geo.sub_block_size + state.lr_latency, geo.ds_size
    )


def init_state(geo: BufferGeometry, config: EchoCanceller3Config,
               dtype=jnp.float32) -> RenderDelayBufferState:
    aa_sections = 3 if geo.down_sampling_factor == 4 else 5
    nr_sections = 0 if geo.down_sampling_factor == 8 else 1
    ring_dtype = geo.ring_jnp_dtype
    # Mirrored rings (see BufferGeometry.pad) + scratch rows for the
    # grouped writes (RING_SLACK).
    rows = geo.num_blocks + geo.pad + RING_SLACK
    state = RenderDelayBufferState(
        blocks=jnp.zeros((rows, geo.blocks_row_fp), ring_dtype),
        sf=jnp.zeros((rows, geo.sf_row_fp), ring_dtype),
        sf_pending=jnp.zeros((PAIR_BLOCKS, geo.sf_row_fp), dtype),
        blocks_pending=jnp.zeros((PAIR_BLOCKS, geo.blocks_row_fp), dtype),
        lowrate=jnp.zeros((geo.ds_size,), dtype),
        b_delay=jnp.asarray(0, jnp.int32),
        lr_latency=jnp.asarray(0, jnp.int32),
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


def reset(geo: BufferGeometry, config: EchoCanceller3Config,
          state: RenderDelayBufferState) -> RenderDelayBufferState:
    """RenderDelayBufferImpl::Reset (render_delay_buffer.cc:148-186).

    No external audio buffer delay support yet: applies the default delay and
    unsets the delay estimate. Touches only the read-side distances — the
    write positions are phase-derived and unaffected (as in the reference,
    which never rewinds write indices).
    """
    return state.replace(
        min_latency_blocks=jnp.asarray(0, jnp.int32),
        excess_render_detection_counter=jnp.asarray(0, jnp.int32),
        # lr_read = lr_write + sub (:168).
        lr_latency=jnp.asarray(geo.sub_block_size, jnp.int32),
        # ApplyTotalDelay(default_delay) (:349-355).
        b_delay=jnp.asarray(config.delay.default_delay, jnp.int32),
        has_delay=jnp.asarray(False),
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
    # Coefficients stay host numpy: wrapping them in jnp.asarray stages
    # them as tracers under jit, which routes biquad.process to its
    # per-sample scan fallback instead of the Pallas cascade kernel.
    new_aa, y = biquad.process(aa_b, aa_a, state.decimator_aa, x)
    if geo.down_sampling_factor != 8:
        new_nr, y = biquad.process(
            _HIGH_PASS_B, _HIGH_PASS_A, state.decimator_nr, y,
        )
    else:
        new_nr = state.decimator_nr
    return (
        state.replace(decimator_aa=new_aa, decimator_nr=new_nr),
        y[:: geo.down_sampling_factor],
    )


def insert(geo: BufferGeometry, config: EchoCanceller3Config,
           state: RenderDelayBufferState, block, n,
           sf_slot: int | None = None):
    """RenderDelayBufferImpl::Insert (render_delay_buffer.cc:189-231).

    block: (bands, 64, C); ``n`` is the post-increment insert ordinal (the
    first insert ever passes n=1) and MUST be an unbatched scalar under
    vmap. Returns (state, event).

    sf_slot selects write-behind staging for the sf AND blocks rings: a
    static slot in [0, 5) — the block's position within its frame pair
    (even frame: 0-1, odd frame: 2-4). The rows then land in `sf_pending` /
    `blocks_pending` and reach the rings only at flush_sf_pending; readers
    must overlay via sf_span / blocks_span with a matching pending_count.
    sf_slot=None writes the rings directly (the standalone/unit-test path,
    pending_count=0 readers).
    """
    n = _as_n(n)

    # IncrementWriteIndices (:438-443) in distance form: the write side
    # advances (phase-derived from n), so both read distances grow.
    b_delay = jnp.mod(state.b_delay + 1, geo.num_blocks)
    lr_latency = jnp.mod(
        state.lr_latency + geo.sub_block_size, geo.ds_size
    )
    overrun = (lr_latency == 0) | (b_delay == 0)
    state = state.replace(b_delay=b_delay, lr_latency=lr_latency)

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

    # InsertBlock (:367-407). All writes land at batch-uniform indices.
    gain = 10.0 ** (config.render_levels.render_power_gain_db / 20.0)
    if gain != 1.0:
        block = block * gain
    block_row = block.reshape(1, -1)
    if geo.blocks_row_fp > geo.blocks_row_f:
        block_row = jnp.concatenate(
            [block_row,
             jnp.zeros((1, geo.blocks_row_fp - geo.blocks_row_f),
                       block_row.dtype)], axis=1,
        )
    if sf_slot is None:
        state = state.replace(
            blocks=ring_write(
                geo, state.blocks, block_row, b_write_index(geo, n)
            )
        )
    else:
        state = state.replace(
            blocks_pending=jax.lax.dynamic_update_slice(
                state.blocks_pending,
                block_row.astype(state.blocks_pending.dtype),
                (jnp.asarray(sf_slot, jnp.int32), jnp.zeros((), jnp.int32)),
            )
        )

    band0 = jnp.swapaxes(block[0], 0, 1)  # (C, 64)
    new_mixer, mono = _alignment_mix(
        config.delay.render_alignment_mixing, state.mixer, band0
    )
    state = state.replace(mixer=new_mixer)
    state, ds = _decimate(geo, state, mono)
    # Decimated sub-block stored time-reversed at the write index (:389).
    state = state.replace(
        lowrate=uniform_dus(state.lowrate, ds[::-1], lr_write_index(geo, n))
    )

    X = aec3_fft.padded_fft(band0, state.prev_band0)  # (C, 65)
    parts = [
        X.real.reshape(1, -1), X.imag.reshape(1, -1),
        aec3_fft.spectrum(X).reshape(1, -1),
    ]
    used = geo.fft_row_f + geo.spec_row_f
    if geo.sf_row_fp > used:
        parts.append(jnp.zeros((1, geo.sf_row_fp - used), X.real.dtype))
    sf_row = jnp.concatenate(parts, axis=1)
    if sf_slot is None:
        state = state.replace(
            sf=ring_write(geo, state.sf, sf_row, s_write_index(geo, n)),
            prev_band0=band0,
        )
    else:
        assert 0 <= sf_slot < PAIR_BLOCKS
        state = state.replace(
            sf_pending=jax.lax.dynamic_update_slice(
                state.sf_pending, sf_row.astype(state.sf_pending.dtype),
                (jnp.asarray(sf_slot, jnp.int32), jnp.zeros((), jnp.int32)),
            ),
            prev_band0=band0,
        )

    # Overrun triggers a reset (:227-229) — read-side fields only.
    reset_state = reset(geo, config, state)

    def pick(a, b):
        return jnp.where(overrun, a, b)

    state = state.replace(
        min_latency_blocks=pick(reset_state.min_latency_blocks,
                                state.min_latency_blocks),
        excess_render_detection_counter=pick(
            reset_state.excess_render_detection_counter,
            state.excess_render_detection_counter,
        ),
        lr_latency=pick(reset_state.lr_latency, state.lr_latency),
        b_delay=pick(reset_state.b_delay, state.b_delay),
        has_delay=pick(reset_state.has_delay, state.has_delay),
    )
    event = jnp.where(overrun, EVENT_RENDER_OVERRUN, EVENT_NONE)
    return state, event


def flush_sf_pending(geo: BufferGeometry, state: RenderDelayBufferState,
                     n_last):
    """Write the staged sf AND blocks rows of the previous frame pair into
    their rings.

    n_last: the insert ordinal of the LAST staged block (the pair's inserts
    were n_last-4 .. n_last; write positions are recomputed from the
    ordinals, so nothing but the rows themselves is carried). Called at the
    start of each even frame, before that frame's inserts — the ten
    dynamic-update-slices (row + mirror per block) form one uninterrupted
    chain from the carried ring, which XLA updates in place (no reads
    intervene: in-pair readers used the sf_span overlay instead).

    The very first flush writes the zero-initialized staging rows at
    ordinals <= 0 into the zero-initialized ring — a no-op by value.
    """
    n_last = _as_n(n_last)
    # Slot s (insert ordinal n_last - 4 + s) lives at ring row
    # s_write(n_last) + 4 - s: ascending rows hold DESCENDING slots, so the
    # contiguous group is the reversed staging buffer.
    start = s_write_index(geo, n_last)
    sf = ring_write_group(geo, state.sf, state.sf_pending[::-1], start)
    # The blocks ring ascends with n (b_write(n) = n mod L): slot s lives
    # at b_write(n_last - 4 + s) — the group is the staging buffer in slot
    # order starting at b_write(n_last - 4).
    b_start = b_write_index(geo, n_last - (PAIR_BLOCKS - 1))
    blocks = ring_write_group(geo, state.blocks, state.blocks_pending,
                              b_start)
    return state.replace(sf=sf, blocks=blocks)


def buffer_latency(geo: BufferGeometry, state) -> jnp.ndarray:
    """BufferLatency (render_delay_buffer.cc:431-436), in blocks."""
    return state.lr_latency // geo.sub_block_size


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

    underrun = state.lr_latency == 0

    # Advancing the block/spectrum read pointers shrinks b_delay; they only
    # move while they have not caught up with the write side (:247-258).
    can_move = state.b_delay != 0
    b_delay_inc = jnp.where(can_move, state.b_delay - 1, state.b_delay)

    # Normal path: also advance the low-rate read (latency -= sub).
    normal_lr = jnp.mod(
        state.lr_latency - geo.sub_block_size, geo.ds_size
    )
    # Underrun path: low-rate read stays; delay shrinks by one.
    under_delay = jnp.where(
        state.has_delay, jnp.maximum(state.delay - 1, 0), state.delay
    )
    # Excess render: full reset.
    reset_state = reset(geo, config, state)

    state = state.replace(
        b_delay=jnp.where(
            excess, reset_state.b_delay, b_delay_inc
        ),
        lr_latency=jnp.where(
            excess, reset_state.lr_latency,
            jnp.where(underrun, state.lr_latency, normal_lr),
        ),
        delay=jnp.where(
            excess, state.delay,
            jnp.where(underrun, under_delay, state.delay),
        ),
        has_delay=jnp.where(excess, reset_state.has_delay, state.has_delay),
        min_latency_blocks=jnp.where(
            excess, reset_state.min_latency_blocks, state.min_latency_blocks
        ),
        excess_render_detection_counter=jnp.where(
            excess, reset_state.excess_render_detection_counter,
            state.excess_render_detection_counter,
        ),
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
    return state.replace(
        b_delay=jnp.where(unchanged, state.b_delay, total),
        delay=jnp.where(unchanged, state.delay, delay),
        has_delay=jnp.asarray(True) | unchanged,
    ), ~unchanged


# ---------------------------------------------------------------- reads


class RenderView(NamedTuple):
    """A RenderBuffer read handle: buffer state + the uniform insert ordinal.

    Mirrors the reference's ``RenderBuffer`` (render_buffer.h), which is a
    read-only facade over the ring buffers positioned at the current read
    indices. ``n`` must be the same unbatched scalar that produced the last
    ``insert``.

    pending_count (STATIC int): how many staged sf rows (insert ordinals
    n - pending_count + 1 .. n) live in sf_pending rather than the ring —
    2 when reading during an even frame, 5 during an odd frame, 0 when
    inserts write the ring directly (sf_slot=None).
    """

    state: "RenderDelayBufferState"
    n: jnp.ndarray
    pending_count: int = 0


_SPAN_GATHERS: dict = {}


def _span(buf, start, W):
    """Contiguous-span row read [start, start+W) of a mirrored ring.

    buf: (L+pad, F); start: () int32 in [0, L). On TPU this is a
    per-stream DMA of exactly the W rows (ops/pallas_span.py); elsewhere a
    dynamic_slice. Returns (W, F) upcast to at least f32 (bf16 rings are
    quantized storage only — reads rejoin the f32 arithmetic)."""
    g = _SPAN_GATHERS.get(W)
    if g is None:
        g = pallas_span.make_span_gather(W)
        _SPAN_GATHERS[W] = g
    out = g(buf, start)
    return out.astype(jnp.promote_types(buf.dtype, jnp.float32))


def _take_rows(buf, rows, L):
    """Arbitrary-row gather as a one-hot contraction (cold paths only —
    the hot-path window reads are contiguous spans served by _span).

    A dynamic-index gather with per-stream indices is expanded by XLA:TPU
    into a serial loop over the batch under vmap; a one-hot matmul rides
    the MXU instead. buf: (L + pad, ...) mirrored ring; rows: (R,) int32
    already reduced mod L. Returns (R, ...)."""
    LP = buf.shape[0]
    oh = (rows[:, None] == jnp.arange(LP)).astype(jnp.float32)  # (R, LP)
    flat = buf.reshape(LP, -1)
    # Precision HIGHEST keeps the contraction in f32: with the default
    # (bf16) precision XLA:TPU maintains an incremental bf16 *shadow* of
    # the whole ring (a second DUS + copy per insert) just to feed these
    # dots — far more HBM traffic than the f32 matmul costs.
    dot = lambda a, b: jnp.matmul(  # noqa: E731
        a, b, precision=jax.lax.Precision.HIGHEST
    )
    if jnp.iscomplexobj(buf):
        out = (
            dot(oh, flat.real) + 1j * dot(oh, flat.imag)
        ).astype(buf.dtype)
    else:
        # bf16 rings read back as f32 (the dot already accumulates in f32;
        # keeping f32 here stops the quantization from spreading into the
        # downstream arithmetic).
        out_dtype = jnp.promote_types(buf.dtype, jnp.float32)
        out = dot(oh, flat).astype(out_dtype)
    return out.reshape((rows.shape[0],) + buf.shape[1:])


def _sf_fft(geo: BufferGeometry, rows):
    """FFT planes of packed sf rows: (W, fp) -> (W, C, 65) complex."""
    planar = rows[:, : geo.fft_row_f].reshape(
        (rows.shape[0], 2) + geo.spec_row_shape
    )
    return jax.lax.complex(planar[:, 0], planar[:, 1])


def _sf_spectrum(geo: BufferGeometry, rows):
    """Spectrum part of packed sf rows: (W, fp) -> (W, C, 65)."""
    return rows[
        :, geo.fft_row_f : geo.fft_row_f + geo.spec_row_f
    ].reshape((rows.shape[0],) + geo.spec_row_shape)


def _overlay_rows(rows, match, pend):
    """rows with row w replaced by pend[k] where match[w, k] (at most one
    k matches a row). One-hot matmul with per-operand precision
    (DEFAULT, HIGHEST): the one-hot lhs is exact in bf16 (0/1) and the
    HIGHEST rhs reconstructs f32 exactly from its 3-way bf16 split, so the
    select is bit-exact at half the passes of HIGHEST/HIGHEST. (A masked
    where+reduce form was measured ~2x slower here: it broadcasts pend to
    (W, k, F) element ops per read.)"""
    overlay = jnp.matmul(
        match.astype(rows.dtype), pend,
        precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST),
    )
    return jnp.where(jnp.any(match, axis=1)[:, None], overlay, rows)


def sf_span(geo: BufferGeometry, view: RenderView, start, W: int):
    """Span read [start, start+W) of the sf ring with the write-behind
    overlay: ring rows whose logical position matches a staged insert
    (sf_pending, ordinals view.n - pending_count + 1 .. view.n) are
    replaced by the staged f32 rows. Bit-identical to reading a ring the
    writes had already reached (same rows, same f32 values; in bf16 ring
    mode the staged rows skip one quantization round-trip)."""
    rows = _span(view.state.sf, start, W)
    k = view.pending_count
    if k:
        row_log = jnp.mod(start + jnp.arange(W), geo.num_blocks)  # (W,)
        pos = jnp.stack([
            s_write_index(geo, view.n - (k - 1) + s) for s in range(k)
        ])  # (k,) batch-uniform
        match = row_log[:, None] == pos[None, :]  # (W, k) per-stream
        pend = view.state.sf_pending[:k].astype(rows.dtype)
        rows = _overlay_rows(rows, match, pend)
    return rows


def blocks_span(geo: BufferGeometry, view: RenderView, start, W: int):
    """Span read [start, start+W) of the blocks ring with the write-behind
    overlay (see sf_span; blocks positions ascend with n:
    b_write(n) = n mod L)."""
    rows = _span(view.state.blocks, start, W)
    k = view.pending_count
    if k:
        row_log = jnp.mod(start + jnp.arange(W), geo.num_blocks)  # (W,)
        pos = jnp.stack([
            b_write_index(geo, view.n - (k - 1) + s) for s in range(k)
        ])  # (k,) batch-uniform
        match = row_log[:, None] == pos[None, :]  # (W, k) per-stream
        pend = view.state.blocks_pending[:k].astype(rows.dtype)
        rows = _overlay_rows(rows, match, pend)
    return rows


def sf_window(geo: BufferGeometry, view: RenderView, width: int):
    """One DMA for both the FFT and spectrum windows at the read position.

    Returns the packed (width, sf_row_fp) rows; slice with _sf_fft /
    _sf_spectrum."""
    assert width <= geo.pad + 1, (width, geo.pad)
    start = s_read_index(geo, view.state, view.n)
    return sf_span(geo, view, start, width)


def fft_window(geo: BufferGeometry, view: RenderView, num_partitions: int):
    """The `num_partitions` FFTs starting at Position() (newest first).

    Returns (P, C, 65) complex."""
    return _sf_fft(geo, sf_window(geo, view, num_partitions))


def spectrum_window(geo: BufferGeometry, view: RenderView,
                    num_partitions: int):
    """(P, C, 65) spectra starting at the read position."""
    return _sf_spectrum(geo, sf_window(geo, view, num_partitions))


def spectrum_at(geo: BufferGeometry, view: RenderView, offset):
    """RenderBuffer::Spectrum(offset): (C, 65)."""
    idx = jnp.mod(
        s_read_index(geo, view.state, view.n) + offset, geo.num_blocks
    )
    return _sf_spectrum(geo, sf_span(geo, view, idx, 1))[0]


def block_window_back(geo: BufferGeometry, view: RenderView, W: int):
    """Blocks at b_read_index - [0, W): the delay-aligned lookback rows.

    One full-ring contraction serving every downstream aligned-block read
    (each full read of the (L, bands, 64, C) ring costs ~L/W times the
    traffic of the W rows actually needed)."""
    assert W <= geo.pad + 1, (W, geo.pad)
    start = jnp.mod(
        b_read_index(geo, view.state, view.n) - (W - 1), geo.num_blocks
    )
    # The span is ascending ring rows; the window contract is descending
    # (row k = b_read - k), so flip.
    return blocks_span(geo, view, start, W)[
        ::-1, : geo.blocks_row_f
    ].reshape((W,) + geo.block_row_shape)


def window_row(win, offset):
    """Row `offset` of a materialized window, via a W-row one-hot.

    `offset` may be per-stream dynamic (a gather would serialize under
    vmap); it must lie in [0, W) — callers pick W from the config bounds
    (filter length / echo-model window sizes). Bit-identical to reading
    the ring directly: the one-hot sum touches exactly one nonzero row.
    Supports a leading vector of offsets ((K,) -> (K, ...))."""
    W = win.shape[0]
    offset = jnp.asarray(offset)
    oh_dtype = jnp.float32
    oh = (
        jnp.expand_dims(offset, -1) == jnp.arange(W)
    ).astype(oh_dtype)
    flat = win.reshape(W, -1)
    # Per-operand precision: the one-hot lhs is exact in bf16 (0/1); the
    # HIGHEST rhs reconstructs f32 exactly from its 3-way bf16 split —
    # bit-exact selection at half the passes of HIGHEST/HIGHEST.
    prec = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)
    dot = lambda a, b: jnp.matmul(a, b, precision=prec)  # noqa: E731
    if jnp.iscomplexobj(win):
        out = (dot(oh, flat.real) + 1j * dot(oh, flat.imag)).astype(win.dtype)
    else:
        out = dot(oh, flat.astype(oh_dtype)).astype(win.dtype)
    return out.reshape(offset.shape + win.shape[1:])


def window_slice(win, start, W: int):
    """Rows [start, start+W) of a materialized window (chain), with `start`
    a per-stream traced scalar in [0, win.shape[0] - W].

    The pair-megakernel path reads every per-block window from two wide
    per-pair chains; a dynamic_slice with a per-stream start would
    serialize under vmap, so this is a (W, W_chain) one-hot contraction
    (bit-exact selection — per-operand precision as window_row)."""
    Wc = win.shape[0]
    oh = (
        (jnp.expand_dims(start, -1) + jnp.arange(W))[..., :, None]
        == jnp.arange(Wc)
    ).astype(jnp.float32)  # (..., W, Wc)
    flat = win.reshape(Wc, -1)
    prec = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)
    dot = lambda a, b: jnp.matmul(a, b, precision=prec)  # noqa: E731
    if jnp.iscomplexobj(win):
        out = (dot(oh, flat.real) + 1j * dot(oh, flat.imag)).astype(win.dtype)
    else:
        out = dot(oh, flat.astype(jnp.float32)).astype(win.dtype)
    return out.reshape(oh.shape[:-1] + win.shape[1:])


def block_at(geo: BufferGeometry, view: RenderView, offset: int = 0):
    """RenderBuffer::GetBlock(offset): (bands, 64, C)."""
    idx = jnp.mod(
        b_read_index(geo, view.state, view.n) + offset, geo.num_blocks
    )
    return blocks_span(geo, view, idx, 1)[
        0, : geo.blocks_row_f
    ].reshape(geo.block_row_shape)


def spectral_sum(geo: BufferGeometry, view: RenderView, num_spectra: int):
    """RenderBuffer::SpectralSum (render_buffer.cc:29-41): (65,)."""
    return jnp.sum(spectrum_window(geo, view, num_spectra), axis=(0, 1))


def headroom(geo: BufferGeometry, state):
    """RenderBuffer::Headroom (render_buffer.h:80-92)."""
    # (s_read - s_write) mod L, mapping a zero distance to L as the
    # reference's branch form does.
    return jnp.where(
        state.b_delay == 0,
        jnp.asarray(geo.num_blocks, jnp.int32),
        state.b_delay,
    )


def compute_delay(geo: BufferGeometry, state):
    """RenderDelayBufferImpl::ComputeDelay (render_delay_buffer.cc:338-346)."""
    return state.b_delay - buffer_latency(geo, state)
