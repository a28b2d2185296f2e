"""AEC3 adaptive state tracking.

Reference: aec3/aec_state.cc (+ subtractor_output_analyzer.cc,
filter_analyzer.cc, transparent_mode.cc [legacy impl, the default],
erle_estimator.cc / subband_erle_estimator.cc / fullband_erle_estimator.cc,
erl_estimator.cc, reverb_model.cc, reverb_frequency_response.cc,
reverb_model_estimator.cc).

Adaptive reverb decay estimation (active only when ep_strength.default_len
< 0) is implemented in reverb_decay_estimator.py and wired below; the fixed
default decay path is used under the default config, gated identically to
the reference.
EchoAudibility / StationarityEstimator live in echo_audibility.py (active
when echo_audibility.use_stationarity_properties); the signal-dependent
ERLE estimator lives in signal_dependent_erle.py (active when
erle.num_sections > 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.models.aec3 import echo_audibility as ea
from webrtc_audio_processing_tpu.models.aec3 import render_buffer as rb
from webrtc_audio_processing_tpu.models.aec3 import signal_dependent_erle as sde
from webrtc_audio_processing_tpu.models.aec3 import reverb_decay_estimator as rde
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config

NUM_BINS = 65
BLOCK_SIZE = 64
BLOCKS_PER_SECOND = 250
X2_BAND_ENERGY_THRESHOLD = 44015068.0
POINTS_TO_ACCUMULATE = 6
BLOCKS_TO_HOLD_ERLE = 100
BLOCKS_FOR_ONSET_DETECTION = BLOCKS_TO_HOLD_ERLE + 150
MIN_ERL = 0.01
MAX_ERL = 1000.0


def fast_approx_log2(x):
    """FastApproxLog2f (aec3_common.cc): bit-trick log2 with mantissa
    linearization."""
    x = jnp.maximum(jnp.asarray(x, jnp.float32), 1e-30)
    bits = x.view(jnp.int32)
    exp = (bits >> 23) - 127
    mant = jnp.float32(1.0) + (bits & 0x7FFFFF).astype(jnp.float32) * (
        1.0 / 8388608.0
    )
    return exp.astype(jnp.float32) + mant - 1.0


# -------------------------------------------------------- subtractor analyzer


@struct.dataclass
class SubtractorOutputAnalyzerState:
    filters_converged: jnp.ndarray  # (C,) bool


def analyze_subtractor_output(state, y2, e2_refined, e2_coarse):
    """SubtractorOutputAnalyzer::Update (subtractor_output_analyzer.cc:30-63).

    Returns (state, any_converged, any_coarse_converged, all_diverged).
    """
    thr = 50.0 * 50.0 * BLOCK_SIZE
    thr_low = 20.0 * 20.0 * BLOCK_SIZE
    refined_conv = (e2_refined < 0.5 * y2) & (y2 > thr)
    coarse_strict = (e2_coarse < 0.05 * y2) & (y2 > thr)
    coarse_relaxed = (e2_coarse < 0.3 * y2) & (y2 > thr_low)
    diverged = (jnp.minimum(e2_refined, e2_coarse) > 1.5 * y2) & (
        y2 > 30.0 * 30.0 * BLOCK_SIZE
    )
    converged = refined_conv | coarse_strict
    return (
        SubtractorOutputAnalyzerState(filters_converged=converged),
        jnp.any(converged),
        jnp.any(coarse_relaxed),
        jnp.all(diverged),
    )


# ------------------------------------------------------------ filter analyzer


@struct.dataclass
class FilterAnalyzerState:
    """FilterAnalyzer (filter_analyzer.h). Per capture channel."""

    h_highpass: jnp.ndarray  # (C, P_max*64)
    peak_index: jnp.ndarray  # (C,) int32
    gain: jnp.ndarray  # (C,)
    consistent_estimate: jnp.ndarray  # (C,) bool
    # ConsistentFilterDetector per channel.
    significant_peak: jnp.ndarray  # (C,) bool
    filter_floor_accum: jnp.ndarray  # (C,)
    filter_secondary_peak: jnp.ndarray  # (C,)
    filter_floor_low_limit: jnp.ndarray  # (C,) int32
    filter_floor_high_limit: jnp.ndarray  # (C,) int32
    consistent_estimate_counter: jnp.ndarray  # (C,) int32
    consistent_delay_reference: jnp.ndarray  # (C,) int32
    # Region cycling (shared).
    region_start: jnp.ndarray  # () int32
    region_end: jnp.ndarray  # () int32
    blocks_since_reset: jnp.ndarray  # () int32
    filter_delays_blocks: jnp.ndarray  # (C,) int32
    min_filter_delay_blocks: jnp.ndarray  # () int32


def init_filter_analyzer(config: EchoCanceller3Config, num_capture,
                         p_max) -> FilterAnalyzerState:
    return FilterAnalyzerState(
        h_highpass=jnp.zeros((num_capture, p_max * BLOCK_SIZE)),
        peak_index=jnp.zeros((num_capture,), jnp.int32),
        gain=jnp.full((num_capture,), config.ep_strength.default_gain),
        consistent_estimate=jnp.zeros((num_capture,), bool),
        significant_peak=jnp.zeros((num_capture,), bool),
        filter_floor_accum=jnp.zeros((num_capture,)),
        filter_secondary_peak=jnp.zeros((num_capture,)),
        filter_floor_low_limit=jnp.zeros((num_capture,), jnp.int32),
        filter_floor_high_limit=jnp.zeros((num_capture,), jnp.int32),
        consistent_estimate_counter=jnp.zeros((num_capture,), jnp.int32),
        consistent_delay_reference=jnp.full((num_capture,), -10, jnp.int32),
        region_start=jnp.asarray(0, jnp.int32),
        region_end=jnp.asarray(0, jnp.int32),
        blocks_since_reset=jnp.asarray(0, jnp.int32),
        filter_delays_blocks=jnp.zeros((num_capture,), jnp.int32),
        min_filter_delay_blocks=jnp.asarray(0, jnp.int32),
    )


_HP_KERNEL = jnp.asarray([0.7929742, -0.36072128, -0.47047766])


def filter_analyzer_update(
    config: EchoCanceller3Config,
    state: FilterAnalyzerState,
    impulse_responses,  # (C, P_max*64)
    filter_size_samples,  # () int32: current filter length in samples
    geo: rb.BufferGeometry,
    buf: rb.RenderView,
    blocks_win=None,  # optional (W, bands, 64, C_ren) lookback window
):
    """FilterAnalyzer::Update (filter_analyzer.cc:77-101) with the cyclic
    64-sample analysis region."""
    n_taps = state.h_highpass.shape[-1]
    taps = jnp.arange(n_taps)

    blocks_since_reset = state.blocks_since_reset + 1

    # SetRegionToAnalyze (:180-190).
    start = jnp.where(
        state.region_end >= filter_size_samples - 1, 0, state.region_end + 1
    )
    end = jnp.minimum(start + BLOCK_SIZE - 1, filter_size_samples - 1)
    in_region = (taps >= start) & (taps <= end)

    # PreProcessFilters (:134-160): causal 3-tap high-pass inside the region.
    h = impulse_responses  # (C, T)
    hp = (
        h * _HP_KERNEL[0]
        + jnp.pad(h[:, :-1], ((0, 0), (1, 0))) * _HP_KERNEL[1]
        + jnp.pad(h[:, :-2], ((0, 0), (2, 0))) * _HP_KERNEL[2]
    )
    # Taps below kernel-1 within region stay zeroed (loop starts at
    # max(2, start)).
    hp = jnp.where(taps[None, :] < jnp.maximum(2, start), 0.0, hp)
    h_highpass = jnp.where(in_region[None, :], hp, state.h_highpass)

    # FindPeakIndex within the region, seeded with the previous peak (:25-40).
    prev_peak = jnp.minimum(state.peak_index, n_taps - 1)
    prev_val = jnp.sum(
        jnp.where(taps[None, :] == prev_peak[:, None], h_highpass**2, 0.0),
        axis=-1,
    )  # one-hot read: per-channel dynamic gathers serialize under vmap
    region_vals = jnp.where(in_region[None, :], h_highpass**2, -1.0)
    region_arg = jnp.argmax(region_vals, axis=-1).astype(jnp.int32)
    region_max = jnp.max(region_vals, axis=-1)
    peak_index = jnp.where(region_max > prev_val, region_arg, prev_peak)
    filter_delays_blocks = peak_index >> 6

    # ConsistentFilterDetector (:196-262).
    at_region_start = start == 0
    floor_low = jnp.where(
        at_region_start,
        jnp.where(peak_index < 64, 0, peak_index - 64),
        state.filter_floor_low_limit,
    )
    floor_high = jnp.where(
        at_region_start,
        jnp.where(peak_index > filter_size_samples - 129, 0, peak_index + 128),
        state.filter_floor_high_limit,
    )
    accum0 = jnp.where(at_region_start, 0.0, state.filter_floor_accum)
    sec0 = jnp.where(at_region_start, 0.0, state.filter_secondary_peak)

    abs_h = jnp.abs(h_highpass)
    in_floor = in_region[None, :] & (
        (taps[None, :] < floor_low[:, None])
        | (taps[None, :] >= floor_high[:, None])
    )
    accum = accum0 + jnp.sum(jnp.where(in_floor, abs_h, 0.0), axis=-1)
    sec = jnp.maximum(sec0, jnp.max(jnp.where(in_floor, abs_h, 0.0), axis=-1))

    finalize = end == filter_size_samples - 1
    floor_count = (
        floor_low + filter_size_samples - floor_high
    ).astype(jnp.float32)
    filter_floor = accum / jnp.maximum(floor_count, 1.0)
    abs_peak = jnp.sum(
        jnp.where(taps[None, :] == peak_index[:, None], abs_h, 0.0), axis=-1
    )
    new_significant = (abs_peak > 10.0 * filter_floor) & (abs_peak > 2.0 * sec)
    significant = jnp.where(finalize, new_significant, state.significant_peak)

    # Active render at the delay-aligned block.
    if blocks_win is not None:
        # filter_delays_blocks < refined length_blocks == the window size.
        x_aligned = rb.window_row(blocks_win, filter_delays_blocks)[:, 0]
    else:
        aligned_idx = jnp.mod(
            rb.b_read_index(geo, buf.state, buf.n) - filter_delays_blocks,
            geo.num_blocks,
        )  # (C,)
        x_aligned = rb._take_rows(
            buf.state.blocks, aligned_idx, geo.num_blocks
        )[:, : geo.blocks_row_f].reshape(
            (aligned_idx.shape[0],) + geo.block_row_shape
        )[:, 0]  # (C, 64, C_ren)
    x_energy = jnp.sum(x_aligned**2, axis=1)  # (C, C_ren)
    active = jnp.any(
        x_energy
        > config.render_levels.active_render_limit**2 * BLOCK_SIZE,
        axis=-1,
    )

    same_ref = state.consistent_delay_reference == filter_delays_blocks
    counter = jnp.where(
        significant,
        jnp.where(
            same_ref,
            state.consistent_estimate_counter + active.astype(jnp.int32),
            0,
        ),
        state.consistent_estimate_counter,
    )
    delay_ref = jnp.where(
        significant & ~same_ref, filter_delays_blocks,
        state.consistent_delay_reference,
    )
    consistent = counter > 1.5 * BLOCKS_PER_SECOND

    # UpdateFilterGain (:104-127).
    suff_time = blocks_since_reset > 5 * BLOCKS_PER_SECOND
    gain = jnp.where(
        suff_time & consistent,
        abs_peak,
        jnp.where(state.gain != 0.0, jnp.maximum(state.gain, abs_peak),
                  state.gain),
    )
    if config.ep_strength.bounded_erl:
        gain = jnp.where(gain != 0.0, jnp.maximum(gain, 0.01), gain)

    new_state = state.replace(
        h_highpass=h_highpass,
        peak_index=peak_index,
        gain=gain,
        consistent_estimate=consistent,
        significant_peak=significant,
        filter_floor_accum=accum,
        filter_secondary_peak=sec,
        filter_floor_low_limit=floor_low,
        filter_floor_high_limit=floor_high,
        consistent_estimate_counter=counter,
        consistent_delay_reference=delay_ref,
        region_start=start,
        region_end=end,
        blocks_since_reset=blocks_since_reset,
        filter_delays_blocks=filter_delays_blocks,
        min_filter_delay_blocks=jnp.min(filter_delays_blocks),
    )
    return new_state, jnp.any(consistent), jnp.max(gain)


def reset_filter_analyzer(config, state: FilterAnalyzerState):
    return state.replace(
        blocks_since_reset=jnp.asarray(0, jnp.int32),
        region_start=jnp.asarray(0, jnp.int32),
        region_end=jnp.asarray(0, jnp.int32),
        gain=jnp.full_like(state.gain, config.ep_strength.default_gain),
        peak_index=jnp.zeros_like(state.peak_index),
        consistent_estimate=jnp.zeros_like(state.consistent_estimate),
        significant_peak=jnp.zeros_like(state.significant_peak),
        filter_floor_accum=jnp.zeros_like(state.filter_floor_accum),
        filter_secondary_peak=jnp.zeros_like(state.filter_secondary_peak),
        filter_floor_low_limit=jnp.zeros_like(state.filter_floor_low_limit),
        filter_floor_high_limit=jnp.zeros_like(state.filter_floor_high_limit),
        consistent_estimate_counter=jnp.zeros_like(
            state.consistent_estimate_counter
        ),
        consistent_delay_reference=jnp.full_like(
            state.consistent_delay_reference, -10
        ),
        filter_delays_blocks=jnp.zeros_like(state.filter_delays_blocks),
        min_filter_delay_blocks=jnp.asarray(0, jnp.int32),
    )


# ------------------------------------------------------------ transparent mode


@struct.dataclass
class TransparentModeState:
    """LegacyTransparentModeImpl (transparent_mode.cc:141-224)."""

    capture_block_counter: jnp.ndarray
    active: jnp.ndarray  # () bool
    active_blocks_since_sane_filter: jnp.ndarray
    sane_filter_observed: jnp.ndarray
    finite_erl_recently_detected: jnp.ndarray
    non_converged_sequence_size: jnp.ndarray
    diverged_sequence_size: jnp.ndarray
    active_non_converged_sequence_size: jnp.ndarray
    num_converged_blocks: jnp.ndarray
    recent_convergence_during_activity: jnp.ndarray
    strong_not_saturated_render_blocks: jnp.ndarray


def init_transparent_mode() -> TransparentModeState:
    return TransparentModeState(
        capture_block_counter=jnp.asarray(0, jnp.int32),
        active=jnp.asarray(False),
        active_blocks_since_sane_filter=jnp.asarray(10000, jnp.int32),
        sane_filter_observed=jnp.asarray(False),
        finite_erl_recently_detected=jnp.asarray(False),
        non_converged_sequence_size=jnp.asarray(10000, jnp.int32),
        diverged_sequence_size=jnp.asarray(0, jnp.int32),
        active_non_converged_sequence_size=jnp.asarray(0, jnp.int32),
        num_converged_blocks=jnp.asarray(0, jnp.int32),
        recent_convergence_during_activity=jnp.asarray(False),
        strong_not_saturated_render_blocks=jnp.asarray(0, jnp.int32),
    )


def transparent_mode_update(
    state: TransparentModeState,
    filter_delay_blocks,
    any_filter_consistent,
    any_filter_converged,
    all_filters_diverged,
    active_render,
    saturated_capture,
):
    """LegacyTransparentModeImpl::Update (transparent_mode.cc:158-219)."""
    counter = state.capture_block_counter + 1
    strong = state.strong_not_saturated_render_blocks + (
        active_render & ~saturated_capture
    ).astype(jnp.int32)

    sane_now = any_filter_consistent & (filter_delay_blocks < 5)
    sane_observed = state.sane_filter_observed | sane_now
    active_since_sane = jnp.where(
        sane_now,
        0,
        state.active_blocks_since_sane_filter
        + active_render.astype(jnp.int32),
    )
    sane_recent = jnp.where(
        ~sane_observed,
        counter <= 5 * BLOCKS_PER_SECOND,
        active_since_sane <= 30 * BLOCKS_PER_SECOND,
    )

    conv = any_filter_converged
    recent_conv = jnp.where(conv, True,
                            state.recent_convergence_during_activity)
    active_nc = jnp.where(
        conv, 0,
        state.active_non_converged_sequence_size
        + active_render.astype(jnp.int32),
    )
    recent_conv = jnp.where(
        ~conv & (active_nc > 60 * BLOCKS_PER_SECOND), False, recent_conv
    )
    nc_size = jnp.where(conv, 0, state.non_converged_sequence_size + 1)
    num_conv = jnp.where(
        conv,
        state.num_converged_blocks + 1,
        jnp.where(nc_size > 20 * BLOCKS_PER_SECOND, 0,
                  state.num_converged_blocks),
    )

    div_size = jnp.where(all_filters_diverged,
                         state.diverged_sequence_size + 1, 0)
    nc_size = jnp.where(div_size >= 60, 10000, nc_size)

    finite_erl = state.finite_erl_recently_detected
    finite_erl = jnp.where(active_nc > 60 * BLOCKS_PER_SECOND, False,
                           finite_erl)
    finite_erl = jnp.where(num_conv > 50, True, finite_erl)

    should_have_converged = strong > 6 * BLOCKS_PER_SECOND
    active = jnp.where(
        finite_erl,
        False,
        jnp.where(sane_recent & recent_conv, False, should_have_converged),
    )

    return TransparentModeState(
        capture_block_counter=counter,
        active=active,
        active_blocks_since_sane_filter=active_since_sane,
        sane_filter_observed=sane_observed,
        finite_erl_recently_detected=finite_erl,
        non_converged_sequence_size=nc_size,
        diverged_sequence_size=div_size,
        active_non_converged_sequence_size=active_nc,
        num_converged_blocks=num_conv,
        recent_convergence_during_activity=recent_conv,
        strong_not_saturated_render_blocks=strong,
    )


# -------------------------------------------------------------- ERLE / ERL


@struct.dataclass
class SubbandErleState:
    """SubbandErleEstimator (subband_erle_estimator.h)."""

    erle: jnp.ndarray  # (C, 65)
    erle_onset_compensated: jnp.ndarray  # (C, 65)
    erle_unbounded: jnp.ndarray  # (C, 65)
    erle_during_onsets: jnp.ndarray  # (C, 65)
    coming_onset: jnp.ndarray  # (C, 65) bool
    hold_counters: jnp.ndarray  # (C, 65) int32
    accum_Y2: jnp.ndarray  # (C, 65)
    accum_E2: jnp.ndarray  # (C, 65)
    accum_low_render: jnp.ndarray  # (C, 65) bool
    accum_points: jnp.ndarray  # (C,) int32


@struct.dataclass
class FullBandErleState:
    erle_time_domain_log2: jnp.ndarray  # (C,)
    hold_counters: jnp.ndarray  # (C,) int32
    # ErleInstantaneous
    erle_log2: jnp.ndarray  # (C,)
    erle_log2_valid: jnp.ndarray  # (C,) bool
    inst_quality: jnp.ndarray  # (C,)
    max_erle_log2: jnp.ndarray  # (C,)
    min_erle_log2: jnp.ndarray  # (C,)
    num_points: jnp.ndarray  # (C,) int32
    E2_acum: jnp.ndarray  # (C,)
    Y2_acum: jnp.ndarray  # (C,)


@struct.dataclass
class ErleState:
    subband: SubbandErleState
    fullband: FullBandErleState
    blocks_since_reset: jnp.ndarray  # () int32
    # SignalDependentErleEstimator, present only when erle.num_sections > 1
    # (erle_estimator.cc:37-41); None otherwise.
    sd: "sde.SignalDependentErleState | None" = None


@struct.dataclass
class ErlState:
    erl: jnp.ndarray  # (65,)
    hold_counters: jnp.ndarray  # (63,) int32
    erl_time_domain: jnp.ndarray  # ()
    hold_counter_time_domain: jnp.ndarray  # () int32
    blocks_since_reset: jnp.ndarray  # () int32


def _max_erle_bands(config):
    return jnp.concatenate([
        jnp.full((32,), config.erle.max_l),
        jnp.full((33,), config.erle.max_h),
    ])


def init_subband_erle(config, num_capture) -> SubbandErleState:
    mn = config.erle.min
    c = num_capture
    return SubbandErleState(
        erle=jnp.full((c, NUM_BINS), mn),
        erle_onset_compensated=jnp.full((c, NUM_BINS), mn),
        erle_unbounded=jnp.full((c, NUM_BINS), mn),
        erle_during_onsets=jnp.full((c, NUM_BINS), mn),
        coming_onset=jnp.ones((c, NUM_BINS), bool),
        hold_counters=jnp.zeros((c, NUM_BINS), jnp.int32),
        accum_Y2=jnp.zeros((c, NUM_BINS)),
        accum_E2=jnp.zeros((c, NUM_BINS)),
        accum_low_render=jnp.zeros((c, NUM_BINS), bool),
        accum_points=jnp.zeros((c,), jnp.int32),
    )


def init_fullband_erle(config, num_capture) -> FullBandErleState:
    import math

    min_log2 = math.log2(config.erle.min + 1e-3)
    c = num_capture
    return FullBandErleState(
        erle_time_domain_log2=jnp.full((c,), min_log2),
        hold_counters=jnp.zeros((c,), jnp.int32),
        erle_log2=jnp.zeros((c,)),
        erle_log2_valid=jnp.zeros((c,), bool),
        inst_quality=jnp.zeros((c,)),
        max_erle_log2=jnp.full((c,), -10.0),
        min_erle_log2=jnp.full((c,), 33.0),
        num_points=jnp.zeros((c,), jnp.int32),
        E2_acum=jnp.zeros((c,)),
        Y2_acum=jnp.zeros((c,)),
    )


def init_erle(config, num_capture) -> ErleState:
    return ErleState(
        subband=init_subband_erle(config, num_capture),
        fullband=init_fullband_erle(config, num_capture),
        blocks_since_reset=jnp.asarray(0, jnp.int32),
        sd=(sde.init_state(config, num_capture)
            if config.erle.num_sections > 1 else None),
    )


def reset_erle(config, state: ErleState, delay_change) -> ErleState:
    c = state.subband.erle.shape[0]
    new = ErleState(
        subband=init_subband_erle(config, c),
        fullband=init_fullband_erle(config, c),
        blocks_since_reset=jnp.where(
            delay_change, 0, state.blocks_since_reset
        ),
        sd=(sde.init_state(config, c)
            if config.erle.num_sections > 1 else None),
    )
    return new


def erle_arrays(config, state: ErleState):
    """(erle, erle_onset_compensated, erle_unbounded) with the
    signal-dependent dispatch of erle_estimator.h:58-75: when the
    signal-dependent estimator exists it supplies all three (the unbounded
    variant intentionally returns its capped, non-onset ERLE)."""
    if config.erle.num_sections > 1:
        sd = state.sd
        eoc = (sd.erle_onset_compensated if config.erle.onset_detection
               else sd.erle)
        return sd.erle, eoc, sd.erle
    sb = state.subband
    return sb.erle, sb.erle_onset_compensated, sb.erle_unbounded


def init_erl() -> ErlState:
    return ErlState(
        erl=jnp.full((NUM_BINS,), MAX_ERL),
        hold_counters=jnp.zeros((63,), jnp.int32),
        erl_time_domain=jnp.asarray(MAX_ERL),
        hold_counter_time_domain=jnp.asarray(0, jnp.int32),
        blocks_since_reset=jnp.asarray(0, jnp.int32),
    )


def _subband_erle_update(config, st: SubbandErleState, X2_reverb, Y2, E2,
                         converged):
    """SubbandErleEstimator::Update (subband_erle_estimator.cc:80-110)."""
    max_erle = _max_erle_bands(config)[None, :]
    min_erle = config.erle.min

    # UpdateAccumulatedSpectra (:215-246).
    reset_acc = converged & (st.accum_points == POINTS_TO_ACCUMULATE)
    aY2 = jnp.where(reset_acc[:, None], 0.0, st.accum_Y2)
    aE2 = jnp.where(reset_acc[:, None], 0.0, st.accum_E2)
    aLow = jnp.where(reset_acc[:, None], False, st.accum_low_render)
    pts = jnp.where(reset_acc, 0, st.accum_points)
    aY2 = jnp.where(converged[:, None], aY2 + Y2, aY2)
    aE2 = jnp.where(converged[:, None], aE2 + E2, aE2)
    aLow = jnp.where(
        converged[:, None],
        aLow | (X2_reverb[None, :] < X2_BAND_ENERGY_THRESHOLD),
        aLow,
    )
    pts = jnp.where(converged, pts + 1, pts)

    # UpdateBands (:113-177).
    do_band = converged & (pts == POINTS_TO_ACCUMULATE)  # (C,)
    updated = (aE2 > 0.0) & do_band[:, None]
    new_erle = aY2 / jnp.maximum(aE2, 1e-30)
    bins = jnp.arange(NUM_BINS)
    interior = (bins >= 1) & (bins < 64)
    updated = updated & interior[None, :]

    onset_update = updated & ~aLow
    was_coming = st.coming_onset
    alpha_on = jnp.where(new_erle < st.erle_during_onsets, 0.3, 0.15)
    erle_onsets = jnp.where(
        onset_update & was_coming,
        jnp.clip(
            st.erle_during_onsets
            + alpha_on * (new_erle - st.erle_during_onsets),
            min_erle, max_erle,
        ),
        st.erle_during_onsets,
    )
    coming_onset = jnp.where(onset_update, False, st.coming_onset)
    hold = jnp.where(onset_update, BLOCKS_FOR_ONSET_DETECTION,
                     st.hold_counters)

    def band_update(erle, cap):
        alpha = jnp.where(
            new_erle < erle, jnp.where(aLow, 0.0, 0.1), 0.05
        )
        out = jnp.clip(erle + alpha * (new_erle - erle), min_erle, cap)
        return jnp.where(updated, out, erle)

    erle = band_update(st.erle, max_erle)
    erle_oc = band_update(st.erle_onset_compensated, max_erle)
    erle_unb = band_update(st.erle_unbounded, 100000.0)

    # DecreaseErlePerBandForLowRenderSignals (:180-198).
    if config.erle.onset_detection:
        hold = hold - 1
        decay = hold <= (BLOCKS_FOR_ONSET_DETECTION - BLOCKS_TO_HOLD_ERLE)
        erle_oc = jnp.where(
            decay & (erle_oc > erle_onsets),
            jnp.maximum(erle_onsets, 0.97 * erle_oc),
            erle_oc,
        )
        coming_onset = jnp.where(decay & (hold <= 0), True, coming_onset)
        hold = jnp.where(decay & (hold <= 0), 0, hold)

    # Edge bins copy neighbours (:96-109).
    def fix_edges(a):
        return a.at[:, 0].set(a[:, 1]).at[:, 64].set(a[:, 63])

    return st.replace(
        erle=fix_edges(erle),
        erle_onset_compensated=fix_edges(erle_oc),
        erle_unbounded=fix_edges(erle_unb),
        erle_during_onsets=erle_onsets,
        coming_onset=coming_onset,
        hold_counters=hold,
        accum_Y2=aY2, accum_E2=aE2, accum_low_render=aLow, accum_points=pts,
    )


def _fullband_erle_update(config, st: FullBandErleState, X2_reverb, Y2, E2,
                          converged):
    """FullBandErleEstimator::Update (fullband_erle_estimator.cc:52-85)."""
    import math

    min_log2 = math.log2(config.erle.min + 1e-3)
    X2_sum = jnp.sum(X2_reverb)
    strong = X2_sum > X2_BAND_ENERGY_THRESHOLD * NUM_BINS
    do_acc = converged & strong  # (C,)

    Y2s = jnp.sum(Y2, axis=-1)
    E2s = jnp.sum(E2, axis=-1)
    E2a = st.E2_acum + jnp.where(do_acc, E2s, 0.0)
    Y2a = st.Y2_acum + jnp.where(do_acc, Y2s, 0.0)
    pts = st.num_points + do_acc.astype(jnp.int32)

    full = do_acc & (pts == POINTS_TO_ACCUMULATE)
    update = full & (E2a > 0.0)
    new_log2 = fast_approx_log2(Y2a / jnp.maximum(E2a, 1e-30) + 1e-3)
    erle_log2 = jnp.where(update, new_log2, st.erle_log2)
    erle_valid = st.erle_log2_valid | update
    E2a = jnp.where(full, 0.0, E2a)
    Y2a = jnp.where(full, 0.0, Y2a)
    pts = jnp.where(full, 0, pts)

    max_l2 = jnp.where(update,
                       jnp.maximum(st.max_erle_log2 - 0.0004, erle_log2),
                       st.max_erle_log2)
    min_l2 = jnp.where(update,
                       jnp.minimum(st.min_erle_log2 + 0.0004, erle_log2),
                       st.min_erle_log2)
    q = jnp.where(
        max_l2 > min_l2,
        (erle_log2 - min_l2) / jnp.maximum(max_l2 - min_l2, 1e-10),
        0.0,
    )
    inst_q = jnp.where(
        update,
        jnp.where(q > st.inst_quality, q,
                  st.inst_quality + 0.07 * (q - st.inst_quality)),
        st.inst_quality,
    )

    hold = jnp.where(update, BLOCKS_TO_HOLD_ERLE, st.hold_counters)
    erle_td = jnp.where(
        update,
        jnp.maximum(
            st.erle_time_domain_log2
            + 0.05 * (erle_log2 - st.erle_time_domain_log2),
            min_log2,
        ),
        st.erle_time_domain_log2,
    )
    hold = hold - 1
    reset_inst = hold == 0
    erle_valid = jnp.where(reset_inst, False, erle_valid)
    inst_q = jnp.where(reset_inst, 0.0, inst_q)
    pts = jnp.where(reset_inst, 0, pts)
    E2a = jnp.where(reset_inst, 0.0, E2a)
    Y2a = jnp.where(reset_inst, 0.0, Y2a)

    return st.replace(
        erle_time_domain_log2=erle_td,
        hold_counters=hold,
        erle_log2=erle_log2,
        erle_log2_valid=erle_valid,
        inst_quality=inst_q,
        max_erle_log2=max_l2,
        min_erle_log2=min_l2,
        num_points=pts,
        E2_acum=E2a,
        Y2_acum=Y2a,
    )


def erle_update(config, state: ErleState, X2_reverb, Y2, E2, converged,
                X2_by_delay=None, frequency_responses=None):
    """ErleEstimator::Update (erle_estimator.cc:47-77).

    X2_by_delay (num_blocks, 65) and frequency_responses (C, P, 65) feed the
    signal-dependent estimator and are only needed when erle.num_sections>1.
    """
    blocks = state.blocks_since_reset + 1
    skip = blocks < 2 * BLOCKS_PER_SECOND
    sub = _subband_erle_update(config, state.subband, X2_reverb, Y2, E2,
                               converged & ~skip)
    full = _fullband_erle_update(config, state.fullband, X2_reverb, Y2, E2,
                                 converged & ~skip)
    sub = jax.tree_util.tree_map(
        lambda a, b: jnp.where(skip, b, a), sub, state.subband
    )
    full = jax.tree_util.tree_map(
        lambda a, b: jnp.where(skip, b, a), full, state.fullband
    )
    sd = state.sd
    if config.erle.num_sections > 1:
        sd_new = sde.update(
            config, sd, X2_by_delay, frequency_responses, X2_reverb, Y2, E2,
            sub.erle, sub.erle_onset_compensated, converged & ~skip,
        )
        sd = jax.tree_util.tree_map(
            lambda a, b: jnp.where(skip, b, a), sd_new, sd
        )
    return state.replace(subband=sub, fullband=full,
                         blocks_since_reset=blocks, sd=sd)


def erl_update(state: ErlState, converged, X2_at_delay, Y2):
    """ErlEstimator::Update (erl_estimator.cc:39-135).

    X2_at_delay: (C_ren, 65); Y2: (C, 65).
    """
    blocks = state.blocks_since_reset + 1
    any_conv = jnp.any(converged)
    skip = (blocks < 2 * BLOCKS_PER_SECOND) | ~any_conv

    # Max across converged capture channels and across render channels.
    Y2_masked = jnp.where(converged[:, None], Y2, -jnp.inf)
    Y2_max = jnp.max(Y2_masked, axis=0)
    Y2_max = jnp.where(jnp.isfinite(Y2_max), Y2_max, 0.0)
    X2_max = jnp.max(X2_at_delay, axis=0)

    kX2Min = X2_BAND_ENERGY_THRESHOLD
    interior = (jnp.arange(NUM_BINS) >= 1) & (jnp.arange(NUM_BINS) < 64)
    new_erl = Y2_max / jnp.maximum(X2_max, 1e-30)
    decrease = interior & (X2_max > kX2Min) & (new_erl < state.erl)
    erl = jnp.where(
        decrease,
        jnp.maximum(state.erl + 0.1 * (new_erl - state.erl), MIN_ERL),
        state.erl,
    )
    hold = jnp.where(decrease[1:64], 1000, state.hold_counters) - 1
    erl = erl.at[1:64].set(
        jnp.where(hold > 0, erl[1:64], jnp.minimum(MAX_ERL, 2.0 * erl[1:64]))
    )
    erl = erl.at[0].set(erl[1]).at[64].set(erl[63])

    # Time-domain ERL (erl_estimator.cc:120-135).
    X2_tot = jnp.sum(X2_max)
    Y2_tot = jnp.sum(Y2_max)
    strong = X2_tot > kX2Min * NUM_BINS
    new_td = Y2_tot / jnp.maximum(X2_tot, 1e-30)
    dec_td = strong & (new_td < state.erl_time_domain)
    erl_td = jnp.where(
        dec_td,
        jnp.maximum(state.erl_time_domain + 0.1 * (new_td -
                                                   state.erl_time_domain),
                    MIN_ERL),
        state.erl_time_domain,
    )
    hold_td = jnp.where(dec_td, 1000, state.hold_counter_time_domain) - 1
    erl_td = jnp.where(hold_td > 0, erl_td, jnp.minimum(MAX_ERL, 2.0 * erl_td))

    new = ErlState(
        erl=erl, hold_counters=hold, erl_time_domain=erl_td,
        hold_counter_time_domain=hold_td, blocks_since_reset=blocks,
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(skip, b, a), new, state
    ).replace(blocks_since_reset=blocks)


# ------------------------------------------------------------------ reverb


@struct.dataclass
class ReverbModelState:
    reverb: jnp.ndarray  # (65,)


def reverb_update_no_shaping(st: ReverbModelState, power_spectrum, scaling,
                             decay):
    """ReverbModel::UpdateReverbNoFreqShaping (reverb_model.cc:30-41)."""
    new = (st.reverb + power_spectrum * scaling) * decay
    return st.replace(reverb=jnp.where(decay > 0, new, st.reverb))


def reverb_update(st: ReverbModelState, power_spectrum, scaling_vec, decay):
    """ReverbModel::UpdateReverb (reverb_model.cc:43-55)."""
    new = (st.reverb + power_spectrum * scaling_vec) * decay
    return st.replace(reverb=jnp.where(decay > 0, new, st.reverb))


@struct.dataclass
class ReverbFrequencyResponseState:
    average_decay: jnp.ndarray  # (C,)
    tail_response: jnp.ndarray  # (C, 65)


def reverb_frequency_response_update(
    config, st: ReverbFrequencyResponseState, frequency_responses,
    filter_delays_blocks, quality, quality_valid, last_partition_index,
):
    """ReverbFrequencyResponse::Update (reverb_frequency_response.cc:52-96).

    frequency_responses: (C, P_max, 65); last_partition_index: () int32 of
    the final active partition.
    """
    c = st.tail_response.shape[0]
    p_max = frequency_responses.shape[1]
    pidx = jnp.arange(p_max)
    tail = jnp.sum(
        jnp.where((pidx == last_partition_index)[None, :, None],
                  frequency_responses, 0.0),
        axis=1,
    )  # (C, 65); one-hot reads — dynamic gathers serialize under vmap
    direct = jnp.sum(
        jnp.where((pidx[None, :] == filter_delays_blocks[:, None])[..., None],
                  frequency_responses, 0.0),
        axis=1,
    )

    direct_energy = jnp.sum(direct[:, 1:], axis=-1)
    tail_energy = jnp.sum(tail[:, 1:], axis=-1)
    avg_decay = jnp.where(
        direct_energy > 0, tail_energy / jnp.maximum(direct_energy, 1e-30), 0.0
    )
    smoothing = 0.2 * quality
    new_avg = st.average_decay + smoothing * (avg_decay - st.average_decay)
    tail_resp = direct * new_avg[:, None]
    if config.ep_strength.use_conservative_tail_frequency_response:
        tail_resp = jnp.maximum(tail, tail_resp)
    neigh = 0.5 * (tail_resp[:, :-2] + tail_resp[:, 2:])
    tail_resp = tail_resp.at[:, 1:64].set(
        jnp.maximum(tail_resp[:, 1:64], neigh)
    )
    new = ReverbFrequencyResponseState(
        average_decay=new_avg, tail_response=tail_resp
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(quality_valid[..., None]
                               if a.ndim == 2 else quality_valid, a, b),
        new, st,
    )


# ------------------------------------------------------------------ AecState


@struct.dataclass
class AecStateState:
    """Top-level AecState carry."""

    # InitialState.
    initial_state: jnp.ndarray  # () bool
    transition_triggered: jnp.ndarray  # () bool
    initial_strong_blocks: jnp.ndarray  # () int32
    # Counters.
    capture_signal_saturation: jnp.ndarray  # () bool
    blocks_with_active_render: jnp.ndarray  # () int32
    strong_not_saturated_render_blocks: jnp.ndarray  # () int32
    # FilterDelay.
    filter_delays_blocks: jnp.ndarray  # (C,) int32
    min_filter_delay: jnp.ndarray  # () int32
    external_delay: jnp.ndarray  # () int32
    external_delay_valid: jnp.ndarray  # () bool
    # FilteringQualityAnalyzer.
    usable_linear_estimate: jnp.ndarray  # () bool
    filter_update_blocks_since_reset: jnp.ndarray  # () int32
    filter_update_blocks_since_start: jnp.ndarray  # () int32
    convergence_seen: jnp.ndarray  # () bool
    # SaturationDetector.
    saturated_echo: jnp.ndarray  # () bool
    # Stat only: 1-second EMA of the all-filters-diverged indicator
    # (subtractor_output_analyzer.cc divergence condition). Feeds
    # AudioProcessingStats.divergent_filter_fraction, which the reference
    # impl declares but leaves to alternative backends to populate
    # (audio_processing_statistics.h:45, rust_audio_processing.cc:333).
    divergent_fraction: jnp.ndarray  # () float32

    subtractor_analyzer: SubtractorOutputAnalyzerState
    filter_analyzer: FilterAnalyzerState
    transparent: TransparentModeState
    erle: ErleState
    erl: ErlState
    avg_render_reverb: ReverbModelState
    reverb_freq_response: ReverbFrequencyResponseState
    echo_audibility: ea.EchoAudibilityState
    # ReverbDecayEstimator adaptive path, present only when
    # ep_strength.default_len < 0 (reverb_decay_estimator.cc:96).
    reverb_decay_est: "rde.ReverbDecayState | None" = None


def init_state(config: EchoCanceller3Config, num_capture: int,
               p_max: int) -> AecStateState:
    delay_headroom_blocks = config.delay.delay_headroom_samples // BLOCK_SIZE
    return AecStateState(
        initial_state=jnp.asarray(True),
        transition_triggered=jnp.asarray(False),
        initial_strong_blocks=jnp.asarray(0, jnp.int32),
        capture_signal_saturation=jnp.asarray(False),
        blocks_with_active_render=jnp.asarray(0, jnp.int32),
        strong_not_saturated_render_blocks=jnp.asarray(0, jnp.int32),
        filter_delays_blocks=jnp.full((num_capture,), delay_headroom_blocks,
                                      jnp.int32),
        min_filter_delay=jnp.asarray(delay_headroom_blocks, jnp.int32),
        external_delay=jnp.asarray(0, jnp.int32),
        external_delay_valid=jnp.asarray(False),
        usable_linear_estimate=jnp.asarray(False),
        filter_update_blocks_since_reset=jnp.asarray(0, jnp.int32),
        filter_update_blocks_since_start=jnp.asarray(0, jnp.int32),
        convergence_seen=jnp.asarray(False),
        saturated_echo=jnp.asarray(False),
        divergent_fraction=jnp.asarray(0.0, jnp.float32),
        subtractor_analyzer=SubtractorOutputAnalyzerState(
            filters_converged=jnp.zeros((num_capture,), bool)
        ),
        filter_analyzer=init_filter_analyzer(config, num_capture, p_max),
        transparent=init_transparent_mode(),
        erle=init_erle(config, num_capture),
        erl=init_erl(),
        avg_render_reverb=ReverbModelState(reverb=jnp.zeros((NUM_BINS,))),
        reverb_freq_response=ReverbFrequencyResponseState(
            average_decay=jnp.zeros((num_capture,)),
            tail_response=jnp.zeros((num_capture, NUM_BINS)),
        ),
        echo_audibility=ea.init_state(),
        reverb_decay_est=(rde.init_state(config, num_capture)
                          if config.ep_strength.default_len < 0 else None),
    )


def handle_echo_path_change(config, state: AecStateState, delay_change,
                            gain_change):
    """AecState::HandleEchoPathChange (aec_state.cc:146-176)."""
    full = state.replace(
        filter_analyzer=reset_filter_analyzer(config, state.filter_analyzer),
        capture_signal_saturation=jnp.asarray(False),
        strong_not_saturated_render_blocks=jnp.asarray(0, jnp.int32),
        blocks_with_active_render=jnp.asarray(0, jnp.int32),
        initial_state=jnp.asarray(True),
        initial_strong_blocks=jnp.asarray(0, jnp.int32),
        transparent=init_transparent_mode(),
        erle=reset_erle(config, state.erle, jnp.asarray(True)),
        erl=state.erl.replace(blocks_since_reset=jnp.asarray(0, jnp.int32)),
        usable_linear_estimate=jnp.asarray(False),
        filter_update_blocks_since_reset=jnp.asarray(0, jnp.int32),
        convergence_seen=jnp.asarray(False),
        subtractor_analyzer=SubtractorOutputAnalyzerState(
            filters_converged=jnp.zeros_like(
                state.subtractor_analyzer.filters_converged
            )
        ),
    )
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(delay_change, a, b), full, state
    )
    # gain_change: erle Reset(false).
    erle_gain = reset_erle(config, state.erle, jnp.asarray(False))
    erle_sel = jax.tree_util.tree_map(
        lambda a, b: jnp.where(gain_change & ~delay_change, a, b),
        erle_gain, state.erle,
    )
    # Subtractor analyzer always resets on any path change.
    conv = jnp.where(
        delay_change | gain_change,
        jnp.zeros_like(state.subtractor_analyzer.filters_converged),
        state.subtractor_analyzer.filters_converged,
    )
    return state.replace(
        erle=erle_sel,
        subtractor_analyzer=SubtractorOutputAnalyzerState(
            filters_converged=conv
        ),
    )


def update(
    config: EchoCanceller3Config,
    state: AecStateState,
    geo: rb.BufferGeometry,
    buf: rb.RenderView,
    external_delay,  # () int32 blocks
    external_delay_valid,  # () bool
    frequency_responses,  # (C, P_max, 65)
    impulse_responses,  # (C, P_max*64)
    filter_size_partitions,  # () int32
    E2_refined,  # (C, 65)
    Y2,  # (C, 65)
    sub_out,  # dict from subtractor.process
    spec_win=None,  # optional (W, C, 65) spectra window at the read pos
    blocks_win=None,  # optional (W, bands, 64, C_ren) lookback window
):
    """AecState::Update (aec_state.cc:179-299).

    Returns the new state. Query helpers read fields directly. The
    optional materialized windows consolidate the ring reads: every
    dynamic single-row read below is bounded by the refined filter length,
    so one window read per block replaces several full-ring one-hot
    contractions (each of which must touch the whole ring under vmap).
    """
    # Subtractor output analysis.
    sa, any_conv, any_coarse_conv, all_div = analyze_subtractor_output(
        state.subtractor_analyzer, sub_out["y2"], sub_out["e2_refined"],
        sub_out["e2_coarse"],
    )

    # Filter analysis.
    fa, any_consistent, max_echo_path_gain = filter_analyzer_update(
        config, state.filter_analyzer, impulse_responses,
        filter_size_partitions * BLOCK_SIZE, geo, buf,
        blocks_win=blocks_win,
    )

    # FilterDelay update (aec_state.cc:373-398).
    ext_delay = jnp.where(external_delay_valid, external_delay,
                          state.external_delay)
    ext_valid = state.external_delay_valid | external_delay_valid
    delay_headroom_blocks = config.delay.delay_headroom_samples // BLOCK_SIZE
    not_converged = (
        state.strong_not_saturated_render_blocks < 2 * BLOCKS_PER_SECOND
    )
    use_guess = not_converged & ext_valid
    filter_delays = jnp.where(
        use_guess, delay_headroom_blocks, fa.filter_delays_blocks
    )
    min_delay = jnp.min(filter_delays)

    # Active render counters (aec_state.cc:210-228).
    if blocks_win is not None:
        aligned = rb.window_row(blocks_win, min_delay)
    else:
        aligned = rb._take_rows(
            buf.state.blocks,
            jnp.mod(rb.b_read_index(geo, buf.state, buf.n) - min_delay,
                    geo.num_blocks)[None],
            geo.num_blocks,
        )[0, : geo.blocks_row_f].reshape(geo.block_row_shape)
    x_energy = jnp.sum(aligned[0] ** 2, axis=0)  # (C_ren,)
    active_render = jnp.any(
        x_energy > config.render_levels.active_render_limit**2 * BLOCK_SIZE
    )
    saturated = state.capture_signal_saturation
    blocks_active = state.blocks_with_active_render + active_render.astype(
        jnp.int32
    )
    strong_blocks = state.strong_not_saturated_render_blocks + (
        active_render & ~saturated
    ).astype(jnp.int32)

    # ComputeAvgRenderReverb (aec_state.cc:46-97); the decay comes from the
    # adaptive estimator when enabled (aec_state.cc:250 ReverbDecay(false)).
    decay = rde.decay_value(config, state.reverb_decay_est,
                            jnp.asarray(False))
    # One pass over spec_win serves both the min_delay and min_delay+1
    # rows (window_row with a (2,) offset vector).
    if spec_win is not None:
        X2_rows = rb.window_row(
            spec_win, jnp.stack([min_delay, min_delay + 1])
        )  # (2, C, 65)
        X2_at_ch = X2_rows[0]  # (C, 65), reused by erl_update below
        X2_at = jnp.mean(X2_rows[0], axis=0)
        X2_past = jnp.mean(X2_rows[1], axis=0)
    else:
        X2_at_ch = rb.spectrum_at(geo, buf, min_delay)
        X2_past = jnp.mean(rb.spectrum_at(geo, buf, min_delay + 1), axis=0)
        X2_at = jnp.mean(X2_at_ch, axis=0)
    reverb = reverb_update_no_shaping(state.avg_render_reverb, X2_past, 1.0,
                                      decay)
    X2_reverb = X2_at + reverb.reverb

    # EchoAudibility (aec_state.cc:253-257), only when the stationarity
    # properties drive residual scaling.
    audibility = state.echo_audibility
    if config.echo_audibility.use_stationarity_properties:
        audibility = ea.update(
            audibility, buf,
            rb.s_read_index(geo, buf.state, buf.n),
            rb.s_write_index(geo, buf.n),
            geo,
            # Newest inserted block: through blocks_span so the write-behind
            # staging overlays (the row may still be in blocks_pending).
            jnp.swapaxes(
                rb.blocks_span(
                    geo, buf, rb.b_write_index(geo, buf.n), 1
                )[0, : geo.blocks_row_f]
                .reshape(geo.block_row_shape)[0].astype(jnp.float32), 0, 1
            ).T,
            reverb.reverb, min_delay, rb.headroom(geo, buf.state),
            external_delay_valid,
            config.echo_audibility.use_stationarity_properties_at_init,
        )

    # ERLE / ERL.
    # InitialState transition (aec_state.cc:302-331) uses last block's value
    # to trigger erle reset first (order per aec_state.cc:245-247 uses the
    # transition from the PREVIOUS update).
    erle = jax.tree_util.tree_map(
        lambda a, b: jnp.where(state.transition_triggered, a, b),
        reset_erle(config, state.erle, jnp.asarray(False)), state.erle,
    )
    X2_by_delay = None
    if config.erle.num_sections > 1:
        P_ref = config.filter.refined.length_blocks
        X2_by_delay = jnp.mean(
            spec_win[:P_ref] if spec_win is not None
            else rb.spectrum_window(geo, buf, P_ref),
            axis=1,
        )
    erle = erle_update(config, erle, X2_reverb, Y2, E2_refined,
                       sa.filters_converged, X2_by_delay,
                       frequency_responses)
    erl = erl_update(state.erl, sa.filters_converged, X2_at_ch, Y2)

    # Saturation detection (aec_state.cc:439-470).
    usable_prev = state.usable_linear_estimate
    sat_lin = jnp.any(
        (sub_out["s_refined_max_abs"] > 20000.0)
        | (sub_out["s_coarse_max_abs"] > 20000.0)
    )
    max_sample = jnp.max(jnp.abs(aligned[0]))
    sat_nonlin = max_sample * max_echo_path_gain * 10.0 > 32000.0
    saturated_echo = jnp.where(
        saturated, jnp.where(usable_prev, sat_lin, sat_nonlin), False
    )
    if not config.ep_strength.echo_can_saturate:
        saturated_echo = jnp.asarray(False)

    # InitialState::Update.
    init_strong = state.initial_strong_blocks + (
        active_render & ~saturated
    ).astype(jnp.int32)
    if config.filter.conservative_initial_phase:
        still_initial = init_strong < 5 * BLOCKS_PER_SECOND
    else:
        still_initial = (
            init_strong
            < config.filter.initial_state_seconds * BLOCKS_PER_SECOND
        )
    transition = ~still_initial & state.initial_state

    # Transparent mode (legacy, default-enabled unless bounded_erl).
    transparent = state.transparent
    if not config.ep_strength.bounded_erl:
        transparent = transparent_mode_update(
            transparent, min_delay, any_consistent, any_conv, all_div,
            active_render, saturated,
        )

    # FilteringQualityAnalyzer::Update (aec_state.cc:400-437).
    filter_update = active_render & ~saturated
    upd_reset = state.filter_update_blocks_since_reset + filter_update.astype(
        jnp.int32
    )
    upd_start = state.filter_update_blocks_since_start + filter_update.astype(
        jnp.int32
    )
    conv_seen = state.convergence_seen | any_conv
    suff_start = upd_start > BLOCKS_PER_SECOND * 0.4
    suff_reset = suff_start & (upd_reset > BLOCKS_PER_SECOND * 0.2)
    usable = suff_start & suff_reset & (ext_valid | conv_seen)
    if not config.ep_strength.bounded_erl:
        usable = usable & ~transparent.active
    usable = usable & config.filter.use_linear_filter

    # Reverb model estimation (aec_state.cc:298-308). stationary_block is
    # only nonzero with use_stationarity_properties.
    quality = erle.fullband.inst_quality
    quality_valid = erle.fullband.erle_log2_valid
    if config.echo_audibility.use_stationarity_properties:
        stationary_block = ea.is_block_stationary(audibility)
        quality_valid = quality_valid & ~stationary_block
    else:
        stationary_block = jnp.asarray(False)
    rfr = reverb_frequency_response_update(
        config, state.reverb_freq_response, frequency_responses,
        filter_delays, quality, quality_valid, filter_size_partitions - 1,
    )
    rde_state = state.reverb_decay_est
    if config.ep_strength.default_len < 0:
        rde_state = rde.update(
            config, rde_state, fa.h_highpass,
            erle.fullband.inst_quality, erle.fullband.erle_log2_valid,
            filter_delays, usable, stationary_block,
            filter_size_partitions,
        )

    div_frac = state.divergent_fraction + (
        all_div.astype(jnp.float32) - state.divergent_fraction
    ) * (1.0 / BLOCKS_PER_SECOND)

    return state.replace(
        divergent_fraction=div_frac,
        reverb_decay_est=rde_state,
        initial_state=still_initial,
        transition_triggered=transition,
        initial_strong_blocks=init_strong,
        blocks_with_active_render=blocks_active,
        strong_not_saturated_render_blocks=strong_blocks,
        filter_delays_blocks=filter_delays,
        min_filter_delay=min_delay,
        external_delay=ext_delay,
        external_delay_valid=ext_valid,
        usable_linear_estimate=usable,
        filter_update_blocks_since_reset=upd_reset,
        filter_update_blocks_since_start=upd_start,
        convergence_seen=conv_seen,
        saturated_echo=saturated_echo,
        subtractor_analyzer=sa,
        filter_analyzer=fa,
        transparent=transparent,
        erle=erle,
        erl=erl,
        avg_render_reverb=reverb,
        reverb_freq_response=rfr,
        echo_audibility=audibility,
    )


def residual_echo_scaling(config, state: AecStateState):
    """AecState::GetResidualEchoScaling (aec_state.cc:115-126)."""
    limit = (1.5 if config.filter.conservative_initial_phase else 0.8) * 250
    converged = state.strong_not_saturated_render_blocks >= limit
    return ea.residual_echo_scaling(
        state.echo_audibility, converged,
        config.echo_audibility.use_stationarity_properties_at_init,
    )


def transparent_mode_active(config, state: AecStateState):
    if config.ep_strength.bounded_erl:
        return jnp.asarray(False)
    return state.transparent.active


def reverb_decay(config, mild: bool) -> float:
    """ReverbDecayEstimator::Decay with the default fixed-decay config."""
    return abs(
        config.ep_strength.nearend_len if mild else config.ep_strength.default_len
    )
