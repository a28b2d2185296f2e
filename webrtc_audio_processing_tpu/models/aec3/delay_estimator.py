"""AEC3 delay estimation: matched-filter bank, lag aggregation, controller.

Reference: aec3/matched_filter.cc (NLMS bank + pre-echo accumulated error),
aec3/matched_filter_lag_aggregator.cc (histogram aggregation),
aec3/clockdrift_detector.cc, aec3/echo_path_delay_estimator.cc,
aec3/render_delay_controller.cc.

TPU re-design: the matched-filter NLMS bank runs in a Pallas kernel
(ops/pallas_mf.py) with the sliding render windows VMEM-resident and the
reference's exact per-sample update order; off-TPU a lax.scan computes the
same recurrence. The pre-echo accumulated error is reconstructed from the
returned per-sample step sizes for the winner filter only, and the lag
aggregation histograms update via one-hot arithmetic (dynamic-index
scatters would serialize per stream under vmap on TPU).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from webrtc_audio_processing_tpu.models.aec3 import render_buffer as rb
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config
from webrtc_audio_processing_tpu.ops import pallas_mf, pallas_pre_echo

_PRE_ECHO_FNS: dict = {}


def _pre_echo_fn(sub: int, taps: int):
    key = (sub, taps)
    fn = _PRE_ECHO_FNS.get(key)
    if fn is None:
        fn = pallas_pre_echo.make_pre_echo(sub, taps, ACC_ERR_RATE)
        _PRE_ECHO_FNS[key] = fn
    return fn

BLOCK_SIZE = 64
BLOCK_SIZE_LOG2 = 6
NUM_BLOCKS_PER_SECOND = 250
WINDOW_SUB_BLOCKS = 32  # kMatchedFilterWindowSizeSubBlocks
SHIFT_SUB_BLOCKS = 24  # kMatchedFilterAlignmentShiftSizeSubBlocks
ACC_ERR_RATE = 4  # kAccumulatedErrorSubSampleRate
HISTOGRAM_DATA_SIZE = 250


@dataclass(frozen=True)
class DelayGeometry:
    """Static sizes for the delay estimation path."""

    down_sampling_factor: int
    sub_block_size: int
    num_filters: int
    filter_length: int  # taps per matched filter
    shift_samples: int  # filter_intra_lag_shift_
    ds_size: int
    max_filter_lag: int
    peak_histogram_size: int
    pre_echo_histogram_size: int
    ds_block_size_log2: int

    @staticmethod
    def create(config: EchoCanceller3Config) -> "DelayGeometry":
        ds = config.delay.down_sampling_factor
        sub = BLOCK_SIZE // ds
        filter_length = WINDOW_SUB_BLOCKS * sub
        shift = SHIFT_SUB_BLOCKS * sub
        nf = config.delay.num_filters
        max_lag = nf * shift + filter_length
        ds_log2 = max(BLOCK_SIZE_LOG2 - (ds.bit_length() - 1), 0)
        return DelayGeometry(
            down_sampling_factor=ds,
            sub_block_size=sub,
            num_filters=nf,
            filter_length=filter_length,
            shift_samples=shift,
            ds_size=rb.get_down_sampled_buffer_size(ds, nf),
            max_filter_lag=max_lag,
            peak_histogram_size=max_lag + 1,
            pre_echo_histogram_size=((max_lag + 1) * ds) >> BLOCK_SIZE_LOG2,
            ds_block_size_log2=ds_log2,
        )


@struct.dataclass
class MatchedFilterState:
    filters: jnp.ndarray  # (N, L)
    accumulated_error: jnp.ndarray  # (N, L/4), init 1
    number_pre_echo_updates: jnp.ndarray  # () int32
    last_detected_best_lag_filter: jnp.ndarray  # () int32, -1 when none
    # Reported estimate: (lag, pre_echo_lag, valid).
    reported_lag: jnp.ndarray  # () int32
    reported_pre_echo_lag: jnp.ndarray  # () int32
    reported_valid: jnp.ndarray  # () bool


@struct.dataclass
class PeakAggregatorState:
    histogram: jnp.ndarray  # (peak_histogram_size,) int32
    histogram_data: jnp.ndarray  # (250,) int32
    histogram_data_index: jnp.ndarray  # () int32
    candidate: jnp.ndarray  # () int32


@struct.dataclass
class PreEchoAggregatorState:
    histogram: jnp.ndarray  # (pre_echo_histogram_size,) int32
    histogram_data: jnp.ndarray  # (250,) int32, -1 = not updated
    histogram_data_index: jnp.ndarray  # () int32
    pre_echo_candidate: jnp.ndarray  # () int32
    number_updates: jnp.ndarray  # () int32


@struct.dataclass
class LagAggregatorState:
    peak: PeakAggregatorState
    pre_echo: PreEchoAggregatorState
    significant_candidate_found: jnp.ndarray  # () bool


@struct.dataclass
class ClockdriftState:
    delay_history: jnp.ndarray  # (3,) int32
    stability_counter: jnp.ndarray  # () int32
    level: jnp.ndarray  # () int32: 0 none, 1 probable, 2 verified


@struct.dataclass
class DelayEstimatorState:
    matched_filter: MatchedFilterState
    aggregator: LagAggregatorState
    clockdrift: ClockdriftState
    capture_mixer: rb.AlignmentMixerState
    capture_decimator_aa: object
    capture_decimator_nr: object
    # EchoPathDelayEstimator (echo_path_delay_estimator.h).
    old_lag: jnp.ndarray  # () int32
    old_lag_valid: jnp.ndarray  # () bool
    consistent_estimate_counter: jnp.ndarray  # () int32
    # RenderDelayController (render_delay_controller.cc).
    delay_blocks: jnp.ndarray  # () int32
    delay_valid: jnp.ndarray  # () bool
    delay_samples: jnp.ndarray  # () int32
    delay_samples_valid: jnp.ndarray  # () bool
    delay_samples_refined: jnp.ndarray  # () bool
    delay_change_counter: jnp.ndarray  # () int32
    last_delay_estimate_refined: jnp.ndarray  # () bool


def _init_matched_filter(geo: DelayGeometry) -> MatchedFilterState:
    return MatchedFilterState(
        filters=jnp.zeros((geo.num_filters, geo.filter_length)),
        accumulated_error=jnp.ones(
            (geo.num_filters, geo.filter_length // ACC_ERR_RATE)
        ),
        number_pre_echo_updates=jnp.asarray(0, jnp.int32),
        last_detected_best_lag_filter=jnp.asarray(-1, jnp.int32),
        reported_lag=jnp.asarray(0, jnp.int32),
        reported_pre_echo_lag=jnp.asarray(0, jnp.int32),
        reported_valid=jnp.asarray(False),
    )


def _init_aggregator(geo: DelayGeometry) -> LagAggregatorState:
    return LagAggregatorState(
        peak=PeakAggregatorState(
            histogram=jnp.zeros((geo.peak_histogram_size,), jnp.int32),
            histogram_data=jnp.zeros((HISTOGRAM_DATA_SIZE,), jnp.int32),
            histogram_data_index=jnp.asarray(0, jnp.int32),
            candidate=jnp.asarray(0, jnp.int32),
        ),
        pre_echo=PreEchoAggregatorState(
            histogram=jnp.zeros((geo.pre_echo_histogram_size,), jnp.int32),
            histogram_data=jnp.full((HISTOGRAM_DATA_SIZE,), -1, jnp.int32),
            histogram_data_index=jnp.asarray(0, jnp.int32),
            pre_echo_candidate=jnp.asarray(0, jnp.int32),
            number_updates=jnp.asarray(0, jnp.int32),
        ),
        significant_candidate_found=jnp.asarray(False),
    )


def init_state(geo: DelayGeometry, config: EchoCanceller3Config,
               num_channels: int) -> DelayEstimatorState:
    from webrtc_audio_processing_tpu.ops import biquad

    aa_sections = 3 if geo.down_sampling_factor == 4 else 5
    nr_sections = 0 if geo.down_sampling_factor == 8 else 1
    return DelayEstimatorState(
        matched_filter=_init_matched_filter(geo),
        aggregator=_init_aggregator(geo),
        clockdrift=ClockdriftState(
            delay_history=jnp.zeros((3,), jnp.int32),
            stability_counter=jnp.asarray(0, jnp.int32),
            level=jnp.asarray(0, jnp.int32),
        ),
        capture_mixer=rb.AlignmentMixerState(
            strong_block_counters=jnp.zeros((2,), jnp.int32),
            cumulative_energies=jnp.zeros((num_channels,)),
            block_counter=jnp.asarray(0, jnp.int32),
            selected_channel=jnp.asarray(0, jnp.int32),
        ),
        capture_decimator_aa=biquad.init_state(aa_sections),
        capture_decimator_nr=biquad.init_state(nr_sections),
        old_lag=jnp.asarray(0, jnp.int32),
        old_lag_valid=jnp.asarray(False),
        consistent_estimate_counter=jnp.asarray(0, jnp.int32),
        delay_blocks=jnp.asarray(0, jnp.int32),
        delay_valid=jnp.asarray(False),
        delay_samples=jnp.asarray(0, jnp.int32),
        delay_samples_valid=jnp.asarray(False),
        delay_samples_refined=jnp.asarray(False),
        delay_change_counter=jnp.asarray(0, jnp.int32),
        last_delay_estimate_refined=jnp.asarray(False),
    )


def _reset_matched_filter(state: MatchedFilterState, full_reset):
    """MatchedFilter::Reset (matched_filter.cc)."""
    return state.replace(
        filters=jnp.zeros_like(state.filters),
        reported_valid=jnp.asarray(False),
        accumulated_error=jnp.where(
            full_reset, jnp.ones_like(state.accumulated_error),
            state.accumulated_error,
        ),
        number_pre_echo_updates=jnp.where(
            full_reset, 0, state.number_pre_echo_updates
        ),
    )


def matched_filter_update(
    geo: DelayGeometry,
    config: EchoCanceller3Config,
    state: MatchedFilterState,
    lowrate,  # (DS,) low-rate render ring buffer
    lr_read,  # () int32 read index
    capture_ds,  # (sub_block_size,) downsampled capture
    use_slow_smoothing,
) -> MatchedFilterState:
    """MatchedFilter::Update (matched_filter.cc:693-812) for all N filters."""
    n_filters, length = state.filters.shape
    sub = geo.sub_block_size
    y = capture_ds
    excitation_limit = (
        config.render_levels.poor_excitation_render_limit_ds8
        if geo.down_sampling_factor == 8
        else config.render_levels.poor_excitation_render_limit
    )
    smoothing = jnp.where(
        use_slow_smoothing,
        config.delay.delay_estimate_smoothing_delay_found,
        config.delay.delay_estimate_smoothing,
    )
    x2_sum_threshold = length * excitation_limit**2

    error_sum_anchor = jnp.sum(y * y)
    shifts = jnp.arange(n_filters, dtype=jnp.int32) * geo.shift_samples
    seg_len = sub - 1 + length
    acc_chunks = length // ACC_ERR_RATE

    # NLMS bank core: Pallas kernel on TPU (VMEM-resident sliding windows;
    # see ops/pallas_mf.py), reference-order XLA scan on CPU / single
    # stream. Returns the per-sample NLMS steps `alphas`, which determine
    # every intermediate filter exactly (h_i = h0 + sum_{j<i} a_j x_j) —
    # the pre-echo statistics below are reconstructed from them for the
    # winner filter only instead of materializing all (N, sub, L) windows.
    nlms = pallas_mf.make_nlms(
        n_filters, geo.shift_samples, geo.ds_size,
        float(x2_sum_threshold), sub=sub, taps=length,
        interpret=jax.default_backend() != "tpu",
    )
    h, alphas, error_sums, filters_updated, segs = nlms(
        lowrate, lr_read, state.filters, y,
        jnp.broadcast_to(smoothing, ()).astype(jnp.float32),
    )

    # Lag estimates: peak of h^2 per filter (aec3::MaxSquarePeakIndex).
    lag_estimates = jnp.argmax(h * h, axis=-1).astype(jnp.int32)  # (N,)
    reliable = (
        (lag_estimates > 2)
        & (lag_estimates < length - 10)
        & (
            error_sums
            < config.delay.delay_candidate_detection_threshold
            * error_sum_anchor
        )
    )

    # Winner search (matched_filter.cc:764-790): ascending n, strict <.
    lags = lag_estimates + shifts
    winner_error = error_sum_anchor
    winner_index = jnp.asarray(-1, jnp.int32)
    winner_lag = jnp.asarray(0, jnp.int32)
    prev_lag = jnp.asarray(0, jnp.int32)
    prev_valid = jnp.asarray(False)
    for n in range(n_filters):
        take = filters_updated[n] & reliable[n] & (error_sums[n] < winner_error)
        same_as_prev = prev_valid & (prev_lag == lags[n])
        winner_lag = jnp.where(
            take, jnp.where(same_as_prev, prev_lag, lags[n]), winner_lag
        )
        winner_index = jnp.where(
            take,
            jnp.where(same_as_prev, n - 1, n).astype(jnp.int32),
            winner_index,
        )
        winner_error = jnp.where(take, error_sums[n], winner_error)
        prev_lag, prev_valid = lags[n], jnp.asarray(True)

    found = winner_index != -1

    # Pre-echo accumulated-error update (matched_filter.cc:792-812). The
    # instantaneous error belongs to filter last_detected_best_lag_filter.
    pre_echo_on = config.delay.detect_pre_echo
    acc_err = state.accumulated_error
    num_updates = state.number_pre_echo_updates
    pre_echo_lag = winner_lag
    if pre_echo_on:
        matches_last = found & (
            state.last_detected_best_lag_filter == winner_index
        )
        do_acc = matches_last & (error_sum_anchor > 1.0)
        winner_row = jnp.maximum(winner_index, 0)
        # Row select/update via a filter-axis one-hot: N is tiny (5) and a
        # dynamic-index scatter would serialize per stream under vmap.
        row_oh = (jnp.arange(n_filters) == winner_row)[:, None]  # (N, 1)

        # Winner-row instantaneous accumulated error, reconstructed from
        # the NLMS steps: s_partial[i, c] = chunkprefix(h_i . x_i) with
        # h_i = h0 + sum_{j<i} a_j x_j (matches the reference's in-loop
        # accumulation exactly up to fp reordering). Only the winner's
        # segment is selected; on TPU a Pallas kernel keeps it
        # VMEM-resident instead of materializing the (sub, L) window
        # stacks (ops/pallas_pre_echo.py).
        seg_w = jnp.sum(jnp.where(row_oh, segs, 0.0), axis=0)
        h0_w = jnp.sum(jnp.where(row_oh, state.filters, 0.0), axis=0)
        alpha_w = jnp.sum(
            jnp.where(row_oh, alphas, 0.0), axis=0
        )  # (sub,)
        inst_fn = _pre_echo_fn(sub, length)
        inst_sel = inst_fn(seg_w, h0_w, alpha_w, y)  # (chunks,)
        err_norm = inst_sel / jnp.maximum(error_sum_anchor, 1e-30)
        cur = jnp.sum(jnp.where(row_oh, acc_err, 0.0), axis=0)
        new_row = jnp.where(
            err_norm < cur, err_norm, cur + 0.015 * (err_norm - cur)
        )
        acc_err = jnp.where(do_acc & row_oh, new_row[None, :], acc_err)
        num_updates = num_updates + jnp.where(do_acc, 1, 0)

        # ComputePreEchoLag (matched_filter.cc:60-78).
        shift_winner = winner_row * geo.shift_samples
        base_estimate = winner_lag - shift_winner
        max_pre_lag = jnp.minimum(base_estimate // ACC_ERR_RATE, acc_chunks)
        row = jnp.sum(jnp.where(row_oh, acc_err, 0.0), axis=0)
        ks = jnp.arange(acc_chunks)
        in_range = ks < max_pre_lag
        # blocked[k] = any(row[j] > 0.5 for j in [k, max_pre_lag)).
        over = (row > 0.5) & in_range
        blocked = jnp.flip(jnp.cumsum(jnp.flip(over.astype(jnp.int32)))) > 0
        ok = in_range & ~blocked
        k_min = jnp.min(jnp.where(ok, ks, acc_chunks))
        computed = jnp.where(
            k_min < acc_chunks, (k_min + 1) * ACC_ERR_RATE - 1, base_estimate
        )
        pre_echo_estimate = computed + shift_winner
        pre_echo_lag = jnp.where(
            matches_last & (num_updates >= 50), pre_echo_estimate, winner_lag
        )

    new_last = jnp.where(
        found, winner_index, state.last_detected_best_lag_filter
    )

    return state.replace(
        filters=h,
        accumulated_error=acc_err,
        number_pre_echo_updates=num_updates,
        last_detected_best_lag_filter=new_last,
        reported_lag=jnp.where(found, winner_lag, state.reported_lag),
        reported_pre_echo_lag=jnp.where(
            found, pre_echo_lag, state.reported_pre_echo_lag
        ),
        reported_valid=found,
    )


def _one_hot_i32(idx, size):
    """int32 one-hot built from an iota compare — stays vectorized under
    vmap (a scatter here would serialize into a per-stream loop on TPU)."""
    return (jnp.arange(size) == idx).astype(jnp.int32)


def _peak_aggregate(state: PeakAggregatorState, lag):
    """HighestPeakAggregator::Aggregate (matched_filter_lag_aggregator.cc)."""
    size = state.histogram.shape[0]
    # One-hot read: a per-stream dynamic index into the 250-slot FIFO
    # serializes into a per-stream gather loop under vmap.
    slot_oh = jnp.arange(HISTOGRAM_DATA_SIZE) == state.histogram_data_index
    old = jnp.sum(jnp.where(slot_oh, state.histogram_data, 0))
    hist = (
        state.histogram - _one_hot_i32(old, size) + _one_hot_i32(lag, size)
    )
    slot = _one_hot_i32(state.histogram_data_index, HISTOGRAM_DATA_SIZE)
    return PeakAggregatorState(
        histogram=hist,
        histogram_data=state.histogram_data * (1 - slot) + lag * slot,
        histogram_data_index=jnp.mod(
            state.histogram_data_index + 1, HISTOGRAM_DATA_SIZE
        ),
        candidate=jnp.argmax(hist).astype(jnp.int32),
    )


def _pre_echo_aggregate(geo: DelayGeometry, state: PreEchoAggregatorState,
                        pre_echo_lag):
    """PreEchoLagAggregator::Aggregate (matched_filter_lag_aggregator.cc)."""
    size = state.histogram.shape[0]
    block = jnp.clip(pre_echo_lag >> geo.ds_block_size_log2, 0, size - 1)
    old = state.histogram_data[state.histogram_data_index]
    hist = (
        state.histogram
        - jnp.where(old != -1, _one_hot_i32(jnp.maximum(old, 0), size), 0)
        + _one_hot_i32(block, size)
    )

    number_updates = state.number_updates
    in_startup = number_updates < NUM_BLOCKS_PER_SECOND * 2
    number_updates = jnp.where(in_startup, number_updates + 1, number_updates)

    # Penalized stride-window search during startup.
    n_windows = (size - WINDOW_SUB_BLOCKS) // WINDOW_SUB_BLOCKS + 1
    w = hist[: n_windows * WINDOW_SUB_BLOCKS].reshape(
        n_windows, WINDOW_SUB_BLOCKS
    )
    w_max = jnp.max(w, axis=-1).astype(jnp.float32)
    w_arg = jnp.argmax(w, axis=-1)
    penal = 0.7 ** jnp.arange(n_windows)
    weighted = w_max * penal
    best_w = jnp.argmax(weighted)
    startup_candidate = (best_w * WINDOW_SUB_BLOCKS + w_arg[best_w]).astype(
        jnp.int32
    )
    plain_candidate = jnp.argmax(hist).astype(jnp.int32)
    cand_block = jnp.where(in_startup, startup_candidate, plain_candidate)

    slot = _one_hot_i32(state.histogram_data_index, HISTOGRAM_DATA_SIZE)
    return PreEchoAggregatorState(
        histogram=hist,
        histogram_data=state.histogram_data * (1 - slot) + block * slot,
        histogram_data_index=jnp.mod(
            state.histogram_data_index + 1, HISTOGRAM_DATA_SIZE
        ),
        pre_echo_candidate=(cand_block << geo.ds_block_size_log2).astype(
            jnp.int32
        ),
        number_updates=number_updates,
    )


def aggregate(geo: DelayGeometry, config: EchoCanceller3Config,
              state: LagAggregatorState, lag, pre_echo_lag, lag_valid):
    """MatchedFilterLagAggregator::Aggregate
    (matched_filter_lag_aggregator.cc:81-110).

    Returns (state, delay, delay_valid, refined_quality).
    """
    headroom = int(
        config.delay.delay_headroom_samples // config.delay.down_sampling_factor
    )
    pre_echo = _pre_echo_aggregate(
        geo, state.pre_echo, jnp.maximum(0, pre_echo_lag - headroom)
    )
    pre_echo = jax.tree_util.tree_map(
        lambda a, b: jnp.where(lag_valid, a, b), pre_echo, state.pre_echo
    )

    peak = _peak_aggregate(state.peak, jnp.maximum(0, lag - headroom))
    peak = jax.tree_util.tree_map(
        lambda a, b: jnp.where(lag_valid, a, b), peak, state.peak
    )

    count = peak.histogram[peak.candidate]
    thr = config.delay.delay_selection_thresholds
    significant = state.significant_candidate_found | (
        lag_valid & (count > thr.converged)
    )
    emit = lag_valid & (
        (count > thr.converged)
        | ((count > thr.initial) & ~state.significant_candidate_found)
    )
    refined = significant
    delay = jnp.where(
        config.delay.detect_pre_echo, pre_echo.pre_echo_candidate,
        peak.candidate,
    )
    return (
        LagAggregatorState(
            peak=peak, pre_echo=pre_echo,
            significant_candidate_found=significant,
        ),
        delay,
        emit,
        refined,
    )


def _reset_aggregator(state: LagAggregatorState, hard_reset):
    init = _init_aggregator_like(state)
    new = init.replace(
        significant_candidate_found=jnp.where(
            hard_reset, False, state.significant_candidate_found
        )
    )
    return new


def _init_aggregator_like(state: LagAggregatorState) -> LagAggregatorState:
    return LagAggregatorState(
        peak=PeakAggregatorState(
            histogram=jnp.zeros_like(state.peak.histogram),
            histogram_data=jnp.zeros_like(state.peak.histogram_data),
            histogram_data_index=jnp.zeros_like(state.peak.histogram_data_index),
            candidate=jnp.zeros_like(state.peak.candidate),
        ),
        pre_echo=PreEchoAggregatorState(
            histogram=jnp.zeros_like(state.pre_echo.histogram),
            histogram_data=jnp.full_like(state.pre_echo.histogram_data, -1),
            histogram_data_index=jnp.zeros_like(
                state.pre_echo.histogram_data_index
            ),
            pre_echo_candidate=jnp.zeros_like(state.pre_echo.pre_echo_candidate),
            number_updates=jnp.zeros_like(state.pre_echo.number_updates),
        ),
        significant_candidate_found=state.significant_candidate_found,
    )


def _clockdrift_update(state: ClockdriftState, delay_estimate, enabled):
    """ClockdriftDetector::Update (clockdrift_detector.cc:19-58)."""
    same = delay_estimate == state.delay_history[0]
    stab = jnp.where(same, state.stability_counter + 1, 0)
    level = jnp.where(same & (stab > 7500), 0, state.level)

    d1 = state.delay_history[0] - delay_estimate
    d2 = state.delay_history[1] - delay_estimate
    d3 = state.delay_history[2] - delay_estimate
    prob_up = ((d1 == -1) & (d2 == -2)) | ((d1 == -2) & (d2 == -1))
    drift_up = prob_up & (d3 == -3)
    prob_down = ((d1 == 1) & (d2 == 2)) | ((d1 == 2) & (d2 == 1))
    drift_down = prob_down & (d3 == 3)
    new_level = jnp.where(
        drift_up | drift_down,
        2,
        jnp.where((prob_up | prob_down) & (state.level == 0), 1, state.level),
    )
    level = jnp.where(same, level, new_level)
    history = jnp.where(
        same,
        state.delay_history,
        jnp.stack(
            [delay_estimate, state.delay_history[0], state.delay_history[1]]
        ).astype(jnp.int32),
    )
    out = ClockdriftState(
        delay_history=history, stability_counter=stab, level=level
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(enabled, a, b), out, state
    )


def get_delay(
    geo: DelayGeometry,
    config: EchoCanceller3Config,
    state: DelayEstimatorState,
    lowrate,
    lr_read,
    capture_block,  # (bands, 64, C)
):
    """RenderDelayControllerImpl::GetDelay (render_delay_controller.cc:99-166)
    including EchoPathDelayEstimator::EstimateDelay
    (echo_path_delay_estimator.cc:66-124).

    Returns (state, delay_blocks, delay_valid).
    """
    band0 = jnp.swapaxes(capture_block[0], 0, 1)  # (C, 64)
    new_mixer, mono = _alignment_mix_capture(config, state.capture_mixer, band0)
    state = state.replace(capture_mixer=new_mixer)
    state, capture_ds = _decimate_capture(geo, state, mono)

    mf = matched_filter_update(
        geo, config, state.matched_filter, lowrate, lr_read, capture_ds,
        state.aggregator.significant_candidate_found,
    )

    agg, lag_samples_ds, lag_valid, refined = aggregate(
        geo, config, state.aggregator,
        mf.reported_lag, mf.reported_pre_echo_lag, mf.reported_valid,
    )

    # Clockdrift detection on the highest-peak candidate
    # (echo_path_delay_estimator.cc:96-101).
    clock = _clockdrift_update(
        state.clockdrift, agg.peak.candidate, lag_valid & refined
    )

    delay_samples = lag_samples_ds * geo.down_sampling_factor

    # Consistent-estimate soft reset (echo_path_delay_estimator.cc:113-121).
    consistent = (
        state.old_lag_valid & lag_valid & (state.old_lag == delay_samples)
    )
    counter = jnp.where(consistent, state.consistent_estimate_counter + 1, 0)
    soft_reset = counter > NUM_BLOCKS_PER_SECOND // 2
    mf = jax.tree_util.tree_map(
        lambda a, b: jnp.where(soft_reset, a, b),
        _reset_matched_filter(mf, jnp.asarray(False)), mf,
    )
    counter = jnp.where(soft_reset, 0, counter)
    # old_aggregated_lag_ is overwritten every block (including to invalid)
    # and cleared by the soft reset (echo_path_delay_estimator.cc:112-121).
    state = state.replace(
        matched_filter=mf,
        aggregator=agg,
        clockdrift=clock,
        old_lag=delay_samples,
        old_lag_valid=lag_valid & ~soft_reset,
        consistent_estimate_counter=counter,
    )

    # Render delay controller aggregation (render_delay_controller.cc:108-160).
    changed = lag_valid & (
        ~state.delay_samples_valid | (state.delay_samples != delay_samples)
    )
    delay_change_counter = jnp.where(changed, 0, state.delay_change_counter)
    delay_change_counter = jnp.where(
        delay_change_counter < 2 * NUM_BLOCKS_PER_SECOND,
        delay_change_counter + 1,
        delay_change_counter,
    )

    delay_samples_state = jnp.where(
        lag_valid, delay_samples, state.delay_samples
    )
    delay_samples_valid = state.delay_samples_valid | lag_valid
    delay_samples_refined = jnp.where(
        lag_valid, refined, state.delay_samples_refined
    )

    # ComputeBufferDelay with hysteresis (render_delay_controller.cc:54-71).
    new_delay_blocks = delay_samples_state >> BLOCK_SIZE_LOG2
    use_hysteresis = (
        state.last_delay_estimate_refined & delay_samples_refined
    )
    hyst = jnp.where(use_hysteresis, config.delay.hysteresis_limit_blocks, 0)
    keep = (
        state.delay_valid
        & (new_delay_blocks > state.delay_blocks)
        & (new_delay_blocks <= state.delay_blocks + hyst)
    )
    new_delay_blocks = jnp.where(keep, state.delay_blocks, new_delay_blocks)

    delay_blocks = jnp.where(
        delay_samples_valid, new_delay_blocks, state.delay_blocks
    )
    delay_valid = state.delay_valid | delay_samples_valid
    last_refined = jnp.where(
        delay_samples_valid, delay_samples_refined,
        state.last_delay_estimate_refined,
    )

    state = state.replace(
        delay_blocks=delay_blocks,
        delay_valid=delay_valid,
        delay_samples=delay_samples_state,
        delay_samples_valid=delay_samples_valid,
        delay_samples_refined=delay_samples_refined,
        delay_change_counter=delay_change_counter,
        last_delay_estimate_refined=last_refined,
    )
    return state, delay_blocks, delay_valid


def reset_delay_controller(state: DelayEstimatorState, reset_delay_confidence):
    """RenderDelayControllerImpl::Reset + EchoPathDelayEstimator::Reset."""
    return state.replace(
        matched_filter=_reset_matched_filter(
            state.matched_filter, jnp.asarray(True)
        ),
        aggregator=_reset_aggregator(state.aggregator, reset_delay_confidence),
        old_lag_valid=jnp.asarray(False),
        consistent_estimate_counter=jnp.asarray(0, jnp.int32),
        delay_valid=jnp.asarray(False),
        delay_samples_valid=jnp.asarray(False),
        delay_change_counter=jnp.asarray(0, jnp.int32),
        last_delay_estimate_refined=jnp.where(
            reset_delay_confidence, False, state.last_delay_estimate_refined
        ),
    )


def _alignment_mix_capture(config: EchoCanceller3Config, mixer, band0):
    return rb._alignment_mix(
        config.delay.capture_alignment_mixing, mixer, band0
    )


def _decimate_capture(geo: DelayGeometry, state, x):
    from webrtc_audio_processing_tpu.ops import biquad

    if geo.down_sampling_factor == 4:
        aa_b, aa_a = rb._LOW_PASS_DS4_B, rb._LOW_PASS_DS4_A
    else:
        aa_b, aa_a = rb._BAND_PASS_DS8_B, rb._BAND_PASS_DS8_A
    # Host-numpy coefficients (not jnp.asarray): staged constants read as
    # tracers and would force biquad.process onto its per-sample scan
    # fallback instead of the Pallas cascade kernel.
    new_aa, y = biquad.process(aa_b, aa_a, state.capture_decimator_aa, x)
    if geo.down_sampling_factor != 8:
        new_nr, y = biquad.process(
            rb._HIGH_PASS_B, rb._HIGH_PASS_A,
            state.capture_decimator_nr, y,
        )
    else:
        new_nr = state.capture_decimator_nr
    return (
        state.replace(capture_decimator_aa=new_aa, capture_decimator_nr=new_nr),
        y[:: geo.down_sampling_factor],
    )
