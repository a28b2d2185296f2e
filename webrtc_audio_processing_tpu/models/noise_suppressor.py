"""Noise suppressor: spectral Wiener filtering with quantile noise estimation.

TPU-native re-design of the reference NS (modules/audio_processing/ns/):
one pure ``analyze`` + ``process`` step pair per 10 ms frame. All per-bin
C++ loops are vectorized over a (channels, 129) spectrum layout; the only
true recurrences are frame-to-frame (carried in ``NsState``) plus one
bin-to-bin carry in the noise update (``PostUpdate``'s gamma chain,
noise_estimator.cc:159-200) which is expressible as a shifted-array select
because gamma only depends on the previous bin's speech probability.

Geometry (ns/ns_common.h:18-24): 160-sample frames at the 16 kHz band-0
rate, 256-pt FFT with 96 samples of history, hybrid Hann/flat window.

Reference map:
- noise_suppressor.cc        -> analyze() / process()
- quantile_noise_estimator.cc-> _quantile_estimate()
- noise_estimator.cc         -> _noise_pre_update() / _noise_post_update()
- speech_probability_estimator.cc / signal_model_estimator.cc /
  prior_signal_model_estimator.cc / histograms.cc -> _speech_prob_update()
- wiener_filter.cc           -> _wiener_update() / _overall_scaling()
- suppression_params.cc      -> SUPPRESSION_PARAMS
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from webrtc_audio_processing_tpu.ops import mxu_fft
import numpy as np
from flax import struct

from webrtc_audio_processing_tpu.config import NoiseSuppressionLevel
from webrtc_audio_processing_tpu.ops.fast_math import exp_approx, log_approx

FFT_SIZE = 256
NUM_BINS = FFT_SIZE // 2 + 1  # 129
FRAME_SIZE = 160
OVERLAP = FFT_SIZE - FRAME_SIZE  # 96

SHORT_STARTUP_BLOCKS = 50
LONG_STARTUP_BLOCKS = 200
FEATURE_UPDATE_WINDOW = 500
HISTOGRAM_SIZE = 1000
BIN_SIZE_LRT = 0.1
BIN_SIZE_SPEC_FLAT = 0.05
BIN_SIZE_SPEC_DIFF = 0.1
NUM_SIMULT = 3  # quantile_noise_estimator.h:23

# Hybrid Hanning/flat analysis+synthesis window (noise_suppressor.cc:60-96):
# first 96 samples are sin(pi*i/192), samples 96..160 are untouched (gain 1),
# samples 161..255 mirror the first half (table[95..1]).
_half = np.sin(np.pi * np.arange(96) / 192.0).astype(np.float32)
WINDOW = jnp.asarray(
    np.concatenate([_half, np.ones(65, np.float32), _half[95:0:-1]])
)

# ln(i) table, zero below i=5 (noise_estimator.cc:33-56).
_log_i = np.log(np.maximum(np.arange(NUM_BINS), 1)).astype(np.float32)
_log_i[:5] = 0.0
LOG_TABLE = jnp.asarray(_log_i)


@dataclass(frozen=True)
class SuppressionParams:
    """suppression_params.cc:19-47."""

    over_subtraction_factor: float
    minimum_attenuating_gain: float
    use_attenuation_adjustment: bool


SUPPRESSION_PARAMS = {
    NoiseSuppressionLevel.LOW: SuppressionParams(1.0, 0.5, False),
    NoiseSuppressionLevel.MODERATE: SuppressionParams(1.0, 0.25, True),
    NoiseSuppressionLevel.HIGH: SuppressionParams(1.1, 0.125, True),
    NoiseSuppressionLevel.VERY_HIGH: SuppressionParams(1.25, 0.09, True),
}


@struct.dataclass
class NsState:
    """Per-stream NS state. Leading axis of every array is channels."""

    num_analyzed_frames: jnp.ndarray  # () int32, starts at -1

    # Filterbank memories (noise_suppressor.h:70-74).
    analyze_analysis_memory: jnp.ndarray  # (C, 96)
    prev_analysis_signal_spectrum: jnp.ndarray  # (C, 129), init 1
    process_analysis_memory: jnp.ndarray  # (C, 96)
    process_synthesis_memory: jnp.ndarray  # (C, 96)
    process_delay_memory: jnp.ndarray  # (C, num_bands-1, 96)

    # NoiseEstimator (noise_estimator.h:64-70).
    white_noise_level: jnp.ndarray  # (C,)
    pink_noise_numerator: jnp.ndarray  # (C,)
    pink_noise_exp: jnp.ndarray  # (C,)
    prev_noise_spectrum: jnp.ndarray  # (C, 129)
    conservative_noise_spectrum: jnp.ndarray  # (C, 129)
    parametric_noise_spectrum: jnp.ndarray  # (C, 129)
    noise_spectrum: jnp.ndarray  # (C, 129)

    # QuantileNoiseEstimator (quantile_noise_estimator.h:37-41).
    density: jnp.ndarray  # (C, 3, 129), init 0.3
    log_quantile: jnp.ndarray  # (C, 3, 129), init 8
    quantile: jnp.ndarray  # (C, 129), init 0
    counter: jnp.ndarray  # (C, 3) int32, init floor(200*(s+1)/3)
    num_updates: jnp.ndarray  # (C,) int32, init 1

    # WienerFilter (wiener_filter.h:51-53).
    wiener_filter: jnp.ndarray  # (C, 129), init 1
    initial_spectral_estimate: jnp.ndarray  # (C, 129)
    spectrum_prev_process: jnp.ndarray  # (C, 129)

    # SpeechProbabilityEstimator (speech_probability_estimator.h:46-47).
    prior_speech_prob: jnp.ndarray  # (C,), init 0.5
    speech_probability: jnp.ndarray  # (C, 129)

    # SignalModel (signal_model.cc:17-24).
    lrt: jnp.ndarray  # (C,), init 0.5
    spectral_flatness: jnp.ndarray  # (C,), init 0.5
    spectral_diff: jnp.ndarray  # (C,), init 0.5
    avg_log_lrt: jnp.ndarray  # (C, 129), init 0.5

    # SignalModelEstimator (signal_model_estimator.h:48-51).
    diff_normalization: jnp.ndarray  # (C,)
    signal_energy_sum: jnp.ndarray  # (C,)
    histogram_analysis_counter: jnp.ndarray  # (C,) int32, init 500

    # PriorSignalModel (prior_signal_model.h:22-27).
    prior_lrt: jnp.ndarray  # (C,), init 0.5
    prior_flatness_threshold: jnp.ndarray  # (C,), init 0.5
    prior_template_diff_threshold: jnp.ndarray  # (C,), init 0.5
    prior_lrt_weighting: jnp.ndarray  # (C,), init 1
    prior_flatness_weighting: jnp.ndarray  # (C,), init 0
    prior_difference_weighting: jnp.ndarray  # (C,), init 0

    # Histograms (histograms.h:48-50): stacked [lrt, flatness, diff].
    histograms: jnp.ndarray  # (C, 3, 1000) int32


def init_state(num_channels: int, num_bands: int, dtype=jnp.float32) -> NsState:
    c = num_channels
    f32 = lambda *s: jnp.zeros(s, dtype)  # noqa: E731
    counter0 = jnp.asarray(
        np.floor(LONG_STARTUP_BLOCKS * (np.arange(NUM_SIMULT) + 1.0) / NUM_SIMULT),
        jnp.int32,
    )
    return NsState(
        num_analyzed_frames=jnp.asarray(-1, jnp.int32),
        analyze_analysis_memory=f32(c, OVERLAP),
        prev_analysis_signal_spectrum=jnp.ones((c, NUM_BINS), dtype),
        process_analysis_memory=f32(c, OVERLAP),
        process_synthesis_memory=f32(c, OVERLAP),
        process_delay_memory=f32(c, max(num_bands - 1, 0), OVERLAP),
        white_noise_level=f32(c),
        pink_noise_numerator=f32(c),
        pink_noise_exp=f32(c),
        prev_noise_spectrum=f32(c, NUM_BINS),
        conservative_noise_spectrum=f32(c, NUM_BINS),
        parametric_noise_spectrum=f32(c, NUM_BINS),
        noise_spectrum=f32(c, NUM_BINS),
        density=jnp.full((c, NUM_SIMULT, NUM_BINS), 0.3, dtype),
        log_quantile=jnp.full((c, NUM_SIMULT, NUM_BINS), 8.0, dtype),
        quantile=f32(c, NUM_BINS),
        counter=jnp.broadcast_to(counter0, (c, NUM_SIMULT)),
        num_updates=jnp.ones((c,), jnp.int32),
        wiener_filter=jnp.ones((c, NUM_BINS), dtype),
        initial_spectral_estimate=f32(c, NUM_BINS),
        spectrum_prev_process=f32(c, NUM_BINS),
        prior_speech_prob=jnp.full((c,), 0.5, dtype),
        speech_probability=f32(c, NUM_BINS),
        lrt=jnp.full((c,), 0.5, dtype),
        spectral_flatness=jnp.full((c,), 0.5, dtype),
        spectral_diff=jnp.full((c,), 0.5, dtype),
        avg_log_lrt=jnp.full((c, NUM_BINS), 0.5, dtype),
        diff_normalization=f32(c),
        signal_energy_sum=f32(c),
        histogram_analysis_counter=jnp.full((c,), FEATURE_UPDATE_WINDOW, jnp.int32),
        prior_lrt=jnp.full((c,), 0.5, dtype),
        prior_flatness_threshold=jnp.full((c,), 0.5, dtype),
        prior_template_diff_threshold=jnp.full((c,), 0.5, dtype),
        prior_lrt_weighting=jnp.ones((c,), dtype),
        prior_flatness_weighting=f32(c),
        prior_difference_weighting=f32(c),
        histograms=jnp.zeros((c, 3, HISTOGRAM_SIZE), jnp.int32),
    )


def _magnitude_spectrum(spec):
    """ComputeMagnitudeSpectrum (noise_suppressor.cc:158-171): |X|+1, with
    DC/Nyquist using |Re| only."""
    mag = jnp.abs(spec) + 1.0
    ends = jnp.abs(spec.real) + 1.0
    mag = mag.at[..., 0].set(ends[..., 0])
    return mag.at[..., -1].set(ends[..., -1])


def _quantile_estimate(state: NsState, log_spectrum):
    """QuantileNoiseEstimator::Estimate (quantile_noise_estimator.cc:36-93).

    log_spectrum: (C, 129). Returns (state updates dict, noise_spectrum).
    """
    counter = state.counter  # (C, 3)
    cnt_f = counter.astype(log_spectrum.dtype)
    one_by_cp1 = 1.0 / (cnt_f + 1.0)  # (C, 3)

    delta = jnp.where(state.density > 1.0, 40.0 / state.density, 40.0)
    multiplier = delta * one_by_cp1[..., None]  # (C, 3, 129)
    ls = log_spectrum[:, None, :]  # (C, 1, 129)
    above = ls > state.log_quantile
    log_quantile = state.log_quantile + jnp.where(
        above, 0.25 * multiplier, -0.75 * multiplier
    )

    width = 0.01
    in_width = jnp.abs(ls - log_quantile) < width
    density = jnp.where(
        in_width,
        (cnt_f[..., None] * state.density + 1.0 / (2.0 * width))
        * one_by_cp1[..., None],
        state.density,
    )

    # Counter wrap: a slot whose counter reached 200 publishes its quantile
    # (largest such s wins) and resets; every slot then increments.
    expired = counter >= LONG_STARTUP_BLOCKS  # (C, 3)
    new_counter = jnp.where(expired, 0, counter) + 1

    mature = state.num_updates >= LONG_STARTUP_BLOCKS  # (C,)
    # Highest expired slot index, -1 if none (matching last-writer-wins).
    slot_ids = jnp.arange(NUM_SIMULT, dtype=jnp.int32)
    sel = jnp.max(jnp.where(expired, slot_ids, -1), axis=-1)  # (C,)
    has_sel = (sel >= 0) & mature
    # Startup: always publish from the last slot.
    startup = state.num_updates < LONG_STARTUP_BLOCKS
    sel = jnp.where(startup, NUM_SIMULT - 1, sel)
    publish = has_sel | startup
    num_updates = jnp.where(startup, state.num_updates + 1, state.num_updates)

    # One-hot read over the 3 simultaneous slots: a per-channel dynamic
    # gather serializes under vmap.
    slot_oh = slot_ids[None, :, None] == jnp.maximum(sel, 0)[:, None, None]
    chosen_lq = jnp.sum(jnp.where(slot_oh, log_quantile, 0.0), axis=1)
    quantile = jnp.where(publish[:, None], exp_approx(chosen_lq), state.quantile)

    updates = dict(
        density=density,
        log_quantile=log_quantile,
        quantile=quantile,
        counter=new_counter,
        num_updates=num_updates,
    )
    return updates, quantile


def _noise_pre_update(
    params: SuppressionParams, state: NsState, n, signal_spectrum, spectral_sum
):
    """NoiseEstimator::PreUpdate (noise_estimator.cc:70-156) minus the
    quantile call (done by the caller). Returns dict of state updates.

    n: scalar int32 num_analyzed_frames (already incremented).
    """
    dt = signal_spectrum.dtype
    q_updates, noise = _quantile_estimate(state, log_approx(signal_spectrum))

    in_startup = n < SHORT_STARTUP_BLOCKS
    nf = n.astype(dt)

    start_band = 5
    log_i = LOG_TABLE
    sum_log_i = jnp.sum(log_i[start_band:])
    sum_log_i_sq = jnp.sum(log_i[start_band:] ** 2)
    log_sig = log_approx(signal_spectrum[:, start_band:])  # (C, 124)
    sum_log_magn = jnp.sum(log_sig, axis=-1)
    sum_log_i_log_magn = jnp.sum(log_i[start_band:] * log_sig, axis=-1)

    white = state.white_noise_level + jnp.where(
        in_startup,
        spectral_sum * (1.0 / NUM_BINS) * params.over_subtraction_factor,
        0.0,
    )

    denom = sum_log_i_sq * (NUM_BINS - start_band) - sum_log_i * sum_log_i
    num1 = sum_log_i_sq * sum_log_magn - sum_log_i * sum_log_i_log_magn
    adj1 = jnp.maximum(num1 / denom, 0.0)
    pink_num = state.pink_noise_numerator + jnp.where(in_startup, adj1, 0.0)
    num2 = sum_log_i * sum_log_magn - (NUM_BINS - start_band) * sum_log_i_log_magn
    adj2 = jnp.clip(num2 / denom, 0.0, 1.0)
    pink_exp = state.pink_noise_exp + jnp.where(in_startup, adj2, 0.0)

    one_by_np1 = 1.0 / (nf + 1.0)
    use_pink = pink_exp > 0.0
    parametric_num = exp_approx(pink_num * one_by_np1) * (nf + 1.0)
    parametric_exp = pink_exp * one_by_np1

    bins = jnp.arange(NUM_BINS, dtype=dt)
    use_band = jnp.maximum(bins, float(start_band))  # (129,)
    # PowApproximation(use_band, parametric_exp) per channel.
    from webrtc_audio_processing_tpu.ops.fast_math import fast_log2

    parametric_denom = jnp.exp2(parametric_exp[:, None] * fast_log2(use_band)[None, :])
    parametric = jnp.where(
        use_pink[:, None],
        parametric_num[:, None] / parametric_denom,
        white[:, None] * jnp.ones((1, NUM_BINS), dt),
    )
    parametric = jnp.where(in_startup, parametric, state.parametric_noise_spectrum)

    # Weight quantile noise with the modeled noise during startup.
    blended = (
        noise * nf + parametric * (SHORT_STARTUP_BLOCKS - nf) * one_by_np1
    ) * (1.0 / SHORT_STARTUP_BLOCKS)
    noise = jnp.where(in_startup, blended, noise)

    return dict(
        noise_spectrum=noise,
        parametric_noise_spectrum=parametric,
        white_noise_level=jnp.where(in_startup, white, state.white_noise_level),
        pink_noise_numerator=jnp.where(
            in_startup, pink_num, state.pink_noise_numerator
        ),
        pink_noise_exp=jnp.where(in_startup, pink_exp, state.pink_noise_exp),
        **q_updates,
    )


def _noise_post_update(prev_noise, noise, conservative, speech_prob, signal_spectrum):
    """NoiseEstimator::PostUpdate (noise_estimator.cc:159-206).

    The C++ carries `gamma` across the bin loop; gamma entering bin i is 0.9
    for i=0 and otherwise determined by bin i-1's speech probability, so the
    chain vectorizes as a shifted select.
    """
    kNoiseUpdate = 0.9
    prob = speech_prob
    gamma = jnp.where(prob > 0.2, 0.99, kNoiseUpdate)  # gamma chosen at bin i
    gamma_prev = jnp.concatenate(
        [jnp.full_like(gamma[..., :1], kNoiseUpdate), gamma[..., :-1]], axis=-1
    )

    blend = (1.0 - prob) * signal_spectrum + prob * prev_noise
    tmp = gamma_prev * prev_noise + (1.0 - gamma_prev) * blend
    cur = gamma * prev_noise + (1.0 - gamma) * blend
    new_noise = jnp.where(gamma == gamma_prev, tmp, jnp.minimum(cur, tmp))

    new_conservative = jnp.where(
        prob < 0.2,
        conservative + 0.05 * (signal_spectrum - conservative),
        conservative,
    )
    return new_noise, new_conservative


def _find_first_of_two_largest_peaks(hist, bin_size):
    """FindFirstOfTwoLargestPeaks (prior_signal_model_estimator.cc:33-76).

    The sequential scan reduces to: peak = first argmax; secondary = first
    argmax with the peak's bin removed; merge if close and comparable.
    hist: (C, 1000) int32. Returns (position, weight) each (C,) float/int.
    """
    dt = jnp.float32
    idx = jnp.argmax(hist, axis=-1)  # first occurrence
    val = jnp.max(hist, axis=-1)  # == hist[idx], without a dynamic gather
    masked = jnp.where(
        jnp.arange(hist.shape[-1]) == idx[:, None], -1, hist
    )
    idx2 = jnp.argmax(masked, axis=-1)
    val2 = jnp.max(masked, axis=-1)

    pos = jnp.where(val > 0, (idx.astype(dt) + 0.5) * bin_size, 0.0)
    weight = jnp.where(val > 0, val, 0)
    pos2 = jnp.where(val2 > 0, (idx2.astype(dt) + 0.5) * bin_size, 0.0)
    weight2 = jnp.where(val2 > 0, val2, 0)

    merge = (jnp.abs(pos2 - pos) < 2 * bin_size) & (
        weight2.astype(dt) > 0.5 * weight.astype(dt)
    )
    weight = jnp.where(merge, weight + weight2, weight)
    pos = jnp.where(merge, 0.5 * (pos + pos2), pos)
    return pos, weight


def _prior_model_update(state: NsState):
    """PriorSignalModelEstimator::Update (prior_signal_model_estimator.cc:137-188).

    Computed from the current histograms; caller gates by the 500-frame cycle.
    """
    dt = state.lrt.dtype
    lrt_hist = state.histograms[:, 0]  # (C, 1000)
    flat_hist = state.histograms[:, 1]
    diff_hist = state.histograms[:, 2]

    bin_mid = (jnp.arange(HISTOGRAM_SIZE, dtype=dt) + 0.5) * BIN_SIZE_LRT
    count10 = jnp.sum(lrt_hist[:, :10], axis=-1).astype(dt)
    avg10 = jnp.sum(lrt_hist[:, :10].astype(dt) * bin_mid[:10], axis=-1)
    average = jnp.where(count10 > 0, avg10 / jnp.maximum(count10, 1.0), 0.0)

    hist_f = lrt_hist.astype(dt)
    average_squared = jnp.sum(hist_f * bin_mid**2, axis=-1) / FEATURE_UPDATE_WINDOW
    average_compl = jnp.sum(hist_f * bin_mid, axis=-1) / FEATURE_UPDATE_WINDOW

    low_lrt_fluctuations = average_squared - average * average_compl < 0.05
    prior_lrt = jnp.where(
        low_lrt_fluctuations, 1.0, jnp.clip(1.2 * average, 0.2, 1.0)
    )

    flat_pos, flat_weight = _find_first_of_two_largest_peaks(
        flat_hist, BIN_SIZE_SPEC_FLAT
    )
    diff_pos, diff_weight = _find_first_of_two_largest_peaks(
        diff_hist, BIN_SIZE_SPEC_DIFF
    )

    use_flat = jnp.logical_not(
        (flat_weight.astype(dt) < 0.3 * 500) | (flat_pos < 0.6)
    )
    use_diff = jnp.logical_not(
        (diff_weight.astype(dt) < 0.3 * 500) | low_lrt_fluctuations
    )

    template_diff_threshold = jnp.clip(1.2 * diff_pos, 0.16, 1.0)
    one_by_sum = 1.0 / (1.0 + use_flat.astype(dt) + use_diff.astype(dt))
    flatness_threshold = jnp.where(
        use_flat,
        jnp.clip(0.9 * flat_pos, 0.1, 0.95),
        state.prior_flatness_threshold,
    )
    return dict(
        prior_lrt=prior_lrt,
        prior_flatness_threshold=flatness_threshold,
        prior_template_diff_threshold=template_diff_threshold,
        prior_lrt_weighting=one_by_sum,
        prior_flatness_weighting=jnp.where(use_flat, one_by_sum, 0.0),
        prior_difference_weighting=jnp.where(use_diff, one_by_sum, 0.0),
    )


def _speech_prob_update(
    state: NsState, n, prior_snr, post_snr, signal_spectrum, spectral_sum, energy
):
    """SpeechProbabilityEstimator::Update + SignalModelEstimator::Update
    (speech_probability_estimator.cc:31-109, signal_model_estimator.cc:126-178).

    Uses the pre-PostUpdate conservative noise spectrum, mirroring the call
    order in NoiseSuppressor::Analyze (noise_suppressor.cc:331-343).
    """
    dt = signal_spectrum.dtype
    nf = n.astype(dt)
    updates = {}

    # AdjustNormalization (signal_model_estimator.cc:118-123).
    diff_norm = jnp.where(
        n < LONG_STARTUP_BLOCKS,
        (state.diff_normalization * nf + energy) / (nf + 1.0),
        state.diff_normalization,
    )

    # --- UpdateSpectralFlatness (signal_model_estimator.cc:73-103).
    kAveraging = 0.3
    has_zero = jnp.any(signal_spectrum[:, 1:] == 0.0, axis=-1)
    safe = jnp.where(signal_spectrum[:, 1:] == 0.0, 1.0, signal_spectrum[:, 1:])
    num = jnp.sum(log_approx(safe), axis=-1) * (1.0 / NUM_BINS)
    den = (spectral_sum - signal_spectrum[:, 0]) * (1.0 / NUM_BINS)
    flat_tmp = exp_approx(num) / den
    flatness = jnp.where(
        has_zero,
        state.spectral_flatness - kAveraging * state.spectral_flatness,
        state.spectral_flatness + kAveraging * (flat_tmp - state.spectral_flatness),
    )
    updates["spectral_flatness"] = flatness

    # --- ComputeSpectralDiff (signal_model_estimator.cc:30-70).
    cons = state.conservative_noise_spectrum
    noise_avg = jnp.mean(cons, axis=-1)
    signal_avg = spectral_sum * (1.0 / NUM_BINS)
    sig_d = signal_spectrum - signal_avg[:, None]
    noi_d = cons - noise_avg[:, None]
    covariance = jnp.mean(sig_d * noi_d, axis=-1)
    noise_var = jnp.mean(noi_d * noi_d, axis=-1)
    signal_var = jnp.mean(sig_d * sig_d, axis=-1)
    sdiff = signal_var - covariance**2 / (noise_var + 1e-4)
    sdiff = sdiff / (diff_norm + 1e-4)
    spectral_diff = state.spectral_diff + 0.3 * (sdiff - state.spectral_diff)
    updates["spectral_diff"] = spectral_diff

    energy_sum = state.signal_energy_sum + energy

    # --- Histogram / prior-model 500-frame cycle
    # (signal_model_estimator.cc:155-172).
    counter = state.histogram_analysis_counter - 1
    do_hist = counter > 0  # (C,) bool
    do_prior = jnp.logical_not(do_hist)

    hist = state.histograms
    feats = jnp.stack([state.lrt, flatness, spectral_diff], axis=1)  # (C, 3)
    bin_sizes = jnp.asarray(
        [BIN_SIZE_LRT, BIN_SIZE_SPEC_FLAT, BIN_SIZE_SPEC_DIFF], dt
    )
    bin_idx = (feats * (1.0 / bin_sizes)).astype(jnp.int32)
    valid = (feats >= 0.0) & (feats < HISTOGRAM_SIZE * bin_sizes)
    incr = (valid & do_hist[:, None])[..., None] & (
        jnp.arange(HISTOGRAM_SIZE) == jnp.clip(bin_idx, 0, HISTOGRAM_SIZE - 1)[..., None]
    )
    hist_updated = hist + incr.astype(jnp.int32)

    prior = _prior_model_update(state)  # from histograms BEFORE this frame
    for k, v in prior.items():
        updates[k] = jnp.where(do_prior, v, getattr(state, k))
    updates["histograms"] = jnp.where(
        do_prior[:, None, None], jnp.zeros_like(hist), hist_updated
    )
    updates["histogram_analysis_counter"] = jnp.where(
        do_prior, FEATURE_UPDATE_WINDOW, counter
    )
    diff_norm = jnp.where(
        do_prior, 0.5 * (energy_sum / FEATURE_UPDATE_WINDOW + diff_norm), diff_norm
    )
    updates["diff_normalization"] = diff_norm
    updates["signal_energy_sum"] = jnp.where(do_prior, 0.0, energy_sum)

    # --- UpdateSpectralLrt (signal_model_estimator.cc:106-124).
    tmp1 = 1.0 + 2.0 * prior_snr
    tmp2 = 2.0 * prior_snr / (tmp1 + 1e-4)
    bessel = (post_snr + 1.0) * tmp2
    avg_log_lrt = state.avg_log_lrt + 0.5 * (
        bessel - log_approx(tmp1) - state.avg_log_lrt
    )
    lrt = jnp.mean(avg_log_lrt, axis=-1)
    updates["avg_log_lrt"] = avg_log_lrt
    updates["lrt"] = lrt

    # --- Indicator fusion (speech_probability_estimator.cc:50-96).
    kW0, kW1 = 4.0, 8.0
    prior_lrt = updates.get("prior_lrt", state.prior_lrt)
    prior_flat_thr = updates.get(
        "prior_flatness_threshold", state.prior_flatness_threshold
    )
    prior_diff_thr = updates.get(
        "prior_template_diff_threshold", state.prior_template_diff_threshold
    )

    w = jnp.where(lrt < prior_lrt, kW1, kW0)
    ind0 = 0.5 * (jnp.tanh(w * (lrt - prior_lrt)) + 1.0)
    w = jnp.where(flatness > prior_flat_thr, kW1, kW0)
    ind1 = 0.5 * (jnp.tanh(w * (prior_flat_thr - flatness)) + 1.0)
    w = jnp.where(spectral_diff < prior_diff_thr, kW1, kW0)
    ind2 = 0.5 * (jnp.tanh(w * (spectral_diff - prior_diff_thr)) + 1.0)

    ind_prior = (
        updates.get("prior_lrt_weighting", state.prior_lrt_weighting) * ind0
        + updates.get("prior_flatness_weighting", state.prior_flatness_weighting)
        * ind1
        + updates.get(
            "prior_difference_weighting", state.prior_difference_weighting
        )
        * ind2
    )
    prior_prob = state.prior_speech_prob + 0.1 * (
        ind_prior - state.prior_speech_prob
    )
    prior_prob = jnp.clip(prior_prob, 0.01, 1.0)
    updates["prior_speech_prob"] = prior_prob

    gain_prior = (1.0 - prior_prob) / (prior_prob + 1e-4)
    inv_lrt = exp_approx(-avg_log_lrt)
    updates["speech_probability"] = 1.0 / (
        1.0 + gain_prior[:, None] * inv_lrt
    )
    return updates


def _compute_snr(filt, prev_signal, signal, prev_noise, noise):
    """ComputeSnr (noise_suppressor.cc:174-199)."""
    prev_estimate = prev_signal / (prev_noise + 1e-4) * filt
    post_snr = jnp.maximum(signal / (noise + 1e-4) - 1.0, 0.0)
    post_snr = jnp.where(signal > noise, post_snr, 0.0)
    prior_snr = 0.98 * prev_estimate + 0.02 * post_snr
    return prior_snr, post_snr


def analyze(params: SuppressionParams, state: NsState, band0) -> NsState:
    """NoiseSuppressor::Analyze (noise_suppressor.cc:286-364).

    band0: (160, C) band-0 frame in floatS16 domain.
    """
    x = band0.T  # (C, 160)

    # Zero-frame check over all channels (noise_suppressor.cc:294-318).
    energy_all = jnp.sum(state.analyze_analysis_memory**2) + jnp.sum(x**2)
    zero_frame = energy_all <= 0.0

    def do_analyze(state):
        n = state.num_analyzed_frames + 1
        n = jnp.where(n < 0, 0, n)

        extended = jnp.concatenate([state.analyze_analysis_memory, x], axis=1)
        new_memory = extended[:, -OVERLAP:]
        windowed = extended * WINDOW
        spec = mxu_fft.rfft(windowed, FFT_SIZE)
        signal_spectrum = _magnitude_spectrum(spec).astype(x.dtype)
        signal_energy = (
            jnp.sum(spec.real**2 + spec.imag**2, axis=-1).astype(x.dtype)
            / NUM_BINS
        )
        spectral_sum = jnp.sum(signal_spectrum, axis=-1)

        # PrepareAnalysis (noise_estimator.cc:63-67).
        prev_noise = state.noise_spectrum
        state = state.replace(prev_noise_spectrum=prev_noise)

        pre = _noise_pre_update(params, state, n, signal_spectrum, spectral_sum)
        state = state.replace(**pre)

        prior_snr, post_snr = _compute_snr(
            state.wiener_filter,
            state.prev_analysis_signal_spectrum,
            signal_spectrum,
            prev_noise,
            state.noise_spectrum,
        )

        sp = _speech_prob_update(
            state, n, prior_snr, post_snr, signal_spectrum, spectral_sum,
            signal_energy,
        )
        state = state.replace(**sp)

        new_noise, new_cons = _noise_post_update(
            state.prev_noise_spectrum,
            state.noise_spectrum,
            state.conservative_noise_spectrum,
            state.speech_probability,
            signal_spectrum,
        )
        return state.replace(
            num_analyzed_frames=n,
            analyze_analysis_memory=new_memory,
            prev_analysis_signal_spectrum=signal_spectrum,
            noise_spectrum=new_noise,
            conservative_noise_spectrum=new_cons,
        )

    return jax.lax.cond(zero_frame, lambda s: s, do_analyze, state)


def _wiener_update(params: SuppressionParams, state: NsState, n, signal_spectrum):
    """WienerFilter::Update (wiener_filter.cc:33-86)."""
    dt = signal_spectrum.dtype
    prev_tsa = (
        state.spectrum_prev_process
        / (state.prev_noise_spectrum + 1e-4)
        * state.wiener_filter
    )
    current_tsa = jnp.where(
        signal_spectrum > state.noise_spectrum,
        signal_spectrum / (state.noise_spectrum + 1e-4) - 1.0,
        0.0,
    )
    snr_prior = 0.98 * prev_tsa + 0.02 * current_tsa
    filt = snr_prior / (params.over_subtraction_factor + snr_prior)
    filt = jnp.clip(filt, params.minimum_attenuating_gain, 1.0)

    in_startup = n < SHORT_STARTUP_BLOCKS
    nf = n.astype(dt)
    initial_est = state.initial_spectral_estimate + jnp.where(
        in_startup, signal_spectrum, 0.0
    )
    filt_initial = (
        initial_est - params.over_subtraction_factor * state.parametric_noise_spectrum
    ) / (initial_est + 1e-4)
    filt_initial = jnp.clip(filt_initial, params.minimum_attenuating_gain, 1.0)
    blended = (
        filt * nf + filt_initial * (SHORT_STARTUP_BLOCKS - nf)
    ) * (1.0 / SHORT_STARTUP_BLOCKS)
    filt = jnp.where(in_startup, blended, filt)

    return dict(
        wiener_filter=filt,
        initial_spectral_estimate=initial_est,
        spectrum_prev_process=signal_spectrum,
    )


def _overall_scaling(params: SuppressionParams, n, prior_prob, e_before, e_after):
    """WienerFilter::ComputeOverallScalingFactor (wiener_filter.cc:88-123)."""
    gain = jnp.sqrt(e_after / (e_before + 1.0))
    kBLim = 0.5
    sf1 = jnp.where(gain > kBLim, 1.0 + 1.3 * (gain - kBLim), 1.0)
    sf1 = jnp.where((gain > kBLim) & (gain * sf1 > 1.0), 1.0 / gain, sf1)
    gain_floored = jnp.maximum(gain, params.minimum_attenuating_gain)
    sf2 = jnp.where(gain < kBLim, 1.0 - 0.3 * (kBLim - gain_floored), 1.0)
    scale = prior_prob * sf1 + (1.0 - prior_prob) * sf2
    active = params.use_attenuation_adjustment & True
    return jnp.where(
        jnp.logical_and(active, n > LONG_STARTUP_BLOCKS), scale, 1.0
    )


def _compute_upper_bands_gain(
    params: SuppressionParams, filt, speech_prob, prev_spectrum, signal_spectrum
):
    """ComputeUpperBandsGain (noise_suppressor.cc:202-252). All args (C, ...)."""
    avg_prob = jnp.mean(speech_prob[:, NUM_BINS - 33 : NUM_BINS - 1], axis=-1)
    avg_gain = jnp.mean(filt[:, NUM_BINS - 33 : NUM_BINS - 1], axis=-1)
    sum_analysis = jnp.sum(prev_spectrum, axis=-1)
    sum_processing = jnp.sum(signal_spectrum, axis=-1)
    avg_prob = avg_prob * sum_processing / sum_analysis
    gain = 0.5 * (1.0 + jnp.tanh(2.0 * avg_prob - 1.0))
    gain = jnp.where(
        avg_prob >= 0.5,
        0.25 * gain + 0.75 * avg_gain,
        0.5 * gain + 0.5 * avg_gain,
    )
    return jnp.clip(gain, params.minimum_attenuating_gain, 1.0)


def process(
    params: SuppressionParams,
    state: NsState,
    bands,
    capture_output_used: bool = True,
):
    """NoiseSuppressor::Process (noise_suppressor.cc:366-528).

    bands: (num_bands, 160, C) floatS16. Returns (state, new_bands).
    """
    num_bands = bands.shape[0]
    x = bands[0].T  # (C, 160)
    n = state.num_analyzed_frames

    extended = jnp.concatenate([state.process_analysis_memory, x], axis=1)
    new_analysis_memory = extended[:, -OVERLAP:]
    windowed = extended * WINDOW
    e_before = jnp.sum(windowed**2, axis=-1)
    spec = mxu_fft.rfft(windowed, FFT_SIZE)
    signal_spectrum = _magnitude_spectrum(spec).astype(x.dtype)

    wiener = _wiener_update(params, state, n, signal_spectrum)
    state = state.replace(process_analysis_memory=new_analysis_memory, **wiener)

    if num_bands > 1:
        upper_gain = jnp.min(
            _compute_upper_bands_gain(
                params,
                state.wiener_filter,
                state.speech_probability,
                state.prev_analysis_signal_spectrum,
                signal_spectrum,
            )
        )

    if not capture_output_used:
        return state, bands

    # Aggregate the per-channel Wiener filters (noise_suppressor.cc:270-284).
    filt = jnp.min(state.wiener_filter, axis=0)  # (129,)

    filtered = spec * filt
    ext = mxu_fft.irfft(filtered, FFT_SIZE).astype(x.dtype)
    e_after = jnp.sum(ext**2, axis=-1)
    ext = ext * WINDOW

    gain_adj = jnp.min(
        _overall_scaling(params, n, state.prior_speech_prob, e_before, e_after)
    )
    ext = ext * gain_adj

    out0 = jnp.concatenate(
        [state.process_synthesis_memory + ext[:, :OVERLAP], ext[:, OVERLAP:FRAME_SIZE]],
        axis=1,
    )
    state = state.replace(process_synthesis_memory=ext[:, FRAME_SIZE:])

    out_bands = [out0.T]
    if num_bands > 1:
        # Delay upper bands by 96 samples and apply the time-domain gain
        # (noise_suppressor.cc:480-505, DelaySignal :119-131).
        new_delay = []
        for b in range(1, num_bands):
            xb = bands[b].T  # (C, 160)
            delayed = jnp.concatenate(
                [state.process_delay_memory[:, b - 1], xb[:, : FRAME_SIZE - OVERLAP]],
                axis=1,
            )
            new_delay.append(xb[:, FRAME_SIZE - OVERLAP :])
            out_bands.append((upper_gain * delayed).T)
        state = state.replace(
            process_delay_memory=jnp.stack(new_delay, axis=1)
        )

    out = jnp.stack(out_bands, axis=0)
    out = jnp.clip(out, -32768.0, 32767.0)
    return state, out
