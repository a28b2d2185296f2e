"""AEC3 echo remover: subtraction -> state -> CNG -> residual -> suppression.

Reference: aec3/echo_remover.cc (orchestration), comfort_noise_generator.cc,
residual_echo_estimator.cc, suppression_gain.cc (+ dominant_nearend_
detector.cc, moving_average.cc), suppression_filter.cc.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from webrtc_audio_processing_tpu.models.aec3 import aec_state as aecs
from webrtc_audio_processing_tpu.models.aec3 import fft as afft
from webrtc_audio_processing_tpu.models.aec3 import render_buffer as rb
from webrtc_audio_processing_tpu.models.aec3 import subtractor as subt
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config

NUM_BINS = 65
BLOCK_SIZE = 64

# sqrt(2)*sin(2*pi*i/32) table (comfort_noise_generator.cc:40-50).
SQRT2_SIN = jnp.asarray(
    (np.sqrt(2.0) * np.sin(2.0 * np.pi * np.arange(32) / 32.0)).astype(
        np.float32
    )
)


# ------------------------------------------------------------- comfort noise


@struct.dataclass
class ComfortNoiseState:
    seed: jnp.ndarray  # () uint32
    N2_initial: jnp.ndarray  # (C, 65)
    Y2_smoothed: jnp.ndarray  # (C, 65)
    N2: jnp.ndarray  # (C, 65)
    N2_counter: jnp.ndarray  # () int32


def init_comfort_noise(num_capture) -> ComfortNoiseState:
    return ComfortNoiseState(
        seed=jnp.asarray(42, jnp.uint32),
        N2_initial=jnp.zeros((num_capture, NUM_BINS)),
        Y2_smoothed=jnp.zeros((num_capture, NUM_BINS)),
        N2=jnp.full((num_capture, NUM_BINS), 1.0e6),
        N2_counter=jnp.asarray(0, jnp.int32),
    )


def comfort_noise_compute(config: EchoCanceller3Config,
                          state: ComfortNoiseState, saturated, Y2):
    """ComfortNoiseGenerator::Compute (comfort_noise_generator.cc:124-184).

    Returns (state, N_low (C,65)c, N_high (C,65)c, N2 used (C,65)).
    """
    noise_floor = 64.0 * 10.0 ** (
        (90.30899869919436 + config.comfort_noise.noise_floor_dbfs) * 0.1
    )
    upd = ~saturated
    Y2s = jnp.where(upd, state.Y2_smoothed + 0.1 * (Y2 - state.Y2_smoothed),
                    state.Y2_smoothed)
    N2 = jnp.where(
        upd & (state.N2_counter > 50),
        jnp.where(
            Y2s < state.N2,
            (0.9 * Y2s + 0.1 * state.N2) * 1.0002,
            state.N2 * 1.0002,
        ),
        state.N2,
    )
    counter = jnp.where(upd, state.N2_counter + 1, state.N2_counter)
    in_initial = counter < 1000
    N2_init = jnp.where(
        upd & in_initial,
        jnp.where(N2 > state.N2_initial,
                  state.N2_initial + 0.001 * (N2 - state.N2_initial), N2),
        state.N2_initial,
    )
    N2 = jnp.where(upd, jnp.maximum(N2, noise_floor), N2)
    N2_init = jnp.where(upd & in_initial, jnp.maximum(N2_init, noise_floor),
                        N2_init)

    N2_used = jnp.where(in_initial, N2_init, N2)

    # GenerateComfortNoise (:51-101): LCG random phase per bin 1..63 per ch.
    # seed_{k+1} = (seed_k * 69069 + 1) mod 2^31 has the closed form
    # seed_k = (A_k seed_0 + B_k) mod 2^31 with A_k = 69069^k, B_k the
    # k-step image of 0 — precomputed constants turn the sequential scan
    # into one vectorized affine map (mod-2^31 composes through the
    # uint32 wraparound because 2^31 | 2^32).
    num_capture = Y2.shape[0]
    n_rand = num_capture * 63
    A = np.empty(n_rand, np.uint32)
    Bc = np.empty(n_rand, np.uint32)
    a_k, b_k = 1, 0
    for k in range(n_rand):
        a_k = (a_k * 69069) % (1 << 31)
        b_k = (b_k * 69069 + 1) % (1 << 31)
        A[k], Bc[k] = a_k, b_k
    seq = (
        jnp.asarray(A) * state.seed + jnp.asarray(Bc)
    ) & jnp.uint32(0x7FFFFFFF)
    final_seed = seq[-1]
    idx = (seq >> 26).astype(jnp.int32).reshape(num_capture, 63)
    # Table lookups via one-hot contraction (a 32-entry gather with traced
    # indices would serialize per stream under vmap).
    oh = (idx[..., None] == jnp.arange(32)).astype(jnp.float32)
    oh8 = ((((idx + 8) & 31))[..., None] == jnp.arange(32)).astype(
        jnp.float32
    )
    x = oh @ SQRT2_SIN
    y = oh8 @ SQRT2_SIN

    N = jnp.sqrt(N2_used)
    hi_level = jnp.sum(N[:, 32:], axis=-1) * (1.0 / 34.0)

    zeros = jnp.zeros((num_capture, 1))
    N_low = jnp.concatenate(
        [zeros, N[:, 1:64] * x, zeros], axis=1
    ) + 1j * jnp.concatenate([zeros, N[:, 1:64] * y, zeros], axis=1)
    N_high = jnp.concatenate(
        [zeros, hi_level[:, None] * x, zeros], axis=1
    ) + 1j * jnp.concatenate([zeros, hi_level[:, None] * y, zeros], axis=1)

    new_state = state.replace(
        seed=final_seed, N2_initial=N2_init, Y2_smoothed=Y2s, N2=N2,
        N2_counter=counter,
    )
    return new_state, N_low.astype(jnp.complex64), N_high.astype(
        jnp.complex64
    ), N2_used


# -------------------------------------------------------- residual echo


@struct.dataclass
class ResidualEchoState:
    echo_reverb: aecs.ReverbModelState
    X2_noise_floor: jnp.ndarray  # (65,)
    X2_noise_floor_counter: jnp.ndarray  # (65,) int32


def init_residual_echo(config) -> ResidualEchoState:
    return ResidualEchoState(
        echo_reverb=aecs.ReverbModelState(reverb=jnp.zeros((NUM_BINS,))),
        X2_noise_floor=jnp.full((NUM_BINS,),
                                config.echo_model.min_noise_floor_power),
        X2_noise_floor_counter=jnp.full(
            (NUM_BINS,), config.echo_model.noise_floor_hold, jnp.int32
        ),
    )


def residual_echo_estimate(
    config: EchoCanceller3Config,
    state: ResidualEchoState,
    geo: rb.BufferGeometry,
    buf: rb.RenderView,
    aec: aecs.AecStateState,
    S2_linear,  # (C, 65)
    Y2,  # (C, 65)
    dominant_nearend,
    transparent_active,
    filter_length_blocks,  # () int32
    spec_win=None,  # optional (W, C, 65) spectra window at the read pos
):
    """ResidualEchoEstimator::Estimate (residual_echo_estimator.cc:180-279).

    Returns (state, R2 (C,65), R2_unbounded (C,65)).
    """

    def spec_at(off):
        return (rb.window_row(spec_win, off) if spec_win is not None
                else rb.spectrum_at(geo, buf, off))

    # UpdateRenderNoisePower (:287-320).
    X2_now = jnp.sum(spec_at(0), axis=0)  # sum over channels
    if geo.num_channels == 1:
        X2_now = spec_at(0)[0]
    lower = X2_now < state.X2_noise_floor
    inc = state.X2_noise_floor_counter >= config.echo_model.noise_floor_hold
    floor = jnp.where(
        lower,
        X2_now,
        jnp.where(
            inc,
            jnp.maximum(state.X2_noise_floor * 1.1,
                        config.echo_model.min_noise_floor_power),
            state.X2_noise_floor,
        ),
    )
    floor_counter = jnp.where(
        lower, 0,
        jnp.where(inc, state.X2_noise_floor_counter,
                  state.X2_noise_floor_counter + 1),
    )

    usable = aec.usable_linear_estimate
    saturated_echo = aec.saturated_echo
    min_delay = aec.min_filter_delay

    # --- Linear branch.
    onset_comp = (
        config.ep_strength.erle_onset_compensation_in_dominant_nearend
        | ~dominant_nearend
    )
    erle_plain, erle_oc, erle_unb = aecs.erle_arrays(config, aec.erle)
    erle = jnp.where(onset_comp, erle_oc, erle_plain)
    R2_lin = S2_linear / jnp.maximum(erle, 1e-30)
    R2_lin_unb = S2_linear / jnp.maximum(erle_unb, 1e-30)

    # --- Nonlinear branch.
    gain_amp = jnp.where(
        transparent_active, 0.01, config.ep_strength.default_gain
    )
    echo_path_gain = gain_amp * gain_amp
    # EchoGeneratingPower (:119-150): max over window around the delay.
    pre = config.echo_model.render_pre_window_size
    post = config.echo_model.render_post_window_size
    offsets = jnp.arange(-(pre), post + 1)
    start = jnp.maximum(0, min_delay - pre)
    offs = jnp.clip(min_delay + offsets, start, min_delay + post)
    window = jnp.sum(spec_at(offs), axis=1)  # (W, 65)
    if geo.num_channels == 1:
        window = spec_at(offs)[:, 0]
    X2 = jnp.max(window, axis=0)
    # ApplyNoiseGate (:105-113).
    ng_power = config.echo_model.noise_gate_power
    X2 = jnp.where(
        ng_power > X2,
        jnp.maximum(0.0, X2 - config.echo_model.noise_gate_slope *
                    (ng_power - X2)),
        X2,
    )
    X2 = jnp.maximum(
        0.0, X2 - config.echo_model.stationary_gate_slope * floor
    )
    R2_nonlin = jnp.broadcast_to(X2 * echo_path_gain, S2_linear.shape)

    R2 = jnp.where(usable, R2_lin, R2_nonlin)
    R2_unbounded = jnp.where(usable, R2_lin_unb, R2_nonlin)
    # Saturated echo: copy Y2 (both branches).
    R2 = jnp.where(saturated_echo, Y2, R2)
    R2_unbounded = jnp.where(saturated_echo, Y2, R2_unbounded)

    # --- Reverb (UpdateReverb + AddReverb, :322-377). Decay dispatches to
    # the adaptive estimator when ep_strength.default_len < 0.
    decay = aecs.rde.decay_value(config, aec.reverb_decay_est,
                                 dominant_nearend)
    first_partition = jnp.where(
        usable, filter_length_blocks + 1, min_delay + 1
    )
    render_power = jnp.sum(spec_at(first_partition), axis=0)
    if geo.num_channels == 1:
        render_power = spec_at(first_partition)[0]

    # kLinear path uses the tail frequency response of channel 0; nonlinear
    # uses the late-reflections gain.
    lin_reverb = aecs.reverb_update(
        state.echo_reverb, render_power,
        aec.reverb_freq_response.tail_response[0], decay,
    )
    late_gain = jnp.where(transparent_active, 0.01,
                          config.ep_strength.default_gain) ** 2
    nonlin_reverb = aecs.reverb_update_no_shaping(
        state.echo_reverb, render_power, late_gain, decay
    )
    add_reverb_nonlin = (
        config.echo_model.model_reverb_in_nonlinear_mode
        & ~transparent_active
    )
    reverb = jax.tree_util.tree_map(
        lambda a, b: jnp.where(usable, a, b),
        lin_reverb,
        jax.tree_util.tree_map(
            lambda a, b: jnp.where(add_reverb_nonlin, a, b),
            nonlin_reverb, state.echo_reverb,
        ),
    )
    add = usable | add_reverb_nonlin
    R2 = R2 + jnp.where(add, reverb.reverb, 0.0)
    R2_unbounded = R2_unbounded + jnp.where(add, reverb.reverb, 0.0)

    # Echo-audibility residual scaling (residual_echo_estimator.cc:300-310),
    # active only with use_stationarity_properties.
    if config.echo_audibility.use_stationarity_properties:
        scaling = aecs.residual_echo_scaling(config, aec)
        R2 = R2 * scaling[None, :]
        R2_unbounded = R2_unbounded * scaling[None, :]

    return (
        state.replace(
            echo_reverb=reverb, X2_noise_floor=floor,
            X2_noise_floor_counter=floor_counter,
        ),
        R2,
        R2_unbounded,
    )


# ------------------------------------------------------- suppression gain


def _gain_parameters(config, tuning):
    """GainParameters (suppression_gain.cc:427-450) as static arrays."""
    last_lf = config.suppressor.last_lf_band
    first_hf = config.suppressor.first_hf_band
    k = np.arange(NUM_BINS, dtype=np.float32)
    a = np.clip((k - last_lf) / float(first_hf - last_lf), 0.0, 1.0)
    a[k <= last_lf] = 0.0
    a[k >= first_hf] = 1.0
    lf, hf = tuning.mask_lf, tuning.mask_hf
    return dict(
        enr_transparent=jnp.asarray(
            (1 - a) * lf.enr_transparent + a * hf.enr_transparent),
        enr_suppress=jnp.asarray(
            (1 - a) * lf.enr_suppress + a * hf.enr_suppress),
        emr_transparent=jnp.asarray(
            (1 - a) * lf.emr_transparent + a * hf.emr_transparent),
        max_inc_factor=tuning.max_inc_factor,
        max_dec_factor_lf=tuning.max_dec_factor_lf,
    )


@struct.dataclass
class SuppressionGainState:
    last_gain: jnp.ndarray  # (65,)
    last_nearend: jnp.ndarray  # (C, 65)
    last_echo: jnp.ndarray  # (C, 65)
    initial_state: jnp.ndarray  # () bool
    initial_state_change_counter: jnp.ndarray  # () int32
    # MovingAverage memory per channel (mem_len-1 blocks).
    nearend_memory: jnp.ndarray  # (C, mem, 65)
    nearend_mem_index: jnp.ndarray  # () int32
    # LowNoiseRenderDetector.
    average_power: jnp.ndarray  # ()
    # DominantNearendDetector.
    dn_trigger_counters: jnp.ndarray  # (C,) int32
    dn_hold_counters: jnp.ndarray  # (C,) int32
    dn_nearend_state: jnp.ndarray  # () bool


def init_suppression_gain(config, num_capture) -> SuppressionGainState:
    mem = max(config.suppressor.nearend_average_blocks - 1, 0)
    return SuppressionGainState(
        last_gain=jnp.ones((NUM_BINS,)),
        last_nearend=jnp.zeros((num_capture, NUM_BINS)),
        last_echo=jnp.zeros((num_capture, NUM_BINS)),
        initial_state=jnp.asarray(True),
        initial_state_change_counter=jnp.asarray(0, jnp.int32),
        nearend_memory=jnp.zeros((num_capture, mem, NUM_BINS)),
        nearend_mem_index=jnp.asarray(0, jnp.int32),
        average_power=jnp.asarray(32768.0 * 32768.0),
        dn_trigger_counters=jnp.zeros((num_capture,), jnp.int32),
        dn_hold_counters=jnp.zeros((num_capture,), jnp.int32),
        dn_nearend_state=jnp.asarray(False),
    )


def _weight_echo_for_audibility(config, echo):
    """WeightEchoForAudibility (suppression_gain.cc:75-105). echo: (..., 65)."""
    ea = config.echo_audibility
    k = jnp.arange(NUM_BINS)
    thr = jnp.where(
        k < 3, ea.floor_power * ea.audibility_threshold_lf,
        jnp.where(k < 7, ea.floor_power * ea.audibility_threshold_mf,
                  ea.floor_power * ea.audibility_threshold_hf),
    )
    norm = 1.0 / (thr - ea.floor_power)
    tmp = (thr - echo) * norm
    return jnp.where(
        echo < thr, echo * jnp.maximum(0.0, 1.0 - tmp * tmp), echo
    )


def suppression_gain_compute(
    config: EchoCanceller3Config,
    state: SuppressionGainState,
    nearend_spectrum,  # (C, 65)
    echo_spectrum,  # (C, 65)
    R2,  # (C, 65)
    R2_unbounded,  # (C, 65)
    comfort_noise_spectrum,  # (C, 65)
    narrow_peak_band,  # () int32, -1 none
    saturated_echo,
    render_block,  # (bands, 64, C_ren)
    clock_drift: bool,
):
    """SuppressionGain::GetGain (suppression_gain.cc:452-500).

    Returns (state, low_band_gain (65,), high_bands_gain ()).
    """
    sup = config.suppressor
    nearend_params = _gain_parameters(config, sup.nearend_tuning)
    normal_params = _gain_parameters(config, sup.normal_tuning)

    # Dominant nearend detection (dominant_nearend_detector.cc:30-76).
    echo_for_dn = jnp.where(
        sup.dominant_nearend_detection.use_unbounded_echo_spectrum,
        R2_unbounded, R2,
    )
    ne_sum = jnp.sum(nearend_spectrum[:, 1:16], axis=-1)
    echo_sum = jnp.sum(echo_for_dn[:, 1:16], axis=-1)
    noise_sum = jnp.sum(comfort_noise_spectrum[:, 1:16], axis=-1)
    dnd = sup.dominant_nearend_detection
    strong_ne = (
        (~state.initial_state | dnd.use_during_initial_phase)
        & (echo_sum < dnd.enr_threshold * ne_sum)
        & (ne_sum > dnd.snr_threshold * noise_sum)
    )
    trig = jnp.where(
        strong_ne,
        jnp.minimum(state.dn_trigger_counters + 1, dnd.trigger_threshold),
        jnp.maximum(state.dn_trigger_counters - 1, 0),
    )
    entered = strong_ne & (trig >= dnd.trigger_threshold)
    hold = jnp.where(entered, dnd.hold_duration, state.dn_hold_counters)
    exit_early = (echo_sum > dnd.enr_exit_threshold * ne_sum) & (
        echo_sum > dnd.snr_threshold * noise_sum
    )
    hold = jnp.where(exit_early, 0, hold)
    hold = jnp.maximum(hold - 1, 0)
    nearend_state = jnp.any(hold > 0)

    # Low-noise render detection (suppression_gain.cc:415-425).
    x0 = render_block[0]  # (64, C_ren)
    x2 = x0 * x0
    x2_sum = jnp.sum(x2) / render_block.shape[2]
    x2_max = jnp.max(x2)
    low_noise = (state.average_power < 50.0 * 50.0 * 64.0) & (
        x2_max < 3.0 * state.average_power
    )
    avg_power = state.average_power * 0.9 + x2_sum * 0.1

    def sel(nearend_val, normal_val):
        return jnp.where(nearend_state, nearend_val, normal_val)

    # Nearend moving average (moving_average.cc).
    mem = state.nearend_memory.shape[1]
    scaling = 1.0 / (mem + 1)
    nearend_avg = (
        nearend_spectrum + jnp.sum(state.nearend_memory, axis=1)
    ) * scaling
    if mem > 0:
        new_memory = jnp.where(
            (jnp.arange(mem) == state.nearend_mem_index)[None, :, None],
            nearend_spectrum[:, None, :],
            state.nearend_memory,
        )
        mem_index = jnp.mod(state.nearend_mem_index + 1, mem)
    else:
        new_memory = state.nearend_memory
        mem_index = state.nearend_mem_index

    weighted_echo = _weight_echo_for_audibility(config, R2)

    # GetMaxGain.
    inc = sel(nearend_params["max_inc_factor"], normal_params["max_inc_factor"])
    max_gain = jnp.clip(
        jnp.maximum(state.last_gain * inc, sup.floor_first_increase), None, 1.0
    )

    # GetMinGain per channel.
    min_echo_power = jnp.where(
        low_noise, config.echo_audibility.low_render_limit,
        config.echo_audibility.normal_render_limit,
    )
    min_gain = jnp.where(
        weighted_echo > 0.0,
        jnp.minimum(min_echo_power / jnp.maximum(weighted_echo, 1e-30), 1.0),
        1.0,
    )
    dec = sel(nearend_params["max_dec_factor_lf"],
              normal_params["max_dec_factor_lf"])
    k = jnp.arange(NUM_BINS)
    lf_smooth_on = (
        ~state.initial_state | sup.lf_smoothing_during_initial_phase
    )
    lf_band = k <= sup.last_lf_smoothing_band
    cond = (state.last_nearend > state.last_echo) | (
        k[None, :] <= sup.last_permanent_lf_smoothing_band
    )
    smooth = lf_smooth_on & lf_band[None, :] & cond
    min_gain = jnp.where(
        smooth,
        jnp.minimum(jnp.maximum(min_gain, state.last_gain[None, :] * dec), 1.0),
        min_gain,
    )
    min_gain = jnp.where(saturated_echo, 0.0, min_gain)

    # GainToNoAudibleEcho per channel.
    enr = weighted_echo / (nearend_avg + 1.0)
    emr = weighted_echo / (comfort_noise_spectrum[0][None, :] + 1.0)
    enr_t = sel(nearend_params["enr_transparent"],
                normal_params["enr_transparent"])
    enr_s = sel(nearend_params["enr_suppress"], normal_params["enr_suppress"])
    emr_t = sel(nearend_params["emr_transparent"],
                normal_params["emr_transparent"])
    g = jnp.where(
        (enr > enr_t) & (emr > emr_t),
        jnp.maximum(
            (enr_s - enr) / jnp.maximum(enr_s - enr_t, 1e-10),
            emr_t / jnp.maximum(emr, 1e-30),
        ),
        1.0,
    )
    g = jnp.clip(g, min_gain, max_gain[None, :])
    gain = jnp.min(g, axis=0)  # min across channels

    # LimitLowFrequencyGains (suppression_gain.cc:28-32).
    g01 = jnp.minimum(gain[1], gain[2])
    gain = gain.at[0].set(g01).at[1].set(g01)

    # LimitHighFrequencyGains (:34-71).
    lim_band = sup.high_frequency_suppression.limiting_gain_band
    n_lim = sup.high_frequency_suppression.bands_in_limiting_gain
    limited = gain
    if n_lim > 0:
        min_upper = jnp.min(
            jax.lax.dynamic_slice(gain, (lim_band,), (n_lim,))
        )
        min_upper = jnp.minimum(min_upper, 1.0)
        limited = jnp.where(k > lim_band, jnp.minimum(gain, min_upper), gain)
    limited = limited.at[64].set(limited[63])
    apply_hf_limit = (
        ~nearend_state | jnp.asarray(clock_drift)
        | jnp.asarray(sup.conservative_hf_suppression)
    )
    gain = jnp.where(apply_hf_limit, limited, gain)

    new_state = state.replace(
        last_gain=gain,
        last_nearend=nearend_avg,
        last_echo=weighted_echo,
        nearend_memory=new_memory,
        nearend_mem_index=mem_index,
        average_power=avg_power,
        dn_trigger_counters=trig,
        dn_hold_counters=hold,
        dn_nearend_state=nearend_state,
    )

    amp_gain = jnp.sqrt(jnp.maximum(gain, 0.0))

    # UpperBandsGain (suppression_gain.cc:112-190).
    num_bands = render_block.shape[0]
    if num_bands == 1:
        high_gain = jnp.asarray(1.0)
    else:
        narrow = (narrow_peak_band >= 0) & (narrow_peak_band > NUM_BINS - 10)
        gain_below_8 = jnp.min(amp_gain[32:])
        low_energy = jnp.max(jnp.sum(render_block[0] ** 2, axis=0))
        high_energy = jnp.max(jnp.sum(render_block[1:] ** 2, axis=1))
        act_thr = (
            BLOCK_SIZE
            * sup.high_bands_suppression.anti_howling_activation_threshold
        )
        anti_howl = jnp.where(
            high_energy < jnp.maximum(low_energy, act_thr),
            1.0,
            sup.high_bands_suppression.anti_howling_gain
            * jnp.sqrt(low_energy / jnp.maximum(high_energy, 1e-10)),
        )
        echo_lf = jnp.sum(echo_spectrum[:, 1:16], axis=-1)
        noise_lf = jnp.sum(comfort_noise_spectrum[:, 1:16], axis=-1)
        bound = jnp.where(
            ~nearend_state
            & jnp.any(
                echo_lf > sup.high_bands_suppression.enr_threshold * noise_lf
            ),
            sup.high_bands_suppression.max_gain_during_echo,
            1.0,
        )
        high_gain = jnp.minimum(jnp.minimum(gain_below_8, anti_howl), bound)
        high_gain = jnp.where(saturated_echo,
                              jnp.minimum(0.001, gain_below_8), high_gain)
        high_gain = jnp.where(narrow, 0.001, high_gain)

    return new_state, amp_gain, high_gain


def set_initial_state(config, state: SuppressionGainState, value):
    """SuppressionGain::SetInitialState (suppression_gain.cc:502-509)."""
    return state.replace(
        initial_state=value,
        initial_state_change_counter=jnp.where(
            value, config.filter.config_change_duration_blocks, 0
        ),
    )


# ------------------------------------------------------ suppression filter


@struct.dataclass
class SuppressionFilterState:
    e_output_old: jnp.ndarray  # (bands, C, 64)


def init_suppression_filter(num_bands, num_capture) -> SuppressionFilterState:
    return SuppressionFilterState(
        e_output_old=jnp.zeros((num_bands, num_capture, BLOCK_SIZE))
    )


def suppression_filter_apply(
    state: SuppressionFilterState,
    comfort_noise,  # (C, 65) complex
    comfort_noise_high,  # (C, 65) complex
    gain,  # (65,)
    high_bands_gain,  # ()
    E_lowest,  # (C, 65) complex
    e_block,  # (bands, 64, C) time-domain capture to modify
):
    """SuppressionFilter::ApplyGain (suppression_filter.cc:77-180)."""
    num_bands = e_block.shape[0]
    noise_gain = jnp.sqrt(jnp.maximum(1.0 - gain * gain, 0.0))
    hb_noise_scale = 0.4 * jnp.sqrt(
        jnp.maximum(1.0 - high_bands_gain * high_bands_gain, 0.0)
    )

    E = E_lowest * gain + noise_gain * comfort_noise  # (C, 65)
    e_ext = afft.ifft_unnormalized(E)  # (C, 128)
    k_norm = 2.0 / 128.0
    win = afft.SQRT_HANNING128
    e0 = (
        state.e_output_old[0] * win[64:]
        + e_ext[:, :64] * win[:64]
    ) * k_norm
    new_old_0 = e_ext[:, 64:]

    out_bands = [jnp.swapaxes(e0, 0, 1)]  # (64, C)
    new_old = [new_old_0]
    if num_bands > 1:
        for b in range(1, num_bands):
            eb = jnp.swapaxes(e_block[b], 0, 1) * high_bands_gain  # (C, 64)
            if b == 1:
                hb_noise = afft.ifft_unnormalized(comfort_noise_high)[:, :64]
                eb = eb + hb_noise * (hb_noise_scale * k_norm)
            # Delay upper bands one block (std::swap with the old buffer).
            out_bands.append(jnp.swapaxes(state.e_output_old[b], 0, 1))
            new_old.append(eb)

    out = jnp.stack(
        [jnp.clip(b, -32768.0, 32767.0) for b in out_bands], axis=0
    )
    return (
        SuppressionFilterState(e_output_old=jnp.stack(new_old, axis=0)),
        out,
    )


# ----------------------------------------------------------- echo remover


@struct.dataclass
class EchoRemoverState:
    subtractor: subt.SubtractorState
    analyzer: subt.RenderSignalAnalyzerState
    aec: aecs.AecStateState
    cng: ComfortNoiseState
    residual: ResidualEchoState
    supp_gain: SuppressionGainState
    supp_filter: SuppressionFilterState
    e_old: jnp.ndarray  # (C, 64)
    y_old: jnp.ndarray  # (C, 64)
    gain_change_hangover: jnp.ndarray  # () int32
    refined_last_selected: jnp.ndarray  # (C,) bool


def init_state(config: EchoCanceller3Config, num_bands, num_render,
               num_capture) -> EchoRemoverState:
    sub_state = subt.init_state(config, num_render, num_capture)
    p_max = sub_state.refined.H.shape[1]
    return EchoRemoverState(
        subtractor=sub_state,
        analyzer=subt.init_analyzer(),
        aec=aecs.init_state(config, num_capture, p_max),
        cng=init_comfort_noise(num_capture),
        residual=init_residual_echo(config),
        supp_gain=init_suppression_gain(config, num_capture),
        supp_filter=init_suppression_filter(num_bands, num_capture),
        e_old=jnp.zeros((num_capture, BLOCK_SIZE)),
        y_old=jnp.zeros((num_capture, BLOCK_SIZE)),
        gain_change_hangover=jnp.asarray(0, jnp.int32),
        refined_last_selected=jnp.ones((num_capture,), bool),
    )


_TRANSITION = jnp.concatenate([
    (jnp.arange(1, 31) / 31.0),
    jnp.ones((34,)),
])


def _form_linear_filter_output(config, last_refined, out):
    """FormLinearFilterOutput (echo_remover.cc:452-489). Per channel."""
    e_ref, e_coa = out["e_refined"], out["e_coarse"]
    if config.filter.enable_coarse_filter_output_usage:
        prefer_coarse = (
            (out["e2_coarse"] < 0.9 * out["e2_refined"])
            & (out["y2"] > 30.0 * 30.0 * BLOCK_SIZE)
            & ((out["s2_refined"] > 60.0 * 60.0 * BLOCK_SIZE)
               | (out["s2_coarse"] > 60.0 * 60.0 * BLOCK_SIZE))
        )
        diverged = (out["e2_coarse"] < out["e2_refined"]) & (
            out["y2"] < out["e2_refined"]
        )
        use_refined = ~(prefer_coarse | (~prefer_coarse & diverged))
    else:
        use_refined = jnp.ones_like(last_refined)

    from_sig = jnp.where(last_refined[:, None], e_ref, e_coa)
    to_sig = jnp.where(use_refined[:, None], e_ref, e_coa)
    same = last_refined == use_refined
    blended = _TRANSITION[None, :] * to_sig + (
        1.0 - _TRANSITION[None, :]
    ) * from_sig
    e = jnp.where(same[:, None], to_sig, blended)
    return e, use_refined


def process_capture(
    config: EchoCanceller3Config,
    state: EchoRemoverState,
    geo: rb.BufferGeometry,
    buf: rb.RenderView,
    capture_block,  # (bands, 64, C)
    delay_change,  # () bool (echo path variability)
    gain_change,  # () bool
    capture_signal_saturation,  # () bool
    external_delay,  # () int32
    external_delay_valid,  # () bool
    nree=None,  # injected NeuralResidualEchoEstimator (builder.py) or None
    taps=None,  # dict to fill with named intermediate signals (the
    #             ApmDataDumper analog; echo_remover.cc:472-495)
):
    """EchoRemoverImpl::ProcessCapture (echo_remover.cc:236-450).

    Returns (state, output_block (bands, 64, C), linear_output (C, 64)).
    """
    y0 = jnp.swapaxes(capture_block[0], 0, 1)  # (C, 64)

    # Consolidated ring windows, built once up front: EVERY ring read below
    # slices/one-hots these windows instead of touching the ring. A direct
    # single-row read (spectrum_at/block_at) is a (1, L) x (L, F) one-hot
    # contraction that XLA:TPU rewrites as broadcast+multiply+reduce,
    # materializing a ring-sized temporary per call — at serving batch
    # sizes those temporaries were the largest line item of the step.
    # Window width covers BOTH filters (a coarse filter may be configured
    # longer than the refined one, subtractor_unittest.cc:253).
    p_ref_max = max(state.subtractor.refined.H.shape[1],
                    state.subtractor.coarse.H.shape[1])
    headroom_blocks = int(config.delay.delay_headroom_samples) // 64
    delay_bound = max(config.filter.refined.length_blocks, headroom_blocks + 1)
    spec_win_len = min(
        max(p_ref_max, delay_bound + 2)
        + max(config.echo_model.render_post_window_size, 1) + 1,
        geo.num_blocks,
    )
    # One DMA serves both the spectrum window and the FFT window (the
    # packed sf ring shares their write index and read start).
    sf_rows = rb.sf_window(geo, buf, spec_win_len)
    spec_win = rb._sf_spectrum(geo, sf_rows)
    X_window = rb._sf_fft(geo, sf_rows[:p_ref_max])
    blocks_win = rb.block_window_back(
        geo, buf, min(delay_bound, geo.num_blocks)
    )
    # block_window_back row 0 is b_read_index + 0 == RenderBuffer::GetBlock(0).
    x_block = blocks_win[0]

    # Gain-change hangover: act once per frame (echo_remover.cc:317-333).
    gain_change = gain_change & (state.gain_change_hangover == 0)
    hangover = jnp.where(
        gain_change, 3, jnp.maximum(state.gain_change_hangover - 1, 0)
    )
    state = state.replace(gain_change_hangover=hangover)

    aec = state.aec.replace(capture_signal_saturation=capture_signal_saturation)
    path_changed = delay_change | gain_change
    sub_state = subt.handle_echo_path_change(
        config, state.subtractor, delay_change, gain_change
    )
    aec = aecs.handle_echo_path_change(config, aec, delay_change, gain_change)
    supp_gain_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(delay_change, a, b),
        set_initial_state(config, state.supp_gain, jnp.asarray(True)),
        state.supp_gain,
    )
    del path_changed

    # Render signal analysis (reads rows of the consolidated windows).
    analyzer = subt.analyzer_update(
        config, state.analyzer, geo, buf, aec.min_filter_delay,
        jnp.asarray(True), spec_win=spec_win, block0=x_block,
    )

    # Initial-state transition (echo_remover.cc:344-348) uses last block's
    # transition flag.
    transition = aec.transition_triggered
    sub_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(transition, a, b),
        subt.exit_initial_state(config, sub_state), sub_state,
    )
    supp_gain_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(transition, a, b),
        set_initial_state(config, supp_gain_state, jnp.asarray(False)),
        supp_gain_state,
    )

    # Linear echo cancellation (windows built at the top of the function).
    # Spectral sums masked to the active partition counts.
    spectra_win = spec_win[:p_ref_max]  # (P, C, 65)
    pidx = jnp.arange(p_ref_max)
    X2_refined = jnp.sum(
        jnp.where(
            (pidx < sub_state.refined.current_size)[:, None, None],
            spectra_win, 0.0,
        ),
        axis=(0, 1),
    )
    X2_coarse = jnp.sum(
        jnp.where(
            (pidx < sub_state.coarse.current_size)[:, None, None],
            spectra_win, 0.0,
        ),
        axis=(0, 1),
    )
    sub_state, sub_out = subt.process(
        config, sub_state, X_window, X2_refined, X2_coarse, y0, analyzer,
        capture_signal_saturation,
    )

    # Linear filter output + spectra (echo_remover.cc:352-371).
    e, use_refined = _form_linear_filter_output(
        config, state.refined_last_selected, sub_out
    )
    # One batched DFT for Y and E (independent transforms; each output row
    # of the matmul-DFT is an independent dot, so values are bit-identical
    # to two separate calls).
    YE = afft.padded_fft(
        jnp.stack([y0, e]), jnp.stack([state.y_old, state.e_old]),
        "sqrt_hanning",
    )
    Y, E = YE[0], YE[1]
    S2_linear = afft.spectrum(Y - E)
    Y2 = afft.spectrum(Y)
    E2 = afft.spectrum(E)

    # AEC state update.
    aec = aecs.update(
        config, aec, geo, buf, external_delay, external_delay_valid,
        sub_state.refined_frequency_responses,
        sub_state.refined_impulse_responses,
        sub_state.refined.current_size,
        E2, Y2, sub_out,
        spec_win=spec_win, blocks_win=blocks_win,
    )

    nearend_spectrum = jnp.where(aec.usable_linear_estimate, E2, Y2)
    Y_fft = jnp.where(aec.usable_linear_estimate, E, Y)

    # Comfort noise.
    cng_state, N_low, N_high, N2 = comfort_noise_compute(
        config, state.cng, aec.capture_signal_saturation, nearend_spectrum
    )

    # Residual echo.
    transparent = aecs.transparent_mode_active(config, aec)
    residual_state, R2, R2_unbounded = residual_echo_estimate(
        config, state.residual, geo, buf, aec, S2_linear, Y2,
        state.supp_gain.dn_nearend_state, transparent,
        sub_state.refined.current_size,
        spec_win=spec_win,
    )
    if nree is not None:
        # Injected neural residual-echo estimate replaces the model-based
        # R2 (neural_residual_echo_estimator.h:45-55): inputs are the
        # time-domain render block, y, e and the S2/Y2/E2 power spectra.
        R2, R2_unbounded = nree.estimate(
            jnp.swapaxes(x_block[0], 0, 1), y0, e, S2_linear, Y2, E2,
            state.supp_gain.dn_nearend_state,
        )

    # Suppressor nearend bound (E2 <= Y2 when linear usable).
    E2_bounded = jnp.minimum(E2, Y2)
    nearend_for_gain = jnp.where(
        aec.usable_linear_estimate, E2_bounded, Y2
    )
    echo_spectrum = jnp.where(aec.usable_linear_estimate, S2_linear, R2)

    clock_drift = config.echo_removal_control.has_clock_drift

    supp_gain_state, G, high_gain = suppression_gain_compute(
        config, supp_gain_state, nearend_for_gain, echo_spectrum, R2,
        R2_unbounded, N2, analyzer.narrow_peak_band, aec.saturated_echo,
        x_block, clock_drift,
    )

    supp_filter_state, out = suppression_filter_apply(
        state.supp_filter, N_low, N_high, G, high_gain, Y_fft, capture_block
    )

    if taps is not None:
        # Names follow the reference's ApmDataDumper keys
        # (echo_remover.cc:472-495).
        taps.update({
            "aec3_Y2": Y2,
            "aec3_E2": E2,
            "aec3_S2_linear": S2_linear,
            "aec3_R2": R2,
            "aec3_N2": N2,
            "aec3_suppressor_gain": G,
            "aec3_output": jnp.swapaxes(out[0], 0, 1),
            "aec3_linear_aec_output": e,
            "aec3_usable_linear_estimate": aec.usable_linear_estimate,
            "aec3_filter_delay": aec.min_filter_delay,
        })

    new_state = EchoRemoverState(
        subtractor=sub_state,
        analyzer=analyzer,
        aec=aec,
        cng=cng_state,
        residual=residual_state,
        supp_gain=supp_gain_state,
        supp_filter=supp_filter_state,
        e_old=e,
        y_old=y0,
        gain_change_hangover=hangover,
        refined_last_selected=use_refined,
    )
    return new_state, out, e


def process_capture_pair(
    config: EchoCanceller3Config,
    state: EchoRemoverState,
    geo: rb.BufferGeometry,
    views,  # list of rb.RenderView, one per capture block (post-align)
    capture_blocks,  # list of (bands, 64, C)
    delay_changes,  # list of () bool per block
    gain_change,  # () bool (frame-level echo path gain change)
    capture_signal_saturation,  # () bool
    external_delays,  # list of () int32 per block
    external_delay_valids,  # list of () bool per block
    nree=None,
    taps=None,
    use_subtractor_kernel: bool = False,  # Pallas pair-megakernel for
    #   phase B (any geometry; ops/pallas_subtractor.py)
    subtractor_kernel_interpret: bool = False,  # Pallas interpret mode
    #   (CPU equivalence testing)
):
    """EchoRemoverImpl::ProcessCapture for ALL capture blocks of one frame,
    restructured into three phases (docs/design/subtractor_megakernel.md):

    A) render-side per-block work hoisted ahead of the subtractor — the
       consolidated window CHAINS (two sf spans + two blocks spans per
       frame instead of per block), the RenderSignalAnalyzer evolution,
       and the gain-change hangover;
    B) the subtractor for all blocks as one unit (subtractor.process_pair
       — the megakernel's semantic reference);
    C) the per-block aec-state / comfort-noise / residual / suppression
       loop, unchanged.

    Accepted deviations vs the strictly-interleaved reference (validated
    by the float conformance matrix):
    - the analyzer's min_filter_delay and the subtractor's initial-state
      transition use the FRAME-ENTRY aec-state values (<= 2 blocks stale;
      min_filter_delay only gates narrowband masking of the NLMS mu, and
      the transition fires once per stream lifetime).

    Returns (state, [out_block per block], [linear e per block]).
    """
    nb = len(views)
    y0s = [jnp.swapaxes(cb[0], 0, 1) for cb in capture_blocks]  # (C, 64)

    # Window width covers BOTH filters (a coarse filter may be configured
    # longer than the refined one, subtractor_unittest.cc:253).
    p_ref_max = max(state.subtractor.refined.H.shape[1],
                    state.subtractor.coarse.H.shape[1])
    headroom_blocks = int(config.delay.delay_headroom_samples) // 64
    delay_bound = max(config.filter.refined.length_blocks, headroom_blocks + 1)
    spec_win_len = min(
        max(p_ref_max, delay_bound + 2)
        + max(config.echo_model.render_post_window_size, 1) + 1,
        geo.num_blocks,
    )
    W_b = min(delay_bound, geo.num_blocks)
    L = geo.num_blocks

    # ---- Phase A1: per-pair chains. Each block's windows are contiguous
    # ring spans whose starts move by exactly -1 (sf) / +1 (blocks) per
    # block except across a delay jump; two chains (block-0 trajectory +
    # last-block anchor) cover every block whenever at most one jump lands
    # inside the frame (the matched filter emits at most one new estimate
    # per 6 blocks), selected per block by which chain contains its start.
    W_chain = spec_win_len + nb - 1
    W_bchain = W_b + nb - 1
    sf_starts = [rb.s_read_index(geo, v.state, v.n) for v in views]
    sf_anchor_a = jnp.mod(sf_starts[0] - (nb - 1), L)
    sf_anchor_b = sf_starts[-1]
    sf_chain = jnp.concatenate([
        rb.sf_span(geo, views[-1], sf_anchor_a, W_chain),
        rb.sf_span(geo, views[-1], sf_anchor_b, W_chain),
    ])  # (2*W_chain, sf_row_fp)

    b_starts = [
        jnp.mod(rb.b_read_index(geo, v.state, v.n) - (W_b - 1), L)
        for v in views
    ]
    b_anchor_a = b_starts[0]
    b_anchor_b = jnp.mod(b_starts[-1] - (nb - 1), L)
    b_chain = jnp.concatenate([
        rb.blocks_span(geo, views[-1], b_anchor_a, W_bchain),
        rb.blocks_span(geo, views[-1], b_anchor_b, W_bchain),
    ])  # (2*W_bchain, blocks_row_fp)

    def chain_offset(start, anchor_a, anchor_b, width):
        # Offset into the concatenated [chain_a | chain_b] rows. Prefer
        # chain B (the post-jump anchor); a start matching neither chain
        # (two trajectory breaks in one frame — not reachable under
        # paired stepping) clamps into chain A.
        off_a = jnp.mod(start - anchor_a, L)
        off_b = jnp.mod(start - anchor_b, L)
        use_b = off_b <= nb - 1
        return jnp.where(use_b, width + off_b, jnp.clip(off_a, 0, nb - 1))

    sf_rows_k, blocks_win_k, sf_offs = [], [], []
    for k in range(nb):
        off = chain_offset(sf_starts[k], sf_anchor_a, sf_anchor_b, W_chain)
        sf_offs.append(off)
        sf_rows_k.append(rb.window_slice(sf_chain, off, spec_win_len))
        boff = chain_offset(b_starts[k], b_anchor_a, b_anchor_b, W_bchain)
        rows = rb.window_slice(b_chain, boff, W_b)
        blocks_win_k.append(
            rows[::-1, : geo.blocks_row_f].reshape(
                (W_b,) + geo.block_row_shape
            )
        )

    spec_wins = [rb._sf_spectrum(geo, r) for r in sf_rows_k]
    # The kernel's in-VMEM window is built with the refined partition
    # count; a coarse filter configured LONGER than the refined one (legal,
    # non-default) falls back to the XLA pair path.
    kernel_mode = use_subtractor_kernel and (
        state.subtractor.coarse.H.shape[1]
        <= state.subtractor.refined.H.shape[1]
    )
    X_windows = (None if kernel_mode
                 else [rb._sf_fft(geo, r[:p_ref_max]) for r in sf_rows_k])

    # ---- Phase A2: gain-change hangover + analyzer evolution + the
    # per-block echo-path-change selects for the aec/suppressor (their
    # state machines stay per-block in phase C; only the flags are
    # precomputed here).
    gain_changes, hangover = [], state.gain_change_hangover
    for k in range(nb):
        gc = gain_change & (hangover == 0)
        hangover = jnp.where(gc, 3, jnp.maximum(hangover - 1, 0))
        gain_changes.append(gc)

    analyzer = state.analyzer
    analyzer_states = []
    min_delay0 = state.aec.min_filter_delay  # frame-entry (accepted stale)
    for k in range(nb):
        analyzer = subt.analyzer_update(
            config, analyzer, geo, views[k], min_delay0, jnp.asarray(True),
            spec_win=spec_wins[k], block0=blocks_win_k[k][0],
        )
        analyzer_states.append(analyzer)
    narrow_masks = jnp.stack(
        [subt.narrow_zero_mask(a) for a in analyzer_states]
    )
    poors = jnp.stack(
        [subt.poor_signal_excitation(a) for a in analyzer_states]
    )

    # ---- Phase B: the subtractor over all blocks.
    transition0 = state.aec.transition_triggered  # frame-entry (accepted)
    transitions = jnp.stack(
        [transition0 if k == 0 else jnp.asarray(False) for k in range(nb)]
    )
    if kernel_mode:
        from webrtc_audio_processing_tpu.models.aec3 import (
            subtractor_kernel as sk,
        )
        chain_fft = rb._sf_fft(geo, sf_chain)  # (2W, C_ren, 65) complex
        chain_spec_sum = jnp.sum(rb._sf_spectrum(geo, sf_chain), axis=1)
        sub_state, sub_outs = sk.process_pair_kernel(
            config, state.subtractor, chain_fft, chain_spec_sum,
            jnp.stack(sf_offs), jnp.stack(y0s),
            narrow_masks, poors,
            jnp.stack(delay_changes), jnp.stack(gain_changes), transitions,
            capture_signal_saturation,
            interpret=subtractor_kernel_interpret,
        )
    else:
        sub_state, sub_outs = subt.process_pair(
            config, state.subtractor,
            jnp.stack(X_windows),
            jnp.stack([w[:p_ref_max] for w in spec_wins]),
            jnp.stack(y0s),
            narrow_masks, poors,
            jnp.stack(delay_changes), jnp.stack(gain_changes), transitions,
            capture_signal_saturation,
        )

    # ---- Phase C: per-block aec state / CNG / residual / suppression.
    aec = state.aec.replace(
        capture_signal_saturation=capture_signal_saturation
    )
    cng_state = state.cng
    residual_state = state.residual
    supp_gain_state = state.supp_gain
    supp_filter_state = state.supp_filter
    e_old, y_old = state.e_old, state.y_old
    use_refined = state.refined_last_selected
    outs, linears = [], []
    for k in range(nb):
        y0 = y0s[k]
        sub_out = sub_outs[k]
        x_block = blocks_win_k[k][0]

        aec = aecs.handle_echo_path_change(
            config, aec, delay_changes[k], gain_changes[k]
        )
        supp_gain_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(delay_changes[k], a, b),
            set_initial_state(config, supp_gain_state, jnp.asarray(True)),
            supp_gain_state,
        )
        transition = aec.transition_triggered if k > 0 else transition0
        supp_gain_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(transition, a, b),
            set_initial_state(config, supp_gain_state, jnp.asarray(False)),
            supp_gain_state,
        )

        e, use_refined = _form_linear_filter_output(
            config, use_refined, sub_out
        )
        YE = afft.padded_fft(
            jnp.stack([y0, e]), jnp.stack([y_old, e_old]), "sqrt_hanning",
        )
        Y, E = YE[0], YE[1]
        S2_linear = afft.spectrum(Y - E)
        Y2 = afft.spectrum(Y)
        E2 = afft.spectrum(E)

        aec = aecs.update(
            config, aec, geo, views[k], external_delays[k],
            external_delay_valids[k],
            sub_out["refined_frequency_responses"],
            sub_out["refined_impulse_responses"],
            sub_out["refined_current_size"],
            E2, Y2, sub_out,
            spec_win=spec_wins[k], blocks_win=blocks_win_k[k],
        )

        nearend_spectrum = jnp.where(aec.usable_linear_estimate, E2, Y2)
        Y_fft = jnp.where(aec.usable_linear_estimate, E, Y)

        cng_state, N_low, N_high, N2 = comfort_noise_compute(
            config, cng_state, aec.capture_signal_saturation, nearend_spectrum
        )

        transparent = aecs.transparent_mode_active(config, aec)
        residual_state, R2, R2_unbounded = residual_echo_estimate(
            config, residual_state, geo, views[k], aec, S2_linear, Y2,
            supp_gain_state.dn_nearend_state, transparent,
            sub_out["refined_current_size"],
            spec_win=spec_wins[k],
        )
        if nree is not None:
            R2, R2_unbounded = nree.estimate(
                jnp.swapaxes(x_block[0], 0, 1), y0, e, S2_linear, Y2, E2,
                supp_gain_state.dn_nearend_state,
            )

        E2_bounded = jnp.minimum(E2, Y2)
        nearend_for_gain = jnp.where(
            aec.usable_linear_estimate, E2_bounded, Y2
        )
        echo_spectrum = jnp.where(aec.usable_linear_estimate, S2_linear, R2)
        clock_drift = config.echo_removal_control.has_clock_drift

        supp_gain_state, G, high_gain = suppression_gain_compute(
            config, supp_gain_state, nearend_for_gain, echo_spectrum, R2,
            R2_unbounded, N2, analyzer_states[k].narrow_peak_band,
            aec.saturated_echo, x_block, clock_drift,
        )
        supp_filter_state, out = suppression_filter_apply(
            supp_filter_state, N_low, N_high, G, high_gain, Y_fft,
            capture_blocks[k],
        )

        if taps is not None and k == nb - 1:
            taps.update({
                "aec3_Y2": Y2,
                "aec3_E2": E2,
                "aec3_S2_linear": S2_linear,
                "aec3_R2": R2,
                "aec3_N2": N2,
                "aec3_suppressor_gain": G,
                "aec3_output": jnp.swapaxes(out[0], 0, 1),
                "aec3_linear_aec_output": e,
                "aec3_usable_linear_estimate": aec.usable_linear_estimate,
                "aec3_filter_delay": aec.min_filter_delay,
            })

        e_old, y_old = e, y0
        outs.append(out)
        linears.append(e)

    new_state = EchoRemoverState(
        subtractor=sub_state,
        analyzer=analyzer,
        aec=aec,
        cng=cng_state,
        residual=residual_state,
        supp_gain=supp_gain_state,
        supp_filter=supp_filter_state,
        e_old=e_old,
        y_old=y_old,
        gain_change_hangover=hangover,
        refined_last_selected=use_refined,
    )
    return new_state, outs, linears
