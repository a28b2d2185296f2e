"""AEC3 subtractor: partitioned-FFT adaptive filters (refined + coarse).

Reference: aec3/adaptive_fir_filter.cc (partitioned frequency-domain FIR with
cyclic time-domain constraining), aec3/refined_filter_update_gain.cc,
aec3/coarse_filter_update_gain.cc, aec3/subtractor.cc,
aec3/subtractor_output.cc, aec3/render_signal_analyzer.cc,
aec3/adaptive_fir_filter_erl.cc.

TPU re-design: filters are dense (C_cap, P, C_ren, 65) complex tensors;
apply/adapt are einsums over the render FFT window (the per-partition
C++ loops with SSE2/AVX2 variants collapse into single fused contractions).
The partition count transition (initial 12 -> 13) is a traced size with
masked partitions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.models.aec3 import fft as afft
from webrtc_audio_processing_tpu.models.aec3 import render_buffer as rb
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config

NUM_BINS = 65
BLOCK_SIZE = 64
H_ERROR_INITIAL = 10000.0  # refined_filter_update_gain.cc:41
POOR_EXCITATION_COUNTER_INITIAL = 1000


# ----------------------------------------------------------- signal analyzer


@struct.dataclass
class RenderSignalAnalyzerState:
    """render_signal_analyzer.h:54-58."""

    narrow_band_counters: jnp.ndarray  # (63,) int32
    narrow_peak_band: jnp.ndarray  # () int32, -1 = none
    narrow_peak_counter: jnp.ndarray  # () int32


def init_analyzer() -> RenderSignalAnalyzerState:
    return RenderSignalAnalyzerState(
        narrow_band_counters=jnp.zeros((63,), jnp.int32),
        narrow_peak_band=jnp.asarray(-1, jnp.int32),
        narrow_peak_counter=jnp.asarray(0, jnp.int32),
    )


def analyzer_update(
    config: EchoCanceller3Config,
    state: RenderSignalAnalyzerState,
    geo: rb.BufferGeometry,
    buf: rb.RenderView,
    delay_partitions,
    delay_valid,
    spec_win=None,  # optional (W, C, 65) spectra window at the read pos
    block0=None,  # optional (bands, 64, C) RenderBuffer::GetBlock(0)
):
    """RenderSignalAnalyzer::Update (render_signal_analyzer.cc:121-131).

    When `spec_win`/`block0` are given, all ring reads come from those
    consolidated windows (a direct spectrum_at/block_at is a full-ring
    one-hot contraction per call under vmap)."""
    # IdentifySmallNarrowBandRegions (:24-50).
    X2 = (rb.window_row(spec_win, delay_partitions)
          if spec_win is not None
          else rb.spectrum_at(geo, buf, delay_partitions))  # (C, 65)
    narrow = X2[:, 1:64] > 3.0 * jnp.maximum(X2[:, 0:63], X2[:, 2:65])
    any_narrow = jnp.any(narrow, axis=0)  # (63,)
    counters = jnp.where(
        delay_valid,
        jnp.where(any_narrow, state.narrow_band_counters + 1, 0),
        jnp.zeros_like(state.narrow_band_counters),
    )

    # IdentifyStrongNarrowBandComponent (:53-111).
    freeze = config.filter.refined.length_blocks
    peak_counter = state.narrow_peak_counter + 1
    peak_band = jnp.where(
        (state.narrow_peak_band >= 0) & (peak_counter > freeze),
        -1,
        state.narrow_peak_band,
    )

    block = block0 if block0 is not None else rb.block_at(geo, buf, 0)
    X2_latest = (spec_win[0] if spec_win is not None
                 else rb.spectrum_at(geo, buf, 0))  # (C, 65)
    peak_bins = jnp.argmax(X2_latest, axis=-1)  # (C,)
    ks = jnp.arange(NUM_BINS)
    lo_mask = (ks[None, :] >= jnp.maximum(0, peak_bins - 14)[:, None]) & (
        ks[None, :] < (peak_bins - 4)[:, None]
    )
    hi_mask = (ks[None, :] >= (peak_bins + 5)[:, None]) & (
        ks[None, :] < jnp.minimum(peak_bins + 15, NUM_BINS)[:, None]
    )
    non_peak = jnp.max(
        jnp.where(lo_mask | hi_mask, X2_latest, 0.0), axis=-1
    )  # (C,)
    max_abs = jnp.max(jnp.abs(block[0]), axis=0)  # (C,)
    if block.shape[0] > 1:
        max_abs = jnp.maximum(max_abs, jnp.max(jnp.abs(block[1]), axis=0))
    peak_level = jnp.sum(
        jnp.where(ks[None, :] == peak_bins[:, None], X2_latest, 0.0),
        axis=-1,
    )  # one-hot read: per-channel dynamic gathers serialize under vmap
    strong = (peak_bins > 0) & (max_abs > 100.0) & (
        peak_level > 100.0 * non_peak
    )
    best = jnp.argmax(jnp.where(strong, peak_level, -1.0))
    has_strong = jnp.any(strong)
    peak_band = jnp.where(has_strong, peak_bins[best].astype(jnp.int32),
                          peak_band)
    peak_counter = jnp.where(has_strong, 0, peak_counter)

    return RenderSignalAnalyzerState(
        narrow_band_counters=counters,
        narrow_peak_band=peak_band,
        narrow_peak_counter=peak_counter,
    )


def poor_signal_excitation(state: RenderSignalAnalyzerState):
    """render_signal_analyzer.h:40-45."""
    return jnp.any(state.narrow_band_counters > 10)


def narrow_zero_mask(state: RenderSignalAnalyzerState):
    """The (65,) bool mask MaskRegionsAroundNarrowBands zeroes
    (render_signal_analyzer.cc:134-151): +-2 bins around narrow bands."""
    trig = state.narrow_band_counters > 5  # (63,) for bins 1..63
    # zero[b] = OR_{off=-2..2} trig[b-1+off] (trig index i <-> bin i+1),
    # i.e. a +-2 dilation of the interior trigger mask — five shifted
    # slices instead of the reference's scatter loop (scatters serialize
    # on TPU; slices + ORs fuse).
    pad2 = jnp.zeros((2,), bool)
    center = jnp.concatenate([pad2, trig[1:62], pad2])  # (65,) bin-aligned
    padded = jnp.concatenate([pad2, center, pad2])  # (69,)
    zero = (padded[0:65] | padded[1:66] | padded[2:67]
            | padded[3:68] | padded[4:69])
    bins = jnp.arange(NUM_BINS)
    return zero | ((bins < 2) & trig[0]) | ((bins >= 63) & trig[62])


def mask_narrow_bands(state: RenderSignalAnalyzerState, v):
    """MaskRegionsAroundNarrowBands (render_signal_analyzer.cc:134-151).

    v: (..., 65). Zeroes +-2 bins around narrow bands.
    """
    return jnp.where(narrow_zero_mask(state), 0.0, v)


# ----------------------------------------------------------- adaptive filter


@struct.dataclass
class FilterState:
    """AdaptiveFirFilter (adaptive_fir_filter.h)."""

    H: jnp.ndarray  # (C_cap, P_max, C_ren, 65) complex64
    current_size: jnp.ndarray  # () int32
    target_size: jnp.ndarray  # () int32
    old_target_size: jnp.ndarray  # () int32
    size_change_counter: jnp.ndarray  # () int32
    partition_to_constrain: jnp.ndarray  # () int32


def init_filter(num_capture, max_partitions, initial_partitions,
                num_render) -> FilterState:
    return FilterState(
        H=jnp.zeros((num_capture, max_partitions, num_render, NUM_BINS),
                    jnp.complex64),
        current_size=jnp.asarray(initial_partitions, jnp.int32),
        target_size=jnp.asarray(initial_partitions, jnp.int32),
        old_target_size=jnp.asarray(initial_partitions, jnp.int32),
        size_change_counter=jnp.asarray(0, jnp.int32),
        partition_to_constrain=jnp.asarray(0, jnp.int32),
    )


def set_size_partitions(state: FilterState, size: int, immediate: bool,
                        change_duration: int) -> FilterState:
    """AdaptiveFirFilter::SetSizePartitions (adaptive_fir_filter.cc)."""
    max_p = state.H.shape[1]
    target = min(max_p, size)
    if immediate:
        mask = (jnp.arange(max_p) >= state.current_size) & (
            jnp.arange(max_p) < target
        )
        H = jnp.where(mask[None, :, None, None], 0.0, state.H)
        return state.replace(
            H=H,
            current_size=jnp.asarray(target, jnp.int32),
            target_size=jnp.asarray(target, jnp.int32),
            old_target_size=jnp.asarray(target, jnp.int32),
            partition_to_constrain=jnp.minimum(
                state.partition_to_constrain, target - 1
            ),
            size_change_counter=jnp.asarray(0, jnp.int32),
        )
    return state.replace(
        target_size=jnp.asarray(target, jnp.int32),
        size_change_counter=jnp.asarray(change_duration, jnp.int32),
    )


def _update_size(state: FilterState, change_duration: int) -> FilterState:
    """AdaptiveFirFilter::UpdateSize."""
    max_p = state.H.shape[1]
    counter = jnp.maximum(state.size_change_counter - 1, 0)
    in_transition = state.size_change_counter > 0
    factor = counter.astype(jnp.float32) / change_duration
    interp = (
        state.old_target_size.astype(jnp.float32) * factor
        + state.target_size.astype(jnp.float32) * (1.0 - factor)
    ).astype(jnp.int32)
    new_size = jnp.where(in_transition, interp, state.target_size)
    new_old_target = jnp.where(
        in_transition, state.old_target_size, state.target_size
    )
    # Zero partitions in [old_size, new_size).
    mask = (jnp.arange(max_p) >= state.current_size) & (
        jnp.arange(max_p) < new_size
    )
    H = jnp.where(mask[None, :, None, None], 0.0, state.H)
    return state.replace(
        H=H,
        current_size=new_size,
        old_target_size=new_old_target,
        size_change_counter=counter,
        partition_to_constrain=jnp.minimum(
            state.partition_to_constrain, new_size - 1
        ),
    )


def apply_filter(state: FilterState, X_window):
    """aec3::ApplyFilter: S[cc] = sum_{p<size, rc} X[p,rc] * H[cc,p,rc].

    X_window: (P_max, C_ren, 65) complex. Returns (C_cap, 65) complex.
    """
    max_p = state.H.shape[1]
    mask = (jnp.arange(max_p) < state.current_size).astype(jnp.float32)
    Xm = X_window * mask[:, None, None]
    return jnp.einsum("prk,cprk->ck", Xm, state.H)


def adapt_filter(state: FilterState, X_window, G):
    """aec3::AdaptPartitions: H[cc,p,rc] += conj(X[p,rc]) * G[cc]."""
    max_p = state.H.shape[1]
    mask = (jnp.arange(max_p) < state.current_size).astype(jnp.float32)
    Xm = jnp.conj(X_window) * mask[:, None, None]
    return state.replace(
        H=state.H + jnp.einsum("prk,ck->cprk", Xm, G)
    )


def adapt_and_constrain_filter(state: FilterState, X_window, G,
                               impulse_response=None):
    """AdaptPartitions + Constrain fused into ONE full-H update.

    Equivalent to adapt_filter followed by constrain_filter, but the
    partition-to-constrain's post-adapt value is computed separately (two
    MXU one-hot contractions over the partition axis) so the big H tensor
    is read+written once instead of twice — H dominates the subtractor's
    HBM traffic (~27 KB/stream/filter at 48 kHz stereo, touched every
    4 ms block).
    """
    max_p = state.H.shape[1]
    mask = (jnp.arange(max_p) < state.current_size).astype(jnp.float32)
    Xm = jnp.conj(X_window) * mask[:, None, None]  # (P, C_ren, 65)

    pc = state.partition_to_constrain
    pc_oh = jnp.arange(max_p) == pc  # (P,)
    pc_f = pc_oh.astype(jnp.float32)

    # Post-adapt value of the constrained partition:
    # H'[pc] = H[pc] + conj(X[pc]) * G. Per-operand precision
    # (DEFAULT, HIGHEST) keeps the one-hot row selects exact at a third of
    # the passes of HIGHEST/HIGHEST: the 0/1 lhs is already exact in bf16
    # and the HIGHEST rhs reconstructs f32 exactly from its 3-way bf16
    # split (same trick as render_buffer.window_row). Complex operands are
    # split into real dots explicitly so the per-operand tuple reaches the
    # real dot_general lowering unchanged.
    prec = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)

    def _select(eq, oh, val):
        if jnp.iscomplexobj(val):
            return jax.lax.complex(
                jnp.einsum(eq, oh, val.real, precision=prec),
                jnp.einsum(eq, oh, val.imag, precision=prec),
            )
        return jnp.einsum(eq, oh, val, precision=prec)

    H_pc = _select("p,cprk->crk", pc_f, state.H)
    X_pc = _select("p,prk->rk", pc_f, Xm)
    # The same einsum form as the full-H adapt below, so the complex
    # multiply lowers identically (a broadcast jnp multiply rounds
    # differently and would make the fused path diverge bitwise from
    # adapt_filter + constrain_filter).
    H_pc_new = H_pc + jnp.einsum("rk,ck->crk", X_pc, G)

    h = afft.ifft_unnormalized(H_pc_new)  # (C_cap, C_ren, 128)
    h_head = h[..., :BLOCK_SIZE] * (1.0 / BLOCK_SIZE)
    h_constrained = jnp.concatenate(
        [h_head, jnp.zeros_like(h_head)], axis=-1
    )
    new_H_pc = afft.fft(h_constrained)

    # Single full-H pass: adapt every partition, then overwrite pc.
    H = jnp.where(
        pc_oh[None, :, None, None],
        new_H_pc[:, None],
        state.H + jnp.einsum("prk,ck->cprk", Xm, G),
    )

    new_ir = None
    if impulse_response is not None:
        seg = h_head[:, 0, :]  # (C_cap, 64) start with channel 0
        num_rc = h_head.shape[1]
        for rc in range(1, num_rc):
            cand = h_head[:, rc, :]
            seg = jnp.where(jnp.abs(seg) < jnp.abs(cand), cand, seg)
        ir_blocks = impulse_response.reshape(
            impulse_response.shape[0], max_p, BLOCK_SIZE
        )
        ir_blocks = jnp.where(
            pc_oh[None, :, None], seg[:, None, :], ir_blocks
        )
        new_ir = ir_blocks.reshape(impulse_response.shape)

    next_pc = jnp.where(
        pc < state.current_size - 1, pc + 1, 0
    )
    return (
        state.replace(H=H, partition_to_constrain=next_pc),
        new_ir,
    )


def constrain_filter(state: FilterState, impulse_response=None):
    """AdaptiveFirFilter::Constrain(AndUpdateImpulseResponse): one cyclic
    partition per block is forced causal in the time domain."""
    pc = state.partition_to_constrain
    max_p = state.H.shape[1]
    # Partition select/update via a one-hot over the (small) partition axis:
    # a dynamic-index gather/scatter here serializes into a per-stream loop
    # under vmap on TPU.
    pc_oh = jnp.arange(max_p) == pc  # (P,)
    H_pc = jnp.sum(
        jnp.where(pc_oh[None, :, None, None], state.H, 0), axis=1
    )  # (C_cap, C_ren, 65)
    h = afft.ifft_unnormalized(H_pc)  # (C_cap, C_ren, 128)
    h_head = h[..., :BLOCK_SIZE] * (1.0 / BLOCK_SIZE)
    h_constrained = jnp.concatenate(
        [h_head, jnp.zeros_like(h_head)], axis=-1
    )
    new_H_pc = afft.fft(h_constrained)
    H = jnp.where(
        pc_oh[None, :, None, None], new_H_pc[:, None], state.H
    )

    new_ir = None
    if impulse_response is not None:
        # ch0 replaces; other channels keep the max-|.| per tap
        # (adaptive_fir_filter.cc ConstrainAndUpdateImpulseResponse).
        seg = h_head[:, 0, :]  # (C_cap, 64) start with channel 0
        num_rc = h_head.shape[1]
        for rc in range(1, num_rc):
            cand = h_head[:, rc, :]
            seg = jnp.where(jnp.abs(seg) < jnp.abs(cand), cand, seg)
        ir_blocks = impulse_response.reshape(
            impulse_response.shape[0], max_p, BLOCK_SIZE
        )
        ir_blocks = jnp.where(
            pc_oh[None, :, None], seg[:, None, :], ir_blocks
        )
        new_ir = ir_blocks.reshape(impulse_response.shape)

    next_pc = jnp.where(
        pc < state.current_size - 1, pc + 1, 0
    )
    return state.replace(H=H, partition_to_constrain=next_pc), new_ir


def compute_frequency_response(state: FilterState):
    """aec3::ComputeFrequencyResponse: (P_max, 65) per capture channel =
    max over render channels of |H|^2 (zero beyond current size)."""
    max_p = state.H.shape[1]
    H2 = jnp.max(afft.spectrum(state.H), axis=2)  # (C_cap, P_max, 65)
    mask = (jnp.arange(max_p) < state.current_size)[None, :, None]
    return jnp.where(mask, H2, 0.0)


def compute_erl(H2):
    """aec3::ErlComputer: erl[k] = sum_p H2[p][k]."""
    return jnp.sum(H2, axis=-2)


# ----------------------------------------------------------- update gains


@struct.dataclass
class GainConfigState:
    """Interpolating filter-gain configuration (SetConfig transitions)."""

    current: jnp.ndarray  # (K,) floats
    target: jnp.ndarray  # (K,)
    old_target: jnp.ndarray  # (K,)
    counter: jnp.ndarray  # () int32


def _refined_cfg_vec(c):
    return jnp.asarray(
        [c.leakage_converged, c.leakage_diverged, c.error_floor, c.error_ceil,
         c.noise_gate], jnp.float32,
    )


def _coarse_cfg_vec(c):
    return jnp.asarray([c.rate, c.noise_gate], jnp.float32)


def init_gain_config(vec) -> GainConfigState:
    return GainConfigState(
        current=vec, target=vec, old_target=vec,
        counter=jnp.asarray(0, jnp.int32),
    )


def set_gain_config(state: GainConfigState, vec, immediate: bool,
                    change_duration: int) -> GainConfigState:
    if immediate:
        return init_gain_config(vec)
    return state.replace(
        target=vec, counter=jnp.asarray(change_duration, jnp.int32)
    )


def _update_gain_config(state: GainConfigState, change_duration: int):
    """RefinedFilterUpdateGain::UpdateCurrentConfig."""
    counter = jnp.maximum(state.counter - 1, 0)
    in_transition = state.counter > 0
    still = counter > 0
    factor = counter.astype(jnp.float32) / change_duration
    interp = state.old_target * factor + state.target * (1.0 - factor)
    current = jnp.where(
        in_transition, jnp.where(still, interp, state.target), state.current
    )
    old_target = jnp.where(
        in_transition & ~still, state.target, state.old_target
    )
    return state.replace(current=current, old_target=old_target,
                         counter=counter)


@struct.dataclass
class RefinedGainState:
    config: GainConfigState
    H_error: jnp.ndarray  # (C_cap, 65)
    poor_excitation_counter: jnp.ndarray  # () int32
    call_counter: jnp.ndarray  # () int32


@struct.dataclass
class CoarseGainState:
    config: GainConfigState
    poor_excitation_counter: jnp.ndarray  # () int32
    call_counter: jnp.ndarray  # () int32


def init_refined_gain(config: EchoCanceller3Config, num_capture):
    return RefinedGainState(
        config=init_gain_config(_refined_cfg_vec(config.filter.refined_initial)),
        H_error=jnp.full((num_capture, NUM_BINS), H_ERROR_INITIAL),
        poor_excitation_counter=jnp.asarray(
            POOR_EXCITATION_COUNTER_INITIAL, jnp.int32
        ),
        call_counter=jnp.asarray(0, jnp.int32),
    )


def init_coarse_gain(config: EchoCanceller3Config):
    return CoarseGainState(
        config=init_gain_config(_coarse_cfg_vec(config.filter.coarse_initial)),
        poor_excitation_counter=jnp.asarray(0, jnp.int32),
        call_counter=jnp.asarray(0, jnp.int32),
    )


def refined_gain_compute(
    config: EchoCanceller3Config,
    state: RefinedGainState,
    narrow_mask,  # (65,) bool — narrow_zero_mask(analyzer)
    poor_excitation,  # () bool — poor_signal_excitation(analyzer)
    X2,  # (65,)
    E_refined,  # (C, 65) complex
    E2_refined,  # (C, 65)
    E2_coarse,  # (C, 65)
    erl,  # (C, 65)
    size_partitions,  # () int32
    saturated_capture,
    disallow_leakage_diverged,  # (C,) bool
):
    """RefinedFilterUpdateGain::Compute (refined_filter_update_gain.cc:80-150).

    Returns (state, G (C, 65) complex). The analyzer inputs come
    precomputed (narrow_zero_mask / poor_signal_excitation) so the pair
    phase can hoist the analyzer out of the subtractor loop.
    """
    cc = _update_gain_config(state.config,
                             config.filter.config_change_duration_blocks)
    leakage_converged, leakage_diverged, error_floor, error_ceil, noise_gate = (
        cc.current[0], cc.current[1], cc.current[2], cc.current[3],
        cc.current[4],
    )
    call_counter = state.call_counter + 1
    poor = jnp.where(
        poor_excitation, 0, state.poor_excitation_counter
    ) + 1

    no_update = (
        (poor < size_partitions)
        | saturated_capture
        | (call_counter <= size_partitions)
    )

    sizef = size_partitions.astype(jnp.float32)
    mu = jnp.where(
        X2[None, :] >= noise_gate,
        state.H_error
        / (0.5 * state.H_error * X2[None, :] + sizef * E2_refined),
        0.0,
    )
    mu = jnp.where(narrow_mask, 0.0, mu)
    mu = jnp.where(no_update, 0.0, mu)

    H_error = state.H_error - 0.5 * mu * X2[None, :] * state.H_error
    G = (mu * E_refined).astype(jnp.complex64)
    G = jnp.where(no_update, 0.0 + 0.0j, G)

    leak = jnp.where(
        (E2_refined <= E2_coarse) | disallow_leakage_diverged[:, None],
        leakage_converged,
        leakage_diverged,
    )
    H_error = H_error + leak * erl
    H_error = jnp.clip(H_error, error_floor, error_ceil)

    return (
        state.replace(config=cc, H_error=H_error,
                      poor_excitation_counter=poor, call_counter=call_counter),
        G,
    )


def coarse_gain_compute(
    config: EchoCanceller3Config,
    state: CoarseGainState,
    narrow_mask,  # (65,) bool
    poor_excitation,  # () bool
    X2,  # (65,)
    E_coarse,  # (C, 65) complex
    size_partitions,
    saturated_capture,
):
    """CoarseFilterUpdateGain::Compute (coarse_filter_update_gain.cc:30-78)."""
    cc = _update_gain_config(state.config,
                             config.filter.config_change_duration_blocks)
    rate, noise_gate = cc.current[0], cc.current[1]
    call_counter = state.call_counter + 1
    poor = jnp.where(
        poor_excitation, 0, state.poor_excitation_counter
    ) + 1
    no_update = (
        (poor < size_partitions)
        | saturated_capture
        | (call_counter <= size_partitions)
    )
    mu = jnp.where(X2 > noise_gate, rate / jnp.maximum(X2, 1e-30), 0.0)
    mu = jnp.where(narrow_mask, 0.0, mu)
    G = (mu[None, :] * E_coarse).astype(jnp.complex64)
    G = jnp.where(no_update, 0.0 + 0.0j, G)
    return (
        state.replace(config=cc, poor_excitation_counter=poor,
                      call_counter=call_counter),
        G,
    )


# ----------------------------------------------------------- subtractor


@struct.dataclass
class SubtractorState:
    refined: FilterState
    coarse: FilterState
    refined_gain: RefinedGainState
    coarse_gain: CoarseGainState
    # FilterMisadjustmentEstimator (subtractor.h:95-128) per capture channel.
    mis_e2_acum: jnp.ndarray  # (C,)
    mis_y2_acum: jnp.ndarray  # (C,)
    mis_blocks_acum: jnp.ndarray  # (C,) int32
    mis_inv: jnp.ndarray  # (C,)
    mis_overhang: jnp.ndarray  # (C,) int32
    poor_coarse_filter_counters: jnp.ndarray  # (C,) int32
    coarse_filter_reset_hangover: jnp.ndarray  # (C,) int32
    refined_frequency_responses: jnp.ndarray  # (C, P_max, 65)
    refined_impulse_responses: jnp.ndarray  # (C, P_max*64)


def init_state(config: EchoCanceller3Config, num_render: int,
               num_capture: int) -> SubtractorState:
    p_refined = max(config.filter.refined.length_blocks,
                    config.filter.refined_initial.length_blocks)
    p_coarse = max(config.filter.coarse.length_blocks,
                   config.filter.coarse_initial.length_blocks)
    return SubtractorState(
        refined=init_filter(num_capture, p_refined,
                            config.filter.refined_initial.length_blocks,
                            num_render),
        coarse=init_filter(num_capture, p_coarse,
                           config.filter.coarse_initial.length_blocks,
                           num_render),
        refined_gain=init_refined_gain(config, num_capture),
        coarse_gain=init_coarse_gain(config),
        mis_e2_acum=jnp.zeros((num_capture,)),
        mis_y2_acum=jnp.zeros((num_capture,)),
        mis_blocks_acum=jnp.zeros((num_capture,), jnp.int32),
        mis_inv=jnp.zeros((num_capture,)),
        mis_overhang=jnp.zeros((num_capture,), jnp.int32),
        poor_coarse_filter_counters=jnp.zeros((num_capture,), jnp.int32),
        coarse_filter_reset_hangover=jnp.zeros((num_capture,), jnp.int32),
        refined_frequency_responses=jnp.zeros((num_capture, p_refined,
                                               NUM_BINS)),
        refined_impulse_responses=jnp.zeros(
            (num_capture, p_refined * BLOCK_SIZE)
        ),
    )


def exit_initial_state(config: EchoCanceller3Config,
                       state: SubtractorState) -> SubtractorState:
    """Subtractor::ExitInitialState (subtractor.cc:176-186)."""
    d = config.filter.config_change_duration_blocks
    return state.replace(
        refined_gain=state.refined_gain.replace(
            config=set_gain_config(
                state.refined_gain.config,
                _refined_cfg_vec(config.filter.refined), False, d,
            )
        ),
        coarse_gain=state.coarse_gain.replace(
            config=set_gain_config(
                state.coarse_gain.config,
                _coarse_cfg_vec(config.filter.coarse), False, d,
            )
        ),
        refined=set_size_partitions(
            state.refined, config.filter.refined.length_blocks, False, d
        ),
        coarse=set_size_partitions(
            state.coarse, config.filter.coarse.length_blocks, False, d
        ),
    )


def handle_echo_path_change(config: EchoCanceller3Config,
                            state: SubtractorState,
                            delay_change: bool,
                            gain_change: bool) -> SubtractorState:
    """Subtractor::HandleEchoPathChange (subtractor.cc:146-174), with
    traced booleans selecting the reset."""
    d = config.filter.config_change_duration_blocks

    def full_reset(s: SubtractorState) -> SubtractorState:
        refined = set_size_partitions(
            s.refined.replace(H=jnp.zeros_like(s.refined.H)),
            config.filter.refined_initial.length_blocks, True, d,
        )
        coarse = set_size_partitions(
            s.coarse.replace(H=jnp.zeros_like(s.coarse.H)),
            config.filter.coarse_initial.length_blocks, True, d,
        )
        return s.replace(
            refined=refined,
            coarse=coarse,
            refined_gain=s.refined_gain.replace(
                H_error=jnp.full_like(s.refined_gain.H_error, H_ERROR_INITIAL),
                poor_excitation_counter=jnp.asarray(
                    POOR_EXCITATION_COUNTER_INITIAL, jnp.int32
                ),
                call_counter=jnp.asarray(0, jnp.int32),
                config=init_gain_config(
                    _refined_cfg_vec(config.filter.refined_initial)
                ),
            ),
            coarse_gain=CoarseGainState(
                config=init_gain_config(
                    _coarse_cfg_vec(config.filter.coarse_initial)
                ),
                poor_excitation_counter=jnp.asarray(0, jnp.int32),
                call_counter=jnp.asarray(0, jnp.int32),
            ),
        )

    reset = full_reset(state)
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(delay_change, a, b), reset, state
    )
    # gain_change only refreshes the refined-gain excitation counters when
    # there is no... (refined_filter_update_gain.cc:57-66: poor-excitation
    # reset happens when !gain_change). Delay changes already reset above.
    return state


def _prediction_error(S, y):
    """PredictionError (subtractor.cc:41-57). S: (C,65)c, y: (C,64)."""
    tmp = afft.ifft_unnormalized(S)  # (C, 128)
    s = tmp[..., BLOCK_SIZE:] * (1.0 / BLOCK_SIZE)
    e = y - s
    return e, s


def process(
    config: EchoCanceller3Config,
    state: SubtractorState,
    X_window_refined,  # (P_ref_max, C_ren, 65) complex fft window
    X2_refined,  # (65,) spectral sum over refined partitions
    X2_coarse,  # (65,)
    y,  # (C_cap, 64) capture band 0
    analyzer: RenderSignalAnalyzerState,
    saturated_capture,  # () bool
):
    """Subtractor::Process (subtractor.cc:188-321).

    Returns (state, outputs dict).
    """
    return process_masked(
        config, state, X_window_refined, X2_refined, X2_coarse, y,
        narrow_zero_mask(analyzer), poor_signal_excitation(analyzer),
        saturated_capture,
    )


def process_masked(
    config: EchoCanceller3Config,
    state: SubtractorState,
    X_window_refined,  # (P_ref_max, C_ren, 65) complex fft window
    X2_refined,  # (65,) spectral sum over refined partitions
    X2_coarse,  # (65,)
    y,  # (C_cap, 64) capture band 0
    narrow_mask,  # (65,) bool — narrow_zero_mask(analyzer)
    poor_excitation,  # () bool — poor_signal_excitation(analyzer)
    saturated_capture,  # () bool
):
    """Subtractor::Process with the analyzer inputs precomputed (the form
    the pair phase / megakernel consume). ``X_window_refined`` must carry
    at least max(P_refined, P_coarse) rows (each filter slices its own
    partition count, as the reference's per-filter render-buffer fetches
    do — supports coarse filters longer than refined,
    subtractor_unittest.cc:253)."""
    # Filter outputs.
    S_refined = apply_filter(
        state.refined, X_window_refined[: state.refined.H.shape[1]]
    )
    e_refined, s_refined = _prediction_error(S_refined, y)
    S_coarse = apply_filter(
        state.coarse, X_window_refined[: state.coarse.H.shape[1]]
    )
    e_coarse, s_coarse = _prediction_error(S_coarse, y)

    y2 = jnp.sum(y * y, axis=-1)
    e2_refined = jnp.sum(e_refined * e_refined, axis=-1)
    e2_coarse = jnp.sum(e_coarse * e_coarse, axis=-1)
    s2_refined = jnp.sum(s_refined * s_refined, axis=-1)
    s_refined_max_abs = jnp.max(jnp.abs(s_refined), axis=-1)
    s_coarse_max_abs = jnp.max(jnp.abs(s_coarse), axis=-1)

    # Filter misadjustment estimation (subtractor.cc:324-357).
    e2a = state.mis_e2_acum + e2_refined
    y2a = state.mis_y2_acum + y2
    nblk = state.mis_blocks_acum + 1
    window_done = nblk == 4
    active = y2a > 4 * 200.0**2 * BLOCK_SIZE
    update_val = e2a / jnp.maximum(y2a, 1e-30)
    overhang = jnp.where(
        window_done & active & (e2a > 4 * 7500.0**2 * BLOCK_SIZE),
        4,
        jnp.maximum(state.mis_overhang - jnp.where(window_done & active, 1, 0),
                    0),
    )
    take = window_done & active & (
        (update_val < state.mis_inv) | (overhang > 0)
    )
    mis_inv = jnp.where(
        take, state.mis_inv + 0.1 * (update_val - state.mis_inv),
        state.mis_inv,
    )
    e2a = jnp.where(window_done, 0.0, e2a)
    y2a = jnp.where(window_done, 0.0, y2a)
    nblk = jnp.where(window_done, 0, nblk)

    adjust = mis_inv > 10.0  # (C,)
    scale = jnp.where(adjust, 2.0 / jnp.sqrt(jnp.maximum(mis_inv, 1e-10)), 1.0)

    refined_H = state.refined.H * scale[:, None, None, None]
    impulse = state.refined_impulse_responses * scale[:, None]
    s_refined = s_refined * scale[:, None]
    e_refined = y - s_refined
    # Reset the estimator where adjustment fired.
    mis_inv = jnp.where(adjust, 0.0, mis_inv)
    overhang = jnp.where(adjust, 0, overhang)
    e2a = jnp.where(adjust, 0.0, e2a)
    y2a = jnp.where(adjust, 0.0, y2a)
    nblk = jnp.where(adjust, 0, nblk)

    state = state.replace(
        refined=state.refined.replace(H=refined_H),
        refined_impulse_responses=impulse,
        mis_e2_acum=e2a, mis_y2_acum=y2a, mis_blocks_acum=nblk,
        mis_inv=mis_inv, mis_overhang=overhang,
    )

    # Error FFTs and spectra.
    E_refined = afft.zero_padded_fft(e_refined, "hanning")
    E_coarse = afft.zero_padded_fft(e_coarse, "hanning")
    E2_refined = afft.spectrum(E_refined)
    E2_coarse = afft.spectrum(E_coarse)

    # Refined filter update.
    disallow = (
        (state.coarse_filter_reset_hangover > 0)
    )
    erl = compute_erl(state.refined_frequency_responses)
    new_rg, G_refined = refined_gain_compute(
        config, state.refined_gain, narrow_mask, poor_excitation, X2_refined,
        E_refined, E2_refined, E2_coarse, erl,
        state.refined.current_size, saturated_capture, disallow,
    )
    # Adjusted channels get zero gain (subtractor.cc:268-273).
    G_refined = jnp.where(adjust[:, None], 0.0 + 0.0j, G_refined)

    refined = _update_size(state.refined,
                           config.filter.config_change_duration_blocks)
    refined, impulse = adapt_and_constrain_filter(
        refined, X_window_refined[: state.refined.H.shape[1]], G_refined,
        state.refined_impulse_responses,
    )
    freq_resp = compute_frequency_response(refined)

    # Coarse filter update (per capture channel, subtractor.cc:282-311).
    poor_counters = jnp.where(
        e2_refined < e2_coarse, state.poor_coarse_filter_counters + 1, 0
    )
    reset_coarse = poor_counters >= 5  # (C,)
    poor_counters = jnp.where(reset_coarse, 0, poor_counters)

    coarse = _update_size(state.coarse,
                          config.filter.config_change_duration_blocks)
    # SetFilter from refined on reset (subtractor.cc:289-301): copy
    # min(sizes) partitions, zero the rest (AdaptiveFirFilter::SetFilter).
    p_c = coarse.H.shape[1]
    p_r = refined.H.shape[1]
    refined_as_coarse = (
        refined.H[:, :p_c] if p_c <= p_r
        else jnp.concatenate(
            [refined.H,
             jnp.zeros(refined.H.shape[:1] + (p_c - p_r,)
                       + refined.H.shape[2:], refined.H.dtype)], axis=1)
    )
    coarse_H = jnp.where(
        reset_coarse[:, None, None, None], refined_as_coarse, coarse.H
    )
    coarse = coarse.replace(H=coarse_H)
    hangover = jnp.where(
        reset_coarse,
        config.filter.coarse_reset_hangover_blocks,
        jnp.maximum(state.coarse_filter_reset_hangover - 1, 0),
    )
    E_for_coarse = jnp.where(reset_coarse[:, None], E_refined, E_coarse)
    new_cg, G_coarse = coarse_gain_compute(
        config, state.coarse_gain, narrow_mask, poor_excitation, X2_coarse,
        E_for_coarse, coarse.current_size, saturated_capture,
    )
    coarse, _ = adapt_and_constrain_filter(
        coarse, X_window_refined[:p_c], G_coarse
    )

    state = state.replace(
        refined=refined,
        coarse=coarse,
        refined_gain=new_rg,
        coarse_gain=new_cg,
        poor_coarse_filter_counters=poor_counters,
        coarse_filter_reset_hangover=hangover,
        refined_frequency_responses=freq_resp,
        refined_impulse_responses=impulse,
    )

    outputs = dict(
        s_refined=s_refined, s_coarse=s_coarse,
        e_refined=e_refined, e_coarse=e_coarse,
        E_refined=E_refined, E2_refined=E2_refined, E2_coarse=E2_coarse,
        y2=y2, e2_refined=e2_refined, e2_coarse=e2_coarse,
        s2_refined=s2_refined,
        s2_coarse=jnp.sum(s_coarse * s_coarse, axis=-1),
        s_refined_max_abs=s_refined_max_abs,
        s_coarse_max_abs=s_coarse_max_abs,
    )
    return state, outputs


def process_pair(
    config: EchoCanceller3Config,
    state: SubtractorState,
    X_windows,  # (nb, P_ref_max, C_ren, 65) complex — per-block fft windows
    spec_wins,  # (nb, P_ref_max, C_ren, 65) — per-block spectra window rows
    ys,  # (nb, C_cap, 64)
    narrow_masks,  # (nb, 65) bool
    poor_excitations,  # (nb,) bool
    delay_changes,  # (nb,) bool
    gain_changes,  # (nb,) bool
    transitions,  # (nb,) bool — exit_initial_state before the block
    saturated_capture,  # () bool
):
    """All subtractor work of one frame pair's 2-3 capture blocks, given
    pre-hoisted per-block inputs (the delay stack and render-signal
    analyzer run ahead of the block loop; docs/design/
    subtractor_megakernel.md). The X2 spectral sums are formed HERE from
    `spec_sums` because the partition counts evolve across the blocks
    (AdaptiveFirFilter::UpdateSize per block).

    This is the unit the Pallas pair-megakernel replaces; this XLA form
    is its semantic reference. Returns (state, [outputs dict per block]).
    """
    nb = len(ys)
    pidx = jnp.arange(spec_wins.shape[1])
    outs = []
    for k in range(nb):
        # Reference per-block order (echo_remover.cc:317-348):
        # HandleEchoPathChange first, then the initial-state transition.
        state = handle_echo_path_change(
            config, state, delay_changes[k], gain_changes[k]
        )
        state = jax.tree_util.tree_map(
            lambda a, b: a if a is b else jnp.where(transitions[k], a, b),
            exit_initial_state(config, state), state,
        )
        # Same masked (p, c) reduction as echo_remover's inline form so the
        # float summation order (and therefore the bits) match the
        # single-block path exactly.
        X2_refined = jnp.sum(
            jnp.where((pidx < state.refined.current_size)[:, None, None],
                      spec_wins[k], 0.0),
            axis=(0, 1),
        )
        X2_coarse = jnp.sum(
            jnp.where((pidx < state.coarse.current_size)[:, None, None],
                      spec_wins[k], 0.0),
            axis=(0, 1),
        )
        state, out = process_masked(
            config, state, X_windows[k], X2_refined, X2_coarse, ys[k],
            narrow_masks[k], poor_excitations[k], saturated_capture,
        )
        # Per-block snapshots of the filter-analysis state the downstream
        # aec-state update consumes (it runs AFTER the whole pair in the
        # phase-split flow but must see block k's post-adapt values).
        out["refined_frequency_responses"] = state.refined_frequency_responses
        out["refined_impulse_responses"] = state.refined_impulse_responses
        out["refined_current_size"] = state.refined.current_size
        outs.append(out)
    return state, outs
