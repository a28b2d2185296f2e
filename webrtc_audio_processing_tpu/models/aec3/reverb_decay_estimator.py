"""Adaptive reverb decay estimation for AEC3.

Reference: aec3/reverb_decay_estimator.{h,cc} (driven by
reverb_model_estimator.cc:43-68). Active only when
config.ep_strength.default_len < 0 (the adaptive-decay opt-in); estimates
the exponential tail decay of the linear filter's impulse response with a
linear regression over log2 energies, after splitting off the early
reflections.

TPU re-design notes: the reference walks one 64-coefficient filter block
per capture block. The per-coefficient Accumulate loops collapse to closed
forms — the late-reverb regressor's 64 updates are a single dot product,
and the early-reverb estimator's overlapping-section updates become a
masked rank-1 add over the section axis. All state is vectorized over
capture channels; only channel 0 is exposed (reverb_model_estimator.h:52).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

BLOCK = 64
EARLY_MIN_BLOCKS = 3  # kEarlyReverbMinSizeBlocks
BLOCKS_PER_SECTION = 6
# kEarlyReverbFirstPointAtLinearRegressors = -0.5 * 6 * 64 + 0.5
FIRST_POINT = -0.5 * BLOCKS_PER_SECTION * BLOCK + 0.5
NUM_SECTIONS_TO_ANALYZE = 9


def _log2f(x):
    """FastApproxLog2f (aec3_common.h): exponent + linearized mantissa."""
    x = jnp.maximum(jnp.asarray(x, jnp.float32), 1e-30)
    bits = x.view(jnp.int32)
    exp = (bits >> 23) - 127
    mant = 1.0 + (bits & 0x7FFFFF).astype(jnp.float32) / 8388608.0
    return exp.astype(jnp.float32) + mant - 1.0


def _sym_sum(n):
    """SymmetricArithmetricSum: N(N^2-1)/12."""
    return n * (n * n - 1.0) / 12.0


@struct.dataclass
class ReverbDecayState:
    """ReverbDecayEstimator members (.h:50-120), leading capture axis C."""

    decay: jnp.ndarray  # (C,)
    tail_gain: jnp.ndarray  # (C,)
    smoothing_constant: jnp.ndarray  # (C,)
    block_to_analyze: jnp.ndarray  # (C,) int32
    region_candidate_size: jnp.ndarray  # (C,) int32
    region_identified: jnp.ndarray  # (C,) bool
    late_reverb_start: jnp.ndarray  # (C,) int32
    late_reverb_end: jnp.ndarray  # (C,) int32
    previous_gains: jnp.ndarray  # (C, L)
    # LateReverbLinearRegressor.
    lr_nz: jnp.ndarray  # (C,)
    lr_nn: jnp.ndarray  # (C,)
    lr_count: jnp.ndarray  # (C,)
    lr_N: jnp.ndarray  # (C,) int32
    lr_n: jnp.ndarray  # (C,) int32
    # EarlyReverbLengthEstimator.
    er_numerators: jnp.ndarray  # (C, S)
    er_numerators_smooth: jnp.ndarray  # (C, S)
    er_block_counter: jnp.ndarray  # (C,) int32
    er_n_sections: jnp.ndarray  # (C,) int32


def num_early_sections(config) -> int:
    """numerators_ size: (length_blocks - 3) - kBlocksPerSection (.cc:316)."""
    return max(
        config.filter.refined.length_blocks - EARLY_MIN_BLOCKS
        - BLOCKS_PER_SECTION,
        1,
    )


def init_state(config, num_capture: int) -> ReverbDecayState:
    c = num_capture
    L = config.filter.refined.length_blocks
    s = num_early_sections(config)
    return ReverbDecayState(
        decay=jnp.full((c,), abs(config.ep_strength.default_len)),
        tail_gain=jnp.zeros((c,)),
        smoothing_constant=jnp.zeros((c,)),
        block_to_analyze=jnp.zeros((c,), jnp.int32),
        region_candidate_size=jnp.zeros((c,), jnp.int32),
        region_identified=jnp.zeros((c,), bool),
        late_reverb_start=jnp.full((c,), EARLY_MIN_BLOCKS, jnp.int32),
        late_reverb_end=jnp.full((c,), EARLY_MIN_BLOCKS, jnp.int32),
        previous_gains=jnp.zeros((c, L)),
        lr_nz=jnp.zeros((c,)),
        lr_nn=jnp.zeros((c,)),
        lr_count=jnp.zeros((c,)),
        lr_N=jnp.zeros((c,), jnp.int32),
        lr_n=jnp.zeros((c,), jnp.int32),
        er_numerators=jnp.zeros((c, s)),
        er_numerators_smooth=jnp.zeros((c, s)),
        er_block_counter=jnp.zeros((c,), jnp.int32),
        er_n_sections=jnp.zeros((c,), jnp.int32),
    )


def _reset_estimation(st: ReverbDecayState) -> ReverbDecayState:
    """ResetDecayEstimation (.cc:151-161): everything but decay_/tail_gain_."""
    z_i = jnp.zeros_like(st.block_to_analyze)
    return st.replace(
        smoothing_constant=jnp.zeros_like(st.smoothing_constant),
        block_to_analyze=z_i,
        region_candidate_size=z_i,
        region_identified=jnp.zeros_like(st.region_identified),
        late_reverb_start=z_i,
        late_reverb_end=z_i,
        lr_nz=jnp.zeros_like(st.lr_nz),
        lr_nn=jnp.zeros_like(st.lr_nn),
        lr_count=jnp.zeros_like(st.lr_count),
        lr_N=z_i,
        lr_n=z_i,
        er_numerators=jnp.zeros_like(st.er_numerators),
        er_block_counter=z_i,
        er_n_sections=z_i,
    )


def _early_estimate(st: ReverbDecayState):
    """EarlyReverbLengthEstimator::Estimate (.cc:364-400): per channel."""
    n_sec = st.er_n_sections  # (C,)
    S = st.er_numerators_smooth.shape[1]
    nn = _sym_sum(float(BLOCKS_PER_SECTION * BLOCK))
    numerator_11 = 0.13750352374993502 * nn / BLOCK
    numerator_08 = -0.32192809488736229 * nn / BLOCK

    idx = jnp.arange(S)[None, :]
    tail_mask = (idx >= NUM_SECTIONS_TO_ANALYZE) & (idx < n_sec[:, None])
    min_tail = jnp.min(
        jnp.where(tail_mask, st.er_numerators_smooth, jnp.inf), axis=1
    )

    head = idx < min(NUM_SECTIONS_TO_ANALYZE, S)
    hit = head & (
        (st.er_numerators_smooth > numerator_11)
        | (
            (st.er_numerators_smooth < numerator_08)
            & (st.er_numerators_smooth < 0.9 * min_tail[:, None])
        )
    )
    # Last hit index within the analyzed head.
    k = jnp.max(jnp.where(hit, idx, 0), axis=1)
    size_m1 = jnp.where(jnp.any(hit, axis=1), k, 0)
    est = jnp.where(size_m1 == 0, 0, size_m1 + 1).astype(jnp.int32)
    return jnp.where(n_sec < NUM_SECTIONS_TO_ANALYZE, 0, est)


def _analyze_filter(config, st: ReverbDecayState, h):
    """AnalyzeFilter (.cc:228-272) for the per-channel current block."""
    C, L = st.previous_gains.shape
    bta = jnp.clip(st.block_to_analyze, 0, L - 1)
    # Gather the 64-coefficient block per channel.
    offs = bta[:, None] * BLOCK + jnp.arange(BLOCK)[None, :]
    h2 = jnp.take_along_axis(h, offs, axis=1) ** 2  # (C, 64)

    # AnalyzeBlockGain.
    gain = jnp.maximum(jnp.mean(h2, axis=1), 1e-32)
    prev = jnp.take_along_axis(st.previous_gains, bta[:, None], axis=1)[:, 0]
    adapting = (prev > 1.1 * gain) | (prev < 0.9 * gain)
    decaying = gain > st.tail_gain
    prev_gains = jnp.where(
        jnp.arange(L)[None, :] == bta[:, None], gain[:, None],
        st.previous_gains,
    )

    identified = st.region_identified | adapting | ~decaying
    cand = st.region_candidate_size + jnp.where(identified, 0, 1)

    # Accumulation region.
    in_late_window = st.block_to_analyze <= st.late_reverb_end
    in_late = in_late_window & (st.block_to_analyze >= st.late_reverb_start)

    v = _log2f(h2 + 1e-10)  # (C, 64)
    sum_v = jnp.sum(v, axis=1)

    # LateReverbLinearRegressor::Accumulate x64 as one dot product.
    j = jnp.arange(BLOCK, dtype=jnp.float32)[None, :]
    nz_inc = jnp.sum((st.lr_count[:, None] + j) * v, axis=1)
    lr_nz = jnp.where(in_late, st.lr_nz + nz_inc, st.lr_nz)
    lr_count = jnp.where(in_late, st.lr_count + BLOCK, st.lr_count)
    lr_n = jnp.where(in_late, st.lr_n + BLOCK, st.lr_n)

    # EarlyReverbLengthEstimator::Accumulate x64: section s in
    # [bc-5, bc] receives sum_j v_j*(j + FIRST_POINT + 64*(bc-s)).
    S = st.er_numerators.shape[1]
    bc = st.er_block_counter
    sec = jnp.arange(S)[None, :]
    sec_mask = (sec >= jnp.maximum(bc - BLOCKS_PER_SECTION + 1, 0)[:, None]) \
        & (sec <= jnp.minimum(bc, S - 1)[:, None])
    A = jnp.sum(v * (j + FIRST_POINT), axis=1)
    inc = A[:, None] + (bc[:, None] - sec).astype(jnp.float32) * (
        BLOCK * sum_v[:, None]
    )
    numer = jnp.where(
        in_late_window[:, None] & sec_mask, st.er_numerators + inc,
        st.er_numerators,
    )
    # End-of-block smoothing into numerators_smooth (.cc:349-358).
    close_sec = bc - (BLOCKS_PER_SECTION - 1)
    do_close = in_late_window & (close_sec >= 0) & (close_sec < S)
    cs = jnp.clip(close_sec, 0, S - 1)
    cur_n = jnp.take_along_axis(numer, cs[:, None], axis=1)[:, 0]
    cur_s = jnp.take_along_axis(st.er_numerators_smooth, cs[:, None],
                                axis=1)[:, 0]
    new_s = cur_s + st.smoothing_constant * (cur_n - cur_s)
    smooth = jnp.where(
        do_close[:, None] & (sec == cs[:, None]), new_s[:, None],
        st.er_numerators_smooth,
    )
    n_sections = jnp.where(do_close, cs + 1, st.er_n_sections)
    bc_new = jnp.where(in_late_window, bc + 1, bc)

    return st.replace(
        previous_gains=prev_gains,
        region_identified=identified,
        region_candidate_size=cand,
        lr_nz=lr_nz,
        lr_count=lr_count,
        lr_n=lr_n,
        er_numerators=numer,
        er_numerators_smooth=smooth,
        er_block_counter=bc_new,
        er_n_sections=n_sections,
        block_to_analyze=st.block_to_analyze + 1,
    )


def _estimate_decay(config, st: ReverbDecayState, h, peak_block):
    """EstimateDecay (.cc:163-226) for channels whose analysis completed."""
    C, L = st.previous_gains.shape
    new_bta = jnp.minimum(peak_block + EARLY_MIN_BLOCKS, L)
    safe_bta = jnp.clip(new_bta, 0, L - 1)

    def block_energy_avg(block_idx):
        offs = block_idx[:, None] * BLOCK + jnp.arange(BLOCK)[None, :]
        return jnp.mean(jnp.take_along_axis(h, offs, axis=1) ** 2, axis=1)

    first_gain = block_energy_avg(safe_bta)
    tail_gain = block_energy_avg(jnp.full((C,), L - 1, jnp.int32))
    offs = jnp.clip(peak_block, 0, L - 1)[:, None] * BLOCK + jnp.arange(
        BLOCK
    )[None, :]
    peak_energy = jnp.max(jnp.take_along_axis(h, offs, axis=1) ** 2, axis=1)

    sufficient = first_gain > 4.0 * tail_gain
    valid_filter = (first_gain > 2.0 * tail_gain) & (peak_energy < 100.0)

    size_early = _early_estimate(st)
    size_late = jnp.maximum(st.region_candidate_size - size_early, 0)

    # Late-reverb decay from the linear regression slope.
    available = (st.lr_n == st.lr_N) & (st.lr_N != 0)
    slope = st.lr_nz / jnp.maximum(st.lr_nn, 1e-30)
    new_decay = 2.0 ** (slope * BLOCK)
    new_decay = jnp.maximum(0.97 * st.decay, new_decay)
    new_decay = jnp.clip(new_decay, 0.02, 0.95)  # kMinDecay / kMaxDecay
    do_decay = (size_late >= 5) & valid_filter & available
    decay = jnp.where(
        do_decay, st.decay + st.smoothing_constant * (new_decay - st.decay),
        st.decay,
    )

    # Regressor reset for the next pass.
    enough_late = size_late >= 5
    N = jnp.where(enough_late, size_late * BLOCK, 0)
    nn = jnp.where(enough_late, _sym_sum(N.astype(jnp.float32)), 0.0)
    count = jnp.where(N > 0, -N.astype(jnp.float32) * 0.5 + 0.5, 0.0)
    late_start = jnp.where(
        enough_late, peak_block + EARLY_MIN_BLOCKS + size_early, 0
    )
    late_end = jnp.where(
        enough_late, new_bta + st.region_candidate_size - 1, 0
    )

    return st.replace(
        decay=decay,
        tail_gain=tail_gain,
        block_to_analyze=new_bta,
        region_identified=~(valid_filter & sufficient),
        region_candidate_size=jnp.zeros_like(st.region_candidate_size),
        smoothing_constant=jnp.zeros_like(st.smoothing_constant),
        late_reverb_start=late_start.astype(jnp.int32),
        late_reverb_end=late_end.astype(jnp.int32),
        lr_nz=jnp.zeros_like(st.lr_nz),
        lr_nn=nn,
        lr_count=count,
        lr_N=N.astype(jnp.int32),
        lr_n=jnp.zeros_like(st.lr_n),
        er_numerators=jnp.zeros_like(st.er_numerators),
        er_block_counter=jnp.zeros_like(st.er_block_counter),
        # n_sections_ intentionally persists across EarlyReverb resets
        # (.cc:327-331 Reset clears counters but not n_sections_).
    )


def update(config, st: ReverbDecayState, h_adjusted, quality, quality_valid,
           filter_delay_blocks, usable, stationary, filter_size_blocks):
    """ReverbDecayEstimator::Update (.cc:107-149), all channels at once.

    h_adjusted: (C, L*64) high-passed impulse responses (filter analyzer's
    GetAdjustedFilters); quality: (C,) fullband instantaneous quality with
    quality_valid (C,); filter_size_blocks: () current filter length.
    """
    L = config.filter.refined.length_blocks

    feasible = (
        (filter_delay_blocks <= L - EARLY_MIN_BLOCKS - 1)
        & (filter_size_blocks == L)
        & (filter_delay_blocks > 0)
        & usable
    )
    # stationary_signal: plain return, no state change at all.
    run = ~stationary
    need_reset = run & ~feasible

    st_reset = _reset_estimation(st)
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(need_reset, a, b), st_reset, st
    )

    active = run & feasible
    smoothing = jnp.maximum(
        jnp.where(quality_valid, quality * 0.2, 0.0), st.smoothing_constant
    )
    st = st.replace(
        smoothing_constant=jnp.where(active, smoothing, st.smoothing_constant)
    )
    live = active & (smoothing != 0.0)

    analyzing = st.block_to_analyze < L
    st_an = _analyze_filter(config, st, h_adjusted)
    st_es = _estimate_decay(config, st, h_adjusted, filter_delay_blocks)
    st_new = jax.tree_util.tree_map(
        lambda a, b: jnp.where(analyzing, a, b), st_an, st_es
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(live, a, b), st_new, st
    )


def decay_value(config, st: ReverbDecayState | None, mild):
    """ReverbDecayEstimator::Decay (.h:37-43): adaptive ignores `mild`."""
    if config.ep_strength.default_len < 0 and st is not None:
        return st.decay[0]
    return jnp.where(
        mild,
        abs(config.ep_strength.nearend_len),
        abs(config.ep_strength.default_len),
    )
