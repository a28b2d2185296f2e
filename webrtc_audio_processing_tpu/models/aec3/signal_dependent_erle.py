"""Signal-dependent ERLE estimator for AEC3.

Reference: aec3/signal_dependent_erle_estimator.{h,cc}. Created only when
config.erle.num_sections > 1 (erle_estimator.cc:37-41); refines the average
subband ERLE with per-(active-section-count, subband) correction factors so
that direct-path-dominated signals get a different ERLE than reverberant
ones. All geometry (section boundaries, subband map) is static Python.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

NUM_BINS = 65
SUBBANDS = 6
# kBandBoundaries (signal_dependent_erle_estimator.cc:35-36).
BAND_BOUNDARIES = (1, 8, 16, 24, 32, 48, 65)
X2_BAND_ENERGY_THRESHOLD = 44015068.0
SMOOTH_DECREASE = 0.1
SMOOTH_INCREASE = SMOOTH_DECREASE / 2.0
NUM_UPDATE_THR = 50


def form_subband_map():
    """FormSubbandMap (:38-49): bin -> subband index."""
    out = []
    sb = 1
    for k in range(NUM_BINS):
        if k >= BAND_BOUNDARIES[sb]:
            sb += 1
        out.append(sb - 1)
    return tuple(out)


def define_section_sizes(delay_headroom_blocks: int, num_blocks: int,
                         num_sections: int):
    """DefineFilterSectionSizes (:56-82): doubling sections then even split."""
    remaining_blocks = num_blocks - delay_headroom_blocks
    sizes = [0] * num_sections
    remaining_sections = num_sections
    est = 2
    idx = 0
    while remaining_sections > 1 and remaining_blocks > est * remaining_sections:
        sizes[idx] = est
        remaining_blocks -= est
        remaining_sections -= 1
        est *= 2
        idx += 1
    last = remaining_blocks // remaining_sections
    for j in range(idx, num_sections):
        sizes[j] = last
    sizes[num_sections - 1] += remaining_blocks - last * remaining_sections
    return sizes


def section_boundaries(delay_headroom_blocks: int, num_blocks: int,
                       num_sections: int):
    """SetSectionsBoundaries (:88-118): per-section block limits."""
    bounds = [0] * (num_sections + 1)
    if num_sections == 1:
        return [0, num_blocks]
    sizes = define_section_sizes(delay_headroom_blocks, num_blocks,
                                 num_sections)
    idx = 0
    cur = 0
    bounds[0] = delay_headroom_blocks
    for k in range(delay_headroom_blocks, num_blocks):
        cur += 1
        if cur >= sizes[idx]:
            idx += 1
            if idx == len(sizes):
                break
            bounds[idx] = k + 1
            cur = 0
    bounds[len(sizes)] = num_blocks
    return bounds


def max_erle_subbands(config):
    """SetMaxErleSubbands (:122-128): max_l below bin 32's subband."""
    submap = form_subband_map()
    limit = submap[32]  # band_to_subband_[kFftLengthBy2 / 2]
    return jnp.asarray(
        [config.erle.max_l] * limit + [config.erle.max_h] * (SUBBANDS - limit)
    )


@struct.dataclass
class SignalDependentErleState:
    """Adaptive members of SignalDependentErleEstimator (.h:95-105)."""

    erle: jnp.ndarray  # (C, 65)
    erle_onset_compensated: jnp.ndarray  # (C, 65)
    erle_estimators: jnp.ndarray  # (C, S, 6)
    erle_ref: jnp.ndarray  # (C, 6)
    correction_factors: jnp.ndarray  # (C, S, 6)
    num_updates: jnp.ndarray  # (C, 6) int32
    n_active_sections: jnp.ndarray  # (C, 65) int32


def init_state(config, num_capture: int) -> SignalDependentErleState:
    mn = config.erle.min
    c = num_capture
    s = config.erle.num_sections
    return SignalDependentErleState(
        erle=jnp.full((c, NUM_BINS), mn),
        erle_onset_compensated=jnp.full((c, NUM_BINS), mn),
        erle_estimators=jnp.full((c, s, SUBBANDS), mn),
        erle_ref=jnp.full((c, SUBBANDS), mn),
        correction_factors=jnp.ones((c, s, SUBBANDS)),
        num_updates=jnp.zeros((c, SUBBANDS), jnp.int32),
        n_active_sections=jnp.zeros((c, NUM_BINS), jnp.int32),
    )


def _subband_sums(x):
    """Sum of a (..., 65) spectrum over the 6 subband bin ranges."""
    return jnp.stack(
        [
            jnp.sum(x[..., BAND_BOUNDARIES[s]:BAND_BOUNDARIES[s + 1]], axis=-1)
            for s in range(SUBBANDS)
        ],
        axis=-1,
    )


def _active_sections(config, st, X2_by_delay, frequency_responses):
    """ComputeNumberOfActiveFilterSections (:243-254): per-bin count of
    filter sections holding 90% of the echo-estimate energy.

    X2_by_delay: (num_blocks, 65) render spectra averaged over render
    channels, delay == block index; frequency_responses: (C, P, 65).
    """
    num_blocks = config.filter.refined.length_blocks
    headroom = config.delay.delay_headroom_samples // 64
    bounds = section_boundaries(headroom, num_blocks,
                                config.erle.num_sections)
    p_max = frequency_responses.shape[1]

    # ComputeEchoEstimatePerFilterSection (:345-390): per-section products
    # X2_section * H2_section, then cumulative over sections.
    x2_secs, h2_secs = [], []
    for s in range(config.erle.num_sections):
        lo = bounds[s]
        hi = min(bounds[s + 1], p_max)
        x2_secs.append(jnp.sum(X2_by_delay[lo:hi], axis=0))
        h2_secs.append(jnp.sum(frequency_responses[:, lo:hi], axis=1))
    X2_sec = jnp.stack(x2_secs)  # (S, 65)
    H2_sec = jnp.stack(h2_secs, axis=1)  # (C, S, 65)
    S2 = jnp.cumsum(X2_sec[None] * H2_sec, axis=1)  # (C, S, 65)

    # ComputeActiveFilterSections (:392-404): S2 is non-decreasing over
    # sections, so the backwards scan reduces to the first index >= target.
    target = 0.9 * S2[:, -1:, :]
    n_active = jnp.argmax(S2 >= target, axis=1).astype(jnp.int32)
    return st.replace(n_active_sections=n_active), S2


def _correction_factors(config, st, X2, Y2, E2, converged):
    """UpdateCorrectionFactors (:256-343), vectorized over capture channels
    with one-hot scatters at the per-subband active-section index."""
    mn = config.erle.min
    max_sub = max_erle_subbands(config)[None]  # (1, 6)
    num_sections = config.erle.num_sections

    X2_sub = _subband_sums(X2)  # (6,)
    Y2_sub = _subband_sums(Y2)  # (C, 6)
    E2_sub = _subband_sums(E2)  # (C, 6)

    # Per-subband minimum of the per-bin active-section counts.
    idx_sub = jnp.stack(
        [
            jnp.min(
                st.n_active_sections[
                    :, BAND_BOUNDARIES[s]:BAND_BOUNDARIES[s + 1]
                ],
                axis=-1,
            )
            for s in range(SUBBANDS)
        ],
        axis=-1,
    )  # (C, 6)

    upd = converged[:, None] & (X2_sub[None] > X2_BAND_ENERGY_THRESHOLD) & (
        E2_sub > 0.0
    )
    new_erle = jnp.where(upd, Y2_sub / jnp.maximum(E2_sub, 1e-30), 0.0)
    num_updates = st.num_updates + upd.astype(jnp.int32)

    onehot = (
        jnp.arange(num_sections)[None, :, None] == idx_sub[:, None, :]
    )  # (C, S, 6)
    sel = converged[:, None, None] & onehot

    # erle_estimators_[ch][idx][subband]: smoothed toward new_erle, clamped
    # unconditionally at the selected section (as in the reference loop).
    # One-hot reads: per-channel dynamic gathers serialize under vmap.
    cur = jnp.sum(jnp.where(onehot, st.erle_estimators, 0.0), axis=1)  # (C, 6)
    alpha = jnp.where(new_erle > cur, SMOOTH_INCREASE, SMOOTH_DECREASE)
    alpha = jnp.where(upd, alpha, 0.0)
    newv = jnp.clip(cur + alpha * (new_erle - cur), mn, max_sub)
    erle_est = jnp.where(sel, newv[:, None, :], st.erle_estimators)

    # erle_ref_[ch][subband].
    alpha_r = jnp.where(new_erle > st.erle_ref, SMOOTH_INCREASE,
                        SMOOTH_DECREASE)
    alpha_r = jnp.where(upd, alpha_r, 0.0)
    ref = jnp.clip(st.erle_ref + alpha_r * (new_erle - st.erle_ref), mn,
                   max_sub)
    ref = jnp.where(converged[:, None], ref, st.erle_ref)

    # correction_factors_[ch][idx][subband], after enough updates.
    cf_upd = upd & (num_updates > NUM_UPDATE_THR)
    new_cf = jnp.sum(jnp.where(onehot, erle_est, 0.0), axis=1) / jnp.maximum(
        ref, 1e-30
    )
    cf_cur = jnp.sum(jnp.where(onehot, st.correction_factors, 0.0), axis=1)
    cf_new = cf_cur + 0.1 * (new_cf - cf_cur)
    cf = jnp.where(
        sel & cf_upd[:, None, :], cf_new[:, None, :], st.correction_factors
    )

    return st.replace(
        erle_estimators=erle_est,
        erle_ref=ref,
        correction_factors=cf,
        num_updates=jnp.where(converged[:, None], num_updates,
                              st.num_updates),
    )


def update(config, st: SignalDependentErleState, X2_by_delay,
           frequency_responses, X2, Y2, E2, average_erle,
           average_erle_onset_compensated, converged):
    """SignalDependentErleEstimator::Update (:190-233)."""
    mn = config.erle.min
    submap = jnp.asarray(form_subband_map())
    max_bins = max_erle_subbands(config)[submap]  # (65,)

    st, _ = _active_sections(config, st, X2_by_delay, frequency_responses)
    st = _correction_factors(config, st, X2, Y2, E2, converged)

    cf_sel = st.correction_factors[
        jnp.arange(st.erle.shape[0])[:, None],
        st.n_active_sections,
        submap[None, :],
    ]  # (C, 65)
    # The reference loop stops at kFftLengthBy2: bin 64 keeps its value.
    live = jnp.arange(NUM_BINS) < NUM_BINS - 1
    erle = jnp.where(
        live, jnp.clip(average_erle * cf_sel, mn, max_bins[None]), st.erle
    )
    if config.erle.onset_detection:
        erle_oc = jnp.where(
            live,
            jnp.clip(average_erle_onset_compensated * cf_sel, mn,
                     max_bins[None]),
            st.erle_onset_compensated,
        )
    else:
        erle_oc = st.erle_onset_compensated
    return st.replace(erle=erle, erle_onset_compensated=erle_oc)
