"""RNN-VAD pitch estimation on the LP residual.

Reference: agc2/rnn_vad/pitch_search.cc, pitch_search_internal.cc,
auto_correlation.cc. Two-stage search: coarse at 12 kHz over 147 lags,
refinement at 24 kHz around the two best candidates, then sub-harmonic
extension with pitch tracking.

TPU re-design:
- All auto-correlations (reference: pffft-based overlap convolution) are
  valid-mode correlations of the pitch buffer against the reference frame —
  one `jnp.correlate` per rate (XLA convolution, MXU) instead of
  materializing (lags, frame) window matrices; the data-dependent lag reads
  of the refinement/sub-harmonic stages become one-hot row-reads of the
  dense correlation (a dynamic gather would serialize per stream on TPU).
- The sliding-window energies with per-step floor clamping
  (`yy = max(floor, yy - old^2 + new^2)`) vectorize exactly via the identity
  y[n] = max(S[n], floor + S[n] - min_{k<=n} S[k]) (prefix sums + prefix min).
- The sub-harmonic search is a statically-unrolled divisor loop (2..15).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SAMPLE_RATE_24K = 24000
FRAME_10MS_24K = 240
FRAME_20MS_24K = 480
MIN_PITCH_24K = 30
MAX_PITCH_24K = 384
BUF_SIZE_24K = MAX_PITCH_24K + FRAME_20MS_24K  # 864
INITIAL_MIN_PITCH_24K = 3 * MIN_PITCH_24K  # 90
INITIAL_NUM_LAGS_24K = MAX_PITCH_24K - INITIAL_MIN_PITCH_24K  # 294
REFINE_NUM_LAGS_24K = MAX_PITCH_24K + 1  # 385

FRAME_20MS_12K = 240
BUF_SIZE_12K = BUF_SIZE_24K // 2  # 432
MAX_PITCH_12K = MAX_PITCH_24K // 2  # 192
NUM_LAGS_12K = MAX_PITCH_12K - INITIAL_MIN_PITCH_24K // 2  # 147

MIN_PITCH_48K = 2 * MIN_PITCH_24K  # 60
MAX_PITCH_48K = 2 * MAX_PITCH_24K  # 768

# kSubHarmonicMultipliers (pitch_search_internal.cc:106) and
# kInitialPitchPeriodThresholds (:241).
SUB_HARMONIC_MULTIPLIERS = (3, 2, 3, 2, 5, 2, 3, 2, 3, 2, 5, 2, 3, 2)
INITIAL_PERIOD_THRESHOLDS = (
    20, 45, 80, 125, 180, 245, 320, 405, 500, 605, 720, 845, 980, 1125
)


def _clamped_sliding_energy(first_energy, old_sq, new_sq, floor):
    """y[0]=first_energy; y[i+1]=max(floor, y[i]-old_sq[i]+new_sq[i]).

    Closed form via prefix sums: y[n] = max(S[n], floor + S[n] - min S[1..n]).
    """
    d = new_sq - old_sq
    s = first_energy + jnp.concatenate([jnp.zeros((1,), d.dtype), jnp.cumsum(d)])
    run_min = jax.lax.cummin(s[1:])
    clamped = jnp.maximum(s[1:], floor + s[1:] - run_min)
    return jnp.concatenate([s[:1], clamped])


def _correlate_lags(pitch_buffer, x_ref, num_lags):
    """ac[l] = dot(pitch_buffer[l : l + len(x_ref)], x_ref) for l < num_lags,
    as one valid-mode correlation (ComputeAutoCorrelation,
    pitch_search_internal.cc:29-38, over all lags at once)."""
    return jnp.correlate(pitch_buffer, x_ref, mode="valid")[:num_lags]


def _at(vec, idx):
    """vec[idx] as a one-hot contraction (single-element dynamic gathers
    serialize per stream under vmap on TPU)."""
    oh = (jnp.arange(vec.shape[0]) == idx).astype(vec.dtype)
    return jnp.dot(oh, vec)


def _pseudo_interp_offset(prev, curr, nxt):
    """GetPitchPseudoInterpolationOffset (pitch_search_internal.cc:49-62)."""
    plus = (nxt - prev) > 0.7 * (curr - prev)
    minus = (prev - nxt) > 0.7 * (curr - nxt)
    return jnp.where(plus, 1, jnp.where(minus, -1, 0)).astype(jnp.int32)


def compute_sliding_frame_energies_24k(pitch_buffer):
    """ComputeSlidingFrameSquareEnergies24kHz
    (pitch_search_internal.cc:292-310). Returns (385,) energies."""
    first = jnp.dot(pitch_buffer[:FRAME_20MS_24K], pitch_buffer[:FRAME_20MS_24K])
    old_sq = pitch_buffer[:MAX_PITCH_24K] ** 2
    new_sq = pitch_buffer[FRAME_20MS_24K : FRAME_20MS_24K + MAX_PITCH_24K] ** 2
    return _clamped_sliding_energy(first, old_sq, new_sq, 1.0)


def compute_pitch_period_12k(pitch_buffer_12k, auto_correlation):
    """ComputePitchPeriod12kHz (pitch_search_internal.cc:312-369).

    Returns (best, second_best) inverted lags.
    """
    frame = pitch_buffer_12k[: FRAME_20MS_12K + 1]
    first = 1.0 + jnp.dot(frame, frame)
    old_sq = pitch_buffer_12k[:NUM_LAGS_12K] ** 2
    new_sq = pitch_buffer_12k[FRAME_20MS_12K : FRAME_20MS_12K + NUM_LAGS_12K] ** 2
    # Denominator before the lag's own update: y[l] for l in [0, 147).
    den = _clamped_sliding_energy(first, old_sq, new_sq, 0.0)[:NUM_LAGS_12K]

    valid = (auto_correlation > 0.0) & (den > 0.0)
    key = jnp.where(valid, auto_correlation**2 / jnp.maximum(den, 1e-30), -jnp.inf)
    best = jnp.argmax(key).astype(jnp.int32)
    any_valid = jnp.any(valid)
    key2 = jnp.where(jnp.arange(NUM_LAGS_12K) == best, -jnp.inf, key)
    second = jnp.argmax(key2).astype(jnp.int32)
    has_second = jnp.any(valid & (jnp.arange(NUM_LAGS_12K) != best))
    best = jnp.where(any_valid, best, 0)
    second = jnp.where(has_second, second, 1)
    return best, second


def compute_pitch_period_48k(pitch_buffer, y_energy, best, second_best):
    """ComputePitchPeriod48kHz (pitch_search_internal.cc:371-407 + 181-220).

    best/second_best: candidate inverted lags at 24 kHz (already doubled).
    Returns the refined pitch inverted lag at 48 kHz scale.
    """
    radius = 2
    x_ref = pitch_buffer[MAX_PITCH_24K:]
    ac = _correlate_lags(pitch_buffer, x_ref, INITIAL_NUM_LAGS_24K)
    lo1 = jnp.clip(jnp.minimum(best, second_best) - radius, 0, INITIAL_NUM_LAGS_24K - 1)
    hi1 = jnp.clip(jnp.minimum(best, second_best) + radius, 0, INITIAL_NUM_LAGS_24K - 1)
    lo2 = jnp.clip(jnp.maximum(best, second_best) - radius, 0, INITIAL_NUM_LAGS_24K - 1)
    hi2 = jnp.clip(jnp.maximum(best, second_best) + radius, 0, INITIAL_NUM_LAGS_24K - 1)

    # Dense auto-correlation over all initial lags (one correlation),
    # masked to the lags the reference actually computes.
    lags = jnp.arange(INITIAL_NUM_LAGS_24K)
    in_ranges = ((lags >= lo1) & (lags <= hi1)) | ((lags >= lo2) & (lags <= hi2))

    valid = in_ranges & (ac > 0.0)
    den = y_energy[:INITIAL_NUM_LAGS_24K]
    key = jnp.where(valid & (den > 0.0), ac**2 / jnp.maximum(den, 1e-30), -jnp.inf)
    best_il = jnp.where(jnp.any(valid & (den > 0.0)), jnp.argmax(key), 0).astype(
        jnp.int32
    )

    # Pseudo-interpolation; uncomputed neighbor lags read as 0
    # (the reference zeroes the range boundaries, :160-167).
    ip = jnp.clip(best_il + 1, 0, INITIAL_NUM_LAGS_24K - 1)
    im = jnp.clip(best_il - 1, 0, INITIAL_NUM_LAGS_24K - 1)
    in_f = in_ranges.astype(ac.dtype)
    nb_prev = jnp.where(_at(in_f, ip) > 0.5, _at(ac, ip), 0.0)
    nb_next = jnp.where(_at(in_f, im) > 0.5, _at(ac, im), 0.0)
    offset = _pseudo_interp_offset(nb_prev, _at(ac, best_il), nb_next)
    at_boundary = (best_il == 0) | (best_il >= INITIAL_NUM_LAGS_24K - 1)
    return jnp.where(at_boundary, 2 * best_il, 2 * best_il + offset)


def _alternative_period(period, multiplier, divisor):
    """GetAlternativePitchPeriod (pitch_search_internal.cc:224-230)."""
    return (2 * multiplier * period + divisor) // (2 * divisor)


def compute_extended_pitch_period_48k(
    pitch_buffer, y_energy, initial_pitch_period_48k, last_period_48k,
    last_strength,
):
    """ComputeExtendedPitchPeriod48kHz (pitch_search_internal.cc:409-512).

    Returns (period_48k, strength).
    """
    x_ref = pitch_buffer[MAX_PITCH_24K:]
    x_energy = y_energy[MAX_PITCH_24K]
    # Dense correlation over every possible inverted lag; the data-dependent
    # reads below become one-hot row reads of it.
    ac_full = _correlate_lags(pitch_buffer, x_ref, REFINE_NUM_LAGS_24K)

    def strength_of(xy, yy):
        return xy / jnp.sqrt(1.0 + x_energy * yy)

    init_period = jnp.minimum(initial_pitch_period_48k // 2, MAX_PITCH_24K - 1)
    init_xy = _at(ac_full, MAX_PITCH_24K - init_period)
    init_yy = _at(y_energy, MAX_PITCH_24K - init_period)
    init_strength = strength_of(init_xy, init_yy)

    last_period = last_period_48k // 2
    max_divisor = (2 * init_period) // (2 * MIN_PITCH_24K - 1)

    best_period = init_period
    best_strength = init_strength
    best_xy = init_xy
    best_yy = init_yy

    for divisor in range(2, 16):
        active = divisor <= max_divisor
        alt_period = _alternative_period(init_period, 1, divisor)
        dual = _alternative_period(
            init_period, SUB_HARMONIC_MULTIPLIERS[divisor - 2], divisor
        )
        if divisor == 2:
            dual = jnp.where(dual > MAX_PITCH_24K, init_period, dual)
        alt_period_c = jnp.clip(alt_period, 0, MAX_PITCH_24K)
        dual_c = jnp.clip(dual, 0, MAX_PITCH_24K)
        xy1 = _at(ac_full, MAX_PITCH_24K - alt_period_c)
        xy2 = _at(ac_full, MAX_PITCH_24K - dual_c)
        xy = 0.5 * (xy1 + xy2)
        yy = 0.5 * (
            _at(y_energy, MAX_PITCH_24K - alt_period_c)
            + _at(y_energy, MAX_PITCH_24K - dual_c)
        )
        alt_strength = strength_of(xy, yy)

        # IsAlternativePitchStrongerThanInitial (:235-279).
        close1 = jnp.abs(alt_period - last_period) <= 1
        close2 = (jnp.abs(alt_period - last_period) == 2) & (
            init_period > INITIAL_PERIOD_THRESHOLDS[divisor - 2]
        )
        lower_term = jnp.where(
            close1, last_strength, jnp.where(close2, 0.5 * last_strength, 0.0)
        )
        threshold = jnp.maximum(0.3, 0.7 * init_strength - lower_term)
        threshold = jnp.where(
            alt_period < 3 * MIN_PITCH_24K,
            jnp.maximum(0.4, 0.85 * init_strength - lower_term),
            threshold,
        )
        threshold = jnp.where(
            alt_period < 2 * MIN_PITCH_24K,
            jnp.maximum(0.5, 0.9 * init_strength - lower_term),
            threshold,
        )
        take = active & (alt_strength > threshold)
        best_period = jnp.where(take, alt_period, best_period)
        best_strength = jnp.where(take, alt_strength, best_strength)
        best_xy = jnp.where(take, xy, best_xy)
        best_yy = jnp.where(take, yy, best_yy)

    best_xy = jnp.maximum(0.0, best_xy)
    final_strength = jnp.where(
        best_yy <= best_xy, 1.0, best_xy / (best_yy + 1.0)
    )
    final_strength = jnp.minimum(best_strength, final_strength)

    # PitchPseudoInterpolationLagPitchBuf (:66-80).
    il = MAX_PITCH_24K - best_period
    can_interp = (best_period > 0) & (best_period < MAX_PITCH_24K)
    ilc = jnp.clip(il, 1, MAX_PITCH_24K - 1)
    prev = _at(ac_full, ilc + 1)
    curr = _at(ac_full, ilc)
    nxt = _at(ac_full, ilc - 1)
    offset = jnp.where(can_interp, _pseudo_interp_offset(prev, curr, nxt), 0)
    final_period = jnp.maximum(MIN_PITCH_48K, 2 * best_period + offset)
    return final_period, final_strength


def estimate_pitch(pitch_buffer, last_period_48k, last_strength):
    """PitchEstimator::Estimate (pitch_search.cc:33-71).

    pitch_buffer: (864,) LP residual. Returns (period_48k, strength).
    """
    pitch12 = pitch_buffer[::2]  # Decimate2x (no anti-aliasing, :283-290)
    auto_corr12 = _correlate_lags(
        pitch12, pitch12[BUF_SIZE_12K - FRAME_20MS_12K :], NUM_LAGS_12K
    )
    best12, second12 = compute_pitch_period_12k(pitch12, auto_corr12)

    y_energy = compute_sliding_frame_energies_24k(pitch_buffer)
    lag48 = compute_pitch_period_48k(
        pitch_buffer, y_energy, 2 * best12, 2 * second12
    )
    period, strength = compute_extended_pitch_period_48k(
        pitch_buffer,
        y_energy,
        MAX_PITCH_48K - lag48,
        last_period_48k,
        last_strength,
    )
    return period, strength
