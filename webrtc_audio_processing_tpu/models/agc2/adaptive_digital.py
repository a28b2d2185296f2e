"""AGC2 adaptive digital gain chain.

Reference: agc2/noise_level_estimator.cc (NoiseFloorEstimator),
agc2/speech_level_estimator_impl.cc, agc2/saturation_protector.cc (+ the
4-slot peak ring buffer, saturation_protector_buffer.cc), and
agc2/adaptive_digital_gain_controller.cc.

All components are pure per-frame step functions over scalar state; the
frame-level C++ branching becomes ``jnp.where`` chains (every branch is
cheap scalar math, so predication costs nothing and keeps one fused program).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.config import AdaptiveDigital
from webrtc_audio_processing_tpu.ops.gain_ramp import ramped_gains_applier

MIN_LEVEL_DBFS = -90.31  # agc2_common.h:21
MIN_DBFS = -90.30899869919436  # audio_util.h:98
VAD_CONFIDENCE_THRESHOLD = 0.95  # agc2_common.h:37
ADJACENT_SPEECH_FRAMES_THRESHOLD = 12  # agc2_common.h:41
LEVEL_ESTIMATOR_TIME_TO_CONFIDENCE_MS = 400  # agc2_common.h:45
LEVEL_ESTIMATOR_LEAK_FACTOR = 1.0 - 1.0 / LEVEL_ESTIMATOR_TIME_TO_CONFIDENCE_MS
SATURATION_PROTECTOR_INITIAL_HEADROOM_DB = 20.0  # agc2_common.h:50
SATURATION_BUFFER_SIZE = 4  # agc2_common.h:51
LIMITER_THRESHOLD_FOR_AGC_GAIN_DBFS = -1.0  # agc2_common.h:31
FRAME_DURATION_MS = 10


def energy_to_dbfs(energy, num_samples: int):
    """EnergyToDbfs (noise_level_estimator.cc:40-48)."""
    rms_square = energy / num_samples
    return jnp.where(
        rms_square <= 1.0,
        MIN_DBFS,
        10.0 * jnp.log10(jnp.maximum(rms_square, 1.0)) + MIN_DBFS,
    )


def float_s16_to_dbfs(v):
    """FloatS16ToDbfs (audio_util.h:94-104)."""
    return jnp.where(
        v <= 1.0, MIN_DBFS, 20.0 * jnp.log10(jnp.maximum(v, 1.0)) + MIN_DBFS
    )


def db_to_ratio(v):
    return jnp.power(10.0, v / 20.0)


def compute_audio_levels(x):
    """ComputeAudioLevels (gain_controller2.cc:79-94): first channel only.

    x: (N, C) floatS16. Returns (peak_dbfs, rms_dbfs).
    """
    ch0 = x[:, 0]
    peak = jnp.max(jnp.abs(ch0))
    rms = jnp.sqrt(jnp.sum(ch0 * ch0) / x.shape[0])
    return float_s16_to_dbfs(peak), float_s16_to_dbfs(rms)


# ---------------------------------------------------------------- noise floor


@struct.dataclass
class NoiseFloorState:
    first_period: jnp.ndarray  # () bool
    preliminary_set: jnp.ndarray  # () bool
    preliminary_energy: jnp.ndarray  # ()
    noise_energy: jnp.ndarray  # ()
    counter: jnp.ndarray  # () int32


UPDATE_PERIOD_FRAMES = 500  # noise_level_estimator.cc:72


def _min_noise_energy(sample_rate_hz: int) -> float:
    # -84 dBFS floor (noise_level_estimator.cc:150).
    return sample_rate_hz * 2.0 * 2.0 / 100


def init_noise_floor(sample_rate_hz: int, dtype=jnp.float32) -> NoiseFloorState:
    e = _min_noise_energy(sample_rate_hz)
    return NoiseFloorState(
        first_period=jnp.asarray(True),
        preliminary_set=jnp.asarray(False),
        preliminary_energy=jnp.asarray(e, dtype),
        noise_energy=jnp.asarray(e, dtype),
        counter=jnp.asarray(UPDATE_PERIOD_FRAMES, jnp.int32),
    )


def noise_floor_analyze(state: NoiseFloorState, x, sample_rate_hz: int):
    """NoiseFloorEstimator::Analyze (noise_level_estimator.cc:85-140).

    x: (N, C) floatS16. Returns (state, noise_rms_dbfs).
    """
    n = x.shape[0]
    frame_energy = jnp.max(jnp.sum(x * x, axis=0))  # max channel energy
    low = frame_energy <= _min_noise_energy(sample_rate_hz)

    prelim = jnp.where(
        state.preliminary_set,
        jnp.minimum(state.preliminary_energy, frame_energy),
        frame_energy,
    )
    full_period = state.counter == 0
    # SmoothNoiseFloorEstimate (:56-64): slow attack, instant decay.
    smoothed = jnp.where(
        state.noise_energy < prelim,
        0.5 * prelim + 0.5 * state.noise_energy,
        prelim,
    )
    noise_energy = jnp.where(
        full_period,
        smoothed,
        jnp.where(
            state.first_period, prelim, jnp.minimum(state.noise_energy, prelim)
        ),
    )
    new_state = NoiseFloorState(
        first_period=state.first_period & ~full_period,
        preliminary_set=~full_period,
        preliminary_energy=prelim,
        noise_energy=noise_energy,
        counter=jnp.where(full_period, UPDATE_PERIOD_FRAMES, state.counter - 1),
    )
    # Low-energy frames leave the state untouched and report the current floor.
    merged = jax.tree_util.tree_map(
        lambda a, b: jnp.where(low, a, b), state, new_state
    )
    dbfs = energy_to_dbfs(jnp.where(low, state.noise_energy, noise_energy), n)
    return merged, dbfs


# ------------------------------------------------------------ speech level


@struct.dataclass
class SpeechLevelState:
    # Preliminary and reliable LevelEstimatorState
    # (speech_level_estimator_impl.h): time_to_confidence_ms, ratio num/den.
    prelim_time_to_confidence: jnp.ndarray
    prelim_num: jnp.ndarray
    prelim_den: jnp.ndarray
    reliable_time_to_confidence: jnp.ndarray
    reliable_num: jnp.ndarray
    reliable_den: jnp.ndarray
    level_dbfs: jnp.ndarray
    num_adjacent_speech_frames: jnp.ndarray  # int32
    is_confident: jnp.ndarray  # bool


def initial_speech_level_dbfs(config: AdaptiveDigital) -> float:
    """GetInitialSpeechLevelEstimateDbfs (speech_level_estimator_impl.cc:27-32)."""
    v = (
        -SATURATION_PROTECTOR_INITIAL_HEADROOM_DB
        - config.initial_gain_db
        - config.headroom_db
    )
    return float(min(max(v, -90.0), 30.0))


def init_speech_level(config: AdaptiveDigital, dtype=jnp.float32) -> SpeechLevelState:
    lvl = initial_speech_level_dbfs(config)
    t = float(LEVEL_ESTIMATOR_TIME_TO_CONFIDENCE_MS)
    return SpeechLevelState(
        prelim_time_to_confidence=jnp.asarray(t, dtype),
        prelim_num=jnp.asarray(lvl, dtype),
        prelim_den=jnp.asarray(1.0, dtype),
        reliable_time_to_confidence=jnp.asarray(t, dtype),
        reliable_num=jnp.asarray(lvl, dtype),
        reliable_den=jnp.asarray(1.0, dtype),
        level_dbfs=jnp.asarray(lvl, dtype),
        num_adjacent_speech_frames=jnp.asarray(0, jnp.int32),
        is_confident=jnp.asarray(False),
    )


def speech_level_update(state: SpeechLevelState, rms_dbfs, speech_probability):
    """SpeechLevelEstimatorImpl::Update (speech_level_estimator_impl.cc:57-107)."""
    is_speech = speech_probability >= VAD_CONFIDENCE_THRESHOLD
    thr = ADJACENT_SPEECH_FRAMES_THRESHOLD
    long_seq = state.num_adjacent_speech_frames >= thr
    short_seq = (state.num_adjacent_speech_frames > 0) & ~long_seq

    # Non-speech branch: confirm or roll back the preliminary state.
    rel_t = jnp.where(
        ~is_speech & long_seq, state.prelim_time_to_confidence,
        state.reliable_time_to_confidence,
    )
    rel_num = jnp.where(~is_speech & long_seq, state.prelim_num, state.reliable_num)
    rel_den = jnp.where(~is_speech & long_seq, state.prelim_den, state.reliable_den)
    pre_t = jnp.where(
        ~is_speech & short_seq, state.reliable_time_to_confidence,
        state.prelim_time_to_confidence,
    )
    pre_num = jnp.where(~is_speech & short_seq, state.reliable_num, state.prelim_num)
    pre_den = jnp.where(~is_speech & short_seq, state.reliable_den, state.prelim_den)

    # Speech branch: weighted-average update of the preliminary state.
    buffer_full = pre_t == 0.0
    pre_t_s = jnp.where(buffer_full, pre_t, pre_t - FRAME_DURATION_MS)
    leak = jnp.where(buffer_full, LEVEL_ESTIMATOR_LEAK_FACTOR, 1.0)
    pre_num_s = pre_num * leak + rms_dbfs * speech_probability
    pre_den_s = pre_den * leak + speech_probability

    n_adj = jnp.where(is_speech, state.num_adjacent_speech_frames + 1, 0)
    pre_t = jnp.where(is_speech, pre_t_s, pre_t)
    pre_num = jnp.where(is_speech, pre_num_s, pre_num)
    pre_den = jnp.where(is_speech, pre_den_s, pre_den)

    level = jnp.where(
        is_speech & (n_adj >= thr),
        jnp.clip(pre_num / pre_den, -90.0, 30.0),
        state.level_dbfs,
    )
    is_confident = (rel_t == 0.0) | ((n_adj >= thr) & (pre_t == 0.0))
    return SpeechLevelState(
        prelim_time_to_confidence=pre_t,
        prelim_num=pre_num,
        prelim_den=pre_den,
        reliable_time_to_confidence=rel_t,
        reliable_num=rel_num,
        reliable_den=rel_den,
        level_dbfs=level,
        num_adjacent_speech_frames=n_adj,
        is_confident=is_confident,
    )


# --------------------------------------------------------- saturation protector


@struct.dataclass
class SatProtectorRing:
    """SaturationProtectorBuffer (saturation_protector_buffer.{h,cc})."""

    buffer: jnp.ndarray  # (4,)
    next: jnp.ndarray  # int32
    size: jnp.ndarray  # int32


@struct.dataclass
class SatProtectorSubState:
    headroom_db: jnp.ndarray
    ring: SatProtectorRing
    max_peaks_dbfs: jnp.ndarray
    time_since_push_ms: jnp.ndarray  # int32


@struct.dataclass
class SaturationProtectorState:
    num_adjacent_speech_frames: jnp.ndarray  # int32
    headroom_db: jnp.ndarray
    preliminary: SatProtectorSubState
    reliable: SatProtectorSubState


def _init_sub(headroom_db, dtype) -> SatProtectorSubState:
    return SatProtectorSubState(
        headroom_db=jnp.asarray(headroom_db, dtype),
        ring=SatProtectorRing(
            buffer=jnp.zeros((SATURATION_BUFFER_SIZE,), dtype),
            next=jnp.asarray(0, jnp.int32),
            size=jnp.asarray(0, jnp.int32),
        ),
        max_peaks_dbfs=jnp.asarray(MIN_LEVEL_DBFS, dtype),
        time_since_push_ms=jnp.asarray(0, jnp.int32),
    )


def init_saturation_protector(dtype=jnp.float32) -> SaturationProtectorState:
    h = SATURATION_PROTECTOR_INITIAL_HEADROOM_DB
    return SaturationProtectorState(
        num_adjacent_speech_frames=jnp.asarray(0, jnp.int32),
        headroom_db=jnp.asarray(h, dtype),
        preliminary=_init_sub(h, dtype),
        reliable=_init_sub(h, dtype),
    )


def _sub_update(sub: SatProtectorSubState, peak_dbfs, speech_level_dbfs):
    """UpdateSaturationProtectorState (saturation_protector.cc:64-100)."""
    kAttack = 0.9988493699365052
    kDecay = 0.9997697679981565
    kSuperFrameMs = 400

    max_peaks = jnp.maximum(sub.max_peaks_dbfs, peak_dbfs)
    t = sub.time_since_push_ms + FRAME_DURATION_MS
    push = t > kSuperFrameMs

    ring = sub.ring
    new_buffer = jnp.where(
        jnp.arange(SATURATION_BUFFER_SIZE) == ring.next, max_peaks, ring.buffer
    )
    new_ring = SatProtectorRing(
        buffer=jnp.where(push, new_buffer, ring.buffer),
        next=jnp.where(push, (ring.next + 1) % SATURATION_BUFFER_SIZE, ring.next),
        size=jnp.where(
            push, jnp.minimum(ring.size + 1, SATURATION_BUFFER_SIZE), ring.size
        ),
    )
    max_peaks = jnp.where(push, MIN_LEVEL_DBFS, max_peaks)
    t = jnp.where(push, 0, t)

    # Front(): oldest element, or current max_peaks when empty
    # (saturation_protector_buffer.cc Front/FrontIndex).
    front_idx = jnp.where(
        new_ring.size == SATURATION_BUFFER_SIZE, new_ring.next, 0
    )
    delayed_peak = jnp.where(
        new_ring.size == 0, max_peaks, new_ring.buffer[front_idx]
    )
    diff = delayed_peak - speech_level_dbfs
    headroom = jnp.where(
        diff > sub.headroom_db,
        sub.headroom_db * kAttack + diff * (1.0 - kAttack),
        sub.headroom_db * kDecay + diff * (1.0 - kDecay),
    )
    headroom = jnp.clip(headroom, 12.0, 25.0)
    return SatProtectorSubState(
        headroom_db=headroom, ring=new_ring, max_peaks_dbfs=max_peaks,
        time_since_push_ms=t,
    )


def _select_sub(pred, a: SatProtectorSubState, b: SatProtectorSubState):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def saturation_protector_analyze(
    state: SaturationProtectorState, speech_probability, peak_dbfs,
    speech_level_dbfs,
):
    """SaturationProtectorImpl::Analyze (saturation_protector.cc:117-148)."""
    thr = ADJACENT_SPEECH_FRAMES_THRESHOLD
    is_speech = speech_probability >= VAD_CONFIDENCE_THRESHOLD
    long_seq = state.num_adjacent_speech_frames >= thr
    short_seq = (state.num_adjacent_speech_frames > 0) & ~long_seq

    # Non-speech: confirm (reliable <- preliminary) or roll back.
    reliable = _select_sub(~is_speech & long_seq, state.preliminary, state.reliable)
    preliminary = _select_sub(~is_speech & short_seq, state.reliable, state.preliminary)

    # Speech: update the preliminary state.
    updated = _sub_update(preliminary, peak_dbfs, speech_level_dbfs)
    preliminary = _select_sub(is_speech, updated, preliminary)

    n_adj = jnp.where(is_speech, state.num_adjacent_speech_frames + 1, 0)
    headroom = jnp.where(
        is_speech & (n_adj >= thr), preliminary.headroom_db, state.headroom_db
    )
    return SaturationProtectorState(
        num_adjacent_speech_frames=n_adj,
        headroom_db=headroom,
        preliminary=preliminary,
        reliable=reliable,
    )


# -------------------------------------------------- adaptive digital controller


@struct.dataclass
class AdaptiveDigitalState:
    last_gain_db: jnp.ndarray
    last_gain_factor: jnp.ndarray  # GainApplier ramp memory
    frames_to_gain_increase_allowed: jnp.ndarray  # int32


def init_adaptive_digital(config: AdaptiveDigital, dtype=jnp.float32):
    return AdaptiveDigitalState(
        last_gain_db=jnp.asarray(config.initial_gain_db, dtype),
        last_gain_factor=jnp.asarray(
            10.0 ** (config.initial_gain_db / 20.0), dtype
        ),
        frames_to_gain_increase_allowed=jnp.asarray(
            ADJACENT_SPEECH_FRAMES_THRESHOLD, jnp.int32
        ),
    )


def adaptive_digital_process(
    config: AdaptiveDigital,
    state: AdaptiveDigitalState,
    x,
    speech_probability,
    speech_level_dbfs,
    speech_level_reliable,
    noise_rms_dbfs,
    headroom_db,
    limiter_envelope_dbfs,
):
    """AdaptiveDigitalGainController::Process
    (adaptive_digital_gain_controller.cc:133-229). x: (N, C) floatS16."""
    max_change_per_10ms = config.max_gain_change_db_per_second * 0.01

    # ComputeGainDb (:40-54).
    input_level = speech_level_dbfs + headroom_db
    gain_db = jnp.where(
        input_level < -(config.headroom_db + config.max_gain_db),
        config.max_gain_db,
        jnp.where(
            input_level < -config.headroom_db,
            -config.headroom_db - input_level,
            0.0,
        ),
    )
    # LimitGainByNoise (:60-70).
    max_by_noise = config.max_output_noise_level_dbfs - noise_rms_dbfs
    gain_db = jnp.minimum(gain_db, jnp.maximum(max_by_noise, 0.0))
    # LimitGainByLowConfidence (:72-88).
    low_conf = (~speech_level_reliable) & (
        limiter_envelope_dbfs > LIMITER_THRESHOLD_FOR_AGC_GAIN_DBFS
    )
    level_before = limiter_envelope_dbfs - state.last_gain_db
    new_target = jnp.maximum(
        LIMITER_THRESHOLD_FOR_AGC_GAIN_DBFS - level_before, 0.0
    )
    target_gain_db = jnp.where(low_conf, jnp.minimum(new_target, gain_db), gain_db)

    # Adjacent speech-frame gating (:152-176).
    is_speech = speech_probability >= VAD_CONFIDENCE_THRESHOLD
    frames = jnp.where(
        ~is_speech,
        ADJACENT_SPEECH_FRAMES_THRESHOLD,
        jnp.maximum(state.frames_to_gain_increase_allowed - 1, 0),
    )
    first_confident = is_speech & (frames == 0) & (
        state.frames_to_gain_increase_allowed > 0
    )
    gain_increase_allowed = frames == 0
    max_increase = jnp.where(
        first_confident,
        max_change_per_10ms * ADJACENT_SPEECH_FRAMES_THRESHOLD,
        max_change_per_10ms,
    )

    # ComputeGainChangeThisFrameDb (:92-105).
    diff = target_gain_db - state.last_gain_db
    diff = jnp.where(gain_increase_allowed, diff, jnp.minimum(diff, 0.0))
    change = jnp.clip(diff, -max_change_per_10ms, max_increase)

    new_gain_db = state.last_gain_db + change
    current_factor = jnp.where(
        change != 0.0, db_to_ratio(new_gain_db), state.last_gain_factor
    )
    g = ramped_gains_applier(
        state.last_gain_factor, current_factor, x.shape[0], x.dtype
    )
    y = x * g[:, None]
    return (
        AdaptiveDigitalState(
            last_gain_db=new_gain_db,
            last_gain_factor=current_factor,
            frames_to_gain_increase_allowed=frames,
        ),
        y,
    )
