"""AgcManagerDirect: the hybrid analog AGC (input volume + compression).

Reference: agc/agc_manager_direct.{h,cc}, agc/agc.cc,
agc/loudness_histogram.cc, agc/utility.cc.

The per-channel MonoAgc owns an `Agc` (loudness histogram fed by the
analytics VAD's chunkwise RMS/probabilities) and drives:
- the recommended input volume via the shared AGC2 gain map, and
- the AGC1 digital compression gain (2..18 dB, slewed at 0.05 dB/frame).

All decision logic is scalar jnp.where lattices; the analytics VAD
(models/vad/analytics_vad.py) does the heavy DSP at a 30 ms cadence.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.models.agc2.input_volume_controller import (
    GAIN_MAP,
    compute_volume_update,
)
from webrtc_audio_processing_tpu.models.vad import analytics_vad

# agc_manager_direct.cc:36-66.
LEVEL_QUANTIZATION_SLACK = 25
DEFAULT_COMPRESSION_GAIN = 7
MAX_COMPRESSION_GAIN = 12
MIN_COMPRESSION_GAIN = 2
COMPRESSION_GAIN_STEP = 0.05
MAX_MIC_LEVEL = 255
MIN_MIC_LEVEL = 12
MAX_RESIDUAL_GAIN_CHANGE = 15
SURPLUS_COMPRESSION_GAIN = 6
OVERRIDE_TARGET_SPEECH_LEVEL_DBFS = -18.0
OVERRIDE_SPEECH_PROB_SILENCE_THRESHOLD = 0.5
OVERRIDE_WAIT_FRAMES = 0

# agc.cc:25-29.
DEFAULT_LEVEL_DBFS = -18
NUM_ANALYSIS_FRAMES = 100
ACTIVITY_THRESHOLD = 0.3

# utility.cc: loudness conversions.
_LN10 = float(np.log(10.0))
LINEAR2DB_SCALE = 20.0 / _LN10
LINEAR2LOUDNESS_SCALE = 13.4 / _LN10


def dbfs2loudness(dbfs: float) -> float:
    return (90.0 + dbfs) * LINEAR2LOUDNESS_SCALE / LINEAR2DB_SCALE


def loudness2db(loudness):
    return loudness * LINEAR2DB_SCALE / LINEAR2LOUDNESS_SCALE


def linear2loudness(rms):
    return jnp.where(
        rms == 0.0, -15.0,
        LINEAR2LOUDNESS_SCALE * jnp.log(jnp.maximum(rms, 1e-30)),
    )


# LoudnessHistogram (loudness_histogram.cc:21-49): bin centers, log-domain
# quantizer constants. The table is kHistBinCenters, a geometric sequence
# 10^((n - 15) / 13.4) — i.e. 1 dB steps in the 13.4-scaled loudness log
# domain (centers[15] == 1.0 exactly).
HIST_SIZE = 77
_HIST_BIN_CENTERS = np.power(10.0, (np.arange(HIST_SIZE) - 15.0) / 13.4)
HIST_BIN_CENTERS = _HIST_BIN_CENTERS
LOG_DOMAIN_MIN_BIN_CENTER = -2.57752062648587
LOG_DOMAIN_STEP_INV = 5.81954605750359
PROB_Q_DOMAIN = 1024.0
TRANSIENT_WIDTH_THRESHOLD = 7
LOW_PROB_THRESHOLD_Q10 = int(0.2 * PROB_Q_DOMAIN)
HIST_WINDOW = NUM_ANALYSIS_FRAMES  # circular window of 100 frames


@struct.dataclass
class LoudnessHistogramState:
    """LoudnessHistogram with a 100-frame circular window."""

    bin_count_q10: jnp.ndarray  # (77,) int32
    audio_content_q10: jnp.ndarray  # () int32
    num_updates: jnp.ndarray  # () int32
    activity_probability: jnp.ndarray  # (100,) int32
    hist_bin_index: jnp.ndarray  # (100,) int32
    buffer_index: jnp.ndarray  # () int32
    buffer_is_full: jnp.ndarray  # () bool
    len_high_activity: jnp.ndarray  # () int32


def init_histogram(window_size: int = HIST_WINDOW) -> LoudnessHistogramState:
    """LoudnessHistogram::Create(window_size) (loudness_histogram.cc:171-181).

    window_size=0 builds the non-circular variant (Create() without a
    window): entries are never evicted and the low-probability/transient
    logic is skipped, matching loudness_histogram.cc:129-153 where the
    whole circular-buffer block is gated on len_circular_buffer_ > 0.
    """
    return LoudnessHistogramState(
        bin_count_q10=jnp.zeros((HIST_SIZE,), jnp.int32),
        audio_content_q10=jnp.asarray(0, jnp.int32),
        num_updates=jnp.asarray(0, jnp.int32),
        activity_probability=jnp.zeros((window_size,), jnp.int32),
        hist_bin_index=jnp.zeros((window_size,), jnp.int32),
        buffer_index=jnp.asarray(0, jnp.int32),
        buffer_is_full=jnp.asarray(False),
        len_high_activity=jnp.asarray(0, jnp.int32),
    )


def _get_bin_index(rms):
    """GetBinIndex (loudness_histogram.cc:190-210)."""
    centers = jnp.asarray(HIST_BIN_CENTERS, jnp.float32)
    idx = jnp.floor(
        (jnp.log(jnp.maximum(rms, 1e-30)) - LOG_DOMAIN_MIN_BIN_CENTER)
        * LOG_DOMAIN_STEP_INV
    ).astype(jnp.int32)
    idx = jnp.clip(idx, 0, HIST_SIZE - 2)
    b = 0.5 * (centers[idx] + centers[idx + 1])
    idx = jnp.where(rms > b, idx + 1, idx)
    idx = jnp.where(rms <= centers[0], 0, idx)
    idx = jnp.where(rms >= centers[-1], HIST_SIZE - 1, idx)
    return idx


def histogram_update(st: LoudnessHistogramState, rms, prob):
    """Update (loudness_histogram.cc:93-160) including transient removal.

    The window size is static (the shape of st.activity_probability); a
    zero-length window selects the reference's non-circular variant, where
    the probability is accumulated as-is with no eviction or transient
    removal (loudness_histogram.cc:129-153).
    """
    window = st.activity_probability.shape[0]
    if window == 0:
        hist_index = _get_bin_index(rms)
        prob_q10 = jnp.floor(prob * PROB_Q_DOMAIN).astype(jnp.int32)
        return st.replace(
            bin_count_q10=st.bin_count_q10.at[hist_index].add(prob_q10),
            audio_content_q10=st.audio_content_q10 + prob_q10,
            num_updates=st.num_updates + 1,
        )

    # Remove the oldest entry if the window is full.
    old_prob = st.activity_probability[st.buffer_index]
    old_bin = st.hist_bin_index[st.buffer_index]
    remove = st.buffer_is_full
    bc = st.bin_count_q10.at[old_bin].add(
        jnp.where(remove, -old_prob, 0)
    )
    content = st.audio_content_q10 - jnp.where(remove, old_prob, 0)

    hist_index = _get_bin_index(rms)
    prob_q10 = jnp.floor(prob * PROB_Q_DOMAIN).astype(jnp.int32)

    low = prob_q10 <= LOW_PROB_THRESHOLD_Q10
    # Transient removal: when a low-probability frame arrives after a short
    # (<= 7) high-activity run, the run's contributions are erased.
    do_remove_transient = low & (
        st.len_high_activity <= TRANSIENT_WIDTH_THRESHOLD
    )
    back = jnp.arange(TRANSIENT_WIDTH_THRESHOLD)
    idxs = jnp.mod(st.buffer_index - 1 - back, window)
    in_run = back < st.len_high_activity
    act = do_remove_transient & in_run
    probs_back = st.activity_probability[idxs]
    bins_back = st.hist_bin_index[idxs]
    bc = bc.at[bins_back].add(jnp.where(act, -probs_back, 0))
    content = content - jnp.sum(jnp.where(act, probs_back, 0))
    new_act_prob = st.activity_probability.at[idxs].set(
        jnp.where(act, 0, probs_back)
    )

    prob_q10 = jnp.where(low, 0, prob_q10)
    len_high = jnp.where(
        low, 0,
        jnp.where(
            st.len_high_activity <= TRANSIENT_WIDTH_THRESHOLD,
            st.len_high_activity + 1, st.len_high_activity,
        ),
    )

    new_act_prob = new_act_prob.at[st.buffer_index].set(prob_q10)
    new_bins = st.hist_bin_index.at[st.buffer_index].set(hist_index)
    nb_index = st.buffer_index + 1
    full = st.buffer_is_full | (nb_index >= window)
    nb_index = jnp.mod(nb_index, window)

    bc = bc.at[hist_index].add(prob_q10)
    content = content + prob_q10

    return st.replace(
        bin_count_q10=bc,
        audio_content_q10=content,
        num_updates=st.num_updates + 1,
        activity_probability=new_act_prob,
        hist_bin_index=new_bins,
        buffer_index=nb_index,
        buffer_is_full=full,
        len_high_activity=len_high,
    )


def histogram_current_rms(st: LoudnessHistogramState):
    """CurrentRms (loudness_histogram.cc:213-227)."""
    centers = jnp.asarray(HIST_BIN_CENTERS, jnp.float32)
    total = st.audio_content_q10.astype(jnp.float32)
    mean_val = jnp.where(
        st.audio_content_q10 > 0,
        jnp.sum(st.bin_count_q10.astype(jnp.float32) * centers)
        / jnp.maximum(total, 1.0),
        centers[0],
    )
    return mean_val


def histogram_reset(st: LoudnessHistogramState) -> LoudnessHistogramState:
    return st.replace(
        bin_count_q10=jnp.zeros_like(st.bin_count_q10),
        audio_content_q10=jnp.asarray(0, jnp.int32),
        num_updates=jnp.asarray(0, jnp.int32),
        buffer_index=jnp.asarray(0, jnp.int32),
        buffer_is_full=jnp.asarray(False),
        len_high_activity=jnp.asarray(0, jnp.int32),
    )


# ------------------------------------------------------------------ Agc


TARGET_LEVEL_LOUDNESS = dbfs2loudness(DEFAULT_LEVEL_DBFS)


@struct.dataclass
class AgcState:
    """Agc (agc.{h,cc}): analytics VAD + loudness histogram."""

    vad: analytics_vad.VoiceActivityDetectorState
    histogram: LoudnessHistogramState


def init_agc() -> AgcState:
    return AgcState(
        vad=analytics_vad.init_voice_activity_detector(),
        histogram=init_histogram(),
    )


def agc_process(st: AgcState, frame, phase: int):
    """Agc::Process + GetRmsErrorDb (agc.cc:42-80).

    frame: (160,) int32 16 kHz samples. phase: static index mod 3.
    Returns (state, rms_error, update_gain flag, voice_probability)."""
    vad, probs, rms, valid = analytics_vad.process_chunk(st.vad, frame, phase)
    st = st.replace(vad=vad)
    hist = st.histogram
    if phase == 2:
        for i in range(3):
            hist = histogram_update(hist, rms[i], probs[i])

    enough = (hist.num_updates >= NUM_ANALYSIS_FRAMES) & (
        hist.audio_content_q10.astype(jnp.float32) / PROB_Q_DOMAIN
        > NUM_ANALYSIS_FRAMES * ACTIVITY_THRESHOLD
    )
    loudness = linear2loudness(histogram_current_rms(hist))
    error = jnp.floor(
        loudness2db(TARGET_LEVEL_LOUDNESS - loudness) + 0.5
    ).astype(jnp.int32)
    hist = jax.tree_util.tree_map(
        lambda a, b: jnp.where(enough, a, b), histogram_reset(hist), hist
    )
    st = st.replace(histogram=hist)
    return st, error, enough, vad.last_probability


# -------------------------------------------------------------- MonoAgc


@struct.dataclass
class MonoAgcState:
    agc: AgcState
    level: jnp.ndarray  # () int32
    max_level: jnp.ndarray
    max_compression_gain: jnp.ndarray
    target_compression: jnp.ndarray
    compression: jnp.ndarray
    compression_accumulator: jnp.ndarray  # () float32
    recommended_input_volume: jnp.ndarray  # () int32
    check_volume_on_next_process: jnp.ndarray  # () bool
    startup: jnp.ndarray  # () bool
    frames_since_update_gain: jnp.ndarray  # () int32
    is_first_frame: jnp.ndarray  # () bool
    new_compression_valid: jnp.ndarray  # () bool
    new_compression: jnp.ndarray  # () int32


def init_mono_agc(disable_digital_adaptive: bool = False) -> MonoAgcState:
    comp = 0 if disable_digital_adaptive else DEFAULT_COMPRESSION_GAIN
    return MonoAgcState(
        agc=init_agc(),
        level=jnp.asarray(0, jnp.int32),
        max_level=jnp.asarray(MAX_MIC_LEVEL, jnp.int32),
        max_compression_gain=jnp.asarray(MAX_COMPRESSION_GAIN, jnp.int32),
        target_compression=jnp.asarray(comp, jnp.int32),
        compression=jnp.asarray(comp, jnp.int32),
        compression_accumulator=jnp.asarray(float(comp), jnp.float32),
        recommended_input_volume=jnp.asarray(0, jnp.int32),
        check_volume_on_next_process=jnp.asarray(True),
        startup=jnp.asarray(True),
        frames_since_update_gain=jnp.asarray(0, jnp.int32),
        is_first_frame=jnp.asarray(True),
        new_compression_valid=jnp.asarray(False),
        new_compression=jnp.asarray(comp, jnp.int32),
    )


def _agc_reset(st: MonoAgcState) -> MonoAgcState:
    return st.replace(agc=st.agc.replace(histogram=histogram_reset(
        st.agc.histogram)))


def _set_max_level(st: MonoAgcState, level, clipped_level_min: int):
    """SetMaxLevel (agc_manager_direct.cc:305-315)."""
    max_comp = MAX_COMPRESSION_GAIN + jnp.floor(
        (1.0 * MAX_MIC_LEVEL - level.astype(jnp.float32))
        / (MAX_MIC_LEVEL - clipped_level_min) * SURPLUS_COMPRESSION_GAIN
        + 0.5
    ).astype(jnp.int32)
    return st.replace(max_level=level, max_compression_gain=max_comp)


def _set_level(st: MonoAgcState, new_level):
    """SetLevel (agc_manager_direct.cc:266-303)."""
    voe = st.recommended_input_volume
    invalid = voe == 0

    manual = (voe > st.level + LEVEL_QUANTIZATION_SLACK) | (
        voe < st.level - LEVEL_QUANTIZATION_SLACK
    )
    man_st = st.replace(
        level=voe,
        max_level=jnp.maximum(st.max_level, voe),
        agc=st.agc.replace(histogram=histogram_reset(st.agc.histogram)),
        frames_since_update_gain=jnp.asarray(0, jnp.int32),
        is_first_frame=jnp.asarray(False),
    )
    # Manual branch also refreshes max_compression via SetMaxLevel only if
    # level > max_level; approximated by recomputing when raised.

    clamped = jnp.minimum(new_level, st.max_level)
    take = ~invalid & ~manual & (clamped != st.level)
    norm_st = st.replace(
        recommended_input_volume=jnp.where(
            take, clamped, st.recommended_input_volume
        ),
        level=jnp.where(take, clamped, st.level),
    )
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(~invalid & manual, a, b), man_st, norm_st
    )
    return out, ~invalid & manual


def mono_agc_process(st: MonoAgcState, frame, phase: int,
                     clipped_level_min: int, min_mic_level: int,
                     disable_digital_adaptive: bool,
                     rms_error_override, has_override):
    """MonoAgc::Process (agc_manager_direct.cc:195-236)."""
    # CheckVolumeAndReset (:329-355).
    vol = st.recommended_input_volume
    skip_check = (vol == 0) & ~st.startup
    raised = jnp.maximum(vol, min_mic_level)
    checked = st.replace(
        recommended_input_volume=jnp.where(skip_check, vol, raised),
        level=jnp.where(skip_check, st.level, raised),
        startup=jnp.where(skip_check, st.startup, False),
        frames_since_update_gain=jnp.where(
            skip_check, st.frames_since_update_gain, 0
        ),
        is_first_frame=jnp.where(skip_check, st.is_first_frame, True),
        agc=st.agc.replace(
            histogram=jax.tree_util.tree_map(
                lambda a, b: jnp.where(skip_check, b, a),
                histogram_reset(st.agc.histogram), st.agc.histogram,
            )
        ),
    )
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(st.check_volume_on_next_process, a, b),
        checked, st,
    )
    st = st.replace(check_volume_on_next_process=jnp.asarray(False))

    agc, rms_error, update_gain, voice_prob = agc_process(
        st.agc, frame, phase
    )
    st = st.replace(agc=agc)

    if has_override is not None:
        blocked = st.is_first_frame | (
            st.frames_since_update_gain < OVERRIDE_WAIT_FRAMES
        )
        use_ovr = has_override & ~blocked
        rms_error = jnp.where(use_ovr, rms_error_override, rms_error)
        update_gain = jnp.where(
            has_override, use_ovr, update_gain
        )

    # UpdateGain (agc_manager_direct.cc:357-397).
    rms2 = rms_error + MIN_COMPRESSION_GAIN
    raw_comp = jnp.clip(rms2, MIN_COMPRESSION_GAIN, st.max_compression_gain)
    snap = ((raw_comp == st.max_compression_gain)
            & (st.target_compression == st.max_compression_gain - 1)) | (
        (raw_comp == MIN_COMPRESSION_GAIN)
        & (st.target_compression == MIN_COMPRESSION_GAIN + 1)
    )
    new_target = jnp.where(
        snap, raw_comp,
        (raw_comp - st.target_compression) // 2 + st.target_compression,
    )
    residual = jnp.clip(rms2 - raw_comp, -MAX_RESIDUAL_GAIN_CHANGE,
                        MAX_RESIDUAL_GAIN_CHANGE)
    new_level = compute_volume_update(residual, st.level, min_mic_level)

    upd = st.replace(
        target_compression=new_target,
        frames_since_update_gain=jnp.asarray(0, jnp.int32),
    )
    upd_lv, _ = _set_level(upd, new_level)
    level_changed = upd_lv.level != st.level
    upd_lv = jax.tree_util.tree_map(
        lambda a, b: jnp.where(level_changed & (residual != 0), a, b),
        _agc_reset(upd_lv), upd_lv,
    )
    no_res = residual == 0
    upd_final = jax.tree_util.tree_map(
        lambda a, b: jnp.where(no_res, a, b), upd, upd_lv
    )
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(update_gain, a, b), upd_final, st
    )

    # UpdateCompressor (agc_manager_direct.cc:399-424).
    new_comp_valid = jnp.asarray(False)
    if not disable_digital_adaptive:
        differs = st.compression != st.target_compression
        acc = st.compression_accumulator + jnp.where(
            st.target_compression > st.compression,
            COMPRESSION_GAIN_STEP, -COMPRESSION_GAIN_STEP,
        )
        nearest = jnp.floor(acc + 0.5).astype(jnp.int32)
        snap2 = jnp.abs(acc - nearest.astype(jnp.float32)) < (
            COMPRESSION_GAIN_STEP / 2
        )
        new_comp = jnp.where(snap2, nearest, st.compression)
        changed = differs & (new_comp != st.compression)
        st = st.replace(
            compression=jnp.where(differs, new_comp, st.compression),
            compression_accumulator=jnp.where(
                differs,
                jnp.where(changed, new_comp.astype(jnp.float32), acc),
                st.compression_accumulator,
            ),
        )
        new_comp_valid = changed

    st = st.replace(
        is_first_frame=jnp.asarray(False),
        frames_since_update_gain=jnp.minimum(
            st.frames_since_update_gain + 1, OVERRIDE_WAIT_FRAMES + 1
        ),
        new_compression_valid=new_comp_valid,
        new_compression=st.compression,
    )
    return st, voice_prob


def mono_handle_clipping(st: MonoAgcState, step, clipped_level_min: int,
                         do_it):
    """HandleClipping (agc_manager_direct.cc:238-264)."""
    new_max = jnp.maximum(clipped_level_min, st.max_level - step)
    with_max = _set_max_level(st, new_max, clipped_level_min)
    adjust = st.level > clipped_level_min
    target = jnp.maximum(clipped_level_min, st.level - step)
    adj, _ = _set_level(with_max, target)
    adj = _agc_reset(adj).replace(
        frames_since_update_gain=jnp.asarray(0, jnp.int32),
        is_first_frame=jnp.asarray(False),
    )
    picked = jax.tree_util.tree_map(
        lambda a, b: jnp.where(adjust, a, b), adj, with_max
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(do_it, a, b), picked, st
    )


# ------------------------------------------------------ AgcManagerDirect


@struct.dataclass
class AgcManagerDirectState:
    monos: MonoAgcState  # vmapped (C,)
    frames_since_clipped: jnp.ndarray  # () int32
    recommended_input_volume: jnp.ndarray  # () int32


def init_state(num_channels: int,
               clipped_wait_frames: int = 300) -> AgcManagerDirectState:
    one = init_mono_agc()
    monos = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_channels,) + x.shape), one
    )
    return AgcManagerDirectState(
        monos=monos,
        frames_since_clipped=jnp.asarray(clipped_wait_frames, jnp.int32),
        recommended_input_volume=jnp.asarray(0, jnp.int32),
    )


def set_stream_analog_level(st: AgcManagerDirectState, level):
    """set_stream_analog_level (agc_manager_direct.cc:687-697)."""
    lv = jnp.asarray(level, jnp.int32)
    monos = st.monos.replace(
        recommended_input_volume=jnp.broadcast_to(
            lv, st.monos.recommended_input_volume.shape
        )
    )
    st = st.replace(monos=monos)
    return _aggregate(st)


def _aggregate(st: AgcManagerDirectState):
    """AggregateChannelLevels (agc_manager_direct.cc:699-724)."""
    return st.replace(
        recommended_input_volume=jnp.min(
            st.monos.recommended_input_volume
        )
    )


def analyze_pre_process(st: AgcManagerDirectState, audio,
                        clipped_level_step: int = 15,
                        clipped_ratio_threshold: float = 0.1,
                        clipped_wait_frames: int = 300,
                        clipped_level_min: int = 70):
    """AnalyzePreProcess (agc_manager_direct.cc:545-621), without the
    clipping predictor (analog_config.clipping_predictor.enabled defaults
    to false)."""
    st = _aggregate(st)
    clipped = (audio >= 32767.0) | (audio <= -32768.0)
    ratio = jnp.max(jnp.mean(clipped.astype(jnp.float32), axis=0))
    waiting = st.frames_since_clipped < clipped_wait_frames
    detected = ~waiting & (ratio > clipped_ratio_threshold)
    monos = jax.vmap(
        lambda m: mono_handle_clipping(
            m, jnp.asarray(clipped_level_step, jnp.int32),
            clipped_level_min, detected,
        )
    )(st.monos)
    frames = jnp.where(
        detected, 0,
        jnp.minimum(st.frames_since_clipped + waiting.astype(jnp.int32),
                    clipped_wait_frames),
    )
    st = st.replace(monos=monos, frames_since_clipped=frames)
    return _aggregate(st)


def process(st: AgcManagerDirectState, band0, phase: int,
            clipped_level_min: int = 70,
            min_mic_level: int = MIN_MIC_LEVEL,
            disable_digital_adaptive: bool = False,
            speech_probability=None, speech_level_dbfs=None):
    """Process (agc_manager_direct.cc:624-658).

    band0: (160, C) int32 split band 0 at 16 kHz. Returns
    (state, recommended_volume, compression_gain, voice_probability)."""
    st = _aggregate(st)

    if speech_probability is not None and speech_level_dbfs is not None:
        ovr = jnp.where(
            speech_probability < OVERRIDE_SPEECH_PROB_SILENCE_THRESHOLD,
            0,
            jnp.round(
                OVERRIDE_TARGET_SPEECH_LEVEL_DBFS
                - jnp.clip(speech_level_dbfs, -90.0, 30.0)
            ).astype(jnp.int32),
        )
        has_ovr = jnp.asarray(True)
    else:
        ovr = jnp.asarray(0, jnp.int32)
        has_ovr = None

    def one(m, x):
        return mono_agc_process(
            m, x, phase, clipped_level_min, min_mic_level,
            disable_digital_adaptive, ovr,
            has_ovr if has_ovr is not None else None,
        )

    if has_ovr is None:
        monos, vps = jax.vmap(
            lambda m, x: mono_agc_process(
                m, x, phase, clipped_level_min, min_mic_level,
                disable_digital_adaptive, None, None,
            )
        )(st.monos, band0.T)
    else:
        monos, vps = jax.vmap(one)(st.monos, band0.T)
    st = st.replace(monos=monos)
    st = _aggregate(st)
    # Compression from the channel controlling the gain (min volume).
    ctrl = jnp.argmin(monos.recommended_input_volume)
    compression = monos.new_compression[ctrl]
    return st, st.recommended_input_volume, compression, jnp.max(vps)
