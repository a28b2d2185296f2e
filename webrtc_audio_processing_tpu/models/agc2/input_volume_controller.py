"""InputVolumeController: AGC2 microphone input-volume recommendation.

Reference: agc2/input_volume_controller.{h,cc}, agc2/gain_map_internal.h,
agc2/clipping_predictor.{h,cc}, agc2/clipping_predictor_level_buffer.cc.

Design: all the reference's per-channel scalar control flow (volume checks,
clipping handling, speech-gated updates) is expressed as jnp.where lattices
over a vmapped per-channel state; the gain-map while-loops collapse into
masked argmax searches over the static 256-entry map.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

MAX_INPUT_VOLUME = 255
VOLUME_QUANTIZATION_SLACK = 25
MAX_ABS_RMS_ERROR_DBFS = 15
CLIPPING_PREDICTOR_MAX_GAIN_CHANGE = 15

# kGainMap (gain_map_internal.h:17-44), reproduced from its documented
# generator formula: round(SF*x + (SI-SF)*(1-exp(-D*x))/D - 56).
_SI, _SF, _D = 2.0, 0.25, 8.0 / 256.0
_x = np.linspace(0, 255, 256)
GAIN_MAP = np.round(
    _SF * _x + (_SI - _SF) * (1.0 - np.exp(-_D * _x)) / _D - 56.0
).astype(np.int32)
assert GAIN_MAP[0] == -56 and GAIN_MAP[-1] == 64 and GAIN_MAP[48] == 0


@dataclasses.dataclass(frozen=True)
class ClippingPredictorConfig:
    """GainController1::AnalogGainController::ClippingPredictor
    (audio_processing.h:294-319)."""

    enabled: bool = False
    mode: int = 0  # 0: event, 1: adaptive-step peak, 2: fixed-step peak
    window_length: int = 5
    reference_window_length: int = 5
    reference_window_delay: int = 5
    clipping_threshold: float = -1.0
    crest_factor_margin: float = 3.0
    use_predicted_step: bool = True

    @property
    def buffer_length(self) -> int:
        return self.reference_window_delay + self.reference_window_length


@dataclasses.dataclass(frozen=True)
class InputVolumeControllerConfig:
    """InputVolumeController::Config (input_volume_controller.h:37-70)."""

    min_input_volume: int = 20
    clipped_level_min: int = 70
    clipped_level_step: int = 15
    clipped_ratio_threshold: float = 0.1
    clipped_wait_frames: int = 300
    enable_clipping_predictor: bool = True
    target_range_max_dbfs: int = -30
    target_range_min_dbfs: int = -50
    update_input_volume_wait_frames: int = 100
    speech_probability_threshold: float = 0.7
    speech_ratio_threshold: float = 0.6

    @property
    def clipping_predictor(self) -> ClippingPredictorConfig:
        return ClippingPredictorConfig(
            enabled=self.enable_clipping_predictor
        )


def _float_s16_to_dbfs(v):
    """FloatS16ToDbfs (common_audio/include/audio_util.h)."""
    return 20.0 * jnp.log10(jnp.maximum(v, 1e-20) / 32768.0)


def compute_volume_update(gain_error_db, input_volume, min_input_volume,
                          max_input_volume=MAX_INPUT_VOLUME):
    """ComputeVolumeUpdate (input_volume_controller.cc:61-83), while-loops
    over the gain map replaced by masked first-index searches."""
    gm = jnp.asarray(GAIN_MAP)
    vols = jnp.arange(256)
    base = gm[input_volume]

    # Ascending walk: first v >= input_volume with gm[v]-base >= err.
    up_ok = (gm - base >= gain_error_db) & (vols >= input_volume)
    up = jnp.where(jnp.any(up_ok), jnp.argmax(up_ok),
                   jnp.asarray(max_input_volume))
    up = jnp.minimum(up, max_input_volume)

    # Descending walk: first v <= input_volume (downwards) with
    # gm[v]-base <= err, floored at min_input_volume.
    down_ok = (gm - base <= gain_error_db) & (vols <= input_volume) & (
        vols >= min_input_volume
    )
    down = jnp.where(jnp.any(down_ok), 255 - jnp.argmax(down_ok[::-1]),
                     min_input_volume)
    down = jnp.maximum(down, min_input_volume)

    return jnp.where(
        gain_error_db == 0,
        input_volume,
        jnp.where(gain_error_db > 0, up, down),
    ).astype(jnp.int32)


def get_speech_level_rms_error_db(speech_level_dbfs, range_min, range_max):
    """GetSpeechLevelRmsErrorDb (input_volume_controller.cc:117-135)."""
    lvl = jnp.clip(speech_level_dbfs, -90.0, 30.0)
    err = jnp.where(
        lvl > range_max,
        jnp.round(range_max - lvl),
        jnp.where(lvl < range_min, jnp.round(range_min - lvl), 0.0),
    )
    return err.astype(jnp.int32)


# ------------------------------------------------------------------ mono


@struct.dataclass
class MonoInputVolumeControllerState:
    recommended_input_volume: jnp.ndarray  # () int32
    last_recommended_input_volume: jnp.ndarray  # () int32
    max_input_volume: jnp.ndarray  # () int32
    check_volume_on_next_process: jnp.ndarray  # () bool
    startup: jnp.ndarray  # () bool
    frames_since_update: jnp.ndarray  # () int32
    speech_frames_since_update: jnp.ndarray  # () int32
    is_first_frame: jnp.ndarray  # () bool


def init_mono_state() -> MonoInputVolumeControllerState:
    return MonoInputVolumeControllerState(
        recommended_input_volume=jnp.asarray(0, jnp.int32),
        last_recommended_input_volume=jnp.asarray(0, jnp.int32),
        max_input_volume=jnp.asarray(MAX_INPUT_VOLUME, jnp.int32),
        check_volume_on_next_process=jnp.asarray(True),
        startup=jnp.asarray(True),
        frames_since_update=jnp.asarray(0, jnp.int32),
        speech_frames_since_update=jnp.asarray(0, jnp.int32),
        is_first_frame=jnp.asarray(True),
    )


def _check_volume_and_reset(cfg: InputVolumeControllerConfig, st):
    """CheckVolumeAndReset (input_volume_controller.cc:323-356)."""
    vol = st.recommended_input_volume
    skip = (vol == 0) & ~st.startup
    raised = jnp.maximum(vol, cfg.min_input_volume)
    return st.replace(
        recommended_input_volume=jnp.where(skip, vol, raised),
        last_recommended_input_volume=jnp.where(
            skip, st.last_recommended_input_volume, raised
        ),
        startup=jnp.where(skip, st.startup, False),
        frames_since_update=jnp.where(skip, st.frames_since_update, 0),
        speech_frames_since_update=jnp.where(
            skip, st.speech_frames_since_update, 0
        ),
        is_first_frame=jnp.where(skip, st.is_first_frame, True),
    )


def _set_input_volume(cfg: InputVolumeControllerConfig, st, new_volume):
    """SetInputVolume (input_volume_controller.cc:252-301)."""
    applied = st.recommended_input_volume
    invalid = applied == 0  # (range violations cannot occur with int32 clip)

    last = st.last_recommended_input_volume
    manual = (applied > last + VOLUME_QUANTIZATION_SLACK) | (
        applied < last - VOLUME_QUANTIZATION_SLACK
    )
    # Manual adjustment branch.
    man_last = applied
    man_max = jnp.maximum(st.max_input_volume, applied)

    # Normal branch.
    clamped = jnp.minimum(new_volume, st.max_input_volume)
    take = ~invalid & ~manual & (clamped != last)

    return st.replace(
        recommended_input_volume=jnp.where(
            take, clamped, st.recommended_input_volume
        ),
        last_recommended_input_volume=jnp.where(
            invalid, last, jnp.where(manual, man_last,
                                     jnp.where(take, clamped, last))
        ),
        max_input_volume=jnp.where(~invalid & manual, man_max,
                                   st.max_input_volume),
        frames_since_update=jnp.where(~invalid & manual, 0,
                                      st.frames_since_update),
        speech_frames_since_update=jnp.where(
            ~invalid & manual, 0, st.speech_frames_since_update
        ),
        is_first_frame=jnp.where(~invalid & manual, False,
                                 st.is_first_frame),
    )


def mono_process(cfg: InputVolumeControllerConfig, st, rms_error_db,
                 has_rms_error, speech_probability):
    """MonoInputVolumeController::Process (input_volume_controller.cc:193)."""
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(st.check_volume_on_next_process, a, b),
        _check_volume_and_reset(cfg, st), st,
    )
    st = st.replace(check_volume_on_next_process=jnp.asarray(False))

    speech = speech_probability >= cfg.speech_probability_threshold
    speech_frames = st.speech_frames_since_update + speech.astype(jnp.int32)
    frames = st.frames_since_update + 1

    wait = max(cfg.update_input_volume_wait_frames, 1)
    due = frames >= wait
    speech_ratio = speech_frames.astype(jnp.float32) / float(wait)
    update = due & ~st.is_first_frame & (
        speech_ratio >= cfg.speech_ratio_threshold
    ) & has_rms_error

    # UpdateInputVolume (:358-369).
    err = jnp.clip(rms_error_db, -MAX_ABS_RMS_ERROR_DBFS,
                   MAX_ABS_RMS_ERROR_DBFS)
    new_vol = compute_volume_update(
        err, st.last_recommended_input_volume, cfg.min_input_volume
    )
    updated = _set_input_volume(cfg, st, new_vol)
    take_upd = update & (err != 0)
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(take_upd, a, b), updated, st
    )

    return st.replace(
        frames_since_update=jnp.where(due, 0, frames),
        speech_frames_since_update=jnp.where(due, 0, speech_frames),
        is_first_frame=jnp.asarray(False),
    )


def mono_handle_clipping(cfg: InputVolumeControllerConfig, st,
                         clipped_level_step, do_it):
    """HandleClipping (input_volume_controller.cc:228-250)."""
    new_max = jnp.maximum(cfg.clipped_level_min,
                          st.max_input_volume - clipped_level_step)
    adjust = st.last_recommended_input_volume > cfg.clipped_level_min
    target = jnp.maximum(
        cfg.clipped_level_min,
        st.last_recommended_input_volume - clipped_level_step,
    )
    adjusted = _set_input_volume(cfg, st.replace(max_input_volume=new_max),
                                 target)
    adjusted = adjusted.replace(
        frames_since_update=jnp.asarray(0, jnp.int32),
        speech_frames_since_update=jnp.asarray(0, jnp.int32),
        is_first_frame=jnp.asarray(False),
    )
    no_adjust = st.replace(max_input_volume=new_max)
    picked = jax.tree_util.tree_map(
        lambda a, b: jnp.where(adjust, a, b), adjusted, no_adjust
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(do_it, a, b), picked, st
    )


# ------------------------------------------------- clipping predictor


@struct.dataclass
class ClippingPredictorState:
    """Per-channel level ring (clipping_predictor_level_buffer.cc)."""

    averages: jnp.ndarray  # (C, L) float32 frame mean-squares
    maxima: jnp.ndarray  # (C, L) float32 frame peaks
    tail: jnp.ndarray  # () int32
    size: jnp.ndarray  # () int32


def init_clipping_predictor(num_channels: int,
                            cfg: ClippingPredictorConfig):
    L = cfg.buffer_length
    return ClippingPredictorState(
        averages=jnp.zeros((num_channels, L), jnp.float32),
        maxima=jnp.zeros((num_channels, L), jnp.float32),
        tail=jnp.asarray(-1, jnp.int32),
        size=jnp.asarray(0, jnp.int32),
    )


def clipping_predictor_analyze(cfg: ClippingPredictorConfig, st, audio):
    """Analyze (clipping_predictor.cc:115-133): push per-frame metrics."""
    mean_sq = jnp.mean(audio * audio, axis=0)  # (C,)
    peak = jnp.max(jnp.abs(audio), axis=0)
    L = cfg.buffer_length
    tail = jnp.mod(st.tail + 1, L)
    return st.replace(
        averages=st.averages.at[:, tail].set(mean_sq),
        maxima=st.maxima.at[:, tail].set(peak),
        tail=tail,
        size=jnp.minimum(st.size + 1, L),
    )


def _partial_metrics(cfg: ClippingPredictorConfig, st, delay, num_items):
    """ComputePartialMetrics (clipping_predictor_level_buffer.cc:39-62)."""
    L = cfg.buffer_length
    idx = jnp.mod(st.tail - delay - jnp.arange(num_items), L)
    avg = jnp.mean(st.averages[:, idx], axis=-1)
    mx = jnp.max(st.maxima[:, idx], axis=-1)
    valid = (delay + num_items) <= st.size
    return avg, mx, valid


def clipping_predictor_step(cfg: ClippingPredictorConfig, st,
                            level, default_step, min_level=70):
    """EstimateClippedLevelStep for all channels at once.

    Returns (has_step (C,), step (C,)) for the default event-prediction mode
    (clipping_predictor.cc:140-196); peak modes (:277-322) share the same
    metrics plumbing.
    """
    a_w, m_w, ok_w = _partial_metrics(cfg, st, 0, cfg.window_length)
    a_r, m_r, ok_r = _partial_metrics(
        cfg, st, cfg.reference_window_delay, cfg.reference_window_length
    )
    crest = _float_s16_to_dbfs(m_w) - _float_s16_to_dbfs(jnp.sqrt(a_w))
    crest_ref = _float_s16_to_dbfs(m_r) - _float_s16_to_dbfs(jnp.sqrt(a_r))
    above = _float_s16_to_dbfs(m_w) > cfg.clipping_threshold

    if cfg.mode == 0:
        predicted = ok_w & ok_r & above & (
            crest < crest_ref - cfg.crest_factor_margin
        )
        new_level = jnp.clip(level - default_step, min_level,
                             MAX_INPUT_VOLUME)
        step = level - new_level
        has = predicted & (level > min_level) & (step > 0)
        return has, step * jnp.ones_like(crest, dtype=jnp.int32)
    else:
        projected_peak = crest_ref + _float_s16_to_dbfs(jnp.sqrt(a_w))
        predicted = ok_w & ok_r & above & (
            projected_peak > cfg.clipping_threshold
        )
        if cfg.mode == 2:
            step = jnp.full_like(crest, default_step).astype(jnp.int32)
        else:
            gain_change = jnp.clip(
                -jnp.ceil(projected_peak).astype(jnp.int32),
                -CLIPPING_PREDICTOR_MAX_GAIN_CHANGE, 0,
            )
            vol = jax.vmap(
                lambda g: compute_volume_update(g, level, min_level)
            )(gain_change)
            step = jnp.maximum(level - vol, default_step)
        new_level = jnp.clip(level - step, min_level, MAX_INPUT_VOLUME)
        has = predicted & (level > min_level) & (level > new_level)
        return has, (level - new_level).astype(jnp.int32)


# ------------------------------------------------------------- top level


@struct.dataclass
class InputVolumeControllerState:
    monos: MonoInputVolumeControllerState  # vmapped (C,)
    frames_since_clipped: jnp.ndarray  # () int32
    predictor: ClippingPredictorState | None
    applied_input_volume: jnp.ndarray  # () int32, -1 = unset
    recommended_input_volume: jnp.ndarray  # () int32


def init_state(cfg: InputVolumeControllerConfig,
               num_channels: int) -> InputVolumeControllerState:
    one = init_mono_state()
    monos = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_channels,) + x.shape), one
    )
    return InputVolumeControllerState(
        monos=monos,
        frames_since_clipped=jnp.asarray(cfg.clipped_wait_frames, jnp.int32),
        predictor=(
            init_clipping_predictor(num_channels, cfg.clipping_predictor)
            if cfg.enable_clipping_predictor else None
        ),
        applied_input_volume=jnp.asarray(-1, jnp.int32),
        recommended_input_volume=jnp.asarray(0, jnp.int32),
    )


def _aggregate(cfg: InputVolumeControllerConfig, st):
    """AggregateChannelLevels (input_volume_controller.cc:578-597)."""
    rec = jnp.min(st.monos.recommended_input_volume)
    rec = jnp.where(
        (st.applied_input_volume >= 0) & (st.applied_input_volume > 0),
        jnp.maximum(rec, cfg.min_input_volume),
        rec,
    )
    return st.replace(recommended_input_volume=rec)


def analyze_input_audio(cfg: InputVolumeControllerConfig, st,
                        applied_input_volume, audio):
    """AnalyzeInputAudio (input_volume_controller.cc:429-518).

    audio: (N, C) float_s16 pre-processing capture frame.
    """
    st = st.replace(
        applied_input_volume=jnp.asarray(applied_input_volume, jnp.int32),
        monos=st.monos.replace(
            recommended_input_volume=jnp.broadcast_to(
                jnp.asarray(applied_input_volume, jnp.int32),
                st.monos.recommended_input_volume.shape,
            )
        ),
    )
    st = _aggregate(cfg, st)

    pred = st.predictor
    if pred is not None:
        pred = clipping_predictor_analyze(cfg.clipping_predictor, pred,
                                          audio)

    # ComputeClippedRatio (:87-103): max across channels of per-channel
    # clipped-sample counts.
    clipped = (audio >= 32767.0) | (audio <= -32768.0)
    ratio = jnp.max(jnp.mean(clipped.astype(jnp.float32), axis=0))

    waiting = st.frames_since_clipped < cfg.clipped_wait_frames
    clipping_detected = ~waiting & (ratio > cfg.clipped_ratio_threshold)

    step = jnp.asarray(cfg.clipped_level_step, jnp.int32)
    act = clipping_detected
    if pred is not None:
        pcfg = cfg.clipping_predictor
        has, steps = clipping_predictor_step(
            pcfg, pred, st.recommended_input_volume, cfg.clipped_level_step,
            min_level=cfg.clipped_level_min,
        )
        clipping_predicted = ~waiting & jnp.any(has)
        predicted_step = jnp.maximum(
            jnp.max(jnp.where(has, steps, 0)), cfg.clipped_level_step
        )
        if pcfg.use_predicted_step:
            step = jnp.where(clipping_predicted, predicted_step, step)
            act = act | clipping_predicted
    monos = jax.vmap(
        lambda m: mono_handle_clipping(cfg, m, step, act)
    )(st.monos)
    frames_since = jnp.where(
        act, 0, jnp.minimum(st.frames_since_clipped + waiting.astype(
            jnp.int32), cfg.clipped_wait_frames)
    )
    if pred is not None:
        # Reset() on clipping action: zero the ring.
        pred = jax.tree_util.tree_map(
            lambda z, i: jnp.where(act, i, z),
            pred, init_clipping_predictor(
                pred.averages.shape[0], cfg.clipping_predictor
            ),
        )

    st = st.replace(monos=monos, frames_since_clipped=frames_since,
                    predictor=pred)
    return _aggregate(cfg, st)


def recommend_input_volume(cfg: InputVolumeControllerConfig, st,
                           speech_probability, speech_level_dbfs,
                           has_speech_level):
    """RecommendInputVolume (input_volume_controller.cc:520-557).

    Returns (state, recommended_volume, valid flag)."""
    valid = st.applied_input_volume >= 0
    st = _aggregate(cfg, st)

    rms_error = get_speech_level_rms_error_db(
        speech_level_dbfs, cfg.target_range_min_dbfs,
        cfg.target_range_max_dbfs,
    )
    monos = jax.vmap(
        lambda m: mono_process(cfg, m, rms_error, has_speech_level,
                               speech_probability)
    )(st.monos)
    # Only commit the Process results when the applied volume was set.
    monos = jax.tree_util.tree_map(
        lambda a, b: jnp.where(valid, a, b), monos, st.monos
    )
    st = _aggregate(cfg, st.replace(monos=monos))
    st = st.replace(applied_input_volume=jnp.asarray(-1, jnp.int32))
    return st, st.recommended_input_volume, valid
