"""Legacy analog AGC (mic volume recommendation loop, Q-math twin).

Reference: agc/legacy/analog_agc.{h,cc} — WebRtcAgc_Init/AddMic/AddFarend/
VirtualMic/ProcessAnalog/Analyze. The per-5-subframe decision loop
(analog_agc.cc:668-867) runs as a lax.scan with branch predication; all the
saturation/zero/speaker-inactive controls and the Rxx energy trackers keep
the reference's exact integer arithmetic.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.models.agc1 import digital
from webrtc_audio_processing_tpu.ops import spl

RXX_BUFFER_LEN = 10
ALPHA_SHORT = 6
ALPHA_LONG = 10
MSEC_INNER = 520
MSEC_OUTER = 340
NORMAL_VAD_THRESHOLD = 400
MUTE_GUARD_MS = 8000

_SLOPE1 = np.array([21793, 12517, 7189, 4129, 2372, 1362, 472, 78])
_OFFSET1 = np.array([25395, 23911, 22206, 20737, 19612, 18805, 17951, 17367])
_SLOPE2 = np.array([2063, 1731, 1452, 1218, 1021, 857, 597, 337])
_OFFSET2 = np.array([18432, 18379, 18290, 18177, 18052, 17920, 17670, 17286])

GAIN_TABLE_ANALOG = np.array([
    4096, 4251, 4412, 4579, 4752, 4932, 5118, 5312, 5513, 5722, 5938,
    6163, 6396, 6638, 6889, 7150, 7420, 7701, 7992, 8295, 8609, 8934,
    9273, 9623, 9987, 10365, 10758, 11165, 11587, 12025, 12480, 12953],
    np.int32)

GAIN_TABLE_VIRTUAL_MIC = np.array([
    1052, 1081, 1110, 1141, 1172, 1204, 1237, 1271, 1305, 1341, 1378,
    1416, 1454, 1494, 1535, 1577, 1620, 1664, 1710, 1757, 1805, 1854,
    1905, 1957, 2010, 2065, 2122, 2180, 2239, 2301, 2364, 2428, 2495,
    2563, 2633, 2705, 2779, 2855, 2933, 3013, 3096, 3180, 3267, 3357,
    3449, 3543, 3640, 3739, 3842, 3947, 4055, 4166, 4280, 4397, 4517,
    4640, 4767, 4898, 5032, 5169, 5311, 5456, 5605, 5758, 5916, 6078,
    6244, 6415, 6590, 6770, 6956, 7146, 7341, 7542, 7748, 7960, 8178,
    8402, 8631, 8867, 9110, 9359, 9615, 9878, 10148, 10426, 10711, 11004,
    11305, 11614, 11932, 12258, 12593, 12938, 13292, 13655, 14029, 14412,
    14807, 15212, 15628, 16055, 16494, 16945, 17409, 17885, 18374, 18877,
    19393, 19923, 20468, 21028, 21603, 22194, 22801, 23425, 24065, 24724,
    25400, 26095, 26808, 27541, 28295, 29069, 29864, 30681, 31520, 32382],
    np.int32)

SUPPRESSION_TABLE_VIRTUAL_MIC = np.array([
    1024, 1006, 988, 970, 952, 935, 918, 902, 886, 870, 854, 839, 824, 809,
    794, 780, 766, 752, 739, 726, 713, 700, 687, 675, 663, 651, 639, 628,
    616, 605, 594, 584, 573, 563, 553, 543, 533, 524, 514, 505, 496, 487,
    478, 470, 461, 453, 445, 437, 429, 421, 414, 406, 399, 392, 385, 378,
    371, 364, 358, 351, 345, 339, 333, 327, 321, 315, 309, 304, 298, 293,
    288, 283, 278, 273, 268, 263, 258, 254, 249, 244, 240, 236, 232, 227,
    223, 219, 215, 211, 208, 204, 200, 197, 193, 190, 186, 183, 180, 176,
    173, 170, 167, 164, 161, 158, 155, 153, 150, 147, 145, 142, 139, 137,
    134, 132, 130, 127, 125, 123, 121, 118, 116, 114, 112, 110, 108, 106,
    104, 102], np.int32)

TARGET_LEVEL_TABLE = np.array([
    134209536, 106606424, 84680493, 67264106, 53429779, 42440782, 33711911,
    26778323, 21270778, 16895980, 13420954, 10660642, 8468049, 6726411,
    5342978, 4244078, 3371191, 2677832, 2127078, 1689598, 1342095, 1066064,
    846805, 672641, 534298, 424408, 337119, 267783, 212708, 168960, 134210,
    106606, 84680, 67264, 53430, 42441, 33712, 26778, 21271, 16896, 13421,
    10661, 8468, 6726, 5343, 4244, 3371, 2678, 2127, 1690, 1342, 1066, 847,
    673, 534, 424, 337, 268, 213, 169, 134, 107, 85, 67], np.int64)


class LegacyAgcConfig:
    """Static Init + set_config outputs (analog_agc.cc:1044-1100 and
    WebRtcAgc_UpdateAgcThresholds :359-397)."""

    def __init__(self, min_level=0, max_level=255,
                 agc_mode=digital.AGC_MODE_ADAPTIVE_ANALOG, fs=16000,
                 target_level_dbfs=3, compression_gain_db=9,
                 limiter_enable=True):
        if agc_mode == digital.AGC_MODE_ADAPTIVE_DIGITAL:
            min_level, max_level = 0, 255
        self.agc_mode = agc_mode
        self.fs = fs
        self.scale = 0
        max_add = (max_level - min_level) // 4
        self.min_level = min_level
        self.max_analog = max_level
        self.max_level = max_level + max_add
        self.max_init = self.max_level
        self.min_output = min_level + (((self.max_level - min_level) * 10) >> 8)
        self.target_level_dbfs = target_level_dbfs
        self.limiter_enable = limiter_enable
        comp = compression_gain_db
        if agc_mode == digital.AGC_MODE_FIXED_DIGITAL:
            comp += target_level_dbfs
        self.compression_gain_db = comp

        # UpdateAgcThresholds.
        tmp16 = 5 * comp + 5  # DIFF_REF_TO_ANALOG * comp + ANALOG_TARGET/2
        tmp16 = int(tmp16 / 11)
        self.analog_target = max(4 + tmp16, 4)
        if agc_mode == digital.AGC_MODE_FIXED_DIGITAL:
            self.analog_target = comp
        self.target_idx = 11 + 9  # ANALOG_TARGET_LEVEL + OFFSET_ENV_TO_RMS
        t = self.target_idx
        tab = TARGET_LEVEL_TABLE
        self.analog_target_level = int(RXX_BUFFER_LEN * tab[t])
        self.start_upper_limit = int(RXX_BUFFER_LEN * tab[t - 1])
        self.start_lower_limit = int(RXX_BUFFER_LEN * tab[t + 1])
        self.upper_primary_limit = int(RXX_BUFFER_LEN * tab[t - 2])
        self.lower_primary_limit = int(RXX_BUFFER_LEN * tab[t + 2])
        self.upper_secondary_limit = int(RXX_BUFFER_LEN * tab[t - 5])
        self.lower_secondary_limit = int(RXX_BUFFER_LEN * tab[t + 5])

        self.gain_table = digital.calculate_gain_table(
            comp, target_level_dbfs, limiter_enable, self.analog_target
        )


@struct.dataclass
class AnalogAgcState:
    """LegacyAgc (analog_agc.h:46-118)."""

    digital: digital.DigitalAgcState
    vad_mic: digital.AgcVadState
    env: jnp.ndarray  # (2, 10) int32
    rxx16w32: jnp.ndarray  # (2, 5) int32
    in_queue: jnp.ndarray  # () int32
    filter_state: jnp.ndarray  # (8,) int32
    env_sum: jnp.ndarray  # () int32
    mic_vol: jnp.ndarray  # () int32
    max_level: jnp.ndarray  # () int32 (dynamic: can be raised)
    mic_ref: jnp.ndarray  # () int32
    mic_gain_idx: jnp.ndarray  # () int32
    gain_table_idx: jnp.ndarray  # () int32
    last_in_mic_level: jnp.ndarray  # () int32
    first_call: jnp.ndarray  # () bool
    ms_zero: jnp.ndarray  # () int32
    ms_too_low: jnp.ndarray  # () int32
    ms_too_high: jnp.ndarray  # () int32
    change_to_slow_mode: jnp.ndarray  # () int32
    msec_inner: jnp.ndarray  # () int32
    msec_outer: jnp.ndarray  # () int32
    active_speech: jnp.ndarray  # () int32
    mute_guard_ms: jnp.ndarray  # () int32
    zero_ctrl_max: jnp.ndarray  # () int32
    vad_threshold: jnp.ndarray  # () int32
    low_level_signal: jnp.ndarray  # () bool
    upper_limit: jnp.ndarray  # () int32 (as int64-safe int32 scaled)
    lower_limit: jnp.ndarray  # () int32
    rxx160w32: jnp.ndarray  # () int32
    rxx16_lpw32: jnp.ndarray  # () int32
    rxx160_lpw32: jnp.ndarray  # () int32
    rxx16_lpw32_max: jnp.ndarray  # () int32
    rxx16_vector: jnp.ndarray  # (10,) int32
    rxx16_pos: jnp.ndarray  # () int32


def init_state(cfg: LegacyAgcConfig) -> AnalogAgcState:
    mic_vol = cfg.max_analog
    if cfg.agc_mode == digital.AGC_MODE_ADAPTIVE_DIGITAL:
        mic_vol = 127
    return AnalogAgcState(
        digital=digital.init_digital(cfg.agc_mode),
        vad_mic=digital.init_vad(),
        env=jnp.zeros((2, 10), jnp.int32),
        rxx16w32=jnp.zeros((2, 5), jnp.int32),
        in_queue=jnp.asarray(0, jnp.int32),
        filter_state=jnp.zeros((8,), jnp.int32),
        env_sum=jnp.asarray(0, jnp.int32),
        mic_vol=jnp.asarray(mic_vol, jnp.int32),
        max_level=jnp.asarray(cfg.max_level, jnp.int32),
        mic_ref=jnp.asarray(mic_vol, jnp.int32),
        mic_gain_idx=jnp.asarray(127, jnp.int32),
        gain_table_idx=jnp.asarray(0, jnp.int32),
        last_in_mic_level=jnp.asarray(0, jnp.int32),
        first_call=jnp.asarray(False),
        ms_zero=jnp.asarray(0, jnp.int32),
        ms_too_low=jnp.asarray(0, jnp.int32),
        ms_too_high=jnp.asarray(0, jnp.int32),
        change_to_slow_mode=jnp.asarray(0, jnp.int32),
        msec_inner=jnp.asarray(MSEC_INNER, jnp.int32),
        msec_outer=jnp.asarray(MSEC_OUTER, jnp.int32),
        active_speech=jnp.asarray(0, jnp.int32),
        mute_guard_ms=jnp.asarray(0, jnp.int32),
        zero_ctrl_max=jnp.asarray(cfg.max_analog, jnp.int32),
        vad_threshold=jnp.asarray(NORMAL_VAD_THRESHOLD, jnp.int32),
        low_level_signal=jnp.asarray(False),
        upper_limit=jnp.asarray(cfg.start_upper_limit, jnp.int32),
        lower_limit=jnp.asarray(cfg.start_lower_limit, jnp.int32),
        rxx160w32=jnp.asarray(125 * RXX_BUFFER_LEN, jnp.int32),
        rxx16_lpw32=jnp.asarray(16284, jnp.int32),
        rxx160_lpw32=jnp.asarray(cfg.analog_target_level, jnp.int32),
        rxx16_lpw32_max=jnp.asarray(0, jnp.int32),
        rxx16_vector=jnp.full((10,), 1000, jnp.int32),
        rxx16_pos=jnp.asarray(0, jnp.int32),
    )


def add_far_end(state: AnalogAgcState, far):
    """WebRtcAgc_AddFarend (analog_agc.cc:207-217)."""
    return state.replace(digital=digital.add_farend(state.digital, far))


def add_mic(cfg: LegacyAgcConfig, state: AnalogAgcState, bands):
    """WebRtcAgc_AddMic (analog_agc.cc:99-205).

    bands: (num_bands, N) int32. Returns (state, modified bands).
    """
    n = bands.shape[-1]
    L = n // 10

    # Slowly-varying digital pre-gain when micVol > maxAnalog (:114-155).
    over = state.mic_vol > cfg.max_analog
    tmp16 = state.mic_vol - cfg.max_analog
    denom = max(cfg.max_level - cfg.max_analog, 1)
    target_idx = (31 * tmp16) // denom
    gidx = jnp.where(
        over,
        jnp.clip(
            state.gain_table_idx
            + jnp.sign(target_idx - state.gain_table_idx),
            0, 31,
        ),
        0,
    )
    gain = jnp.asarray(GAIN_TABLE_ANALOG)[gidx]
    bands = jnp.where(
        over, jnp.clip((bands * gain) >> 12, -32768, 32767), bands
    )

    # Envelope per sub-frame (:157-173).
    env_new = jnp.max(
        (bands[0] * bands[0]).reshape(10, L), axis=1
    ).astype(jnp.int32)
    slot = jnp.where(state.in_queue > 0, 1, 0)
    env = state.env.at[slot].set(env_new)

    # Energy in 16-sample blocks at 8 kHz (:175-189).
    if cfg.fs == 16000:
        ds, filter_state = spl.downsample_by_2(bands[0], state.filter_state)
    else:
        ds, filter_state = bands[0], state.filter_state
    blocks = ds[: 5 * 16].reshape(5, 16)
    rxx16 = jnp.sum((blocks * blocks) >> 4, axis=1).astype(jnp.int32)
    rxx = state.rxx16w32.at[slot].set(rxx16)

    in_queue = jnp.where(state.in_queue == 0, 1, 2)

    vad_mic, _ = digital.process_vad(state.vad_mic, bands[0])

    return (
        state.replace(
            env=env, rxx16w32=rxx, in_queue=in_queue,
            filter_state=filter_state, gain_table_idx=gidx, vad_mic=vad_mic,
        ),
        bands,
    )


def virtual_mic(cfg: LegacyAgcConfig, state: AnalogAgcState, bands,
                mic_level_in):
    """WebRtcAgc_VirtualMic (analog_agc.cc:290-408), the adaptive-digital
    front: low-level-signal detection, emulated mic gain from the virtual
    gain/suppression tables (per-sample clip backoff), then AddMic.

    bands: (num_bands, N) int32. Returns (state, bands, mic_level_out).
    """
    b0 = bands[0]
    n = b0.shape[-1]

    # Low-level-signal decision (:314-344): frame energy accumulated only
    # while below the limit, plus zero crossings. Summands are capped at
    # 2^23 so the int32 cumsum cannot overflow; the cap is far above the
    # limit, so the first-crossing index and every comparison below are
    # unchanged (accumulation stops at the crossing in the reference too —
    # "the correct value of the energy is not important").
    limit = jnp.asarray(5500 if cfg.fs == 8000 else 11000, jnp.int32)
    sq = jnp.minimum(b0 * b0, 1 << 23)
    c = jnp.cumsum(sq)
    hit = c >= limit
    k = jnp.where(jnp.any(hit), jnp.argmax(hit), n - 1)
    frame_nrg = c[k]
    zc = jnp.sum(((b0[1:] ^ b0[:-1]) < 0).astype(jnp.int32))
    low = jnp.where(
        (frame_nrg < 500) | (zc <= 5), True,
        jnp.where(
            zc <= 15, False,
            jnp.where(frame_nrg <= limit, True, zc >= 20),
        ),
    )

    # Restart on physical-level change (:345-358).
    mic_level_tmp = jnp.asarray(mic_level_in, jnp.int32) << cfg.scale
    restart = mic_level_tmp != state.mic_ref
    mic_vol = jnp.where(restart, 127, state.mic_vol)
    gain_idx = jnp.where(
        restart, 127, jnp.minimum(mic_vol, cfg.max_analog)
    )

    gain_tab = jnp.asarray(GAIN_TABLE_VIRTUAL_MIC, jnp.int32)
    supp_tab = jnp.asarray(SUPPRESSION_TABLE_VIRTUAL_MIC, jnp.int32)

    gain0 = jnp.where(
        gain_idx > 127, gain_tab[jnp.clip(gain_idx - 128, 0, 127)],
        supp_tab[jnp.clip(127 - gain_idx, 0, 127)],
    )

    def lookup_after_clip(g):
        # The reference uses `gainIdx - 127` after a clip (:370-384) —
        # deliberately reproduced, off-by-one and all.
        return jnp.where(
            g >= 127, gain_tab[jnp.clip(g - 127, 0, 127)],
            supp_tab[jnp.clip(127 - g, 0, 127)],
        )

    def step(carry, x):
        g_idx, g = carry
        x0 = x[0]
        t = (x0 * g) >> 10
        clipped = (t > 32767) | (t < -32768)
        t = jnp.clip(t, -32768, 32767)
        g_idx = g_idx - clipped.astype(jnp.int32)
        g = jnp.where(clipped, lookup_after_clip(g_idx), g)
        # Upper bands use the (possibly backed-off) gain of this sample.
        rest = jnp.clip((x[1:] * g) >> 10, -32768, 32767)
        return (g_idx, g), jnp.concatenate([t[None], rest])

    (gain_idx, _), out = jax.lax.scan(step, (gain_idx, gain0), bands.T)
    bands = out.T

    state = state.replace(
        low_level_signal=low,
        mic_ref=mic_level_tmp,
        mic_vol=mic_vol,
        mic_gain_idx=gain_idx,
    )
    mic_level_out = gain_idx >> cfg.scale
    state, bands = add_mic(cfg, state, bands)
    return state, bands, mic_level_out


def process_analog(cfg: LegacyAgcConfig, state: AnalogAgcState,
                   in_mic_level, echo):
    """WebRtcAgc_ProcessAnalog (analog_agc.cc:527-900).

    Returns (state, out_mic_level, saturation_warning).
    """
    vad_log_ratio = state.vad_mic.log_ratio
    in_lvl = jnp.asarray(in_mic_level, jnp.int32)

    # First-call startup volume (:553-568).
    tmp_vol = cfg.min_level + (((cfg.max_level - cfg.min_level) * 51) >> 9)
    raise_at_start = (
        ~state.first_call
        & (in_lvl < tmp_vol)
        & (cfg.agc_mode == digital.AGC_MODE_ADAPTIVE_ANALOG)
    )
    in_tmp = jnp.where(raise_at_start, tmp_vol, in_lvl)
    mic_vol = jnp.where(~state.first_call, in_tmp, state.mic_vol)

    # Digital-gain passthrough + manual-change handling (:570-600).
    in_tmp = jnp.where(
        (in_tmp == cfg.max_analog) & (mic_vol > cfg.max_analog),
        mic_vol, in_tmp,
    )
    low_manual = (in_tmp != mic_vol) & (in_tmp < cfg.min_output)
    in_tmp = jnp.where(low_manual, tmp_vol, in_tmp)
    mic_vol = jnp.where(low_manual, tmp_vol, mic_vol)
    stuck = (in_tmp != mic_vol) & (in_lvl == state.last_in_mic_level)
    in_tmp = jnp.where(stuck, mic_vol, in_tmp)
    mic_vol = jnp.where((in_tmp != mic_vol) & ~stuck, in_tmp, mic_vol)

    max_level = jnp.maximum(state.max_level, in_tmp)
    last_mic_vol = mic_vol

    # SaturationCtrl (:399-418).
    envv = state.env[0]
    env16 = envv >> 20
    env_sum = state.env_sum + jnp.sum(jnp.where(env16 > 875, env16, 0))
    saturated = env_sum > 25000
    env_sum = jnp.where(saturated, 0, env_sum)
    env_sum = (env_sum * 32440) >> 15

    rxx160_lp = state.rxx160_lpw32
    zero_ctrl_max = state.zero_ctrl_max
    ms_too_high = state.ms_too_high
    active_speech = state.active_speech
    rxx16_max = state.rxx16_lpw32_max
    msec_inner = state.msec_inner
    msec_outer = state.msec_outer
    change_slow = state.change_to_slow_mode
    mute_guard = state.mute_guard_ms
    upper_limit = state.upper_limit
    lower_limit = state.lower_limit

    rxx160_lp = jnp.where(saturated, (rxx160_lp // 8) * 7, rxx160_lp)
    zero_ctrl_max = jnp.where(saturated, mic_vol, zero_ctrl_max)
    sat_vol = ((29591 * (in_tmp - cfg.min_level)) >> 15) + cfg.min_level
    sat_vol = jnp.minimum(sat_vol, last_mic_vol - 2)
    mic_vol = jnp.where(saturated, sat_vol, mic_vol)
    in_tmp = jnp.where(saturated, mic_vol, in_tmp)
    saturation_warning = saturated & (mic_vol < cfg.min_output)
    ms_too_high = jnp.where(saturated, -100, ms_too_high)
    active_speech = jnp.where(saturated, 0, active_speech)
    rxx16_max = jnp.where(saturated, 0, rxx16_max)
    msec_inner = jnp.where(saturated, MSEC_INNER, msec_inner)
    msec_outer = jnp.where(saturated, MSEC_OUTER, msec_outer)
    change_slow = jnp.where(saturated, 0, change_slow)
    mute_guard = jnp.where(saturated, 0, mute_guard)
    upper_limit = jnp.where(saturated, cfg.start_upper_limit, upper_limit)
    lower_limit = jnp.where(saturated, cfg.start_lower_limit, lower_limit)

    # ZeroCtrl (:420-466).
    env_total = jnp.sum(envv)
    ms_zero = jnp.where(env_total < 500, state.ms_zero + 10, 0)
    mute_guard = jnp.maximum(mute_guard - 10, 0)
    zero_trip = ms_zero > 500
    ms_zero = jnp.where(zero_trip, 0, ms_zero)
    mid_val = (cfg.max_analog + cfg.min_level + 1) // 2
    raised = jnp.minimum((1126 * in_tmp) >> 10, zero_ctrl_max)
    do_raise = zero_trip & (in_tmp < mid_val)
    in_tmp = jnp.where(do_raise, raised, in_tmp)
    mic_vol = jnp.where(do_raise, raised, mic_vol)
    active_speech = jnp.where(zero_trip, 0, active_speech)
    rxx16_max = jnp.where(zero_trip, 0, rxx16_max)
    mute_guard = jnp.where(zero_trip, MUTE_GUARD_MS, mute_guard)

    # SpeakerInactiveCtrl (:468-494).
    std_lt = state.vad_mic.std_long_term
    vad_thr = jnp.where(
        std_lt < 2500,
        1500,
        (31 * state.vad_threshold
         + NORMAL_VAD_THRESHOLD
         + jnp.where(std_lt < 4500, (4500 - std_lt) // 2, 0)) >> 5,
    )

    # Main 5-subframe loop (:668-867).
    def subframe(carry, rxx16w32):
        (rxx160, rxx16_vec, rxx16_pos, rxx16_lp, active, rxx_max, rxx160_lp,
         ms_hi, ms_lo, chg_slow, m_inner, m_outer, up_lim, lo_lim, micv,
         in_t, maxlev, zc_max) = carry

        tmp32 = (rxx16w32 - rxx16_vec[rxx16_pos]) >> 3
        rxx160 = rxx160 + tmp32
        rxx16_vec = rxx16_vec.at[rxx16_pos].set(rxx16w32)
        rxx16_pos = jnp.mod(rxx16_pos + 1, RXX_BUFFER_LEN)
        rxx16_lp = rxx16_lp + ((rxx16w32 - rxx16_lp) >> ALPHA_SHORT)

        speech = vad_log_ratio > vad_thr

        # Startup Rxx160_LP capture (:688-699).
        early = active < 250
        rxx_max2 = jnp.where(
            speech & early, jnp.maximum(rxx_max, rxx16_lp), rxx_max
        )
        at250 = active == 250
        rxx160_lp = jnp.where(
            speech & at250, (rxx_max2 >> 3) * RXX_BUFFER_LEN, rxx160_lp
        )
        active = jnp.where(speech & (early | at250), active + 2, active)

        rxx160_lp = jnp.where(
            speech, rxx160_lp + ((rxx160 - rxx160_lp) >> ALPHA_LONG),
            rxx160_lp,
        )

        # Branches.
        b1 = speech & (rxx160_lp > cfg.upper_secondary_limit)
        b2 = speech & ~b1 & (rxx160_lp > up_lim)
        b3 = speech & ~b1 & ~b2 & (rxx160_lp < cfg.lower_secondary_limit)
        b4 = speech & ~b1 & ~b2 & ~b3 & (rxx160_lp < lo_lim)
        b5 = speech & ~b1 & ~b2 & ~b3 & ~b4

        ms_hi = jnp.where(b1 | b2, ms_hi + 2, jnp.where(b3 | b4 | b5, 0, ms_hi))
        ms_lo = jnp.where(b3 | b4, ms_lo + 2, jnp.where(b1 | b2 | b5, 0, ms_lo))
        chg_slow = jnp.where(b1 | b2 | b3 | b4, 0, chg_slow)

        # Branch 1/2: lower the level (:706-771).
        fire_hi1 = b1 & (ms_hi > m_outer)
        fire_hi2 = b2 & (ms_hi > m_inner)
        fire_hi = fire_hi1 | fire_hi2
        ms_hi = jnp.where(fire_hi, 0, ms_hi)
        rxx160_lp = jnp.where(fire_hi, (rxx160_lp >> 6) * 53, rxx160_lp)
        maxlev = jnp.where(
            fire_hi,
            jnp.maximum((15 * maxlev + micv) // 16, cfg.max_analog),
            maxlev,
        )
        zc_max = jnp.where(fire_hi, micv, zc_max)
        coef = jnp.where(fire_hi1, 31130, 31621)
        down_vol = ((coef * (in_t - cfg.min_level)) >> 15) + cfg.min_level
        down_vol1 = jnp.minimum(down_vol, micv - 2)
        down_vol2 = jnp.minimum(down_vol, micv - 1)
        micv = jnp.where(
            fire_hi1, down_vol1, jnp.where(fire_hi2, down_vol2, micv)
        )
        in_t = jnp.where(fire_hi, micv, in_t)
        active = jnp.where(fire_hi1, 0, active)
        rxx_max2 = jnp.where(fire_hi1, 0, rxx_max2)

        # Branch 3/4: raise the level (:773-848).
        fire_lo1 = b3 & (ms_lo > m_outer)
        fire_lo2 = b4 & (ms_lo > m_inner)
        fire_lo = fire_lo1 | fire_lo2
        ms_lo = jnp.where(fire_lo, 0, ms_lo)
        denom = max(cfg.max_init - cfg.min_level, 1)
        vol_norm = jnp.where(
            cfg.max_init != cfg.min_level,
            ((in_t - cfg.min_level) << 14) // denom,
            16384,
        )
        # ExpCurve (:497-524): index by thresholds.
        thresholds = jnp.asarray([1311, 2621, 3932, 5243, 6554, 7864, 12124])
        index = jnp.sum((vol_norm > thresholds).astype(jnp.int32))
        w1 = jnp.asarray(_OFFSET1)[index] - (
            (jnp.asarray(_SLOPE1)[index] * vol_norm) >> 13
        )
        w2 = jnp.asarray(_OFFSET2)[index] - (
            (jnp.asarray(_SLOPE2)[index] * vol_norm) >> 13
        )
        rxx160_lp = jnp.where(fire_lo, (rxx160_lp >> 6) * 67, rxx160_lp)
        up1 = ((w1 * (in_t - cfg.min_level)) >> 14) + cfg.min_level
        up2 = ((w2 * (in_t - cfg.min_level)) >> 14) + cfg.min_level
        up1 = jnp.maximum(up1, micv + 2)
        up2 = jnp.maximum(up2, micv + 1)
        micv = jnp.where(fire_lo1, up1, jnp.where(fire_lo2, up2, micv))
        in_t = jnp.where(fire_lo, micv, in_t)

        # Branch 5: in range (:850-866).
        go_slow = b5 & (chg_slow > 4000)
        m_inner = jnp.where(go_slow, 1000, m_inner)
        m_outer = jnp.where(go_slow, 500, m_outer)
        up_lim = jnp.where(go_slow, cfg.upper_primary_limit, up_lim)
        lo_lim = jnp.where(go_slow, cfg.lower_primary_limit, lo_lim)
        chg_slow = jnp.where(b5 & ~go_slow, chg_slow + 2, chg_slow)
        micv = jnp.where(b5, in_t, micv)

        return (rxx160, rxx16_vec, rxx16_pos, rxx16_lp, active, rxx_max2,
                rxx160_lp, ms_hi, ms_lo, chg_slow, m_inner, m_outer, up_lim,
                lo_lim, micv, in_t, maxlev, zc_max), None

    carry = (state.rxx160w32, state.rxx16_vector, state.rxx16_pos,
             state.rxx16_lpw32, active_speech, rxx16_max, rxx160_lp,
             ms_too_high, state.ms_too_low, change_slow, msec_inner,
             msec_outer, upper_limit, lower_limit, mic_vol, in_tmp,
             max_level, zero_ctrl_max)
    carry, _ = jax.lax.scan(subframe, carry, state.rxx16w32[0])
    (rxx160, rxx16_vec, rxx16_pos, rxx16_lp, active_speech, rxx16_max,
     rxx160_lp, ms_too_high, ms_too_low, change_slow, msec_inner, msec_outer,
     upper_limit, lower_limit, mic_vol, in_tmp, max_level,
     zero_ctrl_max) = carry

    # Echo / mute guard hold (:869-878).
    hold = (echo != 0) | ((mute_guard > 0) & (mute_guard < MUTE_GUARD_MS))
    mic_vol = jnp.where(hold, jnp.minimum(mic_vol, last_mic_vol), mic_vol)

    mic_vol = jnp.clip(mic_vol, cfg.min_output, max_level)
    out_level = jnp.minimum(mic_vol, cfg.max_analog)

    new_state = state.replace(
        env_sum=env_sum,
        mic_vol=mic_vol,
        max_level=max_level,
        last_in_mic_level=in_lvl,
        first_call=jnp.asarray(True),
        ms_zero=ms_zero,
        ms_too_low=ms_too_low,
        ms_too_high=ms_too_high,
        change_to_slow_mode=change_slow,
        msec_inner=msec_inner,
        msec_outer=msec_outer,
        active_speech=active_speech,
        mute_guard_ms=mute_guard,
        zero_ctrl_max=zero_ctrl_max,
        vad_threshold=vad_thr,
        upper_limit=upper_limit,
        lower_limit=lower_limit,
        rxx160w32=rxx160,
        rxx16_lpw32=rxx16_lp,
        rxx160_lpw32=rxx160_lp,
        rxx16_lpw32_max=rxx16_max,
        rxx16_vector=rxx16_vec,
        rxx16_pos=rxx16_pos,
    )
    return new_state, out_level, saturation_warning


def analyze(cfg: LegacyAgcConfig, state: AnalogAgcState, bands,
            in_mic_level, echo, gain_table=None):
    """WebRtcAgc_Analyze (analog_agc.cc:903-957).

    bands: (num_bands, N) int32 capture bands (after AddMic).
    gain_table: optional (32,) dynamic table (the hybrid AgcManagerDirect
    path switches compression gains at runtime, WebRtcAgc_set_config).
    Returns (state, gains (11,), out_mic_level, saturation_warning).
    """
    if gain_table is None:
        gain_table = jnp.asarray(cfg.gain_table)
    dig, gains = digital.compute_digital_gains(
        state.digital, bands[0], cfg.agc_mode, gain_table,
        state.low_level_signal,
    )
    state = state.replace(digital=dig)

    out_level = jnp.asarray(in_mic_level, jnp.int32)
    warn = jnp.asarray(False)
    if cfg.agc_mode < digital.AGC_MODE_FIXED_DIGITAL:
        run_analog = (
            cfg.agc_mode != digital.AGC_MODE_ADAPTIVE_DIGITAL
        )
        analog_state, lvl, w = process_analog(cfg, state, in_mic_level, echo)
        if cfg.agc_mode == digital.AGC_MODE_ADAPTIVE_DIGITAL:
            skip = state.low_level_signal
            state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(skip, b, a), analog_state, state
            )
            out_level = jnp.where(skip, out_level, lvl)
            warn = jnp.where(skip, warn, w)
        else:
            state, out_level, warn = analog_state, lvl, w
        del run_analog

    # Queue rotation (:946-955).
    env = jnp.where(state.in_queue > 1, state.env.at[0].set(state.env[1]),
                    state.env)
    rxx = jnp.where(
        state.in_queue > 1, state.rxx16w32.at[0].set(state.rxx16w32[1]),
        state.rxx16w32,
    )
    state = state.replace(
        env=env, rxx16w32=rxx,
        in_queue=jnp.maximum(state.in_queue - 1, 0),
    )
    return state, gains, out_level, warn


def process(gains, bands):
    """WebRtcAgc_Process (analog_agc.cc:959-966)."""
    return digital.apply_digital_gains(gains, bands)
