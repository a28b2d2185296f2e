"""Legacy fixed-point GMM VAD (WebRtcVad), exact int16/int32 Q-math twin.

Reference: common_audio/vad/{webrtc_vad.c, vad_core.c, vad_filterbank.c,
vad_gmm.c, vad_sp.c} + common_audio/signal_processing/energy.c.

Design notes:
- Per-sample allpass/HPF recurrences run as lax.scan; everything else
  (Gaussian probabilities, GMM updates, 16-minimum tracking) is vectorized
  over the 6 sub-bands x 2 Gaussians with jnp.where lattices.
- All int16 narrowing stores are emulated with a wrap helper so the bit
  patterns match C (including the deliberate overflow spots the reference
  annotates with RTC_NO_SANITIZE).
- The 16-minimum aging reproduces vad_sp.c's literal loop semantics: at
  most one entry expires per frame (ages are distinct by construction) and
  the entry right after the expired one skips that frame's aging tick.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.ops import spl

NUM_CHANNELS = 6
NUM_GAUSSIANS = 2
MIN_ENERGY = 10

SPECTRUM_WEIGHT = np.array([6, 8, 10, 12, 14, 16], np.int32)
NOISE_UPDATE_CONST = 655  # Q15
SPEECH_UPDATE_CONST = 6554  # Q15
BACK_ETA = 154  # Q8
MINIMUM_DIFFERENCE = np.array([544, 544, 576, 576, 576, 576], np.int32)
MAXIMUM_SPEECH = np.array([11392, 11392, 11520, 11520, 11520, 11520], np.int32)
MINIMUM_MEAN = np.array([640, 768], np.int32)
MAXIMUM_NOISE = np.array([9216, 9088, 8960, 8832, 8704, 8576], np.int32)

# (gaussian, channel) layout, matching index `channel + k * kNumChannels`.
NOISE_DATA_WEIGHTS = np.array(
    [[34, 62, 72, 66, 53, 25], [94, 66, 56, 62, 75, 103]], np.int32)
SPEECH_DATA_WEIGHTS = np.array(
    [[48, 82, 45, 87, 50, 47], [80, 46, 83, 41, 78, 81]], np.int32)
NOISE_DATA_MEANS = np.array(
    [[6738, 4892, 7065, 6715, 6771, 3369],
     [7646, 3863, 7820, 7266, 5020, 4362]], np.int32)
SPEECH_DATA_MEANS = np.array(
    [[8306, 10085, 10078, 11823, 11843, 6309],
     [9473, 9571, 10879, 7581, 8180, 7483]], np.int32)
NOISE_DATA_STDS = np.array(
    [[378, 1064, 493, 582, 688, 593], [474, 697, 475, 688, 421, 455]],
    np.int32)
SPEECH_DATA_STDS = np.array(
    [[555, 505, 567, 524, 585, 1231], [509, 828, 492, 1540, 1079, 850]],
    np.int32)

MAX_SPEECH_FRAMES = 6
MIN_STD = 384

# Aggressiveness thresholds per mode and frame length (10/20/30 ms),
# vad_core.c:70-92.
_MODE_TABLES = {
    0: ((8, 4, 3), (14, 7, 5), (24, 21, 24), (57, 48, 57)),
    1: ((8, 4, 3), (14, 7, 5), (37, 32, 37), (100, 80, 100)),
    2: ((6, 3, 2), (9, 5, 3), (82, 78, 82), (285, 260, 285)),
    3: ((6, 3, 2), (9, 5, 3), (94, 94, 94), (1100, 1050, 1100)),
}

# Filterbank constants (vad_filterbank.c:16-29).
HP_ZERO_COEFS = (6631, -13262, 6631)
HP_POLE_COEFS = (16384, -7756, 5620)
ALLPASS_Q15 = (20972, 5571)
OFFSET_VECTOR = (368, 368, 272, 176, 176, 176)
LOG_CONST = 24660
LOG_ENERGY_INT_PART = 14336

# vad_sp.c downsampling / minimum tracking constants.
ALLPASS_Q13 = (5243, 1392)
SMOOTHING_DOWN = 6553
SMOOTHING_UP = 32439

COMP_VAR = 22005
LOG2_EXP = 5909  # Q12


def _s16(v):
    """Emulate an int16_t narrowing store."""
    return ((v + 0x8000) & 0xFFFF) - 0x8000


@struct.dataclass
class VadState:
    """VadInstT (vad_core.h:24-56)."""

    noise_means: jnp.ndarray  # (2, 6) int32 Q7
    speech_means: jnp.ndarray
    noise_stds: jnp.ndarray
    speech_stds: jnp.ndarray
    frame_counter: jnp.ndarray  # () int32
    over_hang: jnp.ndarray
    num_of_speech: jnp.ndarray
    low_value_vector: jnp.ndarray  # (6, 16) int32
    index_vector: jnp.ndarray  # (6, 16) int32 ages
    mean_value: jnp.ndarray  # (6,) int32
    upper_state: jnp.ndarray  # (5,) int32 split filter states
    lower_state: jnp.ndarray  # (5,) int32
    hp_filter_state: jnp.ndarray  # (4,) int32
    downsampling_filter_states: jnp.ndarray  # (4,) int32


def init_state() -> VadState:
    return VadState(
        noise_means=jnp.asarray(NOISE_DATA_MEANS),
        speech_means=jnp.asarray(SPEECH_DATA_MEANS),
        noise_stds=jnp.asarray(NOISE_DATA_STDS),
        speech_stds=jnp.asarray(SPEECH_DATA_STDS),
        frame_counter=jnp.asarray(0, jnp.int32),
        over_hang=jnp.asarray(0, jnp.int32),
        num_of_speech=jnp.asarray(0, jnp.int32),
        low_value_vector=jnp.full((6, 16), 10000, jnp.int32),
        index_vector=jnp.zeros((6, 16), jnp.int32),
        mean_value=jnp.full((6,), 1600, jnp.int32),
        upper_state=jnp.zeros((5,), jnp.int32),
        lower_state=jnp.zeros((5,), jnp.int32),
        hp_filter_state=jnp.zeros((4,), jnp.int32),
        downsampling_filter_states=jnp.zeros((4,), jnp.int32),
    )


# ------------------------------------------------------------- filterbank


def _all_pass_filter(data, coefficient, filter_state):
    """AllPassFilter (vad_filterbank.c:84-109). data: every-other samples."""

    def step(state32, x):
        tmp32 = state32 + coefficient * x
        y = _s16(tmp32 >> 16)
        new_state = ((x << 14) - coefficient * y) * 2
        return new_state, y

    state32 = filter_state << 16
    state32, ys = jax.lax.scan(step, state32, data)
    return ys, _s16(state32 >> 16)


def _split_filter(data, upper_state, lower_state):
    """SplitFilter (vad_filterbank.c:112-143)."""
    hp, new_up = _all_pass_filter(data[0::2], ALLPASS_Q15[0], upper_state)
    lp, new_low = _all_pass_filter(data[1::2], ALLPASS_Q15[1], lower_state)
    return _s16(hp - lp), _s16(hp + lp), new_up, new_low


def _high_pass_filter(data, filter_state):
    """HighPassFilter (vad_filterbank.c:39-72)."""

    def step(st, x):
        s0, s1, s2, s3 = st
        tmp32 = (HP_ZERO_COEFS[0] * x + HP_ZERO_COEFS[1] * s0
                 + HP_ZERO_COEFS[2] * s1)
        s1n, s0n = s0, x
        tmp32 = tmp32 - HP_POLE_COEFS[1] * s2 - HP_POLE_COEFS[2] * s3
        y = _s16(tmp32 >> 14)
        return jnp.stack([s0n, s1n, y, s2]), y

    st, ys = jax.lax.scan(step, filter_state, data)
    return ys, st


def _energy(x, length: int):
    """WebRtcSpl_Energy + GetScalingSquare (energy.c, get_scaling_square.c)."""
    nbits = int(np.floor(np.log2(length))) + 1  # GetSizeInBits(length)
    smax = jnp.max(jnp.abs(x))
    t = spl.norm_w32(smax * smax)
    scaling = jnp.where(smax == 0, 0, jnp.where(t > nbits, 0, nbits - t))
    en = jnp.sum((x * x) >> scaling)
    return en, scaling


def _log_of_energy(x, length: int, offset: int, total_energy):
    """LogOfEnergy (vad_filterbank.c:146-233)."""
    energy_i32, tot_rshifts = _energy(x, length)
    energy = energy_i32.astype(jnp.uint32)

    zero = energy_i32 == 0
    norm_shifts = 17 - spl.norm_u32(energy_i32)
    tot = tot_rshifts + norm_shifts
    e_norm = jnp.where(
        norm_shifts < 0,
        (energy << jnp.clip(-norm_shifts, 0, 31).astype(jnp.uint32)),
        (energy >> jnp.clip(norm_shifts, 0, 31).astype(jnp.uint32)),
    ).astype(jnp.int32)

    log2_energy = LOG_ENERGY_INT_PART + ((e_norm & 0x3FFF) >> 4)
    log_e = ((LOG_CONST * log2_energy) >> 19) + ((tot * LOG_CONST) >> 9)
    log_e = jnp.maximum(log_e, 0) + offset
    log_e = jnp.where(zero, offset, log_e)

    # total_energy update (only while <= kMinEnergy). The branch condition
    # uses the post-normalization shift count: the reference accumulates
    # normalizing_rshifts into tot_rshifts before this block
    # (vad_filterbank.c:184,236-247).
    add = jnp.where(
        tot >= 0,
        MIN_ENERGY + 1,
        e_norm >> jnp.clip(-tot, 0, 31),
    )
    total_energy = jnp.where(
        (total_energy <= MIN_ENERGY) & ~zero,
        _s16(total_energy + add),
        total_energy,
    )
    return log_e.astype(jnp.int32), total_energy


def calculate_features(state: VadState, data, length: int):
    """WebRtcVad_CalculateFeatures (vad_filterbank.c:236-339).

    data: (length,) int32 8 kHz samples (80/160/240).
    Returns (state, features (6,), total_energy).
    """
    total_energy = jnp.asarray(0, jnp.int32)
    up, low = state.upper_state, state.lower_state

    hp120, lp120, u0, l0 = _split_filter(data, up[0], low[0])  # 2000 Hz split
    hp60, lp60, u1, l1 = _split_filter(hp120, up[1], low[1])  # 3000 Hz
    n4 = length // 4
    f5, total_energy = _log_of_energy(hp60, n4, OFFSET_VECTOR[5], total_energy)
    f4, total_energy = _log_of_energy(lp60, n4, OFFSET_VECTOR[4], total_energy)

    hp60b, lp60b, u2, l2 = _split_filter(lp120, up[2], low[2])  # 1000 Hz
    f3, total_energy = _log_of_energy(hp60b, n4, OFFSET_VECTOR[3],
                                      total_energy)

    hp120b, lp120b, u3, l3 = _split_filter(lp60b, up[3], low[3])  # 500 Hz
    n8 = length // 8
    f2, total_energy = _log_of_energy(hp120b, n8, OFFSET_VECTOR[2],
                                      total_energy)

    hp60c, lp60c, u4, l4 = _split_filter(lp120b, up[4], low[4])  # 250 Hz
    n16 = length // 16
    f1, total_energy = _log_of_energy(hp60c, n16, OFFSET_VECTOR[1],
                                      total_energy)

    hp_out, hp_state = _high_pass_filter(lp60c, state.hp_filter_state)
    f0, total_energy = _log_of_energy(hp_out, n16, OFFSET_VECTOR[0],
                                      total_energy)

    state = state.replace(
        upper_state=jnp.stack([u0, u1, u2, u3, u4]),
        lower_state=jnp.stack([l0, l1, l2, l3, l4]),
        hp_filter_state=hp_state,
    )
    features = jnp.stack([f0, f1, f2, f3, f4, f5])
    return state, features, total_energy


# --------------------------------------------------------------- vad_sp


def downsample_by_2(data, filter_state):
    """WebRtcVad_Downsampling (vad_sp.c:26-52).

    data: (N,) int32; filter_state: (2,) int32. Returns ((N//2,), state).
    """

    def step(st, pair):
        s1, s2 = st[0], st[1]
        x0, x1 = pair[0], pair[1]
        t1 = _s16((s1 >> 1) + ((ALLPASS_Q13[0] * x0) >> 14))
        s1n = x0 - ((ALLPASS_Q13[0] * t1) >> 12)
        t2 = _s16((s2 >> 1) + ((ALLPASS_Q13[1] * x1) >> 14))
        s2n = x1 - ((ALLPASS_Q13[1] * t2) >> 12)
        return jnp.stack([s1n, s2n]), _s16(t1 + t2)

    st, ys = jax.lax.scan(step, filter_state, data.reshape(-1, 2))
    return ys, st


def find_minimum(state: VadState, features, power_ok):
    """WebRtcVad_FindMinimum (vad_sp.c:56-181), vectorized over channels.

    Returns (state, medians (6,))."""
    sv = state.low_value_vector  # (6, 16)
    age = state.index_vector

    # Aging/expiry: the literal 16-step C loop (vad_sp.c:76-90), unrolled
    # statically and vectorized over channels. Sequential semantics matter:
    # several entries can hold age == 100 in the same call (a mid-array
    # expiry makes the entry shifted into its slot skip that call's aging
    # tick, desynchronizing ages), and each expiry shifts the suffix down
    # so the following original entry is never visited this call.
    idx = jnp.arange(16)[None, :]
    sv2, age2 = sv, age
    for i in range(16):
        expire = age2[:, i : i + 1] == 100
        sv_roll = jnp.concatenate([sv2[:, 1:], sv2[:, :1]], axis=1)
        age_roll = jnp.concatenate([age2[:, 1:], age2[:, :1]], axis=1)
        shifted_sv = jnp.where(
            idx >= i, jnp.where(idx == 15, 10000, sv_roll), sv2
        )
        shifted_age = jnp.where(
            idx >= i, jnp.where(idx == 15, 101, age_roll), age2
        )
        sv2 = jnp.where(expire, shifted_sv, sv2)
        age2 = jnp.where(
            expire, shifted_age, jnp.where(idx == i, age2 + 1, age2)
        )

    # Insert feature if smaller than one of the 16 (strictly smaller than
    # the successor, i.e. first index with feature < sv[index]).
    f = features[:, None]
    smaller = f < sv2
    pos = jnp.argmax(smaller, axis=1)
    do_insert = jnp.any(smaller, axis=1)
    poscol = pos[:, None]
    src_up = jnp.where(idx > poscol, idx - 1, idx)
    sv3 = jnp.take_along_axis(sv2, src_up, axis=1)
    age3 = jnp.take_along_axis(age2, src_up, axis=1)
    sv3 = jnp.where(idx == poscol, features[:, None], sv3)
    age3 = jnp.where(idx == poscol, 1, age3)
    sv3 = jnp.where(do_insert[:, None], sv3, sv2)
    age3 = jnp.where(do_insert[:, None], age3, age2)

    median = jnp.where(
        state.frame_counter > 2, sv3[:, 2],
        jnp.where(state.frame_counter > 0, sv3[:, 0], 1600),
    )

    alpha = jnp.where(
        state.frame_counter > 0,
        jnp.where(median < state.mean_value, SMOOTHING_DOWN, SMOOTHING_UP),
        0,
    )
    tmp32 = ((alpha + 1) * state.mean_value
             + (32767 - alpha) * median + 16384)
    mean = _s16(tmp32 >> 15)

    state = state.replace(
        low_value_vector=jnp.where(power_ok, sv3, state.low_value_vector),
        index_vector=jnp.where(power_ok, age3, state.index_vector),
        mean_value=jnp.where(power_ok, mean, state.mean_value),
    )
    return state, mean


# ---------------------------------------------------------------- vad_gmm


def gaussian_probability(x, mean, std):
    """WebRtcVad_GaussianProbability (vad_gmm.c:30-85), elementwise.

    Returns (probability Q20, delta Q11)."""
    inv_std = spl.div_w32_w16(131072 + (std >> 1), std)  # Q10
    t = inv_std >> 2
    inv_std2 = (t * t) >> 2  # Q14
    x7 = _s16((x << 3) - mean)  # Q7
    delta = _s16((inv_std2 * x7) >> 10)  # Q11
    expo = (delta * x7) >> 9  # Q10

    t16 = _s16(-((LOG2_EXP * expo) >> 12))
    exp_value = 0x0400 | (t16 & 0x03FF)
    t2 = _s16(t16 ^ 0xFFFF) >> 10
    t2 = t2 + 1
    exp_value = exp_value >> jnp.clip(t2, 0, 31)
    exp_value = jnp.where(expo < COMP_VAR, exp_value, 0)
    return inv_std * exp_value, delta


# --------------------------------------------------------------- vad_core


def _weighted_average(data, offset, weights):
    """WeightedAverage (vad_core.c:102-113). data/weights: (2,) per channel."""
    upd = data + offset
    return upd, jnp.sum(upd * weights, axis=0)


def gmm_probability(state: VadState, features, total_power, frame_index: int,
                    mode: int):
    """GmmProbability (vad_core.c:127-487).

    frame_index: 0/1/2 for 80/160/240-sample frames (static).
    Returns (state, vadflag)."""
    oh1, oh2, individual, total = (tbl[frame_index]
                                   for tbl in _MODE_TABLES[mode])
    power_ok = total_power > MIN_ENERGY

    nw = jnp.asarray(NOISE_DATA_WEIGHTS)
    sw = jnp.asarray(SPEECH_DATA_WEIGHTS)

    noise_prob, delta_n = gaussian_probability(
        features[None, :], state.noise_means, state.noise_stds
    )
    speech_prob, delta_s = gaussian_probability(
        features[None, :], state.speech_means, state.speech_stds
    )
    noise_probability = nw * noise_prob  # (2,6) Q27
    speech_probability = sw * speech_prob
    h0_test = jnp.sum(noise_probability, axis=0)  # (6,)
    h1_test = jnp.sum(speech_probability, axis=0)

    shifts_h0 = jnp.where(h0_test == 0, 31, spl.norm_w32(h0_test))
    shifts_h1 = jnp.where(h1_test == 0, 31, spl.norm_w32(h1_test))
    llr = shifts_h0 - shifts_h1
    sum_llr = jnp.sum(llr * jnp.asarray(SPECTRUM_WEIGHT))
    vadflag = jnp.any((llr * 4) > individual) | (sum_llr >= total)

    # Conditional Gaussian probabilities (Q14).
    h0 = _s16(h0_test >> 12)
    h1 = _s16(h1_test >> 12)
    ngp0 = jnp.where(
        h0 > 0,
        spl.div_w32_w16((noise_probability[0]
                         & jnp.int32(-4096)) << 2, jnp.maximum(h0, 1)),
        16384,
    )
    ngp1 = jnp.where(h0 > 0, 16384 - ngp0, 0)
    ngprvec = jnp.stack([ngp0, ngp1])
    sgp0 = jnp.where(
        h1 > 0,
        spl.div_w32_w16((speech_probability[0]
                         & jnp.int32(-4096)) << 2, jnp.maximum(h1, 1)),
        0,
    )
    sgp1 = jnp.where(h1 > 0, 16384 - sgp0, 0)
    sgprvec = jnp.stack([sgp0, sgp1])

    vadflag = vadflag & power_ok

    # ---- Model update (only when power_ok; gated at the end).
    state, feature_minimum = find_minimum(state, features, power_ok)

    _, noise_gmean = _weighted_average(state.noise_means, 0, nw)
    tmp1 = _s16(noise_gmean >> 6)  # Q8 per channel

    nmk = state.noise_means
    smk = state.speech_means
    nsk = state.noise_stds
    ssk = state.speech_stds

    # Noise mean update (no-VAD frames).
    delt = _s16((ngprvec * delta_n) >> 11)
    nmk2 = jnp.where(
        vadflag, nmk, _s16(nmk + ((delt * NOISE_UPDATE_CONST) >> 22))
    )
    ndelt = _s16((feature_minimum << 4) - tmp1)[None, :]
    nmk3 = _s16(nmk2 + ((ndelt * BACK_ETA) >> 9))
    k_arr = jnp.arange(2)[:, None]
    ch_arr = jnp.arange(6)[None, :]
    nmk3 = jnp.maximum(nmk3, (k_arr + 5) << 7)
    nmk3 = jnp.minimum(nmk3, (72 + k_arr - ch_arr) << 7)
    new_noise_means = nmk3

    # Speech mean + std update (VAD frames).
    delt_s = _s16((sgprvec * delta_s) >> 11)
    t16 = _s16((delt_s * SPEECH_UPDATE_CONST) >> 21)
    smk2 = _s16(smk + ((t16 + 1) >> 1))
    smk2 = jnp.maximum(smk2, jnp.asarray(MINIMUM_MEAN)[:, None])
    # `maxspe` is loop-carried in C: channel 0 uses the initial 12800,
    # channel ch uses kMaximumSpeech[ch-1] (vad_core.c:289, 429).
    maxspe_prev = jnp.asarray(
        np.concatenate([[12800], MAXIMUM_SPEECH[:-1]]).astype(np.int32)
    )
    smk2 = jnp.minimum(smk2, (maxspe_prev + 640)[None, :])
    new_speech_means = jnp.where(vadflag, smk2, smk)

    t_s = _s16(features[None, :] - ((smk + 4) >> 3))  # Q4
    t1_32 = (delta_s * t_s) >> 3
    t2_32 = t1_32 - 4096
    t_16 = sgprvec >> 2
    t1_32 = t_16 * t2_32
    t2_32 = t1_32 >> 4  # Q20
    div = spl.div_w32_w16(jnp.abs(t2_32), jnp.maximum(ssk * 10, 1))
    t_16 = jnp.where(t2_32 > 0, div, -div) + 128
    ssk2 = jnp.maximum(ssk + (t_16 >> 8), MIN_STD)
    new_speech_stds = jnp.where(vadflag, ssk2, ssk)

    # Noise std update (no-VAD frames).
    t_s = _s16(features[None, :] - (nmk >> 3))
    t1_32 = ((delta_n * t_s) >> 3) - 4096
    t_16 = (ngprvec + 2) >> 2
    t2_32 = t_16 * t1_32  # may wrap like OverflowingMulS16ByS32ToS32
    t1_32 = t2_32 >> 14
    div = spl.div_w32_w16(jnp.abs(t1_32), jnp.maximum(nsk, 1))
    t_16 = jnp.where(t1_32 > 0, div, -div) + 32
    nsk2 = jnp.maximum(nsk + (t_16 >> 6), MIN_STD)
    new_noise_stds = jnp.where(vadflag, nsk, nsk2)

    # Separate models if too close (vad_core.c:391-427).
    nm, noise_gmean = _weighted_average(new_noise_means, 0, nw)
    sm, speech_gmean = _weighted_average(new_speech_means, 0, sw)
    diff = _s16(speech_gmean >> 9) - _s16(noise_gmean >> 9)
    need = diff < jnp.asarray(MINIMUM_DIFFERENCE)
    gap = jnp.asarray(MINIMUM_DIFFERENCE) - diff
    up_s = _s16((13 * gap) >> 2)
    down_n = _s16((3 * gap) >> 2)
    sm2, speech_gmean2 = _weighted_average(sm, jnp.where(need, up_s, 0), sw)
    nm2, noise_gmean2 = _weighted_average(nm, jnp.where(need, -down_n, 0), nw)

    # Clamp global means (vad_core.c:429-448).
    over_s = _s16(speech_gmean2 >> 7) - jnp.asarray(MAXIMUM_SPEECH)
    sm3 = jnp.where(over_s[None, :] > 0, sm2 - over_s[None, :], sm2)
    over_n = _s16(noise_gmean2 >> 7) - jnp.asarray(MAXIMUM_NOISE)
    nm3 = jnp.where(over_n[None, :] > 0, nm2 - over_n[None, :], nm2)

    def sel(new, old):
        return jnp.where(power_ok, new, old)

    state = state.replace(
        noise_means=sel(nm3, state.noise_means),
        speech_means=sel(sm3, state.speech_means),
        noise_stds=sel(new_noise_stds, state.noise_stds),
        speech_stds=sel(new_speech_stds, state.speech_stds),
        frame_counter=state.frame_counter + power_ok.astype(jnp.int32),
    )

    # Hysteresis smoothing (vad_core.c:455-471).
    vadflag_i = vadflag.astype(jnp.int32)
    new_num = jnp.where(vadflag, jnp.minimum(state.num_of_speech + 1,
                                             MAX_SPEECH_FRAMES), 0)
    hit_max = vadflag & (state.num_of_speech + 1 > MAX_SPEECH_FRAMES)
    new_over = jnp.where(
        vadflag,
        jnp.where(hit_max, oh2, oh1),
        jnp.maximum(state.over_hang - 1, 0),
    )
    out_flag = jnp.where(
        vadflag, 1, jnp.where(state.over_hang > 0, 2 + state.over_hang, 0)
    )
    state = state.replace(over_hang=new_over, num_of_speech=new_num)
    return state, out_flag


def process(state: VadState, audio, sample_rate_hz: int, mode: int = 0):
    """WebRtcVad_Process (webrtc_vad.c:56-91) for 8/16/32 kHz.

    audio: (N,) int32 int16-valued, N = 10/20/30 ms at sample_rate_hz.
    Returns (state, vad) with vad in {0, 1}.
    """
    n = audio.shape[0]
    if sample_rate_hz == 32000:
        wb, st2 = downsample_by_2(audio,
                                  state.downsampling_filter_states[2:])
        nb, st1 = downsample_by_2(wb, state.downsampling_filter_states[:2])
        state = state.replace(
            downsampling_filter_states=jnp.concatenate([st1, st2])
        )
        n8 = n // 4
    elif sample_rate_hz == 16000:
        nb, st1 = downsample_by_2(audio,
                                  state.downsampling_filter_states[:2])
        state = state.replace(
            downsampling_filter_states=jnp.concatenate(
                [st1, state.downsampling_filter_states[2:]]
            )
        )
        n8 = n // 2
    elif sample_rate_hz == 8000:
        nb = audio
        n8 = n
    else:
        raise ValueError("legacy VAD core supports 8/16/32 kHz input")

    frame_index = {80: 0, 160: 1, 240: 2}[n8]
    state, features, total_power = calculate_features(state, nb, n8)
    state, flag = gmm_probability(state, features, total_power, frame_index,
                                  mode)
    return state, (flag > 0).astype(jnp.int32)
