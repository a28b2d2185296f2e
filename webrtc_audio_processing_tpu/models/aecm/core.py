"""AECM core: fixed-point mobile echo canceller (Q-math twin).

Reference: aecm/aecm_core.{h,cc}, aecm/aecm_core_c.cc, aecm/aecm_defines.h,
utility/delay_estimator{_wrapper}.cc — 64-sample partitions, int16 FFT with
dynamic Q, binary-spectrum delay estimation, NLMS channel update in
Q(RESOLUTION_CHANNEL), Wiener-like NLP in Q14, comfort noise.

Numerics note: all arithmetic (channel update, energies, NLP, noise
estimation, binary delay estimator, and the int16 radix-2 FFT via
ops/int_fft.py with per-stage rounding and renormalization) follows the
reference integer semantics bit-exactly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.ops import int_fft, spl

PART_LEN = 64
PART_LEN1 = 65
PART_LEN2 = 128
MAX_DELAY = 100
MAX_BUF_LEN = 64
FAR_ENERGY_MIN = 1025
FAR_ENERGY_DIFF = 929
ENERGY_DEV_TOL = 400
FAR_ENERGY_VAD_REGION = 230
MU_MIN, MU_MAX, MU_DIFF = 10, 1, 9
MIN_MSE_COUNT = 20
MIN_MSE_DIFF = 29
MSE_RESOLUTION = 5
RESOLUTION_CHANNEL16 = 12
RESOLUTION_CHANNEL32 = 28
CHANNEL_VAD = 16
RESOLUTION_SUPGAIN = 8
SUPGAIN_DEFAULT = 1 << RESOLUTION_SUPGAIN
SUPGAIN_ERROR_PARAM_A = 3072
SUPGAIN_ERROR_PARAM_B = 1536
SUPGAIN_ERROR_PARAM_D = SUPGAIN_DEFAULT
SUPGAIN_EPC_DT = 200
ENERGY_DEV_OFFSET = 0


def sup_gain_params(echo_mode: int):
    """Routing-mode suppression params (echo_control_mobile.cc:435-482).

    Returns (default, A, D, diffAB, diffBD) as python ints.
    """
    shift = {0: -3, 1: -2, 2: -1, 3: 0, 4: 1}[echo_mode]

    def s(v):
        return v << shift if shift >= 0 else v >> -shift

    a, b, d = map(s, (SUPGAIN_ERROR_PARAM_A, SUPGAIN_ERROR_PARAM_B,
                      SUPGAIN_ERROR_PARAM_D))
    return s(SUPGAIN_DEFAULT), a, d, a - b, b - d
ONE_Q14 = 1 << 14
NLP_COMP_LOW = 3277
NLP_COMP_HIGH = ONE_Q14
CONV_LEN = 512

# Binary delay estimator constants (delay_estimator.cc:26-35).
K_BAND_FIRST, K_BAND_LAST = 12, 43
K_SHIFTS_AT_ZERO = 13
K_SHIFTS_LINEAR_SLOPE = 3
K_PROB_OFFSET = 1024
K_PROB_LOWER_LIMIT = 8704
K_PROB_MIN_SPREAD = 2816
K_MAX_BIT_COUNTS_Q9 = 32 << 9

# kSqrtHanning (aecm_core_c.cc:35-41). The legacy table is NOT
# round(16384*sin(pi*i/128)) — several entries are off by a few LSB from
# the analytic curve, so the literal values are required for bit-exactness.
SQRT_HANNING = jnp.asarray(np.array([
    0, 399, 798, 1196, 1594, 1990, 2386, 2780, 3172, 3562, 3951,
    4337, 4720, 5101, 5478, 5853, 6224, 6591, 6954, 7313, 7668, 8019,
    8364, 8705, 9040, 9370, 9695, 10013, 10326, 10633, 10933, 11227, 11514,
    11795, 12068, 12335, 12594, 12845, 13089, 13325, 13553, 13773, 13985,
    14189, 14384, 14571, 14749, 14918, 15079, 15231, 15373, 15506, 15631,
    15746, 15851, 15947, 16034, 16111, 16179, 16237, 16286, 16325, 16354,
    16373, 16384], np.int32))

# kCosTable/kSinTable (aecm_core.cc:60-130). Legacy tables: 175 of
# 360 entries differ by 1 LSB from round(8192*cos/sin) — literal
# values required for bit-exactness.
COS_TABLE = jnp.asarray(np.array([
    8192, 8190, 8187, 8180, 8172, 8160, 8147, 8130, 8112, 8091, 8067,
    8041, 8012, 7982, 7948, 7912, 7874, 7834, 7791, 7745, 7697, 7647,
    7595, 7540, 7483, 7424, 7362, 7299, 7233, 7164, 7094, 7021, 6947,
    6870, 6791, 6710, 6627, 6542, 6455, 6366, 6275, 6182, 6087, 5991,
    5892, 5792, 5690, 5586, 5481, 5374, 5265, 5155, 5043, 4930, 4815,
    4698, 4580, 4461, 4341, 4219, 4096, 3971, 3845, 3719, 3591, 3462,
    3331, 3200, 3068, 2935, 2801, 2667, 2531, 2395, 2258, 2120, 1981,
    1842, 1703, 1563, 1422, 1281, 1140, 998, 856, 713, 571, 428,
    285, 142, 0, -142, -285, -428, -571, -713, -856, -998, -1140,
    -1281, -1422, -1563, -1703, -1842, -1981, -2120, -2258, -2395, -2531, -2667,
    -2801, -2935, -3068, -3200, -3331, -3462, -3591, -3719, -3845, -3971, -4095,
    -4219, -4341, -4461, -4580, -4698, -4815, -4930, -5043, -5155, -5265, -5374,
    -5481, -5586, -5690, -5792, -5892, -5991, -6087, -6182, -6275, -6366, -6455,
    -6542, -6627, -6710, -6791, -6870, -6947, -7021, -7094, -7164, -7233, -7299,
    -7362, -7424, -7483, -7540, -7595, -7647, -7697, -7745, -7791, -7834, -7874,
    -7912, -7948, -7982, -8012, -8041, -8067, -8091, -8112, -8130, -8147, -8160,
    -8172, -8180, -8187, -8190, -8191, -8190, -8187, -8180, -8172, -8160, -8147,
    -8130, -8112, -8091, -8067, -8041, -8012, -7982, -7948, -7912, -7874, -7834,
    -7791, -7745, -7697, -7647, -7595, -7540, -7483, -7424, -7362, -7299, -7233,
    -7164, -7094, -7021, -6947, -6870, -6791, -6710, -6627, -6542, -6455, -6366,
    -6275, -6182, -6087, -5991, -5892, -5792, -5690, -5586, -5481, -5374, -5265,
    -5155, -5043, -4930, -4815, -4698, -4580, -4461, -4341, -4219, -4096, -3971,
    -3845, -3719, -3591, -3462, -3331, -3200, -3068, -2935, -2801, -2667, -2531,
    -2395, -2258, -2120, -1981, -1842, -1703, -1563, -1422, -1281, -1140, -998,
    -856, -713, -571, -428, -285, -142, 0, 142, 285, 428, 571,
    713, 856, 998, 1140, 1281, 1422, 1563, 1703, 1842, 1981, 2120,
    2258, 2395, 2531, 2667, 2801, 2935, 3068, 3200, 3331, 3462, 3591,
    3719, 3845, 3971, 4095, 4219, 4341, 4461, 4580, 4698, 4815, 4930,
    5043, 5155, 5265, 5374, 5481, 5586, 5690, 5792, 5892, 5991, 6087,
    6182, 6275, 6366, 6455, 6542, 6627, 6710, 6791, 6870, 6947, 7021,
    7094, 7164, 7233, 7299, 7362, 7424, 7483, 7540, 7595, 7647, 7697,
    7745, 7791, 7834, 7874, 7912, 7948, 7982, 8012, 8041, 8067, 8091,
    8112, 8130, 8147, 8160, 8172, 8180, 8187, 8190,
], np.int32))

SIN_TABLE = jnp.asarray(np.array([
    0, 142, 285, 428, 571, 713, 856, 998, 1140, 1281, 1422,
    1563, 1703, 1842, 1981, 2120, 2258, 2395, 2531, 2667, 2801, 2935,
    3068, 3200, 3331, 3462, 3591, 3719, 3845, 3971, 4095, 4219, 4341,
    4461, 4580, 4698, 4815, 4930, 5043, 5155, 5265, 5374, 5481, 5586,
    5690, 5792, 5892, 5991, 6087, 6182, 6275, 6366, 6455, 6542, 6627,
    6710, 6791, 6870, 6947, 7021, 7094, 7164, 7233, 7299, 7362, 7424,
    7483, 7540, 7595, 7647, 7697, 7745, 7791, 7834, 7874, 7912, 7948,
    7982, 8012, 8041, 8067, 8091, 8112, 8130, 8147, 8160, 8172, 8180,
    8187, 8190, 8191, 8190, 8187, 8180, 8172, 8160, 8147, 8130, 8112,
    8091, 8067, 8041, 8012, 7982, 7948, 7912, 7874, 7834, 7791, 7745,
    7697, 7647, 7595, 7540, 7483, 7424, 7362, 7299, 7233, 7164, 7094,
    7021, 6947, 6870, 6791, 6710, 6627, 6542, 6455, 6366, 6275, 6182,
    6087, 5991, 5892, 5792, 5690, 5586, 5481, 5374, 5265, 5155, 5043,
    4930, 4815, 4698, 4580, 4461, 4341, 4219, 4096, 3971, 3845, 3719,
    3591, 3462, 3331, 3200, 3068, 2935, 2801, 2667, 2531, 2395, 2258,
    2120, 1981, 1842, 1703, 1563, 1422, 1281, 1140, 998, 856, 713,
    571, 428, 285, 142, 0, -142, -285, -428, -571, -713, -856,
    -998, -1140, -1281, -1422, -1563, -1703, -1842, -1981, -2120, -2258, -2395,
    -2531, -2667, -2801, -2935, -3068, -3200, -3331, -3462, -3591, -3719, -3845,
    -3971, -4095, -4219, -4341, -4461, -4580, -4698, -4815, -4930, -5043, -5155,
    -5265, -5374, -5481, -5586, -5690, -5792, -5892, -5991, -6087, -6182, -6275,
    -6366, -6455, -6542, -6627, -6710, -6791, -6870, -6947, -7021, -7094, -7164,
    -7233, -7299, -7362, -7424, -7483, -7540, -7595, -7647, -7697, -7745, -7791,
    -7834, -7874, -7912, -7948, -7982, -8012, -8041, -8067, -8091, -8112, -8130,
    -8147, -8160, -8172, -8180, -8187, -8190, -8191, -8190, -8187, -8180, -8172,
    -8160, -8147, -8130, -8112, -8091, -8067, -8041, -8012, -7982, -7948, -7912,
    -7874, -7834, -7791, -7745, -7697, -7647, -7595, -7540, -7483, -7424, -7362,
    -7299, -7233, -7164, -7094, -7021, -6947, -6870, -6791, -6710, -6627, -6542,
    -6455, -6366, -6275, -6182, -6087, -5991, -5892, -5792, -5690, -5586, -5481,
    -5374, -5265, -5155, -5043, -4930, -4815, -4698, -4580, -4461, -4341, -4219,
    -4096, -3971, -3845, -3719, -3591, -3462, -3331, -3200, -3068, -2935, -2801,
    -2667, -2531, -2395, -2258, -2120, -1981, -1842, -1703, -1563, -1422, -1281,
    -1140, -998, -856, -713, -571, -428, -285, -142,
], np.int32))

CHANNEL_STORED_8K = np.array([
    2040, 1815, 1590, 1498, 1405, 1395, 1385, 1418, 1451, 1506, 1562,
    1644, 1726, 1804, 1882, 1918, 1953, 1982, 2010, 2025, 2040, 2034,
    2027, 2021, 2014, 1997, 1980, 1925, 1869, 1800, 1732, 1683, 1635,
    1604, 1572, 1545, 1517, 1481, 1444, 1405, 1367, 1331, 1294, 1270,
    1245, 1239, 1233, 1247, 1260, 1282, 1303, 1338, 1373, 1407, 1441,
    1470, 1499, 1524, 1549, 1565, 1582, 1601, 1621, 1649, 1676], np.int32)

CHANNEL_STORED_16K = np.array([
    2040, 1590, 1405, 1385, 1451, 1562, 1726, 1882, 1953, 2010, 2040,
    2027, 2014, 1980, 1869, 1732, 1635, 1572, 1517, 1444, 1367, 1294,
    1245, 1233, 1260, 1303, 1373, 1441, 1499, 1549, 1582, 1621, 1676,
    1741, 1802, 1861, 1921, 1983, 2040, 2102, 2170, 2265, 2375, 2515,
    2651, 2781, 2922, 3075, 3253, 3471, 3738, 3976, 4151, 4258, 4308,
    4288, 4270, 4253, 4237, 4179, 4086, 3947, 3757, 3484, 3153], np.int32)


@struct.dataclass
class BinaryDelayEstimatorState:
    """delay_estimator.{h,cc} with robust validation disabled (AECM default)."""

    far_threshold: jnp.ndarray  # (65,) int32 mean spectra (Q15)
    far_threshold_init: jnp.ndarray  # () bool
    near_threshold: jnp.ndarray  # (65,) int32
    near_threshold_init: jnp.ndarray  # () bool
    binary_far_history: jnp.ndarray  # (100,) uint32
    far_bit_counts: jnp.ndarray  # (100,) int32
    mean_bit_counts: jnp.ndarray  # (100,) int32 Q9
    minimum_probability: jnp.ndarray  # () int32
    last_delay_probability: jnp.ndarray  # () int32
    last_delay: jnp.ndarray  # () int32


def init_delay_estimator() -> BinaryDelayEstimatorState:
    return BinaryDelayEstimatorState(
        far_threshold=jnp.zeros((PART_LEN1,), jnp.int32),
        far_threshold_init=jnp.asarray(False),
        near_threshold=jnp.zeros((PART_LEN1,), jnp.int32),
        near_threshold_init=jnp.asarray(False),
        binary_far_history=jnp.zeros((MAX_DELAY,), jnp.uint32),
        far_bit_counts=jnp.zeros((MAX_DELAY,), jnp.int32),
        mean_bit_counts=jnp.full((MAX_DELAY,), 20 << 9, jnp.int32),
        minimum_probability=jnp.asarray(K_MAX_BIT_COUNTS_Q9, jnp.int32),
        last_delay_probability=jnp.asarray(K_MAX_BIT_COUNTS_Q9, jnp.int32),
        last_delay=jnp.asarray(-2, jnp.int32),
    )


def _binary_spectrum(spectrum, threshold, initialized, q_domain):
    """BinarySpectrumFix (delay_estimator_wrapper.cc:44-71)."""
    bands = jnp.arange(K_BAND_FIRST, K_BAND_LAST + 1)
    spec_q15 = (spectrum[bands] << (15 - q_domain)).astype(jnp.int32)
    init_thr = jnp.where(spectrum[bands] > 0, spec_q15 >> 1, threshold[bands])
    any_pos = jnp.any(spectrum[bands] > 0)
    thr_bands = jnp.where(initialized, threshold[bands], init_thr)
    initialized = initialized | any_pos

    # MeanEstimatorFix with factor 6 (toward-zero shift of the diff).
    diff = spec_q15 - thr_bands
    step = jnp.where(diff < 0, -((-diff) >> 6), diff >> 6)
    thr_bands = thr_bands + step
    threshold = threshold.at[bands].set(thr_bands)

    bits = (spec_q15 > thr_bands).astype(jnp.uint32)
    out = jnp.sum(bits << jnp.arange(K_BAND_LAST - K_BAND_FIRST + 1,
                                     dtype=jnp.uint32))
    return out, threshold, initialized


def _bit_count(x):
    """Population count of uint32 arrays."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def delay_estimator_process(state: BinaryDelayEstimatorState,
                            far_spectrum, far_q, near_spectrum, near_q):
    """AddFarSpectrumFix + DelayEstimatorProcessFix
    (delay_estimator.cc:380-520 and :525-640, robust validation off).

    Returns (state, last_delay)."""
    far_bits, far_thr, far_init = _binary_spectrum(
        far_spectrum, state.far_threshold, state.far_threshold_init, far_q
    )
    history = jnp.concatenate([far_bits[None], state.binary_far_history[:-1]])
    far_counts = jnp.concatenate(
        [_bit_count(far_bits)[None], state.far_bit_counts[:-1]]
    )

    near_bits, near_thr, near_init = _binary_spectrum(
        near_spectrum, state.near_threshold, state.near_threshold_init, near_q
    )

    bit_counts = _bit_count(near_bits ^ history)  # (100,)
    bc_q9 = bit_counts << 9
    shifts = K_SHIFTS_AT_ZERO - ((K_SHIFTS_LINEAR_SLOPE * far_counts) >> 4)
    diff = bc_q9 - state.mean_bit_counts
    step = jnp.where(
        diff < 0,
        -((-diff) >> jnp.maximum(shifts, 0)),
        diff >> jnp.maximum(shifts, 0),
    )
    mean_bc = jnp.where(far_counts > 0, state.mean_bit_counts + step,
                        state.mean_bit_counts)

    best = jnp.argmin(mean_bc).astype(jnp.int32)
    value_best = mean_bc[best]
    value_worst = jnp.max(mean_bc)
    valley = value_worst - value_best

    min_prob = state.minimum_probability
    thr = jnp.maximum(value_best + K_PROB_OFFSET, K_PROB_LOWER_LIMIT)
    min_prob = jnp.where(
        (min_prob > K_PROB_LOWER_LIMIT) & (valley > K_PROB_MIN_SPREAD),
        jnp.minimum(min_prob, thr),
        min_prob,
    )
    last_prob = state.last_delay_probability + 1
    valid = (valley > K_PROB_OFFSET) & (
        (value_best < min_prob) | (value_best < last_prob)
    )
    non_stationary = jnp.any(far_counts > 0)
    take = non_stationary & valid
    last_delay = jnp.where(take, best, state.last_delay)
    last_prob = jnp.where(
        take, jnp.minimum(value_best, last_prob), last_prob
    )

    return (
        state.replace(
            far_threshold=far_thr,
            far_threshold_init=far_init,
            near_threshold=near_thr,
            near_threshold_init=near_init,
            binary_far_history=history,
            far_bit_counts=far_counts,
            mean_bit_counts=mean_bc,
            minimum_probability=min_prob,
            last_delay_probability=last_prob,
            last_delay=last_delay,
        ),
        last_delay,
    )


@struct.dataclass
class AecmCoreState:
    """AecmCore (aecm_core.h:71-180)."""

    xbuf: jnp.ndarray  # (128,) int32 far history (int16 values)
    dbuf_noisy: jnp.ndarray  # (128,)
    outbuf: jnp.ndarray  # (64,)
    dfa_noisy_q: jnp.ndarray  # () int32
    dfa_noisy_q_old: jnp.ndarray
    far_history: jnp.ndarray  # (100, 65) int32
    far_q_domains: jnp.ndarray  # (100,) int32
    far_history_pos: jnp.ndarray  # () int32
    delay_estimator: BinaryDelayEstimatorState
    channel_stored: jnp.ndarray  # (65,) int32 (int16 values)
    channel_adapt16: jnp.ndarray  # (65,)
    channel_adapt32: jnp.ndarray  # (65,)
    near_log_energy: jnp.ndarray  # (64,)
    echo_adapt_log_energy: jnp.ndarray  # (64,)
    echo_stored_log_energy: jnp.ndarray  # (64,)
    far_log_energy: jnp.ndarray  # ()
    far_energy_min: jnp.ndarray
    far_energy_max: jnp.ndarray
    far_energy_maxmin: jnp.ndarray
    far_energy_vad: jnp.ndarray
    far_energy_mse: jnp.ndarray
    current_vad_value: jnp.ndarray  # () int32
    vad_update_count: jnp.ndarray
    first_vad: jnp.ndarray  # () bool
    mse_adapt_old: jnp.ndarray
    mse_stored_old: jnp.ndarray
    mse_threshold: jnp.ndarray
    mse_channel_count: jnp.ndarray
    startup_state: jnp.ndarray
    tot_count: jnp.ndarray
    sup_gain: jnp.ndarray
    sup_gain_old: jnp.ndarray
    echo_filt: jnp.ndarray  # (65,) int32
    near_filt: jnp.ndarray  # (65,) int32 (int16 values)
    noise_est: jnp.ndarray  # (65,) int32
    noise_est_too_low: jnp.ndarray  # (65,) int32
    noise_est_too_high: jnp.ndarray  # (65,) int32
    noise_est_ctr: jnp.ndarray
    seed: jnp.ndarray  # () uint32


def init_core(sample_rate_hz: int, echo_mode: int = 3) -> AecmCoreState:
    stored = CHANNEL_STORED_16K if sample_rate_hz >= 16000 else CHANNEL_STORED_8K
    sup_default = sup_gain_params(echo_mode)[0]
    # Pink-ish initial noise estimate (aecm_core.cc InitCore).
    noise = np.zeros(PART_LEN1, np.int64)
    tmp32 = PART_LEN1 * PART_LEN1
    tmp16 = PART_LEN1
    for i in range((PART_LEN1 >> 1) - 1):
        noise[i] = tmp32 << 8
        tmp16 -= 1
        tmp32 -= (tmp16 << 1) + 1
    noise[(PART_LEN1 >> 1) - 1 :] = tmp32 << 8
    return AecmCoreState(
        xbuf=jnp.zeros((PART_LEN2,), jnp.int32),
        dbuf_noisy=jnp.zeros((PART_LEN2,), jnp.int32),
        outbuf=jnp.zeros((PART_LEN,), jnp.int32),
        dfa_noisy_q=jnp.asarray(0, jnp.int32),
        dfa_noisy_q_old=jnp.asarray(0, jnp.int32),
        far_history=jnp.zeros((MAX_DELAY, PART_LEN1), jnp.int32),
        far_q_domains=jnp.zeros((MAX_DELAY,), jnp.int32),
        # C inits to MAX_DELAY and wraps to 0 on the first increment
        # (aecm_core.cc:142); with mod arithmetic that is MAX_DELAY - 1.
        far_history_pos=jnp.asarray(MAX_DELAY - 1, jnp.int32),
        delay_estimator=init_delay_estimator(),
        channel_stored=jnp.asarray(stored),
        channel_adapt16=jnp.asarray(stored),
        channel_adapt32=jnp.asarray(stored.astype(np.int64) << 16,
                                    jnp.int32),
        near_log_energy=jnp.zeros((MAX_BUF_LEN,), jnp.int32),
        echo_adapt_log_energy=jnp.zeros((MAX_BUF_LEN,), jnp.int32),
        echo_stored_log_energy=jnp.zeros((MAX_BUF_LEN,), jnp.int32),
        far_log_energy=jnp.asarray(0, jnp.int32),
        far_energy_min=jnp.asarray(32767, jnp.int32),
        far_energy_max=jnp.asarray(-32768, jnp.int32),
        far_energy_maxmin=jnp.asarray(0, jnp.int32),
        far_energy_vad=jnp.asarray(FAR_ENERGY_MIN, jnp.int32),
        far_energy_mse=jnp.asarray(0, jnp.int32),
        current_vad_value=jnp.asarray(0, jnp.int32),
        vad_update_count=jnp.asarray(0, jnp.int32),
        first_vad=jnp.asarray(True),
        mse_adapt_old=jnp.asarray(1000, jnp.int32),
        mse_stored_old=jnp.asarray(1000, jnp.int32),
        mse_threshold=jnp.asarray(0x7FFFFFFF, jnp.int32),
        mse_channel_count=jnp.asarray(0, jnp.int32),
        startup_state=jnp.asarray(0, jnp.int32),
        tot_count=jnp.asarray(0, jnp.int32),
        sup_gain=jnp.asarray(sup_default, jnp.int32),
        sup_gain_old=jnp.asarray(sup_default, jnp.int32),
        echo_filt=jnp.zeros((PART_LEN1,), jnp.int32),
        near_filt=jnp.zeros((PART_LEN1,), jnp.int32),
        noise_est=jnp.asarray(noise.astype(np.int32)),
        noise_est_too_low=jnp.zeros((PART_LEN1,), jnp.int32),
        noise_est_too_high=jnp.zeros((PART_LEN1,), jnp.int32),
        noise_est_ctr=jnp.asarray(0, jnp.int32),
        seed=jnp.asarray(666, jnp.uint32),
    )


def _norm_w16(x):
    """WebRtcSpl_NormW16 for int16-valued int32."""
    x32 = jnp.asarray(x, jnp.int32)
    return jnp.clip(spl.norm_w32(x32 << 16), 0, 15)


def _log_of_energy_q8(energy, q_domain):
    """LogOfEnergyInQ8 (aecm_core.cc:70-82).

    energy carries uint32 bit patterns in an int32 array (the C sums wrap
    mod 2^32), so the zero test is `!= 0`, not `> 0`.
    """
    k_low = 7 << 7  # kLogLowValue = PART_LEN_SHIFT << 7
    zeros = spl.norm_u32(energy)
    shifted = (energy.astype(jnp.uint32)
               << zeros.astype(jnp.uint32)).astype(jnp.int32)
    frac = (shifted & 0x7FFFFFFF) >> 23
    val = k_low + (((31 - zeros) << 8) + frac - (q_domain << 8))
    return jnp.where(energy != 0, val, k_low).astype(jnp.int32)


def _time_to_frequency(buf):
    """TimeToFrequencyDomain (aecm_core_c.cc:204-296), bit-exact.

    buf: (128,) int32. Returns (spec complex proxy as (re, im) int32 pair,
    abs (65,) int32, sum_abs, q_scaling).
    """
    max_abs = jnp.max(jnp.abs(buf))
    scaling = _norm_w16(max_abs)
    scaled = (buf << scaling).astype(jnp.int32)
    w = jnp.concatenate([SQRT_HANNING[:PART_LEN],
                         SQRT_HANNING[PART_LEN:0:-1]])
    windowed = int_fft._wrap16((scaled * w) >> 14)
    # Forward int16 FFT (WebRtcSpl_RealForwardFFT), per-stage rounding and
    # all; WindowAndFFT then conjugates (aecm_core_c.cc:196-199).
    re, im = int_fft.real_forward_fft_i16(windowed)
    im = int_fft._wrap16(-im)
    im = im.at[0].set(0).at[PART_LEN].set(0)
    # SqrtFloor(re^2 + im^2) with integer correction of the f32 estimate.
    sq = (re * re + im * im).astype(jnp.uint32)  # <= 2*32767^2 < 2^31
    s = jnp.floor(jnp.sqrt(sq.astype(jnp.float32))).astype(jnp.uint32)
    s = jnp.where(s * s > sq, s - 1, s)
    s = jnp.where((s + 1) * (s + 1) <= sq, s + 1, s)
    mag = s.astype(jnp.int32)
    mag = mag.at[0].set(jnp.abs(re[0])).at[PART_LEN].set(jnp.abs(re[PART_LEN]))
    return re, im, mag, jnp.sum(mag), scaling


def process_block(state: AecmCoreState, farend, nearend, mult: int,
                  echo_mode: int = 3, nlp: bool = True, cng: bool = True,
                  fixed_delay: int = -1, debug_taps: dict | None = None):
    """WebRtcAecm_ProcessBlock (aecm_core_c.cc:306-580).

    farend, nearend: (64,) int32 int16-valued blocks.
    Returns (state, output (64,) int32). When `debug_taps` is a dict it is
    filled with named internal signals (the AecDump-analog tap mode, same
    names as the reference's AEC_DEBUG dumps) for conformance diffing.
    """
    startup = jnp.where(
        state.startup_state < 2,
        (state.tot_count >= CONV_LEN).astype(jnp.int32)
        + (state.tot_count >= 2 * CONV_LEN).astype(jnp.int32),
        state.startup_state,
    )

    xbuf = jnp.concatenate([state.xbuf[PART_LEN:], farend])
    dbuf = jnp.concatenate([state.dbuf_noisy[PART_LEN:], nearend])

    _, _, xfa, xfa_sum, far_q = _time_to_frequency(xbuf)
    dre, dim, dfa, dfa_sum, near_q = _time_to_frequency(dbuf)
    dfa_q_old = state.dfa_noisy_q
    dfa_q = near_q

    # Far history + delay estimation (aecm_core.cc:138-190).
    pos = jnp.mod(state.far_history_pos + 1, MAX_DELAY)
    far_history = state.far_history.at[pos].set(xfa)
    far_q_domains = state.far_q_domains.at[pos].set(far_q)
    de_state, delay = delay_estimator_process(
        state.delay_estimator, xfa, far_q, dfa, near_q
    )
    delay = jnp.where(delay == -2, 0, delay)
    if fixed_delay >= 0:
        delay = jnp.asarray(fixed_delay, jnp.int32)
    buffer_pos = jnp.mod(pos - delay, MAX_DELAY)
    far_spectrum = far_history[buffer_pos]
    x_q = far_q_domains[buffer_pos]

    # --- CalcEnergies (aecm_core.cc:657-768).
    near_log = jnp.concatenate([
        _log_of_energy_q8(dfa_sum, dfa_q)[None], state.near_log_energy[:-1]
    ])
    echo_est = state.channel_stored * far_spectrum  # (65,) int32
    far_energy = jnp.sum(far_spectrum)
    echo_adapt_e = jnp.sum(state.channel_adapt16 * far_spectrum)
    echo_stored_e = jnp.sum(echo_est)

    far_log = _log_of_energy_q8(far_energy, x_q)
    echo_adapt_log = jnp.concatenate([
        _log_of_energy_q8(echo_adapt_e, RESOLUTION_CHANNEL16 + x_q)[None],
        state.echo_adapt_log_energy[:-1],
    ])
    echo_stored_log = jnp.concatenate([
        _log_of_energy_q8(echo_stored_e, RESOLUTION_CHANNEL16 + x_q)[None],
        state.echo_stored_log_energy[:-1],
    ])

    def asym(old, new, pos_shift, neg_shift):
        out = jnp.where(
            old > new, old - ((old - new) >> neg_shift),
            old + ((new - old) >> pos_shift),
        )
        return jnp.where((old == 32767) | (old == -32768), new, out)

    active = far_log > FAR_ENERGY_MIN
    inc_max = jnp.where(startup == 0, 2, 4)
    dec_min = jnp.where(startup == 0, 2, 3)
    inc_min = jnp.where(startup == 0, 8, 11)
    e_min = jnp.where(active,
                      asym(state.far_energy_min, far_log, inc_min, dec_min),
                      state.far_energy_min)
    e_max = jnp.where(active,
                      asym(state.far_energy_max, far_log, inc_max, 11),
                      state.far_energy_max)
    e_maxmin = jnp.where(active, e_max - e_min, state.far_energy_maxmin)
    t16 = jnp.maximum(2560 - e_min, 0)
    t16 = jnp.where(t16 > 0, (t16 * FAR_ENERGY_VAD_REGION) >> 9, 0)
    t16 = t16 + FAR_ENERGY_VAD_REGION
    set_vad = (startup == 0) | (state.vad_update_count > 1024)
    vad_track = state.far_energy_vad > far_log
    e_vad = jnp.where(
        active,
        jnp.where(
            set_vad,
            e_min + t16,
            jnp.where(
                vad_track,
                state.far_energy_vad
                + ((far_log + t16 - state.far_energy_vad) >> 6),
                state.far_energy_vad,
            ),
        ),
        state.far_energy_vad,
    )
    vad_count = jnp.where(
        active & ~set_vad,
        jnp.where(vad_track, 0, state.vad_update_count + 1),
        state.vad_update_count,
    )
    e_mse = jnp.where(active, e_vad + (1 << 8), state.far_energy_mse)

    # Keeps its previous value when far energy is above the VAD threshold
    # but neither in startup nor showing speech dynamics (aecm_core.cc:741).
    vad_value = jnp.where(
        far_log > e_vad,
        jnp.where(
            (startup == 0) | (e_maxmin > FAR_ENERGY_DIFF),
            1,
            state.current_vad_value,
        ),
        0,
    )
    # First-VAD channel adjustment.
    first_trip = (vad_value == 1) & state.first_vad
    adjust = first_trip & (echo_adapt_log[0] > near_log[0])
    channel_adapt16 = jnp.where(adjust, state.channel_adapt16 >> 3,
                                state.channel_adapt16)
    echo_adapt_log = jnp.where(
        adjust, echo_adapt_log.at[0].add(-(3 << 8)), echo_adapt_log
    )
    first_vad = jnp.where(first_trip & ~adjust, False, state.first_vad)

    # --- CalcStepSize (aecm_core.cc:780-806).
    mu = jnp.where(
        vad_value == 0,
        0,
        jnp.where(
            startup > 0,
            jnp.where(
                e_min >= e_max,
                MU_MIN,
                jnp.maximum(
                    MU_MIN - 1 - spl.div_w32_w16(
                        (far_log - e_min) * MU_DIFF,
                        jnp.maximum(e_maxmin, 1),
                    ),
                    MU_MAX,
                ),
            ),
            MU_MAX,
        ),
    ).astype(jnp.int32)

    tot_count = state.tot_count + 1

    # --- UpdateChannel (aecm_core.cc:823-1011). NLMS in split Q-domains.
    ch32 = state.channel_adapt32
    zeros_ch = spl.norm_u32(ch32)
    zeros_far = spl.norm_u32(far_spectrum)
    no_shift = zeros_ch + zeros_far > 31
    shift_ch_far = jnp.where(no_shift, 0, 32 - zeros_ch - zeros_far)
    prod = jnp.where(
        no_shift,
        ch32 * far_spectrum,  # uint32 wrap == int32 wrap bit pattern
        (ch32 >> jnp.minimum(shift_ch_far, 31)) * far_spectrum,
    )
    zeros_num = spl.norm_u32(prod)
    zeros_dfa = jnp.where(dfa > 0, spl.norm_u32(dfa), 32)
    t16a = zeros_dfa - 2 + dfa_q - RESOLUTION_CHANNEL32 - x_q + shift_ch_far
    use_a = zeros_num > t16a + 1
    xfa_q = jnp.where(use_a, t16a, zeros_num - 2)
    dfa_q_shift = jnp.where(
        use_a, zeros_dfa - 2,
        RESOLUTION_CHANNEL32 + x_q - dfa_q - shift_ch_far + (zeros_num - 2),
    )

    def shift_w32(v, s):
        return jnp.where(s >= 0, v << jnp.minimum(s, 31),
                         v >> jnp.minimum(-s, 31))

    def shift_u32(v, s):
        # WEBRTC_SPL_SHIFT_W32 on unsigned values: logical right shift.
        u = v.astype(jnp.uint32)
        su = jnp.minimum(jnp.abs(s), 31).astype(jnp.uint32)
        return jnp.where(s >= 0, u << su, u >> su).astype(jnp.int32)

    u1 = shift_u32(prod, xfa_q)
    u2 = shift_u32(dfa, dfa_q_shift)
    err = u2 - u1
    zeros_err = spl.norm_w32(err)
    can_update = (err != 0) & (far_spectrum > (CHANNEL_VAD << x_q))
    no_shift2 = zeros_err + zeros_far > 31
    shift_num = jnp.where(no_shift2, 0, 32 - (zeros_err + zeros_far))
    step = jnp.where(
        err > 0,
        (err >> jnp.minimum(shift_num, 31)) * far_spectrum,
        -((-err >> jnp.minimum(shift_num, 31)) * far_spectrum),
    )
    step = spl.div_w32_w16(step, jnp.arange(1, PART_LEN1 + 1))
    shift2 = shift_num + shift_ch_far - xfa_q - mu - ((30 - zeros_far) << 1)
    overflow = spl.norm_w32(step) < shift2
    step = jnp.where(overflow, 0x7FFFFFFF, shift_w32(step, shift2))
    # WebRtcSpl_AddSatW32 without int64 (x64 off): detect same-sign wrap.
    wrap_sum = ch32 + step
    new_ch32 = jnp.where(
        (ch32 > 0) & (step > 0) & (wrap_sum < 0),
        0x7FFFFFFF,
        jnp.where((ch32 < 0) & (step < 0) & (wrap_sum >= 0),
                  jnp.int32(-0x80000000), wrap_sum),
    )
    new_ch32 = jnp.maximum(new_ch32, 0)
    do_upd = (mu > 0) & can_update
    ch32 = jnp.where(do_upd, new_ch32, ch32)
    channel_adapt16 = jnp.where(do_upd, ch32 >> 16, channel_adapt16)

    # Store/reset decisions (aecm_core.cc:955-1010). The MSE counter only
    # runs outside the startup-store branch.
    store_startup = (startup == 0) & (vad_value == 1)
    mse_count = jnp.where(
        store_startup,
        state.mse_channel_count,
        jnp.where(far_log < e_mse, 0, state.mse_channel_count + 1),
    )
    do_mse = ~store_startup & (mse_count >= MIN_MSE_COUNT + 10)
    mse_stored = jnp.sum(jnp.abs(
        echo_stored_log[:MIN_MSE_COUNT] - near_log[:MIN_MSE_COUNT]
    ))
    mse_adapt = jnp.sum(jnp.abs(
        echo_adapt_log[:MIN_MSE_COUNT] - near_log[:MIN_MSE_COUNT]
    ))
    reset_adapt = do_mse & (
        ((mse_stored << MSE_RESOLUTION) < (MIN_MSE_DIFF * mse_adapt))
        & ((state.mse_stored_old << MSE_RESOLUTION)
           < (MIN_MSE_DIFF * state.mse_adapt_old))
    )
    store_adapt = do_mse & ~reset_adapt & (
        ((MIN_MSE_DIFF * mse_stored) > (mse_adapt << MSE_RESOLUTION))
        & (mse_adapt < state.mse_threshold)
        & (state.mse_adapt_old < state.mse_threshold)
    )
    channel_stored = jnp.where(
        store_startup | store_adapt, channel_adapt16, state.channel_stored
    )
    echo_est = jnp.where(
        store_startup | store_adapt, channel_stored * far_spectrum, echo_est
    )
    channel_adapt16 = jnp.where(reset_adapt, channel_stored, channel_adapt16)
    ch32 = jnp.where(reset_adapt, channel_stored << 16, ch32)
    mse_threshold = jnp.where(
        store_adapt,
        jnp.where(
            state.mse_threshold == 0x7FFFFFFF,
            mse_adapt + state.mse_adapt_old,
            state.mse_threshold
            + (((mse_adapt - state.mse_threshold * 5 // 8) * 205) >> 8),
        ),
        state.mse_threshold,
    )
    mse_stored_old = jnp.where(do_mse, mse_stored, state.mse_stored_old)
    mse_adapt_old = jnp.where(do_mse, mse_adapt, state.mse_adapt_old)
    mse_count = jnp.where(do_mse, 0, mse_count)

    # --- CalcSuppressionGain (aecm_core.cc:1014-1076).
    _, par_a, par_d, diff_ab, diff_bd = sup_gain_params(echo_mode)
    dE = jnp.abs(near_log[0] - echo_stored_log[0] - ENERGY_DEV_OFFSET)
    sup = jnp.where(
        vad_value == 0,
        0,
        jnp.where(
            dE < ENERGY_DEV_TOL,
            jnp.where(
                dE < SUPGAIN_EPC_DT,
                par_a - spl.div_w32_w16(
                    diff_ab * dE + (SUPGAIN_EPC_DT >> 1), SUPGAIN_EPC_DT
                ),
                par_d + spl.div_w32_w16(
                    diff_bd * (ENERGY_DEV_TOL - dE)
                    + ((ENERGY_DEV_TOL - SUPGAIN_EPC_DT) >> 1),
                    ENERGY_DEV_TOL - SUPGAIN_EPC_DT,
                ),
            ),
            par_d,
        ),
    ).astype(jnp.int32)
    hold = jnp.maximum(sup, state.sup_gain_old)
    sup_gain = state.sup_gain + ((hold - state.sup_gain) >> 4)

    # --- Wiener-like NLP gain (aecm_core_c.cc:380-478).
    # (int64{diff} * 50) >> 8 without int64: split into high/low limbs
    # (exact because diff == (diff>>8)*256 + (diff&255) in two's
    # complement and the low term is non-negative).
    ef_diff = echo_est - state.echo_filt
    echo_filt = state.echo_filt + (
        (ef_diff >> 8) * 50 + (((ef_diff & 255) * 50) >> 8)
    )
    zeros32 = spl.norm_w32(echo_filt) + 1
    zeros16 = _norm_w16(sup_gain) + 1
    fits = zeros32 + zeros16 > 16
    t = 17 - zeros32 - zeros16
    echo_gained = jnp.where(
        fits,
        echo_filt * sup_gain,
        jnp.where(
            zeros32 > t,
            echo_filt * (sup_gain >> jnp.clip(t, 0, 31)),
            (echo_filt >> jnp.clip(t, 0, 31)) * sup_gain,
        ),
    )
    res_diff = jnp.where(
        fits,
        14 - RESOLUTION_CHANNEL16 - RESOLUTION_SUPGAIN + dfa_q - x_q,
        14 + t - RESOLUTION_CHANNEL16 - RESOLUTION_SUPGAIN + dfa_q - x_q,
    )

    # Near-end filter smoothing in matched Q-domains.
    zeros16n = _norm_w16(state.near_filt)
    q_diff = dfa_q - dfa_q_old
    use_shiftup = (zeros16n < q_diff) & (state.near_filt != 0)
    nf_scaled = jnp.where(
        use_shiftup,
        state.near_filt << jnp.clip(zeros16n, 0, 15),
        shift_w32(state.near_filt, q_diff),
    )
    qd = jnp.where(use_shiftup, zeros16n - q_diff, 0)
    dfa_cmp = jnp.where(use_shiftup, dfa >> jnp.clip(-qd, 0, 31), dfa)
    nf_new = nf_scaled + ((dfa_cmp - nf_scaled) >> 4)
    # Reference saturation check is `tmp16no2 & (-qDomainDiff > zeros16)` —
    # a bitwise AND with a bool, i.e. it only fires for odd values
    # (aecm_core_c.cc:560-566); reproduced verbatim.
    sat_nf = ((nf_new & 1) != 0) & (-qd > _norm_w16(nf_new))
    shifted_nf = jnp.where(
        qd < 0, nf_new << jnp.clip(-qd, 0, 15), nf_new >> jnp.clip(qd, 0, 15)
    )
    # nearFilt is an int16_t in C; emulate the narrowing store.
    shifted_nf = ((shifted_nf + 0x8000) & 0xFFFF) - 0x8000
    near_filt = jnp.where(sat_nf, 32767, shifted_nf)

    # DivU32U16 is an unsigned division; echoEst32Gained can carry uint32
    # bit patterns (aecm_core_c.cc:577-583).
    num_u = (echo_gained.astype(jnp.uint32)
             + (near_filt >> 1).astype(jnp.uint32))
    denom = jnp.maximum(near_filt, 1).astype(jnp.uint32)
    ratio = shift_u32((num_u // denom).astype(jnp.int32), res_diff)
    hnl = jnp.where(
        echo_gained == 0,
        ONE_Q14,
        jnp.where(
            near_filt == 0,
            0,
            jnp.clip(ONE_Q14 - ratio, 0, ONE_Q14),
        ),
    ).astype(jnp.int32)

    # numPosCoef is counted on the Wiener-stage hnl, before the wideband
    # squaring and before NLP truncation (aecm_core_c.cc:598-600).
    num_pos = jnp.sum((hnl != 0).astype(jnp.int32))

    if mult == 2:
        hnl = (hnl * hnl) >> 14
        avg = jnp.sum(hnl[4:25]) // 21
        hnl = jnp.where(
            (jnp.arange(PART_LEN1) >= 24) & (hnl > avg), avg, hnl
        )

    if nlp:
        hnl = jnp.where(hnl > NLP_COMP_HIGH, ONE_Q14,
                        jnp.where(hnl < NLP_COMP_LOW, 0, hnl))
        nlp_gain = jnp.where(num_pos < 3, 0, ONE_Q14)
        hnl = jnp.where(
            (hnl == ONE_Q14) & (nlp_gain == ONE_Q14),
            ONE_Q14,
            (hnl * nlp_gain) >> 14,
        )

    def round14(a, b):
        return (a * b + (1 << 13)) >> 14

    efw_re = round14(dre, hnl)
    efw_im = round14(dim, hnl)

    if debug_taps is not None:
        debug_taps.update(
            q=dfa_q, xq=x_q, delay=delay, mu=mu, sg=sup_gain,
            vad=vad_value, ca16=jnp.sum(channel_adapt16),
            ca32=jnp.sum(ch32.astype(jnp.int64)),
            ef=jnp.sum(state.echo_filt), nf=jnp.sum(state.near_filt),
            fle=far_log, ss=startup, dsum=dfa_sum, xsum=xfa_sum,
            npc=num_pos, hsum=jnp.sum(hnl), h0=hnl[0], h1=hnl[1],
            h8=hnl[8], h32=hnl[32], h64=hnl[64],
            efw0=(efw_re[0], efw_im[0]), efw1=(efw_re[1], efw_im[1]),
            efw8=(efw_re[8], efw_im[8]),
        )

    # --- Comfort noise (aecm_core_c.cc:44-135).
    seed = state.seed
    noise_est = state.noise_est
    too_low = state.noise_est_too_low
    too_high = state.noise_est_too_high
    noise_ctr = jnp.minimum(state.noise_est_ctr + 1, 100)
    if cng:
        # ComfortNoise (aecm_core_c.cc:61-172). kNoiseEstQDomain = 15.
        shift_noise = jnp.clip(15 - dfa_q, 0, 15)
        min_track = jnp.where(state.noise_est_ctr < 100, 6, 9)
        out_l = dfa << shift_noise
        below = out_l < noise_est
        small = noise_est < (1 << min_track)
        # Below the estimate: track the minimum.
        inc_high = jnp.where(
            below & small, too_high + 1, jnp.where(below, too_high, 0)
        )
        dec = below & small & (inc_high >= 5)
        noise_dn = jnp.where(
            small,
            noise_est - dec.astype(jnp.int32),
            noise_est - ((noise_est - out_l) >> min_track),
        )
        inc_high = jnp.where(dec, 0, inc_high)
        # At/above the estimate: ramp slowly upwards.
        tiny = (noise_est >> 11) <= 0
        # tooLowCtr: incremented only in the small-value ramp branch, reset
        # on bump or when below; otherwise KEPT (aecm_core_c.cc:118-135).
        low_inc = jnp.where(~below & tiny, too_low + 1, too_low)
        bump = ~below & tiny & (low_inc >= 5)
        noise_up = jnp.where(
            (noise_est >> 19) > 0,
            (noise_est >> 11) * 2049,
            jnp.where(
                ~tiny,
                (noise_est * 2049) >> 11,
                jnp.where(bump, noise_est + (noise_est >> 9) + 1, noise_est),
            ),
        )
        low_inc = jnp.where(bump, 0, low_inc)
        too_low = jnp.where(below, 0, low_inc)
        too_high = jnp.where(below, inc_high, 0)
        noise_est = jnp.where(below, noise_dn, noise_up)

        # Read back in the near-end domain, with saturation writeback.
        read = noise_est >> shift_noise
        sat = read > 32767
        noise_est = jnp.where(sat, 32767 << shift_noise, noise_est)
        noise_r = jnp.minimum(read, 32767)
        noise_r = ((ONE_Q14 - hnl) * noise_r) >> 14

        # WebRtcSpl_RandU LCG phases (randomization_functions.c:84-104).
        def lcg(s, _):
            s = (s * jnp.uint32(69069) + jnp.uint32(1))
            return s, ((s >> jnp.uint32(16)) & jnp.uint32(0x7FFF)).astype(
                jnp.int32
            )

        seed, rnd = jax.lax.scan(lcg, seed, None, length=PART_LEN)
        idx = (359 * rnd) >> 15
        u_re = jnp.zeros((PART_LEN1,), jnp.int32)
        u_im = jnp.zeros((PART_LEN1,), jnp.int32)
        u_re = u_re.at[1:].set((noise_r[1:] * COS_TABLE[idx]) >> 13)
        u_im = u_im.at[1:].set((-noise_r[1:] * SIN_TABLE[idx]) >> 13)
        u_im = u_im.at[PART_LEN].set(0)
        efw_re = jnp.clip(efw_re + u_re, -32768, 32767)
        efw_im = jnp.clip(efw_im + u_im, -32768, 32767)

    if debug_taps is not None:
        debug_taps.update(
            efwsum=(jnp.sum(efw_re), jnp.sum(efw_im)),
            efw0c=(efw_re[0], efw_im[0]), efw8c=(efw_re[8], efw_im[8]),
            seed=seed,
        )

    # --- InverseFFTAndWindow (aecm_core_c.cc:202-246), bit-exact: the
    # synthesis input is the conjugate of efw, the int IFFT returns the
    # accumulated renormalization count outCFFT, and the output is shifted
    # by outCFFT - dfaCleanQDomain before overlap-add.
    ifft, out_cfft = int_fft.real_inverse_fft_i16(
        efw_re, int_fft._wrap16(-efw_im)
    )
    first = int_fft._wrap16(
        (ifft[:PART_LEN] * SQRT_HANNING[:PART_LEN] + 8192) >> 14
    )
    qshift = out_cfft - dfa_q  # dfaCleanQDomain == dfaNoisyQDomain here

    def shift_w32(x):
        return jnp.where(qshift >= 0, x << qshift, x >> (-qshift))

    out = jnp.clip(shift_w32(first) + state.outbuf, -32768, 32767).astype(
        jnp.int32
    )
    second = (ifft[PART_LEN:] * SQRT_HANNING[PART_LEN:0:-1]) >> 14
    outbuf = jnp.clip(shift_w32(second), -32768, 32767).astype(jnp.int32)

    if debug_taps is not None:
        debug_taps.update(outcfft=out_cfft, out03=out[:4],
                          osum=jnp.sum(out))

    new_state = state.replace(
        xbuf=xbuf,
        dbuf_noisy=dbuf,
        outbuf=outbuf,
        dfa_noisy_q=dfa_q,
        dfa_noisy_q_old=dfa_q_old,
        far_history=far_history,
        far_q_domains=far_q_domains,
        far_history_pos=pos,
        delay_estimator=de_state,
        channel_stored=channel_stored,
        channel_adapt16=channel_adapt16,
        channel_adapt32=ch32,
        near_log_energy=near_log,
        echo_adapt_log_energy=echo_adapt_log,
        echo_stored_log_energy=echo_stored_log,
        far_log_energy=far_log,
        far_energy_min=e_min,
        far_energy_max=e_max,
        far_energy_maxmin=e_maxmin,
        far_energy_vad=e_vad,
        far_energy_mse=e_mse,
        current_vad_value=vad_value,
        vad_update_count=vad_count,
        first_vad=first_vad,
        mse_adapt_old=mse_adapt_old,
        mse_stored_old=mse_stored_old,
        mse_threshold=mse_threshold,
        mse_channel_count=mse_count,
        startup_state=startup,
        tot_count=tot_count,
        sup_gain=sup_gain,
        sup_gain_old=sup,
        echo_filt=echo_filt,
        near_filt=near_filt,
        noise_est=noise_est,
        noise_est_too_low=too_low,
        noise_est_too_high=too_high,
        noise_est_ctr=noise_ctr,
        seed=seed,
    )
    return new_state, out
