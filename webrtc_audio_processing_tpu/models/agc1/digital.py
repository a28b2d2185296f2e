"""Legacy fixed-point digital AGC (Q-math twin).

Reference: agc/legacy/digital_agc.{h,cc} — the compressor gain table
(WebRtcAgc_CalculateGainTable), the per-millisecond gain computation with
fast/slow envelope capacitors and VAD-driven decay
(WebRtcAgc_ComputeDigitalGains), gain application with limiter
(WebRtcAgc_ApplyDigitalGains), and the energy-level AgcVad
(WebRtcAgc_InitVad/ProcessVad).

The gain table is static per config and computed in exact int math with
numpy at trace time; the per-frame processing runs in int32 JAX with the
same wrap/shift semantics as the C build (see ops/spl.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.ops import spl

# Modes (gain_control.h).
AGC_MODE_UNCHANGED = 0
AGC_MODE_ADAPTIVE_ANALOG = 1
AGC_MODE_ADAPTIVE_DIGITAL = 2
AGC_MODE_FIXED_DIGITAL = 3

_GEN_FUNC_TABLE = np.array([
    256, 485, 786, 1126, 1484, 1849, 2217, 2586, 2955, 3324, 3693,
    4063, 4432, 4801, 5171, 5540, 5909, 6279, 6648, 7017, 7387, 7756,
    8125, 8495, 8864, 9233, 9603, 9972, 10341, 10711, 11080, 11449, 11819,
    12188, 12557, 12927, 13296, 13665, 14035, 14404, 14773, 15143, 15512,
    15881, 16251, 16620, 16989, 17359, 17728, 18097, 18466, 18836, 19205,
    19574, 19944, 20313, 20682, 21052, 21421, 21790, 22160, 22529, 22898,
    23268, 23637, 24006, 24376, 24745, 25114, 25484, 25853, 26222, 26592,
    26961, 27330, 27700, 28069, 28438, 28808, 29177, 29546, 29916, 30285,
    30654, 31024, 31393, 31762, 32132, 32501, 32870, 33240, 33609, 33978,
    34348, 34717, 35086, 35456, 35825, 36194, 36564, 36933, 37302, 37672,
    38041, 38410, 38780, 39149, 39518, 39888, 40257, 40626, 40996, 41365,
    41734, 42104, 42473, 42842, 43212, 43581, 43950, 44320, 44689, 45058,
    45428, 45797, 46166, 46536, 46905], dtype=np.int64)


def _i32(x):
    return int(np.int32(np.int64(x) & 0xFFFFFFFF))


def _norm_w32(x):
    if x == 0:
        return 0
    ax = ~x if x < 0 else x
    n = 0
    while not ((ax << n) & 0x40000000):
        n += 1
    return n


def calculate_gain_table(dig_comp_gain_db: int, target_level_dbfs: int,
                         limiter_enable: bool, analog_target: int) -> np.ndarray:
    """WebRtcAgc_CalculateGainTable (digital_agc.cc:63-235), exact ints.

    Returns (32,) int32 Q16 gain table.
    """
    kLog10, kLog10_2, kLogE_1 = 54426, 49321, 23637
    kCompRatio = 3
    limiter_offset = 0

    tmp32no1 = (dig_comp_gain_db - analog_target) * (kCompRatio - 1)
    tmp16no1 = analog_target - target_level_dbfs
    tmp16no1 += int((tmp32no1 + (kCompRatio >> 1)) / kCompRatio)
    max_gain = max(tmp16no1, analog_target - target_level_dbfs)

    tmp32no1 = dig_comp_gain_db * (kCompRatio - 1)
    diff_gain = int((tmp32no1 + (kCompRatio >> 1)) / kCompRatio)
    if diff_gain < 0 or diff_gain >= len(_GEN_FUNC_TABLE):
        raise ValueError("bad diff_gain")

    limiter_lvl_x = analog_target - limiter_offset
    limiter_idx = 2 + int((limiter_lvl_x * (1 << 13)) / (kLog10_2 / 2))
    tmp16no1 = int((limiter_offset + (kCompRatio >> 1)) / kCompRatio)
    limiter_lvl = target_level_dbfs + tmp16no1

    const_max_gain = int(_GEN_FUNC_TABLE[diff_gain])
    const_lin_approx = 22817
    den = 20 * const_max_gain

    table = np.zeros(32, np.int64)
    for i in range(32):
        tmp16 = (kCompRatio - 1) * (i - 1)
        tmp32 = tmp16 * kLog10_2 + 1
        in_level = int(tmp32 / kCompRatio)
        in_level = diff_gain * (1 << 14) - in_level
        abs_in = abs(in_level)
        int_part = abs_in >> 14
        frac_part = abs_in & 0x3FFF
        t16 = int(_GEN_FUNC_TABLE[int_part + 1] - _GEN_FUNC_TABLE[int_part])
        u1 = t16 * frac_part
        u1 += int(_GEN_FUNC_TABLE[int_part]) << 14
        log_approx = u1 >> 8
        if in_level < 0:
            zeros = 32 - abs_in.bit_length() if abs_in else 32
            zeros_scale = 0
            if zeros < 15:
                u2 = abs_in >> (15 - zeros)
                u2 = u2 * kLogE_1
                if zeros < 9:
                    zeros_scale = 9 - zeros
                    u1 >>= zeros_scale
                else:
                    u2 >>= zeros - 9
            else:
                u2 = (abs_in * kLogE_1) >> 6
            log_approx = 0
            if u2 < u1:
                log_approx = (u1 - u2) >> (8 - zeros_scale)
        num_fix = (max_gain * const_max_gain) * (1 << 6)
        num_fix -= log_approx * diff_gain

        if num_fix > (den >> 8) or -num_fix > (den >> 8):
            zeros = _norm_w32(_i32(num_fix))
        else:
            zeros = _norm_w32(_i32(den)) + 8
        num_fix = _i32(num_fix * (1 << zeros))
        shifted = den << (zeros - 9) if zeros >= 9 else den >> (9 - zeros)
        y32 = int(num_fix / shifted) if shifted else 0
        y32 = (y32 + 1) >> 1 if y32 >= 0 else -((-y32 + 1) >> 1)

        if limiter_enable and i < limiter_idx:
            tmp32 = (i - 1) * kLog10_2 - limiter_lvl * (1 << 14)
            y32 = int((tmp32 + 10) / 20)
        if y32 > 39000:
            tmp32 = ((y32 >> 1) * kLog10 + 4096) >> 13
        else:
            tmp32 = (y32 * kLog10 + 8192) >> 14
        tmp32 += 16 << 14

        if tmp32 > 0:
            int_part = tmp32 >> 14
            frac_part = tmp32 & 0x3FFF
            if frac_part >> 13:
                t16 = (2 << 14) - const_lin_approx
                t2 = ((1 << 14) - frac_part) * t16
                t2 >>= 13
                t2 = (1 << 14) - t2
            else:
                t16 = const_lin_approx - (1 << 14)
                t2 = (frac_part * t16) >> 13
            frac_part = t2
            if int_part >= 14:
                table[i] = _i32((1 << int_part) + (frac_part << (int_part - 14)))
            else:
                table[i] = _i32((1 << int_part) + (frac_part >> (14 - int_part)))
        else:
            table[i] = 0
    return table.astype(np.int32)


# ----------------------------------------------------------------- AgcVad


@struct.dataclass
class AgcVadState:
    """AgcVad (digital_agc.h:19-30)."""

    down_state: jnp.ndarray  # (8,) int32
    hp_state: jnp.ndarray  # () int32 (int16 range)
    counter: jnp.ndarray  # () int32
    log_ratio: jnp.ndarray  # () int32 Q10
    mean_long_term: jnp.ndarray  # () int32 Q10
    variance_long_term: jnp.ndarray  # () int32 Q8
    std_long_term: jnp.ndarray  # () int32 Q10
    mean_short_term: jnp.ndarray  # () int32 Q10
    variance_short_term: jnp.ndarray  # () int32 Q8
    std_short_term: jnp.ndarray  # () int32 Q10


def init_vad() -> AgcVadState:
    return AgcVadState(
        down_state=jnp.zeros((8,), jnp.int32),
        hp_state=jnp.asarray(0, jnp.int32),
        counter=jnp.asarray(3, jnp.int32),
        log_ratio=jnp.asarray(0, jnp.int32),
        mean_long_term=jnp.asarray(15 << 10, jnp.int32),
        variance_long_term=jnp.asarray(500 << 8, jnp.int32),
        std_long_term=jnp.asarray(0, jnp.int32),
        mean_short_term=jnp.asarray(15 << 10, jnp.int32),
        variance_short_term=jnp.asarray(500 << 8, jnp.int32),
        std_short_term=jnp.asarray(0, jnp.int32),
    )


def process_vad(state: AgcVadState, x):
    """WebRtcAgc_ProcessVad (digital_agc.cc:576-707).

    x: (160,) or (80,) int32 samples (int16-valued, the 16 kHz band or the
    8 kHz frame). Returns (state, log_ratio).
    """
    n = x.shape[0]
    if n == 160:
        pairs = (x[0::2] + x[1::2]) >> 1  # average to 8 kHz
    else:
        pairs = x
    buf2, down_state = spl.downsample_by_2(pairs, state.down_state)  # (40,)

    # High-pass + energy, sequential over the 40 samples at 4 kHz.
    def hp_step(carry, b):
        hp, nrg = carry
        out = b + hp
        hp = ((600 * out) >> 10) - b
        nrg = nrg + out * (out // 64) + (out * (out % 64)) // 64
        return (hp, nrg), None

    (hp_state, nrg), _ = jax.lax.scan(
        hp_step, (state.hp_state, jnp.asarray(0, jnp.int32)), buf2
    )

    zeros = spl.norm_u32(nrg)  # 32 for nrg==0; the C bit tests give 31+...
    zeros = jnp.minimum(zeros, 31)
    dB = (15 - zeros) * (1 << 11)

    def wrap_i16(v):
        return ((v + 0x8000) & 0xFFFF) - 0x8000

    # The counter increments BEFORE the long-term updates (digital_agc.cc
    # :646-649), which then scale by the incremented counter and divide by
    # counter + 1.
    counter = jnp.minimum(state.counter + 1, 250)  # kAvgDecayTime
    mean_st = wrap_i16((state.mean_short_term * 15 + dB) >> 4)
    var_st = ((dB * dB) >> 12) + state.variance_short_term * 15
    var_st = var_st // 16
    std_st = wrap_i16(spl.sqrt_i32((var_st << 12) - mean_st * mean_st))

    mean_lt = wrap_i16(spl.div_w32_w16(
        state.mean_long_term * counter + dB, counter + 1
    ))
    var_lt = spl.div_w32_w16(
        ((dB * dB) >> 12) + state.variance_long_term * counter, counter + 1
    )
    std_lt = wrap_i16(spl.sqrt_i32((var_lt << 12) - mean_lt * mean_lt))

    # (dB - meanLongTerm) is cast to int16 before the multiply — a wrap the
    # reference keeps deliberately ("This is a bug, but has very little
    # significance", digital_agc.cc:683-689): full-scale silence makes the
    # difference overflow positive instead of saturating negative.
    tmp32 = (3 << 12) * wrap_i16(dB - mean_lt)
    tmp32 = spl.div_w32_w16(tmp32, jnp.maximum(std_lt, 1))
    tmp32b = state.log_ratio * (13 << 12)
    total = tmp32 + (tmp32b >> 10)
    total = total >> 6
    log_ratio = wrap_i16(jnp.clip(total, -2048, 2048))

    return (
        state.replace(
            down_state=down_state,
            hp_state=hp_state,
            counter=counter,
            log_ratio=log_ratio.astype(jnp.int32),
            mean_long_term=mean_lt,
            variance_long_term=var_lt,
            std_long_term=std_lt,
            mean_short_term=mean_st,
            variance_short_term=var_st,
            std_short_term=std_st,
        ),
        log_ratio.astype(jnp.int32),
    )


# ----------------------------------------------------------- digital AGC


@struct.dataclass
class DigitalAgcState:
    """DigitalAgc (digital_agc.h:32-44)."""

    capacitor_slow: jnp.ndarray  # () int32
    capacitor_fast: jnp.ndarray  # () int32
    gain: jnp.ndarray  # () int32
    gate_previous: jnp.ndarray  # () int32
    vad_nearend: AgcVadState
    vad_farend: AgcVadState


def init_digital(agc_mode: int) -> DigitalAgcState:
    return DigitalAgcState(
        capacitor_slow=jnp.asarray(
            0 if agc_mode == AGC_MODE_FIXED_DIGITAL else 134217728, jnp.int32
        ),
        capacitor_fast=jnp.asarray(0, jnp.int32),
        gain=jnp.asarray(65536, jnp.int32),
        gate_previous=jnp.asarray(0, jnp.int32),
        vad_nearend=init_vad(),
        vad_farend=init_vad(),
    )


def add_farend(state: DigitalAgcState, far):
    """WebRtcAgc_AddFarendToDigital (digital_agc.cc:258-266)."""
    vad, _ = process_vad(state.vad_farend, far)
    return state.replace(vad_farend=vad)


def compute_digital_gains(state: DigitalAgcState, band0, agc_mode: int,
                          gain_table, low_level_signal):
    """WebRtcAgc_ComputeDigitalGains (digital_agc.cc:269-466).

    band0: (160,) int32 16 kHz band samples (or (80,) at 8 kHz).
    gain_table: (32,) int32. Returns (state, gains (11,) int32).
    """
    n = band0.shape[0]
    L = n // 10

    vad_ne, logratio = process_vad(state.vad_nearend, band0)

    # Far-end VAD discount.
    logratio = jnp.where(
        state.vad_farend.counter > 10,
        (3 * logratio - state.vad_farend.log_ratio) >> 2,
        logratio,
    )

    upper_thr, lower_thr = 1024, 0
    decay = jnp.where(
        logratio > upper_thr,
        -65,
        jnp.where(logratio < lower_thr, 0,
                  ((lower_thr - logratio) * 65) >> 10),
    ).astype(jnp.int32)

    if agc_mode != AGC_MODE_FIXED_DIGITAL:
        decay = jnp.where(
            vad_ne.std_long_term < 4000,
            0,
            jnp.where(
                vad_ne.std_long_term < 8096,
                ((vad_ne.std_long_term - 4000) * decay) >> 12,
                decay,
            ),
        ).astype(jnp.int32)
        decay = jnp.where(low_level_signal, 0, decay)

    env = jnp.max((band0 * band0).reshape(10, L), axis=1)  # (10,)

    def gain_step(carry, e):
        cap_fast, cap_slow = carry
        cap_fast = spl.agc_scalediff32(-1000, cap_fast, cap_fast)
        cap_fast = jnp.maximum(cap_fast, e)
        cap_slow = jnp.where(
            e > cap_slow,
            spl.agc_scalediff32(500, e - cap_slow, cap_slow),
            spl.agc_scalediff32(decay, cap_slow, cap_slow),
        )
        cur = jnp.maximum(cap_fast, cap_slow)
        zeros = jnp.where(cur == 0, 31, spl.norm_u32(cur))
        tmp = ((cur.view(jnp.uint32) << zeros.astype(jnp.uint32)).view(
            jnp.int32
        ) & 0x7FFFFFFF)
        frac = tmp >> 19  # Q12
        diff = gain_table[jnp.maximum(zeros - 1, 0)] - gain_table[zeros]
        g = gain_table[zeros] + spl.mul_hi16(diff * frac, 1 << 4)
        g = gain_table[zeros] + ((diff >> 12) * frac + (
            (diff & 0xFFF) * frac >> 12))
        return (cap_fast, cap_slow), (g, zeros, frac, cap_fast)

    (cap_fast, cap_slow), (g_arr, zeros_arr, frac_arr, _cf) = jax.lax.scan(
        gain_step, (state.capacitor_fast, state.capacitor_slow), env
    )
    gains = jnp.concatenate([state.gain[None], g_arr])

    # Gate processing (:396-437).
    zeros = (zeros_arr[-1] << 9) - (frac_arr[-1] >> 3)
    zeros_fast = jnp.where(cap_fast == 0, 31, spl.norm_u32(cap_fast))
    tmpf = ((cap_fast.view(jnp.uint32) << zeros_fast.astype(jnp.uint32))
            .view(jnp.int32) & 0x7FFFFFFF)
    zeros_fast = (zeros_fast << 9) - (tmpf >> 22)
    gate = 1000 + zeros_fast - zeros - vad_ne.std_short_term

    gate_prev = jnp.where(
        gate < 0, 0, (gate + state.gate_previous * 7) >> 3
    )
    gate = jnp.where(gate < 0, gate, gate_prev)
    gain_adj = jnp.where(
        gate > 0, jnp.where(gate < 2500, (2500 - gate) >> 5, 0), 0
    )
    do_gate = gate > 0
    g0 = gain_table[0]
    big = (gains[1:] - g0) > 8388608
    adj = jnp.where(
        big,
        ((gains[1:] - g0) >> 8) * (178 + gain_adj),
        ((gains[1:] - g0) * (178 + gain_adj)) >> 8,
    )
    gains = gains.at[1:].set(jnp.where(do_gate, g0 + adj, gains[1:]))

    # Overload limiting (:439-476): iterative -0.1 dB reductions.
    def limit_one(g, e):
        def cond(g):
            zeros = jnp.where(g > 47452159, 16 - spl.norm_w32(g), 10)
            gain32 = (g >> zeros) + 1
            gain32 = gain32 * gain32
            lhs = spl.agc_mul32((e >> 12) + 1, gain32)
            shift = 2 * (1 - zeros + 10)
            rhs = jnp.where(
                shift >= 0, jnp.int32(32767) << jnp.maximum(shift, 0),
                jnp.int32(32767) >> jnp.maximum(-shift, 0),
            )
            return lhs > rhs

        def body(g):
            return jnp.where(
                g > 8388607, (g // 256) * 253, (g * 253) // 256
            )

        return jax.lax.while_loop(cond, body, g)

    limited = jax.vmap(limit_one)(gains[1:], env)
    gains = gains.at[1:].set(limited)

    # Gain reductions 1 ms earlier (:478-483): backward min over pairs.
    def back_step(nxt, g):
        g = jnp.minimum(g, nxt)
        return g, g

    _, rev = jax.lax.scan(back_step, gains[10], gains[1:10][::-1])
    gains = gains.at[1:10].set(rev[::-1])

    new_state = state.replace(
        capacitor_slow=cap_slow,
        capacitor_fast=cap_fast,
        gain=gains[10],
        gate_previous=gate_prev,
        vad_nearend=vad_ne,
    )
    return new_state, gains


def apply_digital_gains(gains, bands):
    """WebRtcAgc_ApplyDigitalGains (digital_agc.cc:485-556).

    gains: (11,) int32; bands: (num_bands, N) int32 samples.
    Returns (num_bands, N) int32.
    """
    n = bands.shape[-1]
    L = n // 10
    L2 = 3 if L == 8 else 4

    k = jnp.arange(10)
    deltas = (gains[1:] - gains[:10]) * (1 << (4 - L2))  # (10,)
    base = gains[:10] * 16
    samples = jnp.arange(L)
    gain32 = base[:, None] + deltas[:, None] * samples[None, :]  # (10, L)
    gain32 = gain32.reshape(-1)  # (N,)

    x = bands  # (B, N)

    def prod_shift16(a, b):
        # (a * b) >> 16 exactly for |a| <= 2^15 via hi/lo split of b.
        hi = b >> 16
        lo = b & 0xFFFF
        return a * hi + ((a * lo) >> 16)

    # First sub-frame uses an overload probe with saturation to the extremes
    # (:520-534); remaining sub-frames saturate normally (:537-555).
    first = slice(0, L)
    g_first = gain32[first]
    probe = prod_shift16(x[:, first], ((g_first + 127) >> 7)[None, :])
    exact = prod_shift16(x[:, first], (g_first >> 4)[None, :])
    y_first = jnp.where(
        probe > 4095, 32767, jnp.where(probe < -4096, -32768, exact)
    )

    rest = prod_shift16(x[:, L:], (gain32[L:] >> 4)[None, :])
    y_rest = jnp.clip(rest, -32768, 32767)
    return jnp.concatenate([y_first, y_rest], axis=-1)
