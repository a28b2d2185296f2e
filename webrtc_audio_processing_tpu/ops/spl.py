"""Fixed-point SPL kernel primitives (int32 Q-math, exact C semantics).

Reference: common_audio/signal_processing/ — the legacy fixed-point kernel
library used by AGC1, AECM and the legacy VAD (spl_sqrt.c, resample_by_2.c,
spl_inl.h min/max/norm helpers). TPUs handle int32 natively; 32x32 products
that need 64-bit intermediates are decomposed into exact hi/lo 16-bit
partial products so no int64 is required (x64 mode stays off).

All functions operate elementwise on int32 arrays unless stated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

I32 = jnp.int32
WORD32_MAX = jnp.int32(0x7FFFFFFF)
WORD32_MIN = jnp.int32(-0x80000000)


def _i32(x):
    return jnp.asarray(x, I32)


def norm_u32(x):
    """WebRtcSpl_NormU32: leading zeros of a uint32 (0 for 0 input per the
    callers' guards; here returns 32 for 0 which callers mask)."""
    x = _i32(x).view(jnp.uint32)
    # Binary-search count of leading zeros, exactly like spl_inl.h.
    zeros = jnp.zeros(x.shape, I32)
    for shift, mask in ((16, 0xFFFF0000), (8, 0xFF000000), (4, 0xF0000000),
                        (2, 0xC0000000), (1, 0x80000000)):
        cond = (x << zeros.astype(jnp.uint32)) & jnp.uint32(mask)
        add = jnp.where(cond == 0, shift, 0).astype(I32)
        zeros = zeros + add
    return zeros


def norm_w32(x):
    """WebRtcSpl_NormW32: shifts to normalize a signed int32 (0 for 0)."""
    x = _i32(x)
    ax = jnp.where(x < 0, ~x, x)  # C uses value ^ (value >> 31)
    n = norm_u32(ax) - 1
    return jnp.where(x == 0, 0, n)


def add_sat_w16(a, b):
    s = _i32(a) + _i32(b)
    return jnp.clip(s, -32768, 32767)


def sat_w32_to_w16(x):
    return jnp.clip(_i32(x), -32768, 32767)


def div_w32_w16(num, den):
    """WebRtcSpl_DivW32W16: C truncating division (toward zero)."""
    num = _i32(num)
    den = _i32(den)
    q = jnp.abs(num) // jnp.maximum(jnp.abs(den), 1)
    return jnp.where((num < 0) ^ (den < 0), -q, q).astype(I32)


def mul_hi16(a, b16):
    """(a * b16) >> 16 for int32 a and 16-bit b, exact via hi/lo split.

    Matches C `(int64_t)a * b >> 16` (arithmetic shift, floor).
    """
    a = _i32(a)
    b16 = _i32(b16)
    hi = a >> 16  # floor
    lo = a & 0xFFFF
    return hi * b16 + ((lo * b16) >> 16)


def scalediff32(a16, b32, c32):
    """WEBRTC_SPL_SCALEDIFF32(A,B,C) = C + (B>>16)*A + ((0xFFFF&B)*A >> 16)
    (spl_inl.h / resample_by_2.c MUL_ACCUM).

    The low-part product is computed in C as ``(uint32_t)(0xFFFF & B) * A``
    — unsigned 32-bit with wraparound — and shifted LOGICALLY. For
    A >= 32768 (e.g. the resampler allpass coefficients 37471/49528/60255)
    the product exceeds int32, so the unsigned wrap must be emulated.
    NOT the same as digital_agc.cc's AGC_SCALEDIFF32, which is all-signed
    (agc_scalediff32 below)."""
    a16 = _i32(a16)
    b32 = _i32(b32)
    lo = ((b32 & 0xFFFF).astype(jnp.uint32)
          * a16.astype(jnp.uint32)) >> jnp.uint32(16)
    return _i32(c32) + (b32 >> 16) * a16 + lo.astype(I32)


def agc_scalediff32(a, b, c):
    """AGC_SCALEDIFF32(A,B,C) = C + (B>>16)*A + ((0xFFFF&B)*A >> 16)
    (digital_agc.cc:64-65) — all SIGNED int arithmetic, unlike the
    resampler macro of the same shape."""
    a = _i32(a)
    b = _i32(b)
    return _i32(c) + (b >> 16) * a + (((b & 0xFFFF) * a) >> 16)


def agc_mul32(a, b):
    """AGC_MUL32(A,B) = (B>>13)*A + ((0x1FFF & B)*A >> 13)
    (digital_agc.cc:61) — signed int arithmetic."""
    a = _i32(a)
    b = _i32(b)
    return (b >> 13) * a + (((b & 0x1FFF) * a) >> 13)


def _sqrt_local(a):
    """WebRtcSpl_SqrtLocal (spl_sqrt.c:17-63), elementwise."""
    a = _i32(a)
    b = a // 2
    b = b - 0x40000000
    x_half = (b >> 16).astype(I32)  # int16 range
    x_half = ((x_half + 0x8000) & 0xFFFF) - 0x8000  # cast to int16
    b = b + 0x40000000
    b = b + 0x40000000
    x2 = x_half * x_half * 2
    A = -x2
    b = b + (A >> 1)
    A = A >> 16
    A = A * A * 2
    t16 = ((A >> 16) + 0x8000).astype(I32) % 0x10000 - 0x8000
    b = b + (-20480) * t16 * 2
    A = x_half * t16 * 2
    t16 = ((A >> 16) + 0x8000) % 0x10000 - 0x8000
    b = b + 28672 * t16 * 2
    t16 = ((x2 >> 16) + 0x8000) % 0x10000 - 0x8000
    A = x_half * t16 * 2
    b = b + (A >> 1)
    return b + 32768


def sqrt_i32(value):
    """WebRtcSpl_Sqrt (spl_sqrt.c:66-150), elementwise exact."""
    v = _i32(value)
    A = jnp.where(v < 0, jnp.where(v == WORD32_MIN, WORD32_MAX, -v), v)
    is_zero = A == 0
    A_safe = jnp.maximum(A, 1)
    sh = norm_w32(A_safe)
    A_n = (A_safe.view(jnp.uint32) << sh.astype(jnp.uint32)).view(I32)
    A_n = jnp.where(
        A_n < (WORD32_MAX - 32767), A_n + 32768, WORD32_MAX
    )
    x_norm = A_n >> 16  # int16
    nshift = sh // 2
    A2 = jnp.abs(x_norm << 16)
    A3 = _sqrt_local(A2)
    even = 2 * nshift == sh
    t16 = A3 >> 16
    Ae = 23170 * t16 * 2
    Ae = Ae + 32768
    Ae = Ae & 0x7FFF0000
    Ae = Ae >> 15
    Ao = A3 >> 16
    out = jnp.where(even, Ae, Ao)
    out = out & 0xFFFF
    out = out >> nshift
    return jnp.where(is_zero, 0, out)


# Allpass decimator coefficients (resample_by_2.c:58-59).
_ALLPASS1 = (3284, 24441, 49528)
_ALLPASS2 = (12199, 37471, 60255)


def downsample_by_2(x, filt_state):
    """WebRtcSpl_DownsampleBy2 (resample_by_2.c:71-128).

    x: (N,) int32 (int16-valued); filt_state: (8,) int32.
    Returns (y (N//2,) int32, new_state).
    """
    x = _i32(x)

    def step(state, pair):
        s0, s1, s2, s3, s4, s5, s6, s7 = [state[i] for i in range(8)]
        in32 = pair[0] * 1024
        diff = in32 - s1
        t1 = scalediff32(_ALLPASS2[0], diff, s0)
        s0 = in32
        diff = t1 - s2
        t2 = scalediff32(_ALLPASS2[1], diff, s1)
        s1 = t1
        diff = t2 - s3
        s3 = scalediff32(_ALLPASS2[2], diff, s2)
        s2 = t2

        in32 = pair[1] * 1024
        diff = in32 - s5
        t1 = scalediff32(_ALLPASS1[0], diff, s4)
        s4 = in32
        diff = t1 - s6
        t2 = scalediff32(_ALLPASS1[1], diff, s5)
        s5 = t1
        diff = t2 - s7
        s7 = scalediff32(_ALLPASS1[2], diff, s6)
        s6 = t2

        out = sat_w32_to_w16((s3 + s7 + 1024) >> 11)
        return jnp.stack([s0, s1, s2, s3, s4, s5, s6, s7]), out

    pairs = x.reshape(-1, 2)
    new_state, y = jax.lax.scan(step, _i32(filt_state), pairs)
    return y, new_state
