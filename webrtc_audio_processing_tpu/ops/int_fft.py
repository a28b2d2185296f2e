"""Bit-exact int16 radix-2 FFT (the SPL fixed-point FFT the AECM uses).

Reference: common_audio/signal_processing/complex_fft.c (mode 1,
CFFTSFT=14, CFFTRND=1, CFFTRND2=16384; IFFT with per-stage data-dependent
scaling), real_fft.c (real wrappers), complex_bit_reverse.c, and
complex_fft_tables.h (kSinTable1024[i] == trunc(32767*sin(2*pi*i/1024)),
verified entry-for-entry in tests).

TPU-first formulation: each butterfly stage is a static reshape into
(blocks, 2, l) halves — no dynamic indices, so the whole transform
vectorizes over arbitrary leading batch axes. The IFFT's per-stage
renormalization shift is a per-batch scalar that broadcasts through the
elementwise ops. All arithmetic is int32 with explicit int16 wraparound,
matching C's (int16_t) casts; >> is arithmetic in both.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_SIN_1024 = np.trunc(32767.0 * np.sin(2.0 * np.pi * np.arange(1024) / 1024.0)
                     ).astype(np.int32)


def _bit_reverse_perm(order: int) -> np.ndarray:
    n = 1 << order
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(order):
        rev |= ((idx >> b) & 1) << (order - 1 - b)
    return rev


_PERM = {order: _bit_reverse_perm(order) for order in (7, 8)}


def _wrap16(v):
    return ((v + 0x8000) & 0xFFFF) - 0x8000


def _stage_geometry(order: int):
    """Static butterfly geometry per stage: (l, twiddle indices (l,))."""
    out = []
    l, k = 1, 9
    n = 1 << order
    while l < n:
        j = np.arange(l) << k
        out.append((l, j))
        k -= 1
        l <<= 1
    return out


def complex_fft_i16(re, im, order: int):
    """WebRtcSpl_ComplexFFT mode 1 (complex_fft.c:80-140), bit-reverse
    included (the real wrapper calls ComplexBitReverse first).

    re, im: (..., n) int32 arrays holding int16-valued data. Returns the
    transformed (re, im), int16-valued. Scales by 1/2 per stage with
    round-to-nearest at Q14 intermediate precision.
    """
    n = 1 << order
    perm = _PERM[order]
    re = re[..., perm]
    im = im[..., perm]
    for l, jidx in _stage_geometry(order):
        istep = 2 * l
        wr = jnp.asarray(_SIN_1024[jidx + 256])
        wi = jnp.asarray(-_SIN_1024[jidx])
        shp = re.shape[:-1] + (n // istep, 2, l)
        r = re.reshape(shp)
        i_ = im.reshape(shp)
        ar, ai = r[..., 0, :], i_[..., 0, :]
        br, bi = r[..., 1, :], i_[..., 1, :]
        tr = (wr * br - wi * bi + 1) >> 1  # CFFTRND, >> (15 - CFFTSFT)
        ti = (wr * bi + wi * br + 1) >> 1
        qr = ar << 14  # * (1 << CFFTSFT)
        qi = ai << 14
        new_a_r = _wrap16((qr + tr + 16384) >> 15)  # CFFTRND2, 1 + CFFTSFT
        new_a_i = _wrap16((qi + ti + 16384) >> 15)
        new_b_r = _wrap16((qr - tr + 16384) >> 15)
        new_b_i = _wrap16((qi - ti + 16384) >> 15)
        re = jnp.stack([new_a_r, new_b_r], axis=-2).reshape(re.shape)
        im = jnp.stack([new_a_i, new_b_i], axis=-2).reshape(im.shape)
    return re, im


def complex_ifft_i16(re, im, order: int):
    """WebRtcSpl_ComplexIFFT mode 1 (complex_fft.c:142-268).

    Per stage the data is renormalized by 0-2 extra right shifts depending
    on max |value| (thresholds 13573, 27146); the accumulated shift count
    is returned as `scale` — a (batch,) int32, exactly the C return value.
    """
    n = 1 << order
    perm = _PERM[order]
    re = re[..., perm]
    im = im[..., perm]
    scale = jnp.zeros(re.shape[:-1], jnp.int32)
    for l, jidx in _stage_geometry(order):
        istep = 2 * l
        mx = jnp.maximum(
            jnp.max(jnp.abs(re), axis=-1), jnp.max(jnp.abs(im), axis=-1)
        )
        shift = ((mx > 13573).astype(jnp.int32)
                 + (mx > 27146).astype(jnp.int32))
        scale = scale + shift
        round2 = 8192 << shift  # doubled per extra shift
        shift_b = shift[..., None, None]
        round2_b = round2[..., None, None]
        wr = jnp.asarray(_SIN_1024[jidx + 256])
        wi = jnp.asarray(_SIN_1024[jidx])  # +sin for the inverse
        shp = re.shape[:-1] + (n // istep, 2, l)
        r = re.reshape(shp)
        i_ = im.reshape(shp)
        ar, ai = r[..., 0, :], i_[..., 0, :]
        br, bi = r[..., 1, :], i_[..., 1, :]
        tr = (wr * br - wi * bi + 1) >> 1  # CIFFTRND, >> (15 - CIFFTSFT)
        ti = (wr * bi + wi * br + 1) >> 1
        qr = ar << 14
        qi = ai << 14
        sh = shift_b + 14  # shift + CIFFTSFT
        new_a_r = _wrap16((qr + tr + round2_b) >> sh)
        new_a_i = _wrap16((qi + ti + round2_b) >> sh)
        new_b_r = _wrap16((qr - tr + round2_b) >> sh)
        new_b_i = _wrap16((qi - ti + round2_b) >> sh)
        re = jnp.stack([new_a_r, new_b_r], axis=-2).reshape(re.shape)
        im = jnp.stack([new_a_i, new_b_i], axis=-2).reshape(im.shape)
    return re, im, scale


def real_forward_fft_i16(x, order: int = 7):
    """WebRtcSpl_RealForwardFFT (real_fft.c:47-73).

    x: (..., n) int32 int16-valued time signal. Returns (re, im), each
    (..., n//2 + 1) — the first n+2 int16 outputs of the complex FFT.
    """
    n = 1 << order
    re, im = complex_fft_i16(x, jnp.zeros_like(x), order)
    return re[..., : n // 2 + 1], im[..., : n // 2 + 1]


def real_inverse_fft_i16(re, im, order: int = 7):
    """WebRtcSpl_RealInverseFFT (real_fft.c:75-105).

    re, im: (..., n//2 + 1) int16-valued spectra. Reconstructs the
    conjugate-symmetric upper half, runs the int IFFT, and returns
    (x (..., n), scale (...,)) — real output and the accumulated shift.
    """
    n = 1 << order
    # buffer[k] = conj(in[n - k]) for k in (n/2, n).
    full_re = jnp.concatenate([re, re[..., n // 2 - 1:0:-1]], axis=-1)
    full_im = jnp.concatenate(
        [im, _wrap16(-im[..., n // 2 - 1:0:-1])], axis=-1
    )
    out_re, _out_im, scale = complex_ifft_i16(full_re, full_im, order)
    return out_re, scale
