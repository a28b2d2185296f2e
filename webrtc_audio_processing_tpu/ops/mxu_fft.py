"""Batched small real FFTs as DFT matmuls (MXU-friendly).

The APM workloads run thousands of *tiny* FFTs per step — 128-pt for AEC3
(aec3/aec3_fft.h, Ooura rdft) and 256-pt for NS (ns/ns_fft.cc) — vmapped
over streams/channels/partitions. On TPU the fastest way to execute a large
batch of tiny transforms is not a butterfly network (VPU shuffles) but a
dense matmul against the DFT matrix on the 128x128 MXU systolic array:

    X_re = x @ C,   X_im = x @ S           (B, N) @ (N, N/2+1)

For N=128 this is exactly one MXU tile; for N=256 four. At batch >= 1k the
matmul form keeps the MXU busy and fuses with neighboring elementwise work,
while `jnp.fft.rfft` lowers to a generic FFT that TPUs execute on the VPU.

Numerics: f32 matmul-DFT matches rfft to ~1e-4 absolute for unit-scale
inputs (within the <=1e-3 RMS conformance target vs the C++ reference —
BASELINE.md). On CPU (tests) the jnp.fft path is used; select via
``use_matmul``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rfft_matmul", "irfft_matmul", "rfft", "irfft", "default_backend"]


@functools.lru_cache(maxsize=8)
def _dft_matrices(n: int):
    """(C, S) with shapes (n, n//2+1): cos/-sin DFT basis, f32.

    Cached as host arrays — caching device arrays would leak tracers when
    first touched inside a jit trace."""
    k = np.arange(n)[:, None]
    f = np.arange(n // 2 + 1)[None, :]
    ang = 2.0 * np.pi * k * f / n
    c = np.cos(ang).astype(np.float32)
    s = (-np.sin(ang)).astype(np.float32)
    return c, s


@functools.lru_cache(maxsize=8)
def _dft_matrix_packed(n: int):
    """(n, 2*(n//2+1)) packed [cos | -sin] basis: one matmul per rfft."""
    c, s = _dft_matrices(n)
    return np.concatenate([c, s], axis=1)


@functools.lru_cache(maxsize=8)
def _idft_matrix_packed(n: int):
    """(2*(n//2+1), n) stacked inverse basis: one matmul per irfft."""
    c, s = _idft_matrices(n)
    return np.concatenate([c, s], axis=0)


@functools.lru_cache(maxsize=8)
def _idft_matrices(n: int):
    """(C, S) with shapes (n//2+1, n) for the inverse real transform.

    irfft(X)[t] = (1/n) * sum_f w_f * (re[f] cos(2pi f t/n) - im[f] sin(..))
    with w_f = 1 for f in {0, n/2} and 2 otherwise.
    """
    f = np.arange(n // 2 + 1)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * f * t / n
    w = np.full((n // 2 + 1, 1), 2.0, np.float32)
    w[0] = 1.0
    w[-1] = 1.0
    c = (w * np.cos(ang) / n).astype(np.float32)
    s = (-w * np.sin(ang) / n).astype(np.float32)
    return c, s


def rfft_matmul(x, n: int | None = None):
    """rfft over the last axis via two MXU matmuls.

    x: (..., n) real. Returns (..., n//2+1) complex64.
    """
    n = n or x.shape[-1]
    assert x.shape[-1] == n
    nb = n // 2 + 1
    x = x.astype(jnp.float32)
    # One matmul against the packed [cos | -sin] basis: x is read once and
    # the MXU sees a wider (more efficient) output tile than two nb-wide
    # matmuls.
    both = jnp.matmul(x, _dft_matrix_packed(n),
                      preferred_element_type=jnp.float32)
    return jax.lax.complex(both[..., :nb], both[..., nb:])


def irfft_matmul(X, n: int):
    """irfft over the last axis via two MXU matmuls.

    X: (..., n//2+1) complex. Returns (..., n) real float32.
    """
    re = jnp.real(X).astype(jnp.float32)
    im = jnp.imag(X).astype(jnp.float32)
    packed = jnp.concatenate([re, im], axis=-1)
    return jnp.matmul(packed, _idft_matrix_packed(n),
                      preferred_element_type=jnp.float32)


def default_backend() -> str:
    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


def rfft(x, n: int | None = None, use_matmul: bool | None = None):
    """Backend-dispatched rfft: matmul-DFT on TPU, jnp.fft elsewhere."""
    if use_matmul is None:
        use_matmul = default_backend() == "tpu"
    if use_matmul:
        return rfft_matmul(x, n)
    return jnp.fft.rfft(x, n=n, axis=-1)


def irfft(X, n: int, use_matmul: bool | None = None):
    if use_matmul is None:
        use_matmul = default_backend() == "tpu"
    if use_matmul:
        return irfft_matmul(X, n)
    return jnp.fft.irfft(X, n=n, axis=-1)
