"""Push-style windowed-sinc resampler (frame-synchronous, TPU-native).

Reference: webrtc/common_audio/resampler/sinc_resampler.{h,cc} (kernel-32
Blackman-windowed sinc with 32 interpolated sub-sample offsets,
InitializeKernel at sinc_resampler.cc:209-246, Resample loop :283-357) and
push_sinc_resampler.cc (fixed 10 ms frame push wrapper with the first-pass
priming trick that fixes total delay at kKernelSize/2 source samples).

TPU design: because each push call consumes exactly S source samples and
produces exactly D destination samples (S/D = io_ratio rational), the
reference's per-output virtual-index loop lands on the *same* sub-sample
phase pattern every frame. The whole resampler therefore compiles to a
static-shape gather of (D, 32) source windows from a rolling buffer followed
by a weighted reduction against a precomputed (D, 32) kernel matrix — one
fused VPU/MXU op per frame instead of a sequential loop, with state being
just the rolling buffer. The per-frame output positions are derived once in
float64 numpy (matching the C++ double ``virtual_source_idx_`` arithmetic).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

KERNEL_SIZE = 32
KERNEL_OFFSET_COUNT = 32


def _sinc_scale_factor(io_ratio: float) -> float:
    """Normalized cutoff (sinc_resampler.cc:102-115)."""
    factor = 1.0 / io_ratio if io_ratio > 1.0 else 1.0
    return factor * 0.9


def make_kernel_bank(io_ratio: float) -> np.ndarray:
    """(KERNEL_OFFSET_COUNT + 1, KERNEL_SIZE) Blackman-windowed sinc bank.

    Matches SincResampler::InitializeKernel (sinc_resampler.cc:209-246).
    """
    k_alpha = 0.16
    a0, a1, a2 = 0.5 * (1 - k_alpha), 0.5, 0.5 * k_alpha
    scale = _sinc_scale_factor(io_ratio)
    bank = np.zeros((KERNEL_OFFSET_COUNT + 1, KERNEL_SIZE), np.float32)
    for offset_idx in range(KERNEL_OFFSET_COUNT + 1):
        subsample = np.float32(offset_idx) / KERNEL_OFFSET_COUNT
        i = np.arange(KERNEL_SIZE)
        pre_sinc = (np.pi * (i - KERNEL_SIZE // 2 - subsample)).astype(np.float32)
        x = (i - subsample) / KERNEL_SIZE
        window = (a0 - a1 * np.cos(2 * np.pi * x) + a2 * np.cos(4 * np.pi * x)).astype(
            np.float32
        )
        safe = np.where(pre_sinc == 0, np.float32(1.0), pre_sinc)
        sinc = np.where(
            pre_sinc == 0,
            np.float32(scale),
            np.sin(scale * safe.astype(np.float64)).astype(np.float32) / safe,
        )
        bank[offset_idx] = window * sinc
    return bank


@functools.lru_cache(maxsize=64)
def make_plan(source_frames: int, dest_frames: int):
    """Static per-frame resampling plan for a (S -> D) push resampler.

    Derivation (mirrors the reference's control flow, sinc_resampler.cc
    :283-357 + push_sinc_resampler.cc:50-80): the priming pass leaves the
    virtual source index at a fixed phase v1 in [0, io_ratio); thereafter
    every frame emits D outputs at positions ``v1 + S - n_more*ratio +
    j*ratio`` relative to a rolling buffer ``B_f = [B_{f-1}[S:], frame_f]``
    of length 2S + 32 whose first frame is ``[zeros(S+32), frame_1]``.

    Returns (window_start_idx (D,) int32, kernel_matrix (D, 32) float32).
    """
    s, d = source_frames, dest_frames
    ratio = s / d
    half_k = KERNEL_SIZE // 2
    block0 = s - half_k
    n_prime = int(block0 / ratio)  # ChunkSize(): C++ size_t truncation
    v_p = n_prime * ratio
    n_more = int(np.ceil((block0 - v_p) / ratio))
    v1 = v_p + n_more * ratio - block0
    j = np.arange(d, dtype=np.float64)
    pos = v1 + s - n_more * ratio + j * ratio
    src_idx = np.floor(pos).astype(np.int64)
    subsample_remainder = pos - src_idx
    virtual_offset = subsample_remainder * KERNEL_OFFSET_COUNT
    offset_idx = np.floor(virtual_offset).astype(np.int64)
    interp = (virtual_offset - offset_idx).astype(np.float64)

    bank = make_kernel_bank(ratio).astype(np.float64)
    kernels = (1.0 - interp)[:, None] * bank[offset_idx] + interp[:, None] * bank[
        offset_idx + 1
    ]
    # Cache plain numpy (never jnp: arrays created while tracing would cache
    # tracers and leak across jit boundaries); callers convert per use.
    return src_idx.astype(np.int32), kernels.astype(np.float32)


def init_state(source_frames: int, batch_shape=(), dtype=jnp.float32):
    """Rolling buffer of length 2S + 32, zero-initialized (priming pass)."""
    return jnp.zeros((2 * source_frames + KERNEL_SIZE,) + tuple(batch_shape), dtype)


def resample_frame(state, frame, source_frames: int, dest_frames: int):
    """Push one frame of S source samples, get D destination samples.

    Args:
      state: rolling buffer (2S + 32, ...).
      frame: (S, ...) new source samples (time leading).
      source_frames, dest_frames: static sizes.

    Returns:
      (new_state, out) with out of shape (D, ...).

    Output delay matches PushSincResampler: kKernelSize/2 source samples
    (push_sinc_resampler.cc:60-75); the first frame's leading outputs are
    zeros exactly like the reference's priming behavior.
    """
    s = source_frames
    buf = jnp.concatenate([state[s:], frame], axis=0)
    src_idx_np, kernels_np = make_plan(s, dest_frames)
    src_idx = jnp.asarray(src_idx_np)
    kernels = jnp.asarray(kernels_np)
    # (D, 32, ...) windows via static gather.
    gather_idx = src_idx[:, None] + jnp.arange(KERNEL_SIZE, dtype=jnp.int32)[None, :]
    windows = buf[gather_idx]  # (D, 32, ...)
    k = kernels.reshape(kernels.shape + (1,) * (frame.ndim - 1))
    out = jnp.sum(windows * k, axis=1)
    return buf, out


class PushSincResampler:
    """Convenience stateful host-side wrapper (single channel, numpy I/O).

    Functional code should use ``init_state`` / ``resample_frame`` directly.
    """

    def __init__(self, source_frames: int, dest_frames: int):
        self.source_frames = source_frames
        self.dest_frames = dest_frames
        self.state = init_state(source_frames)

    def resample(self, frame):
        self.state, out = resample_frame(
            self.state, jnp.asarray(frame, jnp.float32), self.source_frames, self.dest_frames
        )
        return np.asarray(out)
