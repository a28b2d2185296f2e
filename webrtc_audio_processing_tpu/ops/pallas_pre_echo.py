"""Pallas TPU kernel: matched-filter pre-echo instantaneous error chunks.

Reference: MatchedFilter::Update's accumulated-error statistics
(matched_filter.cc:792-812) — for the winner filter, for each NLMS sample
i the partial filter outputs at every ACC_ERR_RATE-tap prefix are compared
against y_i and the squared errors accumulate per chunk.

The identity used (same as delay_estimator.py's reconstruction): with
h_i = h0 + sum_{j<i} a_j x_j,

    s_partial[i, c] = prefix_c( chunk_sums( (h0 + Wex_i) * x_i ) )
    inst[c]         = sum_i (y_i - s_partial[i, c])^2
    where Wex_i     = sum_{j<i} a_j x_j  (strict prefix, updated in-loop)

Why a kernel: the XLA formulation materializes the (sub, taps) sliding
windows of the render segment three times over ((B, 16, 512) stacks at
serving batch — measured ~9 ms of a 113 ms 10-frame chunk at B=1024 on a
v5e). Here the segment/filter stay VMEM-resident per stream tile and the
16-step recurrence runs on-chip: HBM traffic is one read of
(seg, h0, alphas, y) and one write of (chunks,) per stream (~5 KB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S = 8  # streams per grid step (sublane tile)


def pre_echo_inst_xla(seg, h0, alphas, y, *, sub, taps, acc_rate):
    """Reference-order XLA path for one stream (also the CPU fallback).

    seg: (sub-1+taps,), h0: (taps,), alphas: (sub,), y: (sub,).
    Returns (taps // acc_rate,) instantaneous squared-error chunks."""
    chunks = taps // acc_rate

    def step(carry, i):
        wex, acc = carry
        x_i = jax.lax.dynamic_slice(seg, (sub - 1 - i,), (taps,))
        p = (h0 + wex) * x_i
        part = jnp.cumsum(p.reshape(chunks, acc_rate).sum(-1))
        acc = acc + (y[i] - part) ** 2
        wex = wex + alphas[i] * x_i
        return (wex, acc), None

    (_, acc), _ = jax.lax.scan(
        step,
        (jnp.zeros((taps,), seg.dtype), jnp.zeros((chunks,), seg.dtype)),
        jnp.arange(sub),
    )
    return acc


def _kernel(seg_ref, h0_ref, a_ref, y_ref, out_ref, *, sub, taps, acc_rate,
            streams):
    chunks = taps // acc_rate
    seg = seg_ref[...]  # (S, seg_len)
    h0 = h0_ref[...]  # (S, taps)
    wex = jnp.zeros_like(h0)
    acc = jnp.zeros((streams, chunks), jnp.float32)
    seg_len = seg.shape[1]
    # Chunk-sum + inclusive prefix fused into one static MXU contraction:
    # M[t, c] = 1 iff t // acc_rate <= c, so (p @ M)[c] = prefix_c of the
    # acc_rate-chunk sums. (cumsum and lane-splitting reshapes have no
    # Mosaic lowering.)
    taps_i = jax.lax.broadcasted_iota(jnp.int32, (taps, chunks), 0)
    chunk_i = jax.lax.broadcasted_iota(jnp.int32, (taps, chunks), 1)
    M = (taps_i // acc_rate <= chunk_i).astype(jnp.float32)
    for i in range(sub):
        # x_i[t] = seg[sub-1-i+t]: left-roll by (sub-1-i), expressed as the
        # equivalent non-negative right-roll, then take the first `taps`.
        shift = (seg_len - (sub - 1 - i)) % seg_len
        x_i = pltpu.roll(seg, shift, 1)[:, :taps]
        p = (h0 + wex) * x_i
        part = jax.lax.dot(p, M, precision=jax.lax.Precision.HIGHEST)
        acc = acc + (y_ref[:, i][:, None] - part) ** 2
        wex = wex + a_ref[:, i][:, None] * x_i
    out_ref[...] = acc


def _t_kernel(seg_ref, h0_ref, a_ref, y_ref, out_ref, st8_ref,
              *, sub, taps, acc_rate, streams, p_rows):
    """Transposed (streams-on-lanes) variant: S=128 streams ride the LANE
    dimension, taps/chunks ride sublanes. The per-step chunk-prefix
    contraction becomes dot((chunks, taps), (taps, S)) — with chunks=128
    a full MXU tile, vs the stream-major kernel's 8-row feed (94% of the
    systolic array idle). Sliding windows at sublane offset o read ALIGNED
    slices of 8 pre-shifted copies of the transposed segment (the same
    st8 trick as ops/pallas_mf._mf_t_kernel)."""
    S = streams
    chunks = taps // acc_rate
    st = seg_ref[...].T  # (Lp, S)
    for k in range(8):
        st8_ref[k] = jax.lax.slice_in_dim(st, k, k + p_rows, axis=0)
    h0 = h0_ref[...].T  # (taps, S)
    y = y_ref[...]  # (sub, S)
    a = a_ref[...]  # (sub, S)

    # Mt[c, t] = 1 iff t // acc_rate <= c: chunk sums + inclusive prefix
    # in one contraction (see _kernel).
    chunk_c = jax.lax.broadcasted_iota(jnp.int32, (chunks, taps), 0)
    taps_t = jax.lax.broadcasted_iota(jnp.int32, (chunks, taps), 1)
    Mt = (taps_t // acc_rate <= chunk_c).astype(jnp.float32)

    wex = jnp.zeros((taps, S), jnp.float32)
    acc = jnp.zeros((chunks, S), jnp.float32)
    for i in range(sub):
        o = sub - 1 - i
        k = o % 8
        x_i = st8_ref[k, pl.ds(o - k, taps)]  # (taps, S) aligned slice
        p = (h0 + wex) * x_i
        part = jax.lax.dot(Mt, p, precision=jax.lax.Precision.HIGHEST)
        acc = acc + (y[i : i + 1] - part) ** 2
        wex = wex + a[i : i + 1] * x_i
    out_ref[...] = acc.T


@functools.partial(
    jax.jit, static_argnames=("sub", "taps", "acc_rate", "interpret")
)
def _pre_echo_tpu_t(seg, h0, alphas, y, *, sub, taps, acc_rate,
                    interpret=False):
    """Transposed-kernel driver (B must be a multiple of 128)."""
    B, seg_len = seg.shape
    S = 128
    assert B % S == 0, B
    chunks = taps // acc_rate
    # Each st8 copy k holds st[k : k+P]; windows read [d, d+taps) with
    # d = o - o%8 <= ((sub-1)//8)*8.
    p_rows = ((sub - 1) // 8) * 8 + taps
    lp = ((max(seg_len, 7 + p_rows) + 7) // 8) * 8
    if lp > seg_len:
        seg = jnp.concatenate(
            [seg, jnp.zeros((B, lp - seg_len), seg.dtype)], axis=1
        )
    out = pl.pallas_call(
        functools.partial(
            _t_kernel, sub=sub, taps=taps, acc_rate=acc_rate, streams=S,
            p_rows=p_rows,
        ),
        grid=(B // S,),
        in_specs=[
            pl.BlockSpec((S, lp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, taps), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, S), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, S), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, chunks), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, chunks), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, p_rows, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        seg.astype(jnp.float32),
        h0.astype(jnp.float32),
        jnp.moveaxis(alphas, 0, 1).astype(jnp.float32),
        jnp.moveaxis(y, 0, 1).astype(jnp.float32),
    )
    return out


@functools.partial(
    jax.jit, static_argnames=("sub", "taps", "acc_rate", "interpret")
)
def _pre_echo_tpu(seg, h0, alphas, y, *, sub, taps, acc_rate,
                  interpret=False):
    B = seg.shape[0]
    S = _S
    pad = (-B) % S
    if pad:
        zf = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )
        seg, h0, alphas, y = map(zf, (seg, h0, alphas, y))
    Bp = B + pad
    chunks = taps // acc_rate
    out = pl.pallas_call(
        functools.partial(
            _kernel, sub=sub, taps=taps, acc_rate=acc_rate, streams=S
        ),
        grid=(Bp // S,),
        in_specs=[
            pl.BlockSpec((S, seg.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, taps), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            # alphas/y as (S, sub): the last block dim must equal the full
            # array dim (or be 128-divisible) on the TPU lowering.
            pl.BlockSpec((S, sub), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, sub), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, chunks), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, chunks), jnp.float32),
        interpret=interpret,
    )(
        seg.astype(jnp.float32),
        h0.astype(jnp.float32),
        alphas.astype(jnp.float32),
        y.astype(jnp.float32),
    )
    return out[:B] if pad else out


def make_pre_echo(sub: int, taps: int, acc_rate: int,
                  interpret: bool = False):
    """Returns inst(seg, h0, alphas, y) -> (taps // acc_rate,), vmap-aware."""

    @jax.custom_batching.custom_vmap
    def inst(seg, h0, alphas, y):
        return pre_echo_inst_xla(
            seg, h0, alphas, y, sub=sub, taps=taps, acc_rate=acc_rate
        )

    @inst.def_vmap
    def _vmap(axis_size, in_batched, seg, h0, alphas, y):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        seg, h0, alphas, y = (
            bc(a, b) for a, b in zip((seg, h0, alphas, y), in_batched)
        )
        if interpret or jax.default_backend() == "tpu":
            B = axis_size
            # Transposed (streams-on-lanes) kernel for serving-size
            # batches; padding to 128 is only paid when it wastes < 1/3
            # of the tile (same policy as ops/pallas_mf.make_nlms).
            pad128 = (-B) % 128
            if B >= 128 and pad128 <= B // 3:
                if pad128:
                    zf = lambda a: jnp.concatenate(  # noqa: E731
                        [a, jnp.zeros((pad128,) + a.shape[1:], a.dtype)],
                        axis=0,
                    )
                    seg, h0, alphas, y = map(zf, (seg, h0, alphas, y))
                out = _pre_echo_tpu_t(
                    seg, h0, alphas, y, sub=sub, taps=taps,
                    acc_rate=acc_rate, interpret=interpret,
                )
                if pad128:
                    out = out[:B]
            else:
                out = _pre_echo_tpu(
                    seg, h0, alphas, y, sub=sub, taps=taps,
                    acc_rate=acc_rate, interpret=interpret,
                )
        else:
            out = jax.vmap(
                lambda s, h, a, yy: pre_echo_inst_xla(
                    s, h, a, yy, sub=sub, taps=taps, acc_rate=acc_rate
                )
            )(seg, h0, alphas, y)
        return out, True

    return inst
