"""Pallas TPU kernel: per-stream contiguous window gather.

out[b] = buf[b, start[b] : start[b] + W]

XLA:TPU expands a vmapped dynamic-slice with per-stream starts into a
serial while-loop over the batch (the scatter/gather expander); this kernel
does one 128-aligned wide load plus one lane roll per stream instead.
Used by e.g. the RNN-VAD lagged-frame read (features_extraction.cc:78-84).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_kernel(st_ref, buf_ref, out_ref, *, streams, width, w_wide):
    for s in range(streams):
        start = st_ref[s, 0]
        a0 = pl.multiple_of((start // 128) * 128, 128)
        off = start - a0
        wide = buf_ref[s : s + 1, pl.ds(a0, w_wide)]  # (1, w_wide)
        rolled = pltpu.roll(wide, w_wide - off, 1)
        out_ref[s : s + 1, :] = rolled[:, 0:out_ref.shape[1]]


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def take_windows(buf, starts, *, width: int, interpret: bool = False):
    """buf: (B, L); starts: (B,) int32 in [0, L - width]. -> (B, width)."""
    B, L = buf.shape
    S = 8
    pad_b = (-B) % S
    if pad_b:
        buf = jnp.concatenate(
            [buf, jnp.zeros((pad_b, L), buf.dtype)], axis=0
        )
        starts = jnp.concatenate(
            [starts, jnp.zeros((pad_b,), starts.dtype)]
        )
    Bp = B + pad_b
    w_wide = ((width + 127) // 128) * 128 + 128
    # Lane-pad so the widest aligned load stays in bounds.
    need = ((L - 1) // 128) * 128 + w_wide
    if need > L:
        buf = jnp.concatenate(
            [buf, jnp.zeros((Bp, need - L), buf.dtype)], axis=1
        )
    kernel = functools.partial(
        _window_kernel, streams=S, width=width, w_wide=w_wide
    )
    out = pl.pallas_call(
        kernel,
        grid=(Bp // S,),
        in_specs=[
            pl.BlockSpec((S, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, buf.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, width), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, width), buf.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32)[:, None], buf)
    return out[:B]


def make_take_window(width: int):
    """Returns take(buf (L,), start ()) -> (width,), vmap-aware."""

    @jax.custom_batching.custom_vmap
    def take(buf, start):
        return jax.lax.dynamic_slice(buf, (start,), (width,))

    @take.def_vmap
    def take_vmap(axis_size, in_batched, buf, start):
        buf_b, start_b = in_batched
        if not buf_b:
            buf = jnp.broadcast_to(buf, (axis_size,) + buf.shape)
        if not start_b:
            start = jnp.broadcast_to(start, (axis_size,))
        if jax.default_backend() != "tpu":
            out = jax.vmap(
                lambda b, s: jax.lax.dynamic_slice(b, (s,), (width,))
            )(buf, start)
        else:
            out = take_windows(buf, start.astype(jnp.int32), width=width)
        return out, True

    return take
