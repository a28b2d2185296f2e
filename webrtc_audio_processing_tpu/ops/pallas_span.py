"""Pallas TPU kernel: contiguous-span row gather from per-stream rings.

The AEC3 render rings (render_buffer.py) are read three times per block —
the FFT window, the spectrum window, and the delay-aligned block lookback
(echo_remover.cc:254-303 reads via RenderBuffer). Every one of those reads
is a *contiguous* span of ring rows `[start, start + W)` whose start is
per-stream (it depends on the stream's estimated delay) but whose width W
is static.

Why a kernel: the previous one-hot matmul formulation (`rows == arange(L)`
contraction) reads the ENTIRE ring per gather — W/L of the traffic is
useful (13/167 ≈ 8%) — and, worse, it makes XLA's layout assignment put
the ring-row axis on the minor (lane) dimension to feed the contraction,
which turns every row *write* (dynamic-update-slice) into a whole-ring
rewrite. Measured on a v5e at batch 1024, ring reads+writes were 42.5 ms
of a 113 ms 10-frame chunk. A per-stream DMA of the W contiguous rows
touches exactly the bytes needed and anchors the ring to a row-major
layout.

Wrap-around is handled by the caller storing the ring MIRRORED: the ring
has `L + pad` rows where rows [L, L+pad) duplicate rows [0, pad), so any
span with `start < L` and `W <= pad + 1` is contiguous in memory
(render_buffer.py `ring_write` maintains the mirror on insert).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Streams per grid step: each stream issues one DMA of W*F elements
# (~7-20 KB); 8 per step keeps enough DMAs in flight to hide issue
# latency without oversubscribing the semaphore array (16 measured ~25%
# slower in the 48 kHz chunk profile).
_S = 8


def aligned_rows(W: int) -> int:
    """Rows per aligned wide load: covers any sublane residue 0..7."""
    return ((W + 7 + 7) // 8) * 8


def _span_kernel(starts_ref, ring_ref, out_ref, scratch, sems, *, W, S):
    """DMA an 8-row-aligned wide load per stream (the TPU (8,128) tiling
    requires sublane-aligned DMA offsets), then shift the sublane residue
    off with a dynamic roll."""
    i = pl.program_id(0)
    W8 = aligned_rows(W)
    dmas = []
    for s in range(S):
        start = starts_ref[i * S + s]
        a0 = pl.multiple_of((start // 8) * 8, 8)
        d = pltpu.make_async_copy(
            ring_ref.at[i * S + s].at[pl.ds(a0, W8), :],
            scratch.at[s],
            sems.at[s],
        )
        d.start()
        dmas.append(d)
    for s in range(S):
        dmas[s].wait()
        start = starts_ref[i * S + s]
        off = start - (start // 8) * 8
        # off is the sublane residue (0..7): an 8-way predicated STATIC
        # slice copies only the W useful rows. The previous dynamic
        # pltpu.roll lowered to log-shift passes over the whole (W8, F)
        # wide load and dominated the kernel (~5x the DMA time).
        for k in range(8):

            @pl.when(off == k)
            def _copy(s=s, k=k):
                out_ref[s] = scratch[s][k : k + W]


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def _span_gather_tpu(ring, starts, *, W, interpret=False):
    """ring: (B, LP, F); starts: (B,) int32 with start + W <= LP.

    Returns (B, W, F) rows ring[b, starts[b] : starts[b] + W]."""
    B, LP, F = ring.shape
    S = _S
    pad = (-B) % S
    if pad:
        ring = jnp.concatenate(
            [ring, jnp.zeros((pad, LP, F), ring.dtype)], axis=0
        )
        starts = jnp.concatenate(
            [starts, jnp.zeros((pad,), starts.dtype)], axis=0
        )
    Bp = B + pad
    out = pl.pallas_call(
        functools.partial(_span_kernel, W=W, S=S),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // S,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (S, W, F), lambda i, starts: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((S, aligned_rows(W), F), ring.dtype),
                pltpu.SemaphoreType.DMA((S,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, W, F), ring.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), ring)
    return out[:B] if pad else out


def make_span_gather(W: int, interpret: bool = False):
    """Returns gather(ring, start) -> (W, F), vmap-aware.

    Unbatched / CPU: an exact dynamic_slice. Batched on TPU: the Pallas
    per-stream DMA kernel. Both read identical bytes — the kernel is a
    pure data movement op, so there is no numerical difference."""

    @jax.custom_batching.custom_vmap
    def gather(ring, start):
        return jax.lax.dynamic_slice(
            ring, (start, jnp.zeros((), jnp.int32)), (W, ring.shape[1])
        )

    @gather.def_vmap
    def _vmap(axis_size, in_batched, ring, start):
        if not in_batched[0]:
            ring = jnp.broadcast_to(ring, (axis_size,) + ring.shape)
        if not in_batched[1]:
            start = jnp.broadcast_to(start, (axis_size,))
        if interpret or jax.default_backend() == "tpu":
            out = _span_gather_tpu(
                ring, start.astype(jnp.int32), W=W, interpret=interpret
            )
        else:
            out = jax.vmap(
                lambda r, s: jax.lax.dynamic_slice(
                    r, (s, jnp.zeros((), jnp.int32)), (W, r.shape[1])
                )
            )(ring, start.astype(jnp.int32))
        return out, True

    return gather
