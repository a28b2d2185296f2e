"""Pallas TPU kernel for the AEC3 matched-filter NLMS bank.

Reference semantics: MatchedFilter::Update (matched_filter.cc:693-812) — for
each of N staggered filters, a per-sample NLMS over the sub_block_size (16)
downsampled capture samples against sliding 512-tap windows of the low-rate
render ring.

Why a kernel: expressed in XLA, the sliding windows either materialize as a
(B, N, 16, 512) unfold (16x redundant, ~170 MB per block at B=1024 streams —
bandwidth-catastrophic) or serialize as 16 scan steps over (B, N, 512)
arrays. Here the ring segments and filters are VMEM-resident per stream tile
and the 16-step recurrence runs entirely on-chip: HBM traffic is one read of
the segments + one read/write of the filters per block.

The kernel reproduces the reference's exact per-sample update order; the
accumulated-error (pre-echo) statistics are reconstructed outside from the
returned per-sample NLMS steps (`alphas`), which determine the intermediate
filters exactly (h_i = h_0 + sum_{j<i} alpha_j x_j).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _mf_kernel(lr_ref, seg_ref, h_ref, y_ref, smooth_ref,
               h_out, alpha_out, err_out, upd_out, segs_out, seg_scratch,
               xw_scratch,
               *, n_filters, shift, ds_size, threshold, streams, sub, taps,
               w_per):
    """One stream-tile of the NLMS bank.

    lr_ref: (S, 1) int32 — per-stream low-rate read index.
    seg_ref: (S, ds_size + seg_len) f32 — wrap-extended ring.
    h_ref/h_out: (S, N, taps); y_ref: (S, sub); smooth_ref: (S, 1).
    alpha_out: (S, N, SUB); err_out/upd_out: (S, N).
    seg_scratch: (S, N, seg_pad) f32.
    """
    SUB, TAPS = sub, taps
    seg_len = SUB - 1 + TAPS
    W = w_per

    # Gather the full filter-bank span of the ring into scratch, one wide
    # aligned load + one lane-roll per stream. Mosaic only allows
    # 128-aligned dynamic lane offsets; the alignment residue is shared by
    # all filters because `shift` is a multiple of 128 (384 at ds=4,
    # 192 at ds=8 is not — handled by the per-filter fallback below).
    if shift % 128 == 0:
        for s in range(streams):
            start = lr_ref[s, 0]
            a0 = pl.multiple_of((start // 128) * 128, 128)
            off = start - a0
            wide = seg_ref[s : s + 1, pl.ds(a0, W)]  # (1, W)
            seg_scratch[s, 0:W] = pltpu.roll(wide, W - off, 1)[0]
        segs = [
            seg_scratch[:, n * shift : n * shift + seg_len]
            for n in range(n_filters)
        ]
    else:
        for s in range(streams):
            start = lr_ref[s, 0]
            for n in range(n_filters):
                st = start + n * shift
                a0 = pl.multiple_of((st // 128) * 128, 128)
                off = st - a0
                wide = seg_ref[s : s + 1, pl.ds(a0, W)]
                seg_scratch[s, pl.ds(n * W, W)] = pltpu.roll(
                    wide, W - off, 1
                )[0]
        segs = [
            seg_scratch[:, n * W : n * W + seg_len]
            for n in range(n_filters)
        ]
    segs = jnp.stack(segs, axis=1)  # (S, N, seg_len)
    y = y_ref[:]  # (S, SUB)
    h = h_ref[:]  # (S, N, TAPS)
    smoothing = smooth_ref[:]  # (S, 1)

    # Materialize the SUB shifted windows once: each lane-offset slice of
    # `segs` is a vector-register funnel shift over the whole tile, and the
    # window dots below touch x_i three times — reading from the aligned
    # scratch instead re-does none of those shifts.
    for i in range(SUB):
        xw_scratch[:, i] = segs[:, :, SUB - 1 - i : SUB - 1 - i + TAPS]
    xw = xw_scratch[:]  # (S, SUB, N, TAPS)

    # ---- Gram (blocked-NLMS) reformulation -------------------------------
    # The reference updates h per sample: e_i = y_i - h_i.x_i,
    # h_{i+1} = h_i + a_i x_i. Expanding h_i = h_0 + sum_{j<i} a_j x_j gives
    #   e_i = y_i - h_0.x_i - sum_{j<i} a_j (x_j.x_i),
    # so the only sequentially dependent quantities are the 16 scalars a_i;
    # every TAPS-length operation (the window dots and the final rank-16
    # filter update) is dependency-free and pipelines. The Gram matrix
    # G[j,i] = x_j.x_i is NOT computed with 136 long dots: consecutive
    # windows differ by one sample, so along each diagonal
    #   G[j+1,i+1] = G[j,i] + seg[14-j] seg[14-i] - seg[526-j] seg[526-i]
    # and the whole matrix follows from row 0 (16 dots) plus cumulative
    # sums of 15-element edge products.
    s0 = []  # h0 . x_i
    r = []  # x_0 . x_i  (= G[0, i])
    x0 = segs[:, :, SUB - 1 : SUB - 1 + TAPS]
    for i in range(SUB):
        x_i = xw[:, i]  # (S, N, TAPS)
        s0.append(jnp.sum(h * x_i, axis=-1))  # (S, N)
        r.append(jnp.sum(x0 * x_i, axis=-1))  # (S, N)
    s0 = jnp.stack(s0, axis=-1)  # (S, N, SUB)
    r = jnp.stack(r, axis=-1)  # (S, N, SUB)

    # Edge products: with g = reverse(seg[0:15]) and f = reverse(seg[512:527])
    # (so g[m] = seg[14-m]), the diagonal-d marching terms are
    # C[m, d] = g[m] g[m+d] - f[m] f[m+d], m + d <= 14. The reversal is a
    # constant flip matmul (Mosaic has no strided-reverse), zero-padded to
    # 2*SUB so the shifted reads below stay in bounds.
    # (Pallas kernels cannot capture host constants; build the flip
    # one-hot from iota inside the kernel.)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (SUB - 1, 2 * SUB), 0)
    col_m = jax.lax.broadcasted_iota(jnp.int32, (SUB - 1, 2 * SUB), 1)
    flip = (col_m == SUB - 2 - row_i).astype(jnp.float32)
    def _flipped(edge):  # (S, N, SUB-1) -> (S, N, 2*SUB), 2D matmul only
        e2 = edge.reshape(streams * n_filters, SUB - 1)
        return jnp.dot(e2, flip, preferred_element_type=jnp.float32).reshape(
            streams, n_filters, 2 * SUB
        )

    g = _flipped(segs[:, :, : SUB - 1])
    f = _flipped(segs[:, :, TAPS : TAPS + SUB - 1])
    # C over d (last axis), at edge index m: C[m] = (S, N, SUB_d).
    gm = g[:, :, :SUB]
    fm = f[:, :, :SUB]
    c_rows = [
        gm[:, :, m : m + 1] * g[:, :, m : m + SUB]
        - fm[:, :, m : m + 1] * f[:, :, m : m + SUB]
        for m in range(SUB - 1)
    ]  # each (S, N, SUB_d)

    # G row j over capture-sample i: G[j, i] = r[i-j] + scum[j, i-j] where
    # scum[j] = sum_{m<j} C[m] (exclusive prefix, unrolled tiny adds).
    rows = []
    x2_cols = []
    scum_j = jnp.zeros((streams, n_filters, SUB), jnp.float32)
    for j in range(SUB):
        base_j = r + scum_j  # (S, N, SUB_d): G[j, j+d]
        # (Mosaic rejects zero-sized vectors — skip the pad at j=0.)
        rows.append(
            base_j
            if j == 0
            else jnp.concatenate(
                [
                    jnp.zeros((streams, n_filters, j), jnp.float32),
                    base_j[:, :, : SUB - j],
                ],
                axis=-1,
            )
        )
        x2_cols.append(base_j[:, :, 0])  # diagonal: G[j, j]
        if j < SUB - 1:
            scum_j = scum_j + c_rows[j]
    gmat = jnp.stack(rows, axis=2)  # (S, N, j, i), valid for j <= i
    x2_all = jnp.stack(x2_cols, axis=-1)  # (S, N, SUB)

    sat = (y >= 32000.0) | (y <= -32000.0)  # (S, SUB)
    gates = (x2_all > threshold) & ~sat[:, None, :]  # (S, N, SUB)
    inv_x2 = smoothing[:, :, None] / jnp.maximum(x2_all, 1e-30)

    # The 16-step recurrence now touches only (S, N, SUB) scalars.
    acc = jnp.zeros((streams, n_filters, SUB), jnp.float32)
    err = jnp.zeros((streams, n_filters), jnp.float32)
    alphas = []
    for i in range(SUB):
        # (y[:, i:i+1] broadcasts (S, 1) over filters; a None-mixed integer
        # index would lower as a gather, which Mosaic rejects.)
        e_i = y[:, i : i + 1] - s0[:, :, i] - acc[:, :, i]  # (S, N)
        a_i = jnp.where(gates[:, :, i], e_i * inv_x2[:, :, i], 0.0)
        acc = acc + a_i[:, :, None] * gmat[:, :, i]
        err = err + e_i * e_i
        alphas.append(a_i)
    upd = jnp.max(gates.astype(jnp.float32), axis=-1)

    # Rank-16 filter update: independent FMAs, no reductions.
    for i in range(SUB):
        h = h + alphas[i][:, :, None] * xw[:, i]
    h_out[:] = h
    alpha_out[:] = jnp.stack(alphas, axis=-1)  # (S, N, SUB)
    err_out[:] = err
    upd_out[:] = upd
    segs_out[:] = segs  # (S, N, seg_len) — consumed by the pre-echo path


def _mf_t_kernel(lr_ref, seg_ref, h_ref, y_ref, smooth_ref,
                 h_out, alpha_out, err_out, upd_out, segs_out,
                 seg_scratch, st8_ref,
                 *, n_filters, shift, threshold, streams, sub, taps, w_per):
    """Transposed (streams-on-lanes) variant of the Gram NLMS bank.

    S=128 streams ride the LANE dimension; tap/sub-block indices ride
    sublanes. Every op is then dense: the stream-major layout pads the
    16-lane Gram/recurrence tensors to 128 lanes (8x waste) and the
    5-filter axis to 8 sublanes, which made the tiny-op storm the top
    cost. Sliding windows at sublane offset o read ALIGNED slices of 8
    pre-shifted copies (o mod 8) of the transposed segment span, so no
    per-window shift materializes. External interface stays stream-major;
    all transposes happen in VMEM. Measured 0.47 ms/block-update at
    B=1024 on v5e vs 1.66 ms for the stream-major kernel.
    """
    S, N, SUB, TAPS = streams, n_filters, sub, taps
    seg_len = SUB - 1 + TAPS
    W = w_per
    span = (N - 1) * shift + seg_len
    # +15 headroom so every shifted copy stays in range (covers sub <= 16).
    span_pad = ((span + 15 + 7) // 8) * 8

    # 1) gather, stream-major: one wide aligned load + roll per stream
    # (same index algebra as _mf_kernel).
    for s in range(S):
        start = lr_ref[s, 0]
        a0 = pl.multiple_of((start // 128) * 128, 128)
        off = start - a0
        wide = seg_ref[s : s + 1, pl.ds(a0, W)]
        seg_scratch[s, 0:W] = pltpu.roll(wide, W - off, 1)[0]

    # 2) one transpose to (span_pad, S).
    st = seg_scratch[:, 0:span_pad].T

    # 3) eight sublane-shifted copies: st8[k][u] = st[u + k].
    for k in range(8):
        st8_ref[k, 0 : span_pad - 8] = jax.lax.slice_in_dim(
            st, k, k + span_pad - 8, axis=0
        )

    def window(n, o):
        """(TAPS, S) window of filter n at in-segment offset o — an
        aligned sublane slice of the (o mod 8)-shifted copy."""
        full = n * shift + o
        k = full % 8
        return st8_ref[k, pl.ds(full - k, TAPS)]

    y = y_ref[:]  # (SUB, S)
    smoothing = smooth_ref[:]  # (1, S)
    sat = (y >= 32000.0) | (y <= -32000.0)  # (SUB, S)

    h_all, alpha_all, err_all, upd_all = [], [], [], []
    for n in range(N):
        h = h_ref[:, pl.ds(n * TAPS, TAPS)].T  # (TAPS, S)
        x0 = window(n, SUB - 1)
        s0, r = [], []
        for i in range(SUB):
            x_i = window(n, SUB - 1 - i)
            s0.append(jnp.sum(h * x_i, axis=0, keepdims=True))  # (1, S)
            r.append(jnp.sum(x0 * x_i, axis=0, keepdims=True))
        s0 = jnp.concatenate(s0, axis=0)  # (SUB, S)
        r = jnp.concatenate(r, axis=0)  # (SUB, S)

        # Edge vectors g[m] = seg[14-m], f[m] = seg[526-m] (m = 0..14),
        # zero-padded to 2*SUB sublanes so the shifted reads below stay in
        # bounds; the reversal is a constant one-hot matmul (no
        # strided-reverse in Mosaic).
        base = n * shift
        gsrc = st[base : base + SUB]
        fsrc = st[base + TAPS : base + TAPS + SUB]
        row_j = jax.lax.broadcasted_iota(jnp.int32, (2 * SUB, SUB), 0)
        col_k = jax.lax.broadcasted_iota(jnp.int32, (2 * SUB, SUB), 1)
        flip = ((col_k == SUB - 2 - row_j) & (row_j < SUB - 1)).astype(
            jnp.float32
        )
        g = jax.lax.dot(flip, gsrc, precision=jax.lax.Precision.HIGHEST)
        f = jax.lax.dot(flip, fsrc, precision=jax.lax.Precision.HIGHEST)

        # Diagonal-marching terms C[m] (see _mf_kernel for the identity).
        c_rows = [
            g[m : m + 1] * g[m : m + SUB] - f[m : m + 1] * f[m : m + SUB]
            for m in range(SUB - 1)
        ]

        rows, x2_cols = [], []
        scum = jnp.zeros((SUB, S), jnp.float32)
        for j in range(SUB):
            base_j = r + scum  # (SUB_d, S): G[j, j+d]
            rows.append(
                base_j
                if j == 0
                else jnp.concatenate(
                    [jnp.zeros((j, S), jnp.float32), base_j[: SUB - j]],
                    axis=0,
                )
            )
            x2_cols.append(base_j[0:1])  # G[j, j]
            if j < SUB - 1:
                scum = scum + c_rows[j]
        x2 = jnp.concatenate(x2_cols, axis=0)  # (SUB, S)

        gates = (x2 > threshold) & ~sat
        inv_x2 = smoothing / jnp.maximum(x2, 1e-30)

        acc = jnp.zeros((SUB, S), jnp.float32)
        err = jnp.zeros((1, S), jnp.float32)
        alphas = []
        for i in range(SUB):
            e_i = y[i : i + 1] - s0[i : i + 1] - acc[i : i + 1]  # (1, S)
            a_i = jnp.where(gates[i : i + 1], e_i * inv_x2[i : i + 1], 0.0)
            acc = acc + a_i * rows[i]
            err = err + e_i * e_i
            alphas.append(a_i)
        upd = jnp.max(gates.astype(jnp.float32), axis=0, keepdims=True)

        for i in range(SUB):
            h = h + alphas[i] * window(n, SUB - 1 - i)
        h_all.append(h)
        alpha_all.append(jnp.concatenate(alphas, axis=0))  # (SUB, S)
        err_all.append(err)
        upd_all.append(upd)
        segs_out[:, pl.ds(n * seg_len, seg_len)] = st[
            base : base + seg_len
        ].T

    h_out[:] = jnp.concatenate(h_all, axis=0).T  # (S, N*TAPS)
    alpha_out[:] = jnp.concatenate(alpha_all, axis=0).T  # (S, N*SUB)
    err_out[:] = jnp.concatenate(err_all, axis=0).T  # (S, N)
    upd_out[:] = jnp.concatenate(upd_all, axis=0).T


@functools.partial(
    jax.jit,
    static_argnames=("n_filters", "shift", "ds_size", "threshold", "sub",
                     "taps", "interpret"),
)
def matched_filter_nlms_t(
    lowrate, lr_read, h0, y, smoothing, *,
    n_filters, shift, ds_size, threshold, sub=16, taps=512,
    interpret=False,
):
    """Batched NLMS bank update, transposed kernel (B must be a multiple
    of 128). Same contract as matched_filter_nlms."""
    B = lowrate.shape[0]
    SUB, TAPS = sub, taps
    seg_len = SUB - 1 + TAPS
    span = (n_filters - 1) * shift + seg_len
    span_pad = ((span + 15 + 7) // 8) * 8
    w_per = ((span_pad + 127) // 128) * 128 + 128
    ext = w_per
    parts = [lowrate] * (1 + ext // ds_size) + [lowrate[:, : ext % ds_size]]
    ring2 = jnp.concatenate(parts, axis=1)
    S = 128
    assert B % S == 0, B

    kernel = functools.partial(
        _mf_t_kernel, n_filters=n_filters, shift=shift,
        threshold=threshold, streams=S, sub=SUB, taps=TAPS, w_per=w_per,
    )
    h, alphas, err, upd, segs = pl.pallas_call(
        kernel,
        grid=(B // S,),
        in_specs=[
            pl.BlockSpec((S, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, ring2.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_filters * TAPS), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, S), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, n_filters * TAPS), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_filters * SUB), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_filters), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_filters), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_filters * seg_len), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_filters * TAPS), jnp.float32),
            jax.ShapeDtypeStruct((B, n_filters * SUB), jnp.float32),
            jax.ShapeDtypeStruct((B, n_filters), jnp.float32),
            jax.ShapeDtypeStruct((B, n_filters), jnp.float32),
            jax.ShapeDtypeStruct((B, n_filters * seg_len), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, w_per), jnp.float32),
            pltpu.VMEM((8, span_pad - 8, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        lr_read.astype(jnp.int32)[:, None],
        ring2,
        h0.reshape(B, n_filters * TAPS),
        jnp.moveaxis(y, 0, 1),
        smoothing[None, :],
    )
    return (
        h.reshape(B, n_filters, TAPS),
        alphas.reshape(B, n_filters, SUB),
        err,
        upd > 0.5,
        segs.reshape(B, n_filters, seg_len),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_filters", "shift", "ds_size", "threshold", "sub",
                     "taps", "interpret"),
)
def matched_filter_nlms(
    lowrate,  # (B, DS) f32
    lr_read,  # (B,) int32
    h0,  # (B, N, TAPS) f32
    y,  # (B, SUB) f32
    smoothing,  # (B,) f32
    *,
    n_filters: int,
    shift: int,
    ds_size: int,
    threshold: float,
    sub: int = 16,
    taps: int = 512,
    interpret: bool = False,
):
    """Batched NLMS bank update. Returns (h, alphas, error_sums, updated)."""
    B = lowrate.shape[0]
    SUB, TAPS = sub, taps
    seg_len = SUB - 1 + TAPS
    # Widened load windows: +128 lanes so any alignment residue (0..127)
    # still covers the payload.
    if shift % 128 == 0:
        # One load spans the whole staggered filter bank.
        span = (n_filters - 1) * shift + seg_len
        w_per = ((span + 127) // 128) * 128 + 128
        scratch_w = w_per
    else:
        w_per = ((seg_len + 127) // 128) * 128 + 128
        scratch_w = n_filters * w_per
    # Wrap extension so every aligned wide load stays in bounds.
    ext = (n_filters - 1) * shift + w_per
    parts = [lowrate] * (1 + ext // ds_size) + [lowrate[:, : ext % ds_size]]
    ring2 = jnp.concatenate(parts, axis=1)
    # Stream tile: 32 gives the best VPU occupancy, but at very large
    # batches XLA's scoped-vmem accounting for the surrounding program
    # leaves less headroom — fall back to 16 there.
    S = 32 if B <= 4096 else 16
    while B % S:
        S //= 2
    assert S >= 1, B

    kernel = functools.partial(
        _mf_kernel, n_filters=n_filters, shift=shift, ds_size=ds_size,
        threshold=threshold, streams=S, sub=SUB, taps=TAPS, w_per=w_per,
    )
    grid = (B // S,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, 1), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S, ring2.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_filters, TAPS), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, SUB), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, n_filters, TAPS), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_filters, SUB), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_filters), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_filters), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_filters, seg_len), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_filters, TAPS), jnp.float32),
            jax.ShapeDtypeStruct((B, n_filters, SUB), jnp.float32),
            jax.ShapeDtypeStruct((B, n_filters), jnp.float32),
            jax.ShapeDtypeStruct((B, n_filters), jnp.float32),
            jax.ShapeDtypeStruct((B, n_filters, seg_len), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, scratch_w), jnp.float32),
            pltpu.VMEM((S, SUB, n_filters, TAPS), jnp.float32),
        ],
        # xw_scratch alone is S*SUB*N*TAPS*4 B (5.2 MB at S=32); the
        # default 16 MB scoped-vmem budget is too tight for the compiler's
        # stack accounting of the surrounding temporaries.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        lr_read.astype(jnp.int32)[:, None],
        ring2,
        h0,
        y,
        smoothing[:, None],
    )
    h, alphas, err, upd, segs = out
    return h, alphas, err, upd > 0.5, segs


# ------------------------------------------------------------------ vmap API
#
# The AEC3 modules are written per-stream with `vmap` supplying the stream
# batch. `custom_vmap` routes the batched case into the Pallas kernel (one
# grid step per 8-stream tile) and leaves the single-stream case on a plain
# XLA scan with identical per-sample semantics.


def _nlms_scan(lowrate, lr_read, h0, y, smoothing, *, n_filters, shift,
               ds_size, threshold, sub=16, taps=512):
    """Reference-order per-sample NLMS for one stream (no batch)."""
    SUB, TAPS = sub, taps
    seg_len = SUB - 1 + TAPS
    ring2 = jnp.concatenate([lowrate, lowrate[: seg_len]])
    starts = jnp.mod(
        lr_read + jnp.arange(n_filters, dtype=jnp.int32) * shift, ds_size
    )
    segs = jax.vmap(
        lambda s0: jax.lax.dynamic_slice(ring2, (s0,), (seg_len,))
    )(starts)  # (N, seg_len)
    xw = jnp.stack(
        [segs[:, SUB - 1 - i : SUB - 1 - i + TAPS] for i in range(SUB)],
        axis=1,
    )  # (N, SUB, TAPS)
    x2 = jnp.sum(xw * xw, axis=-1)  # (N, SUB)
    sat = (y >= 32000.0) | (y <= -32000.0)  # (SUB,)
    gate = (x2 > threshold) & ~sat[None, :]

    def step(carry, i):
        h, err = carry
        x_i = xw[:, i, :]
        s_i = jnp.sum(h * x_i, axis=-1)
        e_i = y[i] - s_i
        a_i = jnp.where(
            gate[:, i], smoothing * e_i / jnp.maximum(x2[:, i], 1e-30), 0.0
        )
        return (h + a_i[:, None] * x_i, err + e_i * e_i), a_i

    (h, err), alphas = jax.lax.scan(
        step, (h0, jnp.zeros((n_filters,))), jnp.arange(SUB)
    )
    return h, jnp.moveaxis(alphas, 0, -1), err, jnp.any(gate, axis=-1), segs


def make_nlms(n_filters: int, shift: int, ds_size: int, threshold: float,
              sub: int = 16, taps: int = 512, interpret: bool = False):
    """Returns nlms(lowrate, lr_read, h0, y, smoothing) ->
    (h, alphas, error_sums, updated), vmap-aware."""

    @jax.custom_batching.custom_vmap
    def nlms(lowrate, lr_read, h0, y, smoothing):
        return _nlms_scan(
            lowrate, lr_read, h0, y, smoothing, n_filters=n_filters,
            shift=shift, ds_size=ds_size, threshold=threshold, sub=sub,
            taps=taps,
        )

    @nlms.def_vmap
    def nlms_vmap(axis_size, in_batched, lowrate, lr_read, h0, y, smoothing):
        def bc(x, batched):
            return x if batched else jnp.broadcast_to(
                x, (axis_size,) + jnp.shape(x)
            )

        lowrate, lr_read, h0, y, smoothing = (
            bc(a, b)
            for a, b in zip(
                (lowrate, lr_read, h0, y, smoothing), in_batched
            )
        )
        import os

        if interpret or os.environ.get("WAP_MF_FORCE_SCAN"):
            # CPU path: batch the reference-order scan instead of paying
            # the Pallas interpreter per stream. WAP_MF_FORCE_SCAN is the
            # operational escape hatch: identical numerics on pure XLA if
            # the Pallas kernel ever misbehaves on a new backend.
            out = jax.vmap(
                lambda lo, lr, h, yy, sm: _nlms_scan(
                    lo, lr, h, yy, sm, n_filters=n_filters, shift=shift,
                    ds_size=ds_size, threshold=threshold, sub=sub, taps=taps,
                )
            )(lowrate, lr_read, h0, y, smoothing)
            return out, tuple(True for _ in out)
        B = axis_size
        # Transposed (streams-on-lanes) kernel for serving-size batches:
        # 3.5x faster per block-update (dense lanes). Padding to 128 is
        # only paid when it wastes < 1/3 of the tile.
        pad128 = (-B) % 128
        use_t = B >= 128 and pad128 <= B // 3
        S = 128 if use_t else 8
        pad = (-B) % S
        if pad:
            zf = lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            )
            lowrate, lr_read, h0, y, smoothing = map(
                zf, (lowrate, lr_read, h0, y, smoothing)
            )
        fn = matched_filter_nlms_t if use_t else matched_filter_nlms
        out = fn(
            lowrate, lr_read.astype(jnp.int32), h0, y, smoothing,
            n_filters=n_filters, shift=shift, ds_size=ds_size,
            threshold=threshold, sub=sub, taps=taps, interpret=interpret,
        )
        if pad:
            out = tuple(a[:B] for a in out)
        return out, tuple(True for _ in out)

    return nlms
