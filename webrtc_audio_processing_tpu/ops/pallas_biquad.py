"""Pallas TPU kernel for batched cascaded-biquad (DF1) filtering.

Reference: modules/audio_processing/utility/cascaded_biquad_filter.cc:58-84
(the per-sample cascade) — the AEC3 decimators (aec3/decimator.cc) run it on
every 64-sample block for both render and capture.

Why a kernel: the recurrence is sequential in time, so XLA can only express
it as a T-step scan whose per-step work is a handful of (B,)-sized
elementwise ops — on TPU each scan step costs far more in loop overhead
than in math (~8.5 ms/frame at B=1024 measured). Here the batch axis rides
the 128-wide lanes and the whole T-step cascade unrolls inside one kernel:
one HBM read of the frame, one write, zero loop overhead.

Numerics: identical operation order to the reference's per-sample loop
(b0*x + b1*x1 + b2*x2 - a1*y1 - a2*y2, cascaded), so outputs match the
lax.scan implementation to fp32 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _biquad_kernel(x_ref, st_ref, y_out, st_out, *, coeffs, T):
    """x_ref: (T, S) time-major; st_ref/st_out: (4K, S) rows
    [x1,x2,y1,y2]*K; y_out: (T, S). coeffs: static tuple of
    (b0,b1,b2,a1,a2) per section."""
    K = len(coeffs)
    x1 = [st_ref[4 * k + 0 : 4 * k + 1, :] for k in range(K)]
    x2 = [st_ref[4 * k + 1 : 4 * k + 2, :] for k in range(K)]
    y1 = [st_ref[4 * k + 2 : 4 * k + 3, :] for k in range(K)]
    y2 = [st_ref[4 * k + 3 : 4 * k + 4, :] for k in range(K)]
    for t in range(T):
        sig = x_ref[t : t + 1, :]
        for k, (b0, b1, b2, a1, a2) in enumerate(coeffs):
            y = (
                b0 * sig + b1 * x1[k] + b2 * x2[k]
                - a1 * y1[k] - a2 * y2[k]
            )
            x2[k] = x1[k]
            x1[k] = sig
            y2[k] = y1[k]
            y1[k] = y
            sig = y
        y_out[t : t + 1, :] = sig
    for k in range(K):
        st_out[4 * k + 0 : 4 * k + 1, :] = x1[k]
        st_out[4 * k + 1 : 4 * k + 2, :] = x2[k]
        st_out[4 * k + 2 : 4 * k + 3, :] = y1[k]
        st_out[4 * k + 3 : 4 * k + 4, :] = y2[k]


@functools.partial(jax.jit, static_argnames=("coeffs", "interpret"))
def _cascade_batched(x_t, st, *, coeffs, interpret=False):
    """x_t: (T, B) time-major; st: (4K, B). Returns (y_t, new_st)."""
    T, B = x_t.shape
    K = len(coeffs)
    S = LANES
    assert B % S == 0, B
    kernel = functools.partial(_biquad_kernel, coeffs=coeffs, T=T)
    y_t, st_new = pl.pallas_call(
        kernel,
        grid=(B // S,),
        in_specs=[
            pl.BlockSpec((T, S), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * K, S), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, S), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * K, S), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B), jnp.float32),
            jax.ShapeDtypeStruct((4 * K, B), jnp.float32),
        ],
        interpret=interpret,
    )(x_t, st)
    return y_t, st_new


def make_cascade(coeffs_b: np.ndarray, coeffs_a: np.ndarray,
                 channels: int = 0):
    """Returns cascade(state_flat, x) -> (new_state, y), vmap-aware: the
    batched form runs the Pallas kernel on TPU and a lax.scan elsewhere.
    Coefficients must be static (host) arrays.

    channels == 0: state (K, 4), x (T,).
    channels == C: state (K, 4, C), x (T, C) — channels fold into the
    kernel's lane batch together with the vmapped stream axis.
    """
    cb = np.asarray(coeffs_b, np.float64)
    ca = np.asarray(coeffs_a, np.float64)
    K = cb.shape[0]
    coeffs = tuple(
        (float(cb[k, 0]), float(cb[k, 1]), float(cb[k, 2]),
         float(ca[k, 0]), float(ca[k, 1]))
        for k in range(K)
    )

    def scan_impl(st, x):
        def step(carry, xt):
            rows = carry  # (K, 4[, C])
            sig = xt
            new_rows = []
            for k, (b0, b1, b2, a1, a2) in enumerate(coeffs):
                x1, x2, y1, y2 = (rows[k, 0], rows[k, 1], rows[k, 2],
                                  rows[k, 3])
                y = b0 * sig + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
                new_rows.append(jnp.stack([sig, x1, y, y1]))
                sig = y
            return jnp.stack(new_rows), sig

        st, y = jax.lax.scan(step, st, x)
        return st, y

    def kernel_impl(st, x):
        """st: (M, K, 4); x: (M, T) with M the folded batch."""
        M = st.shape[0]
        pad = (-M) % LANES
        if pad:
            st = jnp.concatenate(
                [st, jnp.zeros((pad,) + st.shape[1:], st.dtype)]
            )
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
            )
        x_t = x.T  # (T, M)
        st_flat = st.reshape(st.shape[0], 4 * K).T  # (4K, M)
        y_t, st_new = _cascade_batched(x_t, st_flat, coeffs=coeffs)
        st_out = st_new.T.reshape(st.shape[0], K, 4)
        y = y_t.T
        if pad:
            st_out = st_out[:M]
            y = y[:M]
        return st_out, y

    @jax.custom_batching.custom_vmap
    def cascade(st, x):
        return scan_impl(st, x)

    @cascade.def_vmap
    def cascade_vmap(axis_size, in_batched, st, x):
        st_b, x_b = in_batched
        if not st_b:
            st = jnp.broadcast_to(st, (axis_size,) + st.shape)
        if not x_b:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        if jax.default_backend() != "tpu":
            out = jax.vmap(scan_impl)(st, x)
            return out, (True, True)
        B = axis_size
        if channels:
            C = channels
            # (B, K, 4, C) -> (B*C, K, 4); (B, T, C) -> (B*C, T).
            st_m = jnp.moveaxis(st, 3, 1).reshape(B * C, K, 4)
            x_m = jnp.moveaxis(x, 2, 1).reshape(B * C, x.shape[1])
            st_o, y_m = kernel_impl(st_m, x_m)
            st_out = jnp.moveaxis(st_o.reshape(B, C, K, 4), 1, 3)
            y = jnp.moveaxis(y_m.reshape(B, C, -1), 1, 2)
        else:
            st_out, y = kernel_impl(st, x)
        return (st_out, y), (True, True)

    return cascade
