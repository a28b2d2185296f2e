"""Linear recurrences as associative scans (TPU-friendly IIR evaluation).

The reference evaluates all IIR filters with per-sample C++ loops (e.g.
cascaded_biquad_filter.cc:58-84, signal_processing/splitting_filter.c:47-131).
On TPU a length-N sequential loop per 10 ms frame would serialize the VPU;
instead we treat each order-k linear recurrence as composition of affine maps
and evaluate it with ``jax.lax.associative_scan`` in O(log N) depth. Batch
axes (streams × channels) ride along elementwise, which is exactly the shape
of the vmapped serving path.

Conventions: time is the LEADING axis of the sequence arguments; any number
of trailing batch axes is allowed and broadcast elementwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_scan_1(m, b, y_init):
    """Solve ``y[n] = m[n] * y[n-1] + b[n]`` with ``y[-1] = y_init``.

    Args:
      m: multipliers, shape ``(N, ...)`` or broadcastable to ``b``'s shape.
      b: additive terms, shape ``(N, ...)``.
      y_init: initial condition ``y[-1]``, shape ``(...,)``.

    Returns:
      y of shape ``(N, ...)``.
    """
    m = jnp.broadcast_to(m, b.shape)

    def combine(left, right):
        m1, c1 = left
        m2, c2 = right
        return m2 * m1, m2 * c1 + c2

    m_cum, c_cum = jax.lax.associative_scan(combine, (m, b), axis=0)
    return m_cum * y_init[None] + c_cum


def affine_scan_2(a1, a2, f, y_init):
    """Solve ``y[n] = f[n] - a1 * y[n-1] - a2 * y[n-2]``.

    This is the recursive half of a direct-form-1 biquad (the FIR half is a
    plain convolution computed by the caller). State vector
    ``s[n] = (y[n], y[n-1])`` follows ``s[n] = A s[n-1] + (f[n], 0)`` with the
    companion matrix ``A = [[-a1, -a2], [1, 0]]``; compositions of the affine
    maps ``s -> A s + u`` are associative, so the whole recurrence evaluates
    in O(log N) depth.

    Args:
      a1, a2: scalars (python or 0-d arrays), the denominator coefficients in
        the ``y = f - a1 y1 - a2 y2`` convention (reference
        cascaded_biquad_filter.cc:71-79 with its ``a[0], a[1]``).
      f: shape ``(N, ...)`` forcing sequence.
      y_init: shape ``(2, ...)`` — ``(y[-1], y[-2])``.

    Returns:
      y of shape ``(N, ...)``.
    """
    n = f.shape[0]
    dt = f.dtype
    a1 = jnp.asarray(a1, dt)
    a2 = jnp.asarray(a2, dt)
    # Cumulative transform tracked as 2x2 entries (p, q, r, s) and offset
    # (u, v); kept as separate arrays (stacking into (N, 2, 2) would force an
    # inefficient tiny-matmul layout).
    shape = f.shape
    p = jnp.broadcast_to(-a1, shape)
    q = jnp.broadcast_to(-a2, shape)
    r = jnp.ones(shape, dt)
    s = jnp.zeros(shape, dt)
    u = f
    v = jnp.zeros(shape, dt)

    def combine(left, right):
        p1, q1, r1, s1, u1, v1 = left
        p2, q2, r2, s2, u2, v2 = right
        return (
            p2 * p1 + q2 * r1,
            p2 * q1 + q2 * s1,
            r2 * p1 + s2 * r1,
            r2 * q1 + s2 * s1,
            p2 * u1 + q2 * v1 + u2,
            r2 * u1 + s2 * v1 + v2,
        )

    pc, qc, _, _, uc, _ = jax.lax.associative_scan(
        combine, (p, q, r, s, u, v), axis=0
    )
    y_prev, y_prev2 = y_init[0], y_init[1]
    return pc * y_prev[None] + qc * y_prev2[None] + uc


def scan_recurrence_1(m, b, y_init):
    """Sequential (lax.scan) reference implementation of ``affine_scan_1``."""
    m = jnp.broadcast_to(m, b.shape)

    def step(y_prev, mb):
        mm, bb = mb
        y = mm * y_prev + bb
        return y, y

    _, y = jax.lax.scan(step, y_init, (m, b))
    return y
