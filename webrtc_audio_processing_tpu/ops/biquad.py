"""Cascaded direct-form-1 biquad filtering.

Reference: modules/audio_processing/utility/cascaded_biquad_filter.{h,cc}
(per-sample loop at cascaded_biquad_filter.cc:58-84) and the high-pass filter
coefficient tables in modules/audio_processing/high_pass_filter.cc:25-56.

Design: the HPF/post-filter sections have poles at radius up to ~0.998, so a
log-depth associative-scan evaluation amplifies float32 reordering error by
~1/(1-|p|) (measured ~1e-3 relative per frame) — too much for the ≤1e-3 RMS
conformance budget. The cascade keeps the reference's exact per-sample
accumulation order: on TPU a Pallas kernel (ops/pallas_biquad.py) unrolls
the recurrence in VMEM with the stream batch on the vector lanes; elsewhere
a ``lax.scan`` evaluates it. Per-channel state is the (x[-1], x[-2], y[-1],
y[-2]) quadruple per section, exactly the reference's ``BiQuad::{x, y}``
members.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class BiquadCascadeState:
    """State for a cascade of biquads over one signal.

    Attributes:
      x: shape (num_sections, 2, ...) — previous two inputs per section.
      y: shape (num_sections, 2, ...) — previous two outputs per section.
    """

    x: jnp.ndarray
    y: jnp.ndarray


def init_state(num_sections: int, batch_shape=(), dtype=jnp.float32):
    z = jnp.zeros((num_sections, 2) + tuple(batch_shape), dtype)
    return BiquadCascadeState(x=z, y=z)


def process(coeffs_b, coeffs_a, state: BiquadCascadeState, x):
    """Run a cascade of biquads over ``x``.

    Matches the per-sample DF1 loop of cascaded_biquad_filter.cc:58-84 with
    all cascade sections fused into one scan step (identical accumulation
    order, so float32 output tracks the reference to ~1 ulp per sample).

    Args:
      coeffs_b: (num_sections, 3) numerator coefficients.
      coeffs_a: (num_sections, 2) denominator coefficients (a1, a2) in the
        ``y = f - a1 y1 - a2 y2`` convention.
      state: BiquadCascadeState with batch shape matching ``x[1:]``.
      x: (N, ...) input sequence, time leading.

    Returns:
      (new_state, y) with y of shape (N, ...).
    """
    num_sections = coeffs_b.shape[0]

    # Static coefficients + per-stream 1-D frames route to the Pallas
    # cascade kernel (ops/pallas_biquad.py): the per-sample recurrence
    # unrolls in VMEM with the stream batch on the vector lanes instead of
    # paying XLA scan overhead per sample. Identical operation order.
    if x.ndim in (1, 2) and not (
        isinstance(coeffs_b, jax.core.Tracer)
        or isinstance(coeffs_a, jax.core.Tracer)
    ):
        from webrtc_audio_processing_tpu.ops import pallas_biquad

        cascade = pallas_biquad.make_cascade(
            np.asarray(coeffs_b), np.asarray(coeffs_a),
            channels=(x.shape[1] if x.ndim == 2 else 0),
        )
        st_flat = jnp.concatenate(
            [state.x.astype(x.dtype), state.y.astype(x.dtype)], axis=1
        )  # (K, 4[, C]) rows [x1, x2, y1, y2]
        st_new, y = cascade(st_flat, x)
        return (
            BiquadCascadeState(x=st_new[:, :2], y=st_new[:, 2:]),
            y,
        )

    b = [[jnp.asarray(coeffs_b[k, i], x.dtype) for i in range(3)]
         for k in range(num_sections)]
    a = [[jnp.asarray(coeffs_a[k, i], x.dtype) for i in range(2)]
         for k in range(num_sections)]

    def step(carry, xt):
        xs, ys = carry  # each (num_sections, 2, ...)
        sig = xt
        new_xs, new_ys = [], []
        for k in range(num_sections):
            yk = (
                b[k][0] * sig
                + b[k][1] * xs[k, 0]
                + b[k][2] * xs[k, 1]
                - a[k][0] * ys[k, 0]
                - a[k][1] * ys[k, 1]
            )
            new_xs.append(jnp.stack([sig, xs[k, 0]], axis=0))
            new_ys.append(jnp.stack([yk, ys[k, 0]], axis=0))
            sig = yk
        return (jnp.stack(new_xs), jnp.stack(new_ys)), sig

    (xs, ys), y = jax.lax.scan(step, (state.x, state.y), x)
    return BiquadCascadeState(x=xs, y=ys), y


# High-pass filter coefficient tables (high_pass_filter.cc:25-56). Three
# cascaded sections per rate; the filter always runs at the 16 kHz band rate
# unless apply_in_full_band, in which case the full-band table is used.
HPF_COEFFS = {
    16000: (
        jnp.array(
            [
                [0.8773539420715290582, -1.754683920749088077, 0.8773539420715289472],
                [1.0, -1.999810143464515022, 1.0],
                [1.0, -1.999669231394235469, 1.0],
            ],
            jnp.float32,
        ),
        jnp.array(
            [
                [-1.881687317862849707, 0.8880584644559580410],
                [-1.976035417167170793, 0.9779708644868606582],
                [-1.994265767864654482, 0.9954861594635392441],
            ],
            jnp.float32,
        ),
    ),
    32000: (
        jnp.array(
            [
                [0.9102055685511306615, -1.820404922871161624, 0.9102055685511306615],
                [1.0, -1.999952541587768806, 1.0],
                [1.0, -1.999917315632020021, 1.0],
            ],
            jnp.float32,
        ),
        jnp.array(
            [
                [-1.940710875829138482, 0.9423512845457852061],
                [-1.988434609801665420, 0.9889212529819323416],
                [-1.997434723613889629, 0.9977401885079651978],
            ],
            jnp.float32,
        ),
    ),
    48000: (
        jnp.array(
            [
                [0.9213790163564168, -1.8427552370064049, 0.9213790163564168],
                [1.0, -1.9999789078432082, 1.0],
                [1.0, -1.9999632520325810, 1.0],
            ],
            jnp.float32,
        ),
        jnp.array(
            [
                [-1.9604500061078971, 0.9611862979079667],
                [-1.9923834169149972, 0.9926001112941157],
                [-1.9983570340145236, 0.9984928491805198],
            ],
            jnp.float32,
        ),
    ),
}
