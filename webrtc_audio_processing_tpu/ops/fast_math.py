"""Approximate transcendentals matching the reference's ns/fast_math.cc.

The reference NS evaluates log/exp through ``FastLog2f`` — a piecewise-linear
log2 that just reinterprets the float32 bit pattern as an integer
(ns/fast_math.cc:26-41). Its error (up to ~0.09 in log2) is part of the
algorithm's observable numerics, so we reproduce the exact same bit trick
rather than calling the accurate ``jnp.log``.

All functions are elementwise and dtype-float32.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# FastLog2f constants (ns/fast_math.cc:36-38).
_ONE_BY_2POW23 = jnp.float32(1.1920929e-7)
_EXP_BIAS = jnp.float32(126.942695)

_LN2 = jnp.float32(0.6931471805599453)
_LOG10_E = jnp.float32(0.4342944819032518)


def fast_log2(x):
    """Bit-pattern log2 (ns/fast_math.cc:26-41). Requires x > 0 bitwise-valid."""
    bits = jnp.asarray(x, jnp.float32).view(jnp.uint32)
    return bits.astype(jnp.float32) * _ONE_BY_2POW23 - _EXP_BIAS


def log_approx(x):
    """LogApproximation (ns/fast_math.cc:55-58): fast_log2(x) * ln(2)."""
    return fast_log2(x) * _LN2


def pow_approx(x, p):
    """PowApproximation (ns/fast_math.cc:51-53): 2^(p * fast_log2(x))."""
    return jnp.exp2(p * fast_log2(x))


# fast_log2(10.0f) evaluated exactly as float32: bits(10.0)=0x41200000.
# Computed host-side with numpy — no device op at import time.
_FAST_LOG2_10 = jnp.float32(
    np.float32(0x41200000) * np.float32(1.1920929e-7)
    - np.float32(126.942695)
)


def exp_approx(x):
    """ExpApproximation (ns/fast_math.cc:66-69): 10^(x*log10(e)) via pow_approx."""
    return jnp.exp2(jnp.asarray(x, jnp.float32) * _LOG10_E * _FAST_LOG2_10)
