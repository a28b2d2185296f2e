"""Per-sample ramped gain application.

Reference: the sample loops of
modules/audio_processing/capture_levels_adjuster/audio_samples_scaler.cc:25-95
and modules/audio_processing/agc2/gain_applier.cc:39-70 — a scalar gain that
moves linearly from the previous frame's gain to a target across the frame.

Vectorized closed form: ``gain[i] = clamp(prev + inc*(i+1), lo, hi)`` with
``lo = min(prev, target)``, ``hi = max(prev, target)`` — covers increasing,
decreasing and constant cases without data-dependent branching.
"""

from __future__ import annotations

import jax.numpy as jnp


def ramped_gains_scaler(prev_gain, target_gain, num_samples: int, dtype=jnp.float32):
    """AudioSamplesScaler ramp: gain[i] = clamp(prev + inc*(i+1), ...).

    Matches audio_samples_scaler.cc:52-78 where the first sample already
    gets one increment step.
    """
    inc = (target_gain - prev_gain) / num_samples
    i = jnp.arange(1, num_samples + 1, dtype=dtype)
    g = prev_gain + inc * i
    lo = jnp.minimum(prev_gain, target_gain)
    hi = jnp.maximum(prev_gain, target_gain)
    return jnp.clip(g, lo, hi)


def ramped_gains_applier(last_gain, current_gain, num_samples: int, dtype=jnp.float32):
    """GainApplier ramp: sample i gets ``last + inc*i`` (gain_applier.cc:61-69
    multiplies BEFORE incrementing)."""
    inc = (current_gain - last_gain) / num_samples
    i = jnp.arange(num_samples, dtype=dtype)
    return last_gain + inc * i


def apply_scaler(prev_gain, target_gain, x):
    """Scale (N, ...) frame with the AudioSamplesScaler ramp + S16 clamp.

    Returns (y, new_prev_gain). Mirrors audio_samples_scaler.cc:25-95
    including the final clamp to [-32768, 32767].
    """
    g = ramped_gains_scaler(prev_gain, target_gain, x.shape[0], x.dtype)
    g = g.reshape(g.shape + (1,) * (x.ndim - 1))
    y = jnp.clip(x * g, -32768.0, 32767.0)
    return y, target_gain
