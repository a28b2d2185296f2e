"""Sample-format conversions and level utilities.

Reference: webrtc/common_audio/include/audio_util.h:47-120. Naming follows
the reference convention:

* ``s16``      — int16 samples in [-32768, 32767]
* ``float``    — float samples in [-1, 1]
* ``float_s16``— float samples in [-32768, 32768]
* ``dbfs``     — dB relative to int16 full scale, in [-90.3, 0]
"""

from __future__ import annotations

import jax.numpy as jnp

S16_SCALE = 32768.0
# -20 * log10(32768) (audio_util.h:100).
MIN_DBFS = -90.30899869919436


def s16_to_float(x):
    """int16 -> [-1, 1] float (audio_util.h:47-50)."""
    return jnp.asarray(x, jnp.float32) * (1.0 / S16_SCALE)


def float_to_s16(x):
    """[-1, 1] float -> int16 with round-half-away-from-zero (audio_util.h:58-63)."""
    v = jnp.clip(jnp.asarray(x, jnp.float32) * S16_SCALE, -32768.0, 32767.0)
    return jnp.trunc(v + jnp.copysign(0.5, v)).astype(jnp.int16)


def float_s16_to_s16(x):
    """float_s16 -> int16 with reference rounding (audio_util.h:52-56)."""
    v = jnp.clip(jnp.asarray(x, jnp.float32), -32768.0, 32767.0)
    return jnp.trunc(v + jnp.copysign(0.5, v)).astype(jnp.int16)


def float_to_float_s16(x):
    """[-1, 1] float -> float_s16 (clamped; audio_util.h:65-69)."""
    return jnp.clip(jnp.asarray(x, jnp.float32), -1.0, 1.0) * S16_SCALE


def float_s16_to_float(x):
    """float_s16 -> [-1, 1] float (clamped; audio_util.h:71-77)."""
    return jnp.clip(jnp.asarray(x, jnp.float32), -S16_SCALE, S16_SCALE) * (
        1.0 / S16_SCALE
    )


def s16_to_float_s16(x):
    """int16 -> float_s16 (plain cast; audio_util.h:80)."""
    return jnp.asarray(x, jnp.float32)


def db_to_ratio(v):
    """dB -> linear amplitude ratio (audio_util.h:87-89)."""
    return jnp.power(10.0, jnp.asarray(v, jnp.float32) / 20.0)


def dbfs_to_float_s16(v):
    """dBFS -> float_s16 amplitude (audio_util.h:91-94)."""
    return db_to_ratio(v) * S16_SCALE


def float_s16_to_dbfs(v):
    """Non-negative float_s16 amplitude -> dBFS (audio_util.h:96-105)."""
    v = jnp.asarray(v, jnp.float32)
    return jnp.where(v <= 1.0, MIN_DBFS, 20.0 * jnp.log10(jnp.maximum(v, 1.0)) + MIN_DBFS)


def downmix_average(x, axis=0):
    """Average channels to mono (audio_util.h DownmixChannels / audio_buffer.cc).

    Matches Config::Pipeline::DownmixMethod::kAverageChannels.
    """
    return jnp.mean(jnp.asarray(x, jnp.float32), axis=axis)


def downmix_first_channel(x, axis=0):
    """Take the first channel (DownmixMethod::kUseFirstChannel)."""
    return jnp.take(x, 0, axis=axis)


def interleave(x):
    """(channels, frames) -> interleaved (frames * channels,)."""
    return jnp.swapaxes(x, -1, -2).reshape(*x.shape[:-2], -1)


def deinterleave(x, num_channels: int):
    """Interleaved (frames * channels,) -> (channels, frames)."""
    frames = x.shape[-1] // num_channels
    return jnp.swapaxes(x.reshape(*x.shape[:-1], frames, num_channels), -1, -2)
