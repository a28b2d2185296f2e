"""High-pass filter submodule.

Reference: modules/audio_processing/high_pass_filter.{h,cc} — three cascaded
biquads per channel; runs on the full-band signal or band 0 of the split
signal (high_pass_filter.cc:90-113). Coefficients per rate at
high_pass_filter.cc:25-56 (exposed as ops.biquad.HPF_COEFFS).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.ops import biquad

NUM_SECTIONS = 3


@struct.dataclass
class HighPassFilterState:
    filt: biquad.BiquadCascadeState


def init_state(num_channels: int, dtype=jnp.float32) -> HighPassFilterState:
    return HighPassFilterState(
        filt=biquad.init_state(NUM_SECTIONS, (num_channels,), dtype)
    )


def process(state: HighPassFilterState, x, sample_rate_hz: int):
    """Filter (N, channels) signal at the given (static) rate.

    When applied to split-band data the caller passes band 0 with
    sample_rate_hz=16000 (high_pass_filter.cc:93-99).
    """
    coeffs_b, coeffs_a = biquad.HPF_COEFFS[sample_rate_hz]
    new_filt, y = biquad.process(coeffs_b, coeffs_a, state.filt, x)
    return state.replace(filt=new_filt), y
