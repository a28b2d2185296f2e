"""Post filter: full-band low-pass compensation after AEC3 at 48 kHz.

Reference: modules/audio_processing/post_filter.{h,cc} — created only for
48 kHz processing (post_filter.cc:44-52), removes content above 19.5 kHz
with 4 cascaded cheby2 biquads (coefficients post_filter.cc:27-41).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.ops import biquad

# signal.iirdesign(19200*2/48000, 19500*2/48000, 3, 20, ftype='cheby2',
# output='sos') (post_filter.cc:26-41).
COEFFS_B_48K = jnp.array(
    [
        [0.56142156, 1.11499931, 0.56142156],
        [1.0, 1.88944170, 1.0],
        [1.0, 1.76057310, 1.0],
        [1.0, 1.67448535, 1.0],
    ],
    jnp.float32,
)
COEFFS_A_48K = jnp.array(
    [
        [1.57914249, 0.63379496],
        [1.55130066, 0.68708719],
        [1.53001328, 0.78591224],
        [1.56506670, 0.92096576],
    ],
    jnp.float32,
)

NUM_SECTIONS = 4


@struct.dataclass
class PostFilterState:
    filt: biquad.BiquadCascadeState


def is_needed(sample_rate_hz: int) -> bool:
    """PostFilter::CreateIfNeeded (post_filter.cc:44-52)."""
    return sample_rate_hz == 48000


def init_state(num_channels: int, dtype=jnp.float32) -> PostFilterState:
    return PostFilterState(filt=biquad.init_state(NUM_SECTIONS, (num_channels,), dtype))


def process(state: PostFilterState, x):
    """Filter the (N, channels) full-band signal."""
    new_filt, y = biquad.process(COEFFS_B_48K, COEFFS_A_48K, state.filt, x)
    return state.replace(filt=new_filt), y
