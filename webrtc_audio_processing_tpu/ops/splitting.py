"""Band splitting dispatcher: 1 band (<=16 kHz), 2-band QMF (32 kHz),
3-band DCT filterbank (48 kHz).

Reference: modules/audio_processing/splitting_filter.{h,cc} — per channel
QMF (splitting_filter.cc:69-103) or ThreeBandFilterBank (:105-142); band
frames are always 160 samples (audio_buffer.h:37 kSplitBandSize).

Channels ride as trailing batch axes of the underlying ops.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.ops import qmf, three_band

SAMPLES_PER_BAND = 160


def num_bands_for_rate(rate_hz: int) -> int:
    """audio_buffer.cc ctor: bands = buffer_num_frames / 160."""
    return max(1, (rate_hz // 100) // SAMPLES_PER_BAND)


@struct.dataclass
class SplittingState:
    """Analysis + synthesis filter state for one stream (all channels)."""

    analysis: Union[qmf.QmfState, three_band.ThreeBandState, None]
    synthesis: Union[qmf.QmfState, three_band.ThreeBandState, None]


def init_state(num_bands: int, batch_shape=(), dtype=jnp.float32):
    if num_bands == 2:
        return SplittingState(
            analysis=qmf.init_state(batch_shape, dtype),
            synthesis=qmf.init_state(batch_shape, dtype),
        )
    if num_bands == 3:
        # three_band.ThreeBandState already carries both directions.
        st = three_band.init_state(batch_shape, dtype)
        return SplittingState(analysis=st, synthesis=None)
    return SplittingState(analysis=None, synthesis=None)


def analysis(x, state: SplittingState, num_bands: int):
    """(N, ...) full-band -> ((num_bands, 160, ...) bands, state)."""
    if num_bands == 1:
        return x[None], state
    if num_bands == 2:
        (low, high), new = qmf.analysis(x, state.analysis)
        return jnp.stack([low, high], axis=0), state.replace(analysis=new)
    bands, new = three_band.analysis(x, state.analysis)
    return bands, state.replace(analysis=new)


def synthesis(bands, state: SplittingState, num_bands: int):
    """(num_bands, 160, ...) bands -> ((N, ...) full-band, state)."""
    if num_bands == 1:
        return bands[0], state
    if num_bands == 2:
        out, new = qmf.synthesis(bands[0], bands[1], state.synthesis)
        return out, state.replace(synthesis=new)
    out, new = three_band.synthesis(bands, state.analysis)
    return out, state.replace(analysis=new)
