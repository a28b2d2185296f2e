"""Channel-mix + resample composition for format conversion.

Reference: common_audio/audio_converter.{h,cc} — Copy/Upmix/Downmix/
Resample converters composed by AudioConverter::Create, used for the
render output path (audio_processing_impl.cc:575-579).

TPU re-design: one object per (src_fmt -> dst_fmt); the per-channel
PushSincResampler bank is a single batched op (channels ride the trailing
batch axis of ops/resampler.py), so conversion is one jitted dispatch.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from webrtc_audio_processing_tpu.ops import resampler as rs


class AudioConverter:
    """Converts (src_frames, src_channels) -> (dst_frames, dst_channels).

    Downmix averages channels (DownmixConverter), upmix replicates channel
    0 (UpmixConverter), rate changes use the push sinc resampler. The
    composition order matches AudioConverter::Create: downmix before
    resampling, resample before upmixing (fewest resampler channels).
    """

    def __init__(self, src_channels: int, src_frames: int,
                 dst_channels: int, dst_frames: int):
        if src_channels < dst_channels and src_channels != 1:
            raise ValueError("upmix requires mono source")
        self.src_channels = src_channels
        self.src_frames = src_frames
        self.dst_channels = dst_channels
        self.dst_frames = dst_frames
        self._resample = src_frames != dst_frames
        if self._resample:
            rs_channels = min(src_channels, dst_channels)
            self._rs_state = rs.init_state(src_frames, (rs_channels,))

            def step(state, x):
                return rs.resample_frame(state, x, src_frames, dst_frames)

            self._rs_step = jax.jit(step)

    def convert(self, src: np.ndarray) -> np.ndarray:
        """One frame: src (src_frames, src_channels) float array."""
        x = np.asarray(src, np.float32)
        if x.ndim == 1:
            x = x[:, None]
        assert x.shape == (self.src_frames, self.src_channels), x.shape
        if self.src_channels > self.dst_channels:
            # DownmixConverter: plain channel average to dst_channels=1.
            x = np.mean(x, axis=1, keepdims=True)
            if self.dst_channels > 1:
                x = np.repeat(x, self.dst_channels, axis=1)
        if self._resample:
            self._rs_state, y = self._rs_step(self._rs_state, jnp.asarray(x))
            x = np.asarray(y)
        if x.shape[1] < self.dst_channels:
            # UpmixConverter: replicate the mono channel.
            x = np.repeat(x[:, :1], self.dst_channels, axis=1)
        return x
