"""MultiChannelContentDetector + ConfigSelector for AEC3.

Reference: aec3/multi_channel_content_detector.cc, aec3/config_selector.cc.

The detector is a small pure-state machine updated once per render frame.
In the reference a flip of the persistent flag triggers a blocking AEC3
re-initialization with the config chosen by ConfigSelector; in this
framework geometry is static under jit, so the flag is surfaced through
the metrics and the host API layer performs the re-init (the same
semantics: the canceller restarts with the other config).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

NUM_FRAMES_PER_SECOND = 100


@struct.dataclass
class MultiChannelContentDetectorState:
    persistent_detected: jnp.ndarray  # () bool
    temporary_detected: jnp.ndarray  # () bool
    consecutive_frames_with_stereo: jnp.ndarray  # () int32
    frames_since_stereo_last: jnp.ndarray  # () int32


def init_state(detect_stereo_content: bool,
               num_render_channels: int) -> MultiChannelContentDetectorState:
    return MultiChannelContentDetectorState(
        persistent_detected=jnp.asarray(
            (not detect_stereo_content) and num_render_channels > 1
        ),
        temporary_detected=jnp.asarray(False),
        consecutive_frames_with_stereo=jnp.asarray(0, jnp.int32),
        frames_since_stereo_last=jnp.asarray(0, jnp.int32),
    )


def update(state: MultiChannelContentDetectorState, render_bands,
           detect_stereo_content: bool, detection_threshold: float,
           timeout_threshold_seconds: int, hysteresis_seconds: float):
    """UpdateDetection (multi_channel_content_detector.cc:103-141).

    render_bands: (num_bands, N, C) float frame. Returns
    (state, changed flag)."""
    if not detect_stereo_content or render_bands.shape[-1] < 2:
        return state, jnp.asarray(False)

    has_stereo = jnp.any(
        jnp.abs(render_bands[..., 0] - render_bands[..., 1])
        > detection_threshold
    )
    consecutive = jnp.where(
        has_stereo, state.consecutive_frames_with_stereo + 1, 0
    )
    since_last = jnp.where(
        has_stereo, 0, state.frames_since_stereo_last + 1
    )
    hysteresis_frames = int(hysteresis_seconds * NUM_FRAMES_PER_SECOND)
    persistent = jnp.where(
        consecutive > hysteresis_frames, True, state.persistent_detected
    )
    if timeout_threshold_seconds > 0:
        timeout_frames = timeout_threshold_seconds * NUM_FRAMES_PER_SECOND
        persistent = jnp.where(
            since_last >= timeout_frames, False, persistent
        )
    temporary = jnp.where(persistent, False, has_stereo)
    changed = persistent != state.persistent_detected
    return (
        state.replace(
            persistent_detected=persistent,
            temporary_detected=temporary,
            consecutive_frames_with_stereo=consecutive,
            frames_since_stereo_last=since_last,
        ),
        changed,
    )


def select_config(mono_config, multichannel_config, multichannel_content):
    """ConfigSelector::Update (config_selector.cc:63-70): the multichannel
    config applies only when persistent multichannel content is present."""
    if multichannel_content and multichannel_config is not None:
        return multichannel_config
    return mono_config
