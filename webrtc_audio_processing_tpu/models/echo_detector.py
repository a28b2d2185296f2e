"""Residual echo detector: render/capture power correlation analytics.

Reference: modules/audio_processing/residual_echo_detector.{h,cc} and
modules/audio_processing/echo_detector/{circular_buffer, mean_variance_
estimator, normalized_covariance_estimator, moving_max}.cc.

Per 10 ms frame: render power enters a small FIFO (the thread-decoupling
buffer), capture power is correlated against the render power at 650
lookback delays; the maximum normalized cross-correlation (scaled by a
slowly-rising reliability) is the echo likelihood. The 650-delay loop is a
single vectorized update over (650,) covariance lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

LOOKBACK_FRAMES = 650
RENDER_BUFFER_SIZE = 30
ALPHA = 0.001
AGGREGATION_BUFFER_SIZE = 10 * 100
MAX_DECAY = 0.99  # moving_max.cc:27


@struct.dataclass
class EchoDetectorState:
    # CircularBuffer of render powers (circular_buffer.cc).
    render_buffer: jnp.ndarray  # (30,)
    rb_next_insert: jnp.ndarray  # () int32
    rb_size: jnp.ndarray  # () int32
    frames_since_zero_size: jnp.ndarray  # () int32
    first_process_call: jnp.ndarray  # () bool
    # Shift buffers of render statistics at each lookback delay, newest at
    # index 0 (the reference's ring + per-delay read loop collapses to an
    # aligned shift: under vmap a per-stream ring index turns every read
    # into a serialized per-stream gather — measured as ~70% of the 48 kHz
    # full-APM step before this layout).
    render_power: jnp.ndarray  # (650,)
    render_power_mean: jnp.ndarray  # (650,)
    render_power_std: jnp.ndarray  # (650,)
    # MeanVarianceEstimators.
    render_mean: jnp.ndarray
    render_var: jnp.ndarray
    capture_mean: jnp.ndarray
    capture_var: jnp.ndarray
    # NormalizedCovarianceEstimators, one per delay.
    covariances: jnp.ndarray  # (650,)
    # Outputs.
    echo_likelihood: jnp.ndarray  # ()
    reliability: jnp.ndarray  # ()
    # MovingMax.
    max_value: jnp.ndarray  # ()
    max_counter: jnp.ndarray  # () int32


def init_state(dtype=jnp.float32) -> EchoDetectorState:
    z = jnp.zeros((), dtype)
    return EchoDetectorState(
        render_buffer=jnp.zeros((RENDER_BUFFER_SIZE,), dtype),
        rb_next_insert=jnp.asarray(0, jnp.int32),
        rb_size=jnp.asarray(0, jnp.int32),
        frames_since_zero_size=jnp.asarray(0, jnp.int32),
        first_process_call=jnp.asarray(True),
        render_power=jnp.zeros((LOOKBACK_FRAMES,), dtype),
        render_power_mean=jnp.zeros((LOOKBACK_FRAMES,), dtype),
        render_power_std=jnp.zeros((LOOKBACK_FRAMES,), dtype),
        render_mean=z, render_var=z, capture_mean=z, capture_var=z,
        covariances=jnp.zeros((LOOKBACK_FRAMES,), dtype),
        echo_likelihood=z,
        reliability=z,
        max_value=z,
        max_counter=jnp.asarray(0, jnp.int32),
    )


def analyze_render_audio(state: EchoDetectorState, render):
    """AnalyzeRenderAudio (residual_echo_detector.cc:52-71).

    render: (N, C) or (N,) floatS16-domain render frame (the reference packs
    [-1,1]-scale floats; only relative powers matter).
    """
    power = jnp.mean(render.reshape(-1) ** 2)

    zero = state.rb_size == 0
    overflow = (~zero) & (
        state.frames_since_zero_size >= RENDER_BUFFER_SIZE
    )
    # Pop the oldest on overflow (circular_buffer.cc Pop).
    rb_size = jnp.where(overflow, state.rb_size - 1, state.rb_size)
    frames = jnp.where(zero | overflow, 0, state.frames_since_zero_size) + 1

    # Push via one-hot blend (a per-stream dynamic scatter would serialize
    # over the vmapped batch).
    onehot = jnp.arange(RENDER_BUFFER_SIZE) == state.rb_next_insert
    buf = jnp.where(onehot, power, state.render_buffer)
    return state.replace(
        render_buffer=buf,
        rb_next_insert=jnp.mod(state.rb_next_insert + 1, RENDER_BUFFER_SIZE),
        rb_size=jnp.minimum(rb_size + 1, RENDER_BUFFER_SIZE),
        frames_since_zero_size=frames,
    )


def analyze_capture_audio(state: EchoDetectorState, capture):
    """AnalyzeCaptureAudio (residual_echo_detector.cc:73-160)."""
    dt = state.render_buffer.dtype

    # First call flushes the render FIFO (:79-84).
    rb_size = jnp.where(state.first_process_call, 0, state.rb_size)

    has_render = rb_size > 0
    # Pop the oldest (FIFO: oldest = next_insert - size mod N); one-hot
    # read instead of a per-stream dynamic gather.
    oldest = jnp.mod(
        state.rb_next_insert - rb_size, RENDER_BUFFER_SIZE
    )
    render_power = jnp.sum(
        jnp.where(jnp.arange(RENDER_BUFFER_SIZE) == oldest,
                  state.render_buffer, 0.0)
    )
    rb_size = jnp.where(has_render, rb_size - 1, rb_size)

    # Render statistics (mean_variance_estimator.cc).
    r_mean = (1 - ALPHA) * state.render_mean + ALPHA * render_power
    r_var = (1 - ALPHA) * state.render_var + ALPHA * (
        render_power - r_mean
    ) ** 2
    r_std = jnp.sqrt(r_var)

    # Shift-insert: newest statistics at index 0, so entry d IS the value
    # from d frames ago — the per-delay reads below become aligned lanes.
    rp = jnp.concatenate([render_power[None], state.render_power[:-1]])
    rpm = jnp.concatenate([r_mean[None], state.render_power_mean[:-1]])
    rps = jnp.concatenate([r_std[None], state.render_power_std[:-1]])

    capture_power = jnp.mean(capture.reshape(-1) ** 2)
    c_mean = (1 - ALPHA) * state.capture_mean + ALPHA * capture_power
    c_var = (1 - ALPHA) * state.capture_var + ALPHA * (
        capture_power - c_mean
    ) ** 2
    c_std = jnp.sqrt(c_var)

    # Covariance update across all 650 delays at once
    # (normalized_covariance_estimator.cc + the delay loop :95-109).
    cov = (1 - ALPHA) * state.covariances + ALPHA * (
        capture_power - c_mean
    ) * (rp - rpm)
    ncc = cov / (c_std * rps + 1e-4)
    likelihood = jnp.maximum(jnp.max(ncc), 0.0)

    reliability = (1.0 - ALPHA) * state.reliability + ALPHA
    likelihood = jnp.minimum(likelihood * reliability, 1.0)

    # MovingMax (moving_max.cc:31-41).
    decayed = jnp.where(
        state.max_counter >= AGGREGATION_BUFFER_SIZE - 1,
        state.max_value * MAX_DECAY,
        state.max_value,
    )
    counter = jnp.where(
        state.max_counter >= AGGREGATION_BUFFER_SIZE - 1,
        state.max_counter,
        state.max_counter + 1,
    )
    new_max = jnp.where(likelihood > decayed, likelihood, decayed)
    counter = jnp.where(likelihood > decayed, 0, counter)

    updated = state.replace(
        rb_size=rb_size,
        first_process_call=jnp.asarray(False),
        render_power=rp,
        render_power_mean=rpm,
        render_power_std=rps,
        render_mean=r_mean,
        render_var=r_var,
        capture_mean=c_mean,
        capture_var=c_var,
        covariances=cov,
        echo_likelihood=likelihood.astype(dt),
        reliability=reliability,
        max_value=new_max,
        max_counter=counter,
    )
    # Without buffered render the frame is skipped entirely (:87-92).
    import jax

    skipped = state.replace(
        rb_size=rb_size, first_process_call=jnp.asarray(False)
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(has_render, a, b), updated, skipped
    )


def get_metrics(state: EchoDetectorState):
    """EchoDetector::GetMetrics (residual_echo_detector.cc:186-191)."""
    return {
        "echo_likelihood": state.echo_likelihood,
        "echo_likelihood_recent_max": state.max_value,
    }
