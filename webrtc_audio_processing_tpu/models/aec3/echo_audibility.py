"""EchoAudibility + StationarityEstimator for AEC3.

Reference: aec3/echo_audibility.{h,cc}, aec3/stationarity_estimator.{h,cc}.
Active when config.echo_audibility.use_stationarity_properties (default
off): bands whose render (plus reverb contribution) stays within 10x the
tracked render noise floor over a 13-spectrum window are marked
stationary, and the residual echo in those bands is scaled to zero once
the filter has had time to converge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

NUM_BINS = 65
MIN_NOISE_POWER = 10.0
HANGOVER_BLOCKS = 250 // 20  # kNumBlocksPerSecond / 20
N_BLOCKS_AVERAGE_INIT_PHASE = 20
N_BLOCKS_INITIAL_PHASE = 500  # kNumBlocksPerSecond * 2
WINDOW_LENGTH = 13
THR_STATIONARITY = 10.0


@struct.dataclass
class StationarityState:
    """StationarityEstimator + its NoiseSpectrum."""

    noise_spectrum: jnp.ndarray  # (65,)
    block_counter: jnp.ndarray  # () int32
    hangovers: jnp.ndarray  # (65,) int32
    flags: jnp.ndarray  # (65,) bool


@struct.dataclass
class EchoAudibilityState:
    stationarity: StationarityState
    non_zero_render_seen: jnp.ndarray  # () bool


def init_state() -> EchoAudibilityState:
    return EchoAudibilityState(
        stationarity=StationarityState(
            noise_spectrum=jnp.full((NUM_BINS,), MIN_NOISE_POWER),
            block_counter=jnp.asarray(0, jnp.int32),
            hangovers=jnp.zeros((NUM_BINS,), jnp.int32),
            flags=jnp.zeros((NUM_BINS,), bool),
        ),
        non_zero_render_seen=jnp.asarray(False),
    )


def _noise_update(st: StationarityState, avg_spectrum):
    """NoiseSpectrum::Update (stationarity_estimator.cc:162-231)."""
    counter = st.block_counter + 1
    # GetAlpha.
    alpha_init, alpha_fin = 0.04, 0.004
    tilt = (alpha_init - alpha_fin) / N_BLOCKS_INITIAL_PHASE
    alpha = jnp.where(
        counter > N_BLOCKS_INITIAL_PHASE + N_BLOCKS_AVERAGE_INIT_PHASE,
        alpha_fin,
        alpha_init - tilt * (counter - N_BLOCKS_AVERAGE_INIT_PHASE),
    )
    # Averaging init phase.
    init_upd = st.noise_spectrum + (
        1.0 / N_BLOCKS_AVERAGE_INIT_PHASE
    ) * avg_spectrum

    # UpdateBandBySmoothing.
    below = st.noise_spectrum < avg_spectrum
    alpha_inc = alpha * (
        st.noise_spectrum / jnp.maximum(avg_spectrum, 1e-30)
    )
    alpha_inc = jnp.where(
        (counter > N_BLOCKS_INITIAL_PHASE)
        & (10.0 * st.noise_spectrum < avg_spectrum),
        alpha_inc * 0.1,
        alpha_inc,
    )
    up = st.noise_spectrum + alpha_inc * (avg_spectrum - st.noise_spectrum)
    down = jnp.maximum(
        st.noise_spectrum + alpha * (avg_spectrum - st.noise_spectrum),
        MIN_NOISE_POWER,
    )
    smooth_upd = jnp.where(below, up, down)

    noise = jnp.where(
        counter <= N_BLOCKS_AVERAGE_INIT_PHASE, init_upd, smooth_upd
    )
    return st.replace(noise_spectrum=noise, block_counter=counter)


def _update_stationarity_flags(st: StationarityState, view, s_read,
                               geo, average_reverb, delay_blocks,
                               headroom):
    """UpdateStationarityFlags (stationarity_estimator.cc:45-78) with the
    13-spectrum window centered to use the available lookahead."""
    lookahead = jnp.clip(headroom - delay_blocks + 1, 0,
                         WINDOW_LENGTH - 1)
    start = jnp.mod(s_read + delay_blocks - lookahead, geo.num_blocks)
    from webrtc_audio_processing_tpu.models.aec3 import render_buffer as rb

    # sf is the flat mirrored packed ring; the 13-row spectrum window is a
    # contiguous span starting at `start` (ascending offsets).
    window = rb._sf_spectrum(
        geo, rb.sf_span(geo, view, start, WINDOW_LENGTH)
    )  # (13, C, 65)
    acum = jnp.sum(jnp.mean(window, axis=1), axis=0) + average_reverb
    noise = WINDOW_LENGTH * st.noise_spectrum
    flags = acum < THR_STATIONARITY * noise

    # UpdateHangover (:123-132).
    reduce = jnp.all(flags)
    hang = jnp.where(
        ~flags, HANGOVER_BLOCKS,
        jnp.where(reduce, jnp.maximum(st.hangovers - 1, 0), st.hangovers),
    )

    # SmoothStationaryPerFreq (:134-148).
    sm = flags[:-2] & flags[1:-1] & flags[2:]
    smooth = jnp.concatenate([sm[:1], sm, sm[-1:]])
    return st.replace(flags=smooth, hangovers=hang)


def update(state: EchoAudibilityState, view, s_read, s_write,
           geo, newest_block_band0, average_reverb, delay_blocks,
           headroom, external_delay_seen,
           use_render_stationarity_at_init: bool):
    """EchoAudibility::Update (echo_audibility.cc:26-37), one block.

    In the paired-step design exactly one render spectrum is inserted per
    capture block, so the write-pointer walk collapses to the newest
    spectrum (index s_write). view: the RenderView (sf ring + staged
    rows; reads go through rb.sf_span so staged rows overlay).
    newest_block_band0: (64, C)."""
    from webrtc_audio_processing_tpu.models.aec3 import render_buffer as rb

    st = state.stationarity
    # IsRenderTooLow on the newest block (echo_audibility.cc:84-112).
    too_low = jnp.max(jnp.abs(newest_block_band0)) < 10.0
    non_zero = state.non_zero_render_seen | jnp.where(
        external_delay_seen, False, ~too_low
    )

    newest = jnp.mean(
        rb._sf_spectrum(
            geo, rb.sf_span(geo, view, s_write, 1)
        )[0].astype(jnp.float32),
        axis=0,
    )  # (65,)
    st_upd = _noise_update(st, newest)
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(non_zero, a, b), st_upd, st
    )

    do_flags = external_delay_seen | use_render_stationarity_at_init
    st_flags = _update_stationarity_flags(
        st, view, s_read, geo, average_reverb, delay_blocks,
        headroom,
    )
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(do_flags, a, b), st_flags, st
    )
    return state.replace(stationarity=st, non_zero_render_seen=non_zero)


def is_block_stationary(state: EchoAudibilityState):
    """StationarityEstimator::IsBlockStationary (stationarity_estimator.cc:
    90-98): more than 75% of the bands stationary (with drained hangover)."""
    band_st = state.stationarity.flags & (state.stationarity.hangovers == 0)
    return jnp.mean(band_st.astype(jnp.float32)) > 0.75


def residual_echo_scaling(state: EchoAudibilityState,
                          filter_has_had_time_to_converge,
                          use_render_stationarity_at_init: bool):
    """GetResidualEchoScaling (echo_audibility.h:40-51): 0 for stationary
    bands (with expired hangover) once converged, else 1."""
    band_stationary = state.stationarity.flags & (
        state.stationarity.hangovers == 0
    )
    active = filter_has_had_time_to_converge | use_render_stationarity_at_init
    return jnp.where(band_stationary & active, 0.0, 1.0)
