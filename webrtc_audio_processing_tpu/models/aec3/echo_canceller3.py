"""EchoCanceller3: frame-level AEC3 with block pipeline.

Reference: aec3/echo_canceller3.cc (frame <-> block adaptation, saturation
detection, render queue), aec3/block_processor.cc (per-block state machine),
aec3/frame_blocker.cc + aec3/block_framer.cc (80 <-> 64 sample rebuffering).

TPU re-design: the render SwapQueue vanishes — one pure step consumes a
paired (render_frame, capture_frame); the 2-or-3-blocks-per-frame cadence of
the reference's sub-frame pipeline is a STATIC frame parity (the blocker
fill level follows a deterministic period-2 cycle), so the step compiles to
two specializations selected by the Python-side wrapper. Block loops are
unrolled statically (2 or 3 iterations).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.models.aec3 import (
    multi_channel_content_detector as mccd,
    delay_estimator as de,
    echo_remover as er,
    render_buffer as rb,
)
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config

BLOCK_SIZE = 64
FRAME_SIZE = 160


@dataclass(frozen=True)
class Aec3Geometry:
    config: EchoCanceller3Config
    sample_rate_hz: int
    num_bands: int
    num_render_channels: int
    num_capture_channels: int
    buffer: rb.BufferGeometry
    delay: de.DelayGeometry
    # Injected neural residual-echo estimator
    # (api/audio/neural_residual_echo_estimator.h); None = model-based.
    nree: object | None = None
    # Debug-tap mode: process_frame also returns a dict of named internal
    # signals per frame (last block), mirroring the reference's
    # ApmDataDumper (modules/audio_processing/logging/apm_data_dumper.h;
    # WEBRTC_APM_DEBUG_DUMP builds).
    debug_taps: bool = False
    # Pair-phase restructured capture path (docs/design/
    # subtractor_megakernel.md): hoist the delay stack and render-signal
    # analyzer ahead of the frame's block loop, run the subtractor for all
    # blocks as one unit, then the aec-state/suppression loop. Two
    # documented <=2-block stalenesses vs the strictly-interleaved path
    # (analyzer min_filter_delay, subtractor initial-state transition).
    pair_phase: bool = True
    # Pallas subtractor pair-megakernel for phase B (TPU only, any
    # geometry; ops/pallas_subtractor.py). The XLA pair path is its
    # tested fallback.
    pair_kernel: bool = True

    @staticmethod
    def create(config: EchoCanceller3Config, sample_rate_hz: int,
               num_render: int, num_capture: int,
               nree: object | None = None,
               debug_taps: bool = False,
               ring_dtype: str = "float32",
               pair_phase: bool | None = None,
               pair_kernel: bool | None = None) -> "Aec3Geometry":
        import os
        if pair_phase is None:
            pair_phase = os.environ.get("AEC3_PAIR_PHASE", "1") != "0"
        if pair_kernel is None:
            # Default OFF: the megakernel is semantically validated and
            # compiles/runs on the chip, but the r05 on-device A/B shows
            # the XLA pair path is still faster in the full pipeline
            # (8.65 vs 9.30 ms/frame at B=1024, 48 kHz stereo; stage
            # bisection in PERF.md — the kernel's remaining cost is its
            # HBM I/O + state marshal floor, not compute). Set
            # AEC3_PAIR_KERNEL=1 to enable.
            pair_kernel = os.environ.get("AEC3_PAIR_KERNEL", "0") == "1"
        return Aec3Geometry(
            config=config,
            sample_rate_hz=sample_rate_hz,
            num_bands=sample_rate_hz // 16000,
            num_render_channels=num_render,
            num_capture_channels=num_capture,
            buffer=rb.BufferGeometry.create(config, sample_rate_hz, num_render,
                                            ring_dtype=ring_dtype),
            delay=de.DelayGeometry.create(config),
            nree=nree,
            debug_taps=debug_taps,
            pair_phase=pair_phase,
            pair_kernel=pair_kernel,
        )


@struct.dataclass
class EchoCanceller3State:
    buffer: rb.RenderDelayBufferState
    delay: de.DelayEstimatorState
    remover: er.EchoRemoverState
    # BlockProcessor flags (block_processor.cc).
    capture_started: jnp.ndarray  # () bool
    render_event_pending: jnp.ndarray  # () int32
    # Frame <-> block rebuffering carries.
    render_blocker_carry: jnp.ndarray  # (bands, 32, C_ren)
    capture_blocker_carry: jnp.ndarray  # (bands, 32, C_cap)
    output_framer_carry: jnp.ndarray  # (bands, 64, C_cap)
    linear_framer_carry: jnp.ndarray  # (64, C_cap)
    saturated_microphone: jnp.ndarray  # () bool
    mc_detector: mccd.MultiChannelContentDetectorState
    mc_config_changed: jnp.ndarray  # () bool — host should re-init on True
    # BlockDelayBuffer (block_delay_buffer.cc): fixed capture pre-delay line,
    # shape (bands, fixed_capture_delay_samples, C_cap); width 0 when off.
    capture_predelay: jnp.ndarray


def init_state(geo: Aec3Geometry) -> EchoCanceller3State:
    return EchoCanceller3State(
        buffer=rb.init_state(geo.buffer, geo.config),
        delay=de.init_state(geo.delay, geo.config, geo.num_capture_channels),
        remover=er.init_state(geo.config, geo.num_bands,
                              geo.num_render_channels,
                              geo.num_capture_channels),
        capture_started=jnp.asarray(False),
        render_event_pending=jnp.asarray(0, jnp.int32),
        render_blocker_carry=jnp.zeros((geo.num_bands, 32,
                                        geo.num_render_channels)),
        capture_blocker_carry=jnp.zeros((geo.num_bands, 32,
                                         geo.num_capture_channels)),
        output_framer_carry=jnp.zeros((geo.num_bands, BLOCK_SIZE,
                                       geo.num_capture_channels)),
        linear_framer_carry=jnp.zeros((BLOCK_SIZE, geo.num_capture_channels)),
        saturated_microphone=jnp.asarray(False),
        mc_detector=mccd.init_state(
            geo.config.multi_channel.detect_stereo_content,
            geo.num_render_channels,
        ),
        mc_config_changed=jnp.asarray(False),
        capture_predelay=jnp.zeros(
            (geo.num_bands, geo.config.delay.fixed_capture_delay_samples,
             geo.num_capture_channels)
        ),
    )


def init_state_preserving_detector(
    geo: Aec3Geometry, old_state: EchoCanceller3State
) -> EchoCanceller3State:
    """EchoCanceller3::Initialize() on a stereo-content flip
    (echo_canceller3.cc:827-850 via :977-981): the block processor — delay
    stack, render buffers, subtractor, remover — restarts under the newly
    selected config/channel-count while the content detector state
    persists."""
    return init_state(geo).replace(mc_detector=old_state.mc_detector)


def _split_blocks(frame, carry, parity: int):
    """FrameBlocker block extraction for one 160-sample frame.

    frame: (bands, 160, C); carry: (bands, 32, C) valid only entering odd
    frames. Returns (blocks list, new_carry).
    """
    if parity == 0:
        blocks = [frame[:, 0:64], frame[:, 64:128]]
        new_carry = frame[:, 128:160]
    else:
        blocks = [
            jnp.concatenate([carry, frame[:, 0:32]], axis=1),
            frame[:, 32:96],
            frame[:, 96:160],
        ]
        new_carry = jnp.zeros_like(carry)
    return blocks, new_carry


def _frame_from_blocks(blocks, carry, parity: int):
    """BlockFramer sub-frame extraction (block_framer.cc).

    blocks: list of (bands, 64, C); carry: (bands, 64, C) with a valid
    prefix of 64 entering even frames and 32 entering odd frames.
    Returns (frame (bands, 160, C), new_carry).
    """
    if parity == 0:
        b1, b2 = blocks
        frame = jnp.concatenate([carry, b1, b2[:, 0:32]], axis=1)
        new_carry = jnp.concatenate(
            [b2[:, 32:64], jnp.zeros_like(b2[:, 0:32])], axis=1
        )
    else:
        b1, b2, b3 = blocks
        frame = jnp.concatenate([carry[:, 0:32], b1, b2], axis=1)
        new_carry = b3
    return frame, new_carry


def _detect_saturation(y):
    """DetectSaturation (echo_canceller3.cc:48-56): any |y| >= 32700."""
    return jnp.any(jnp.abs(y) >= 32700.0)


def _delay_phase_block(
    geo: Aec3Geometry,
    state: EchoCanceller3State,
    capture_block,  # (bands, 64, C_cap)
    n,  # () int32 — uniform total insert count (see render_buffer.py)
):
    """The delay-stack part of BlockProcessorImpl::ProcessCapture
    (block_processor.cc:84-174): first-capture reset, render overrun
    flush, buffer events, delay estimation and ring alignment — all of it
    independent of the echo remover, so the pair path can run it for
    every block of the frame ahead of the subtractor.

    Returns (state, delay_change, est_delay, est_valid)."""
    cfg = geo.config

    # First-capture reset (block_processor.cc:102-113). Render always starts
    # first in the paired step, so only the initial reset matters.
    # `a is b` leaves are untouched by the reset (state.replace shares
    # them) — skipping the select avoids materializing a copy of the big
    # ring buffers for a predicate that is False on every block but the
    # first.
    first = ~state.capture_started
    buf_reset = rb.reset(geo.buffer, cfg, state.buffer)
    buffer = jax.tree_util.tree_map(
        lambda a, b: b if a is b else jnp.where(first, a, b),
        buf_reset, state.buffer,
    )

    # Render overrun flush (block_processor.cc:119-127).
    flush = state.render_event_pending == rb.EVENT_RENDER_OVERRUN
    delay_change = flush

    buffer, buf_event, _activity = rb.prepare_capture_processing(
        geo.buffer, cfg, buffer
    )
    underrun = buf_event == rb.EVENT_RENDER_UNDERRUN

    # One combined delay-controller reset select instead of three
    # (first / flush / underrun): each tree_map-where is a full pass over
    # the matched-filter bank + lag histograms per stream per block.
    # Sequential composition collapses exactly — reset fields are
    # event-independent constants except the confidence-gated ones, and
    # reset(reset(x, True), False) == reset(x, True).
    hard = first | flush  # reset_delay_confidence=True events
    any_reset = hard | underrun
    delay_state = jax.tree_util.tree_map(
        lambda a, b: b if a is b else jnp.where(any_reset, a, b),
        de.reset_delay_controller(state.delay, hard), state.delay,
    )

    # Delay estimation and alignment.
    delay_state, est_delay, est_valid = de.get_delay(
        geo.delay, cfg, delay_state, buffer.lowrate,
        rb.lr_read_index(geo.buffer, buffer, n), capture_block,
    )
    buffer, changed = rb.align_from_delay(geo.buffer, cfg, buffer, est_delay)
    changed = changed & est_valid
    # AlignFromDelay is a no-op when no estimate exists yet.
    delay_change = delay_change | changed

    new_state = state.replace(
        buffer=buffer,
        delay=delay_state,
        capture_started=jnp.asarray(True),
        render_event_pending=jnp.asarray(0, jnp.int32),
    )
    return new_state, delay_change, est_delay, est_valid


def _process_capture_block(
    geo: Aec3Geometry,
    state: EchoCanceller3State,
    capture_block,  # (bands, 64, C_cap)
    echo_path_gain_change,
    n,  # () int32 — uniform total insert count (see render_buffer.py)
    pending_count: int = 0,  # static: staged sf rows (render_buffer.py)
):
    """BlockProcessorImpl::ProcessCapture (block_processor.cc:84-200) for one
    block. Returns (state, out_block, linear_block, taps)."""
    cfg = geo.config
    state, delay_change, est_delay, est_valid = _delay_phase_block(
        geo, state, capture_block, n
    )

    taps = {} if geo.debug_taps else None
    remover, out_block, linear = er.process_capture(
        cfg, state.remover, geo.buffer,
        rb.RenderView(state.buffer, n, pending_count),
        capture_block,
        delay_change, echo_path_gain_change, state.saturated_microphone,
        est_delay, est_valid, nree=geo.nree, taps=taps,
    )

    new_state = state.replace(remover=remover)
    return new_state, out_block, linear, taps


def process_frame(
    geo: Aec3Geometry,
    state: EchoCanceller3State,
    render_frame,  # (bands, 160, C_ren) floatS16 split bands
    capture_frame,  # (bands, 160, C_cap)
    parity: int,  # static 0/1 frame parity
    level_change=False,
    n0=None,  # () int32 — total blocks inserted BEFORE this frame; must be
    #           an unbatched scalar under vmap (see render_buffer.py).
):
    """One paired 10 ms frame through the AEC3 block pipeline.

    Mirrors EchoCanceller3::ProcessCapture (echo_canceller3.cc:876-939) with
    the render queue collapsed into the same step (render data is buffered
    before the capture blocks are processed, exactly as EmptyRenderQueue
    does). Returns (state, out_frame, linear_frame or None).
    """
    cfg = geo.config
    if n0 is None:
        raise ValueError(
            "process_frame now requires n0 (the uniform block ordinal); "
            "pass 0 for the first frame and advance by the number of blocks "
            "per frame (2 for parity 0, 3 for parity 1)."
        )
    n0 = jnp.asarray(n0, jnp.int32)

    # AnalyzeCapture saturation scan (echo_canceller3.cc:862-874): fullband
    # channel-wise; band 0 carries the fullband content at 16 kHz. The
    # saturation flag covers the whole frame.
    saturated = _detect_saturation(capture_frame[0])
    state = state.replace(saturated_microphone=saturated)

    # Optional fixed capture pre-delay (echo_canceller3.cc:902-906,
    # block_delay_buffer.cc): a D-sample delay line per split band, applied
    # after the (undelayed) saturation scan, before block processing.
    if cfg.delay.fixed_capture_delay_samples > 0:
        cat = jnp.concatenate([state.capture_predelay, capture_frame], axis=1)
        capture_frame = cat[:, :FRAME_SIZE]
        state = state.replace(capture_predelay=cat[:, FRAME_SIZE:])

    # Stereo-content detection on the render frame (EmptyRenderQueue,
    # echo_canceller3.cc:969-1005). A flip of the persistent flag is
    # surfaced via `mc_config_changed` for the host to re-initialize.
    mc = cfg.multi_channel
    mc_state, mc_changed = mccd.update(
        state.mc_detector, render_frame, mc.detect_stereo_content,
        mc.stereo_detection_threshold,
        mc.stereo_detection_timeout_threshold_seconds,
        mc.stereo_detection_hysteresis_seconds,
    )
    state = state.replace(mc_detector=mc_state, mc_config_changed=mc_changed)

    # Mono fallback downmix (BufferRenderFrameContent via FillSubFrameView,
    # echo_canceller3.cc:120-155): when the canceller operates mono on a
    # multichannel render input, the reference averages the channels while
    # temporary multichannel content is present and takes channel 0
    # otherwise.
    if render_frame.shape[-1] > geo.num_render_channels:
        assert geo.num_render_channels == 1, (
            "partial render downmix is not a reference behavior"
        )
        avg = jnp.mean(render_frame, axis=-1, keepdims=True)
        ch0 = render_frame[..., :1]
        render_frame = jnp.where(mc_state.temporary_detected, avg, ch0)

    # Render side: block and insert.
    r_blocks, r_carry = _split_blocks(render_frame, state.render_blocker_carry,
                                      parity)
    buffer = state.buffer
    event = state.render_event_pending
    if parity == 0:
        # Flush the previous pair's staged sf rows as one uninterrupted
        # write chain (render_buffer.flush_sf_pending); this frame's and
        # the odd frame's inserts stage into sf_pending and readers
        # overlay them (RenderView.pending_count below).
        buffer = rb.flush_sf_pending(geo.buffer, buffer, n0)
    slot_base = 0 if parity == 0 else rb.PAIR_BLOCKS - len(r_blocks)
    for k, blk in enumerate(r_blocks):
        buffer, ev = rb.insert(geo.buffer, cfg, buffer, blk, n0 + k + 1,
                               sf_slot=slot_base + k)
        event = jnp.maximum(event, ev)
    state = state.replace(
        buffer=buffer, render_blocker_carry=r_carry,
        render_event_pending=event,
    )
    n = n0 + len(r_blocks)

    # Capture side: block, process, reframe.
    c_blocks, c_carry = _split_blocks(capture_frame,
                                      state.capture_blocker_carry, parity)
    out_blocks = []
    linear_blocks = []
    taps = None
    pending_count = 2 if parity == 0 else rb.PAIR_BLOCKS
    if geo.pair_phase:
        # Phase-split capture path (docs/design/subtractor_megakernel.md):
        # the delay stack for every block first, then the echo remover's
        # three-phase pair form.
        views, dchanges, edelays, evalids = [], [], [], []
        for blk in c_blocks:
            state, dch, ed, ev = _delay_phase_block(geo, state, blk, n)
            views.append(rb.RenderView(state.buffer, n, pending_count))
            dchanges.append(dch)
            edelays.append(ed)
            evalids.append(ev)
        taps = {} if geo.debug_taps else None
        # The Pallas megakernel runs on real TPU only; elsewhere (CPU
        # tests/conformance) the XLA pair path is the same semantics.
        # AEC3_PAIR_KERNEL_INTERPRET=1 forces the kernel in Pallas
        # interpret mode on CPU (APM-level kernel-vs-XLA equivalence
        # tests; tests/test_subtractor_pallas.py).
        import os as _os
        kernel_interpret = (
            _os.environ.get("AEC3_PAIR_KERNEL_INTERPRET", "0") == "1"
        )
        use_kernel = geo.pair_kernel and (
            jax.default_backend() == "tpu" or kernel_interpret
        )
        remover, outs, linears = er.process_capture_pair(
            cfg, state.remover, geo.buffer, views, list(c_blocks),
            dchanges, jnp.asarray(level_change),
            state.saturated_microphone, edelays, evalids,
            nree=geo.nree, taps=taps,
            use_subtractor_kernel=use_kernel,
            subtractor_kernel_interpret=kernel_interpret,
        )
        state = state.replace(remover=remover)
        out_blocks = list(outs)
        linear_blocks = [jnp.swapaxes(e, 0, 1)[None] for e in linears]
    else:
        for blk in c_blocks:
            state, out_blk, linear, taps = _process_capture_block(
                geo, state, blk, jnp.asarray(level_change), n, pending_count
            )
            out_blocks.append(out_blk)
            linear_blocks.append(jnp.swapaxes(linear, 0, 1)[None])

    out_frame, out_carry = _frame_from_blocks(out_blocks,
                                              state.output_framer_carry,
                                              parity)
    linear_frame, linear_carry = _frame_from_blocks(
        linear_blocks, state.linear_framer_carry[None], parity
    )

    state = state.replace(
        capture_blocker_carry=c_carry,
        output_framer_carry=out_carry,
        linear_framer_carry=linear_carry[0],
    )
    if geo.debug_taps:
        # Last block's named internals, the ApmDataDumper analog.
        return state, out_frame, linear_frame[0], taps
    return state, out_frame, linear_frame[0]


def get_metrics(geo: Aec3Geometry, state: EchoCanceller3State):
    """EchoCanceller3::GetMetrics via the echo remover (echo_remover.cc:228)."""
    aec = state.remover.aec
    erl_td = aec.erl.erl_time_domain
    erle_log2 = aec.erle.fullband.erle_time_domain_log2
    return {
        "echo_return_loss": -10.0 * jnp.log10(jnp.maximum(erl_td, 1e-10)),
        "echo_return_loss_enhancement": jnp.mean(erle_log2) * (
            10.0 * 0.30102999566
        ),
        "delay_ms": rb.compute_delay(geo.buffer, state.buffer) * 4,
        "multichannel_content_detected":
            state.mc_detector.persistent_detected,
        "multichannel_config_changed": state.mc_config_changed,
        # Host-side metric reporter inputs (utils/metrics.py; per
        # echo_remover_metrics.cc / render_delay_controller_metrics.cc).
        "aec3_erl_time_domain": aec.erl.erl_time_domain,
        "aec3_erle_fullband_log2": jnp.mean(erle_log2),
        "aec3_divergent_filter_fraction": aec.divergent_fraction,
        "aec3_usable_linear_estimate": aec.usable_linear_estimate,
        "aec3_saturated_capture": aec.capture_signal_saturation,
        "aec3_min_filter_delay": aec.min_filter_delay,
        "aec3_external_delay_valid": aec.external_delay_valid,
        "aec3_clockdrift_level": state.delay.clockdrift.level,
    }
