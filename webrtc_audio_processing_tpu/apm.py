"""AudioProcessing: the top-level APM pipeline (TPU-native).

Reference: modules/audio_processing/audio_processing_impl.{h,cc} — the
conductor that wires format negotiation, the capture pipeline
(ProcessCaptureStreamLocked, :1264-1561) and the render pipeline
(ProcessRenderStreamLocked, :1653-1687).

TPU design (SURVEY.md section 7): one pure step per 10 ms consuming a
PAIRED (render_frame, capture_frame); the reference's two-thread SwapQueue
hand-off collapses into program order (render side runs first inside the
step, exactly like EmptyQueuedRenderAudioLocked before capture processing).
The stateful `AudioProcessing` class in api.py wraps this pure step with the
reference's imperative interface; serving batches streams via vmap.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.models import (
    audio_buffer,
    capture_levels_adjuster as cla,
    echo_detector,
    high_pass_filter as hpf,
    noise_suppressor as ns,
    post_filter,
    rms_level,
)
from webrtc_audio_processing_tpu.models.agc1 import (
    agc_manager_direct as amd,
    analog as agc1_analog,
    digital as agc1_digital,
    gain_control as gc1,
)
from webrtc_audio_processing_tpu.models.agc2 import gain_controller2 as gc2
from webrtc_audio_processing_tpu.models.aec3 import (
    config as aec3_config,
    echo_canceller3 as ec3,
)
from webrtc_audio_processing_tpu.models.aecm import (
    echo_control_mobile as ecm,
)
from webrtc_audio_processing_tpu.ops import gain_ramp


def _to_s16(x):
    """FloatS16ToS16 (common_audio/include/audio_util.h): round half away
    from zero with clamping — the conversion every int16 export uses."""
    return jnp.clip(
        jnp.trunc(x + jnp.copysign(0.5, x)), -32768.0, 32767.0
    ).astype(jnp.int32)


def suitable_process_rate(minimum_rate: int, max_splitting_rate: int,
                          band_splitting_required: bool) -> int:
    """SuitableProcessRate (audio_processing_impl.cc:92-107)."""
    uppermost = max_splitting_rate if band_splitting_required else 48000
    for rate in (16000, 32000, 48000):
        if rate >= uppermost:
            return uppermost
        if rate >= minimum_rate:
            return rate
    return uppermost


@dataclass(frozen=True)
class ApmGeometry:
    """Static processing formats (InitializeLocked, :558-692)."""

    config: cfg_mod.Config
    capture_input_rate: int
    capture_output_rate: int
    render_input_rate: int
    render_output_rate: int
    num_capture_channels: int
    num_render_channels: int
    capture_processing_rate: int
    render_processing_rate: int
    render_processing_channels: int
    aec3: ec3.Aec3Geometry | None
    aecm: ecm.AecmGeometry | None = None
    # Injected components (builder.Injections); None when nothing injected.
    injections: object | None = None
    # Injected EchoControl instance (builder.EchoControlFactory.create
    # result) replacing the built-in AEC3 (echo_control.h:51-60).
    echo_control: object | None = None
    # True when AEC3 runs with stereo render content detection and the host
    # must re-create the geometry when the detector flips
    # (echo_canceller3.cc:977-981, config_selector.cc).
    aec3_dynamic_stereo: bool = False

    @staticmethod
    def create(
        config: cfg_mod.Config,
        capture_input_rate: int,
        num_capture_channels: int = 1,
        capture_output_rate: int | None = None,
        render_input_rate: int | None = None,
        num_render_channels: int = 1,
        render_output_rate: int | None = None,
        aec3_cfg: aec3_config.EchoCanceller3Config | None = None,
        injections: object | None = None,
        debug_taps: bool = False,
        aec3_stereo_content: bool = False,  # host-tracked detector state
        # Storage dtype for the AEC3 render history rings ("float32" |
        # "bfloat16"). bfloat16 halves the dominant per-stream HBM state
        # for large-scale serving at a small (quantized render history)
        # accuracy cost; the default is reference-exact f32.
        aec3_ring_dtype: str = "float32",
    ) -> "ApmGeometry":
        capture_output_rate = capture_output_rate or capture_input_rate
        render_input_rate = render_input_rate or capture_input_rate
        render_output_rate = render_output_rate or render_input_rate

        multiband = (
            config.noise_suppression.enabled
            or config.echo_canceller.enabled
            or config.gain_controller1.enabled
            or (config.high_pass_filter.enabled
                and not config.high_pass_filter.apply_in_full_band)
        )
        max_split = (
            config.pipeline.maximum_internal_processing_rate
            if config.pipeline.maximum_internal_processing_rate == 32000
            else 48000
        )
        cap_rate = suitable_process_rate(
            min(capture_input_rate, capture_output_rate), max_split, multiband
        )
        if config.echo_canceller.enabled:
            ren_rate = cap_rate
        else:
            ren_rate = suitable_process_rate(
                min(render_input_rate, render_output_rate), max_split,
                multiband,
            )
        multi_render = config.pipeline.multi_channel_render
        ren_channels = num_render_channels if multi_render else 1

        aec_geo = None
        echo_control = None
        dynamic_stereo = False
        factory = getattr(injections, "echo_control_factory", None)
        nree = getattr(injections, "neural_residual_echo_estimator", None)
        if config.echo_canceller.enabled and not config.echo_canceller.mobile_mode:
            cap_ch = (num_capture_channels
                      if config.pipeline.multi_channel_capture else 1)
            if factory is not None:
                # InitializeEchoController with an injected factory
                # (audio_processing_impl.cc:1909-1930).
                echo_control = factory.create(cap_rate, ren_channels, cap_ch)
            else:
                # Mono/multichannel config selection
                # (audio_processing_impl.cc:1928-1944 + config_selector.cc):
                # a default multichannel config exists only when the user set
                # no config; it activates when the render side carries proper
                # stereo — immediately if detection is off, else when the
                # content detector reports it (aec3_stereo_content, tracked
                # by the host across re-inits).
                mono_cfg = aec3_cfg or aec3_config.EchoCanceller3Config()
                mc_cfg = (None if aec3_cfg is not None
                          else aec3_config.create_default_multichannel_config())
                detect = mono_cfg.multi_channel.detect_stereo_content
                stereo_proc = ren_channels > 1 and (
                    (not detect) or aec3_stereo_content
                )
                dynamic_stereo = ren_channels > 1 and detect
                from webrtc_audio_processing_tpu.models.aec3 import (
                    multi_channel_content_detector as _mccd,
                )
                active_cfg = _mccd.select_config(mono_cfg, mc_cfg, stereo_proc)
                # Validate/clamp the tuning tree (echo_canceller3.cc:752-757
                # runs Validate after AdjustConfig).
                active_cfg, _valid = aec3_config.validate(active_cfg)
                aec_geo = ec3.Aec3Geometry.create(
                    active_cfg, cap_rate,
                    ren_channels if stereo_proc else 1, cap_ch,
                    nree=nree, debug_taps=debug_taps,
                    ring_dtype=aec3_ring_dtype,
                )

        aecm_geo = None
        if config.echo_canceller.enabled and config.echo_canceller.mobile_mode:
            # EchoControlMobileImpl defaults: Speakerphone routing, comfort
            # noise off (echo_control_mobile_impl.cc:108-109); runs on split
            # band 0 only.
            aecm_geo = ecm.AecmGeometry(
                sample_rate_hz=min(cap_rate, 16000),
                echo_mode=3,
                cng=False,
            )

        return ApmGeometry(
            config=config,
            capture_input_rate=capture_input_rate,
            capture_output_rate=capture_output_rate,
            render_input_rate=render_input_rate,
            render_output_rate=render_output_rate,
            num_capture_channels=num_capture_channels,
            num_render_channels=num_render_channels,
            capture_processing_rate=cap_rate,
            render_processing_rate=ren_rate,
            render_processing_channels=ren_channels,
            aec3=aec_geo,
            aecm=aecm_geo,
            injections=injections,
            echo_control=echo_control,
            aec3_dynamic_stereo=dynamic_stereo,
        )

    @property
    def echo_controller_enabled(self) -> bool:
        """An AEC3 or injected EchoControl is active (not AECM), the
        condition for mono capture processing (num_proc_channels,
        audio_processing_impl.cc:798-806)."""
        return self.aec3 is not None or self.echo_control is not None

    @property
    def capture_processing_channels(self) -> int:
        if (self.echo_controller_enabled
                and not self.config.pipeline.multi_channel_capture):
            return 1
        return self.num_capture_channels

    @property
    def agc1_hybrid(self) -> bool:
        """True when AGC1 runs as AgcManagerDirect + fixed-digital
        compression (InitializeGainController1,
        audio_processing_impl.cc:1991-2067)."""
        c = self.config.gain_controller1
        return c.enabled and c.analog_gain_controller.enabled

    def capture_buffer_config(self) -> audio_buffer.BufferConfig:
        # The working buffer always carries the output channel count
        # (audio_processing_impl.cc:588-594); with a mono-mode echo
        # controller the pipeline narrows to channel 0 after the band
        # split (:1365-1373), it does NOT average-downmix at input.
        return audio_buffer.BufferConfig(
            input_rate=self.capture_input_rate,
            input_num_channels=self.num_capture_channels,
            buffer_rate=self.capture_processing_rate,
            buffer_num_channels=self.num_capture_channels,
            output_rate=self.capture_output_rate,
            output_num_channels=self.num_capture_channels,
            downmix_method=self.config.pipeline.capture_downmix_method,
        )

    def render_buffer_config(self) -> audio_buffer.BufferConfig:
        return audio_buffer.BufferConfig(
            input_rate=self.render_input_rate,
            input_num_channels=self.num_render_channels,
            buffer_rate=self.render_processing_rate,
            buffer_num_channels=self.render_processing_channels,
            output_rate=self.render_output_rate,
            output_num_channels=self.num_render_channels,
        )


@struct.dataclass
class ApmState:
    capture_buffer: audio_buffer.AudioBufferState
    render_buffer: audio_buffer.AudioBufferState
    pre_amp_gain: jnp.ndarray | None  # () applied gain memory (ramping)
    hpf: hpf.HighPassFilterState | None
    cla: cla.CaptureLevelsAdjusterState | None
    ns: ns.NsState | None
    agc1: gc1.GainControlState | None
    agc_mgr: amd.AgcManagerDirectState | None
    aec: ec3.EchoCanceller3State | None
    aecm: ecm.AecmState | None
    agc2: gc2.Agc2State | None
    pf: post_filter.PostFilterState | None
    ed: echo_detector.EchoDetectorState | None
    input_rms: rms_level.RmsLevelState
    output_rms: rms_level.RmsLevelState
    frame_parity: jnp.ndarray  # () int32 — informational; parity is static
    was_stream_delay_set: jnp.ndarray  # () bool
    # Ring of the last second of AEC3 delay estimates (one per 10 ms frame,
    # most-recent last) feeding AudioProcessingStats.delay_median_ms /
    # delay_standard_deviation_ms — fields the reference impl declares but
    # leaves to alternative backends (audio_processing_statistics.h:54-55,
    # rust_audio_processing.cc:335-339). None without AEC3.
    delay_history_ms: jnp.ndarray | None = None  # (100,) int32
    delay_history_valid: jnp.ndarray | None = None  # (100,) bool
    # Injected-component state pytrees (builder.Injections seams).
    custom_render_pre: object | None = None
    custom_capture_post: object | None = None
    custom_analyzer: object | None = None
    echo_control: object | None = None


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _hybrid_gain_tables(target_level_dbfs: int = 2):
    """Gain tables for compression 0..18 dB (SetupDigitalGainControl +
    WebRtcAgc_set_config): the hybrid path switches compression at runtime,
    so all tables are precomputed and selected by index. Cached as numpy."""
    import numpy as _np

    tabs = [
        agc1_digital.calculate_gain_table(c, target_level_dbfs, True, c)
        for c in range(19)
    ]
    return _np.stack(tabs)


def _agc1_config(geo: ApmGeometry) -> agc1_analog.LegacyAgcConfig:
    c = geo.config
    if geo.agc1_hybrid:
        # SetupDigitalGainControl (agc_manager_direct.cc:533-552).
        dda = not c.gain_controller1.analog_gain_controller.enable_digital_adaptive
        return agc1_analog.LegacyAgcConfig(
            agc_mode=agc1_digital.AGC_MODE_FIXED_DIGITAL,
            fs=min(geo.capture_processing_rate, 16000),
            target_level_dbfs=0 if dda else 2,
            compression_gain_db=0 if dda else amd.DEFAULT_COMPRESSION_GAIN,
            limiter_enable=not dda,
        )
    return gc1.make_config(
        c.gain_controller1, min(geo.capture_processing_rate, 16000)
    )


def _init_aecm_states(geo: ApmGeometry):
    """One AECM canceller per (capture, render) channel pair, stacked on a
    leading axis in capture-major order
    (EchoControlMobileImpl::NumCancellersRequired, handle_index layout)."""
    one = ecm.init_state(geo.aecm)
    n = geo.capture_processing_channels * geo.render_processing_channels
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), one
    )


class _BuiltinEchoDetector:
    """Adapter giving models/echo_detector.py the EchoDetectorInjection
    surface (init_state/analyze_*/get_metrics)."""

    init_state = staticmethod(echo_detector.init_state)
    analyze_render_audio = staticmethod(echo_detector.analyze_render_audio)
    analyze_capture_audio = staticmethod(echo_detector.analyze_capture_audio)
    get_metrics = staticmethod(echo_detector.get_metrics)


def _ed_module(geo: ApmGeometry):
    """The active echo detector: injected (SetEchoDetector seam,
    audio_processing.h:848-879) or the built-in ResidualEchoDetector."""
    inj = geo.injections
    if inj is not None and inj.echo_detector is not None:
        ed = inj.echo_detector

        class _Injected:
            init_state = staticmethod(ed.init)
            analyze_render_audio = staticmethod(ed.analyze_render_audio)
            analyze_capture_audio = staticmethod(ed.analyze_capture_audio)
            get_metrics = staticmethod(ed.get_metrics)

        return _Injected
    return _BuiltinEchoDetector


def init_state(geo: ApmGeometry, dtype=jnp.float32) -> ApmState:
    c = geo.config
    inj = geo.injections
    cap_cfg = geo.capture_buffer_config()
    ren_cfg = geo.render_buffer_config()
    proc_ch = geo.capture_processing_channels
    num_bands = cap_cfg.num_bands
    return ApmState(
        capture_buffer=audio_buffer.init_state(cap_cfg, dtype),
        render_buffer=audio_buffer.init_state(ren_cfg, dtype),
        pre_amp_gain=(
            jnp.asarray(c.pre_amplifier.fixed_gain_factor, dtype)
            if c.pre_amplifier.enabled else None
        ),
        # The HPF exists whenever required by config OR forced by an
        # active mobile AECM or noise suppressor
        # (HighPassFilteringRequired, audio_processing_impl.cc:439-442) OR
        # enforced by the desktop AEC (InitializeHighPassFilter,
        # :1883-1890 — note `!mobile_mode` on the enforce term). Full-band
        # HPF runs before the mono narrowing and therefore on the output
        # channel count; split-band HPF runs after, on the processing
        # channels (:1891-1896).
        hpf=(hpf.init_state(
                geo.num_capture_channels
                if c.high_pass_filter.apply_in_full_band
                else proc_ch,
                dtype)
             if c.high_pass_filter.enabled
             or (c.echo_canceller.enabled and c.echo_canceller.mobile_mode)
             or c.noise_suppression.enabled
             or (c.echo_canceller.enabled
                 and c.echo_canceller.enforce_high_pass_filtering
                 and not c.echo_canceller.mobile_mode)
             else None),
        cla=(cla.init_state(
                c.capture_level_adjustment.pre_gain_factor,
                c.capture_level_adjustment.post_gain_factor,
                c.capture_level_adjustment.analog_mic_gain_emulation.initial_level,
                c.capture_level_adjustment.analog_mic_gain_emulation.enabled,
             ) if c.capture_level_adjustment.enabled else None),
        ns=(ns.init_state(proc_ch, num_bands, dtype)
            if c.noise_suppression.enabled else None),
        agc1=(gc1.init_state(_agc1_config(geo), proc_ch)
              if c.gain_controller1.enabled else None),
        agc_mgr=(amd.init_state(
                    proc_ch,
                    c.gain_controller1.analog_gain_controller
                    .clipped_wait_frames,
                 ) if geo.agc1_hybrid else None),
        aec=(ec3.init_state(geo.aec3) if geo.aec3 is not None else None),
        aecm=(_init_aecm_states(geo) if geo.aecm is not None else None),
        agc2=(gc2.init_state(c.gain_controller2, geo.capture_processing_rate,
                             use_internal_vad=True, dtype=dtype,
                             num_channels=proc_ch)
              if c.gain_controller2.enabled else None),
        # PostFilter::CreateIfNeeded returns one only at exactly 48 kHz
        # (post_filter.cc:44-52), and only on the echo-controller (desktop
        # AEC3 / injected) path of InitializeEchoController
        # (audio_processing_impl.cc:1954-1959) — never for mobile_mode.
        pf=(post_filter.init_state(proc_ch, dtype)
            if geo.capture_processing_rate == 48000
            and c.echo_canceller.enabled
            and not c.echo_canceller.mobile_mode else None),
        ed=(_ed_module(geo).init_state(dtype)
            if c.echo_canceller.enabled else None),
        input_rms=rms_level.init_state(),
        output_rms=rms_level.init_state(),
        frame_parity=jnp.asarray(0, jnp.int32),
        was_stream_delay_set=jnp.asarray(False),
        delay_history_ms=(jnp.zeros((100,), jnp.int32)
                          if geo.aec3 is not None else None),
        delay_history_valid=(jnp.zeros((100,), bool)
                             if geo.aec3 is not None else None),
        custom_render_pre=(
            inj.render_pre_processing.init(geo.render_processing_rate,
                                           geo.render_processing_channels)
            if inj is not None and inj.render_pre_processing is not None
            else None),
        custom_capture_post=(
            inj.capture_post_processing.init(geo.capture_processing_rate,
                                             proc_ch)
            if inj is not None and inj.capture_post_processing is not None
            else None),
        custom_analyzer=(
            inj.capture_analyzer.init(geo.capture_processing_rate, proc_ch)
            if inj is not None and inj.capture_analyzer is not None
            else None),
        echo_control=(geo.echo_control.init_state()
                      if geo.echo_control is not None else None),
    )


def process_render_stream(geo: ApmGeometry, state: ApmState, render_frame,
                          feed_valid=None):
    """Render half (ProcessRenderStreamLocked, audio_processing_impl.cc
    :1653-1687): pre-process, analyze, band-split, queue for the capture-side
    consumers, and produce the processed render output (the reference's
    AudioConverter path, :1594-1605).

    ``feed_valid``: optional traced bool. When False the render-queue
    consumers (echo detector, AGC1, AECM far FIFO) are NOT fed — the
    reference's EmptyQueuedRenderAudioLocked finds an empty queue when no
    render frame was pushed (or queued render was dropped by a
    format-driven re-init) and simply skips them; a fabricated silent
    frame must not advance their counters. None means statically valid
    (no gating ops traced — the serving hot path).

    Returns (state, render_out, render_bands); ``render_bands`` is the
    split-band render signal to hand to ``process_capture_stream``.
    """

    def _gate(new_leaf_tree, old_leaf_tree):
        if feed_valid is None:
            return new_leaf_tree
        return jax.tree_util.tree_map(
            lambda a, b: a if a is b else jnp.where(feed_valid, a, b),
            new_leaf_tree, old_leaf_tree,
        )

    ren_cfg = geo.render_buffer_config()
    inj = geo.injections

    rbuf, r = audio_buffer.copy_from(ren_cfg, state.render_buffer,
                                     render_frame)
    # Injected render pre-processor (:1659-1661) ahead of any render
    # consumer, as in the reference.
    if inj is not None and inj.render_pre_processing is not None:
        cp_state, r = inj.render_pre_processing.process(
            state.custom_render_pre, r
        )
        state = state.replace(custom_render_pre=cp_state)
    # Echo detector render analysis (QueueNonbandedRenderAudio, :1663).
    if state.ed is not None:
        state = state.replace(
            ed=_gate(_ed_module(geo).analyze_render_audio(state.ed, r),
                     state.ed)
        )
    if ren_cfg.num_bands > 1:
        rbuf, render_bands = audio_buffer.split_into_frequency_bands(
            ren_cfg, rbuf, r
        )
    else:
        render_bands = r[None]
    # AGC1 far-end analysis from the packed mono band-0 render
    # (QueueBandedRenderAudio :1671, GainControlImpl::PackRenderAudioBuffer).
    if state.agc1 is not None:
        agc1_cfg = _agc1_config(geo)
        # Per-sample int16 rounding before the integer channel average
        # (PackRenderAudioBuffer, gain_control_impl.cc:130-142).
        s16 = _to_s16(render_bands[0])  # (N, C_ren)
        ssum = jnp.sum(s16, axis=-1)
        n_ch = render_bands.shape[-1]
        far = jnp.sign(ssum) * (jnp.abs(ssum) // n_ch)
        state = state.replace(
            agc1=_gate(gc1.process_render_audio(agc1_cfg, state.agc1, far),
                       state.agc1)
        )
    # AECM far-end buffering: canceller (i, j) receives render channel
    # j's band 0 in int16, capture-major handle order
    # (EchoControlMobileImpl::PackRenderAudioBuffer, :131-156).
    if state.aecm is not None:
        far = _to_s16(render_bands[0])  # (N, C_ren)
        far_per = jnp.tile(
            far.T, (geo.capture_processing_channels, 1)
        )
        state = state.replace(
            aecm=_gate(jax.vmap(ecm.buffer_farend)(state.aecm, far_per),
                       state.aecm)
        )
    # Render output: merge of the (possibly pre-processed) bands, converted
    # back to the render output format — the reference's
    # AudioConverter::Convert / CopyTo path (:1594-1605).
    if ren_cfg.num_bands > 1:
        rbuf, r_merged = audio_buffer.merge_frequency_bands(
            ren_cfg, rbuf, render_bands
        )
    else:
        r_merged = r
    rbuf, render_out = audio_buffer.copy_to(ren_cfg, rbuf, r_merged)
    state = state.replace(render_buffer=rbuf)
    return state, render_out, render_bands


def process_stream_pair(
    geo: ApmGeometry,
    state: ApmState,
    capture_frame,  # (capture_in_frames, C_cap) float [-1, 1]
    render_frame=None,  # (render_in_frames, C_ren) float [-1, 1]
    parity: int = 0,
    stream_delay_ms=0,  # () int32 — used by AECM's far fetch
    applied_input_volume=0,  # () int32 — mic volume for AGC2's IVC
    n0=None,  # () int32 — AEC3 block ordinal before this frame; required
    #           when AEC3 runs. Must be an unbatched scalar under vmap and
    #           advance by 2 (even parity) / 3 (odd parity) each frame
    #           (see aec3/render_buffer.py).
    render_bands=None,  # pre-banded render from process_render_stream; set
    #           when the render half already ran for this frame.
    render_valid=None,  # optional traced bool: False when render_frame is
    #           a fabricated silent frame (no queued render, or queued
    #           render dropped by a format re-init) — the render-queue
    #           consumers are then not fed (see process_render_stream).
):
    """One paired 10 ms step: render analysis + capture processing.

    Mirrors ProcessReverseStream (audio_processing_impl.cc:1580-1687)
    followed by ProcessStream (:927-961, ProcessCaptureStreamLocked
    :1264-1561) in the order the reference's queues impose. Returns
    (state, capture_out, render_out, stats dict).
    """
    c = geo.config
    cap_cfg = geo.capture_buffer_config()

    stats = {}

    # ---------------- Render side (ProcessRenderStreamLocked :1653-1687).
    render_out = render_frame
    inj = geo.injections
    if render_frame is not None and render_bands is None:
        state, render_out, render_bands = process_render_stream(
            geo, state, render_frame, feed_valid=render_valid
        )

    # ---------------- Capture side (ProcessCaptureStreamLocked :1264-1561).
    cbuf, y = audio_buffer.copy_from(cap_cfg, state.capture_buffer,
                                     capture_frame)

    # Full-band HPF (:1282-1287) — runs before the level adjustments
    # whenever apply_in_full_band (default true; the
    # WebRTC-FullBandHpfKillSwitch field trial that forces split-band is
    # not registered here, matching its default-off state). Coefficients
    # are selected at proc_fullband_sample_rate_hz (the 48 kHz output
    # buffer rate when proc < output == 48 kHz) while the data filtered
    # is the proc-rate buffer — the reference's exact (quirky) pairing
    # (InitializeHighPassFilter :1891-1896 + Process call :1282-1287).
    new_hpf = state.hpf
    apply_hpf = state.hpf is not None
    hpf_full_band = c.high_pass_filter.apply_in_full_band
    if apply_hpf and hpf_full_band:
        hpf_rate = (48000
                    if (geo.capture_output_rate == 48000
                        and geo.capture_processing_rate < 48000)
                    else geo.capture_processing_rate)
        new_hpf, y = hpf.process(state.hpf, y, hpf_rate)

    # Pre-amplifier / capture level pre-gain (:1289-1299; the pre-amplifier
    # is routed through the capture levels adjuster in the reference,
    # :972-981).
    if state.pre_amp_gain is not None:
        g = jnp.asarray(c.pre_amplifier.fixed_gain_factor, y.dtype)
        gains = gain_ramp.ramped_gains_scaler(state.pre_amp_gain, g,
                                              y.shape[0], y.dtype)
        y = jnp.clip(y * gains[:, None], -32768.0, 32767.0)
        state = state.replace(pre_amp_gain=g)

    new_cla = state.cla
    if state.cla is not None:
        new_cla, y = cla.apply_pre_level_adjustment(
            state.cla, y,
            c.capture_level_adjustment.analog_mic_gain_emulation.enabled,
        )

    # Input RMS (:1301-1312).
    input_rms = rms_level.analyze(state.input_rms, y)

    # AGC2 input-volume analysis on the pre-processed capture
    # (GainController2::Analyze, audio_processing_impl.cc:1317).
    if state.agc2 is not None and state.agc2.ivc is not None:
        state = state.replace(
            agc2=gc2.analyze(c.gain_controller2, state.agc2,
                             applied_input_volume, y)
        )

    # Hybrid analog AGC clipping analysis (AnalyzePreProcess, :1345-1346).
    if state.agc_mgr is not None:
        agc = c.gain_controller1.analog_gain_controller
        mgr = amd.set_stream_analog_level(state.agc_mgr,
                                          applied_input_volume)
        mgr = amd.analyze_pre_process(
            mgr, y,
            clipped_level_step=agc.clipped_level_step,
            clipped_ratio_threshold=agc.clipped_ratio_threshold,
            clipped_wait_frames=agc.clipped_wait_frames,
            clipped_level_min=agc.clipped_level_min,
        )
        state = state.replace(agc_mgr=mgr)

    # Band split (:1359-1363).
    if cap_cfg.num_bands > 1:
        cbuf, bands = audio_buffer.split_into_frequency_bands(cap_cfg, cbuf, y)
    else:
        bands = y[None]

    # Echo-controller mono narrowing (:1365-1373): keep channel 0 only —
    # the reference truncates the channel view (set_num_channels(1)), it
    # does not mix. Output upmixing duplicates channel 0 back.
    if (geo.echo_controller_enabled
            and geo.capture_processing_channels < bands.shape[-1]):
        bands = bands[..., : geo.capture_processing_channels]
        y = y[..., : geo.capture_processing_channels]

    # Split-band HPF (:1375-1380) — only when not applied in full band.
    if apply_hpf and not hpf_full_band:
        new_hpf, b0 = hpf.process(state.hpf, bands[0], 16000)
        bands = bands.at[0].set(b0)

    # AGC1 analyze (:1382-1385) in the int16 domain. The int16 exports are
    # local copies: AnalyzeCaptureAudio's AddMic/VirtualMic modifications
    # update AGC state only, never the audio path
    # (gain_control_impl.cc:150-195 exports into stack buffers).
    new_agc1 = state.agc1
    agc1_cfg = None
    if state.agc1 is not None:
        agc1_cfg = _agc1_config(geo)
        new_agc1, _ = gc1.analyze_capture_audio(
            agc1_cfg, state.agc1, _to_s16(bands)
        )

    # NS analyze (pre-AEC, :1387-1391).
    new_ns = state.ns
    ns_params = (ns.SUPPRESSION_PARAMS[c.noise_suppression.level]
                 if state.ns is not None else None)
    if state.ns is not None:
        new_ns = ns.analyze(ns_params, state.ns, bands[0])

    # AEC3 (:1407-1416) — or the injected EchoControl (echo_control.h).
    new_aec = state.aec
    new_echo_control = state.echo_control
    linear_out = None
    if state.aec is not None and render_bands is not None:
        if n0 is None:
            raise ValueError(
                "process_stream_pair needs n0 (AEC3 block ordinal) when the "
                "echo canceller is enabled"
            )
        aec_out = ec3.process_frame(
            geo.aec3, state.aec, render_bands, bands, parity % 2, n0=n0
        )
        if geo.aec3.debug_taps:
            new_aec, bands, linear_out, aec_taps = aec_out
            stats["aec3_taps"] = aec_taps
        else:
            new_aec, bands, linear_out = aec_out
    elif state.echo_control is not None and render_bands is not None:
        new_echo_control, bands, linear_out = geo.echo_control.process_frame(
            state.echo_control, render_bands, bands, parity % 2
        )

    # AECM (mobile mode, :1393-1405 via EchoControlMobileImpl). Runs on
    # band 0 only; cancellers cascade over render channels and the upper
    # bands are zeroed (echo_control_mobile_impl.cc:165-226). In the
    # mobile branch NS.Process runs BEFORE the AECM
    # (audio_processing_impl.cc:1400-1402), the inverse of the desktop
    # order — the AECM was tuned on noise-suppressed input and its
    # comfort noise must not pass through the suppressor.
    new_aecm = state.aecm
    if state.aecm is not None:
        if new_ns is not None:
            new_ns, bands = ns.process(ns_params, new_ns, bands)
        ag = geo.aecm
        p = parity % ag.period
        c_cap = geo.capture_processing_channels
        c_ren = geo.render_processing_channels
        delay_ms = jnp.asarray(stream_delay_ms, jnp.int32)
        x = _to_s16(bands[0]).T  # (C_cap, N)

        def _one(s, xi):
            return ecm.process_frame(ag, s, xi, p, delay_ms)

        for j in range(c_ren):
            idx = jnp.arange(c_cap) * c_ren + j
            st_j = jax.tree_util.tree_map(lambda a, i=idx: a[i], new_aecm)
            st_j, x = jax.vmap(_one)(st_j, x)
            new_aecm = jax.tree_util.tree_map(
                lambda a, b, i=idx: a.at[i].set(b), new_aecm, st_j
            )
        bands = bands.at[0].set(x.T.astype(bands.dtype))
        if cap_cfg.num_bands > 1:
            bands = bands.at[1:].set(0.0)

    # NS process (:1423-1425) — desktop branch only; the mobile branch
    # already ran it before the AECM above.
    if new_ns is not None and state.aecm is None:
        new_ns, bands = ns.process(ns_params, new_ns, bands)

    # Hybrid analog AGC (AgcManagerDirect::Process, :1428-1436): runs on
    # split band 0 and picks the digital compression gain.
    new_agc_mgr = state.agc_mgr
    agc1_table = None
    if state.agc_mgr is not None:
        agc = c.gain_controller1.analog_gain_controller
        b0_i = _to_s16(bands[0])
        new_agc_mgr, rec_vol, compression, vp = amd.process(
            new_agc_mgr, b0_i, parity % 3,
            clipped_level_min=agc.clipped_level_min,
            disable_digital_adaptive=not agc.enable_digital_adaptive,
        )
        stats["agc1_recommended_level"] = rec_vol
        stats["agc1_voice_probability"] = vp
        # set_compression_gain_db applies on the next frame in the
        # reference; here the freshly slewed gain selects this frame's
        # precomputed table (one 0.05 dB step of skew at most).
        agc1_table = jnp.asarray(_hybrid_gain_tables())[
            jnp.clip(compression, 0, 18)
        ]

    # AGC1 process (:1438-1442): Analyze on a fresh int16 export, then the
    # impl's float ApplyDigitalGain on the float bands
    # (gain_control_impl.cc:197-258 — the int16 data is analysis-only).
    if new_agc1 is not None:
        new_agc1, _ = gc1.process_capture_audio(
            agc1_cfg, new_agc1, _to_s16(bands), jnp.asarray(False),
            gain_table=agc1_table,
        )
        bands = gc1.apply_digital_gain_float(
            gc1.shared_gains(new_agc1), bands
        )
        if state.agc_mgr is None:
            stats["agc1_recommended_level"] = new_agc1.analog_level
        stats["agc1_saturation_warning"] = new_agc1.saturation_warning

    # Merge bands (:1444-1448).
    if cap_cfg.num_bands > 1:
        cbuf, y = audio_buffer.merge_frequency_bands(cap_cfg, cbuf, bands)
    else:
        y = bands[0]

    # Echo detector capture analysis (:1462-1465).
    new_ed = state.ed
    if state.ed is not None:
        edm = _ed_module(geo)
        new_ed = edm.analyze_capture_audio(state.ed, y)
        stats.update(edm.get_metrics(new_ed))

    # Injected capture analyzer (CustomAudioAnalyzer::Analyze, :1468-1470).
    if inj is not None and inj.capture_analyzer is not None:
        state = state.replace(
            custom_analyzer=inj.capture_analyzer.analyze(
                state.custom_analyzer, y
            )
        )

    # AGC2 (:1472-1477).
    new_agc2 = state.agc2
    if state.agc2 is not None:
        new_agc2, y, agc_info = gc2.process(
            c.gain_controller2, state.agc2, y, geo.capture_processing_rate
        )
        stats.update({f"agc2_{k}": v for k, v in agc_info.items()})

    # PostFilter (:1479-1481) — only at exactly 48 kHz with AEC3.
    new_pf = state.pf
    if state.pf is not None:
        new_pf, y = post_filter.process(state.pf, y)

    # Injected capture post-processor (CustomProcessing, :1483-1485).
    if inj is not None and inj.capture_post_processing is not None:
        cp_state, y = inj.capture_post_processing.process(
            state.custom_capture_post, y
        )
        state = state.replace(custom_capture_post=cp_state)

    # Output RMS (:1487-1497).
    output_rms = rms_level.analyze(state.output_rms, y)

    # Post-gain (:1526-1538).
    if new_cla is not None:
        new_cla, y = cla.apply_post_level_adjustment(new_cla, y)

    cbuf, out = audio_buffer.copy_to(cap_cfg, cbuf, y)

    state = state.replace(
        capture_buffer=cbuf,
        hpf=new_hpf,
        cla=new_cla,
        ns=new_ns,
        agc1=new_agc1,
        agc_mgr=new_agc_mgr if state.agc_mgr is not None else state.agc_mgr,
        aec=new_aec,
        aecm=new_aecm,
        agc2=new_agc2,
        pf=new_pf,
        ed=new_ed,
        input_rms=input_rms,
        output_rms=output_rms,
        frame_parity=jnp.mod(state.frame_parity + 1, 2),
        custom_render_pre=state.custom_render_pre,
        custom_capture_post=state.custom_capture_post,
        custom_analyzer=state.custom_analyzer,
        echo_control=new_echo_control,
    )

    if new_aec is not None:
        stats.update(ec3.get_metrics(geo.aec3, new_aec))
        state = state.replace(
            delay_history_ms=jnp.roll(state.delay_history_ms, -1)
            .at[-1].set(jnp.asarray(stats["delay_ms"], jnp.int32)),
            delay_history_valid=jnp.roll(state.delay_history_valid, -1)
            .at[-1].set(jnp.asarray(stats["aec3_external_delay_valid"])),
        )
    elif new_echo_control is not None:
        stats.update(geo.echo_control.get_metrics(new_echo_control))
    if linear_out is not None:
        # GetLinearAecOutput (audio_processing.h:584): the 16 kHz linear
        # AEC error signal of this frame, (C, 160).
        stats["linear_aec_output"] = linear_out
    return state, out, render_out, stats
