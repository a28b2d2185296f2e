"""Public AudioProcessing API (reference-compatible, host-side wrapper).

Reference: webrtc/api/audio/audio_processing.h — the `AudioProcessing` ABC
with its config tree, 10 ms frame entry points, error codes and statistics,
plus api/audio/builtin_audio_processing_builder.{h,cc}.

This is the imperative shell over the pure paired step in apm.py: it owns
the stream state pytree, a small render FIFO reproducing the reference's
render-ahead-of-capture queue semantics (audio_processing_impl.cc:1098-1225,
bounded by kRenderTransferQueueSizeFrames=100), jits the step per (geometry,
parity), and exposes reference-style statistics.
"""

from __future__ import annotations

import os
from collections import deque

import jax
import numpy as np

from webrtc_audio_processing_tpu import apm
from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.models import rms_level
from webrtc_audio_processing_tpu.models.aec3 import config as aec3_config

# Error codes (audio_processing.h:663-683).
kNoError = 0
kUnspecifiedError = -1
kCreationFailedError = -2
kUnsupportedComponentError = -3
kUnsupportedFunctionError = -4
kNullPointerError = -5
kBadParameterError = -6
kBadSampleRateError = -7
kBadDataLengthError = -8
kBadNumberChannelsError = -9
kFileError = -10
kStreamParameterNotSetError = -11
kNotEnabledError = -12
kBadStreamParameterWarning = -13

RENDER_QUEUE_SIZE_FRAMES = 100  # aec3_common.h:41


class RuntimeSetting:
    """AudioProcessing::RuntimeSetting (audio_processing.h:380-470):
    typed value carrier with the reference's factory constructors."""

    NOT_SPECIFIED = 0
    CAPTURE_PRE_GAIN = 1
    CAPTURE_COMPRESSION_GAIN = 2
    CAPTURE_FIXED_POST_GAIN = 3
    PLAYOUT_VOLUME_CHANGE = 4
    CUSTOM_RENDER_SETTING = 5
    PLAYOUT_AUDIO_DEVICE_CHANGE = 6
    CAPTURE_POST_GAIN = 7
    CAPTURE_OUTPUT_USED = 8

    def __init__(self, type_=NOT_SPECIFIED, value=0.0):
        self.type = type_
        self.value = value

    @classmethod
    def create_capture_pre_gain(cls, gain: float):
        return cls(cls.CAPTURE_PRE_GAIN, float(gain))

    @classmethod
    def create_capture_post_gain(cls, gain: float):
        return cls(cls.CAPTURE_POST_GAIN, float(gain))

    @classmethod
    def create_compression_gain_db(cls, gain_db: int):
        return cls(cls.CAPTURE_COMPRESSION_GAIN, float(gain_db))

    @classmethod
    def create_capture_fixed_post_gain(cls, gain_db: float):
        return cls(cls.CAPTURE_FIXED_POST_GAIN, float(gain_db))

    @classmethod
    def create_playout_volume_change(cls, volume: int):
        return cls(cls.PLAYOUT_VOLUME_CHANGE, int(volume))

    @classmethod
    def create_playout_audio_device_change(cls, device_info):
        return cls(cls.PLAYOUT_AUDIO_DEVICE_CHANGE, device_info)

    @classmethod
    def create_custom_render_setting(cls, payload: int):
        return cls(cls.CUSTOM_RENDER_SETTING, int(payload))

    @classmethod
    def create_capture_output_used_setting(cls, used: bool):
        return cls(cls.CAPTURE_OUTPUT_USED, bool(used))


class AudioProcessingStats:
    """audio_processing_statistics.h:25-66."""

    def __init__(self):
        self.output_rms_dbfs = None
        self.voice_detected = None
        self.echo_return_loss = None
        self.echo_return_loss_enhancement = None
        self.divergent_filter_fraction = None
        self.delay_median_ms = None
        self.delay_standard_deviation_ms = None
        self.residual_echo_likelihood = None
        self.residual_echo_likelihood_recent_max = None
        self.delay_ms = None


def frame_size(rate_hz: int) -> int:
    """AudioProcessing::GetFrameSize (audio_processing.h:712-719)."""
    return rate_hz // 100


class AudioProcessing:
    """Stateful reference-style APM around the pure TPU step.

    Usage mirrors the reference: configure, then push 10 ms frames through
    ``process_reverse_stream`` / ``process_stream``.
    """

    def __init__(self, config: cfg_mod.Config | None = None,
                 echo_canceller3_config=None, injections=None):
        self._config = config or cfg_mod.Config()
        self._aec3_config = echo_canceller3_config
        self._injections = injections
        self._geo = None
        self._state = None
        self._steps = None
        self._frame_index = 0
        self._render_queue = deque()
        self._stream_delay_ms = 0
        self._stream_delay_set = False
        self._key_pressed = False
        self._output_rms_history = []
        self._last_stats = {}
        self._aec_dump = None
        # Mute/unmute state (kCaptureOutputUsed runtime setting,
        # audio_processing_impl.cc:818-839, applied :1540-1552).
        self._capture_output_used = True
        self._capture_output_used_last_frame = True
        # Host-tracked stereo-content detection state (ConfigSelector): the
        # AEC3 geometry is rebuilt when the detector flips
        # (echo_canceller3.cc:977-1005).
        self._aec3_stereo_active = False
        # Host-side AEC3 metric reporters (utils/metrics.py; reference
        # echo_canceller3.cc api_call_metrics_ + block_processor.cc /
        # echo_remover.cc / render_delay_controller.cc counterparts).
        from webrtc_audio_processing_tpu.utils import metrics as _metrics
        self._metrics = _metrics
        self._jitter_metrics = _metrics.ApiCallJitterMetrics()
        self._block_metrics = _metrics.BlockProcessorMetrics()
        self._delay_metrics = _metrics.RenderDelayControllerMetrics()
        self._remover_metrics = _metrics.EchoRemoverMetrics()
        # Input-volume histograms (agc2/input_volume_stats_reporter.cc,
        # wired like audio_processing_impl.cc:1313-1316 and :1518-1524).
        self._applied_volume_stats = _metrics.InputVolumeStatsReporter(
            "Applied")
        self._recommended_volume_stats = _metrics.InputVolumeStatsReporter(
            "Recommended")

    # ---------------------------------------------------------- aec dump

    def attach_aec_dump(self, path: str):
        """AttachAecDump (audio_processing.h:627-640): start recording the
        debug event stream (Init/Config/ReverseStream/Stream) to `path`."""
        from webrtc_audio_processing_tpu.utils import aec_dump

        self._aec_dump = aec_dump.AecDumpRecorder(path)
        self._aec_dump.on_config(self._config)
        if self._geo is not None:
            g = self._geo
            self._aec_dump.on_init(
                g.capture_input_rate, g.num_capture_channels,
                g.num_capture_channels, g.render_input_rate,
                g.num_render_channels, g.capture_output_rate,
            )
        return 0

    def detach_aec_dump(self):
        """DetachAecDump (audio_processing.h:645-649): finalize the file."""
        if self._aec_dump is not None:
            self._aec_dump.close()
            self._aec_dump = None
        return 0

    def attach_data_dumper(self, directory: str):
        """ApmDataDumper analog (logging/apm_data_dumper.h, the
        WEBRTC_APM_DEBUG_DUMP build mode): record named AEC3 internal
        signals per frame — spectra Y2/E2/S2/R2/N2, suppressor gain,
        linear output — for diffing against the reference's dumps. Saved
        as one .npy per name on detach (arrays stacked over frames)."""
        import os

        os.makedirs(directory, exist_ok=True)
        self._data_dump_dir = directory
        self._data_dump = {}
        self._geo = None  # re-trace with debug taps on
        return 0

    def detach_data_dumper(self):
        """Finalize the data dump: write one stacked array per tap name."""
        import os

        import numpy as _np

        dump = getattr(self, "_data_dump", None)
        if dump:
            for name, frames in dump.items():
                _np.save(os.path.join(self._data_dump_dir, f"{name}.npy"),
                         _np.stack([_np.asarray(f) for f in frames]))
        self._data_dump = None
        self._data_dump_dir = None
        self._geo = None
        return 0

    # ------------------------------------------------------------ config

    def apply_config(self, config: cfg_mod.Config):
        """ApplyConfig (audio_processing_impl.cc:694-771). Re-initializes
        when the config actually changes (the reference diffs per submodule;
        an identical config is a no-op and keeps all state)."""
        if config == self._config:
            return
        self._config = config
        self._geo = None  # force re-init on next frame

    def initialize(self):
        """Initialize() (audio_processing.h:489-499): reset state, keep
        config."""
        self._geo = None

    def _ensure_initialized(self, capture_rate, capture_channels,
                            render_rate, render_channels,
                            capture_out_rate=None):
        geo_key = (capture_rate, capture_channels, render_rate,
                   render_channels, capture_out_rate)
        if self._geo is not None and self._geo_key == geo_key:
            return
        self._geo_key = geo_key
        # Format-driven (re)initialization recreates the render transfer
        # queues, dropping any render audio queued before this capture
        # call (InitializeLocked -> AllocateRenderQueue, audio_processing_
        # impl.cc:615,1148-1199: queues are cleared/recreated, and the
        # submodules that buffered prior render data are rebuilt). The
        # reference therefore loses render frames pushed between creation
        # and the first capture call; reproduce that by clearing our
        # queued render frames whenever the geometry is rebuilt.
        self._render_queue.clear()
        self._geo = apm.ApmGeometry.create(
            self._config,
            capture_input_rate=capture_rate,
            num_capture_channels=capture_channels,
            capture_output_rate=capture_out_rate or capture_rate,
            render_input_rate=render_rate or capture_rate,
            num_render_channels=render_channels or 1,
            aec3_cfg=self._aec3_config,
            injections=self._injections,
            debug_taps=getattr(self, "_data_dump_dir", None) is not None,
            aec3_stereo_content=self._aec3_stereo_active,
            # Serving-mode knob (like AEC3_PAIR_KERNEL): bfloat16 selects
            # the half-footprint render rings (PERF.md r02/r05 — +4% at
            # the B=2048 operating point; -57 dB echo-reduction floor).
            # Exposed through the public API so the conformance matrix
            # can certify the bf16 serving mode unchanged
            # (APM_AEC3_RING_DTYPE=bfloat16 tools/run_conformance_matrix.py).
            aec3_ring_dtype=os.environ.get("APM_AEC3_RING_DTYPE",
                                           "float32"),
        )
        from webrtc_audio_processing_tpu.utils import complex_boundary as cb

        # Complex state leaves (AEC3 FFT buffers, filters) must not cross
        # the jit boundary eagerly — some TPU attachments reject eager
        # complex64 arrays (see utils/complex_boundary.py).
        self._state = cb.init_encoded(lambda: apm.init_state(self._geo))
        # A stream analog level set before the (lazy, format-driven)
        # initialization survives it: GainControlImpl keeps
        # analog_capture_level_ across Initialize
        # (gain_control_impl.cc:265-275, :349) — without this, the init
        # default (128) leaks into the first recommended_stream_analog_level.
        if (getattr(self, "_analog_level", None) is not None
                and self._state.agc1 is not None):
            from webrtc_audio_processing_tpu.models.agc1 import gain_control
            self._state = self._state.replace(
                agc1=gain_control.set_stream_analog_level(
                    self._state.agc1, self._analog_level
                )
            )
        geo = self._geo

        def make(parity):
            def fn(state, cap, ren, delay_ms, applied_volume, n0,
                   render_valid):
                return apm.process_stream_pair(
                    geo, state, cap, ren, parity, stream_delay_ms=delay_ms,
                    applied_input_volume=applied_volume, n0=n0,
                    render_valid=render_valid,
                )

            return jax.jit(cb.wrap_step(fn))

        def make_banded(parity):
            # Capture-only step consuming render bands the synchronous
            # render step already produced (reference queue hand-off).
            def fn(state, cap, ren_bands, delay_ms, applied_volume, n0):
                return apm.process_stream_pair(
                    geo, state, cap, None, parity, stream_delay_ms=delay_ms,
                    applied_input_volume=applied_volume, n0=n0,
                    render_bands=ren_bands,
                )

            return jax.jit(cb.wrap_step(fn))

        def render_fn(state, ren):
            return apm.process_render_stream(geo, state, ren)

        self._render_step = jax.jit(cb.wrap_step(render_fn))

        # The parity cycle covers the AEC3 80<->64 rebuffering (period 2),
        # AECM's frame->block cycle (2 at 16 kHz, 4 at 8 kHz), and the
        # hybrid analog AGC's 30 ms analytics cadence (period 3).
        import math as _math

        period = 2
        if geo.aecm is not None:
            period = _math.lcm(period, geo.aecm.period)
        if geo.agc1_hybrid:
            period = _math.lcm(period, 3)
        self._parity_period = period
        self._steps = [make(p) for p in range(period)]
        self._banded_steps = [make_banded(p) for p in range(period)]
        self._frame_index = 0
        self._render_queue.clear()

    # ------------------------------------------------------------ streams

    def process_reverse_stream(self, render: np.ndarray,
                               sample_rate_hz: int | None = None):
        """ProcessReverseStream (audio_processing.h:562-569).

        render: (frames, channels) float in [-1, 1]. Returns (err, render
        out). The render frame is queued; it is consumed by the next capture
        frame (SwapQueue semantics, drained synchronously on overflow like
        audio_processing_impl.cc:1107-1115).
        """
        render = np.asarray(render, np.float32)
        if render.ndim == 1:
            render = render[:, None]
        if render.shape[1] == 0:
            return kBadNumberChannelsError, render
        if self._aec_dump is not None:
            self._aec_dump.on_reverse_stream(render)
        if len(self._render_queue) >= RENDER_QUEUE_SIZE_FRAMES:
            self._render_queue.popleft()
            self._block_metrics.update_render(overrun=True)
        if self._config.echo_canceller.enabled:
            self._jitter_metrics.report_render_call()

        # With the geometry known and a matching format, the render half
        # runs synchronously (ProcessRenderStreamLocked) and the processed,
        # format-converted render signal is returned — the reference's
        # AudioConverter output path (audio_processing_impl.cc:1594-1605).
        # The banded render is queued for the next capture frame (SwapQueue
        # hand-off). Before initialization the raw frame is queued and the
        # render side runs inside the paired capture step instead.
        geo = self._geo
        if (geo is not None
                and render.shape[0] == frame_size(geo.render_input_rate)
                and render.shape[1] == geo.num_render_channels):
            import jax.numpy as jnp

            self._state, render_out, render_bands = self._render_step(
                self._state, jnp.asarray(render)
            )
            self._render_queue.append(("bands", render_bands))
            return kNoError, np.asarray(render_out)
        self._render_queue.append(("raw", render))
        return kNoError, render

    def analyze_reverse_stream(self, render, sample_rate_hz=None):
        """AnalyzeReverseStream (audio_processing.h:577)."""
        err, _ = self.process_reverse_stream(render, sample_rate_hz)
        return err

    def process_stream(self, capture: np.ndarray, sample_rate_hz: int,
                       output_sample_rate_hz: int | None = None):
        """ProcessStream float (audio_processing.h:554).

        capture: (frames, channels) float in [-1, 1].
        Returns (err, output array).
        """
        capture = np.asarray(capture, np.float32)
        if capture.ndim == 1:
            capture = capture[:, None]
        if capture.shape[1] == 0:
            # HandleUnsupportedAudioFormats (audio_processing_impl.cc:
            # 248-347): a zero channel count is rejected.
            return kBadNumberChannelsError, capture
        expected = frame_size(sample_rate_hz)
        if capture.shape[0] != expected:
            return kBadDataLengthError, capture
        if sample_rate_hz % 100 != 0:
            return kBadSampleRateError, capture

        render_bands = None
        render_is_real = False
        if self._render_queue:
            kind, payload = self._render_queue.popleft()
            if kind == "bands":
                render_bands = payload
                render_rate = self._geo.render_input_rate
                render_channels = self._geo.num_render_channels
                render = None
            else:
                render = payload
                render_is_real = True
                render_rate = render.shape[0] * 100
                render_channels = render.shape[1]
        else:
            render_rate = sample_rate_hz
            render_channels = (
                self._geo.num_render_channels if self._geo else 1
            )
            render = np.zeros((frame_size(render_rate), render_channels),
                              np.float32)

        geo_before = self._geo
        self._ensure_initialized(
            sample_rate_hz, capture.shape[1], render_rate, render_channels,
            output_sample_rate_hz,
        )
        if self._geo is not geo_before and (render_bands is not None
                                            or render is not None):
            # Capture-format change re-initialized the pipeline; queued
            # render audio (banded OR raw) belongs to the old geometry and
            # the reference drops it on re-init (InitializeLocked ->
            # AllocateRenderQueue clears/recreates the transfer queues and
            # rebuilds the submodules that buffered prior render data).
            # Fall back to a silent render frame.
            render_bands = None
            render_is_real = False
            render = np.zeros(
                (frame_size(self._geo.render_input_rate),
                 self._geo.num_render_channels), np.float32,
            )

        import jax.numpy as jnp

        # AEC3 block ordinal before this frame: 5 blocks per 2 frames
        # (2 on even parity, 3 on odd — aec3 FrameBlocker cadence).
        f = self._frame_index
        n0 = 5 * (f // 2) + 2 * (f % 2)
        if render_bands is not None:
            step = self._banded_steps[f % self._parity_period]
            self._state, out, _ren_out, stats = step(
                self._state, jnp.asarray(capture), render_bands,
                jnp.asarray(self._stream_delay_ms, jnp.int32),
                jnp.asarray(getattr(self, "_analog_level", 0), jnp.int32),
                jnp.asarray(n0, jnp.int32),
            )
        else:
            step = self._steps[f % self._parity_period]
            self._state, out, _ren_out, stats = step(
                self._state, jnp.asarray(capture), jnp.asarray(render),
                jnp.asarray(self._stream_delay_ms, jnp.int32),
                jnp.asarray(getattr(self, "_analog_level", 0), jnp.int32),
                jnp.asarray(n0, jnp.int32),
                jnp.asarray(render_is_real),
            )
        self._frame_index += 1
        self._last_stats = stats
        # Input-volume histograms: the applied volume when one was set
        # for this frame (audio_processing_impl.cc:1313-1316), the
        # recommended volume after the pipeline ran (:1518-1524).
        if getattr(self, "_analog_level", None) is not None:
            self._applied_volume_stats.update_statistics(self._analog_level)
            self._recommended_volume_stats.update_statistics(
                self.recommended_stream_analog_level()
            )
        # Stereo-content flip (echo_canceller3.cc:977-1005): rebuild the
        # AEC3 with the config/channel-count ConfigSelector now chooses.
        if (self._geo.aec3_dynamic_stereo
                and "multichannel_config_changed" in stats
                and bool(np.asarray(stats["multichannel_config_changed"]))):
            self._handle_stereo_content_flip(
                bool(np.asarray(stats["multichannel_content_detected"]))
            )
        if getattr(self, "_data_dump_dir", None) and "aec3_taps" in stats:
            for name, v in stats["aec3_taps"].items():
                self._data_dump.setdefault(name, []).append(v)
        out_np = np.asarray(out)
        # Unmute click suppression (audio_processing_impl.cc:1540-1552):
        # the first frame after the capture output becomes used again is
        # zeroed to avoid reactivation clicks.
        if (self._capture_output_used
                and not self._capture_output_used_last_frame):
            out_np = np.zeros_like(out_np)
        self._capture_output_used_last_frame = self._capture_output_used
        if (self._config.echo_canceller.enabled
                and not self._config.echo_canceller.mobile_mode):
            self._feed_aec3_metrics(stats)
        if self._aec_dump is not None:
            self._aec_dump.on_stream(
                capture, out_np, self._stream_delay_ms,
                getattr(self, "_analog_level", 0), self._key_pressed,
            )
        return kNoError, out_np

    def process_stream_int16(self, capture: np.ndarray, sample_rate_hz: int):
        """ProcessStream int16 (audio_processing.h:542)."""
        x = np.asarray(capture, np.int16).astype(np.float32) / 32768.0
        err, out = self.process_stream(x, sample_rate_hz)
        out16 = np.clip(out * 32768.0, -32768, 32767)
        out16 = np.trunc(out16 + np.copysign(0.5, out16)).astype(np.int16)
        return err, out16

    # ------------------------------------------------------------ params

    def get_linear_aec_output(self):
        """GetLinearAecOutput (audio_processing.h:584): the linear AEC error
        signal of the most recent capture frame at 16 kHz, shape
        (channels, 160), or None when AEC3 is not active."""
        out = self._last_stats.get("linear_aec_output")
        if out is None:
            return None
        # Internal layout is time-leading (160, C); the reference API hands
        # out one 160-sample span per channel.
        return np.asarray(out).T

    def set_stream_delay_ms(self, delay_ms: int) -> int:
        """set_stream_delay_ms (audio_processing.h:611)."""
        self._stream_delay_set = True
        if delay_ms < 0:
            self._stream_delay_ms = 0
            return kBadStreamParameterWarning
        if delay_ms > 500:
            self._stream_delay_ms = 500
            return kBadStreamParameterWarning
        self._stream_delay_ms = delay_ms
        return kNoError

    def stream_delay_ms(self) -> int:
        return self._stream_delay_ms

    def set_stream_key_pressed(self, key_pressed: bool):
        self._key_pressed = key_pressed

    def set_runtime_setting(self, setting: RuntimeSetting) -> bool:
        """SetRuntimeSetting (audio_processing.h:506-515) with the capture
        handlers of audio_processing_impl.cc:963-1064.

        Gain-type settings mutate the active config and re-jit the step
        while keeping the stream state (glitch-free in the reference sense;
        here it costs one cached recompile per distinct value).
        """
        import dataclasses as dc

        if self._aec_dump is not None:
            self._aec_dump.on_runtime_setting(setting.type, setting.value)

        c = self._config
        t, v = setting.type, setting.value
        if t == RuntimeSetting.CAPTURE_PRE_GAIN:
            if c.pre_amplifier.enabled:
                c = c.replace(pre_amplifier=dc.replace(
                    c.pre_amplifier, fixed_gain_factor=float(v)))
            elif c.capture_level_adjustment.enabled:
                c = c.replace(capture_level_adjustment=dc.replace(
                    c.capture_level_adjustment, pre_gain_factor=float(v)))
            else:
                return True  # ignored, as in the reference
            self._refresh_config(c)
        elif t == RuntimeSetting.CAPTURE_POST_GAIN:
            if c.capture_level_adjustment.enabled:
                c = c.replace(capture_level_adjustment=dc.replace(
                    c.capture_level_adjustment, post_gain_factor=float(v)))
                self._refresh_config(c)
        elif t == RuntimeSetting.CAPTURE_COMPRESSION_GAIN:
            # Ignored when an input volume controller owns the mic
            # (audio_processing_impl.cc:1010-1013).
            ivc = (c.gain_controller2.enabled
                   and c.gain_controller2.input_volume_controller.enabled)
            hybrid = (c.gain_controller1.enabled
                      and c.gain_controller1.analog_gain_controller.enabled)
            if not ivc and not hybrid and c.gain_controller1.enabled:
                c = c.replace(gain_controller1=dc.replace(
                    c.gain_controller1,
                    compression_gain_db=int(v + 0.5)))
                self._refresh_config(c)
        elif t == RuntimeSetting.CAPTURE_FIXED_POST_GAIN:
            if c.gain_controller2.enabled:
                c = c.replace(gain_controller2=dc.replace(
                    c.gain_controller2,
                    fixed_digital=dc.replace(
                        c.gain_controller2.fixed_digital,
                        gain_db=float(v))))
                self._refresh_config(c)
        elif t == RuntimeSetting.PLAYOUT_VOLUME_CHANGE:
            self._playout_volume = int(v)
        elif t in (RuntimeSetting.PLAYOUT_AUDIO_DEVICE_CHANGE,
                   RuntimeSetting.CUSTOM_RENDER_SETTING):
            # Render settings are forwarded to the injected render
            # pre-processor (HandleRenderRuntimeSettings,
            # audio_processing_impl.cc:1072-1096); no built-in consumer.
            inj = self._injections
            rpp = getattr(inj, "render_pre_processing", None)
            if rpp is not None and rpp.set_runtime_setting is not None:
                rpp.set_runtime_setting(setting)
        elif t == RuntimeSetting.CAPTURE_OUTPUT_USED:
            self._capture_output_used = bool(v)
        return True

    def _feed_aec3_metrics(self, stats):
        """Feed the host-side AEC3 metric reporters from the step's stats,
        once per processed block (2 or 3 blocks per 10 ms frame)."""
        if "aec3_erl_time_domain" not in stats:
            return
        self._jitter_metrics.report_capture_call()
        if not self._metrics.is_enabled():
            # Reading the device-resident stat scalars forces host syncs
            # (ruinous on remote-attached accelerators); only pay for it
            # when histograms are actually collected, mirroring the
            # reference's metrics::Enable() gating.
            return
        n_blocks = 2 if (self._frame_index % 2 == 1) else 3
        delay_ms = int(stats.get("delay_ms", 0))
        valid = bool(stats.get("aec3_external_delay_valid", False))
        for _ in range(n_blocks):
            self._block_metrics.update_capture(underrun=False)
            self._delay_metrics.update(
                delay_ms * 16 if valid else None,
                delay_ms // 4 if valid else None,
                int(stats.get("aec3_clockdrift_level", 0)),
            )
            self._remover_metrics.update(
                float(stats.get("aec3_erl_time_domain", 0.0)),
                float(stats.get("aec3_erle_fullband_log2", 0.0)),
                bool(stats.get("aec3_saturated_capture", False)),
                bool(stats.get("aec3_usable_linear_estimate", False)),
                int(stats.get("aec3_min_filter_delay", 0)),
            )

    def _handle_stereo_content_flip(self, stereo_active: bool):
        """Stereo-content flip: rebuild the AEC3 under the newly selected
        config/channel-count while preserving the content detector and all
        other submodule state (EchoCanceller3::Initialize via
        EmptyRenderQueue, echo_canceller3.cc:827-850, 977-981)."""
        from webrtc_audio_processing_tpu.models.aec3 import (
            echo_canceller3 as ec3,
        )
        from webrtc_audio_processing_tpu.utils import complex_boundary as cb

        self._aec3_stereo_active = stereo_active
        old_state = self._state
        key = self._geo_key
        self._geo = None
        self._ensure_initialized(*key)
        geo = self._geo
        if geo.aec3 is None or old_state is None:
            return
        fresh_aec = cb.init_encoded(lambda: ec3.init_state(geo.aec3))
        fresh_aec = fresh_aec.replace(
            mc_detector=old_state.aec.mc_detector
        )
        self._state = old_state.replace(aec=fresh_aec)

    def _refresh_config(self, new_config):
        """Swap the active config, re-jit the steps, keep the stream state
        when its pytree structure is unchanged."""
        self._config = new_config
        if self._geo is None:
            return
        old_state = self._state
        key = self._geo_key
        self._geo = None
        self._ensure_initialized(*key)
        if old_state is not None:
            old_def = jax.tree_util.tree_structure(old_state)
            new_def = jax.tree_util.tree_structure(self._state)
            if old_def == new_def:
                self._state = old_state

    def set_stream_analog_level(self, level: int):
        """set_stream_analog_level (audio_processing.h:590-596)."""
        self._analog_level = int(np.clip(level, 0, 255))
        if self._state is not None and self._state.agc1 is not None:
            from webrtc_audio_processing_tpu.models.agc1 import gain_control
            self._state = self._state.replace(
                agc1=gain_control.set_stream_analog_level(
                    self._state.agc1, self._analog_level
                )
            )

    def recommended_stream_analog_level(self) -> int:
        """recommended_stream_analog_level (audio_processing.h:599-607):
        AGC2's input volume controller wins over AGC1's analog loop."""
        if self._last_stats:
            if "agc2_recommended_input_volume" in self._last_stats and bool(
                self._last_stats.get(
                    "agc2_recommended_input_volume_valid", False
                )
            ):
                return int(
                    self._last_stats["agc2_recommended_input_volume"]
                )
            if "agc1_recommended_level" in self._last_stats:
                return int(self._last_stats["agc1_recommended_level"])
        return getattr(self, "_analog_level", 255)

    def proc_sample_rate_hz(self) -> int:
        return self._geo.capture_processing_rate if self._geo else 0

    def num_bands(self) -> int:
        if not self._geo:
            return 0
        return self._geo.capture_processing_rate // 16000

    # ------------------------------------------------------------ stats

    def get_statistics(self) -> AudioProcessingStats:
        """GetStatistics (audio_processing.h:652)."""
        s = AudioProcessingStats()
        if not self._last_stats:
            return s
        st = self._last_stats
        if "echo_return_loss" in st:
            s.echo_return_loss = float(st["echo_return_loss"])
            s.echo_return_loss_enhancement = float(
                st["echo_return_loss_enhancement"]
            )
            s.delay_ms = int(st["delay_ms"])
        if "aec3_divergent_filter_fraction" in st:
            # Populated by this backend; the reference impl declares the
            # field but leaves it to alternative backends
            # (audio_processing_statistics.h:45).
            s.divergent_filter_fraction = float(
                st["aec3_divergent_filter_fraction"]
            )
        if (self._state is not None
                and getattr(self._state, "delay_history_ms", None)
                is not None):
            hist = np.asarray(self._state.delay_history_ms)
            valid = np.asarray(self._state.delay_history_valid)
            if valid.any():
                d = hist[valid]
                s.delay_median_ms = int(np.median(d))
                s.delay_standard_deviation_ms = int(np.std(d))
        if self._state is not None:
            _, avg = rms_level.average_and_peak(self._state.output_rms)
            s.output_rms_dbfs = int(avg)
        if "echo_likelihood" in st:
            s.residual_echo_likelihood = float(st["echo_likelihood"])
            s.residual_echo_likelihood_recent_max = float(
                st["echo_likelihood_recent_max"]
            )
        if "agc2_speech_probability" in st:
            s.voice_detected = bool(
                float(st["agc2_speech_probability"]) > 0.5
            )
        return s
