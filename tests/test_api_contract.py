"""API-contract tests (audio_processing_unittest.cc:758-1339 analogs):
format validation, error codes, frame sizes, parameter clamping, config
idempotence, identical-channel invariance."""

import numpy as np
import pytest

from webrtc_audio_processing_tpu import api, config as cfg_mod
from webrtc_audio_processing_tpu.api import (
    AudioProcessing,
    RuntimeSetting,
    frame_size,
    kBadDataLengthError,
    kBadNumberChannelsError,
    kBadSampleRateError,
    kBadStreamParameterWarning,
    kNoError,
)

RNG = np.random.default_rng(11)


def test_frame_size():
    # GetFrameSize = rate/100 (audio_processing.h:712-719).
    for rate in (8000, 16000, 32000, 48000, 44100):
        assert frame_size(rate) == rate // 100


class TestFormatValidation:
    def test_bad_data_length(self):
        ap = AudioProcessing(cfg_mod.Config())
        err, _ = ap.process_stream(np.zeros(100, np.float32), 16000)
        assert err == kBadDataLengthError

    def test_bad_sample_rate(self):
        ap = AudioProcessing(cfg_mod.Config())
        err, _ = ap.process_stream(np.zeros(441, np.float32), 44150)
        assert err == kBadSampleRateError

    @pytest.mark.parametrize("rate", [8000, 16000, 32000, 48000])
    def test_native_rates_int16(self, rate):
        ap = AudioProcessing(cfg_mod.Config().replace(
            high_pass_filter=cfg_mod.HighPassFilter(enabled=True),
        ))
        x = (RNG.normal(size=frame_size(rate)) * 1000).astype(np.int16)
        err, out = ap.process_stream_int16(x, rate)
        assert err == kNoError
        assert out.dtype == np.int16
        assert out.shape[0] == frame_size(rate)

    def test_arbitrary_float_rate(self):
        # Float API accepts any multiple of 100 (audio_processing.h:554).
        ap = AudioProcessing(cfg_mod.Config())
        x = RNG.normal(size=frame_size(44100)).astype(np.float32) * 0.1
        err, out = ap.process_stream(x, 44100)
        assert err == kNoError
        assert out.shape[0] == frame_size(44100)


class TestStreamParameters:
    def test_stream_delay_clamping(self):
        # set_stream_delay_ms clamps to [0, 500] with a warning
        # (audio_processing_impl.cc set_stream_delay_ms).
        ap = AudioProcessing(cfg_mod.Config())
        assert ap.set_stream_delay_ms(-5) == kBadStreamParameterWarning
        assert ap.stream_delay_ms() == 0
        assert ap.set_stream_delay_ms(600) == kBadStreamParameterWarning
        assert ap.stream_delay_ms() == 500
        assert ap.set_stream_delay_ms(100) == kNoError
        assert ap.stream_delay_ms() == 100

    def test_analog_level_clamped(self):
        ap = AudioProcessing(cfg_mod.Config())
        ap.set_stream_analog_level(300)
        assert 0 <= ap.recommended_stream_analog_level() <= 255

    def test_runtime_setting_always_accepted(self):
        ap = AudioProcessing(cfg_mod.Config())
        assert ap.set_runtime_setting(
            RuntimeSetting.create_capture_pre_gain(2.0)
        )
        assert ap.set_runtime_setting(
            RuntimeSetting.create_capture_output_used_setting(False)
        )


class TestConfigIdempotence:
    def test_identical_config_keeps_state(self):
        c = cfg_mod.Config().replace(
            noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
        )
        ap = AudioProcessing(c)
        x = RNG.normal(size=(160,)).astype(np.float32) * 0.1
        ap.process_stream(x, 16000)
        state_before = ap._state
        ap.apply_config(c)
        assert ap._state is state_before

    def test_changed_config_reinitializes(self):
        c = cfg_mod.Config()
        ap = AudioProcessing(c)
        x = RNG.normal(size=(160,)).astype(np.float32) * 0.1
        ap.process_stream(x, 16000)
        ap.apply_config(c.replace(
            noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
        ))
        err, out = ap.process_stream(x, 16000)
        assert err == kNoError

    def test_format_change_reinitializes(self):
        ap = AudioProcessing(cfg_mod.Config())
        x16 = RNG.normal(size=(160,)).astype(np.float32) * 0.1
        x32 = RNG.normal(size=(320,)).astype(np.float32) * 0.1
        assert ap.process_stream(x16, 16000)[0] == kNoError
        assert ap.process_stream(x32, 32000)[0] == kNoError
        assert ap.process_stream(x16, 16000)[0] == kNoError


class TestIdenticalChannelInvariance:
    """Identical input channels must produce identical output channels
    (audio_processing_unittest.cc IdenticalInputChannelsResultInIdentical
    OutputChannels). The reference asserts bitwise; under XLA:CPU the LLVM
    autovectorizer applies FMA to the vector body and plain mul/add to the
    scalar remainder lane of the biquad recurrences, so cross-channel
    equality holds only to float rounding here (measured <= 2e-5 in [-1,1]
    units with the full-band 32 kHz HPF; lanes are uniform on TPU)."""

    @pytest.mark.parametrize("rate", [16000, 32000])
    def test_invariance(self, rate):
        c = cfg_mod.Config().replace(
            pipeline=cfg_mod.Pipeline(multi_channel_capture=True),
            high_pass_filter=cfg_mod.HighPassFilter(enabled=True),
            noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
            gain_controller2=cfg_mod.GainController2(enabled=True),
        )
        ap = AudioProcessing(c)
        F = frame_size(rate)
        for k in range(20):
            mono = RNG.normal(size=(F, 1)).astype(np.float32) * 0.1
            x = np.repeat(mono, 2, axis=1)
            err, out = ap.process_stream(x, rate)
            assert err == kNoError
            np.testing.assert_allclose(out[:, 0], out[:, 1], rtol=0,
                                       atol=2e-5)


def test_initialize_resets_state():
    ap = AudioProcessing(cfg_mod.Config().replace(
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
    ))
    x = RNG.normal(size=(160,)).astype(np.float32) * 0.1
    ap.process_stream(x, 16000)
    ap.initialize()
    err, out = ap.process_stream(x, 16000)
    assert err == kNoError


class TestCaptureOutputUsed:
    """kCaptureOutputUsed runtime setting + unmute click suppression
    (audio_processing_impl.cc:1046-1057, 1540-1552)."""

    def test_unmute_zeroes_first_frame(self):
        ap = AudioProcessing(cfg_mod.Config())
        x = (RNG.standard_normal((160, 1)) * 0.1).astype(np.float32)
        err, out = ap.process_stream(x, 16000)
        assert err == kNoError and np.abs(out).max() > 0

        ap.set_runtime_setting(
            RuntimeSetting.create_capture_output_used_setting(False)
        )
        err, _ = ap.process_stream(x, 16000)
        assert err == kNoError

        ap.set_runtime_setting(
            RuntimeSetting.create_capture_output_used_setting(True)
        )
        err, out = ap.process_stream(x, 16000)
        assert err == kNoError
        # First frame after unmute is zeroed to suppress the click.
        assert np.abs(out).max() == 0.0

        err, out = ap.process_stream(x, 16000)
        assert err == kNoError
        assert np.abs(out).max() > 0.0

    def test_render_output_is_processed_and_returned(self):
        # The render path returns the processed (format-converted) render
        # signal, not the input (audio_processing_impl.cc:1594-1605).
        ap = AudioProcessing(cfg_mod.Config().replace(
            echo_canceller=cfg_mod.EchoCanceller(enabled=True),
        ))
        x = (RNG.standard_normal((160, 1)) * 0.1).astype(np.float32)
        # Prime the geometry with one capture frame.
        ap.process_stream(x, 16000)
        r = (RNG.standard_normal((160, 1)) * 0.1).astype(np.float32)
        err, rout = ap.process_reverse_stream(r, 16000)
        assert err == kNoError
        assert rout.shape == r.shape


class TestFormatChangeStress:
    """Random mid-stream format changes (audio_processing_unittest.cc
    ChannelCombinations / format-change regions): every transition must
    reinitialize cleanly and produce a well-formed frame."""

    def test_random_format_transitions(self):
        rng = np.random.default_rng(3)
        ap = AudioProcessing(cfg_mod.Config().replace(
            noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
        ))
        combos = [(16000, 1), (16000, 2), (32000, 1), (32000, 2)]
        last = None
        for _ in range(12):
            rate, ch = combos[rng.integers(len(combos))]
            x = (rng.standard_normal((rate // 100, ch)) * 0.1).astype(
                np.float32
            )
            err, out = ap.process_stream(x, rate)
            assert err == kNoError, (rate, ch)
            assert out.shape == x.shape, (rate, ch, out.shape)
            assert np.all(np.isfinite(out))
            last = (rate, ch)
        assert last is not None


def test_analog_level_survives_lazy_initialization():
    """set_stream_analog_level before the first (format-driven) init must
    survive it: GainControlImpl keeps analog_capture_level_ across
    Initialize (gain_control_impl.cc:265-275). In adaptive-digital mode
    the recommended level echoes the set level back."""
    import numpy as np
    from webrtc_audio_processing_tpu import config as cfg
    from webrtc_audio_processing_tpu.api import AudioProcessing

    c = cfg.Config().replace(
        gain_controller1=cfg.GainController1(
            enabled=True, mode=cfg.Agc1Mode.ADAPTIVE_DIGITAL,
            analog_gain_controller=cfg.AnalogGainController(enabled=False),
        ),
    )
    apm = AudioProcessing(c)
    frame = np.zeros((80, 1), np.float32)
    apm.set_stream_analog_level(127)
    err, _ = apm.process_stream(frame, 8000)  # 8 kHz: not the default geo
    assert err == 0
    assert apm.recommended_stream_analog_level() == 127


class TestApiMisuseGrid:
    """The reference contract suite's misuse permutations
    (audio_processing_unittest.cc:758-1339) that apply to this API."""

    def test_zero_channels_rejected(self):
        ap = AudioProcessing(cfg_mod.Config())
        err, _ = ap.process_stream(np.zeros((160, 0), np.float32), 16000)
        assert err == kBadNumberChannelsError
        err, _ = ap.process_reverse_stream(np.zeros((160, 0), np.float32),
                                           16000)
        assert err == kBadNumberChannelsError

    @pytest.mark.parametrize("rate", [8000, 12000, 16000, 32000, 44100,
                                      48000, 96000])
    def test_float_rate_sweep(self, rate):
        """SampleRatesInt: every 100-divisible rate is accepted on the
        float interface (audio_processing_unittest.cc:853-860)."""
        ap = AudioProcessing(cfg_mod.Config().replace(
            noise_suppression=cfg_mod.NoiseSuppression(enabled=True)))
        F = rate // 100
        x = RNG.normal(size=(F, 2)).astype(np.float32) * 0.1
        err, out = ap.process_stream(x, rate)
        assert err == kNoError
        assert out.shape == (F, 2)
        assert np.all(np.isfinite(out))

    def test_all_processing_disabled_passthrough_int16(self):
        """NoProcessingWhenAllComponentsDisabledInt
        (audio_processing_unittest.cc:1271-1303): bit-exact passthrough."""
        ap = AudioProcessing(cfg_mod.Config())
        x = (RNG.normal(size=(160, 2)) * 8000).astype(np.int16)
        for _ in range(3):
            err, out = ap.process_stream_int16(x, 16000)
            assert err == kNoError
            np.testing.assert_array_equal(out, x)

    def test_mismatched_forward_channels(self):
        """Output channel count must be 1 or match the input
        (TestChangingForwardChannels expectations)."""
        ap = AudioProcessing(cfg_mod.Config())
        for n in (1, 2, 3, 4):
            x = RNG.normal(size=(160, n)).astype(np.float32) * 0.1
            err, out = ap.process_stream(x, 16000)
            assert err == kNoError
            assert out.shape[1] == n

    def test_stream_delay_warning_codes(self):
        ap = AudioProcessing(cfg_mod.Config())
        assert ap.set_stream_delay_ms(-1) == kBadStreamParameterWarning
        assert ap.set_stream_delay_ms(501) == kBadStreamParameterWarning
        assert ap.stream_delay_ms() == 500
        assert ap.set_stream_delay_ms(250) == kNoError
