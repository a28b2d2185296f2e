"""Per-module bit-exactness against reference-committed vectors.

Ports the reference's hard-coded golden harnesses (tolerance 1/32768,
compare the first samples of the last processed frame — the modules carry
memory so this implicitly checks the preceding frames):

- high_pass_filter_unittest.cc (HighPassFilterAccuracyTest.*)
- gain_control_unittest.cc (GainControlBitExactnessTest.*; the AGC1 core)

The golden arrays are parsed out of the reference unittest sources at test
time (tests/cc_vectors.py), so the numbers stay reference-owned — this
breaks the oracle circularity of the repo-written numpy references.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests import cc_vectors as cv
from webrtc_audio_processing_tpu import config as cfg_mod
from webrtc_audio_processing_tpu.models import high_pass_filter as hpf
from webrtc_audio_processing_tpu.models.agc1 import gain_control as gc1
from webrtc_audio_processing_tpu.ops import splitting

TOL = 1.0 / 32768.0

HPF_TESTS = cv.parse_tests(
    f"{cv.REF}/tests/unit/high_pass_filter_unittest.cc"
)
AGC_CC = f"{cv.REF}/tests/unit/gain_control_unittest.cc"


class TestHighPassFilterGoldens:
    """HighPassFilterAccuracyTest.{MonoInitial,MonoConverged}."""

    def _run(self, name):
        t = HPF_TESTS[name]
        x = t["arrays"]["kReferenceInput"]
        want = t["arrays"]["kReference"]
        frames = x.reshape(-1, 160)
        st = hpf.init_state(1)
        for fr in frames:
            # The module operates in the float_s16 domain; the vectors are
            # [-1, 1] as stored by the AudioBuffer interface.
            st, y = hpf.process(st, jnp.asarray(fr[:, None] * 32768.0), 16000)
        got = np.asarray(y[:, 0]) / 32768.0
        np.testing.assert_allclose(got[: want.size], want, atol=TOL, rtol=0)

    def test_mono_initial(self):
        self._run("MonoInitial")

    def test_mono_converged(self):
        self._run("MonoConverged")

    def test_dc_attenuation(self):
        # DcSignalAtenuation*: >40 dB DC attenuation at every rate.
        for rate in (16000, 32000, 48000):
            st = hpf.init_state(1)
            n = rate // 10
            x = jnp.full((n, 1), 32767.0)
            for _ in range(2):
                st, y = hpf.process(st, x, rate)
            e_in = float(n) * 32767.0**2
            e_out = float(jnp.sum(y**2))
            att_db = 10.0 * np.log10(e_in / e_out)
            assert att_db > 40.0, (rate, att_db)


AGC_MODES = {
    "AdaptiveAnalog": cfg_mod.Agc1Mode.ADAPTIVE_ANALOG,
    "AdaptiveDigital": cfg_mod.Agc1Mode.ADAPTIVE_DIGITAL,
    "FixedDigital": cfg_mod.Agc1Mode.FIXED_DIGITAL,
}


def _read_harness_frames(path, spc, num_channels, num_frames):
    """The reference harness feeds ReadFloatSamplesFromStereoFile's
    *interleaved* output into deinterleaved channel pointers
    (audio_buffer_tools.cc SetupFrame + memcpy): effective channel k is the
    k-th contiguous spc-sized slice of the interleaved data. Reproduced
    verbatim — the goldens were generated with this layout."""
    raw = np.fromfile(path, "<i2", count=spc * 2 * num_frames)
    raw = raw.reshape(-1, 2)[:, :num_channels].astype(np.float32) / 32768.0
    inter = raw.reshape(num_frames, spc * num_channels)
    return inter.reshape(num_frames, num_channels, spc).transpose(0, 2, 1)


def run_agc1_case(rate, num_channels, mode, target_level_dbfs,
                  stream_analog_level, compression_gain_db, enable_limiter,
                  level_min, level_max, want_level, want_output):
    """RunBitExactnessTest (gain_control_unittest.cc:70-137): 100 frames of
    the near/far vectors through the AGC1 core at 1 processing channel
    (the harness AudioBuffers downmix to mono by averaging).

    Faithful quirks: analog mode processes only the first frame (the
    harness sets the stream level once; ProcessCaptureAudio clears
    was_analog_level_set_ each frame, gain_control_impl.cc:199,259, and the
    harness ignores the error), and analysis-stage AddMic/VirtualMic
    modifications never reach the audio path."""
    num_frames = 100
    spc = rate // 100
    ren = _read_harness_frames(cv.render_file(rate), spc, num_channels,
                               num_frames)
    cap = _read_harness_frames(cv.capture_file(rate), spc, num_channels,
                               num_frames)

    from webrtc_audio_processing_tpu.models.agc1 import analog

    # SetupComponent (gain_control_unittest.cc:52-68): the harness sets
    # analog level limits (0, 100) directly on the component — narrower
    # than the APM's fixed 0..255 (audio_processing_impl.cc:2032-2035).
    cfg = analog.LegacyAgcConfig(
        min_level=level_min, max_level=level_max,
        agc_mode=gc1.mode_to_legacy(mode), fs=min(rate, 16000),
        target_level_dbfs=target_level_dbfs,
        compression_gain_db=compression_gain_db,
        limiter_enable=enable_limiter,
    )
    state = gc1.init_state(cfg, 1)
    state = gc1.set_stream_analog_level(state, stream_analog_level)

    num_bands = rate // 16000
    is_analog = mode == cfg_mod.Agc1Mode.ADAPTIVE_ANALOG

    def to_s16(x):
        # FloatS16ToS16 (audio_util.h): round half away from zero.
        return jnp.clip(
            jnp.trunc(x + jnp.copysign(0.5, x)), -32768.0, 32767.0
        ).astype(jnp.int32)

    @jax.jit
    def render_and_analyze(state, split_state, ren_f, cap_f):
        # Downmix by averaging (AudioBuffer proc channels = 1).
        ren_m = jnp.mean(ren_f, axis=-1, keepdims=True) * 32768.0
        cap_m = jnp.mean(cap_f, axis=-1, keepdims=True) * 32768.0
        if num_bands > 1:
            rs, cs = split_state
            ren_b, rs = splitting.analysis(ren_m, rs, num_bands)
            cap_b, cs = splitting.analysis(cap_m, cs, num_bands)
            split_state = (rs, cs)
        else:
            ren_b = ren_m[None]
            cap_b = cap_m[None]
        state = gc1.process_render_audio(cfg, state, to_s16(ren_b[0, :, 0]))
        # Analysis is local: the modified bands never reach the audio path.
        state, _ = gc1.analyze_capture_audio(cfg, state, to_s16(cap_b))
        return state, split_state, cap_b

    @jax.jit
    def process(state, cap_b):
        state, _ = gc1.process_capture_audio(cfg, state, to_s16(cap_b),
                                             False)
        return state, gc1.apply_digital_gain_float(
            gc1.shared_gains(state), cap_b
        )

    @jax.jit
    def merge(split_state, cap_b):
        if num_bands > 1:
            merged, cs2 = splitting.synthesis(cap_b, split_state[1],
                                              num_bands)
            return (split_state[0], cs2), merged
        return split_state, cap_b[0]

    split_state = (splitting.init_state(num_bands, (1,)),
                   splitting.init_state(num_bands, (1,)))
    level_was_set = True
    for f in range(num_frames):
        state, split_state, cap_b = render_and_analyze(
            state, split_state, jnp.asarray(ren[f]), jnp.asarray(cap[f])
        )
        if (not is_analog) or level_was_set:
            state, cap_b = process(state, cap_b)
            level_was_set = False
        split_state, y = merge(split_state, cap_b)

    got = np.asarray(y[:, 0]) / 32768.0
    per_ch = want_output.size // num_channels
    # 1 LSB at 16 kHz (exact vs a compiled current-reference dump). The
    # 32 kHz goldens predate the float QMF rewrite of splitting_filter.c
    # (these tests are DISABLED upstream, webrtc issue 5711); the current
    # reference code, compiled and run over the same vectors, agrees with
    # this implementation to float noise but differs from the committed
    # numbers by ~1.2 LSB — hence 2 LSB there.
    tol = TOL if rate == 16000 else 2.0 * TOL
    # Output channels are duplicates of the mono processing channel.
    for ch in range(num_channels):
        np.testing.assert_allclose(
            got[:per_ch], want_output[ch * per_ch:(ch + 1) * per_ch],
            atol=tol, rtol=0,
        )
    assert int(state.analog_level) == want_level


AGC_CASES = [
    ("Mono16kHz_AdaptiveAnalog_Tl10_SL50_CG5_Lim_AL0_100", 16000, 1,
     "AdaptiveAnalog"),
    ("Stereo16kHz_AdaptiveAnalog_Tl10_SL50_CG5_Lim_AL0_100", 16000, 2,
     "AdaptiveAnalog"),
    ("Mono32kHz_AdaptiveAnalog_Tl10_SL50_CG5_Lim_AL0_100", 32000, 1,
     "AdaptiveAnalog"),
    ("Mono16kHz_AdaptiveDigital_Tl10_SL50_CG5_Lim_AL0_100", 16000, 1,
     "AdaptiveDigital"),
    ("Stereo16kHz_AdaptiveDigital_Tl10_SL50_CG5_Lim_AL0_100", 16000, 2,
     "AdaptiveDigital"),
    ("Mono32kHz_AdaptiveDigital_Tl10_SL50_CG5_Lim_AL0_100", 32000, 1,
     "AdaptiveDigital"),
    ("Mono16kHz_FixedDigital_Tl10_SL50_CG5_Lim_AL0_100", 16000, 1,
     "FixedDigital"),
    ("Stereo16kHz_FixedDigital_Tl10_SL50_CG5_Lim_AL0_100", 16000, 2,
     "FixedDigital"),
]


@pytest.mark.parametrize("suffix,rate,channels,mode",
                         AGC_CASES, ids=[c[0] for c in AGC_CASES])
def test_agc1_bit_exact(suffix, rate, channels, mode):
    tests = cv.parse_tests(AGC_CC)
    name = f"DISABLED_{suffix}"
    if name not in tests:
        pytest.skip(f"{name} not found in reference")
    t = tests[name]
    want_output = t["arrays"]["kOutputReference"]
    want_level = t["scalars"].get("kStreamAnalogLevelReference", 50)
    run_agc1_case(rate, channels, AGC_MODES[mode], 10, 50, 5, True, 0, 100,
                  want_level, want_output)


class TestAecmGolden:
    """echo_control_mobile_bit_exact_unittest.cc — the one enabled test,
    Mono16kHz_LoudSpeakerPhone_CngOn_StreamDelay10 (:181-189).

    The harness drives EchoControlMobileImpl with a fixed 10 ms stream
    delay through the full ECstartup / checkBuffSize / EstBufDelay
    machinery (echo_control_mobile.py mirrors echo_control_mobile.cc):
    frames 0-5 are passthrough (buffer stabilization needs
    counter*nBlocks10ms >= 6), at frame 5 the exit MoveReadPtr leaves
    bufSizeStart=3 x 80-sample buffers (read ptr at abs far sample 720),
    and from frame 6 on the far FIFO is read contiguously at a constant
    240-sample lag (each sub-frame is read BEFORE EstBufDelay runs, so the
    available count it sees is always 240 and delayNew=80 never triggers a
    MoveReadPtr).  Verified per-block bit-exact against an instrumented
    build of the reference core (all internal taps: energies, VAD, step
    size, channel sums, hnl, efw, CNG seed, outCFFT).  Only the last frame
    is compared, as in the reference test (the module carries memory, so
    this implicitly validates all 200 frames).
    """

    def test_mono16k_loudspeaker_cng_delay10(self):
        from webrtc_audio_processing_tpu.models.aecm import (
            echo_control_mobile as ecm,
        )

        want = np.array([-0.002380, -0.002533, -0.002563], np.float32)
        far = cv.read_stereo_pcm_frames(cv.render_file(16000), 160, 1, 200)
        near = cv.read_stereo_pcm_frames(cv.capture_file(16000), 160, 1, 200)
        far_i = np.round(far[:, :, 0] * 32768.0).astype(np.int32)
        near_i = np.round(near[:, :, 0] * 32768.0).astype(np.int32)

        geo = ecm.AecmGeometry(sample_rate_hz=16000, echo_mode=4,
                               cng=True, nlp=True)
        st = ecm.init_state(geo)

        @jax.jit
        def buf(st, f):
            return ecm.buffer_farend(st, f)

        steps = [
            jax.jit(lambda st, n, d, p=p: ecm.process_frame(geo, st, n, p, d))
            for p in range(geo.period)
        ]

        delay_ms = jnp.asarray(10, jnp.int32)
        out = None
        for k in range(200):
            st = buf(st, jnp.asarray(far_i[k]))
            st, out = steps[k % geo.period](
                st, jnp.asarray(near_i[k]), delay_ms
            )
            if k == 5:
                # Startup-exit invariants from the reference trace.
                assert int(st.buf_size_start) == 3
                assert int(st.fifo_read) == 720
                assert not bool(st.ec_startup)
            if k < 6:  # ECstartup passthrough
                np.testing.assert_array_equal(np.asarray(out), near_i[k])
        got = np.asarray(out[:3]).astype(np.float32) / 32768.0
        np.testing.assert_allclose(got, want, atol=TOL, rtol=0)
