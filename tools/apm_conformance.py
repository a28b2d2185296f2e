"""ApmTest.Process conformance harness against the reference goldens.

Replicates tests/unit/audio_processing_unittest.cc:1698-1875: all
components on (EnableAllAPComponents, :132-154 float profile — AEC3,
AGC1 adaptive-analog with the hybrid analog controller disabled, NS, HPF),
the standard far/near stereo PCM vectors, per-second echo metrics and
whole-run analog-level / max-output averages, compared against
tests/resources/audio_processing/output_data_float.pb.

The reference relaxes bit-exactness per platform (separate AVX2/mac/arm64
golden files); this backend documents its own tolerances per metric.

Usage: python tools/apm_conformance.py [rate] [channels] [reverse_channels]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_RES = "/root/reference/tests/resources"


def run_config(sample_rate: int, num_channels: int, num_reverse: int,
               max_frames: int | None = None, profile: str = "float",
               with_oracle: bool = False):
    """Runs one ApmTest.Process configuration. Returns a result dict.

    profile="float": EnableAllAPComponents float profile (AEC3, AGC1
    adaptive-analog) vs output_data_float.pb.
    profile="fixed": the WEBRTC_AUDIOPROC_FIXED_PROFILE build (AECM
    mobile echo control + AGC1 adaptive-digital,
    audio_processing_unittest.cc:135-141) vs output_data_fixed.pb —
    no echo metrics are recorded in that profile (:1801 FLOAT_PROFILE
    guard). NOTE: WEBRTC_AUDIOPROC_FIXED_PROFILE is the reference's
    Android build (webrtc/BUILD.gn), so output_data_fixed.pb records an
    ARM build's numerics — not reproducible bit-for-bit by any x86 build
    of the reference either. `with_oracle=True` therefore also drives the
    locally-compiled reference APM (tools/ref_apm.py) on the same frames
    and reports its averages + our per-sample deviation from it; the
    oracle comparison is the authoritative fixed-profile bar.
    """
    from webrtc_audio_processing_tpu import config as cfg
    from webrtc_audio_processing_tpu.api import AudioProcessing

    far = np.fromfile(f"{REF_RES}/far{sample_rate // 1000}_stereo.pcm",
                      np.int16)
    near = np.fromfile(f"{REF_RES}/near{sample_rate // 1000}_stereo.pcm",
                       np.int16)
    frame = sample_rate // 100

    def frames_of(pcm, channels):
        # Files are interleaved stereo (ReadFrame,
        # audio_processing_unittest.cc:532-554); mono mixes L/R with the
        # reference's (l + r) >> 1.
        n = len(pcm) // (2 * frame)
        x = pcm[: n * 2 * frame].reshape(n, frame, 2)
        if channels == 1:
            mixed = (
                (x[..., 0].astype(np.int32) + x[..., 1]) >> 1
            ).astype(np.int16)
            return mixed[..., None]
        return x

    far_f = frames_of(far, num_reverse)
    near_f = frames_of(near, num_channels)
    n_frames = min(len(far_f), len(near_f))
    if max_frames:
        n_frames = min(n_frames, max_frames)

    mobile = profile == "fixed"
    c = cfg.Config().replace(
        # EnableAllAPComponents sets the internal-rate cap to 48000
        # (audio_processing_unittest.cc:152).
        pipeline=cfg.Pipeline(maximum_internal_processing_rate=48000),
        echo_canceller=cfg.EchoCanceller(enabled=True, mobile_mode=mobile),
        gain_controller1=cfg.GainController1(
            enabled=True,
            mode=(cfg.Agc1Mode.ADAPTIVE_DIGITAL if mobile
                  else cfg.Agc1Mode.ADAPTIVE_ANALOG),
            analog_gain_controller=cfg.AnalogGainController(enabled=False),
        ),
        noise_suppression=cfg.NoiseSuppression(enabled=True),
        high_pass_filter=cfg.HighPassFilter(enabled=True),
    )
    apm = AudioProcessing(c)

    oracle = None
    if with_oracle:
        import ref_apm

        assert ref_apm.available(), "build tools/build_ref_apm.sh first"
        oracle = ref_apm.RefApm(
            aec=True, mobile=mobile, ns=True,
            agc1=True,
            agc1_mode="adaptive_digital" if mobile else "adaptive_analog",
            hpf=True,
        )

    analog_level = 127
    analog_sum = 0
    max_out_sum = 0
    ref_analog_level = 127
    ref_analog_sum = 0
    ref_max_out_sum = 0
    diff_sq = 0.0
    ref_sq = 0.0
    echo_metrics = []
    for k in range(n_frames):
        err, _ = apm.process_reverse_stream(
            far_f[k].astype(np.float32) / 32768.0, sample_rate
        )
        assert err == 0, err
        apm.set_stream_delay_ms(0)
        apm.set_stream_analog_level(analog_level)
        err, out16 = apm.process_stream_int16(near_f[k], sample_rate)
        assert err == 0, err
        if oracle is not None:
            oracle.process_reverse_i16(far_f[k], sample_rate)
            oracle.set_stream_delay_ms(0)
            oracle.set_stream_analog_level(ref_analog_level)
            _, ref16 = oracle.process_i16(near_f[k], sample_rate)
            ref_analog_level = oracle.recommended_stream_analog_level()
            ref_analog_sum += ref_analog_level
            ref_max_out_sum += int(np.max(np.abs(ref16.astype(np.int32))))
            d = out16.astype(np.float64) - ref16.astype(np.float64)
            diff_sq += float(np.sum(d * d))
            ref_sq += float(np.sum(ref16.astype(np.float64) ** 2))
        max_out_sum += int(np.max(np.abs(out16.astype(np.int32))))
        analog_level = apm.recommended_stream_analog_level()
        analog_sum += analog_level
        if (k + 1) % 100 == 0:
            s = apm.get_statistics()
            echo_metrics.append(dict(
                echo_return_loss=s.echo_return_loss,
                echo_return_loss_enhancement=(
                    s.echo_return_loss_enhancement),
                residual_echo_likelihood=s.residual_echo_likelihood,
                residual_echo_likelihood_recent_max=(
                    s.residual_echo_likelihood_recent_max),
            ))
    res = dict(
        frames=n_frames,
        analog_level_average=analog_sum // n_frames,
        max_output_average=max_out_sum // n_frames,
        echo_metrics=echo_metrics,
    )
    if oracle is not None:
        res.update(
            oracle_analog_level_average=ref_analog_sum // n_frames,
            oracle_max_output_average=ref_max_out_sum // n_frames,
            rel_rms_vs_oracle=float(
                np.sqrt(diff_sq / max(ref_sq, 1.0))
            ),
        )
    return res


def golden_for(sample_rate, num_channels, num_reverse, profile="float"):
    from webrtc_audio_processing_tpu.utils import apm_golden

    tests = apm_golden.read_output_data(
        f"{REF_RES}/audio_processing/output_data_{profile}.pb"
    )
    for t in tests:
        if (t.sample_rate == sample_rate
                and t.num_input_channels == num_channels
                and t.num_reverse_channels == num_reverse
                and not t.use_aec_extended_filter):
            return t
    raise KeyError((sample_rate, num_channels, num_reverse))


def main():
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    ch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rev = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    profile = sys.argv[4] if len(sys.argv) > 4 else "float"
    res = run_config(rate, ch, rev, profile=profile)
    g = golden_for(rate, ch, rev, profile=profile)
    print(f"config rate={rate} ch={ch} rev={rev} frames={res['frames']}")
    print(f"analog_level_average: got {res['analog_level_average']} "
          f"golden {g.analog_level_average}")
    print(f"max_output_average:   got {res['max_output_average']} "
          f"golden {g.max_output_average}")
    for i, (m, gm) in enumerate(zip(res["echo_metrics"], g.echo_metrics)):
        print(f"  [{i}] erl got {m['echo_return_loss']:.2f} vs "
              f"{gm.echo_return_loss:.2f} | erle "
              f"{m['echo_return_loss_enhancement']:.2f} vs "
              f"{gm.echo_return_loss_enhancement:.2f} | rel "
              f"{m['residual_echo_likelihood']:.3f} vs "
              f"{gm.residual_echo_likelihood:.3f}")


if __name__ == "__main__":
    main()
