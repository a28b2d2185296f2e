"""Differential conformance: this backend vs the compiled reference APM.

Runs the same int16 vectors through both implementations with a chosen
component set and reports per-frame output deviation — the tool for
bisecting which module a full-profile conformance miss comes from.

Usage:
  python tools/diff_vs_ref.py [rate] [frames] [components] [ch] [rev] [delay]
  components: comma list from {aecm,aec,ns,agc1d,agc1a,hpf}, e.g.
  "hpf,ns,aecm,agc1d" (the fixed profile), "hpf,ns,agc1d", "aecm".
  ch/rev: capture/reverse channel counts (default 1/1; 2 = stereo from
  the interleaved conformance PCMs).
  delay: reported stream delay in ms — either a constant ("0", "120") or
  "BASEjJITTER" (e.g. "120j20") for a deterministic pseudo-random walk in
  [BASE-JITTER, BASE+JITTER], exercising the DelayComp/EstBufDelay
  machinery (echo_control_mobile.cc:530-600) beyond the conformance
  matrix's small fixed values.

Requires /tmp/refapm/libapm.so (tools/build_ref_apm.sh).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_RES = "/root/reference/tests/resources"


def build_ours(comps, rate):
    from webrtc_audio_processing_tpu import config as cfg
    from webrtc_audio_processing_tpu.api import AudioProcessing

    c = cfg.Config().replace(
        pipeline=cfg.Pipeline(maximum_internal_processing_rate=48000),
        echo_canceller=cfg.EchoCanceller(
            enabled="aecm" in comps or "aec" in comps,
            mobile_mode="aecm" in comps,
        ),
        gain_controller1=cfg.GainController1(
            enabled="agc1d" in comps or "agc1a" in comps,
            mode=(cfg.Agc1Mode.ADAPTIVE_DIGITAL if "agc1d" in comps
                  else cfg.Agc1Mode.ADAPTIVE_ANALOG),
            analog_gain_controller=cfg.AnalogGainController(enabled=False),
        ),
        noise_suppression=cfg.NoiseSuppression(enabled="ns" in comps),
        high_pass_filter=cfg.HighPassFilter(enabled="hpf" in comps),
    )
    return AudioProcessing(c)


def build_ref(comps):
    import ref_apm

    return ref_apm.RefApm(
        aec="aec" in comps or "aecm" in comps,
        mobile="aecm" in comps,
        ns="ns" in comps,
        agc1="agc1d" in comps or "agc1a" in comps,
        agc1_mode=("adaptive_digital" if "agc1d" in comps
                   else "adaptive_analog"),
        hpf="hpf" in comps,
    )


def main():
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    comps = set((sys.argv[3] if len(sys.argv) > 3
                 else "hpf,ns,aecm,agc1d").split(","))
    ch = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    rev = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    delay_spec = sys.argv[6] if len(sys.argv) > 6 else "0"
    if "j" in delay_spec:
        base, jitter = (int(v) for v in delay_spec.split("j"))
    else:
        base, jitter = int(delay_spec), 0
    rng = np.random.RandomState(1234)
    delays = base + (rng.randint(-jitter, jitter + 1, size=4096)
                     if jitter else np.zeros(4096, np.int64))

    far = np.fromfile(f"{REF_RES}/far{rate // 1000}_stereo.pcm", np.int16)
    near = np.fromfile(f"{REF_RES}/near{rate // 1000}_stereo.pcm", np.int16)
    frame = rate // 100

    def frames_of(pcm, channels):
        n = len(pcm) // (2 * frame)
        x = pcm[: n * 2 * frame].reshape(n, frame, 2)
        if channels == 1:
            return ((x[..., 0].astype(np.int32) + x[..., 1]) >> 1).astype(
                np.int16)[..., None]
        return x

    far_f, near_f = frames_of(far, rev), frames_of(near, ch)
    n_frames = min(n_frames, len(far_f), len(near_f))

    ours = build_ours(comps, rate)
    ref = build_ref(comps)

    lvl_o = lvl_r = 127
    worst = []
    sum_sq = 0.0
    sum_ref_sq = 0.0
    max_o_sum = 0
    max_r_sum = 0
    for k in range(n_frames):
        ours.process_reverse_stream(
            far_f[k].astype(np.float32) / 32768.0, rate)
        ref.process_reverse_i16(far_f[k], rate)
        ours.set_stream_delay_ms(int(delays[k]))
        ref.set_stream_delay_ms(int(delays[k]))
        ours.set_stream_analog_level(lvl_o)
        ref.set_stream_analog_level(lvl_r)
        _, out_o = ours.process_stream_int16(near_f[k], rate)
        _, out_r = ref.process_i16(near_f[k], rate)
        lvl_o = ours.recommended_stream_analog_level()
        lvl_r = ref.recommended_stream_analog_level()
        d = out_o.astype(np.int32) - out_r.astype(np.int32)
        rms = float(np.sqrt(np.mean(d.astype(np.float64) ** 2)))
        sum_sq += float(np.sum(d.astype(np.float64) ** 2))
        sum_ref_sq += float(np.sum(out_r.astype(np.float64) ** 2))
        max_o_sum += int(np.max(np.abs(out_o.astype(np.int32))))
        max_r_sum += int(np.max(np.abs(out_r.astype(np.int32))))
        worst.append((rms, k))
        if k < 5 or (k + 1) % 50 == 0:
            print(f"frame {k:4d}: rms diff {rms:8.2f}  "
                  f"maxabs ours {np.abs(out_o).max():5d} "
                  f"ref {np.abs(out_r).max():5d}  lvl {lvl_o}/{lvl_r}",
                  flush=True)
    worst.sort(reverse=True)
    rel = np.sqrt(sum_sq / max(sum_ref_sq, 1.0))
    print(f"\ncomponents={sorted(comps)} frames={n_frames}")
    print(f"overall relative RMS deviation: {rel:.4f}")
    print(f"max_output_average: ours {max_o_sum // n_frames} "
          f"ref {max_r_sum // n_frames}")
    print("worst frames:", [(round(r, 1), k) for r, k in worst[:8]])


if __name__ == "__main__":
    import ref_apm  # noqa: F401 - fail fast if the oracle is missing

    main()
