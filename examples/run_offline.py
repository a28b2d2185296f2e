#!/usr/bin/env python
"""Offline APM runner: near/far WAV pair -> processed WAV.

The TPU-native analog of the reference's examples/run-offline tool: feeds
paired 10 ms frames through the full AudioProcessing pipeline (AEC3 + NS +
AGC2 by default) and writes the processed capture to a WAV file.

Usage:
  python examples/run_offline.py near.wav out.wav [--far far.wav]
      [--rate-override HZ] [--no-aec] [--no-ns] [--no-agc2] [--aecm]
      [--stream-delay-ms N] [--dump dump.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("near", help="capture (near-end) WAV")
    ap.add_argument("out", help="output WAV")
    ap.add_argument("--far", help="render (far-end) WAV for echo control")
    ap.add_argument("--no-aec", action="store_true")
    ap.add_argument("--no-ns", action="store_true")
    ap.add_argument("--no-agc2", action="store_true")
    ap.add_argument("--aecm", action="store_true",
                    help="use the mobile echo controller")
    ap.add_argument("--stream-delay-ms", type=int, default=0)
    ap.add_argument("--dump", help="record an AecDump to this .npz path")
    args = ap.parse_args()

    from webrtc_audio_processing_tpu import config as cfg_mod
    from webrtc_audio_processing_tpu.api import AudioProcessing
    from webrtc_audio_processing_tpu.utils import wav_io

    near, fs = wav_io.read_wav(args.near)
    near = np.atleast_2d(np.asarray(near))
    if near.ndim == 1:
        near = near[:, None]
    if near.shape[0] < near.shape[1]:
        near = near.T
    far = None
    if args.far:
        far, far_fs = wav_io.read_wav(args.far)
        far = np.asarray(far).reshape(near.shape[0], -1) if False else (
            np.asarray(far)
        )
        if far.ndim == 1:
            far = far[:, None]
        if far.shape[0] < far.shape[1]:
            far = far.T
        assert far_fs == fs, "near/far sample rates must match"

    c = cfg_mod.Config().replace(
        echo_canceller=cfg_mod.EchoCanceller(
            enabled=not args.no_aec and far is not None,
            mobile_mode=args.aecm,
        ),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=not args.no_ns),
        gain_controller2=cfg_mod.GainController2(
            enabled=not args.no_agc2,
            adaptive_digital=cfg_mod.AdaptiveDigital(
                enabled=not args.no_agc2
            ),
        ),
    )
    apm = AudioProcessing(c)
    apm.set_stream_delay_ms(args.stream_delay_ms)
    if args.dump:
        apm.attach_aec_dump(args.dump)

    frame = fs // 100
    n_frames = near.shape[0] // frame
    outs = []
    t0 = time.time()
    for k in range(n_frames):
        if far is not None:
            apm.process_reverse_stream(
                far[k * frame : (k + 1) * frame], fs
            )
        err, out = apm.process_stream(
            near[k * frame : (k + 1) * frame], fs
        )
        if err != 0:
            print(f"frame {k}: error {err}", file=sys.stderr)
            return 1
        outs.append(out)
    dt = time.time() - t0

    if args.dump:
        apm.detach_aec_dump()
    y = np.concatenate(outs)
    wav_io.write_wav(args.out, y.astype(np.float32), fs)
    stats = apm.get_statistics() if hasattr(apm, "get_statistics") else {}
    print(f"processed {n_frames} frames ({n_frames / 100.0:.1f} s audio) "
          f"in {dt:.1f}s -> {args.out}")
    if stats:
        for k_, v in sorted(vars(stats).items() if not isinstance(
                stats, dict) else stats.items()):
            if v is not None:
                print(f"  {k_}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
