"""Evidence: the 16 kHz 2-capture/2-reverse fixed-profile config is
bistable in the reference itself.

The one conformance row that misses the compiled-oracle bar
(CONFORMANCE_FIXED: 16 kHz ch=2 rev=2, ours max_output_average ~1937 vs
oracle ~1987) traces to the NS->AECM hand-off: the compiled reference's
AECM, fed the reference's own NS output int16 stream with +-1 LSB dither
on ~1.5% of samples (the measured magnitude of our float-NS rounding
differences — unbiased, max |d| = 1 in the sensitive window), lands on
one of TWO attractors: max_output_average ~1007 or ~985-986 over 700
frames of the {ns,aecm} sub-profile (delta ~22, far beyond the oracle
bar's +-7). Our implementation deterministically lands in the second
basin; the reference in the first. No non-bit-exact float NS can
guarantee the basin, so the oracle bar is not meaningful for this row.

Run: python tools/aecm_bistability.py   (requires /tmp/refapm/libapm.so)
Expected output: the unperturbed max_out and per-seed values showing
both attractors among seeds 0..5.

Reference pointers: modules/audio_processing/aecm/aecm_core_c.cc
(supGain/Q-domain decisions that gate the attractors),
audio_processing_impl.cc:1393-1405 (NS before AECM in the mobile branch).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_RES = "/root/reference/tests/resources"


def evidence(n_seeds: int = 6, n_frames: int = 700) -> dict:
    """Re-derives the bistability evidence (nothing hard-coded): runs the
    compiled reference's own NS->AECM cascade with +-1 LSB dither on ~1.5%
    of samples across seeds and reports the attractor set. Returns a dict
    suitable for embedding in the conformance-matrix row:
    {bistable_reference, attractors, attractor_spread, unperturbed}."""
    import diff_vs_ref as dvr
    from aecm_probe import RefAecm

    far = np.fromfile(f"{REF_RES}/far16_stereo.pcm", np.int16)
    near = np.fromfile(f"{REF_RES}/near16_stereo.pcm", np.int16)
    frame = 160

    def stereo(pcm):
        n = len(pcm) // (2 * frame)
        return pcm[: n * 2 * frame].reshape(n, frame, 2)

    far_f, near_f = stereo(far), stereo(near)
    n_frames = min(n_frames, len(far_f), len(near_f))

    # The reference's own NS output (the exact int16 stream its AECM
    # consumes in the {ns,aecm} profile) and the bit-exact far path
    # (mono average downmix, FloatS16ToS16).
    refns = dvr.build_ref({"ns"})
    nears, fars = [], []
    for k in range(n_frames):
        refns.process_reverse_i16(far_f[k], 16000)
        refns.set_stream_delay_ms(0)
        refns.set_stream_analog_level(127)
        _, nns = refns.process_i16(near_f[k], 16000)
        nears.append(nns.copy())
        f = far_f[k].astype(np.float32) / 32768.0
        avg = (f[:, 0] + f[:, 1]) * 0.5 * 32768.0
        fars.append(np.trunc(avg + np.copysign(0.5, avg)).astype(np.int16))

    def run(perturb: bool, seed: int = 0) -> int:
        rng = np.random.RandomState(seed)
        insts = [RefAecm(16000, cng=False) for _ in range(2)]
        m = 0
        for k in range(n_frames):
            outs = []
            for c in range(2):
                insts[c].buffer_farend(fars[k])
                x = nears[k][:, c].astype(np.int32)
                if perturb:
                    mask = rng.rand(frame) < 0.015
                    x = np.clip(x + mask * rng.choice([-1, 1], frame),
                                -32768, 32767)
                outs.append(insts[c].process(
                    np.ascontiguousarray(x.astype(np.int16)), 0))
            m += int(max(np.max(np.abs(o)) for o in outs))
        return m // n_frames

    base = run(False)
    seen = {base}
    per_seed = []
    for seed in range(n_seeds):
        r = run(True, seed)
        seen.add(r)
        per_seed.append(r)
    lo, hi = min(seen), max(seen)
    return dict(
        bistable_reference=bool(hi - lo > 7),
        unperturbed=int(base),
        attractors=sorted(int(v) for v in seen),
        attractor_spread=int(hi - lo),
        per_seed=per_seed,
        n_frames=int(n_frames),
    )


def main():
    ev = evidence()
    print(f"unperturbed reference max_output_average: {ev['unperturbed']}")
    for seed, r in enumerate(ev["per_seed"]):
        print(f"seed {seed}: max_output_average {r} "
              f"(delta {r - ev['unperturbed']:+d})")
    print(f"\nattractor spread: {ev['attractor_spread']} "
          f"({'BISTABLE — oracle +-7 bar not meaningful' if ev['bistable_reference'] else 'stable'})")


if __name__ == "__main__":
    main()
