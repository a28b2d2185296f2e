"""Runs the full ApmTest.Process conformance matrix and reports pass/fail
at the reference's own tolerances (audio_processing_unittest.cc:1812-1861:
analog level +-1, max output +-7 absolute on non-bit-exact platforms).

Usage: python tools/run_conformance_matrix.py [out.json] [max_frames] [profile]

profile "float" (default) runs the 16-config float matrix vs
output_data_float.pb; "fixed" runs the 12-config mobile matrix (AECM +
AGC1 adaptive-digital, 8/16/32 kHz) vs output_data_fixed.pb AND — when
/tmp/refapm/libapm.so exists (tools/build_ref_apm.sh) — vs the
locally-compiled reference APM. output_data_fixed.pb records the
reference's ANDROID (ARM) build numerics (WEBRTC_AUDIOPROC_FIXED_PROFILE
is only defined there), so the oracle columns are the authoritative
fixed-profile bar on this platform.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from apm_conformance import golden_for, run_config  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/conformance_matrix.json"
    max_frames = int(sys.argv[2]) if len(sys.argv) > 2 else None
    profile = sys.argv[3] if len(sys.argv) > 3 else "float"
    rates = (8000, 16000, 32000) if profile == "fixed" \
        else (8000, 16000, 32000, 48000)
    results = []
    for rate in rates:
        for ch in (1, 2):
            for rev in (1, 2):
                t0 = time.time()
                try:
                    import apm_conformance
                    import ref_apm
                    with_oracle = (profile == "fixed"
                                   and ref_apm.available())
                    res = run_config(rate, ch, rev, max_frames=max_frames,
                                     profile=profile,
                                     with_oracle=with_oracle)
                    g = golden_for(rate, ch, rev, profile=profile)
                    row = dict(
                        rate=rate, ch=ch, rev=rev, frames=res["frames"],
                        analog=res["analog_level_average"],
                        analog_golden=g.analog_level_average,
                        max_out=res["max_output_average"],
                        max_out_golden=g.max_output_average,
                        analog_ok=abs(res["analog_level_average"]
                                      - g.analog_level_average) <= 1,
                        max_out_ok=abs(res["max_output_average"]
                                       - g.max_output_average) <= 7,
                        secs=round(time.time() - t0, 1),
                    )
                    if with_oracle:
                        row.update(
                            analog_oracle=res[
                                "oracle_analog_level_average"],
                            max_out_oracle=res[
                                "oracle_max_output_average"],
                            rel_rms_vs_oracle=round(
                                res["rel_rms_vs_oracle"], 5),
                            analog_oracle_ok=abs(
                                res["analog_level_average"]
                                - res["oracle_analog_level_average"]) <= 1,
                            max_out_oracle_ok=abs(
                                res["max_output_average"]
                                - res["oracle_max_output_average"]) <= 7,
                        )
                        if (not row["max_out_oracle_ok"]
                                and rate == 16000 and ch == 2 and rev == 2):
                            # Self-explaining fail: re-derive the
                            # reference-side bistability evidence (the
                            # NS->AECM cascade has two attractors under
                            # +-1 LSB dither; tools/aecm_bistability.py)
                            # so the row reads as explained-fail.
                            import aecm_bistability
                            row.update(aecm_bistability.evidence())
                except Exception as e:  # keep going; record the failure
                    row = dict(rate=rate, ch=ch, rev=rev,
                               error=f"{type(e).__name__}: {e}",
                               secs=round(time.time() - t0, 1))
                results.append(row)
                print(json.dumps(row), flush=True)
                with open(out_path, "w") as f:
                    json.dump(results, f, indent=1)
    n_ok = sum(1 for r in results
               if r.get("analog_ok") and r.get("max_out_ok"))
    print(f"PASS {n_ok}/{len(results)} at reference tolerances")
    if any("max_out_oracle_ok" in r for r in results):
        n_ok = sum(1 for r in results
                   if r.get("analog_oracle_ok")
                   and r.get("max_out_oracle_ok"))
        print(f"PASS {n_ok}/{len(results)} vs the compiled reference "
              "oracle (authoritative for the fixed/Android profile)")


if __name__ == "__main__":
    main()
