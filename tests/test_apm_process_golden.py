"""ApmTest.Process conformance against the reference protobuf goldens.

Reference: tests/unit/audio_processing_unittest.cc:1698-1875 with
tests/resources/audio_processing/output_data_float.pb. The reference
already relaxes bit-exactness per platform (separate AVX2/mac/arm64 golden
files); the tolerances here are this backend's documented equivalents:

  analog_level_average   +-1   (the reference's kIntNear)
  max_output_average     +-7 absolute (the reference's kMaxOutputAverageNear)
  echo_return_loss       +-3 dB per 1 s window once reported (>-30)
  residual_echo_likelihood +-0.05 per window

CI runs the 16 kHz mono configuration and the 48 kHz stereo north-star
configuration (each costs minutes of single-core CPU);
tools/apm_conformance.py sweeps the full 16-configuration matrix —
CONFORMANCE_r02.json records a full pass at these tolerances.
"""

import os

import numpy as np
import pytest

RES = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{RES}/audio_processing/output_data_float.pb"),
    reason="reference goldens not available",
)


def test_process_golden_16k_mono():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.apm_conformance import golden_for, run_config

    res = run_config(16000, 1, 1)
    g = golden_for(16000, 1, 1)

    assert abs(res["analog_level_average"] - g.analog_level_average) <= 1, (
        res["analog_level_average"], g.analog_level_average)
    assert abs(res["max_output_average"] - g.max_output_average) <= 7, (
        res["max_output_average"], g.max_output_average)

    for i, (m, gm) in enumerate(zip(res["echo_metrics"], g.echo_metrics)):
        if gm.echo_return_loss > -30.0:
            assert m["echo_return_loss"] is not None, i
            assert abs(m["echo_return_loss"] - gm.echo_return_loss) < 3.0, (
                i, m["echo_return_loss"], gm.echo_return_loss)
        rel = m["residual_echo_likelihood"]
        assert rel is not None and abs(
            rel - gm.residual_echo_likelihood
        ) < 0.05, (i, rel, gm.residual_echo_likelihood)


def test_process_golden_48k_stereo():
    """The north-star configuration (48 kHz, 2 capture, 2 reverse) at the
    reference's own tolerances."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.apm_conformance import golden_for, run_config

    res = run_config(48000, 2, 2)
    g = golden_for(48000, 2, 2)

    assert abs(res["analog_level_average"] - g.analog_level_average) <= 1, (
        res["analog_level_average"], g.analog_level_average)
    assert abs(res["max_output_average"] - g.max_output_average) <= 7, (
        res["max_output_average"], g.max_output_average)
