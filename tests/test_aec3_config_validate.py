"""EchoCanceller3Config.validate tests (echo_canceller3_config.cc:102-283)."""

import dataclasses
import math

from webrtc_audio_processing_tpu.models.aec3 import config as aec3_config


def _with(cfg, path, value):
    """Frozen-dataclass deep replace along a dotted path."""
    parts = path.split(".")

    def rec(node, parts):
        if len(parts) == 1:
            return dataclasses.replace(node, **{parts[0]: value})
        return dataclasses.replace(
            node, **{parts[0]: rec(getattr(node, parts[0]), parts[1:])}
        )

    return rec(cfg, parts)


def test_default_config_is_valid():
    cfg = aec3_config.EchoCanceller3Config()
    out, ok = aec3_config.validate(cfg)
    assert ok
    assert out == cfg


def test_bad_down_sampling_factor_reset_to_4():
    cfg = _with(aec3_config.EchoCanceller3Config(),
                "delay.down_sampling_factor", 3)
    out, ok = aec3_config.validate(cfg)
    assert not ok
    assert out.delay.down_sampling_factor == 4


def test_out_of_range_fields_are_clamped():
    cfg = aec3_config.EchoCanceller3Config()
    cfg = _with(cfg, "delay.default_delay", 999999)
    cfg = _with(cfg, "delay.delay_estimate_smoothing", 2.5)
    cfg = _with(cfg, "erle.min", -3.0)
    out, ok = aec3_config.validate(cfg)
    assert not ok
    assert out.delay.default_delay == 5000
    assert out.delay.delay_estimate_smoothing == 1.0
    assert out.erle.min >= 1.0


def test_nonfinite_float_becomes_lower_bound():
    cfg = _with(aec3_config.EchoCanceller3Config(),
                "delay.delay_estimate_smoothing", float("nan"))
    out, ok = aec3_config.validate(cfg)
    assert not ok
    assert math.isfinite(out.delay.delay_estimate_smoothing)


def test_initial_filter_not_longer_than_main():
    cfg = aec3_config.EchoCanceller3Config()
    cfg = _with(cfg, "filter.refined.length_blocks", 2)
    out, ok = aec3_config.validate(cfg)
    assert not ok
    assert (out.filter.refined_initial.length_blocks
            <= out.filter.refined.length_blocks)


def test_erle_min_capped_by_maxima():
    cfg = aec3_config.EchoCanceller3Config()
    cfg = _with(cfg, "erle.min", 50.0)  # above max_l/max_h defaults
    out, ok = aec3_config.validate(cfg)
    assert not ok
    assert out.erle.min <= min(out.erle.max_l, out.erle.max_h)


def test_validated_config_is_usable():
    # A clamped config must construct a working geometry.
    from webrtc_audio_processing_tpu.models.aec3 import echo_canceller3 as ec3

    cfg = _with(aec3_config.EchoCanceller3Config(),
                "delay.down_sampling_factor", 7)
    out, ok = aec3_config.validate(cfg)
    assert not ok
    geo = ec3.Aec3Geometry.create(out, 16000, 1, 1)
    st = ec3.init_state(geo)
    assert st is not None
