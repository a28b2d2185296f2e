"""RmsLevel tests ported from tests/unit/rms_level_unittest.cc."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models import rms_level as rms

RATE = 48000
BLOCK = RATE // 100


def _sinusoid(freq_hz, amplitude, n):
    x = amplitude * np.sin(2 * np.pi * np.arange(n) * freq_hz / RATE)
    return np.clip(x, -32768, 32767).astype(np.float32)


def _run(x):
    st = rms.init_state()
    step = jax.jit(rms.analyze)
    for n in range(0, len(x) - BLOCK + 1, BLOCK):
        st = step(st, jnp.asarray(x[n : n + BLOCK]))
    return st


def test_1000hz_full_scale_is_minus3_dbfs():
    st = _run(_sinusoid(1000, 32767, RATE))
    _, avg = rms.average_and_peak(st)
    assert int(avg) == 3  # -3 dBFS


def test_1000hz_full_scale_average_and_peak():
    st = _run(_sinusoid(1000, 32767, RATE))
    _, avg, peak = rms.average_and_peak_with_block_size(st, BLOCK)
    assert int(avg) == 3
    assert int(peak) == 3


def test_1000hz_half_scale_is_minus9_dbfs():
    st = _run(_sinusoid(1000, 32767 // 2, RATE))
    _, avg = rms.average_and_peak(st)
    assert int(avg) == 9


def test_zeros_give_127():
    st = _run(np.zeros(RATE, np.float32))
    _, avg, peak = rms.average_and_peak_with_block_size(st, BLOCK)
    assert int(avg) == 127
    assert int(peak) == 127


def test_no_samples_give_127():
    _, avg = rms.average_and_peak(rms.init_state())
    assert int(avg) == 127


def test_poll_twice_resets():
    st = _run(_sinusoid(1000, 32767, RATE))
    st, avg = rms.average_and_peak(st)
    assert int(avg) == 3
    _, avg2 = rms.average_and_peak(st)
    assert int(avg2) == 127


def test_process_muted_halves_average():
    # 1 s full-scale sinusoid + 1 s muted: the average RMS halves (+3 dB
    # in negated dBFS -> 6). AnalyzeMuted only bumps the sample counter,
    # which analyzing digital silence reproduces exactly.
    x = np.concatenate(
        [_sinusoid(1000, 32767, RATE), np.zeros(RATE, np.float32)]
    )
    st = _run(x)
    _, avg = rms.average_and_peak(st)
    assert int(avg) == 6


def test_only_digital_silence_is_127():
    x = np.zeros(RATE, np.float32)
    st = _run(x)
    _, avg = rms.average_and_peak(st)
    assert int(avg) == 127
    x[0] = 1.0
    st = _run(x)
    _, avg = rms.average_and_peak(st)
    assert int(avg) < 127


def test_peak_tracks_loudest_block():
    # 1 s half-scale, 10 ms full-scale, 1 s half-scale: average stays -9,
    # peak reports -3 (rms_level_unittest.cc RunHalfScaleAndInsertFullScale).
    x = np.concatenate(
        [
            _sinusoid(1000, 32767 // 2, RATE),
            _sinusoid(1000, 32767, BLOCK),
            _sinusoid(1000, 32767 // 2, RATE),
        ]
    )
    st = _run(x)
    _, avg, peak = rms.average_and_peak_with_block_size(st, BLOCK)
    assert int(avg) == 9
    assert int(peak) == 3
