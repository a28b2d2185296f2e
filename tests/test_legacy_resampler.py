"""Legacy int16 Resampler tests.

Mirrors tests/unit/common_audio/resampler/resampler_unittest.cc (the rate
matrix and Push length contract) and adds bit-exact goldens captured from
the reference C kernels (resample_by_2.c / resample_48khz.c / resample.c,
compiled and run directly; the arrays below are their verbatim outputs).
"""

import numpy as np
import pytest

from webrtc_audio_processing_tpu.ops import legacy_resampler as lr

RATES = [8000, 16000, 32000, 44000, 48000, 96000]


def _valid(in_rate, out_rate):
    # resampler_unittest.cc:33-41.
    if in_rate == 44000 and out_rate in (48000, 96000):
        return False
    if out_rate == 44000 and in_rate in (48000, 96000):
        return False
    return True


class TestModeMatrix:
    @pytest.mark.parametrize("ch", [1, 2])
    def test_reset_matrix(self, ch):
        rs = lr.Resampler()
        for fin in RATES:
            for fout in RATES:
                expected = 0 if _valid(fin, fout) else -1
                assert rs.reset(fin, fout, ch) == expected, (fin, fout)

    def test_bad_channel_count(self):
        rs = lr.Resampler()
        assert rs.reset(16000, 48000, 3) == -1

    @pytest.mark.parametrize("ch", [1, 2])
    def test_push_length_matrix(self, ch):
        rs = lr.Resampler()
        for fin in RATES:
            for fout in RATES:
                if not _valid(fin, fout):
                    assert rs.reset_if_needed(fin, fout, ch) == -1
                    continue
                assert rs.reset_if_needed(fin, fout, ch) == 0
                x = np.ones(ch * fin // 100, np.int16)
                rc, out = rs.push(x)
                assert rc == 0, (fin, fout)
                assert len(out) == ch * fout // 100, (fin, fout, len(out))

    def test_reset_if_needed_keeps_state(self):
        rs = lr.Resampler(16000, 32000, 1)
        x = (np.sin(2 * np.pi * 440 / 16000 * np.arange(160)) * 10000).astype(
            np.int16
        )
        _, a = rs.push(x)
        assert rs.reset_if_needed(16000, 32000, 1) == 0
        _, b = rs.push(x)
        # State persisted: the second frame continues the filter history,
        # so it differs from a fresh-state first frame.
        assert not np.array_equal(a, b)


# Golden outputs captured from the reference C kernels (deterministic
# sine inputs; see the module docstring).
G_48TO16_HEAD = [0, 0, 8, 285, 2794, 9968, 16764, 19160, 20004, 16976,
                 11798, 4644, -3197, -10473, -16289, -19461, -19849,
                 -17032, -11803, -4601, 3132, 10549, 16209, 19543]
G_16TO48_HEAD = [0, 0, 0, 0, 0, 0, 0, 0, 2, 4, 9, 20, 54, 159, 444, 1085,
                 2290, 4210, 6827, 9871, 12880, 15363, 17031, 17934]
G_UP2_HEAD = [0, 0, 72, 497, 1770, 4183, 7297, 10050, 11727, 12664, 13657,
              14777, 15308, 14869, 13954, 13064]
G_DOWN2_HEAD = [36, 1376, 7977, 15337, 13040, 5806, -4279, -12642, -14763,
                -10627, -1077, 8444, 14585, 13570, 6753, -3556]
G_22TO16_HEAD = [0, 0, 1, 124, 2208, 10848, 19092, 12045, -759, -12786,
                 -18395, -11902, 215, 13474, 17689, 12570, -823, -12930,
                 -18173, -12141, 443, 13267, 17872, 12410]


class TestBitExactGoldens:
    def test_48_to_16(self):
        x = (np.sin(2 * np.pi * 1000 / 48000 * np.arange(960)) * 20000
             ).astype(np.int16)
        st = lr._ChainState()
        out = np.concatenate(
            [lr.resample_48to16(x[:480], st), lr.resample_48to16(x[480:], st)]
        )
        np.testing.assert_array_equal(out[:24], G_48TO16_HEAD)
        assert int(out.astype(np.int64).sum()) == 52974
        assert int(np.abs(out.astype(np.int64)).sum()) == 4055202

    def test_16_to_48(self):
        x = (np.sin(2 * np.pi * 1000 / 16000 * np.arange(320)) * 20000
             ).astype(np.int16)
        st = lr._ChainState()
        out = np.concatenate(
            [lr.resample_16to48(x[:160], st), lr.resample_16to48(x[160:], st)]
        )
        np.testing.assert_array_equal(out[:24], G_16TO48_HEAD)
        assert int(out.astype(np.int64).sum()) == 214978
        assert int(np.abs(out.astype(np.int64)).sum()) == 12016144

    def test_upsample_by2(self):
        x = (np.sin(2 * np.pi * 440 / 8000 * np.arange(160)) * 15000
             ).astype(np.int16)
        out = lr.upsample_by2(x, [0] * 8)
        np.testing.assert_array_equal(out[:16], G_UP2_HEAD)
        assert int(out.astype(np.int64).sum()) == 111048
        assert int(np.abs(out.astype(np.int64)).sum()) == 3012648

    def test_downsample_by2(self):
        x = (np.sin(2 * np.pi * 440 / 8000 * np.arange(160)) * 15000
             ).astype(np.int16)
        out = lr.downsample_by2(x, [0] * 8)
        np.testing.assert_array_equal(out[:16], G_DOWN2_HEAD)
        assert int(out.astype(np.int64).sum()) == 36442
        assert int(np.abs(out.astype(np.int64)).sum()) == 745746

    def test_22_to_16(self):
        x = (np.sin(2 * np.pi * 2000 / 22000 * np.arange(440)) * 18000
             ).astype(np.int16)
        st = lr._ChainState()
        out = np.concatenate(
            [lr.resample_22to16(x[:220], st), lr.resample_22to16(x[220:], st)]
        )
        np.testing.assert_array_equal(out[:24], G_22TO16_HEAD)
        assert int(out.astype(np.int64).sum()) == 44276
        assert int(np.abs(out.astype(np.int64)).sum()) == 3477618


class TestSignalFidelity:
    def test_tone_survives_16_to_48(self):
        rs = lr.Resampler(16000, 48000, 1)
        n = 1600
        x = (np.sin(2 * np.pi * 1000 / 16000 * np.arange(n)) * 16000
             ).astype(np.int16)
        _, out = rs.push(x)
        assert len(out) == 3 * n
        # Skip the filter warm-up, compare RMS.
        a = out[480:].astype(np.float64)
        rms_in = np.sqrt(np.mean((x.astype(np.float64)) ** 2))
        rms_out = np.sqrt(np.mean(a**2))
        assert abs(rms_out - rms_in) / rms_in < 0.05
        # Dominant frequency preserved at the new rate.
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        f_peak = np.argmax(spec) * 48000 / len(a)
        assert abs(f_peak - 1000.0) < 30.0, f_peak

    def test_stereo_channels_independent(self):
        rs = lr.Resampler(16000, 32000, 2)
        n = 320
        left = (np.sin(2 * np.pi * 500 / 16000 * np.arange(n)) * 12000
                ).astype(np.int16)
        interleaved = np.zeros(2 * n, np.int16)
        interleaved[0::2] = left  # right channel silent
        rc, out = rs.push(interleaved)
        assert rc == 0 and len(out) == 4 * n
        assert np.abs(out[1::2]).max() == 0  # silence stays silent
        assert np.abs(out[0::2]).max() > 8000
