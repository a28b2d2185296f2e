"""Pure-numpy sequential models of the reference DSP loops.

These mirror the C++ sample loops (independently re-derived from the math in
the reference sources, cited per function) and serve as oracles for the
TPU-native associative-scan implementations.
"""

from __future__ import annotations

import numpy as np

QMF_COEF_1 = np.array([0.0979309082, 0.5643005371, 0.8737335205], np.float32)
QMF_COEF_2 = np.array([0.32551574707, 0.74862670898, 0.96145629882], np.float32)


def biquad_cascade(b, a, x, x_state=None, y_state=None):
    """Direct-form-1 cascade, per-sample (cascaded_biquad_filter.cc:58-84)."""
    b = np.asarray(b, np.float32)
    a = np.asarray(a, np.float32)
    y = np.asarray(x, np.float32).copy()
    n_sec = b.shape[0]
    if x_state is None:
        x_state = np.zeros((n_sec, 2), np.float32)
        y_state = np.zeros((n_sec, 2), np.float32)
    for k in range(n_sec):
        x1, x2 = x_state[k]
        y1, y2 = y_state[k]
        sig = y
        out = np.empty_like(sig)
        for i in range(len(sig)):
            xi = sig[i]
            yi = b[k, 0] * xi + b[k, 1] * x1 + b[k, 2] * x2 - a[k, 0] * y1 - a[k, 1] * y2
            x2, x1 = x1, xi
            y2, y1 = y1, yi
            out[i] = yi
        x_state[k] = (x1, x2)
        y_state[k] = (y1, y2)
        y = out
    return y, x_state, y_state


def allpass_qmf(x, coefs, state):
    """Three cascaded first-order all-pass (splitting_filter.c:47-131).

    state: (6,) = (x[-1], y[-1]) per section flattened like the reference's
    filter_state layout.
    """
    x = np.asarray(x, np.float32).copy()
    out = np.empty_like(x)
    for sec in range(3):
        a = np.float32(coefs[sec])
        xp = state[2 * sec]
        yp = state[2 * sec + 1]
        for i in range(len(x)):
            diff = x[i] - yp
            y = xp + a * diff
            xp = x[i]
            yp = y
            out[i] = y
        state[2 * sec] = xp
        state[2 * sec + 1] = yp
        x = out.copy()
    return out, state


def analysis_qmf(x, state1, state2):
    """WebRtcSpl_AnalysisQMF (splitting_filter.c:134-167)."""
    even = np.asarray(x[0::2], np.float32)
    odd = np.asarray(x[1::2], np.float32)
    f1, state1 = allpass_qmf(odd, QMF_COEF_1, state1)
    f2, state2 = allpass_qmf(even, QMF_COEF_2, state2)
    low = (f1 + f2) * np.float32(0.5)
    high = (f1 - f2) * np.float32(0.5)
    return low, high, state1, state2


def synthesis_qmf(low, high, state1, state2):
    """WebRtcSpl_SynthesisQMF (splitting_filter.c:169-204)."""
    s = np.asarray(low, np.float32) + np.asarray(high, np.float32)
    d = np.asarray(low, np.float32) - np.asarray(high, np.float32)
    f1, state1 = allpass_qmf(s, QMF_COEF_2, state1)
    f2, state2 = allpass_qmf(d, QMF_COEF_1, state2)
    out = np.empty(2 * len(low), np.float32)
    out[0::2] = np.clip(f2, -32768.0, 32767.0)
    out[1::2] = np.clip(f1, -32768.0, 32767.0)
    return out, state1, state2


class SincResamplerSim:
    """Behavioral simulator of SincResampler + PushSincResampler.

    Mirrors the buffer-region state machine of sinc_resampler.cc:283-357 and
    the push priming of push_sinc_resampler.cc:50-80 so the TPU static-plan
    implementation can be validated frame-by-frame.
    """

    KERNEL_SIZE = 32
    OFFSETS = 32

    def __init__(self, source_frames, dest_frames):
        from webrtc_audio_processing_tpu.ops.resampler import make_kernel_bank

        self.s = source_frames
        self.d = dest_frames
        self.ratio = source_frames / dest_frames
        self.bank = make_kernel_bank(self.ratio).astype(np.float64)
        k = self.KERNEL_SIZE
        self.buffer = np.zeros(source_frames + k, np.float32)
        self.r0_off = k // 2
        self.block = source_frames - k // 2
        self.virtual = 0.0
        self.primed = False
        self.first_pass = True
        self.cb_first = True
        self.pending = None

    def _run_cb(self):
        dst = np.zeros(self.s, np.float32)
        if self.cb_first:
            # PushSincResampler::Run first pass: dummy zeros, source kept
            # (push_sinc_resampler.cc:88-95).
            self.cb_first = False
        elif self.pending is not None:
            dst[:] = self.pending
            self.pending = None
        self.buffer[self.r0_off : self.r0_off + self.s] = dst

    def _resample(self, frames):
        out = np.empty(frames, np.float64)
        n = 0
        if not self.primed and frames:
            self._run_cb()
            self.primed = True
        while n < frames:
            i = int(np.ceil((self.block - self.virtual) / self.ratio))
            for _ in range(max(i, 0)):
                src = int(self.virtual)
                rem = self.virtual - src
                voff = rem * self.OFFSETS
                oidx = int(voff)
                f = voff - oidx
                win = self.buffer[src : src + self.KERNEL_SIZE].astype(np.float64)
                s1 = float(np.sum(win * self.bank[oidx]))
                s2 = float(np.sum(win * self.bank[oidx + 1]))
                out[n] = (1.0 - f) * s1 + f * s2
                self.virtual += self.ratio
                n += 1
                if n == frames:
                    return out
            self.virtual -= self.block
            k = self.KERNEL_SIZE
            r3 = self.r0_off + self.s - k
            self.buffer[0:k] = self.buffer[r3 : r3 + k]
            if self.r0_off == k // 2:
                self.r0_off = k
                self.block = self.s
            self._run_cb()
        return out

    def push(self, frame):
        """PushSincResampler::Resample (push_sinc_resampler.cc:50-80)."""
        assert len(frame) == self.s
        self.pending = np.asarray(frame, np.float32)
        if self.first_pass:
            chunk = int(self.block / self.ratio)
            self._resample(chunk)
            # first_pass dummy: pending consumed as zeros
            self.first_pass = False
        return self._resample(self.d).astype(np.float32)


class ThreeBandFilterBankSim:
    """Loop-level model of ThreeBandFilterBank (three_band_filter_bank.cc)."""

    def __init__(self):
        from webrtc_audio_processing_tpu.ops.three_band import (
            FILTER_COEFFS,
            DCT_MODULATION,
            MEMORY_SIZE,
            NUM_NON_ZERO,
        )

        self.coeffs = FILTER_COEFFS
        self.dct = DCT_MODULATION
        self.mem = MEMORY_SIZE
        self.state_a = np.zeros((NUM_NON_ZERO, MEMORY_SIZE), np.float32)
        self.state_s = np.zeros((NUM_NON_ZERO, MEMORY_SIZE), np.float32)

    @staticmethod
    def _filter_core(filt, x, in_shift, state):
        mem = 15
        out = np.zeros(160, np.float32)
        u = np.concatenate([state, x])
        for k in range(160):
            for i in range(4):
                j = mem + k - in_shift - 4 * i
                out[k] += u[j] * filt[i]
        state[:] = x[-mem:]
        return out

    @staticmethod
    def _filter_index(index):
        return index if index < 3 else (index - 1 if index < 9 else index - 2)

    def analysis(self, x):
        out = np.zeros((3, 160), np.float32)
        for ds in range(3):
            in_sub = np.asarray(x[2 - ds :: 3], np.float32).copy()
            for shift in range(4):
                index = ds + shift * 3
                if index in (3, 9):
                    continue
                fi = self._filter_index(index)
                filt = self._filter_core(self.coeffs[fi], in_sub, shift, self.state_a[fi])
                for band in range(3):
                    out[band] += self.dct[fi, band] * filt
        return out

    def synthesis(self, bands):
        out = np.zeros(480, np.float32)
        for up in range(3):
            for shift in range(4):
                index = up + shift * 3
                if index in (3, 9):
                    continue
                fi = self._filter_index(index)
                in_sub = np.zeros(160, np.float32)
                for band in range(3):
                    in_sub += self.dct[fi, band] * np.asarray(bands[band], np.float32)
                filt = self._filter_core(self.coeffs[fi], in_sub, shift, self.state_s[fi])
                out[up::3] += 3.0 * filt
        return out
