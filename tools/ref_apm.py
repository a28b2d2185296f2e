"""ctypes driver for the compiled reference AudioProcessing (oracle).

The reference C++ APM is compiled unmodified into /tmp/refapm/libapm.so by
tools/build_ref_apm.sh (build artifacts never enter this repo). Used as a
development-time conformance oracle: run any configuration over any input
and diff this backend's outputs/levels/statistics against the true
reference, frame by frame — including configurations the committed
ApmTest goldens do not cover.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

LIB_PATH = os.environ.get("REF_APM_LIB", "/tmp/refapm/libapm.so")

_lib = None


def available() -> bool:
    return os.path.exists(LIB_PATH)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(LIB_PATH)
    lib.apm_create.restype = ctypes.c_void_p
    lib.apm_create.argtypes = [ctypes.c_int] * 8
    spec = {
        "apm_process": ([ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                         ctypes.c_int, ctypes.c_int,
                         ctypes.POINTER(ctypes.c_float)], ctypes.c_int),
        "apm_process_reverse": ([ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int, ctypes.c_int], ctypes.c_int),
        "apm_process_i16": ([ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
                             ctypes.c_int,
                             ctypes.POINTER(ctypes.c_int16)], ctypes.c_int),
        "apm_process_reverse_i16": ([ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int16),
                                     ctypes.c_int, ctypes.c_int],
                                    ctypes.c_int),
        "apm_set_delay": ([ctypes.c_void_p, ctypes.c_int], ctypes.c_int),
        "apm_set_analog_level": ([ctypes.c_void_p, ctypes.c_int], None),
        "apm_recommended_level": ([ctypes.c_void_p], ctypes.c_int),
        "apm_get_stats": ([ctypes.c_void_p,
                           ctypes.POINTER(ctypes.c_double)], None),
        "apm_set_runtime_capture_output_used": (
            [ctypes.c_void_p, ctypes.c_int], None),
        "apm_destroy": ([ctypes.c_void_p], None),
        "apm_dumper_set_dir": ([ctypes.c_char_p], None),
    }
    for name, (argt, rest) in spec.items():
        f = getattr(lib, name)
        f.argtypes = argt
        f.restype = rest
    _lib = lib
    return lib


class RefApm:
    """One reference AudioProcessing instance."""

    NS_LEVELS = {"low": 0, "moderate": 1, "high": 2, "very_high": 3}
    AGC1_MODES = {"adaptive_analog": 0, "adaptive_digital": 1,
                  "fixed_digital": 2}

    def __init__(self, aec=False, mobile=False, ns=False,
                 ns_level="moderate", agc1=False,
                 agc1_mode="adaptive_analog", agc2=False, hpf=False):
        lib = _load()
        self._lib = lib
        self._h = lib.apm_create(
            int(aec), int(mobile), int(ns), self.NS_LEVELS[ns_level],
            int(agc1), self.AGC1_MODES[agc1_mode], int(agc2), int(hpf),
        )
        assert self._h

    def process_reverse_i16(self, frame: np.ndarray, rate: int) -> int:
        """frame: (n, ch) int16 -> interleaved internally."""
        x = np.ascontiguousarray(frame.astype(np.int16).reshape(-1))
        return self._lib.apm_process_reverse_i16(
            self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            rate, frame.shape[1],
        )

    def process_i16(self, frame: np.ndarray, rate: int):
        x = np.ascontiguousarray(frame.astype(np.int16).reshape(-1))
        out = np.zeros_like(x)
        rc = self._lib.apm_process_i16(
            self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            rate, frame.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        )
        return rc, out.reshape(frame.shape)

    def process_reverse(self, frame: np.ndarray, rate: int) -> int:
        """frame: (n, ch) float [-1,1] -> deinterleaved channel-major."""
        x = np.ascontiguousarray(frame.astype(np.float32).T.reshape(-1))
        return self._lib.apm_process_reverse(
            self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rate, frame.shape[1],
        )

    def process(self, frame: np.ndarray, rate: int):
        x = np.ascontiguousarray(frame.astype(np.float32).T.reshape(-1))
        out = np.zeros_like(x)
        rc = self._lib.apm_process(
            self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rate, frame.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return rc, out.reshape(frame.shape[1], -1).T

    def set_stream_delay_ms(self, d: int) -> int:
        return self._lib.apm_set_delay(self._h, d)

    def set_stream_analog_level(self, level: int):
        self._lib.apm_set_analog_level(self._h, level)

    def recommended_stream_analog_level(self) -> int:
        return self._lib.apm_recommended_level(self._h)

    def get_statistics(self) -> dict:
        out = (ctypes.c_double * 8)()
        self._lib.apm_get_stats(self._h, out)
        names = ["echo_return_loss", "echo_return_loss_enhancement",
                 "delay_ms", "residual_echo_likelihood",
                 "residual_echo_likelihood_recent_max", "output_rms_dbfs",
                 "voice_detected", "delay_median_ms"]
        return {n: (None if out[i] == -999 else out[i])
                for i, n in enumerate(names)}

    def close(self):
        if self._h:
            self._lib.apm_destroy(self._h)
            self._h = None
