"""Bare-module AECM diff: WebRtcAecm_* (compiled oracle) vs our wrapper.

Drives the reference's standalone AECM C API (WebRtcAecm_Create/Init/
BufferFarend/Process, echo_control_mobile.h) and our
models/aecm/echo_control_mobile.process_frame over the same vectors and
delay schedule, with no APM around either. Prints the first diverging
frame and per-frame stats — the tool for bisecting wrapper-level
(FIFO/startup/EstBufDelay) mismatches without APM noise.

Usage: python tools/aecm_probe.py [rate] [frames] [delay-spec] [dump_from]
  delay-spec as in diff_vs_ref.py ("0", "120", "120j20").
"""

from __future__ import annotations

import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_RES = "/root/reference/tests/resources"
LIB = "/tmp/refapm/libapm.so"


class _AecmConfig(ctypes.Structure):
    _fields_ = [("cngMode", ctypes.c_int16), ("echoMode", ctypes.c_int16)]


class RefAecm:
    def __init__(self, rate: int, cng: bool = True, echo_mode: int = 3):
        self.lib = ctypes.CDLL(LIB)
        self.lib.WebRtcAecm_Create.restype = ctypes.c_void_p
        self.inst = ctypes.c_void_p(self.lib.WebRtcAecm_Create())
        rc = self.lib.WebRtcAecm_Init(self.inst, ctypes.c_int32(rate))
        assert rc == 0, rc
        rc = self.lib.WebRtcAecm_set_config(
            self.inst, _AecmConfig(1 if cng else 0, echo_mode))
        assert rc == 0, rc
        self.rate = rate

    def buffer_farend(self, far: np.ndarray) -> int:
        far = np.ascontiguousarray(far, np.int16)
        return self.lib.WebRtcAecm_BufferFarend(
            self.inst, far.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ctypes.c_size_t(len(far)))

    def process(self, near: np.ndarray, ms: int) -> np.ndarray:
        near = np.ascontiguousarray(near, np.int16)
        out = np.zeros(len(near), np.int16)
        rc = self.lib.WebRtcAecm_Process(
            self.inst, near.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            None, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ctypes.c_size_t(len(near)), ctypes.c_int16(ms))
        assert rc >= 0, rc
        return out


def main():
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    delay_spec = sys.argv[3] if len(sys.argv) > 3 else "120"
    dump_from = int(sys.argv[4]) if len(sys.argv) > 4 else -1
    if "j" in delay_spec:
        base, jitter = (int(v) for v in delay_spec.split("j"))
    else:
        base, jitter = int(delay_spec), 0
    rng = np.random.RandomState(1234)
    delays = base + (rng.randint(-jitter, jitter + 1, size=4096)
                     if jitter else np.zeros(4096, np.int64))

    frame = rate // 100
    far = np.fromfile(f"{REF_RES}/far{rate // 1000}_stereo.pcm", np.int16)
    near = np.fromfile(f"{REF_RES}/near{rate // 1000}_stereo.pcm", np.int16)

    def mono(pcm):
        n = len(pcm) // (2 * frame)
        x = pcm[: n * 2 * frame].reshape(n, frame, 2)
        return ((x[..., 0].astype(np.int32) + x[..., 1]) >> 1).astype(
            np.int16)

    far_f, near_f = mono(far), mono(near)
    n_frames = min(n_frames, len(far_f), len(near_f))

    import jax
    from webrtc_audio_processing_tpu.models.aecm import echo_control_mobile \
        as ecm

    geo = ecm.AecmGeometry(sample_rate_hz=rate)
    state = ecm.init_state(geo)
    ref = RefAecm(rate)

    bf = jax.jit(ecm.buffer_farend)
    pf = jax.jit(ecm.process_frame, static_argnums=(0, 3))

    first_div = None
    for k in range(n_frames):
        ref.buffer_farend(far_f[k])
        state = bf(state, far_f[k].astype(np.int32))
        out_r = ref.process(near_f[k], int(delays[k]))
        state, out_o = pf(geo, state, near_f[k].astype(np.int32),
                          k % geo.period, int(delays[k]))
        out_o = np.asarray(out_o).astype(np.int16)
        d = out_o.astype(np.int32) - out_r.astype(np.int32)
        rms = float(np.sqrt(np.mean(d.astype(np.float64) ** 2)))
        if rms > 0 and first_div is None:
            first_div = k
            i = int(np.argmax(d != 0))
            print(f"FIRST DIVERGENCE frame {k} sample {i}: "
                  f"ours {out_o[i]} ref {out_r[i]}")
        if k < 3 or rms > 0 or k == n_frames - 1 or k >= dump_from >= 0:
            print(f"frame {k:4d}: rms {rms:8.2f} maxabs o/r "
                  f"{np.abs(out_o).max():5d}/{np.abs(out_r).max():5d} "
                  f"startup={int(state.ec_startup)} "
                  f"fifo_avail={int(state.far_written - state.fifo_read)} "
                  f"known={int(state.known_delay)} "
                  f"filt={int(state.filt_delay)} "
                  f"bss={int(state.buf_size_start)}")
        if first_div is not None and k > first_div + 8 and dump_from < 0:
            break
    print("first divergence:", first_div)


if __name__ == "__main__":
    main()
