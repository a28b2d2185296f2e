"""ctypes bindings for the native streaming plane (native/streaming_plane.cc)
and the batching engine that drives the vmapped device step.

The C++ plane owns the lock-free per-stream frame queues (the reference's
SwapQueue hand-off, rtc_base/swap_queue.h), race checking
(rtc_base/race_checker.h semantics) and drop/throughput counters
(system_wrappers metrics). Python owns the device step: `BatchEngine.step()`
collects one 10 ms frame per ready stream into pinned numpy batches, runs
the jitted vmapped APM step, and scatters the output back through the
plane's output queues.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB = None

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "streaming_plane.cc")
_SO = os.path.join(os.path.dirname(__file__), "_streaming_plane.so")


def _build_library() -> str:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
             src, "-o", so],
            check=True,
        )
    return so


def _load():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        lib = ctypes.CDLL(_build_library())
        FP = ctypes.POINTER(ctypes.c_float)
        U8P = ctypes.POINTER(ctypes.c_uint8)
        lib.wap_plane_create.restype = ctypes.c_void_p
        lib.wap_plane_create.argtypes = [ctypes.c_int] * 5
        lib.wap_plane_destroy.argtypes = [ctypes.c_void_p]
        lib.wap_push_capture.restype = ctypes.c_int
        lib.wap_push_capture.argtypes = [ctypes.c_void_p, ctypes.c_int, FP]
        lib.wap_push_render.restype = ctypes.c_int
        lib.wap_push_render.argtypes = [ctypes.c_void_p, ctypes.c_int, FP]
        lib.wap_collect_batch.restype = ctypes.c_int
        lib.wap_collect_batch.argtypes = [ctypes.c_void_p, FP, FP, U8P]
        lib.wap_distribute_batch.argtypes = [ctypes.c_void_p, FP, U8P]
        lib.wap_pop_output.restype = ctypes.c_int
        lib.wap_pop_output.argtypes = [ctypes.c_void_p, ctypes.c_int, FP]
        for name in ("wap_stream_races", "wap_stream_dropped",
                     "wap_stream_frames_processed"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_long
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.wap_capture_queue_size.restype = ctypes.c_int
        lib.wap_capture_queue_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
        return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class StreamingPlane:
    """Python handle over the native per-stream queue plane."""

    def __init__(self, num_streams: int, samples: int,
                 capture_channels: int = 1, render_channels: int = 1,
                 queue_capacity: int = 16):
        self._lib = _load()
        self._handle = self._lib.wap_plane_create(
            num_streams, samples, capture_channels, render_channels,
            queue_capacity,
        )
        if not self._handle:
            raise ValueError("invalid streaming plane geometry")
        self.num_streams = num_streams
        self.samples = samples
        self.capture_channels = capture_channels
        self.render_channels = render_channels

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.wap_plane_destroy(self._handle)
            self._handle = None

    def push_capture(self, stream: int, frame: np.ndarray) -> bool:
        f = np.ascontiguousarray(frame, np.float32)
        assert f.size == self.samples * self.capture_channels
        return bool(self._lib.wap_push_capture(self._handle, stream, _fp(f)))

    def push_render(self, stream: int, frame: np.ndarray) -> bool:
        f = np.ascontiguousarray(frame, np.float32)
        assert f.size == self.samples * self.render_channels
        return bool(self._lib.wap_push_render(self._handle, stream, _fp(f)))

    def collect_batch(self, capture_out, render_out, ready_mask) -> int:
        return self._lib.wap_collect_batch(
            self._handle, _fp(capture_out), _fp(render_out),
            ready_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )

    def distribute_batch(self, batch, ready_mask) -> None:
        self._lib.wap_distribute_batch(
            self._handle, _fp(batch),
            ready_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )

    def pop_output(self, stream: int):
        out = np.empty((self.samples, self.capture_channels), np.float32)
        ok = self._lib.wap_pop_output(self._handle, stream, _fp(out))
        return out if ok else None

    # ------------------------------------------------ metrics / debug

    def races(self, stream: int) -> int:
        return int(self._lib.wap_stream_races(self._handle, stream))

    def dropped(self, stream: int) -> int:
        return int(self._lib.wap_stream_dropped(self._handle, stream))

    def frames_processed(self, stream: int) -> int:
        return int(self._lib.wap_stream_frames_processed(self._handle,
                                                         stream))

    def capture_queue_size(self, stream: int) -> int:
        return int(self._lib.wap_capture_queue_size(self._handle, stream))


class BatchEngine:
    """Batches N independent streams through one vmapped device step.

    step_fn(state, capture (N, S, Cc), render (N, S, Cr)) -> (state, out)
    where `out` is (N, S, Cc) float32. The per-stream states live on
    device; frames move through the native plane's queues.
    """

    def __init__(self, plane: StreamingPlane, step_fn, state,
                 flush_every: int = 1):
        """flush_every: materialize device outputs every N steps. Device
        dispatch is async and cheap; a blocking device->host sync can be
        expensive on remote-attached accelerators, so outputs are kept as
        pending device arrays and flushed in batches."""
        self._plane = plane
        self._step_fn = step_fn
        self._state = state
        self._flush_every = max(1, flush_every)
        self._pending = []  # [(device_out, mask_copy)]
        n, s = plane.num_streams, plane.samples
        self._capture = np.zeros((n, s, plane.capture_channels), np.float32)
        self._render = np.zeros((n, s, plane.render_channels), np.float32)
        self._mask = np.zeros((n,), np.uint8)

    @property
    def state(self):
        return self._state

    def flush(self) -> None:
        """Materialize all pending device outputs into the output queues."""
        for out, mask in self._pending:
            out_np = np.ascontiguousarray(np.asarray(out), np.float32)
            self._plane.distribute_batch(out_np, mask)
        self._pending.clear()

    def step(self) -> int:
        """One engine iteration: collect -> device step -> (deferred)
        distribute. Returns the number of streams fed this step."""
        gathered = self._plane.collect_batch(self._capture, self._render,
                                             self._mask)
        if gathered == 0:
            self.flush()
            return 0
        new_state, out = self._step_fn(self._state, self._capture,
                                       self._render)
        # The whole batched state is committed: non-ready rows saw silence,
        # matching the reference's behavior of processing what arrived.
        self._state = new_state
        self._pending.append((out, self._mask.copy()))
        if len(self._pending) >= self._flush_every:
            self.flush()
        return gathered
