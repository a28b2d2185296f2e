"""Native streaming plane: queue semantics, threading, batch engine."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.runtime import BatchEngine, StreamingPlane


def test_queue_roundtrip_and_ordering():
    plane = StreamingPlane(num_streams=2, samples=160, queue_capacity=8)
    for k in range(5):
        assert plane.push_capture(0, np.full((160, 1), float(k)))
        assert plane.push_render(0, np.full((160, 1), float(10 + k)))
    cap = np.zeros((2, 160, 1), np.float32)
    ren = np.zeros((2, 160, 1), np.float32)
    mask = np.zeros((2,), np.uint8)
    for k in range(5):
        n = plane.collect_batch(cap, ren, mask)
        assert n == 1
        assert mask[0] == 1 and mask[1] == 0
        assert cap[0, 0, 0] == float(k)
        assert ren[0, 0, 0] == float(10 + k)
        # Stream 1 rows are zero-filled.
        assert cap[1].max() == 0.0
    assert plane.collect_batch(cap, ren, mask) == 0


def test_queue_overflow_drops_and_counts():
    plane = StreamingPlane(num_streams=1, samples=80, queue_capacity=4)
    ok = [plane.push_capture(0, np.zeros((80, 1))) for _ in range(6)]
    assert sum(ok) == 4
    assert plane.dropped(0) == 2
    assert plane.capture_queue_size(0) == 4


def test_threaded_producers():
    plane = StreamingPlane(num_streams=4, samples=160, queue_capacity=64)
    frames_per_stream = 50

    def producer(sid):
        for k in range(frames_per_stream):
            while not plane.push_capture(
                sid, np.full((160, 1), sid * 1000.0 + k)
            ):
                pass

    threads = [threading.Thread(target=producer, args=(s,))
               for s in range(4)]
    for t in threads:
        t.start()

    cap = np.zeros((4, 160, 1), np.float32)
    ren = np.zeros((4, 160, 1), np.float32)
    mask = np.zeros((4,), np.uint8)
    got = {s: [] for s in range(4)}
    total = 0
    while total < 4 * frames_per_stream:
        n = plane.collect_batch(cap, ren, mask)
        total += n
        for s in range(4):
            if mask[s]:
                got[s].append(int(cap[s, 0, 0] - s * 1000.0))
    for t in threads:
        t.join()
    # Per-stream FIFO order is preserved.
    for s in range(4):
        assert got[s] == list(range(frames_per_stream))
    assert all(plane.races(s) == 0 for s in range(4))


def test_batch_engine_with_device_step():
    n_streams, samples = 8, 160
    plane = StreamingPlane(n_streams, samples, queue_capacity=8)

    # Trivial per-stream stateful step: running gain counter.
    state = jnp.zeros((n_streams,), jnp.float32)

    @jax.jit
    def step(st, cap, ren):
        new = st + 1.0
        return new, cap * 2.0 + ren

    engine = BatchEngine(plane, step, state)
    for s in range(n_streams):
        plane.push_capture(s, np.full((samples, 1), 1.0 + s))
        plane.push_render(s, np.full((samples, 1), 0.5))
    assert engine.step() == n_streams
    for s in range(n_streams):
        out = plane.pop_output(s)
        assert out is not None
        np.testing.assert_allclose(out[0, 0], 2.0 * (1.0 + s) + 0.5)
        assert plane.frames_processed(s) == 1
    assert engine.step() == 0


def test_invalid_geometry_rejected():
    with pytest.raises(ValueError):
        StreamingPlane(num_streams=1, samples=10000)
