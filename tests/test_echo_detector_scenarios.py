"""ResidualEchoDetector scenario tests ported from
residual_echo_detector_unittest.cc (Echo/NoEcho/clock-drift cases).

The reference sets reliability to 1.0 for the test; this port forces the
state's reliability field instead (it rises with the same recursion in
production)."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models import echo_detector as ed

ONES = jnp.ones((160,), jnp.float32)
ZEROS = jnp.zeros((160,), jnp.float32)


def _run(schedule, n=1000):
    st = ed.init_state()
    st = st.replace(reliability=jnp.asarray(1.0, jnp.float32))
    render_step = jax.jit(ed.analyze_render_audio)
    capture_step = jax.jit(ed.analyze_capture_audio)
    for i in range(n):
        r, c, extra = schedule(i)
        st = render_step(st, r)
        st = capture_step(st, c)
        st = st.replace(reliability=jnp.asarray(1.0, jnp.float32))
        if extra == "render":
            st = render_step(st, ZEROS)
        elif extra == "capture":
            st = capture_step(st, ZEROS)
        if extra:
            st = st.replace(reliability=jnp.asarray(1.0, jnp.float32))
    return ed.get_metrics(st)


def test_echo_detected():
    # Capture = render delayed by 10 frames, both 20-frame periodic.
    def sched(i):
        if i % 20 == 0:
            return ONES, ZEROS, None
        if i % 20 == 10:
            return ZEROS, ONES, None
        return ZEROS, ZEROS, None

    m = _run(sched)
    assert abs(float(m["echo_likelihood"]) - 1.0) < 0.01


def test_no_echo():
    def sched(i):
        return (ONES if i % 20 == 0 else ZEROS), ZEROS, None

    m = _run(sched)
    assert float(m["echo_likelihood"]) < 0.01


def test_echo_with_render_clock_drift():
    def sched(i):
        extra = "render" if i % 100 == 0 else None
        if i % 20 == 0:
            return ONES, ZEROS, extra
        if i % 20 == 10:
            return ZEROS, ONES, extra
        return ZEROS, ZEROS, extra

    m = _run(sched)
    assert float(m["echo_likelihood"]) > 0.75


def test_echo_with_capture_clock_drift():
    def sched(i):
        extra = "capture" if i % 100 == 0 else None
        if i % 20 == 0:
            return ONES, ZEROS, extra
        if i % 20 == 10:
            return ZEROS, ONES, extra
        return ZEROS, ZEROS, extra

    m = _run(sched)
    assert abs(float(m["echo_likelihood"]) - 1.0) < 0.01
