"""AECM mobile echo canceller: unit + functional echo suppression tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aecm import core as aecm_core
from webrtc_audio_processing_tpu.models.aecm import echo_control_mobile as ecm

RNG = np.random.default_rng(3)


def test_tables():
    # kCosTable/kSinTable are the reference's legacy tables
    # (aecm_core.cc:60-130) — NOT the analytic round(8192*cos/sin); peaks
    # are 8191 and 175/360 cos entries differ by 1 LSB.
    cos = np.asarray(aecm_core.COS_TABLE)
    sin = np.asarray(aecm_core.SIN_TABLE)
    assert cos[0] == 8192 and sin[0] == 0
    assert cos[90] == 0 and sin[90] == 8191
    assert abs(cos[60] - 4096) <= 1
    # Stored channel tables have the documented lengths and ranges.
    assert aecm_core.CHANNEL_STORED_8K.shape == (65,)
    assert aecm_core.CHANNEL_STORED_16K.shape == (65,)


def test_sup_gain_params_modes():
    # echo_control_mobile.cc:435-482.
    d0 = aecm_core.sup_gain_params(0)
    d3 = aecm_core.sup_gain_params(3)
    d4 = aecm_core.sup_gain_params(4)
    assert d3 == (256, 3072, 256, 1536, 1280)
    assert d0[0] == 256 >> 3 and d0[1] == 3072 >> 3
    assert d4[1] == 3072 << 1


def test_log_energy():
    # LogOfEnergyInQ8: log2(energy)*256 + 896 - q*256 for energy > 0.
    e = jnp.asarray([0, 1, 2, 1 << 20], jnp.int32)
    out = np.asarray(aecm_core._log_of_energy_q8(e, jnp.asarray(0)))
    assert out[0] == 896
    assert out[1] == 896  # log2(1)=0
    assert out[2] == 896 + 256
    assert abs(out[3] - (896 + 20 * 256)) <= 1


def test_binary_delay_estimator_synthetic():
    # Feed a noise spectrum pair where near = far delayed by 7 blocks;
    # the binary estimator should lock to 7.
    de = aecm_core.init_delay_estimator()
    far_seq = RNG.integers(1, 30000, size=(240, 65)).astype(np.int32)
    delay = 7

    step = jax.jit(aecm_core.delay_estimator_process)
    last = -2
    for t in range(240):
        far = jnp.asarray(far_seq[t])
        near = jnp.asarray(far_seq[t - delay] if t >= delay else far_seq[0])
        de, last = step(de, far, jnp.asarray(0), near, jnp.asarray(0))
    assert int(last) == delay


def _run_aecm(far, near, rate=16000, stream_delay_ms=0):
    geo = ecm.AecmGeometry(sample_rate_hz=rate)
    st = ecm.init_state(geo)
    F = geo.frame_len

    @functools.partial(jax.jit, static_argnums=(3,))
    def step(st, f, n, parity):
        st = ecm.buffer_farend(st, f)
        return ecm.process_frame(
            geo, st, n, parity, jnp.asarray(stream_delay_ms, jnp.int32)
        )

    outs = []
    n_frames = len(far) // F
    for k in range(n_frames):
        st, out = step(
            st,
            jnp.asarray(far[k * F : (k + 1) * F], jnp.int32),
            jnp.asarray(near[k * F : (k + 1) * F], jnp.int32),
            k % geo.period,
        )
        outs.append(np.asarray(out))
    return np.concatenate(outs)


def test_echo_suppression_far_only():
    # Near = pure scaled echo of far. The far signal must have speech-like
    # level dynamics: AECM's energy VAD (CalcEnergies) never triggers on a
    # stationary signal, exactly like the reference.
    n = 16000 * 6
    t = np.arange(n) / 16000
    burst = (np.sin(2 * np.pi * 2.7 * t) > -0.3).astype(np.float64)
    # >10 dB level dynamics inside the bursts: AECM's VAD requires
    # farEnergyMaxMin > FAR_ENERGY_DIFF (~3.6 octaves) after startup.
    level = 0.08 + 0.92 * np.abs(np.sin(2 * np.pi * 0.31 * t))
    far = (RNG.normal(size=n) * 9000 * burst * level).clip(
        -30000, 30000
    ).astype(np.int32)
    # Simple static echo path: a realistic acoustic delay (the startup
    # FIFO machinery always leaves the far fetch at least one 80-sample
    # frame behind — a zero-lag echo is non-causal for the reference too)
    # plus attenuation and short smear.
    D = 480  # 30 ms
    fd = np.roll(far, D)
    echo = 0.5 * fd + 0.2 * np.roll(fd, 1) + 0.1 * np.roll(fd, 2)
    near = echo.astype(np.int32)
    out = _run_aecm(far, near, stream_delay_ms=30)

    # Measure over the last third, on far-active samples only.
    tail = slice(2 * n // 3, n - 160)
    active = burst[tail] > 0
    e_in = float(np.mean(near[tail][active].astype(np.float64) ** 2)) + 1e-9
    e_out = float(np.mean(out[tail][active].astype(np.float64) ** 2)) + 1e-9
    erle_db = 10 * np.log10(e_in / e_out)
    assert erle_db > 10.0, erle_db


def test_nearend_passthrough_no_far():
    # Without far-end activity AECM must pass the near end through
    # (minus the one-block latency and CNG floor).
    n = 16000 * 2
    t = np.arange(n) / 16000
    near = (6000 * np.sin(2 * np.pi * 440 * t)).astype(np.int32)
    far = np.zeros(n, np.int32)
    out = _run_aecm(far, near)
    tail = slice(n // 2, n - 160)
    e_in = float(np.mean(near[tail].astype(np.float64) ** 2))
    e_out = float(np.mean(out[tail].astype(np.float64) ** 2))
    assert e_out > 0.5 * e_in, (e_out, e_in)


def test_rebuffer_phase_is_traced_not_parity():
    """The 80->64 core rebuffer phase anchors at the data-dependent
    startup-exit frame (aecm_core.cc:541-561 while-loop over the frame
    FIFOs), so process_frame must not depend on the static `parity`
    argument, and rebuf_fill must cycle 0->16->32->48->0 once enabled."""
    geo = ecm.AecmGeometry(sample_rate_hz=16000)
    st0 = ecm.init_state(geo)
    F = geo.frame_len
    rng = np.random.default_rng(11)
    far = (rng.normal(size=40 * F) * 8000).clip(-30000, 30000).astype(np.int32)
    near = np.roll(far, 160) // 2

    def run(parity_fn):
        st = st0
        outs, fills = [], []
        for k in range(40):
            st = ecm.buffer_farend(st, jnp.asarray(far[k * F:(k + 1) * F]))
            st, out = ecm.process_frame(
                geo, st, jnp.asarray(near[k * F:(k + 1) * F]),
                parity_fn(k), jnp.asarray(40, jnp.int32),
            )
            outs.append(np.asarray(out))
            fills.append(int(st.rebuf_fill))
        return np.concatenate(outs), fills, st

    out_a, fills_a, st_a = run(lambda k: 0)
    out_b, fills_b, st_b = run(lambda k: k % 4)
    np.testing.assert_array_equal(out_a, out_b)
    assert fills_a == fills_b
    # After startup exit the fill cycles through {0,16,32,48} with period
    # 4 sub-frames = 2 frames at 16 kHz (two 80-sample sub-frames/frame).
    post = [f for k, f in enumerate(fills_a) if k > 30]
    assert set(post) <= {0, 16, 32, 48}
    assert len(set(post)) == 2  # 2 sub-frames/frame -> fill alternates
