"""AEC3 subtractor: convergence on a synthetic echo path."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aec3 import (
    config as aec3_config,
    render_buffer as rb,
    subtractor as sub,
)

RNG = np.random.default_rng(5)
F = np.float32


def test_subtractor_converges_on_echo():
    cfg = aec3_config.EchoCanceller3Config()
    geo = rb.BufferGeometry.create(cfg, 16000, 1)
    buf = rb.init_state(geo, cfg)
    st = sub.init_state(cfg, num_render=1, num_capture=1)
    analyzer = sub.init_analyzer()

    # Echo path: sparse impulse response inside the filter span after the
    # default delay alignment (default_delay=5 blocks).
    h_echo = np.zeros(3 * 64, F)
    h_echo[10] = 0.6
    h_echo[100] = -0.25

    delay_blocks = 5  # matches the applied default delay
    n_blocks = 500
    x = (RNG.standard_normal((n_blocks + delay_blocks + 4) * 64) * 1000).astype(F)
    echo_full = np.convolve(x, h_echo)[: len(x)].astype(F)

    p_max = st.refined.H.shape[1]

    @jax.jit
    def step(buf, st, analyzer, r_block, y_block, n):
        buf, _ = rb.insert(geo, cfg, buf, r_block, n)
        buf, _, _ = rb.prepare_capture_processing(geo, cfg, buf)
        view = rb.RenderView(buf, n)
        analyzer = sub.analyzer_update(
            cfg, analyzer, geo, view, jnp.asarray(0), jnp.asarray(False)
        )
        X_win = rb.fft_window(geo, view, p_max)
        X2 = rb.spectral_sum(geo, view, 13)
        st, out = sub.process(
            cfg, st, X_win, X2, X2, y_block, analyzer, jnp.asarray(False)
        )
        return buf, st, analyzer, out

    erle_db = []
    for b in range(n_blocks):
        # Render leads capture by `delay_blocks`.
        rblk = x[(b + delay_blocks) * 64 : (b + delay_blocks + 1) * 64]
        yblk = echo_full[b * 64 : (b + 1) * 64]
        buf, st, analyzer, out = step(
            buf, st, analyzer,
            jnp.asarray(rblk)[None, :, None], jnp.asarray(yblk)[None, :],
            jnp.asarray(b + 1, jnp.int32),
        )
        if b >= n_blocks - 50:
            e2 = float(out["e2_refined"][0])
            y2 = float(out["y2"][0])
            erle_db.append(10 * np.log10(max(y2, 1e-9) / max(e2, 1e-9)))

    mean_erle = float(np.mean(erle_db))
    assert mean_erle > 15.0, f"ERLE {mean_erle:.1f} dB"


def test_constrain_keeps_filter_causal():
    cfg = aec3_config.EchoCanceller3Config()
    st = sub.init_filter(1, 13, 13, 1)
    # Random filter; after 13 constrain cycles every partition must have a
    # causal (second-half-zero) time response.
    H = (RNG.standard_normal((1, 13, 1, 65)) +
         1j * RNG.standard_normal((1, 13, 1, 65)))
    st = st.replace(H=jnp.asarray(H, jnp.complex64))
    for _ in range(13):
        st, _ = sub.constrain_filter(st)
    h = np.fft.irfft(np.asarray(st.H), 128, axis=-1)
    tail = np.abs(h[..., 64:]).max()
    assert tail < 1e-4, tail
