"""AEC3 delay estimation: NLMS matched filter oracle + end-to-end recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aec3 import (
    config as aec3_config,
    delay_estimator as de,
    render_buffer as rb,
)

RNG = np.random.default_rng(17)
F = np.float32


def matched_filter_core_np(x_start_index, x2_thr, smoothing, x, y, h):
    """MatchedFilterCore (matched_filter.cc:146-203), scalar oracle."""
    x = x.copy()
    h = h.copy()
    error_sum = 0.0
    updated = False
    for i in range(len(y)):
        idx = (x_start_index + np.arange(len(h))) % len(x)
        win = x[idx]
        x2_sum = np.sum(win * win, dtype=F)
        s = np.dot(h, win).astype(F)
        e = y[i] - s
        error_sum += e * e
        sat = y[i] >= 32000.0 or y[i] <= -32000.0
        if x2_sum > x2_thr and not sat:
            h += (smoothing * e / x2_sum) * win
            updated = True
        x_start_index = (x_start_index - 1) % len(x)
    return h, error_sum, updated


def test_matched_filter_core_matches_oracle():
    cfg = aec3_config.EchoCanceller3Config()
    geo = de.DelayGeometry.create(cfg)
    ds_size = geo.ds_size
    x = (RNG.standard_normal(ds_size) * 500).astype(F)
    state = de._init_matched_filter(geo)

    lr_read = 37
    y = (RNG.standard_normal(geo.sub_block_size) * 400).astype(F)

    new = de.matched_filter_update(
        geo, cfg, state, jnp.asarray(x), jnp.asarray(lr_read, jnp.int32),
        jnp.asarray(y), jnp.asarray(False),
    )

    limit = cfg.render_levels.poor_excitation_render_limit
    thr = geo.filter_length * limit**2
    for n in range(geo.num_filters):
        start = (lr_read + n * geo.shift_samples + geo.sub_block_size - 1) % ds_size
        h_ref, _, _ = matched_filter_core_np(
            start, thr, 0.7, x, y, np.zeros(geo.filter_length, F)
        )
        got = np.asarray(new.filters[n])
        np.testing.assert_allclose(got, h_ref, atol=1e-6, rtol=1e-4)


def test_end_to_end_delay_recovery():
    cfg = aec3_config.EchoCanceller3Config()
    geo = rb.BufferGeometry.create(cfg, 16000, 1)
    dgeo = de.DelayGeometry.create(cfg)

    buf = rb.init_state(geo, cfg)
    est = de.init_state(dgeo, cfg, 1)

    delay_blocks_true = 7
    headroom_blocks = cfg.delay.delay_headroom_samples // 64  # 0 (32 samples)

    @jax.jit
    def step(buf, est, render_block, capture_block, n):
        buf, _ = rb.insert(geo, cfg, buf, render_block, n)
        buf, _, _ = rb.prepare_capture_processing(geo, cfg, buf)
        est, delay, valid = de.get_delay(
            dgeo, cfg, est, buf.lowrate, rb.lr_read_index(geo, buf, n),
            capture_block,
        )
        return buf, est, delay, valid

    # Render: white noise; capture: render delayed by 7 blocks.
    n_blocks = 120
    render = (RNG.standard_normal((n_blocks + delay_blocks_true) * 64) * 1000)
    render = render.astype(F)
    delay = None
    for b in range(n_blocks):
        r = render[(b + delay_blocks_true) * 64 : (b + delay_blocks_true + 1) * 64]
        c = render[b * 64 : (b + 1) * 64]
        buf, est, delay, valid = step(
            buf, est, jnp.asarray(r)[None, :, None],
            jnp.asarray(c)[None, :, None], jnp.asarray(b + 1, jnp.int32),
        )
    # Expected delay: true delay minus the 32-sample headroom, in blocks.
    expected = delay_blocks_true - 1 + headroom_blocks  # 32 samples -> .5 blk
    assert bool(valid)
    assert abs(int(delay) - expected) <= 1, (int(delay), expected)


def test_lag_estimation_delay_grid():
    """MatchedFilterTest.LagEstimation port
    (tests/unit/aec3/matched_filter_unittest.cc:258-326): the delay stack
    recovers artificially delayed white noise across a grid of
    sample-granular delays. One jitted lax.scan per delay (same geometry
    -> one compile); the recovered block delay must match the true delay
    minus the 32-sample headroom within one block."""
    cfg = aec3_config.EchoCanceller3Config()
    geo = rb.BufferGeometry.create(cfg, 16000, 1)
    dgeo = de.DelayGeometry.create(cfg)

    @jax.jit
    def run(render_blocks, capture_blocks):
        buf = rb.init_state(geo, cfg)
        est = de.init_state(dgeo, cfg, 1)

        def body(carry, xs):
            buf, est, n = carry
            r, c = xs
            buf, _ = rb.insert(geo, cfg, buf, r[None, :, None], n)
            buf, _, _ = rb.prepare_capture_processing(geo, cfg, buf)
            est, delay, valid = de.get_delay(
                dgeo, cfg, est, buf.lowrate, rb.lr_read_index(geo, buf, n),
                c[None, :, None],
            )
            return (buf, est, n + 1), (delay, valid)

        (_, _, _), (delays, valids) = jax.lax.scan(
            body, (buf, est, jnp.asarray(1, jnp.int32)),
            (render_blocks, capture_blocks),
        )
        return delays, valids

    # Sample-granular (not block-aligned) delays; the smallest reference
    # delays (5 downsampled samples at 48 kHz) have no direct analog here
    # because they fall below the 32-sample headroom + one-block
    # aggregator hysteresis (delays under ~2 blocks never validate).
    n_blocks = 140
    for delay_samples in (150, 200, 320, 449):
        render = (RNG.standard_normal(n_blocks * 64 + delay_samples)
                  * 1000).astype(F)
        # One stream: the fed render leads the capture by delay_samples
        # (the echo arrives delay_samples after its render frame).
        r_blocks = render[delay_samples:].reshape(n_blocks, 64)
        c_blocks = render[: n_blocks * 64].reshape(n_blocks, 64)
        delays, valids = run(jnp.asarray(r_blocks), jnp.asarray(c_blocks))
        assert bool(valids[-1]), delay_samples
        got = int(delays[-1])
        # Headroom subtraction + the lag aggregator's one-block offset
        # (same convention as test_end_to_end_delay_recovery).
        expected = max(
            (delay_samples - cfg.delay.delay_headroom_samples) / 64.0 - 1,
            0.0)
        assert abs(got - expected) <= 1, (delay_samples, got, expected)
