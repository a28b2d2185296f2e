"""Subtractor convergence invariants, ported from the reference's
tests/unit/aec3/subtractor_unittest.cc (RunSubtractorTest harness,
:60-205, and the TESTs at :222-331):

- Convergence: white-noise render, capture = delayed render (averaged over
  render channels) -> echo-to-nearend power of the refined error < bound.
- RefinedFilterLongerThanCoarseFilter / CoarseFilterLongerThanRefinedFilter.
- NonConvergenceOnUncorrelatedSignals: power stays ~= 1.
- Multichannel convergence (render/capture channel grid).
- Echo-path-change reset: a delay-change event mid-run zeroes the filters
  and convergence re-establishes (subtractor.cc:146-174 reset semantics).

TPU-idiomatic harness: the whole block loop is ONE ``lax.scan`` inside one
jit (the reference loops 2500 blocks in C++; a per-block Python dispatch
here would dominate the suite's wall time).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.models.aec3 import (
    config as aec3_config,
    render_buffer as rb,
    subtractor as sub,
)

F = np.float32
BLOCK = 64


def _run_subtractor(num_render, num_capture, num_blocks, delay_samples,
                    refined_blocks, coarse_blocks, uncorrelated,
                    echo_path_change_block=None, seed=42):
    """Port of RunSubtractorTest (subtractor_unittest.cc:34-205). Returns
    per-capture-channel echo-to-nearend power averaged over the last 20
    blocks."""
    import dataclasses

    cfg = aec3_config.EchoCanceller3Config()
    cfg = cfg.replace(filter=dataclasses.replace(
        cfg.filter,
        refined=dataclasses.replace(cfg.filter.refined,
                                    length_blocks=refined_blocks),
        coarse=dataclasses.replace(cfg.filter.coarse,
                                   length_blocks=coarse_blocks),
    ))
    geo = rb.BufferGeometry.create(cfg, 16000, num_render)
    buf0 = rb.init_state(geo, cfg)
    st0 = sub.init_state(cfg, num_render=num_render, num_capture=num_capture)
    an0 = sub.init_analyzer()
    p_max = max(st0.refined.H.shape[1], st0.coarse.H.shape[1])
    pidx = jnp.arange(p_max)

    rng = np.random.default_rng(seed)
    delay_blocks_applied = 5  # render lead matching the applied default delay
    lead = delay_blocks_applied + (delay_samples + BLOCK - 1) // BLOCK + 2
    x = (rng.standard_normal((num_blocks + lead, BLOCK, num_render))
         * 1000).astype(F)
    x_flat = x.reshape(-1, num_render)
    if uncorrelated:
        y_flat = (rng.standard_normal((num_blocks * BLOCK, num_capture))
                  * 1000).astype(F)
    else:
        # y[ch] = mean over render channels of x delayed by delay_samples.
        y_mono = np.zeros((num_blocks * BLOCK,), F)
        src = x_flat.mean(axis=1)
        y_mono[delay_samples:] = src[: num_blocks * BLOCK - delay_samples]
        y_flat = np.tile(y_mono[:, None], (1, num_capture))

    rblocks = jnp.asarray(
        x[delay_blocks_applied:delay_blocks_applied + num_blocks]
    )  # (N, 64, R)
    yblocks = jnp.asarray(
        np.swapaxes(y_flat.reshape(num_blocks, BLOCK, num_capture), 1, 2)
    )  # (N, C, 64)
    ns = jnp.arange(1, num_blocks + 1, dtype=jnp.int32)
    epc = (jnp.asarray(echo_path_change_block, jnp.int32)
           if echo_path_change_block is not None else None)
    # Transition out of the initial filter sizes partway through, as
    # AecState's initial-state transition does in the real pipeline (the
    # non-default length_blocks only take effect after ExitInitialState).
    transition_block = min(max(num_blocks // 4, 50), 300)

    def step(carry, xs):
        buf, st, analyzer = carry
        r_blk, y_blk, n = xs
        buf, _ = rb.insert(geo, cfg, buf, r_blk[None], n)
        buf, _, _ = rb.prepare_capture_processing(geo, cfg, buf)
        view = rb.RenderView(buf, n)
        analyzer = sub.analyzer_update(
            cfg, analyzer, geo, view, jnp.asarray(0), jnp.asarray(False)
        )
        if epc is not None:
            st = sub.handle_echo_path_change(
                cfg, st, n - 1 == epc, jnp.asarray(False))
        st = jax.tree_util.tree_map(
            lambda a, b: a if a is b else jnp.where(
                n - 1 == transition_block, a, b),
            sub.exit_initial_state(cfg, st), st,
        )
        X_win = rb.fft_window(geo, view, p_max)
        spec_win = rb.spectrum_window(geo, view, p_max)
        X2_r = jnp.sum(
            jnp.where((pidx < st.refined.current_size)[:, None, None],
                      spec_win, 0.0), axis=(0, 1))
        X2_c = jnp.sum(
            jnp.where((pidx < st.coarse.current_size)[:, None, None],
                      spec_win, 0.0), axis=(0, 1))
        st, out = sub.process(
            cfg, st, X_win, X2_r, X2_c, y_blk, analyzer, jnp.asarray(False)
        )
        return (buf, st, analyzer), (out["e2_refined"], out["y2"])

    @jax.jit
    def run(buf, st, analyzer, rblocks, yblocks, ns):
        (_, _, _), (e2s, y2s) = jax.lax.scan(
            step, (buf, st, analyzer), (rblocks, yblocks, ns))
        return e2s, y2s

    e2s, y2s = run(buf0, st0, an0, rblocks, yblocks, ns)
    e2 = np.asarray(e2s)[-20:]  # (20, C)
    y2 = np.asarray(y2s)[-20:]
    return (e2.sum(axis=0) / np.maximum(y2.sum(axis=0), 1e-9)), np.asarray(
        e2s), np.asarray(y2s)


@pytest.mark.parametrize("filter_blocks", [12, 20])
@pytest.mark.parametrize("delay_samples", [0, 64, 200])
def test_convergence(filter_blocks, delay_samples):
    """subtractor_unittest.cc:222 Subtractor.Convergence (echo-to-nearend
    < 0.1 after convergence)."""
    ratio, _, _ = _run_subtractor(1, 1, 1200, delay_samples,
                                  filter_blocks, filter_blocks, False)
    assert (ratio < 0.1).all(), ratio


def test_refined_longer_than_coarse():
    """subtractor_unittest.cc:241."""
    ratio, _, _ = _run_subtractor(1, 1, 400, 64, 20, 15, False)
    assert (ratio < 0.5).all(), ratio


def test_coarse_longer_than_refined():
    """subtractor_unittest.cc:253."""
    ratio, _, _ = _run_subtractor(1, 1, 400, 64, 15, 20, False)
    assert (ratio < 0.5).all(), ratio


def test_non_convergence_on_uncorrelated_signals():
    """subtractor_unittest.cc:264: power ratio ~= 1 on uncorrelated
    render/capture."""
    ratio, _, _ = _run_subtractor(1, 1, 1000, 64, 12, 12, True)
    np.testing.assert_allclose(ratio, 1.0, atol=0.1)


@pytest.mark.parametrize("num_render,num_capture", [(2, 1), (2, 2), (1, 2)])
def test_multichannel_convergence(num_render, num_capture):
    """subtractor_unittest.cc:298 SubtractorMultiChannelUpToEightRender.
    Convergence (reduced grid for suite time)."""
    ratio, _, _ = _run_subtractor(num_render, num_capture,
                                  1500, 64, 12, 12, False)
    assert (ratio < 0.1).all(), ratio


def test_echo_path_change_resets_and_recovers():
    """subtractor.cc:146-174 HandleEchoPathChange: a delay-change event
    zeroes both filters (error jumps back to nearend level) and
    convergence re-establishes afterwards."""
    ratio, e2s, y2s = _run_subtractor(
        1, 1, 1600, 64, 12, 12, False, echo_path_change_block=800)
    r = e2s[:, 0] / np.maximum(y2s[:, 0], 1e-9)
    # Converged before the event...
    assert r[700:790].mean() < 0.1, r[700:790].mean()
    # ...filter reset makes the error jump to ~nearend power...
    assert r[801:806].mean() > 0.5, r[801:806].mean()
    # ...and the subtractor re-converges.
    assert (ratio < 0.1).all(), ratio
