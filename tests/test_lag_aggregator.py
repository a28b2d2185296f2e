"""MatchedFilterLagAggregator tests ported from
matched_filter_lag_aggregator_unittest.cc (histogram-confidence gating)."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aec3 import (
    config as aec3_config,
    delay_estimator as de,
)

CFG = aec3_config.EchoCanceller3Config()
GEO = de.DelayGeometry.create(CFG)
HEADROOM = CFG.delay.delay_headroom_samples // CFG.delay.down_sampling_factor


def _agg_many(state, lag, n, valid=True):
    lag = jnp.asarray(lag + HEADROOM, jnp.int32)

    def body(st, _):
        st, delay, emit, refined = de.aggregate(
            GEO, CFG, st, lag, lag, jnp.asarray(valid)
        )
        return st, (delay, emit)

    state, (delays, emits) = jax.lax.scan(body, state, None, length=n)
    return state, int(delays[-1]), bool(emits[-1])


def test_constant_lag_gains_confidence():
    # kNumLagsBeforeDetection-equivalent: a repeated identical lag must
    # eventually be emitted with the candidate value.
    st = de._init_aggregator(GEO)
    st, delay, emit = _agg_many(st, 10, 30)
    assert emit
    # The peak aggregator tracks the exact lag; the emitted delay uses the
    # pre-echo candidate, which is quantized to sub-block multiples
    # (matched_filter_lag_aggregator.cc PreEchoLagAggregator).
    assert int(st.peak.candidate) == 10
    assert delay % (1 << GEO.ds_block_size_log2) == 0


def test_varying_lags_never_aggregate():
    # matched_filter_lag_aggregator_unittest.cc:34-59: a lag sweeping over
    # 100 values never accumulates enough histogram mass.
    st = de._init_aggregator(GEO)
    lagseq = jnp.asarray(
        (np.arange(600) % 100 + HEADROOM).astype(np.int32)
    )

    def body(st, lag):
        st, delay, emit, _ = de.aggregate(
            GEO, CFG, st, lag, lag, jnp.asarray(True)
        )
        return st, emit

    st, emits = jax.lax.scan(body, st, lagseq)
    # After the initial window the varying lag must stop being emitted.
    assert not bool(emits[-1])
    assert not np.any(np.asarray(emits[200:]))


def test_invalid_lags_do_not_update():
    st = de._init_aggregator(GEO)
    st, _, emit = _agg_many(st, 10, 100, valid=False)
    assert not emit
    # Histogram untouched -> still no significant candidate.
    assert not bool(st.significant_candidate_found)


def test_significant_candidate_raises_threshold():
    # Once a significant candidate was found, the initial (lower)
    # threshold no longer emits; only the converged threshold does
    # (matched_filter_lag_aggregator.cc:81-110).
    st = de._init_aggregator(GEO)
    st, _, _ = _agg_many(st, 10, 40)
    assert bool(st.significant_candidate_found)
    st2 = de._reset_aggregator(st, jnp.asarray(False))
    assert bool(st2.significant_candidate_found)  # soft reset keeps it
    st3 = de._reset_aggregator(st, jnp.asarray(True))
    assert not bool(st3.significant_candidate_found)  # hard reset clears
