"""ReverbDecayEstimator (adaptive reverb decay) unit tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aec3 import reverb_decay_estimator as rde
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config


def _cfg(length_blocks=20, default_len=-0.83):
    cfg = EchoCanceller3Config()
    return dataclasses.replace(
        cfg,
        ep_strength=dataclasses.replace(cfg.ep_strength,
                                        default_len=default_len),
        filter=dataclasses.replace(
            cfg.filter,
            refined=dataclasses.replace(cfg.filter.refined,
                                        length_blocks=length_blocks),
        ),
    )


def _decaying_filter(length_blocks, peak_block, per_sample_decay,
                     peak=0.5):
    """Impulse response with an exponential tail after the peak."""
    n = length_blocks * 64
    h = np.zeros(n, np.float32)
    k0 = peak_block * 64
    tail = np.arange(n - k0)
    rng = np.random.default_rng(0)
    signs = rng.choice([-1.0, 1.0], size=n - k0)
    h[k0:] = peak * (per_sample_decay ** tail) * signs
    return h


def test_decay_adapts_toward_true_tail_decay():
    L = 20
    cfg = _cfg(L)
    st = rde.init_state(cfg, 1)
    # Per-block energy decay: h ~ d^k => h2 block ratio = d^(2*64).
    true_block_decay = 0.6  # energy decay per 64 samples
    d = true_block_decay ** (1.0 / (2 * 64))
    h = _decaying_filter(L, 2, d)[None, :]

    up = jax.jit(lambda s: rde.update(
        cfg, s, jnp.asarray(h), jnp.asarray([1.0]), jnp.asarray([True]),
        jnp.asarray([2]), jnp.asarray(True), jnp.asarray(False),
        jnp.asarray(L),
    ))
    for _ in range(600):
        st = up(st)
    est = float(st.decay[0])
    assert abs(est - true_block_decay) < 0.15, est
    # Started at 0.83 and moved down toward 0.6.
    assert est < 0.75


def test_decay_untouched_when_infeasible():
    L = 20
    cfg = _cfg(L)
    st = rde.init_state(cfg, 1)
    h = _decaying_filter(L, 2, 0.99)[None, :]
    up = jax.jit(lambda s, delay, usable: rde.update(
        cfg, s, jnp.asarray(h), jnp.asarray([1.0]), jnp.asarray([True]),
        delay, usable, jnp.asarray(False), jnp.asarray(L),
    ))
    # delay 0 and non-usable filters are both infeasible -> reset, no adapt.
    for _ in range(100):
        st = up(st, jnp.asarray([0]), jnp.asarray(True))
    for _ in range(100):
        st = up(st, jnp.asarray([2]), jnp.asarray(False))
    assert abs(float(st.decay[0]) - 0.83) < 1e-6
    assert int(st.block_to_analyze[0]) == 0


def test_decay_value_dispatch():
    cfg_fixed = _cfg(default_len=0.83)
    cfg_adapt = _cfg(default_len=-0.83)
    st = rde.init_state(cfg_adapt, 1)
    st = st.replace(decay=jnp.asarray([0.5]))
    # Fixed config: mild selects nearend_len.
    v_mild = float(rde.decay_value(cfg_fixed, None, jnp.asarray(True)))
    assert abs(v_mild - abs(cfg_fixed.ep_strength.nearend_len)) < 1e-6
    # Adaptive config: mild is ignored, estimated decay returned.
    v = float(rde.decay_value(cfg_adapt, st, jnp.asarray(True)))
    assert v == 0.5
