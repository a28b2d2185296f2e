"""Equivalence: the Pallas subtractor pair-megakernel vs the XLA
subtractor.process_pair reference (interpret mode on CPU).

docs/design/subtractor_megakernel.md validation plan item 1: random
state/inputs, nblocks in {2, 3}, with and without reset/transition
events; states and outputs must agree to float tolerance (the kernel's
matmul-DFT transforms vs the CPU path's jnp.fft rfft differ at ~1e-4
absolute for unit-scale spectra — both are valid realizations of the
reference's Ooura transform; on TPU both paths use the same matmul-DFT).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from webrtc_audio_processing_tpu.models.aec3 import subtractor as subt
from webrtc_audio_processing_tpu.models.aec3 import subtractor_kernel as sk
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config
from webrtc_audio_processing_tpu.ops import mxu_fft

RNG = np.random.default_rng(7)


def _random_state(cfg, R, C=1):
    st = subt.init_state(cfg, R, C)
    P = st.refined.H.shape[1]
    Pc = st.coarse.H.shape[1]
    H = (RNG.normal(size=(C, P, R, 65)) + 1j * RNG.normal(size=(C, P, R, 65))
         ).astype(np.complex64) * 0.1
    Hc = (RNG.normal(size=(C, Pc, R, 65))
          + 1j * RNG.normal(size=(C, Pc, R, 65))).astype(np.complex64) * 0.1
    st = st.replace(
        refined=st.refined.replace(H=jnp.asarray(H)),
        coarse=st.coarse.replace(H=jnp.asarray(Hc)),
        refined_gain=st.refined_gain.replace(
            H_error=jnp.asarray(
                RNG.uniform(10.0, 1000.0, size=(C, 65)).astype(np.float32)),
            call_counter=jnp.asarray(40, jnp.int32),
            poor_excitation_counter=jnp.asarray(1200, jnp.int32),
        ),
        coarse_gain=st.coarse_gain.replace(
            call_counter=jnp.asarray(40, jnp.int32),
            poor_excitation_counter=jnp.asarray(1200, jnp.int32),
        ),
        refined_frequency_responses=jnp.asarray(
            RNG.uniform(0, 1, size=(C, P, 65)).astype(np.float32)),
        refined_impulse_responses=jnp.asarray(
            RNG.normal(size=(C, P * 64)).astype(np.float32) * 0.01),
    )
    return st


# Interpret-mode Pallas is ~40 s per config on CPU: the fast gate keeps
# the mono base case and the 48 kHz stereo headline geometry; the
# event/permutation sweep runs under -m slow.
@pytest.mark.parametrize("nb,C,R,events", [
    (2, 1, 1, False),
    pytest.param(3, 1, 2, False, marks=pytest.mark.slow),
    pytest.param(3, 1, 2, True, marks=pytest.mark.slow),
    (3, 2, 2, False),   # the 48 kHz stereo headline geometry
    pytest.param(3, 2, 2, True, marks=pytest.mark.slow),
    pytest.param(2, 2, 1, True, marks=pytest.mark.slow),
])
def test_kernel_matches_xla_pair(nb, C, R, events):
    cfg = EchoCanceller3Config()
    # Force the matmul-DFT backend in the XLA path so both sides use the
    # same transform realization bit-for-bit-comparable numerics.
    old = mxu_fft.default_backend
    mxu_fft.default_backend = lambda: "tpu"  # select the matmul-DFT
    try:
        st = _random_state(cfg, R, C)
        P = st.refined.H.shape[1]
        W2 = 2 * (P + nb - 1)
        chain = (RNG.normal(size=(W2, R, 65))
                 + 1j * RNG.normal(size=(W2, R, 65))
                 ).astype(np.complex64) * 300.0
        chain_spec = (np.abs(chain.real) ** 2 + np.abs(chain.imag) ** 2
                      ).astype(np.float32)
        offs = np.array([nb - 1 - k for k in range(nb)], np.int32)
        ys = RNG.normal(size=(nb, C, 64)).astype(np.float32) * 1000.0
        masks = np.zeros((nb, 65), bool)
        poors = np.zeros((nb,), bool)
        dchanges = np.zeros((nb,), bool)
        gchanges = np.zeros((nb,), bool)
        trans = np.zeros((nb,), bool)
        if events:
            masks[1, 10:15] = True
            dchanges[1] = True
            trans[0] = True

        X_windows = jnp.stack([
            jnp.asarray(chain[offs[k]:offs[k] + P]) for k in range(nb)
        ])
        spec_wins = jnp.stack([
            jnp.asarray(chain_spec[offs[k]:offs[k] + P]) for k in range(nb)
        ])

        ref_state, ref_outs = subt.process_pair(
            cfg, st, X_windows, spec_wins, jnp.asarray(ys),
            jnp.asarray(masks), jnp.asarray(poors),
            jnp.asarray(dchanges), jnp.asarray(gchanges), jnp.asarray(trans),
            jnp.asarray(False),
        )

        k_state, k_outs = sk.process_pair_kernel(
            cfg, st,
            jnp.asarray(chain),
            jnp.asarray(chain_spec.sum(axis=1)),
            jnp.asarray(offs), jnp.asarray(ys),
            jnp.asarray(masks), jnp.asarray(poors),
            jnp.asarray(dchanges), jnp.asarray(gchanges), jnp.asarray(trans),
            jnp.asarray(False),
            interpret=True, sb=1,
        )
    finally:
        mxu_fft.default_backend = old

    def close(a, b, name, tol=2e-3):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = max(np.abs(a).max(), 1e-3)
        err = np.abs(a - b).max() / denom
        assert err < tol, (name, err, denom)

    close(ref_state.refined.H.real, k_state.refined.H.real, "H.re")
    close(ref_state.refined.H.imag, k_state.refined.H.imag, "H.im")
    close(ref_state.coarse.H.real, k_state.coarse.H.real, "Hc.re")
    close(ref_state.refined_gain.H_error, k_state.refined_gain.H_error,
          "H_error")
    close(ref_state.refined_frequency_responses,
          k_state.refined_frequency_responses, "freq")
    close(ref_state.refined_impulse_responses,
          k_state.refined_impulse_responses, "impulse")
    np.testing.assert_array_equal(
        np.asarray(ref_state.refined.current_size),
        np.asarray(k_state.refined.current_size))
    np.testing.assert_array_equal(
        np.asarray(ref_state.refined.partition_to_constrain),
        np.asarray(k_state.refined.partition_to_constrain))
    np.testing.assert_array_equal(
        np.asarray(ref_state.poor_coarse_filter_counters),
        np.asarray(k_state.poor_coarse_filter_counters))
    for k in range(nb):
        for key in ("e_refined", "e_coarse", "y2", "e2_refined", "e2_coarse",
                    "s2_refined", "s2_coarse", "s_refined_max_abs",
                    "s_coarse_max_abs", "refined_frequency_responses",
                    "refined_impulse_responses"):
            close(ref_outs[k][key], k_outs[k][key], f"out[{k}].{key}")
        np.testing.assert_array_equal(
            np.asarray(ref_outs[k]["refined_current_size"]),
            np.asarray(k_outs[k]["refined_current_size"]))


@pytest.mark.slow
def test_apm_level_kernel_matches_xla_16k_stereo():
    """APM-level gate: the full AEC3 frame pipeline with the megakernel
    (interpret mode, via AEC3_PAIR_KERNEL_INTERPRET=1) matches the XLA
    pair path over several frames at the stereo-capture geometry the
    48 kHz headline uses (C_cap=2, C_ren=2)."""
    import os

    from webrtc_audio_processing_tpu.models.aec3 import (
        config as aec3_config,
        echo_canceller3 as ec3,
    )

    rng = np.random.default_rng(11)
    cfg = aec3_config.EchoCanceller3Config()
    geo = ec3.Aec3Geometry.create(cfg, 16000, 2, 2, pair_kernel=True)

    frames = []
    for _ in range(6):
        frames.append((
            rng.standard_normal((1, 160, 2)).astype(np.float32) * 800.0,
            rng.standard_normal((1, 160, 2)).astype(np.float32) * 500.0,
        ))

    def run(kernel: bool):
        os.environ["AEC3_PAIR_KERNEL_INTERPRET"] = "1" if kernel else "0"
        try:
            # Fresh closure per mode: the env var is read at trace time,
            # so the two modes must not share a jit cache entry.
            def step(state, r, c, parity, n0):
                return ec3.process_frame(geo, state, r, c, parity, n0=n0)

            jstep0 = jax.jit(lambda s, r, c, n0: step(s, r, c, 0, n0))
            jstep1 = jax.jit(lambda s, r, c, n0: step(s, r, c, 1, n0))
            state = ec3.init_state(geo)
            outs = []
            n0 = 0
            for i, (r, c) in enumerate(frames):
                j = jstep0 if i % 2 == 0 else jstep1
                state, out, _lin = j(state, jnp.asarray(r), jnp.asarray(c),
                                     jnp.asarray(n0, jnp.int32))
                n0 += 2 if i % 2 == 0 else 3
                outs.append(np.asarray(out))
            return outs, state
        finally:
            os.environ["AEC3_PAIR_KERNEL_INTERPRET"] = "0"

    outs_x, state_x = run(False)
    outs_k, state_k = run(True)
    for i, (a, b) in enumerate(zip(outs_x, outs_k)):
        denom = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / denom < 2e-3, (i, np.abs(a - b).max())
    Hx = np.asarray(state_x.remover.subtractor.refined.H)
    Hk = np.asarray(state_k.remover.subtractor.refined.H)
    assert (np.abs(Hx - Hk).max() / max(np.abs(Hx).max(), 1e-3)) < 2e-3
