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


def _random_state(cfg, R):
    st = subt.init_state(cfg, R, 1)
    P = st.refined.H.shape[1]
    Pc = st.coarse.H.shape[1]
    H = (RNG.normal(size=(1, P, R, 65)) + 1j * RNG.normal(size=(1, P, R, 65))
         ).astype(np.complex64) * 0.1
    Hc = (RNG.normal(size=(1, Pc, R, 65))
          + 1j * RNG.normal(size=(1, Pc, R, 65))).astype(np.complex64) * 0.1
    st = st.replace(
        refined=st.refined.replace(H=jnp.asarray(H)),
        coarse=st.coarse.replace(H=jnp.asarray(Hc)),
        refined_gain=st.refined_gain.replace(
            H_error=jnp.asarray(
                RNG.uniform(10.0, 1000.0, size=(1, 65)).astype(np.float32)),
            call_counter=jnp.asarray(40, jnp.int32),
            poor_excitation_counter=jnp.asarray(1200, jnp.int32),
        ),
        coarse_gain=st.coarse_gain.replace(
            call_counter=jnp.asarray(40, jnp.int32),
            poor_excitation_counter=jnp.asarray(1200, jnp.int32),
        ),
        refined_frequency_responses=jnp.asarray(
            RNG.uniform(0, 1, size=(1, P, 65)).astype(np.float32)),
        refined_impulse_responses=jnp.asarray(
            RNG.normal(size=(1, P * 64)).astype(np.float32) * 0.01),
    )
    return st


@pytest.mark.parametrize("nb,R,events", [
    (2, 1, False),
    (3, 2, False),
    (3, 2, True),
])
def test_kernel_matches_xla_pair(nb, R, events):
    cfg = EchoCanceller3Config()
    # Force the matmul-DFT backend in the XLA path so both sides use the
    # same transform realization bit-for-bit-comparable numerics.
    old = mxu_fft.default_backend
    mxu_fft.default_backend = lambda: "tpu"  # select the matmul-DFT
    try:
        st = _random_state(cfg, R)
        P = st.refined.H.shape[1]
        W2 = 2 * (P + nb - 1)
        chain = (RNG.normal(size=(W2, R, 65))
                 + 1j * RNG.normal(size=(W2, R, 65))
                 ).astype(np.complex64) * 300.0
        chain_spec = (np.abs(chain.real) ** 2 + np.abs(chain.imag) ** 2
                      ).astype(np.float32)
        offs = np.array([nb - 1 - k for k in range(nb)], np.int32)
        ys = RNG.normal(size=(nb, 1, 64)).astype(np.float32) * 1000.0
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
