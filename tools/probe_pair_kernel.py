"""Standalone compile+run probe for the Pallas subtractor pair-megakernel
on the real TPU chip (Mosaic compilation is the schedule risk — validate it
independently of the 20-minute full-APM compile).

Usage: python tools/probe_pair_kernel.py [C_cap] [R] [nb] [B]

Builds a representative kernel invocation (vmapped over B streams like the
serving path), jits it for the default backend, runs it twice, and prints
timing + output checksums. Exit code 0 = Mosaic compiled and executed.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from webrtc_audio_processing_tpu.models.aec3 import subtractor as subt
from webrtc_audio_processing_tpu.models.aec3 import subtractor_kernel as sk
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    rng = np.random.default_rng(0)
    cfg = EchoCanceller3Config()
    P = max(cfg.filter.refined.length_blocks,
            cfg.filter.refined_initial.length_blocks)
    Pc = max(cfg.filter.coarse.length_blocks,
             cfg.filter.coarse_initial.length_blocks)
    print(f"probe: C={C} R={R} nb={nb} B={B} P={P} Pc={Pc} "
          f"backend={jax.default_backend()}", flush=True)

    # Real 48k/16k geometry: W_chain = spec_win_len + nb - 1 with
    # spec_win_len ~= P + 4 (echo_remover.process_capture_pair).
    W_chain = P + 4 + nb - 1
    W2 = 2 * W_chain

    np_Hr = (rng.normal(size=(C, P, R, 65)) * 0.1).astype(np.float32)
    np_Hi = (rng.normal(size=(C, P, R, 65)) * 0.1).astype(np.float32)
    np_Hcr = (rng.normal(size=(C, Pc, R, 65)) * 0.1).astype(np.float32)
    np_Hci = (rng.normal(size=(C, Pc, R, 65)) * 0.1).astype(np.float32)

    # Keep every traced constant a NUMPY array: eagerly-created jnp arrays
    # baked as jit closure constants hit "UNIMPLEMENTED: TPU backend
    # error" through the axon attachment (memory: axon quirks).
    chain = ((rng.normal(size=(W2, R, 65)) + 1j * rng.normal(size=(W2, R, 65))
              ).astype(np.complex64) * 300.0)
    chain_spec_sum = rng.uniform(0, 9e4, size=(W2, 65)).astype(np.float32)
    offs = np.asarray([nb - 1 - k for k in range(nb)], np.int32)
    ys = (rng.normal(size=(nb, C, 64)).astype(np.float32) * 1000.0)
    masks = np.zeros((nb, 65), bool)
    poors = np.zeros((nb,), bool)
    dchanges = np.zeros((nb,), bool)
    gchanges = np.zeros((nb,), bool)
    trans = np.zeros((nb,), bool)

    def one(state, chain_r, chain_i, spec, y):
        new_state, outs = sk.process_pair_kernel(
            cfg, state, jax.lax.complex(chain_r, chain_i), spec,
            jnp.asarray(offs), y, jnp.asarray(masks), jnp.asarray(poors),
            jnp.asarray(dchanges), jnp.asarray(gchanges), jnp.asarray(trans),
            jnp.asarray(False),
        )
        return (new_state.refined.H.real.sum()
                + sum(o["e_refined"].sum() for o in outs),
                outs[0]["e_refined"])

    def make_inputs():
        st = subt.init_state(cfg, R, C)
        s = st.replace(
            refined=st.refined.replace(
                H=jax.lax.complex(jnp.asarray(np_Hr), jnp.asarray(np_Hi))),
            coarse=st.coarse.replace(
                H=jax.lax.complex(jnp.asarray(np_Hcr), jnp.asarray(np_Hci))),
            refined_gain=st.refined_gain.replace(
                call_counter=jnp.asarray(40, jnp.int32),
                poor_excitation_counter=jnp.asarray(1200, jnp.int32),
            ),
        )
        bst = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)),
            s)
        return (bst,
                jnp.broadcast_to(jnp.asarray(chain.real), (B,) + chain.shape),
                jnp.broadcast_to(jnp.asarray(chain.imag), (B,) + chain.shape),
                jnp.broadcast_to(jnp.asarray(chain_spec_sum),
                                 (B,) + chain_spec_sum.shape),
                jnp.broadcast_to(jnp.asarray(ys), (B,) + ys.shape))

    bst, bchain_r, bchain_i, bspec, bys = jax.jit(make_inputs)()

    f = jax.jit(jax.vmap(one))
    t0 = time.perf_counter()
    s, e = f(bst, bchain_r, bchain_i, bspec, bys)
    jax.block_until_ready(s)
    t1 = time.perf_counter()
    print(f"compile+first run: {t1 - t0:.1f}s", flush=True)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        s, e = f(bst, bchain_r, bchain_i, bspec, bys)
    jax.block_until_ready(s)
    t1 = time.perf_counter()
    print(f"steady: {(t1 - t0) / reps * 1e3:.2f} ms/call "
          f"({(t1 - t0) / reps / B * 1e6:.1f} us/stream)", flush=True)
    print(f"checksum: {float(jnp.sum(s)):.6e} e0={float(jnp.sum(e)):.6e}",
          flush=True)
    print("PROBE_OK")


if __name__ == "__main__":
    main()
