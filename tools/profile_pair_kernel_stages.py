"""Stage-bisected on-chip timing of the subtractor pair-megakernel.

Rebuilds the kernel at each PAIR_KERNEL_STAGE cut point (the debug knob
in ops/pallas_subtractor.py) and times a jitted 50-call scan at serving
batch on the real chip, so each pipeline stage's incremental device cost
is measured directly — wall-clock per call, median of repeats (the axon
tunnel has multi-second stalls AND spuriously fast returns; see
bench.py).

Usage: python tools/profile_pair_kernel_stages.py [C] [R] [nb] [B]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from webrtc_audio_processing_tpu.models.aec3 import subtractor as subt
from webrtc_audio_processing_tpu.models.aec3 import subtractor_kernel as sk
from webrtc_audio_processing_tpu.ops import pallas_subtractor as pk
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config

# Cut points in ops/pallas_subtractor.py: 0 = empty loop, 2 = reset +
# window select + X2 sums, 3 = +apply/errors, 4 = +misadjustment, 5 =
# +error FFTs + refined gain, 6 = +refined adapt/constrain, 99 = full
# (+coarse path + outputs).
STAGES = [0, 2, 3, 4, 5, 6, 99]
SCAN = 50


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

    rng = np.random.default_rng(0)
    cfg = EchoCanceller3Config()
    P = max(cfg.filter.refined.length_blocks,
            cfg.filter.refined_initial.length_blocks)
    W2 = 2 * (P + 4 + nb - 1)
    print(f"stages: C={C} R={R} nb={nb} B={B} backend="
          f"{jax.default_backend()}", flush=True)

    chain_r = (rng.normal(size=(W2, R, 65)) * 300).astype(np.float32)
    chain_i = (rng.normal(size=(W2, R, 65)) * 300).astype(np.float32)
    spec = rng.uniform(0, 9e4, size=(W2, 65)).astype(np.float32)
    offs = np.asarray([nb - 1 - k for k in range(nb)], np.int32)
    ys = (rng.normal(size=(nb, C, 64)) * 1000).astype(np.float32)
    masks = np.zeros((nb, 65), bool)
    flags0 = np.zeros((nb,), bool)

    def make_chunk():
        # Fresh function objects per stage: jax.jit's trace cache is
        # keyed on function identity, so a shared `chunk` would reuse
        # the first stage's lowering for every later stage.
        def one(state, cr, ci, sp, y):
            new_state, outs = sk.process_pair_kernel(
                cfg, state, jax.lax.complex(cr, ci), sp,
                jnp.asarray(offs), y, jnp.asarray(masks),
                jnp.asarray(flags0), jnp.asarray(flags0),
                jnp.asarray(flags0), jnp.asarray(flags0),
                jnp.asarray(False), sb=int(os.environ.get("SB", "8")),
            )
            return new_state, outs[0]["e_refined"]

        def chunk(state, cr, ci, sp, y):
            def body(s, _):
                s2, e = jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
                    s, cr, ci, sp, y)
                return s2, e
            return jax.lax.scan(body, state, None, length=SCAN)

        return chunk

    def make_inputs():
        st = subt.init_state(cfg, R, C)
        st = st.replace(refined_gain=st.refined_gain.replace(
            call_counter=jnp.asarray(40, jnp.int32),
            poor_excitation_counter=jnp.asarray(1200, jnp.int32)))
        bst = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)),
            st)
        bt = lambda a: jnp.broadcast_to(jnp.asarray(a), (B,) + a.shape)
        return bst, bt(chain_r), bt(chain_i), bt(spec), bt(ys)

    inputs = jax.jit(make_inputs)()
    prev = None
    for stage in STAGES:
        pk._DEBUG_STAGE = stage
        sk._make_core.cache_clear()
        f = jax.jit(make_chunk())
        # Host fetch as the sync barrier: block_until_ready through the
        # axon tunnel returns spuriously early on this dispatch shape.
        t0 = time.perf_counter()
        s, e = f(*inputs)
        _ = np.asarray(e[-1, :2]).sum()
        compile_s = time.perf_counter() - t0
        dts = []
        for _ in range(5):
            t0 = time.perf_counter()
            s, e = f(*inputs)
            s, e = f(*inputs)
            _ = np.asarray(e[-1, :2]).sum()
            dts.append((time.perf_counter() - t0) / (2 * SCAN))
        dt = float(np.median(dts)) * 1e3
        delta = "" if prev is None else f"  (+{dt - prev:.3f})"
        print(f"stage<{stage:2d}: {dt:.3f} ms/call{delta}   "
              f"[compile {compile_s:.0f}s]", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
