"""Fused adapt_and_constrain_filter vs the sequential adapt+constrain pair.

The fused path (subtractor.py:255) promises bitwise equivalence with
``adapt_filter`` followed by ``constrain_filter``; its one-hot
partition selects use per-operand (DEFAULT, HIGHEST) matmul precision
whose exactness claim is TPU-lowering-dependent. These tests pin both:
in-process on CPU (precision is a no-op there) and, when the real chip
is reachable, in a subprocess on TPU where the bf16 3-pass
reconstruction actually runs (adaptive_fir_filter.cc AdaptPartitions /
Constrain are the reference counterparts).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.models.aec3 import subtractor as sub

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _random_case(seed, c_cap=1, c_ren=2, p_max=13, cur=9, pc=4):
    rng = np.random.default_rng(seed)

    def cplx(shape):
        return (rng.standard_normal(shape)
                + 1j * rng.standard_normal(shape)).astype(np.complex64)

    st = sub.init_filter(c_cap, p_max, cur, c_ren)
    st = st.replace(
        H=jnp.asarray(cplx((c_cap, p_max, c_ren, sub.NUM_BINS))),
        partition_to_constrain=jnp.asarray(pc, jnp.int32),
    )
    X = jnp.asarray(cplx((p_max, c_ren, sub.NUM_BINS)))
    G = jnp.asarray(cplx((c_cap, sub.NUM_BINS)))
    ir = jnp.asarray(
        rng.standard_normal((c_cap, p_max * sub.BLOCK_SIZE))
        .astype(np.float32))
    return st, X, G, ir


@pytest.mark.parametrize("seed,pc", [(0, 0), (1, 4), (2, 8)])
def test_fused_matches_sequential(seed, pc):
    st, X, G, ir = _random_case(seed, pc=pc)

    fused_st, fused_ir = jax.jit(sub.adapt_and_constrain_filter)(
        st, X, G, ir)
    seq_st = jax.jit(sub.adapt_filter)(st, X, G)
    seq_st, seq_ir = jax.jit(sub.constrain_filter)(seq_st, ir)

    np.testing.assert_array_equal(np.asarray(fused_st.H),
                                  np.asarray(seq_st.H))
    np.testing.assert_array_equal(np.asarray(fused_ir),
                                  np.asarray(seq_ir))
    assert int(fused_st.partition_to_constrain) == int(
        seq_st.partition_to_constrain)


def test_one_hot_select_matches_indexing():
    """The (DEFAULT, HIGHEST) one-hot contraction must reproduce direct
    row indexing exactly (the in-code claim at subtractor.py:275-282)."""
    st, X, G, _ = _random_case(3, pc=6)
    pc = 6
    p_max = st.H.shape[1]
    mask = (jnp.arange(p_max) < st.current_size).astype(jnp.float32)
    Xm = jnp.conj(X) * mask[:, None, None]
    pc_f = (jnp.arange(p_max) == pc).astype(jnp.float32)
    prec = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)

    def selects(H, Xm):
        H_pc = jax.lax.complex(
            jnp.einsum("p,cprk->crk", pc_f, H.real, precision=prec),
            jnp.einsum("p,cprk->crk", pc_f, H.imag, precision=prec))
        X_pc = jax.lax.complex(
            jnp.einsum("p,prk->rk", pc_f, Xm.real, precision=prec),
            jnp.einsum("p,prk->rk", pc_f, Xm.imag, precision=prec))
        return H_pc, X_pc

    H_pc, X_pc = jax.jit(selects)(st.H, Xm)
    np.testing.assert_array_equal(np.asarray(H_pc), np.asarray(st.H[:, pc]))
    np.testing.assert_array_equal(np.asarray(X_pc), np.asarray(Xm[pc]))


_TPU_SNIPPET = r"""
import os, sys
os.environ.pop("JAX_PLATFORMS", None)
sys.path.insert(0, {repo!r})
import jax
if jax.devices()[0].platform == "cpu":
    print("NO_TPU"); sys.exit(0)
import numpy as np
sys.path.insert(0, {tests!r})
from test_subtractor_fused import _random_case
from webrtc_audio_processing_tpu.models.aec3 import subtractor as sub
st, X, G, ir = _random_case(7, pc=5)
fused_st, fused_ir = jax.jit(sub.adapt_and_constrain_filter)(st, X, G, ir)
seq_st = jax.jit(sub.adapt_filter)(st, X, G)
seq_st, seq_ir = jax.jit(sub.constrain_filter)(seq_st, ir)
np.testing.assert_array_equal(np.asarray(fused_st.H), np.asarray(seq_st.H))
np.testing.assert_array_equal(np.asarray(fused_ir), np.asarray(seq_ir))
pc = 5
import jax.numpy as jnp
p_max = st.H.shape[1]
mask = (jnp.arange(p_max) < st.current_size).astype(jnp.float32)
Xm = jnp.conj(X) * mask[:, None, None]
pc_f = (jnp.arange(p_max) == pc).astype(jnp.float32)
prec = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)
H_pc = jax.jit(lambda H: jax.lax.complex(
    jnp.einsum("p,cprk->crk", pc_f, H.real, precision=prec),
    jnp.einsum("p,cprk->crk", pc_f, H.imag, precision=prec)))(st.H)
np.testing.assert_array_equal(np.asarray(H_pc), np.asarray(st.H[:, pc]))
print("TPU_OK")
"""


@pytest.mark.slow
def test_fused_matches_sequential_on_tpu():
    """Same equivalences on the real chip, where (DEFAULT, HIGHEST)
    actually changes the lowering. Skips when the TPU tunnel is down."""
    snippet = _TPU_SNIPPET.format(
        repo=REPO, tests=os.path.join(REPO, "tests"))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    try:
        r = subprocess.run([sys.executable, "-c", snippet],
                           capture_output=True, text=True, timeout=600,
                           env=env)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU compile/attach timed out")
    if "NO_TPU" in r.stdout or r.returncode != 0 and "TPU" not in r.stdout:
        pytest.skip(f"TPU unavailable: {r.stderr[-300:]}")
    assert "TPU_OK" in r.stdout, (r.stdout, r.stderr[-2000:])
