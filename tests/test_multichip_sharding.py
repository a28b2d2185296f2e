"""Multi-chip sharding correctness on the 8 virtual CPU devices.

The reference scales by running one AudioProcessing object per stream
(SURVEY.md section 2.12); the TPU mapping is batch-axis data parallelism of
independent stream states over an ICI mesh. These tests build the real
``Mesh``/``NamedSharding`` step used by ``__graft_entry__.dryrun_multichip``
on the 8 virtual CPU devices conftest provisions and assert the sharded
batch output is bitwise identical to the unsharded vmap output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import __graft_entry__ as ge
from webrtc_audio_processing_tpu.utils import complex_boundary as cb


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual CPU devices (conftest XLA_FLAGS)")
    return Mesh(np.array(devices[:8]), ("streams",))


@pytest.fixture(scope="module")
def batch_inputs():
    init_one, step_one = ge._build()
    state_one = cb.init_encoded(init_one)
    batch = 16
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state_one
    )
    rng = np.random.default_rng(7)
    render = jnp.asarray(
        rng.standard_normal((batch, ge.FRAME, 1)).astype(np.float32) * 1000
    )
    capture = jnp.asarray(
        rng.standard_normal((batch, ge.FRAME, 1)).astype(np.float32) * 1000
    )
    return step_one, state, render, capture


def test_sharded_step_matches_vmap(mesh8, batch_inputs):
    step_one, state, render, capture = batch_inputs
    n0 = jnp.asarray(0, jnp.int32)
    vstep = jax.vmap(cb.wrap_step(step_one), in_axes=(0, 0, 0, None))

    ref_state, ref_y = jax.jit(vstep)(state, render, capture, n0)

    shard = NamedSharding(mesh8, P("streams"))
    sharded = jax.jit(
        vstep,
        in_shardings=(shard, shard, shard, None),
        out_shardings=(shard, shard),
    )
    st = jax.device_put(state, shard)
    r = jax.device_put(render, shard)
    c = jax.device_put(capture, shard)
    new_state, y = sharded(st, r, c, n0)

    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref_y))
    # State leaves: the partitioned compile may fuse reductions in a
    # different order than the single-device executable (measured: one
    # RNN-VAD pitch-strength leaf off by ~1e-9); everything else is bitwise.
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state),
        jax.tree_util.tree_leaves(ref_state),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
        )
    # The output really lives distributed over all 8 devices.
    assert len(y.sharding.device_set) == 8


def test_sharded_multi_frame_sequence(mesh8, batch_inputs):
    """Run several frames through the sharded step; state round-trips."""
    step_one, state, render, capture = batch_inputs
    shard = NamedSharding(mesh8, P("streams"))
    vstep = jax.jit(
        jax.vmap(cb.wrap_step(step_one), in_axes=(0, 0, 0, None)),
        in_shardings=(shard, shard, shard, None),
        out_shardings=(shard, shard),
    )
    st = jax.device_put(state, shard)
    # Identical input on every lane: independent streams must stay in
    # lockstep across device shards.
    r = jax.device_put(
        jnp.broadcast_to(render[:1], render.shape), shard
    )
    c = jax.device_put(
        jnp.broadcast_to(capture[:1], capture.shape), shard
    )
    outs = []
    for f in range(4):
        n0 = jnp.asarray(5 * (f // 2) + 2 * (f % 2), jnp.int32)
        st, y = vstep(st, r, c, n0)
        outs.append(np.asarray(y))
    assert all(np.isfinite(o).all() for o in outs)
    # Lanes 0 and 1 live on the same shard; lane 15 is on another device.
    np.testing.assert_array_equal(outs[-1][0], outs[-1][1])
    np.testing.assert_allclose(outs[-1][0], outs[-1][15], rtol=0, atol=1e-4)
