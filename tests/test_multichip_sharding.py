"""Multi-chip sharding correctness on the 8 virtual CPU devices.

The reference scales by running one AudioProcessing object per stream
(SURVEY.md section 2.12); the TPU mapping is batch-axis data parallelism of
independent stream states over an ICI mesh. These tests build the real
``Mesh``/``NamedSharding`` step used by ``__graft_entry__.dryrun_multichip``
— the 48 kHz stereo full-APM HEADLINE serving step
(``apm.process_stream_pair``, same wiring as bench.py) — on the 8 virtual
CPU devices conftest provisions, and assert the sharded batch output
matches the unsharded vmap output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import __graft_entry__ as ge

RATE, CAP, REN = 48000, 2, 2


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual CPU devices (conftest XLA_FLAGS)")
    return Mesh(np.array(devices[:8]), ("streams",))


@pytest.fixture(scope="module")
def batch_inputs():
    init, pair_step, frame = ge._build(RATE, CAP, REN, 48000)
    state_one = init()
    batch = 16
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state_one
    )
    rng = np.random.default_rng(7)

    def mk(ch):
        return jnp.asarray(
            rng.standard_normal((batch, frame, ch)).astype(np.float32) * 0.03)

    return pair_step, state, (mk(REN), mk(CAP), mk(REN), mk(CAP))


@pytest.fixture(scope="module")
def sharded_step(mesh8, batch_inputs):
    pair_step, _state, _frames = batch_inputs
    shard = NamedSharding(mesh8, P("streams"))
    step = jax.jit(
        jax.vmap(pair_step, in_axes=(0, 0, 0, 0, 0, None)),
        in_shardings=(shard,) * 5 + (None,),
        out_shardings=(shard, shard),
    )
    return step, shard


def test_sharded_step_matches_vmap(batch_inputs, sharded_step):
    pair_step, state, (r0, c0, r1, c1) = batch_inputs
    step, shard = sharded_step
    n0 = jnp.asarray(0, jnp.int32)

    ref_state, ref_y = jax.jit(
        jax.vmap(pair_step, in_axes=(0, 0, 0, 0, 0, None))
    )(state, r0, c0, r1, c1, n0)

    st = jax.device_put(state, shard)
    args = [jax.device_put(a, shard) for a in (r0, c0, r1, c1)]
    new_state, y = step(st, *args, n0)

    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                               rtol=0, atol=1e-6)
    # State leaves: the partitioned compile may fuse reductions in a
    # different order than the single-device executable (measured: one
    # RNN-VAD pitch-strength leaf off by ~1e-9); everything else is bitwise.
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state),
        jax.tree_util.tree_leaves(ref_state),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-5
        )
    # The output really lives distributed over all 8 devices.
    assert len(y.sharding.device_set) == 8


def test_sharded_multi_frame_sequence(batch_inputs, sharded_step):
    """Run several frame pairs through the sharded step; state
    round-trips and independent streams stay in lockstep across shards."""
    pair_step, state, (r0, c0, r1, c1) = batch_inputs
    step, shard = sharded_step
    st = jax.device_put(state, shard)
    # Identical input on every lane: independent streams must stay in
    # lockstep across device shards.
    args = [
        jax.device_put(jnp.broadcast_to(a[:1], a.shape), shard)
        for a in (r0, c0, r1, c1)
    ]
    outs = []
    for f in range(3):
        n0 = jnp.asarray(5 * f, jnp.int32)
        st, y = step(st, *args, n0)
        outs.append(np.asarray(y))
    assert all(np.isfinite(o).all() for o in outs)
    # Lanes 0 and 1 live on the same shard; lane 15 is on another device.
    np.testing.assert_array_equal(outs[-1][0], outs[-1][1])
    np.testing.assert_allclose(outs[-1][0], outs[-1][15], rtol=0, atol=1e-4)
