"""carry_pack codec: bit-exact round-trip and packed-step equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.utils import carry_pack


def test_round_trip_mixed_tree():
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": jnp.asarray(3, jnp.int32),
        "c": jnp.asarray(True),
        "d": jnp.asarray([1, 2**31 - 1, 7], jnp.uint32),
        "big": jnp.ones((4, 600), jnp.float32),
        "bf": jnp.ones((3, 3), jnp.bfloat16),  # non-packable dtype
    }
    pack, unpack, info = carry_pack.make_codec(tree)
    out = unpack(pack(tree))
    assert info["n_big"] == 2  # big f32 + bf16
    for k in tree:
        assert out[k].dtype == tree[k].dtype, k
        np.testing.assert_array_equal(np.asarray(out[k], np.float32
                                                 if k == "bf" else None),
                                      np.asarray(tree[k], np.float32
                                                 if k == "bf" else None))


def test_round_trip_under_vmap_and_jit():
    tree = {
        "x": jnp.asarray([1.5, -2.0], jnp.float32),
        "n": jnp.asarray(5, jnp.int32),
        "flag": jnp.asarray(False),
    }
    pack, unpack, _ = carry_pack.make_codec(tree)

    def step(t):
        t = unpack(pack(t))
        return {"x": t["x"] * 2, "n": t["n"] + 1, "flag": ~t["flag"]}

    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape), tree
    )
    out = jax.jit(jax.vmap(step))(batched)
    np.testing.assert_array_equal(np.asarray(out["x"][0]), [3.0, -4.0])
    assert int(out["n"][1]) == 6 and bool(out["flag"][2])


def test_packed_apm_pair_step_equivalent():
    """The packed 16 kHz mono full-APM pair step matches the unpacked one.

    The codec itself is bit-exact (tests above), but the pack/unpack ops
    change XLA's fusion decisions around the step, which can reorder
    float reductions — compare outputs to float tolerance, and integer/
    bool state leaves exactly."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from webrtc_audio_processing_tpu import apm, config as cfg_mod
    from webrtc_audio_processing_tpu.utils import complex_boundary as cb

    c = cfg_mod.Config().replace(
        high_pass_filter=cfg_mod.HighPassFilter(enabled=True),
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
    )
    geo = apm.ApmGeometry.create(c, 16000, 1, render_input_rate=16000,
                                 num_render_channels=1)
    zero = jnp.asarray(0, jnp.int32)

    def pair(state, r0, c0, r1, c1, n0):
        state, _y0, _r, _s = apm.process_stream_pair(
            geo, state, c0, r0, 0, stream_delay_ms=zero,
            applied_input_volume=zero, n0=n0)
        state, y1, _r, _s = apm.process_stream_pair(
            geo, state, c1, r1, 1, stream_delay_ms=zero,
            applied_input_volume=zero, n0=n0 + 2)
        return state, y1

    enc0 = cb.init_encoded(lambda: apm.init_state(geo))
    pack, unpack, info = carry_pack.make_codec(enc0)
    assert info["n_packed"] > 50  # the state really is leaf-heavy

    rng = np.random.default_rng(0)
    fr = [jnp.asarray(rng.standard_normal((160, 1)).astype(np.float32))
          * 1000 for _ in range(4)]

    def plain(enc, *a):
        st, y = pair(cb.decode(enc), *a)
        return cb.encode(st), y

    def packed(pk, *a):
        st, y = pair(cb.decode(unpack(pk)), *a)
        return pack(cb.encode(st)), y

    e1, y1 = jax.jit(plain)(enc0, *fr, zero)
    p1, y2 = jax.jit(packed)(jax.jit(pack)(enc0), *fr, zero)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-4)
    l1 = jax.tree_util.tree_leaves(e1)
    l2 = jax.tree_util.tree_leaves(jax.jit(unpack)(p1))
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        an = np.asarray(a, np.float32 if a.dtype == jnp.bfloat16 else None)
        bn = np.asarray(b, np.float32 if b.dtype == jnp.bfloat16 else None)
        if np.issubdtype(an.dtype, np.floating):
            np.testing.assert_allclose(an, bn, rtol=1e-4, atol=1e-6)
        else:
            np.testing.assert_array_equal(an, bn)
