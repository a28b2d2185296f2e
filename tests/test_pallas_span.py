"""ops/pallas_span: contiguous-span ring gather — kernel vs dynamic_slice.

The kernel is pure data movement, so the Pallas (interpret) path must be
bit-identical to the vmapped dynamic_slice fallback for every geometry the
AEC3 rings use (F = 384/260/130, bf16 and f32, batch not a multiple of the
stream tile)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from webrtc_audio_processing_tpu.ops import pallas_span


def _ref(ring, starts, W):
    return np.stack([r[s : s + W] for r, s in zip(ring, starts)])


def _pad_for(L, W):
    """Mirror size for the 8-aligned wide loads (render_buffer.create)."""
    return ((L - 1) // 8) * 8 + pallas_span.aligned_rows(W) - L


@pytest.mark.parametrize("F", [384, 260, 130, 7])
@pytest.mark.parametrize("B", [8, 12, 1])
def test_span_gather_matches_dynamic_slice(F, B):
    W, L = 13, 37
    PAD = _pad_for(L, W)
    rng = np.random.default_rng(F * 100 + B)
    ring = rng.standard_normal((B, L + PAD, F)).astype(np.float32)
    starts = rng.integers(0, L, size=(B,)).astype(np.int32)

    g = pallas_span.make_span_gather(W, interpret=True)
    out = jax.vmap(g)(jnp.asarray(ring), jnp.asarray(starts))
    np.testing.assert_array_equal(np.asarray(out), _ref(ring, starts, W))

    # Fallback (non-interpret on CPU) must agree too.
    g2 = pallas_span.make_span_gather(W)
    out2 = jax.vmap(g2)(jnp.asarray(ring), jnp.asarray(starts))
    np.testing.assert_array_equal(np.asarray(out2), _ref(ring, starts, W))


def test_span_gather_bf16_and_unbatched():
    W, L, F, B = 5, 20, 130, 6
    PAD = _pad_for(L, W)
    rng = np.random.default_rng(0)
    ring = rng.standard_normal((B, L + PAD, F)).astype(jnp.bfloat16)
    starts = rng.integers(0, L, size=(B,)).astype(np.int32)
    g = pallas_span.make_span_gather(W, interpret=True)
    out = jax.vmap(g)(jnp.asarray(ring), jnp.asarray(starts))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.float32)),
        _ref(np.asarray(ring.astype(jnp.float32)), starts, W),
    )
    # Unbatched call: plain dynamic_slice.
    one = g(jnp.asarray(ring[0]), jnp.asarray(starts[0]))
    np.testing.assert_array_equal(
        np.asarray(one.astype(jnp.float32)),
        np.asarray(ring[0, starts[0] : starts[0] + W].astype(jnp.float32)),
    )
