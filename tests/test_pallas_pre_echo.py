"""ops/pallas_pre_echo: pre-echo error chunks — kernel vs references.

Checks the Pallas kernel (interpret mode), the XLA scan fallback, and an
independent dense reconstruction (the round-1 triangular-matmul
formulation) against each other on random NLMS traces."""

import numpy as np
import jax
import jax.numpy as jnp

from webrtc_audio_processing_tpu.ops import pallas_pre_echo as ppe


def _dense_ref(seg, h0, alphas, y, sub, taps, rate):
    """Round-1 formulation: explicit window stacks + triangular matmuls."""
    chunks = taps // rate
    xw = np.stack([seg[sub - 1 - i : sub - 1 - i + taps] for i in range(sub)])
    inclusive = np.tril(np.ones((chunks, chunks), np.float32)).T
    strict = np.tril(np.ones((sub, sub), np.float32), k=-1)
    P0 = (h0[None, :] * xw).reshape(sub, chunks, rate).sum(-1) @ inclusive
    Wex = strict @ (alphas[:, None] * xw)
    PW = (Wex * xw).reshape(sub, chunks, rate).sum(-1) @ inclusive
    s_partial = P0 + PW
    return np.sum((y[:, None] - s_partial) ** 2, axis=0)


def test_pre_echo_kernel_matches_references():
    sub, taps, rate, B = 16, 512, 4, 12
    rng = np.random.default_rng(0)
    seg = rng.standard_normal((B, sub - 1 + taps)).astype(np.float32)
    h0 = (rng.standard_normal((B, taps)) * 0.1).astype(np.float32)
    alphas = (rng.standard_normal((B, sub)) * 0.01).astype(np.float32)
    y = rng.standard_normal((B, sub)).astype(np.float32)

    dense = np.stack(
        [_dense_ref(seg[b], h0[b], alphas[b], y[b], sub, taps, rate)
         for b in range(B)]
    )
    scan = np.asarray(
        jax.vmap(
            lambda s, h, a, yy: ppe.pre_echo_inst_xla(
                s, h, a, yy, sub=sub, taps=taps, acc_rate=rate
            )
        )(seg, h0, alphas, y)
    )
    kern = np.asarray(
        jax.vmap(ppe.make_pre_echo(sub, taps, rate, interpret=True))(
            jnp.asarray(seg), jnp.asarray(h0), jnp.asarray(alphas),
            jnp.asarray(y),
        )
    )
    scale = np.maximum(np.abs(dense), 1.0)
    np.testing.assert_allclose(scan / scale, dense / scale, atol=2e-4)
    np.testing.assert_allclose(kern / scale, scan / scale, atol=2e-4)


def test_pre_echo_transposed_kernel_matches_scan():
    # B=128 routes make_pre_echo's vmap through the transposed
    # (streams-on-lanes) kernel; check against the reference-order scan.
    sub, taps, rate, B = 16, 512, 4, 128
    rng = np.random.default_rng(7)
    seg = rng.standard_normal((B, sub - 1 + taps)).astype(np.float32)
    h0 = (rng.standard_normal((B, taps)) * 0.1).astype(np.float32)
    alphas = (rng.standard_normal((B, sub)) * 0.01).astype(np.float32)
    y = rng.standard_normal((B, sub)).astype(np.float32)
    scan = np.asarray(
        jax.vmap(
            lambda s, h, a, yy: ppe.pre_echo_inst_xla(
                s, h, a, yy, sub=sub, taps=taps, acc_rate=rate
            )
        )(seg, h0, alphas, y)
    )
    kern = np.asarray(
        ppe._pre_echo_tpu_t(
            jnp.asarray(seg), jnp.asarray(h0), jnp.asarray(alphas),
            jnp.asarray(y), sub=sub, taps=taps, acc_rate=rate,
            interpret=True,
        )
    )
    scale = np.maximum(np.abs(scan), 1.0)
    np.testing.assert_allclose(kern / scale, scan / scale, atol=2e-4)


def test_pre_echo_transposed_kernel_ds8_geometry():
    sub, taps, rate, B = 8, 256, 4, 128
    rng = np.random.default_rng(8)
    seg = rng.standard_normal((B, sub - 1 + taps)).astype(np.float32)
    h0 = (rng.standard_normal((B, taps)) * 0.1).astype(np.float32)
    alphas = (rng.standard_normal((B, sub)) * 0.01).astype(np.float32)
    y = rng.standard_normal((B, sub)).astype(np.float32)
    scan = np.asarray(
        jax.vmap(
            lambda s, h, a, yy: ppe.pre_echo_inst_xla(
                s, h, a, yy, sub=sub, taps=taps, acc_rate=rate
            )
        )(seg, h0, alphas, y)
    )
    kern = np.asarray(
        ppe._pre_echo_tpu_t(
            jnp.asarray(seg), jnp.asarray(h0), jnp.asarray(alphas),
            jnp.asarray(y), sub=sub, taps=taps, acc_rate=rate,
            interpret=True,
        )
    )
    scale = np.maximum(np.abs(scan), 1.0)
    np.testing.assert_allclose(kern / scale, scan / scale, atol=2e-4)


def test_pre_echo_kernel_ds8_geometry():
    # 8 kHz-path geometry: sub=8, shorter filters.
    sub, taps, rate, B = 8, 256, 4, 5
    rng = np.random.default_rng(1)
    seg = rng.standard_normal((B, sub - 1 + taps)).astype(np.float32)
    h0 = (rng.standard_normal((B, taps)) * 0.1).astype(np.float32)
    alphas = (rng.standard_normal((B, sub)) * 0.01).astype(np.float32)
    y = rng.standard_normal((B, sub)).astype(np.float32)
    scan = np.asarray(
        jax.vmap(
            lambda s, h, a, yy: ppe.pre_echo_inst_xla(
                s, h, a, yy, sub=sub, taps=taps, acc_rate=rate
            )
        )(seg, h0, alphas, y)
    )
    kern = np.asarray(
        jax.vmap(ppe.make_pre_echo(sub, taps, rate, interpret=True))(
            jnp.asarray(seg), jnp.asarray(h0), jnp.asarray(alphas),
            jnp.asarray(y),
        )
    )
    scale = np.maximum(np.abs(scan), 1.0)
    np.testing.assert_allclose(kern / scale, scan / scale, atol=2e-4)
