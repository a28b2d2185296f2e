"""Matched-filter NLMS kernel equivalence tests (ops/pallas_mf.py).

Runs the Pallas kernel in interpret mode against the reference-order
per-sample scan (_nlms_scan) across batch/tile shapes, both downsampling
geometries, and gating edge cases. Guards the Gram (blocked-NLMS)
reformulation of the kernel body: identical gate decisions and ~1e-6
relative agreement on filters/errors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_audio_processing_tpu.ops import pallas_mf as pm

F = np.float32
RNG = np.random.default_rng(5)


def _inputs(B, ds_size, n_filters, taps, scale=400.0, sub=16):
    low = jnp.asarray(RNG.standard_normal((B, ds_size)).astype(F) * scale)
    lr = jnp.asarray(RNG.integers(0, ds_size, B).astype(np.int32))
    h0 = jnp.asarray(RNG.standard_normal((B, n_filters, taps)).astype(F) * 0.01)
    y = jnp.asarray(RNG.standard_normal((B, sub)).astype(F) * scale)
    sm = jnp.full((B,), 0.7, jnp.float32)
    return low, lr, h0, y, sm


def _compare(B, shift, ds_size, n_filters=5, taps=512, scale=400.0,
             sub=16, sat=False):
    thr = taps * 150.0**2
    low, lr, h0, y, sm = _inputs(B, ds_size, n_filters, taps, scale, sub)
    if sat:
        y = y.at[:, 3].set(32001.0)  # saturation gate on sample 3

    ref = jax.vmap(
        lambda lo, r, h, yy, s: pm._nlms_scan(
            lo, r, h, yy, s, n_filters=n_filters, shift=shift,
            ds_size=ds_size, threshold=thr, sub=sub, taps=taps,
        )
    )(low, lr, h0, y, sm)
    out = pm.matched_filter_nlms(
        low, lr, h0, y, sm, n_filters=n_filters, shift=shift,
        ds_size=ds_size, threshold=thr, sub=sub, taps=taps, interpret=True,
    )
    names = ("h", "alphas", "err", "upd", "segs")
    for nm, a, b in zip(names, ref, out):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = np.max(np.abs(a)) + 1e-30
        rel = np.max(np.abs(a - b)) / denom
        tol = 0.0 if nm in ("upd", "segs") else 2e-5
        assert rel <= tol, (nm, rel)


class TestKernelEquivalence:
    def test_ds4_geometry(self):
        _compare(B=4, shift=384, ds_size=1536)

    def test_ds8_geometry(self):
        _compare(B=4, shift=192, ds_size=768, sub=8)

    def test_nonmultiple_batch_pads(self):
        # B=3 exercises the zero-padding path of the custom_vmap wrapper.
        _compare(B=3, shift=384, ds_size=1536)

    def test_saturation_gates_update(self):
        _compare(B=2, shift=384, ds_size=1536, sat=True)

    def test_low_level_no_update(self):
        thr = 512 * 150.0**2
        low, lr, h0, y, sm = _inputs(2, 1536, 5, 512, scale=5.0)
        out = pm.matched_filter_nlms(
            low, lr, h0, y, sm, n_filters=5, shift=384, ds_size=1536,
            threshold=thr, interpret=True,
        )
        h, alphas, err, upd, segs = out
        np.testing.assert_array_equal(np.asarray(upd), False)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h0))
        np.testing.assert_array_equal(np.asarray(alphas), 0.0)


def _compare_t(B, shift, ds_size, n_filters=5, taps=512, scale=400.0,
               sub=16, sat=False):
    """Transposed (streams-on-lanes) kernel vs the reference-order scan."""
    thr = taps * 150.0**2
    low, lr, h0, y, sm = _inputs(B, ds_size, n_filters, taps, scale, sub)
    if sat:
        y = y.at[:, 3].set(32001.0)
    ref = jax.vmap(
        lambda lo, r, h, yy, s: pm._nlms_scan(
            lo, r, h, yy, s, n_filters=n_filters, shift=shift,
            ds_size=ds_size, threshold=thr, sub=sub, taps=taps,
        )
    )(low, lr, h0, y, sm)
    out = pm.matched_filter_nlms_t(
        low, lr, h0, y, sm, n_filters=n_filters, shift=shift,
        ds_size=ds_size, threshold=thr, sub=sub, taps=taps, interpret=True,
    )
    for nm, a, b in zip(("h", "alphas", "err", "upd", "segs"), ref, out):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)
        tol = 0.0 if nm in ("upd", "segs") else 2e-5
        assert rel <= tol, (nm, rel)


class TestTransposedKernelEquivalence:
    def test_ds4_geometry(self):
        _compare_t(B=128, shift=384, ds_size=1536)

    def test_ds8_geometry(self):
        _compare_t(B=128, shift=192, ds_size=768, sub=8, taps=256)

    def test_saturation_gates_update(self):
        _compare_t(B=128, shift=384, ds_size=1536, sat=True)
