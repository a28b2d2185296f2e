"""AecState integration test ported from aec_state_unittest.cc NormalUsage.

Drives aec_state.update through the real render ring: linear-estimate
usability transitions, active-render detection, and the exact alternating
ERL/ERLE values produced by a 2-block-periodic impulse render signal."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aec3 import (
    aec_state as aecs,
    config as aec3_config,
    render_buffer as rb,
)

CFG = aec3_config.EchoCanceller3Config()
F = np.float32
P = CFG.filter.refined.length_blocks  # 13


def _sub_out(c=1):
    # SubtractorOutput::ComputeMetrics for y=1000, e=s=100 per sample:
    # converged (e2 << y2), unsaturated.
    ones = jnp.ones((c,), jnp.float32)
    return dict(
        y2=1000.0**2 * 64 * ones,
        e2_refined=100.0**2 * 64 * ones,
        e2_coarse=100.0**2 * 64 * ones,
        s_refined_max_abs=100.0 * ones,
        s_coarse_max_abs=100.0 * ones,
    )


def _freq_resp(c=1):
    fr = np.full((c, P, 65), 0.01, F)
    fr[0, 2, :] = 100.0
    fr[0, 2, 0] = 1.0
    return jnp.asarray(fr)


def _mk_update(geo, E2, Y2, sub):
    fr = _freq_resp()
    ir = jnp.zeros((1, P * 64), jnp.float32)

    def upd(aec, ring, n):
        return aecs.update(
            CFG, aec, geo, rb.RenderView(state=ring, n=n),
            jnp.asarray(10, jnp.int32), jnp.asarray(True),
            fr, ir, jnp.asarray(P, jnp.int32), E2, Y2, sub,
        )

    return upd


def test_normal_usage():
    geo = rb.BufferGeometry.create(CFG, 16000, 1)
    ring = rb.init_state(geo, CFG)
    aec = aecs.init_state(CFG, 1, P)

    E2 = jnp.zeros((1, 65), jnp.float32)
    Y2 = jnp.zeros((1, 65), jnp.float32)
    sub = _sub_out()
    upd = _mk_update(geo, E2, Y2, sub)
    x_active = jnp.full((1, 64, 1), 101.0, jnp.float32)

    @jax.jit
    def insert_and_update(carry, _):
        ring, aec, n = carry
        ring, _ = rb.insert(geo, CFG, ring, x_active, n)
        aec = upd(aec, ring, n)
        return (ring, aec, n + 1), None

    # 1) Converged filter + active render -> usable linear estimate.
    (ring, aec, n), _ = jax.lax.scan(
        insert_and_update, (ring, aec, jnp.asarray(1, jnp.int32)), None,
        length=3000,
    )
    assert bool(aec.usable_linear_estimate)

    # 2) A reported delay change clears usability.
    aec = aecs.handle_echo_path_change(
        CFG, aec, jnp.asarray(True), jnp.asarray(False)
    )
    aec = upd(aec, ring, n)
    assert not bool(aec.usable_linear_estimate)

    # 3) Active render detection: right after the reset the counters are
    # cleared; sustained loud render re-raises them.
    aec = aecs.handle_echo_path_change(
        CFG, aec, jnp.asarray(True), jnp.asarray(False)
    )
    aec = upd(aec, ring, n)
    assert int(aec.blocks_with_active_render) <= 1
    (ring, aec, n), _ = jax.lax.scan(
        insert_and_update, (ring, aec, n), None, length=1000
    )
    assert int(aec.blocks_with_active_render) > 900

    # 4) ERL: render = impulse train with period 2 blocks (5000 at sample 0
    # of every block) -> FFT energy only in EVEN bins (1e8); with
    # Y2 = 1e9 the even-bin ERL converges to 10 and the odd bins decay to
    # the 1000 maximum (aec_state_unittest.cc:141-175).
    x_imp = jnp.zeros((1, 64, 1), jnp.float32).at[0, 0, 0].set(5000.0)

    @jax.jit
    def insert_only(carry, _):
        ring, n = carry
        ring, _ = rb.insert(geo, CFG, ring, x_imp, n)
        return (ring, n + 1), None

    (ring, n), _ = jax.lax.scan(
        insert_only, (ring, n), None, length=geo.num_blocks
    )

    Y2_erl = jnp.full((1, 65), 10.0 * 1.0e8, jnp.float32)
    upd_erl = _mk_update(geo, E2, Y2_erl, sub)

    @jax.jit
    def update_only_erl(aec, _):
        return upd_erl(aec, ring, n), None

    aec, _ = jax.lax.scan(update_only_erl, aec, None, length=1000)
    assert bool(aec.usable_linear_estimate)
    erl = np.asarray(aec.erl.erl)
    assert erl[0] == erl[1]
    np.testing.assert_allclose(erl[2:64:2], 10.0, atol=0.1)
    np.testing.assert_allclose(erl[3:63:2], 1000.0, atol=0.1)
    assert erl[63] == erl[64]

    # 5) ERLE on the same even-bin render: E2 = 1e8, Y2 = 10*E2 -> even
    # bins hit the band maxima (4.0 low, 1.5 high), odd bins stay at min.
    E2_erle = jnp.full((1, 65), 1.0e8, jnp.float32)
    Y2_erle = 10.0 * E2_erle
    upd_erle = _mk_update(geo, E2_erle, Y2_erle, sub)

    @jax.jit
    def update_only_erle(aec, _):
        return upd_erle(aec, ring, n), None

    aec, _ = jax.lax.scan(update_only_erle, aec, None, length=1000)
    assert bool(aec.usable_linear_estimate)
    erle, _, _ = aecs.erle_arrays(CFG, aec.erle)
    erle = np.asarray(erle)[0]
    assert erle[0] == erle[1]
    np.testing.assert_allclose(erle[2:32:2], 4.0, atol=0.1)
    np.testing.assert_allclose(erle[32:63:2], 1.5, atol=0.1)
    assert erle[63] == erle[64]
