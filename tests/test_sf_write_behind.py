"""sf-ring write-behind staging (render_buffer.flush_sf_pending / sf_span).

The AEC3 sf ring defers its row writes to one chain per frame pair so the
ring updates in place on TPU (no whole-ring copies); readers overlay the
staged rows. These tests pin the contract: staged reads are bit-identical
to direct-write reads at every block of the pair cadence, and the flushed
ring equals the direct-write ring.
"""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.aec3 import render_buffer as rb
from webrtc_audio_processing_tpu.models.aec3.config import (
    EchoCanceller3Config,
)
from webrtc_audio_processing_tpu.models.aec3.echo_canceller3 import (
    Aec3Geometry,
)


def _setup():
    cfg = EchoCanceller3Config()
    geo = Aec3Geometry.create(cfg, 16000, 1, 1)
    return cfg, geo.buffer


def test_staged_reads_match_direct_writes():
    cfg, geo = _setup()
    rng = np.random.default_rng(3)

    buf_direct = rb.init_state(geo, cfg)
    buf_staged = rb.init_state(geo, cfg)

    n = 0
    for pair in range(4):
        pair_base = n
        buf_staged = rb.flush_sf_pending(geo, buf_staged, pair_base)
        for parity, n_blocks in ((0, 2), (1, 3)):
            slot_base = 0 if parity == 0 else rb.PAIR_BLOCKS - n_blocks
            for k in range(n_blocks):
                block = jnp.asarray(
                    rng.standard_normal((1, 64, 1)) * 1000.0, jnp.float32
                )
                n += 1
                buf_direct, _ = rb.insert(geo, cfg, buf_direct, block, n)
                buf_staged, _ = rb.insert(geo, cfg, buf_staged, block, n,
                                          sf_slot=slot_base + k)
            count = 2 if parity == 0 else rb.PAIR_BLOCKS
            view_d = rb.RenderView(buf_direct, jnp.asarray(n))
            view_s = rb.RenderView(buf_staged, jnp.asarray(n), count)

            # Window reads at the read position (subtractor/aec_state path).
            for W in (1, 13, geo.pad + 1):
                a = rb.sf_window(geo, view_d, W)
                b = rb.sf_window(geo, view_s, W)
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

            # Offset single-row reads (spectrum_at), covering the newest
            # staged row and ring history.
            for off in (0, 1, 5):
                a = rb.spectrum_at(geo, view_d, off)
                b = rb.spectrum_at(geo, view_s, off)
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

            # Blocks-ring reads (echo_remover lookback / GetBlock path).
            for W in (1, 6, geo.pad + 1):
                a = rb.block_window_back(geo, view_d, W)
                b = rb.block_window_back(geo, view_s, W)
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            a = rb.block_at(geo, view_d, 0)
            b = rb.block_at(geo, view_s, 0)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # After one more flush the staged ring equals the direct ring on every
    # readable row (reads cover [0, L + pad); the RING_SLACK scratch rows
    # receive ring_write_group's dump writes and are never read).
    buf_staged = rb.flush_sf_pending(geo, buf_staged, n)
    readable = geo.num_blocks + geo.pad
    np.testing.assert_array_equal(
        np.asarray(buf_direct.sf)[:readable],
        np.asarray(buf_staged.sf)[:readable],
    )
    np.testing.assert_array_equal(
        np.asarray(buf_direct.blocks)[:readable],
        np.asarray(buf_staged.blocks)[:readable],
    )


def test_first_flush_is_harmless():
    cfg, geo = _setup()
    buf = rb.init_state(geo, cfg)
    flushed = rb.flush_sf_pending(geo, buf, 0)
    readable = geo.num_blocks + geo.pad
    np.testing.assert_array_equal(np.asarray(buf.sf)[:readable],
                                  np.asarray(flushed.sf)[:readable])


def test_ring_write_group_matches_per_row_writes():
    """ring_write_group == K single-row ring_writes on readable rows, for
    starts covering the mirror, wrap, and interior cases."""
    cfg, geo = _setup()
    L, pad = geo.num_blocks, geo.pad
    readable = L + pad
    rng = np.random.default_rng(0)
    base = jnp.asarray(
        rng.standard_normal((L + pad + rb.RING_SLACK, geo.sf_row_fp)),
        jnp.float32,
    )
    # keep the mirror invariant in the starting buffer
    base = base.at[L:readable].set(base[:pad])
    for start in (0, 3, pad - 1, pad, 50, L - rb.PAIR_BLOCKS,
                  L - 4, L - 1):
        group = jnp.asarray(
            rng.standard_normal((rb.PAIR_BLOCKS, geo.sf_row_fp)),
            jnp.float32,
        )
        a = rb.ring_write_group(geo, base, group,
                                jnp.asarray(start, jnp.int32))
        b = base
        for i in range(rb.PAIR_BLOCKS):
            b = rb.ring_write(geo, b, group[i : i + 1],
                              jnp.asarray((start + i) % L, jnp.int32))
        np.testing.assert_array_equal(
            np.asarray(a)[:readable], np.asarray(b)[:readable],
            err_msg=f"start={start}",
        )
