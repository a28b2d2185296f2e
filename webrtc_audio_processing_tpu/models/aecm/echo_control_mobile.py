"""AECM frame-level wrapper: 10ms frames -> 64-sample core blocks.

Reference: aecm/echo_control_mobile.{h,cc} + aecm_core.cc
WebRtcAecm_ProcessFrame (frame rebuffering, far-frame fetch by known
delay, output stuffing) and BufferFarFrame/FetchFarFrame.

Design notes (TPU-first):
- The reference's ECstartup / checkBuffSize / EstBufDelay machinery
  (echo_control_mobile.cc:289-363, 538-576) stabilizes against jittery
  sound-card buffer reports. In this framework render/capture arrive as
  paired frames with an explicit `stream_delay_ms`, so the far fetch is a
  direct ring lookup at that delay; the internal binary delay estimator
  (core.py) absorbs the residual, exactly as it does in the reference.
- The 80/160-sample frame to 64-sample block rebuffering has a
  deterministic leftover cycle (period 64/gcd(frame,64): 2 at 16 kHz, 4 at
  8 kHz), so `parity` is a static argument and each parity compiles its
  own fixed number of core blocks - same pattern as the AEC3 wrapper.
- Output short-fall stuffing (aecm_core.cc:1380-1386 MoveReadPtr) is
  reproduced with an output ring whose read pointer can move back into
  zero-initialized space on the first frames.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.models.aecm import core as aecm_core

FAR_RING = 2048
OUT_RING = 512


def _block_schedule(frame_len: int):
    """Leftover/blocks cycle for frame_len -> 64-sample blocks."""
    period = 64 // math.gcd(frame_len, 64)
    leftovers, blocks = [], []
    l = 0
    for _ in range(period):
        leftovers.append(l)
        blocks.append((l + frame_len) // aecm_core.PART_LEN)
        l = (l + frame_len) % aecm_core.PART_LEN
    return tuple(leftovers), tuple(blocks)


@dataclasses.dataclass(frozen=True)
class AecmGeometry:
    """Static AECM configuration (echo_control_mobile.cc AecmConfig)."""

    sample_rate_hz: int = 16000  # band-0 rate: 8000 or 16000
    echo_mode: int = 3  # routing mode 0-4 (default Speakerphone)
    cng: bool = True
    nlp: bool = True

    @property
    def frame_len(self) -> int:
        return self.sample_rate_hz // 100

    @property
    def mult(self) -> int:
        return self.sample_rate_hz // 8000

    @property
    def period(self) -> int:
        return len(_block_schedule(self.frame_len)[0])

    @property
    def schedule(self):
        return _block_schedule(self.frame_len)


@struct.dataclass
class AecmState:
    core: aecm_core.AecmCoreState
    far_ring: jnp.ndarray  # (FAR_RING,) int32
    far_written: jnp.ndarray  # () int32 absolute samples
    far_leftover: jnp.ndarray  # (64,) int32 synced far tail
    near_leftover: jnp.ndarray  # (64,) int32
    near_abs: jnp.ndarray  # () int32 absolute near samples consumed
    out_ring: jnp.ndarray  # (OUT_RING,) int32
    out_written: jnp.ndarray  # () int32
    out_read: jnp.ndarray  # () int32


def init_state(geo: AecmGeometry) -> AecmState:
    return AecmState(
        core=aecm_core.init_core(geo.sample_rate_hz, geo.echo_mode),
        far_ring=jnp.zeros((FAR_RING,), jnp.int32),
        far_written=jnp.asarray(0, jnp.int32),
        far_leftover=jnp.zeros((64,), jnp.int32),
        near_leftover=jnp.zeros((64,), jnp.int32),
        near_abs=jnp.asarray(0, jnp.int32),
        out_ring=jnp.zeros((OUT_RING,), jnp.int32),
        out_written=jnp.asarray(0, jnp.int32),
        out_read=jnp.asarray(0, jnp.int32),
    )


def buffer_farend(state: AecmState, far_frame) -> AecmState:
    """BufferFarFrame (aecm_core.cc:1441-1462): append to the far ring."""
    n = far_frame.shape[0]
    idx = jnp.mod(state.far_written + jnp.arange(n), FAR_RING)
    return state.replace(
        far_ring=state.far_ring.at[idx].set(far_frame.astype(jnp.int32)),
        far_written=state.far_written + n,
    )


SUB = 80  # FRAME_LEN: the reference always rebuffers in 80-sample frames


def process_frame(geo: AecmGeometry, state: AecmState, near_frame,
                  parity: int, delay_samples):
    """One 10ms capture frame (WebRtcAecm_Process enabled path,
    echo_control_mobile.cc:364-403 + WebRtcAecm_ProcessFrame,
    aecm_core.cc:1290-1360).

    near_frame: (frame_len,) int32 int16-valued; parity: static frame index
    mod `geo.period`; delay_samples: () int32 known render-to-capture delay,
    or (mult,) int32 for a per-80-sample-sub-frame delay (the reference's
    EstBufDelay FIFO stuffing makes the two sub-frame reads non-contiguous
    on the frame where it fires). Returns (state, out_frame).

    The reference processes `mult` consecutive FRAME_LEN=80 sub-frames per
    10 ms frame regardless of rate, each with its own 64-block rebuffering
    and 80-sample output read with shortfall stuffing — that exact cadence
    (including the three 16-sample stuffs after startup) is reproduced so
    the output stream is sample-aligned with the reference's.
    """
    F = geo.frame_len
    leftovers, blocks = _block_schedule(SUB)

    # Fetch the aligned far frame: the far samples that played exactly
    # `delay_samples` before the near samples now being consumed
    # (FetchFarFrame, aecm_core.cc:1464-1500, plus the render FIFO offset
    # the reference establishes at startup exit).
    ds = jnp.broadcast_to(jnp.asarray(delay_samples, jnp.int32), (geo.mult,))
    subs = []
    for s in range(geo.mult):
        start = state.near_abs + s * SUB - ds[s]
        pos = start + jnp.arange(SUB)
        subs.append(
            jnp.where(pos >= 0, state.far_ring[jnp.mod(pos, FAR_RING)], 0)
        )
    far_frame = jnp.concatenate(subs) if len(subs) > 1 else subs[0]
    near_frame = near_frame.astype(jnp.int32)

    core = state.core
    out_ring = state.out_ring
    out_written = state.out_written
    out_read = state.out_read
    near_l = state.near_leftover
    far_l = state.far_leftover
    outs = []
    for s in range(geo.mult):
        sub_parity = (parity * geo.mult + s) % len(leftovers)
        l_in = leftovers[sub_parity]
        n_blocks = blocks[sub_parity]
        l_out = (l_in + SUB) % aecm_core.PART_LEN
        near_cat = jnp.concatenate(
            [near_l[:l_in], near_frame[s * SUB:(s + 1) * SUB]]
        )
        far_cat = jnp.concatenate(
            [far_l[:l_in], far_frame[s * SUB:(s + 1) * SUB]]
        )
        for b in range(n_blocks):
            sl = slice(b * 64, (b + 1) * 64)
            core, out_block = aecm_core.process_block(
                core, far_cat[sl], near_cat[sl], geo.mult,
                echo_mode=geo.echo_mode, nlp=geo.nlp, cng=geo.cng,
            )
            widx = jnp.mod(out_written + jnp.arange(64), OUT_RING)
            out_ring = out_ring.at[widx].set(out_block)
            out_written = out_written + 64

        tail = n_blocks * aecm_core.PART_LEN
        near_l = jnp.pad(near_cat[tail:], (0, 64 - l_out))
        far_l = jnp.pad(far_cat[tail:], (0, 64 - l_out))

        # Output stuffing per 80-sample sub-frame (aecm_core.cc:1345-1351):
        # on shortfall the read pointer moves back, re-emitting ring
        # history (zero-initialized space on the very first sub-frame).
        avail = out_written - out_read
        out_read = jnp.where(avail < SUB, out_written - SUB, out_read)
        ridx = jnp.mod(out_read + jnp.arange(SUB), OUT_RING)
        outs.append(
            jnp.where((out_read + jnp.arange(SUB)) >= 0, out_ring[ridx], 0)
        )
        out_read = out_read + SUB

    return (
        state.replace(
            core=core,
            near_leftover=near_l,
            far_leftover=far_l,
            near_abs=state.near_abs + F,
            out_ring=out_ring,
            out_written=out_written,
            out_read=out_read,
        ),
        jnp.concatenate(outs) if len(outs) > 1 else outs[0],
    )


def get_echo_likelihood(state: AecmState):
    """Rough echo activity proxy from the suppression gain state."""
    return 1.0 - (
        state.core.sup_gain.astype(jnp.float32)
        / float(aecm_core.SUPGAIN_DEFAULT)
    ).clip(0.0, 1.0)
