"""AECM frame-level wrapper: 10ms frames -> 64-sample core blocks.

Reference: aecm/echo_control_mobile.{h,cc} + aecm_core.cc
WebRtcAecm_ProcessFrame (frame rebuffering, far-frame fetch by known
delay, output stuffing) and BufferFarFrame/FetchFarFrame.

Design notes (TPU-first):
- The reference's ECstartup / checkBuffSize / EstBufDelay machinery
  (echo_control_mobile.cc:289-363, 538-576) is mirrored as a per-stream
  scalar state machine: the outer farend FIFO (WebRtc ring_buffer) becomes
  an absolute-sample ring plus read/write counters, MoveReadPtr becomes a
  clamped counter jump, and the startup passthrough gates every core
  update behind a traced `ec_startup` select. The steady-state far-fetch
  lag the reference establishes (bufSizeStart frames retained at startup
  exit, EstBufDelay stuffs, knownDelay shifts) therefore reproduces
  exactly -- at stream delay 0 the core sees the far signal one 80-sample
  frame late, exactly as the reference's FIFO leaves it.
- The 80-sample sub-frame to 64-sample block rebuffering
  (WebRtcAecm_ProcessFrame's farFrameBuf/nearNoisyFrameBuf,
  aecm_core.cc:514-561) starts accumulating at the first ENABLED frame —
  the startup exit frame is data-dependent, so the leftover phase is a
  traced scalar, not a static parity. The leftover length cycles through
  {0, 16, 32, 48} (l' = (l+16) mod 64); the write-at-l is a 4-way select
  of statically-shifted concatenations, block 0/1 are static 64-sample
  slices of the 128-sample assembly, and the second core block (present
  only at l == 48) is computed unconditionally and committed by a
  tree-select — fixed shapes, no per-stream dynamic indices (the TPU
  vmap rule; see PERF.md).
- Output short-fall stuffing (aecm_core.cc:1380-1386 MoveReadPtr) is
  reproduced with an output ring whose read pointer can move back into
  zero-initialized space on the first frames.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.models.aecm import core as aecm_core

FAR_RING = 8192  # > FIFO_CAP + max in-flight; power of two for cheap mod
OUT_RING = 512
FIFO_CAP = 50 * 80  # kBufSizeSamp (echo_control_mobile.cc:32-39)
CORE_FAR_LEN = 256  # FAR_BUF_LEN = PART_LEN4 = 64<<2 (aecm_defines.h:19-25)


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
        # The 80->64 rebuffer phase is traced state (rebuf_fill), not a
        # static schedule — one compiled step covers every frame index.
        return 1

    @property
    def schedule(self):
        return _block_schedule(self.frame_len)


@struct.dataclass
class AecmState:
    core: aecm_core.AecmCoreState
    far_ring: jnp.ndarray  # (FAR_RING,) int32 raw render history
    far_written: jnp.ndarray  # () int32 absolute samples written (FIFO wr)
    far_leftover: jnp.ndarray  # (48,) int32 synced far tail (valid: rebuf_fill)
    near_leftover: jnp.ndarray  # (48,) int32
    rebuf_fill: jnp.ndarray  # () int32 leftover length in {0,16,32,48}
    near_abs: jnp.ndarray  # () int32 absolute near samples consumed
    out_ring: jnp.ndarray  # (OUT_RING,) int32
    out_written: jnp.ndarray  # () int32
    out_read: jnp.ndarray  # () int32
    # --- AecMobile FIFO / startup / buffer-delay machinery
    # (echo_control_mobile.h:40-70, all per-stream scalars).
    fifo_read: jnp.ndarray  # () int32 farendBuf read pos (abs samples)
    ec_startup: jnp.ndarray  # () bool
    check_buff_size: jnp.ndarray  # () bool
    check_buf_size_ctr: jnp.ndarray  # () int32
    stable_counter: jnp.ndarray  # () int32 (aecm->counter)
    first_val: jnp.ndarray  # () int32 ms
    ms_sum: jnp.ndarray  # () int32 (aecm->sum)
    buf_size_start: jnp.ndarray  # () int32 frames
    ms_in_sndcard: jnp.ndarray  # () int32 last clamped+10 delay report
    filt_delay: jnp.ndarray  # () int32
    known_delay: jnp.ndarray  # () int32
    last_known_delay: jnp.ndarray  # () int32 (core lastKnownDelay)
    last_delay_diff: jnp.ndarray  # () int32
    time_for_delay_change: jnp.ndarray  # () int32
    farend_old: jnp.ndarray  # (2, SUB) int32 last FIFO frames (farendOld)
    # Core-side far buffer (aecm_core farBuf): the POST-FIFO stream.
    fetched_ring: jnp.ndarray  # (CORE_FAR_LEN,) int32
    fetched_written: jnp.ndarray  # () int32 abs (farBufWritePos mod 512)
    fetch_read: jnp.ndarray  # () int32 abs (farBufReadPos mod 512)


def init_state(geo: AecmGeometry) -> AecmState:
    z = jnp.asarray(0, jnp.int32)
    return AecmState(
        core=aecm_core.init_core(geo.sample_rate_hz, geo.echo_mode),
        far_ring=jnp.zeros((FAR_RING,), jnp.int32),
        far_written=z,
        far_leftover=jnp.zeros((48,), jnp.int32),
        near_leftover=jnp.zeros((48,), jnp.int32),
        rebuf_fill=z,
        near_abs=z,
        out_ring=jnp.zeros((OUT_RING,), jnp.int32),
        out_written=z,
        out_read=z,
        fifo_read=z,
        ec_startup=jnp.asarray(True),
        check_buff_size=jnp.asarray(True),
        check_buf_size_ctr=z,
        stable_counter=z,
        first_val=z,
        ms_sum=z,
        buf_size_start=z,
        ms_in_sndcard=z,
        filt_delay=z,
        known_delay=z,
        last_known_delay=z,
        last_delay_diff=z,
        time_for_delay_change=z,
        farend_old=jnp.zeros((2, SUB), jnp.int32),
        fetched_ring=jnp.zeros((CORE_FAR_LEN,), jnp.int32),
        fetched_written=z,
        fetch_read=z,
    )


def buffer_farend(state: AecmState, far_frame) -> AecmState:
    """WebRtcAecm_BufferFarend (echo_control_mobile.cc:210-239): DelayComp
    when enabled, then WriteBuffer (drops the tail when the FIFO is full).
    """
    n = far_frame.shape[0]
    mult = n // SUB  # nrOfSamples is one 10 ms frame: 80*mult

    # WebRtcAecm_DelayComp (echo_control_mobile.cc:579-600), enabled only.
    avail = state.far_written - state.fifo_read
    n_snd = state.ms_in_sndcard * 8 * mult
    delay_new = n_snd - avail
    comp = (~state.ec_startup) & (
        delay_new > CORE_FAR_LEN - SUB * mult
    )
    n_add = jnp.clip(jnp.maximum((n_snd >> 1) - avail, SUB), None, 10 * SUB)
    # MoveReadPtr(-n_add): backward move clamped by free space
    # (ring_buffer.c:172-199).
    free = FIFO_CAP - avail
    move_back = jnp.where(comp, jnp.minimum(n_add, free), 0)
    fifo_read = state.fifo_read - move_back
    avail = state.far_written - fifo_read

    # WriteBuffer: write min(free, n) samples, drop the rest.
    free = FIFO_CAP - avail
    n_write = jnp.minimum(jnp.asarray(n, jnp.int32), free)
    idx = jnp.mod(state.far_written + jnp.arange(n), FAR_RING)
    keep = jnp.arange(n) < n_write
    ring = state.far_ring.at[idx].set(
        jnp.where(keep, far_frame.astype(jnp.int32), state.far_ring[idx])
    )
    return state.replace(
        far_ring=ring,
        far_written=state.far_written + n_write,
        fifo_read=fifo_read,
    )


def _trunc_div(a, b: int):
    """C integer division (truncates toward zero) for possibly-negative a."""
    q = jnp.abs(a) // b
    return jnp.where(a < 0, -q, q)


SUB = 80  # FRAME_LEN: the reference always rebuffers in 80-sample frames


def _startup_step(geo: AecmGeometry, state: AecmState, ms):
    """The ECstartup branch of WebRtcAecm_Process
    (echo_control_mobile.cc:289-362): passthrough output, checkBuffSize
    stabilization, startup exit with the FIFO trimmed to bufSizeStart
    frames. Returns the updated state (core untouched)."""
    mult = geo.mult
    n_blocks_10ms = 1  # nFrames / mult

    avail0 = state.far_written - state.fifo_read
    filled = avail0 // SUB

    ctr = state.check_buf_size_ctr + 1
    first_val = jnp.where(state.stable_counter == 0, ms, state.first_val)
    ms_sum0 = jnp.where(state.stable_counter == 0, 0, state.ms_sum)
    # |firstVal - ms| < max(0.2*ms, 8) with the 0.2*ms computed in C
    # double (echo_control_mobile.cc:316-318). For integer operands the
    # double comparison is exactly the integer test 5*|d| < ms (the
    # double rounding error ~1e-16 can never bridge the >=0.2 gap between
    # representable values of |d| - ms/5); kSampMsNb = 8.
    delta = jnp.abs(first_val - ms)
    stable = (5 * delta < ms) | (delta < 8)
    ms_sum = jnp.where(stable, ms_sum0 + ms, ms_sum0)
    counter = jnp.where(stable, state.stable_counter + 1, 0)

    done1 = state.check_buff_size & (counter * n_blocks_10ms >= 6)
    bss1 = jnp.minimum(
        _trunc_div(3 * ms_sum * mult, jnp.maximum(counter, 1) * 40), 50
    )
    done2 = state.check_buff_size & (ctr * n_blocks_10ms > 50)
    bss2 = jnp.minimum((3 * ms * mult) // 40, 50)
    buf_size_start = jnp.where(done1, bss1, state.buf_size_start)
    buf_size_start = jnp.where(done2, bss2, buf_size_start)
    check_buff = state.check_buff_size & ~(done1 | done2)

    # Startup exit (echo_control_mobile.cc:345-361): `filled` was computed
    # before the checkBuffSize update in the reference too.
    exit_eq = filled == buf_size_start
    exit_gt = filled > buf_size_start
    ends = (~check_buff) & (exit_eq | exit_gt)
    fifo_read = state.fifo_read + jnp.where(
        exit_gt & ~check_buff, avail0 - buf_size_start * SUB, 0
    )
    return state.replace(
        fifo_read=fifo_read,
        ec_startup=~ends,
        check_buff_size=check_buff,
        check_buf_size_ctr=ctr,
        stable_counter=counter,
        first_val=first_val,
        ms_sum=ms_sum,
        buf_size_start=buf_size_start,
    )


def _enabled_step(geo: AecmGeometry, state: AecmState, near_frame,
                  parity: int, ms):
    """The enabled branch (echo_control_mobile.cc:364-403): per 80-sample
    sub-frame — FIFO read (or farendOld reuse), EstBufDelay once per 10 ms,
    core far buffering/fetch, 64-sample block processing with the traced
    leftover phase (see module docstring), output-shortfall stuffing.
    Returns (state, out_frame)."""
    mult = geo.mult
    est_idx = 0 if geo.sample_rate_hz == 8000 else 1

    core = state.core
    out_ring, out_written, out_read = (
        state.out_ring, state.out_written, state.out_read
    )
    near_l, far_l = state.near_leftover, state.far_leftover
    fill = state.rebuf_fill
    fifo_read = state.fifo_read
    farend_old = state.farend_old
    filt_delay = state.filt_delay
    known_delay = state.known_delay
    last_known_delay = state.last_known_delay
    last_delay_diff = state.last_delay_diff
    tfc = state.time_for_delay_change
    fetched_ring = state.fetched_ring
    fetched_written = state.fetched_written
    fetch_read = state.fetch_read

    def _assemble(leftover_buf, new80, l):
        """concat(leftover_buf[:l], new80) zero-padded to 128 — built as a
        4-way select of statically-shifted concatenations (l in
        {0,16,32,48})."""
        outs = []
        for v in (0, 16, 32, 48):
            outs.append(jnp.concatenate(
                [leftover_buf[:v], new80,
                 jnp.zeros((48 - v,), leftover_buf.dtype)]
            ))
        stacked = jnp.stack(outs)  # (4, 128)
        sel = (l // 16).astype(jnp.int32)
        onehot = (jnp.arange(4, dtype=jnp.int32) == sel)
        return jnp.sum(jnp.where(onehot[:, None], stacked, 0), axis=0)

    outs = []
    for s in range(mult):
        # FIFO read of one 80-sample frame, or reuse the last frame
        # (echo_control_mobile.cc:369-386 farendOld).
        avail = state.far_written - fifo_read
        have = avail >= SUB
        pos = jnp.mod(fifo_read + jnp.arange(SUB), FAR_RING)
        far_fifo = jnp.where(have, state.far_ring[pos], farend_old[s])
        farend_old = farend_old.at[s].set(far_fifo)
        fifo_read = fifo_read + jnp.where(have, SUB, 0)

        # EstBufDelay when all data extracted (echo_control_mobile.cc:
        # 387-391, body :530-577).
        if s == est_idx:
            n_samp_far = state.far_written - fifo_read
            n_samp_snd = ms * 8 * mult  # kSampMsNb * mult
            delay_new = n_samp_snd - n_samp_far
            stuff = delay_new < SUB
            # MoveReadPtr(FRAME_LEN) clamps forward motion to readable.
            fifo_read = fifo_read + jnp.where(
                stuff, jnp.minimum(SUB, jnp.maximum(n_samp_far, 0)), 0
            )
            delay_new = delay_new + jnp.where(stuff, SUB, 0)
            filt_delay = jnp.maximum(
                0, _trunc_div(8 * filt_delay + 2 * delay_new, 10)
            )
            diff = filt_delay - known_delay
            tfc = jnp.where(
                diff > 224,
                jnp.where(last_delay_diff < 96, 0, tfc + 1),
                jnp.where(
                    (diff < 96) & (known_delay > 0),
                    jnp.where(last_delay_diff > 224, 0, tfc + 1),
                    0,
                ),
            )
            last_delay_diff = diff
            known_delay = jnp.where(
                tfc > 25, jnp.maximum(filt_delay - 160, 0), known_delay
            )

        # Core BufferFarFrame + FetchFarFrame (aecm_core.cc:514-529,
        # 1072-1127). The knownDelay argument of FetchFarFrame is the
        # CORE's field, which M145 initializes to 0 and never writes again
        # (aecm_core.cc:385 is its only assignment; the ProcessFrame call
        # passing the wrapper's EstBufDelay estimate is commented out,
        # echo_control_mobile.cc:393-395) — so the core far path is a
        # plain FIFO: read chases write with no delay jumps, and the
        # wrapper's knownDelay only feeds the EstBufDelay diff logic.
        widx = jnp.mod(fetched_written + jnp.arange(SUB), CORE_FAR_LEN)
        fetched_ring = fetched_ring.at[widx].set(far_fifo)
        fetched_written = fetched_written + SUB
        ridx = jnp.mod(fetch_read + jnp.arange(SUB), CORE_FAR_LEN)
        far_core = fetched_ring[ridx]
        fetch_read = fetch_read + SUB

        # Rebuffer 80 new samples behind the traced leftover (length
        # `fill` in {0,16,32,48}); fill+80 yields 1 block, except fill==48
        # yields 2 (the reference's while-available>=64 loop,
        # aecm_core.cc:541-561). Both blocks are computed; the second is
        # committed only when present.
        near_cat = _assemble(near_l, near_frame[s * SUB:(s + 1) * SUB], fill)
        far_cat = _assemble(far_l, far_core, fill)
        two_blocks = fill == 48

        core1, out_b0 = aecm_core.process_block(
            core, far_cat[:64], near_cat[:64], mult,
            echo_mode=geo.echo_mode, nlp=geo.nlp, cng=geo.cng,
        )
        core2, out_b1 = aecm_core.process_block(
            core1, far_cat[64:128], near_cat[64:128], mult,
            echo_mode=geo.echo_mode, nlp=geo.nlp, cng=geo.cng,
        )
        core = jax.tree_util.tree_map(
            lambda a, b: a if a is b else jnp.where(two_blocks, a, b),
            core2, core1,
        )
        oidx = jnp.mod(out_written + jnp.arange(64), OUT_RING)
        out_ring = out_ring.at[oidx].set(out_b0)
        out_written = out_written + 64
        oidx = jnp.mod(out_written + jnp.arange(64), OUT_RING)
        out_ring = out_ring.at[oidx].set(
            jnp.where(two_blocks, out_b1, out_ring[oidx])
        )
        out_written = out_written + jnp.where(two_blocks, 64, 0)

        # New leftover: the tail past the consumed blocks. With one block
        # it is cat[64:64+fill+16] (<=48 samples, static slice suffices);
        # with two blocks it is empty.
        near_l = jnp.where(two_blocks, 0, near_cat[64:112])
        far_l = jnp.where(two_blocks, 0, far_cat[64:112])
        fill = jnp.where(two_blocks, 0, fill + 16)

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

    new_state = state.replace(
        core=core,
        near_leftover=near_l,
        far_leftover=far_l,
        rebuf_fill=fill,
        out_ring=out_ring,
        out_written=out_written,
        out_read=out_read,
        fifo_read=fifo_read,
        farend_old=farend_old,
        filt_delay=filt_delay,
        known_delay=known_delay,
        last_known_delay=last_known_delay,
        last_delay_diff=last_delay_diff,
        time_for_delay_change=tfc,
        fetched_ring=fetched_ring,
        fetched_written=fetched_written,
        fetch_read=fetch_read,
    )
    return new_state, (
        jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    )


def process_frame(geo: AecmGeometry, state: AecmState, near_frame,
                  parity: int, stream_delay_ms):
    """One 10ms capture frame: WebRtcAecm_Process
    (echo_control_mobile.cc:240-403).

    near_frame: (frame_len,) int32 int16-valued; parity: unused (kept for
    signature stability — the rebuffer phase is traced state, see module
    docstring); stream_delay_ms: () int32 reported delay
    (set_stream_delay_ms). Returns (state, out_frame).

    Both the startup and enabled branches are computed every frame (traced
    control flow); the per-leaf select on `ec_startup` applies exactly one.
    The reference processes `mult` consecutive FRAME_LEN=80 sub-frames per
    10 ms frame regardless of rate, each with its own 64-block rebuffering
    (phase anchored at the data-dependent startup exit) and 80-sample
    output read with shortfall stuffing — that exact cadence (including
    the 16-sample stuffs after startup) is reproduced so the output
    stream is sample-aligned with the reference's.
    """
    near_frame = near_frame.astype(jnp.int32)
    # msInSndCardBuf clamp + 10 (echo_control_mobile.cc:270-285).
    ms = jnp.clip(jnp.asarray(stream_delay_ms, jnp.int32), 0, 500) + 10

    startup = state.ec_startup
    base = state.replace(ms_in_sndcard=ms, near_abs=state.near_abs
                         + geo.frame_len)
    st_startup = _startup_step(geo, base, ms)
    st_enabled, out_enabled = _enabled_step(geo, base, near_frame, parity, ms)

    new_state = jax.tree_util.tree_map(
        lambda a, b: a if a is b else jnp.where(startup, a, b),
        st_startup, st_enabled,
    )
    out = jnp.where(startup, near_frame, out_enabled)
    return new_state, out


def get_echo_likelihood(state: AecmState):
    """Rough echo activity proxy from the suppression gain state."""
    return 1.0 - (
        state.core.sup_gain.astype(jnp.float32)
        / float(aecm_core.SUPGAIN_DEFAULT)
    ).clip(0.0, 1.0)
