"""AEC3 subtractor pair-megakernel: the whole 2-3 block subtractor loop of
one frame with both adaptive filters VMEM-resident.

Reference semantics: aec3/subtractor.cc:188-321 (Process),
adaptive_fir_filter.cc:40-622 (apply/adapt/constrain/frequency response),
refined_filter_update_gain.cc:80-150, coarse_filter_update_gain.cc:30-78 —
as re-expressed by models/aec3/subtractor.process_pair (the XLA semantic
reference this kernel is equivalence-tested against,
tests/test_subtractor_pallas.py).

Why a kernel: every block's apply -> error -> gain -> adapt -> constrain
chain is sequential THROUGH the filters H, so XLA re-reads and re-writes
both H tensors from HBM for every 4 ms block (~3 passes/block, ~41 GB per
50-frame chunk at B=1024 — the largest single line in the step profile).
Holding H (plus H_error, the frequency/impulse responses and the gain
config scalars) in VMEM across the frame's blocks cuts that to one read +
one write per frame (docs/design/subtractor_megakernel.md).

Scope: any C_cap (the reference's per-capture-channel subtractor
iterations are independent, aec3/subtractor.cc:196-321 — the channel loop
is unrolled in-kernel with each channel's filters/gain state in their own
VMEM refs, every array keeping the validated single-channel rank/layout);
any C_ren.

Layouts (B = batch of streams, leading; all f32/i32):
- per capture channel: H as separate re/im planes (B, P, R, 65),
  H_error (B, 65), frequency response (B, P, 65), impulse response
  (B, P, 64);
- the per-pair render chains as planar rows (B, 2W, R, 65) re/im plus a
  channel-summed spectrum chain (B, 2W, 65) — shared by all capture
  channels (the render window is capture-invariant); per-block windows
  are dynamic row slices of the VMEM-resident chains;
- scalar state packed into (B, NF) f32 + (B, NI) i32 vectors: 21 f32 +
  16 i32 shared slots (gain configs, filter sizes, counters — these
  evolve in lockstep across capture channels, as in the XLA state) then
  C-wide per-channel blocks (misadjustment estimator, coarse reset
  state);
- DFT bases passed as shared inputs (ops/mxu_fft packed matrices), so the
  kernel's transforms match the XLA path's matmul-DFT numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webrtc_audio_processing_tpu.ops import mxu_fft

# Debug staging knob for bisecting Mosaic/runtime failures: stages above
# the knob are skipped (outputs zeroed). 99 = full kernel.
import os as _os
_DEBUG_STAGE = int(_os.environ.get("PAIR_KERNEL_STAGE", "99"))

NUM_BINS = 65
BLOCK = 64

# f32 scalar slots (shared across capture channels)
F_RG_CUR = 0      # refined gain config current (5)
F_RG_TGT = 5
F_RG_OLD = 10
F_CG_CUR = 15     # coarse gain config current (2)
F_CG_TGT = 17
F_CG_OLD = 19
NF_SHARED = 21

# i32 scalar slots (shared across capture channels)
I_R_CUR = 0       # refined filter sizes
I_R_TGT = 1
I_R_OLD = 2
I_R_CTR = 3
I_R_PC = 4
I_C_CUR = 5       # coarse filter sizes
I_C_TGT = 6
I_C_OLD = 7
I_C_CTR = 8
I_C_PC = 9
I_RG_CTR = 10     # gain config interpolation counters
I_CG_CTR = 11
I_RG_POOR = 12
I_RG_CALL = 13
I_CG_POOR = 14
I_CG_CALL = 15
NI_SHARED = 16


class ScalarLayout:
    """Per-channel scalar slot offsets for C capture channels. Slot i of
    per-channel quantity Q for channel c lives at Q_base + c."""

    def __init__(self, C: int):
        self.C = C
        self.F_MIS_E2 = NF_SHARED          # (C,)
        self.F_MIS_Y2 = NF_SHARED + C
        self.F_MIS_INV = NF_SHARED + 2 * C
        self.NF = NF_SHARED + 3 * C
        self.I_MIS_BLK = NI_SHARED         # (C,)
        self.I_MIS_OVER = NI_SHARED + C
        self.I_POOR_COARSE = NI_SHARED + 2 * C
        self.I_RESET_HANG = NI_SHARED + 3 * C
        self.NI = NI_SHARED + 4 * C


H_ERROR_INITIAL = 10000.0
POOR_EXC_INITIAL = 1000

# output scalar slots
O_Y2 = 0
O_E2R = 1
O_E2C = 2
O_S2R = 3
O_S2C = 4
O_SMAXR = 5
O_SMAXC = 6
NO = 7

# per-channel state arrays (in pack order)
N_CH_ARRAYS = 7  # Hr, Hi, Hcr, Hci, H_err, freq, imp


def _update_size(cur, tgt, old, ctr, duration):
    """AdaptiveFirFilter::UpdateSize scalar part. All (B,) i32.
    Returns (new_size, old', ctr')."""
    ctr2 = jnp.maximum(ctr - 1, 0)
    in_trans = ctr > 0
    factor = ctr2.astype(jnp.float32) / duration
    interp = (old.astype(jnp.float32) * factor
              + tgt.astype(jnp.float32) * (1.0 - factor)).astype(jnp.int32)
    new_size = jnp.where(in_trans, interp, tgt)
    new_old = jnp.where(in_trans, old, tgt)
    return new_size, new_old, ctr2


def _apply_filter(Xr, Xi, Hr, Hi, m, fold):
    """S = sum_{p<size, r} X * H. X/H: (B, P, R*65) folded-lane; m:
    prebuilt (B, P, R*65) 0/1 partition mask; fold: (R*65, 65) lane-fold
    matrix (sum over render channels). Returns (S_re, S_im): (B, 65).

    Folded-lane layout: the render-channel axis lives INSIDE the lane
    dimension (lane r*65+k = channel r, bin k), so the minor two dims
    tile as (P, R*65) instead of (R, 65) — ~3.2x physical VPU/VMEM
    density at R=2 (a (2, 65) minor pads to (8, 128): 12.7% occupancy)."""
    Sr = jnp.dot(jnp.sum((Xr * Hr - Xi * Hi) * m, axis=1), fold,
                 preferred_element_type=jnp.float32)
    Si = jnp.dot(jnp.sum((Xr * Hi + Xi * Hr) * m, axis=1), fold,
                 preferred_element_type=jnp.float32)
    return Sr, Si


def make_pair_kernel(
    *,
    nb: int,              # blocks in this frame (2 or 3)
    C: int,               # capture channels
    P: int,               # refined max partitions
    Pc: int,              # coarse max partitions
    R: int,               # render channels
    W2: int,              # total chain rows (2 * per-chain width)
    duration: int,        # config.filter.config_change_duration_blocks
    refined_cfg: tuple,   # converged refined gain config vector (5)
    coarse_cfg: tuple,    # converged coarse gain config vector (2)
    refined_initial_cfg: tuple,
    coarse_initial_cfg: tuple,
    initial_size_refined: int,
    initial_size_coarse: int,
    size_refined: int,    # converged length_blocks
    size_coarse: int,
    coarse_reset_hangover_blocks: int,
    enable_coarse_output_usage: bool,  # unused here (phase C), kept for sig
    interpret: bool = False,
):
    """Builds the jitted pair-kernel callable. All arguments static."""

    lay = ScalarLayout(C)
    NF, NI = lay.NF, lay.NI

    idft = np.asarray(mxu_fft._idft_matrix_packed(128))   # (130, 128)
    dft = np.asarray(mxu_fft._dft_matrix_packed(128))     # (128, 130)
    # Windowed variants used by the kernel:
    # - prediction error: s = [Sre|Sim] @ idft[:, 64:]            (130, 64)
    # - constrain head:  h_head = [Hre|Him] @ idft[:, :64]        (130, 64)
    # - error fft:       E = (hann*e) @ dft[64:]                  (64, 130)
    # - constrain fft:   H' = h_head @ dft[:64]                   (64, 130)
    idft_tail = idft[:, BLOCK:]
    idft_head = idft[:, :BLOCK]
    dft_lo = dft[:BLOCK]
    dft_hi = dft[BLOCK:]

    # Folded-lane constrain bases: with the render-channel axis folded
    # into lanes (lane r*65+k = channel r, bin k), the per-channel
    # head-IDFT / forward-DFT of the constrained partition become ONE
    # block-diagonal matmul across all channels:
    #   h_head = Hpc_re @ bd_ih_re + Hpc_im @ bd_ih_im   (SB, R*64)
    #   Hn_re  = h_head @ bd_dl_re                        (SB, R*65)
    RL, RB = R * NUM_BINS, R * BLOCK
    bd_ih_re = np.zeros((RL, RB), np.float32)
    bd_ih_im = np.zeros((RL, RB), np.float32)
    bd_dl_re = np.zeros((RB, RL), np.float32)
    bd_dl_im = np.zeros((RB, RL), np.float32)
    for r in range(R):
        rows = slice(r * NUM_BINS, (r + 1) * NUM_BINS)
        cols = slice(r * BLOCK, (r + 1) * BLOCK)
        bd_ih_re[rows, cols] = idft_head[:NUM_BINS]
        bd_ih_im[rows, cols] = idft_head[NUM_BINS:]
        bd_dl_re[cols, rows] = dft_lo[:, :NUM_BINS]
        bd_dl_im[cols, rows] = dft_lo[:, NUM_BINS:]

    r_cfg = np.asarray(refined_cfg, np.float32)
    c_cfg = np.asarray(coarse_cfg, np.float32)
    r_cfg0 = np.asarray(refined_initial_cfg, np.float32)
    c_cfg0 = np.asarray(coarse_initial_cfg, np.float32)

    def kernel(*refs):
        it = iter(refs)
        ch_refs = [[next(it) for _ in range(N_CH_ARRAYS)] for _ in range(C)]
        fscal_ref = next(it)
        iscal_ref = next(it)
        cfr_ref, cfi_ref, csum_ref = next(it), next(it), next(it)
        offs_ref, y_ref, mask_ref = next(it), next(it), next(it)
        flags_ref, sat_ref = next(it), next(it)
        b_idt_ref, b_dhi_ref = next(it), next(it)
        b_ihre_ref, b_ihim_ref = next(it), next(it)
        b_dlre_ref, b_dlim_ref = next(it), next(it)
        out_ch = [[next(it) for _ in range(N_CH_ARRAYS)] for _ in range(C)]
        o_fscal, o_iscal = next(it), next(it)
        o_eref, o_ecoa, o_scal = next(it), next(it), next(it)
        o_ofreq = [next(it) for _ in range(C)]
        o_oimp = [next(it) for _ in range(C)]
        o_osize = next(it)
        try:
            leftover = next(it)
            raise AssertionError(f"unconsumed kernel ref {leftover}")
        except StopIteration:
            pass

        # Per-capture-channel filter/analysis state, each a list of C
        # (SB, ...) values held live in VMEM for the whole frame.
        Hr = [ch_refs[c][0][:] for c in range(C)]   # (SB, P, R*65)
        Hi = [ch_refs[c][1][:] for c in range(C)]
        Hcr = [ch_refs[c][2][:] for c in range(C)]  # (SB, Pc, R*65)
        Hci = [ch_refs[c][3][:] for c in range(C)]
        H_err = [ch_refs[c][4][:] for c in range(C)]  # (SB, 65)
        freq = [ch_refs[c][5][:] for c in range(C)]   # (SB, P, 65)
        imp = [ch_refs[c][6][:] for c in range(C)]    # (SB, P, 64)
        # Scalar state as per-slot (SB,) values (a dict, re-stacked at the
        # end): .at[:, i].set column updates lower to scatter, which
        # Mosaic does not implement.
        _fs0 = fscal_ref[:]       # (SB, NF)
        _is0 = iscal_ref[:]       # (SB, NI)
        fs = {i: _fs0[:, i] for i in range(NF)}
        isv = {i: _is0[:, i] for i in range(NI)}
        Cr = cfr_ref[:]           # (SB, W2, R*65) folded-lane
        Ci = cfi_ref[:]
        Cs = csum_ref[:]          # (SB, W2, 65)
        sat = sat_ref[:][:, 0] != 0  # (SB,)
        idt = b_idt_ref[:]        # (130, 64) tail idft
        dhi = b_dhi_ref[:]        # (64, 130)
        b_ih_re = b_ihre_ref[:]   # (R*65, R*64) block-diag head idft re
        b_ih_im = b_ihim_ref[:]
        b_dl_re = b_dlre_ref[:]   # (R*64, R*65) block-diag fwd dft re
        b_dl_im = b_dlim_ref[:]
        RL = R * NUM_BINS
        # Lane fold/duplicate matrices (iota-built; MXU contractions):
        # fold: (SB, R*65) @ (R*65, 65) sums over render channels;
        # dup: (SB, 65) @ (65, R*65) replicates per-bin vectors per r.
        _fj = jax.lax.broadcasted_iota(jnp.int32, (RL, NUM_BINS), 0)
        _fk = jax.lax.broadcasted_iota(jnp.int32, (RL, NUM_BINS), 1)
        fold_m = ((_fj - (_fj // NUM_BINS) * NUM_BINS) == _fk).astype(
            jnp.float32)
        _dj = jax.lax.broadcasted_iota(jnp.int32, (NUM_BINS, RL), 0)
        _dk = jax.lax.broadcasted_iota(jnp.int32, (NUM_BINS, RL), 1)
        dup_m = (_dj == (_dk - (_dk // NUM_BINS) * NUM_BINS)).astype(
            jnp.float32)
        Y = y_ref[:]              # (SB, nb*C, 64)
        # kHanning64 built in-kernel (captured host constants are not
        # allowed in pallas kernels): sin^2(pi k / 63).
        hk = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1).astype(
            jnp.float32)
        hann = jnp.sin(np.float32(np.pi) * hk / 63.0) ** 2  # (1, 64)

        SB = Hr[0].shape[0]

        def col(v, i):
            return v[i]

        def setcol(v, i, x):
            v = dict(v)
            v[i] = x
            return v

        def bdim(v, shape, dims):
            return jax.lax.broadcast_in_dim(v, shape, dims)

        def pack_lanes(vals, width, dtype=jnp.float32):
            """(SB,) scalars -> (SB, width) with value j in lane j.
            jnp.stack(axis=-1) lowers to a lane-dim tpu.concatenate whose
            per-operand layouts Mosaic cannot reconcile ("result/input
            offset mismatch on non-concat dimension"); an iota-masked
            select sidesteps the concat entirely."""
            io = jax.lax.broadcasted_iota(jnp.int32, (SB, width), 1)
            acc = jnp.zeros((SB, width), dtype)
            for j, v in enumerate(vals):
                acc = jnp.where(io == j,
                                bdim(v.astype(dtype), (SB, width), (0,)), acc)
            return acc

        def interp_gain_config(fs, isv, base_cur, base_tgt, base_old,
                               ctr_slot, K):
            """GainConfigState interpolation (_update_gain_config), as
            per-slot scalar ops on the (SB,) vectors."""
            ctr = col(isv, ctr_slot)
            ctr2 = jnp.maximum(ctr - 1, 0)
            in_trans = ctr > 0
            still = ctr2 > 0
            factor = ctr2.astype(jnp.float32) / duration
            for j in range(K):
                cur = col(fs, base_cur + j)
                tgt = col(fs, base_tgt + j)
                old = col(fs, base_old + j)
                interp = old * factor + tgt * (1.0 - factor)
                fs = setcol(fs, base_cur + j,
                            jnp.where(in_trans,
                                      jnp.where(still, interp, tgt), cur))
                fs = setcol(fs, base_old + j,
                            jnp.where(in_trans & ~still, tgt, old))
            isv = setcol(isv, ctr_slot, ctr2)
            return fs, isv

        # Mosaic cannot relayout (SB, P)-shaped vectors into higher ranks
        # (the lane dim would become a sublane dim), so partition masks
        # are built directly at target rank from iota-vs-scalar compares:
        # (SB,) -> rank-N leading broadcasts are supported. All filter
        # arrays are folded-lane (SB, Pp, R*65).
        def iota4(Pp):
            return jax.lax.broadcasted_iota(jnp.int32, (SB, Pp, RL), 1)

        def iota3(Pp, K):
            return jax.lax.broadcasted_iota(jnp.int32, (SB, Pp, K), 1)

        def s4(v, Pp):    # (SB,) -> (SB, Pp, R*65)
            return bdim(v, (SB, Pp, RL), (0,))

        def s3(v, Pp, K):
            return bdim(v, (SB, Pp, K), (0,))

        def g4(g, Pp):    # (SB, 65) per-bin -> (SB, Pp, R*65)
            g_rl = jnp.dot(g, dup_m, preferred_element_type=jnp.float32)
            return bdim(g_rl, (SB, Pp, RL), (0, 2))

        def r4(v, Pp):    # (SB, R*65) -> (SB, Pp, R*65)
            return bdim(v, (SB, Pp, RL), (0, 2))

        def constrain(Ha_r, Ha_i, pc_oh, Pp):
            """Force-causal the one-hot-selected partition of an adapted
            filter (adaptive_fir_filter.cc Constrain): returns the new
            full filter (re, im) and the constrained head h_head
            (SB, R*BLOCK) — all render channels transformed in one
            block-diagonal matmul pair."""
            Hpc_r = jnp.sum(Ha_r * pc_oh, axis=1)  # (SB, R*65)
            Hpc_i = jnp.sum(Ha_i * pc_oh, axis=1)
            h_head = (jnp.dot(Hpc_r, b_ih_re,
                              preferred_element_type=jnp.float32)
                      + jnp.dot(Hpc_i, b_ih_im,
                                preferred_element_type=jnp.float32))
            Hn_r = jnp.dot(h_head, b_dl_re,
                           preferred_element_type=jnp.float32)
            Hn_i = jnp.dot(h_head, b_dl_im,
                           preferred_element_type=jnp.float32)
            new_r = jnp.where(pc_oh > 0, r4(Hn_r, Pp), Ha_r)
            new_i = jnp.where(pc_oh > 0, r4(Hn_i, Pp), Ha_i)
            return new_r, new_i, h_head

        stage = _DEBUG_STAGE
        for k in range(nb):
            if stage < 1:
                break
            off = offs_ref[:, k]           # (SB,) row offset in chain
            y = [Y[:, k * C + c] for c in range(C)]      # (SB, 64) each
            nmask = mask_ref[:, k]         # (SB, 65) 1.0 where zeroed
            poor_exc = flags_ref[:, k, 0] != 0
            delay_ch = flags_ref[:, k, 1] != 0
            gain_ch = flags_ref[:, k, 2] != 0
            transition = flags_ref[:, k, 3] != 0

            # ---- handle_echo_path_change (full reset on delay change).
            z = delay_ch[:, None, None]
            for c in range(C):
                Hr[c] = jnp.where(z, 0.0, Hr[c])
                Hi[c] = jnp.where(z, 0.0, Hi[c])
                Hcr[c] = jnp.where(z, 0.0, Hcr[c])
                Hci[c] = jnp.where(z, 0.0, Hci[c])
                H_err[c] = jnp.where(delay_ch[:, None], H_ERROR_INITIAL,
                                     H_err[c])
            dc = delay_ch
            for idx, val in (
                (I_R_CUR, initial_size_refined), (I_R_TGT, initial_size_refined),
                (I_R_OLD, initial_size_refined),
                (I_C_CUR, initial_size_coarse), (I_C_TGT, initial_size_coarse),
                (I_C_OLD, initial_size_coarse),
            ):
                isv = setcol(isv, idx, jnp.where(dc, val, col(isv, idx)))
            for idx in (I_R_CTR, I_C_CTR, I_RG_CTR, I_CG_CTR,
                        I_RG_CALL, I_CG_CALL, I_CG_POOR):
                isv = setcol(isv, idx, jnp.where(dc, 0, col(isv, idx)))
            isv = setcol(isv, I_RG_POOR,
                         jnp.where(dc, POOR_EXC_INITIAL, col(isv, I_RG_POOR)))
            isv = setcol(
                isv, I_R_PC,
                jnp.minimum(col(isv, I_R_PC),
                            col(isv, I_R_CUR) - 1))
            isv = setcol(
                isv, I_C_PC,
                jnp.minimum(col(isv, I_C_PC), col(isv, I_C_CUR) - 1))
            for base, vec0 in ((F_RG_CUR, r_cfg0), (F_RG_TGT, r_cfg0),
                               (F_RG_OLD, r_cfg0)):
                for j in range(5):
                    fs = setcol(fs, base + j,
                                jnp.where(dc, vec0[j], col(fs, base + j)))
            for base, vec0 in ((F_CG_CUR, c_cfg0), (F_CG_TGT, c_cfg0),
                               (F_CG_OLD, c_cfg0)):
                for j in range(2):
                    fs = setcol(fs, base + j,
                                jnp.where(dc, vec0[j], col(fs, base + j)))

            # ---- exit_initial_state (transition): set converged targets.
            tr = transition
            for j in range(5):
                fs = setcol(fs, F_RG_TGT + j,
                            jnp.where(tr, r_cfg[j], col(fs, F_RG_TGT + j)))
            for j in range(2):
                fs = setcol(fs, F_CG_TGT + j,
                            jnp.where(tr, c_cfg[j], col(fs, F_CG_TGT + j)))
            isv = setcol(isv, I_RG_CTR,
                         jnp.where(tr, duration, col(isv, I_RG_CTR)))
            isv = setcol(isv, I_CG_CTR,
                         jnp.where(tr, duration, col(isv, I_CG_CTR)))
            isv = setcol(isv, I_R_TGT,
                         jnp.where(tr, min(P, size_refined),
                                   col(isv, I_R_TGT)))
            isv = setcol(isv, I_R_CTR,
                         jnp.where(tr, duration, col(isv, I_R_CTR)))
            isv = setcol(isv, I_C_TGT,
                         jnp.where(tr, min(Pc, size_coarse),
                                   col(isv, I_C_TGT)))
            isv = setcol(isv, I_C_CTR,
                         jnp.where(tr, duration, col(isv, I_C_CTR)))

            # ---- per-block X window + spectral sums from the chains
            # (render-side — shared by all capture channels).
            # Chain rows are (W2, R*65) folded-lane; the window is rows
            # [off, off+P) — per-stream dynamic, selected by a one-hot
            # row mask in VMEM (cheap: the chain is on-chip).
            wsel = (jnp.arange(W2)[None, :, None]
                    == (off[:, None, None] + jnp.arange(P)[None, None, :]))
            wsf = wsel.astype(jnp.float32)  # (SB, W2, P)

            def _sel(chain_swk):
                return jnp.einsum("swp,swk->spk", wsf, chain_swk,
                                  preferred_element_type=jnp.float32)

            Xr = _sel(Cr)         # (SB, P, R*65)
            Xi = _sel(Ci)
            spec_rows = _sel(Cs)  # (SB, P, 65)

            size_r = col(isv, I_R_CUR)
            size_c = col(isv, I_C_CUR)
            X2_ref = jnp.sum(
                spec_rows * (iota3(P, NUM_BINS)
                             < s3(size_r, P, NUM_BINS)).astype(jnp.float32),
                axis=1)
            X2_coa = jnp.sum(
                spec_rows * (iota3(P, NUM_BINS)
                             < s3(size_c, P, NUM_BINS)).astype(jnp.float32),
                axis=1)

            if stage < 3:
                continue
            # ---- apply + prediction error (both filters, per channel).
            mask_r4 = (iota4(P) < s4(size_r, P)).astype(jnp.float32)
            mask_c4 = (iota4(Pc) < s4(size_c, Pc)).astype(jnp.float32)
            e_ref, e_coa, s_ref = [None] * C, [None] * C, [None] * C
            y2, e2_r, e2_c = [None] * C, [None] * C, [None] * C
            s2_r, s2_c, smax_r, smax_c = ([None] * C for _ in range(4))
            for c in range(C):
                Sr_r, Si_r = _apply_filter(Xr, Xi, Hr[c], Hi[c], mask_r4,
                                           fold_m)
                Sr_c, Si_c = _apply_filter(Xr[:, :Pc], Xi[:, :Pc],
                                           Hcr[c], Hci[c], mask_c4, fold_m)
                s_ref[c] = (jnp.dot(Sr_r, idt[:NUM_BINS],
                                    preferred_element_type=jnp.float32)
                            + jnp.dot(Si_r, idt[NUM_BINS:],
                                      preferred_element_type=jnp.float32))
                s_coa = (jnp.dot(Sr_c, idt[:NUM_BINS],
                                 preferred_element_type=jnp.float32)
                         + jnp.dot(Si_c, idt[NUM_BINS:],
                                   preferred_element_type=jnp.float32))
                e_ref[c] = y[c] - s_ref[c]
                e_coa[c] = y[c] - s_coa

                y2[c] = jnp.sum(y[c] * y[c], axis=-1)
                e2_r[c] = jnp.sum(e_ref[c] * e_ref[c], axis=-1)
                e2_c[c] = jnp.sum(e_coa[c] * e_coa[c], axis=-1)
                s2_r[c] = jnp.sum(s_ref[c] * s_ref[c], axis=-1)
                s2_c[c] = jnp.sum(s_coa * s_coa, axis=-1)
                smax_r[c] = jnp.max(jnp.abs(s_ref[c]), axis=-1)
                smax_c[c] = jnp.max(jnp.abs(s_coa), axis=-1)

            if stage < 4:
                for c in range(C):
                    o_eref[:, k * C + c] = e_ref[c]
                    o_ecoa[:, k * C + c] = e_coa[c]
                continue
            # ---- misadjustment estimator (subtractor.cc:324-357), per
            # capture channel.
            adjust = [None] * C
            for c in range(C):
                e2a = col(fs, lay.F_MIS_E2 + c) + e2_r[c]
                y2a = col(fs, lay.F_MIS_Y2 + c) + y2[c]
                nblk = col(isv, lay.I_MIS_BLK + c) + 1
                win_done = nblk == 4
                active = y2a > 4 * 200.0**2 * BLOCK
                upd = e2a / jnp.maximum(y2a, 1e-30)
                over = col(isv, lay.I_MIS_OVER + c)
                over = jnp.where(
                    win_done & active & (e2a > 4 * 7500.0**2 * BLOCK), 4,
                    jnp.maximum(over - jnp.where(win_done & active, 1, 0), 0))
                mis_inv = col(fs, lay.F_MIS_INV + c)
                take = win_done & active & ((upd < mis_inv) | (over > 0))
                mis_inv = jnp.where(take, mis_inv + 0.1 * (upd - mis_inv),
                                    mis_inv)
                e2a = jnp.where(win_done, 0.0, e2a)
                y2a = jnp.where(win_done, 0.0, y2a)
                nblk = jnp.where(win_done, 0, nblk)
                adjust[c] = mis_inv > 10.0
                scale = jnp.where(
                    adjust[c],
                    2.0 / jnp.sqrt(jnp.maximum(mis_inv, 1e-10)), 1.0)
                Hr[c] = Hr[c] * scale[:, None, None]
                Hi[c] = Hi[c] * scale[:, None, None]
                imp[c] = imp[c] * scale[:, None, None]
                s_ref[c] = s_ref[c] * scale[:, None]
                e_ref[c] = y[c] - s_ref[c]
                mis_inv = jnp.where(adjust[c], 0.0, mis_inv)
                over = jnp.where(adjust[c], 0, over)
                e2a = jnp.where(adjust[c], 0.0, e2a)
                y2a = jnp.where(adjust[c], 0.0, y2a)
                nblk = jnp.where(adjust[c], 0, nblk)
                fs = setcol(fs, lay.F_MIS_E2 + c, e2a)
                fs = setcol(fs, lay.F_MIS_Y2 + c, y2a)
                fs = setcol(fs, lay.F_MIS_INV + c, mis_inv)
                isv = setcol(isv, lay.I_MIS_BLK + c, nblk)
                isv = setcol(isv, lay.I_MIS_OVER + c, over)

            if stage < 5:
                for c in range(C):
                    o_eref[:, k * C + c] = e_ref[c]
                    o_ecoa[:, k * C + c] = e_coa[c]
                continue
            # ---- error FFTs (hanning, zero-padded), per channel.
            Er, Ei, Ecr, Eci = ([None] * C for _ in range(4))
            E2_r, E2_c = [None] * C, [None] * C
            for c in range(C):
                we_r = e_ref[c] * hann
                we_c = e_coa[c] * hann
                Er[c] = jnp.dot(we_r, dhi[:, :NUM_BINS],
                                preferred_element_type=jnp.float32)
                Ei[c] = jnp.dot(we_r, dhi[:, NUM_BINS:],
                                preferred_element_type=jnp.float32)
                Ecr[c] = jnp.dot(we_c, dhi[:, :NUM_BINS],
                                 preferred_element_type=jnp.float32)
                Eci[c] = jnp.dot(we_c, dhi[:, NUM_BINS:],
                                 preferred_element_type=jnp.float32)
                E2_r[c] = Er[c] * Er[c] + Ei[c] * Ei[c]
                E2_c[c] = Ecr[c] * Ecr[c] + Eci[c] * Eci[c]

            # ---- refined gain (refined_filter_update_gain.cc:80-150):
            # config interpolation + counters shared; mu/G per channel.
            fs, isv = interp_gain_config(
                fs, isv, F_RG_CUR, F_RG_TGT, F_RG_OLD, I_RG_CTR, 5)
            leak_conv = col(fs, F_RG_CUR + 0)
            leak_div = col(fs, F_RG_CUR + 1)
            err_floor = col(fs, F_RG_CUR + 2)
            err_ceil = col(fs, F_RG_CUR + 3)
            noise_gate = col(fs, F_RG_CUR + 4)
            call_r = col(isv, I_RG_CALL) + 1
            poor_r = jnp.where(poor_exc, 0, col(isv, I_RG_POOR)) + 1
            isv = setcol(isv, I_RG_CALL, call_r)
            isv = setcol(isv, I_RG_POOR, poor_r)
            no_upd = ((poor_r < size_r) | sat | (call_r <= size_r))
            sizef = size_r.astype(jnp.float32)[:, None]
            Gr, Gi = [None] * C, [None] * C
            for c in range(C):
                mu = jnp.where(
                    X2_ref >= noise_gate[:, None],
                    H_err[c] / (0.5 * H_err[c] * X2_ref + sizef * E2_r[c]),
                    0.0)
                mu = jnp.where(nmask > 0, 0.0, mu)
                mu = jnp.where(no_upd[:, None], 0.0, mu)
                H_err[c] = H_err[c] - 0.5 * mu * X2_ref * H_err[c]
                Gr[c] = jnp.where(no_upd[:, None], 0.0, mu * Er[c])
                Gi[c] = jnp.where(no_upd[:, None], 0.0, mu * Ei[c])
                disallow = col(isv, lay.I_RESET_HANG + c) > 0
                erl = jnp.sum(freq[c], axis=1)  # (SB, 65)
                leak = jnp.where(((E2_r[c] <= E2_c[c]) | disallow[:, None]),
                                 leak_conv[:, None], leak_div[:, None])
                H_err[c] = H_err[c] + leak * erl
                H_err[c] = jnp.clip(H_err[c], err_floor[:, None],
                                    err_ceil[:, None])
                # Adjusted channels get zero refined gain
                # (subtractor.cc:268).
                Gr[c] = jnp.where(adjust[c][:, None], 0.0, Gr[c])
                Gi[c] = jnp.where(adjust[c][:, None], 0.0, Gi[c])

            if stage < 6:
                for c in range(C):
                    o_eref[:, k * C + c] = e_ref[c]
                    o_ecoa[:, k * C + c] = e_coa[c]
                continue
            # ---- refined update size (shared) + adapt + constrain (per
            # channel).
            new_size, new_old, new_ctr = _update_size(
                col(isv, I_R_CUR), col(isv, I_R_TGT), col(isv, I_R_OLD),
                col(isv, I_R_CTR), duration)
            keep_new = 1.0 - ((iota4(P) >= s4(col(isv, I_R_CUR), P))
                              & (iota4(P) < s4(new_size, P))).astype(
                                  jnp.float32)
            isv = setcol(isv, I_R_CUR, new_size)
            isv = setcol(isv, I_R_OLD, new_old)
            isv = setcol(isv, I_R_CTR, new_ctr)
            pc = jnp.minimum(col(isv, I_R_PC), new_size - 1)
            size_r = new_size

            maskp = (iota4(P) < s4(size_r, P)).astype(jnp.float32)
            Xmr = Xr * maskp
            Xmi = -Xi * maskp  # conj
            pc_oh = (iota4(P) == s4(pc, P)).astype(jnp.float32)
            pc_m = (iota3(P, BLOCK) == s3(pc, P, BLOCK)).astype(jnp.float32)
            for c in range(C):
                Hr[c] = Hr[c] * keep_new
                Hi[c] = Hi[c] * keep_new
                # adapt all partitions
                Gr4, Gi4 = g4(Gr[c], P), g4(Gi[c], P)
                Hr_a = Hr[c] + Xmr * Gr4 - Xmi * Gi4
                Hi_a = Hi[c] + Xmr * Gi4 + Xmi * Gr4
                # constrain partition pc: one-hot row select in VMEM.
                Hr[c], Hi[c], hh = constrain(Hr_a, Hi_a, pc_oh, P)

                # impulse response row pc <- max-|.|-per-tap across render
                # channels (hh is (SB, R*BLOCK); per-channel lane slices).
                seg = hh[:, :BLOCK]
                for rr in range(1, R):
                    cand = hh[:, rr * BLOCK:(rr + 1) * BLOCK]
                    seg = jnp.where(jnp.abs(seg) < jnp.abs(cand), cand, seg)
                seg_b = bdim(seg, (SB, P, BLOCK), (0, 2))
                imp[c] = jnp.where(pc_m > 0, seg_b, imp[c])

                # frequency response: max over render channels of |H|^2,
                # zero beyond current size (full recompute — H is on-chip;
                # per-channel lane slices of the folded array).
                H2f = Hr[c] * Hr[c] + Hi[c] * Hi[c]
                H2 = H2f[:, :, :NUM_BINS]
                for rr in range(1, R):
                    H2 = jnp.maximum(
                        H2, H2f[:, :, rr * NUM_BINS:(rr + 1) * NUM_BINS])
                freq[c] = H2 * (iota3(P, NUM_BINS)
                                < s3(size_r, P, NUM_BINS)).astype(jnp.float32)
            isv = setcol(isv, I_R_PC,
                         jnp.where(pc < size_r - 1, pc + 1, 0))

            if stage < 7:
                for c in range(C):
                    o_eref[:, k * C + c] = e_ref[c]
                    o_ecoa[:, k * C + c] = e_coa[c]
                    o_ofreq[c][:, k] = freq[c]
                    o_oimp[c][:, k] = imp[c]
                o_osize[:, k] = size_r
                continue
            # ---- coarse filter path (subtractor.cc:282-311): sizes and
            # gain config shared; reset/adapt per channel.
            csize, cold, cctr = _update_size(
                col(isv, I_C_CUR), col(isv, I_C_TGT), col(isv, I_C_OLD),
                col(isv, I_C_CTR), duration)
            keep_c = 1.0 - ((iota4(Pc) >= s4(col(isv, I_C_CUR), Pc))
                            & (iota4(Pc) < s4(csize, Pc))).astype(jnp.float32)
            isv = setcol(isv, I_C_CUR, csize)
            isv = setcol(isv, I_C_OLD, cold)
            isv = setcol(isv, I_C_CTR, cctr)

            fs, isv = interp_gain_config(
                fs, isv, F_CG_CUR, F_CG_TGT, F_CG_OLD, I_CG_CTR, 2)
            rate, cngate = col(fs, F_CG_CUR + 0), col(fs, F_CG_CUR + 1)
            call_c = col(isv, I_CG_CALL) + 1
            poorx_c = jnp.where(poor_exc, 0, col(isv, I_CG_POOR)) + 1
            isv = setcol(isv, I_CG_CALL, call_c)
            isv = setcol(isv, I_CG_POOR, poorx_c)
            no_upd_c = ((poorx_c < csize) | sat | (call_c <= csize))
            mu_c = jnp.where(X2_coa > cngate[:, None],
                             rate[:, None] / jnp.maximum(X2_coa, 1e-30), 0.0)
            mu_c = jnp.where(nmask > 0, 0.0, mu_c)

            cmask = (iota4(Pc) < s4(csize, Pc)).astype(jnp.float32)
            Xcr = Xr[:, :Pc] * cmask
            Xci = -Xi[:, :Pc] * cmask
            cpc = jnp.minimum(col(isv, I_C_PC), csize - 1)
            cpc_oh = (iota4(Pc) == s4(cpc, Pc)).astype(jnp.float32)
            for c in range(C):
                poor_c = jnp.where(e2_r[c] < e2_c[c],
                                   col(isv, lay.I_POOR_COARSE + c) + 1, 0)
                reset_c = poor_c >= 5
                poor_c = jnp.where(reset_c, 0, poor_c)
                isv = setcol(isv, lay.I_POOR_COARSE + c, poor_c)

                Hcr[c] = Hcr[c] * keep_c
                Hci[c] = Hci[c] * keep_c
                rc = reset_c[:, None, None]
                Hcr[c] = jnp.where(rc, Hr[c][:, :Pc], Hcr[c])
                Hci[c] = jnp.where(rc, Hi[c][:, :Pc], Hci[c])
                hang = col(isv, lay.I_RESET_HANG + c)
                hang = jnp.where(reset_c, coarse_reset_hangover_blocks,
                                 jnp.maximum(hang - 1, 0))
                isv = setcol(isv, lay.I_RESET_HANG + c, hang)
                Efr = jnp.where(reset_c[:, None], Er[c], Ecr[c])
                Efi = jnp.where(reset_c[:, None], Ei[c], Eci[c])
                Gcr = jnp.where(no_upd_c[:, None], 0.0, mu_c * Efr)
                Gci = jnp.where(no_upd_c[:, None], 0.0, mu_c * Efi)

                Gcr4, Gci4 = g4(Gcr, Pc), g4(Gci, Pc)
                Hcr_a = Hcr[c] + Xcr * Gcr4 - Xci * Gci4
                Hci_a = Hci[c] + Xcr * Gci4 + Xci * Gcr4
                Hcr[c], Hci[c], _ = constrain(Hcr_a, Hci_a, cpc_oh, Pc)
            isv = setcol(isv, I_C_PC,
                         jnp.where(cpc < csize - 1, cpc + 1, 0))

            # ---- per-block outputs.
            for c in range(C):
                o_eref[:, k * C + c] = e_ref[c]
                o_ecoa[:, k * C + c] = e_coa[c]
                o_scal[:, k * C + c] = pack_lanes(
                    [y2[c], e2_r[c], e2_c[c], s2_r[c], s2_c[c], smax_r[c],
                     smax_c[c]], NO)
                o_ofreq[c][:, k] = freq[c]
                o_oimp[c][:, k] = imp[c]
            o_osize[:, k] = size_r

        for c in range(C):
            out_ch[c][0][:] = Hr[c]
            out_ch[c][1][:] = Hi[c]
            out_ch[c][2][:] = Hcr[c]
            out_ch[c][3][:] = Hci[c]
            out_ch[c][4][:] = H_err[c]
            out_ch[c][5][:] = freq[c]
            out_ch[c][6][:] = imp[c]
        o_fscal[:] = pack_lanes([fs[i] for i in range(NF)], NF)
        o_iscal[:] = pack_lanes([isv[i] for i in range(NI)], NI, jnp.int32)

    def run(state_arrays, chains, per_block, sb=8):
        """state_arrays: per-channel 7-tuples flattened (C*7 arrays) then
        (fs, iv); chains: (Cr, Ci, Cs); per_block: (offs, y, nmask, flags,
        sat). All batched with leading B."""
        assert len(state_arrays) == C * N_CH_ARRAYS + 2
        fs, isv = state_arrays[-2:]
        (Cr, Ci, Cs) = chains
        (offs, y, nmask, flags, sat) = per_block
        B = fs.shape[0]
        assert B % sb == 0, (B, sb)
        grid = (B // sb,)

        # Fold the render-channel axis into lanes (free: row-major
        # contiguous) for the filter planes and the complex chains; the
        # kernel computes entirely in the folded layout.
        state_arrays = list(state_arrays)
        for c in range(C):
            for j in range(4):  # Hr, Hi, Hcr, Hci
                a = state_arrays[c * N_CH_ARRAYS + j]
                state_arrays[c * N_CH_ARRAYS + j] = a.reshape(
                    a.shape[0], a.shape[1], -1)
        Cr = Cr.reshape(Cr.shape[0], Cr.shape[1], -1)
        Ci = Ci.reshape(Ci.shape[0], Ci.shape[1], -1)

        def bs(shape_tail):
            return pl.BlockSpec((sb,) + shape_tail,
                                lambda i: (i,) + (0,) * len(shape_tail),
                                memory_space=pltpu.VMEM)

        def shared(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        idt = jnp.asarray(idft_tail)
        dhi_a = jnp.asarray(dft_hi)
        ihre = jnp.asarray(bd_ih_re)
        ihim = jnp.asarray(bd_ih_im)
        dlre = jnp.asarray(bd_dl_re)
        dlim = jnp.asarray(bd_dl_im)

        out_shape = (
            [jax.ShapeDtypeStruct(a.shape,
                                  jnp.int32 if a is isv else jnp.float32)
             for a in state_arrays]
            + [
                jax.ShapeDtypeStruct((B, nb * C, BLOCK), jnp.float32),  # e_r
                jax.ShapeDtypeStruct((B, nb * C, BLOCK), jnp.float32),  # e_c
                jax.ShapeDtypeStruct((B, nb * C, NO), jnp.float32),  # scalars
            ]
            + [jax.ShapeDtypeStruct((B, nb, P, NUM_BINS), jnp.float32)
               for _ in range(C)]
            + [jax.ShapeDtypeStruct((B, nb, P, BLOCK), jnp.float32)
               for _ in range(C)]
            + [jax.ShapeDtypeStruct((B, nb), jnp.int32)]               # size
        )
        in_specs = (
            [bs(a.shape[1:]) for a in state_arrays]
            + [bs(Cr.shape[1:]), bs(Ci.shape[1:]), bs(Cs.shape[1:]),
               bs(offs.shape[1:]), bs(y.shape[1:]), bs(nmask.shape[1:]),
               bs(flags.shape[1:]), bs(sat.shape[1:]),
               shared(idt.shape), shared(dhi_a.shape),
               shared(ihre.shape), shared(ihim.shape),
               shared(dlre.shape), shared(dlim.shape)]
        )
        out_specs = (
            [bs(a.shape[1:]) for a in state_arrays]
            + [bs((nb * C, BLOCK)), bs((nb * C, BLOCK)), bs((nb * C, NO))]
            + [bs((nb, P, NUM_BINS)) for _ in range(C)]
            + [bs((nb, P, BLOCK)) for _ in range(C)]
            + [bs((nb,))]
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            # The unrolled 2-3 block body carries many live VMEM
            # temporaries; the default 16 MB scoped-vmem budget is too
            # tight once the surrounding program's temporaries are
            # accounted (same as ops/pallas_mf.py).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*state_arrays, Cr, Ci, Cs, offs, y, nmask, flags, sat,
          idt, dhi_a, ihre, ihim, dlre, dlim)

        # Unfold the filter planes back to (B, Pp, R, 65).
        out = list(out)
        for c in range(C):
            for j in range(4):
                a = out[c * N_CH_ARRAYS + j]
                out[c * N_CH_ARRAYS + j] = a.reshape(
                    a.shape[0], a.shape[1], R, NUM_BINS)
        return tuple(out)

    return run
