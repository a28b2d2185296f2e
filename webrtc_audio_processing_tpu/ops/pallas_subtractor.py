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

Scope: C_cap == 1 (the echo-controller mono capture path — the serving
configuration); any C_ren. The XLA pair path remains the fallback for
multi-capture geometries.

Layouts (B = batch of streams, leading; all f32/i32):
- H as separate re/im planes (B, P, R, 65);
- the per-pair render chains as planar rows (B, 2W, R, 65) re/im plus a
  channel-summed spectrum chain (B, 2W, 65); per-block windows are
  dynamic row slices of the VMEM-resident chains;
- scalar state packed into (B, NF) f32 + (B, NI) i32 vectors;
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

# f32 scalar slots
F_RG_CUR = 0      # refined gain config current (5)
F_RG_TGT = 5
F_RG_OLD = 10
F_CG_CUR = 15     # coarse gain config current (2)
F_CG_TGT = 17
F_CG_OLD = 19
F_MIS_E2 = 21
F_MIS_Y2 = 22
F_MIS_INV = 23
NF = 24

# i32 scalar slots
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
I_MIS_BLK = 16
I_MIS_OVER = 17
I_POOR_COARSE = 18
I_RESET_HANG = 19
NI = 20

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


def _interp_gain_config(cur, tgt, old, ctr, duration):
    """GainConfigState interpolation (_update_gain_config). cur/tgt/old:
    (B, K); ctr: (B,) i32. Returns (cur', old', ctr')."""
    ctr2 = jnp.maximum(ctr - 1, 0)
    in_trans = ctr > 0
    still = ctr2 > 0
    factor = (ctr2.astype(jnp.float32) / duration)[:, None]
    interp = old * factor + tgt * (1.0 - factor)
    cur2 = jnp.where(in_trans[:, None], jnp.where(still[:, None], interp,
                                                  tgt), cur)
    old2 = jnp.where((in_trans & ~still)[:, None], tgt, old)
    return cur2, old2, ctr2


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


def _apply_filter(Xr, Xi, Hr, Hi, m):
    """S = sum_{p<size, r} X * H. X/H: (B, P, R, 65); m: prebuilt
    (B, P, R, 65) 0/1 partition mask. Returns (S_re, S_im): (B, 65)."""
    Sr = jnp.sum((Xr * Hr - Xi * Hi) * m, axis=(1, 2))
    Si = jnp.sum((Xr * Hi + Xi * Hr) * m, axis=(1, 2))
    return Sr, Si


def _mask_partitions(H, size):
    P = H.shape[1]
    keep = (jnp.arange(P)[None, :] < size[:, None])[:, :, None, None]
    return jnp.where(keep, H, 0.0)


def make_pair_kernel(
    *,
    nb: int,              # blocks in this frame (2 or 3)
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
    k64 = np.arange(64)
    hann64 = (np.sin(np.pi * k64 / 63.0) ** 2).astype(np.float32)

    r_cfg = np.asarray(refined_cfg, np.float32)
    c_cfg = np.asarray(coarse_cfg, np.float32)
    r_cfg0 = np.asarray(refined_initial_cfg, np.float32)
    c_cfg0 = np.asarray(coarse_initial_cfg, np.float32)

    def kernel(
        # inputs (VMEM refs, leading dim = SB stream tile)
        hr_ref, hi_ref, hcr_ref, hci_ref, herr_ref, freq_ref, imp_ref,
        fscal_ref, iscal_ref,
        cfr_ref, cfi_ref, csum_ref,        # chains
        offs_ref, y_ref, mask_ref, flags_ref, sat_ref,
        b_idt_ref, b_idh_ref, b_dlo_ref, b_dhi_ref,
        # outputs
        o_hr, o_hi, o_hcr, o_hci, o_herr, o_freq, o_imp, o_fscal, o_iscal,
        o_eref, o_ecoa, o_scal, o_ofreq, o_oimp, o_osize,
    ):
        Hr = hr_ref[:]            # (SB, P, R, 65)
        Hi = hi_ref[:]
        Hcr = hcr_ref[:]          # (SB, Pc, R, 65)
        Hci = hci_ref[:]
        H_err = herr_ref[:]       # (SB, 65)
        freq = freq_ref[:]        # (SB, P, 65)
        imp = imp_ref[:]          # (SB, P, 64)
        # Scalar state as per-slot (SB,) values (a dict, re-stacked at the
        # end): .at[:, i].set column updates lower to scatter, which
        # Mosaic does not implement.
        _fs0 = fscal_ref[:]       # (SB, NF)
        _is0 = iscal_ref[:]       # (SB, NI)
        fs = {i: _fs0[:, i] for i in range(NF)}
        isv = {i: _is0[:, i] for i in range(NI)}
        Cr = cfr_ref[:]           # (SB, W2, R, 65)
        Ci = cfi_ref[:]
        Cs = csum_ref[:]          # (SB, W2, 65)
        sat = sat_ref[:][:, 0] != 0  # (SB,)
        idt = b_idt_ref[:]        # (130, 64) tail idft
        idh = b_idh_ref[:]        # (130, 64) head idft
        dlo = b_dlo_ref[:]        # (64, 130)
        dhi = b_dhi_ref[:]        # (64, 130)
        # kHanning64 built in-kernel (captured host constants are not
        # allowed in pallas kernels): sin^2(pi k / 63).
        hk = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1).astype(
            jnp.float32)
        hann = jnp.sin(np.float32(np.pi) * hk / 63.0) ** 2  # (1, 64)

        SB = Hr.shape[0]
        pidx = jnp.arange(P)

        def col(v, i):
            return v[i]

        def setcol(v, i, x):
            v = dict(v)
            v[i] = x
            return v

        def getvec(v, base, n):
            return jnp.stack([v[base + j] for j in range(n)], axis=-1)

        def setvec(v, base, arr):
            v = dict(v)
            for j in range(arr.shape[-1]):
                v[base + j] = arr[:, j]
            return v


        def bdim(v, shape, dims):
            return jax.lax.broadcast_in_dim(v, shape, dims)

        # Mosaic cannot relayout (SB, P)-shaped vectors into higher ranks
        # (the lane dim would become a sublane dim), so partition masks
        # are built directly at target rank from iota-vs-scalar compares:
        # (SB,) -> rank-N leading broadcasts are supported.
        def iota4(Pp):
            return jax.lax.broadcasted_iota(
                jnp.int32, (SB, Pp, R, NUM_BINS), 1)

        def iota3(Pp, K):
            return jax.lax.broadcasted_iota(jnp.int32, (SB, Pp, K), 1)

        def s4(v, Pp):    # (SB,) -> (SB, Pp, R, 65)
            return bdim(v, (SB, Pp, R, NUM_BINS), (0,))

        def s3(v, Pp, K):
            return bdim(v, (SB, Pp, K), (0,))

        def g4(g, Pp):    # (SB, 65) -> (SB, Pp, R, 65)
            return bdim(g, (SB, Pp, R, NUM_BINS), (0, 3))

        def r4(v, Pp):    # (SB, R, 65) -> (SB, Pp, R, 65)
            return bdim(v, (SB, Pp, R, NUM_BINS), (0, 2, 3))

        stage = _DEBUG_STAGE
        for k in range(nb):
            if stage < 1:
                break
            off = offs_ref[:, k]           # (SB,) row offset in chain
            y = y_ref[:, k]                # (SB, 64)
            nmask = mask_ref[:, k]         # (SB, 65) 1.0 where zeroed
            poor_exc = flags_ref[:, k, 0] != 0
            delay_ch = flags_ref[:, k, 1] != 0
            gain_ch = flags_ref[:, k, 2] != 0
            transition = flags_ref[:, k, 3] != 0

            # ---- handle_echo_path_change (full reset on delay change).
            z = delay_ch[:, None, None, None]
            Hr = jnp.where(z, 0.0, Hr)
            Hi = jnp.where(z, 0.0, Hi)
            Hcr = jnp.where(z, 0.0, Hcr)
            Hci = jnp.where(z, 0.0, Hci)
            H_err = jnp.where(delay_ch[:, None], H_ERROR_INITIAL, H_err)
            dc = delay_ch
            dci = dc.astype(jnp.int32)
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
            del dci

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

            # ---- per-block X window + spectral sums from the chains.
            # Chain rows are (W2, R, 65); the window is rows
            # [off, off+P) — per-stream dynamic, selected by a one-hot
            # row mask in VMEM (cheap: the chain is on-chip).
            wsel = (jnp.arange(W2)[None, :, None]
                    == (off[:, None, None] + jnp.arange(P)[None, None, :]))
            wsf = wsel.astype(jnp.float32)  # (SB, W2, P)

            # Xw[p] = sum_w wsel[w, p] * chain[w]; per render channel —
            # Mosaic cannot shape-cast the fused (R, 65) contraction.
            def _sel(chain_swk):
                return jnp.einsum("swp,swk->spk", wsf, chain_swk,
                                  preferred_element_type=jnp.float32)

            Xr = jnp.stack([_sel(Cr[:, :, r]) for r in range(R)], axis=2)
            Xi = jnp.stack([_sel(Ci[:, :, r]) for r in range(R)], axis=2)
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
            # ---- apply + prediction error (both filters).
            Sr_r, Si_r = _apply_filter(
                Xr, Xi, Hr, Hi,
                (iota4(P) < s4(size_r, P)).astype(jnp.float32))
            Sr_c, Si_c = _apply_filter(
                Xr[:, :Pc], Xi[:, :Pc], Hcr, Hci,
                (iota4(Pc) < s4(size_c, Pc)).astype(jnp.float32))
            s_ref = (jnp.dot(Sr_r, idt[:NUM_BINS],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(Si_r, idt[NUM_BINS:],
                               preferred_element_type=jnp.float32))
            s_coa = (jnp.dot(Sr_c, idt[:NUM_BINS],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(Si_c, idt[NUM_BINS:],
                               preferred_element_type=jnp.float32))
            e_ref = y - s_ref
            e_coa = y - s_coa

            y2 = jnp.sum(y * y, axis=-1)
            e2_r = jnp.sum(e_ref * e_ref, axis=-1)
            e2_c = jnp.sum(e_coa * e_coa, axis=-1)
            s2_r = jnp.sum(s_ref * s_ref, axis=-1)
            s2_c = jnp.sum(s_coa * s_coa, axis=-1)
            smax_r = jnp.max(jnp.abs(s_ref), axis=-1)
            smax_c = jnp.max(jnp.abs(s_coa), axis=-1)

            if stage < 4:
                o_eref[:, k] = e_ref
                o_ecoa[:, k] = e_coa
                continue
            # ---- misadjustment estimator (subtractor.cc:324-357).
            e2a = col(fs, F_MIS_E2) + e2_r
            y2a = col(fs, F_MIS_Y2) + y2
            nblk = col(isv, I_MIS_BLK) + 1
            win_done = nblk == 4
            active = y2a > 4 * 200.0**2 * BLOCK
            upd = e2a / jnp.maximum(y2a, 1e-30)
            over = col(isv, I_MIS_OVER)
            over = jnp.where(
                win_done & active & (e2a > 4 * 7500.0**2 * BLOCK), 4,
                jnp.maximum(over - jnp.where(win_done & active, 1, 0), 0))
            mis_inv = col(fs, F_MIS_INV)
            take = win_done & active & ((upd < mis_inv) | (over > 0))
            mis_inv = jnp.where(take, mis_inv + 0.1 * (upd - mis_inv),
                                mis_inv)
            e2a = jnp.where(win_done, 0.0, e2a)
            y2a = jnp.where(win_done, 0.0, y2a)
            nblk = jnp.where(win_done, 0, nblk)
            adjust = mis_inv > 10.0
            scale = jnp.where(
                adjust, 2.0 / jnp.sqrt(jnp.maximum(mis_inv, 1e-10)), 1.0)
            Hr = Hr * scale[:, None, None, None]
            Hi = Hi * scale[:, None, None, None]
            imp = imp * scale[:, None, None]
            s_ref = s_ref * scale[:, None]
            e_ref = y - s_ref
            mis_inv = jnp.where(adjust, 0.0, mis_inv)
            over = jnp.where(adjust, 0, over)
            e2a = jnp.where(adjust, 0.0, e2a)
            y2a = jnp.where(adjust, 0.0, y2a)
            nblk = jnp.where(adjust, 0, nblk)
            fs = setcol(fs, F_MIS_E2, e2a)
            fs = setcol(fs, F_MIS_Y2, y2a)
            fs = setcol(fs, F_MIS_INV, mis_inv)
            isv = setcol(isv, I_MIS_BLK, nblk)
            isv = setcol(isv, I_MIS_OVER, over)

            if stage < 5:
                o_eref[:, k] = e_ref
                o_ecoa[:, k] = e_coa
                continue
            # ---- error FFTs (hanning, zero-padded).
            we_r = e_ref * hann
            we_c = e_coa * hann
            Er = jnp.dot(we_r, dhi[:, :NUM_BINS],
                         preferred_element_type=jnp.float32)
            Ei = jnp.dot(we_r, dhi[:, NUM_BINS:],
                         preferred_element_type=jnp.float32)
            Ecr = jnp.dot(we_c, dhi[:, :NUM_BINS],
                          preferred_element_type=jnp.float32)
            Eci = jnp.dot(we_c, dhi[:, NUM_BINS:],
                          preferred_element_type=jnp.float32)
            E2_r = Er * Er + Ei * Ei
            E2_c = Ecr * Ecr + Eci * Eci

            # ---- refined gain (refined_filter_update_gain.cc:80-150).
            cur, old, ctr = _interp_gain_config(
                getvec(fs, F_RG_CUR, 5), getvec(fs, F_RG_TGT, 5),
                getvec(fs, F_RG_OLD, 5), col(isv, I_RG_CTR), duration)
            fs = setvec(fs, F_RG_CUR, cur)
            fs = setvec(fs, F_RG_OLD, old)
            isv = setcol(isv, I_RG_CTR, ctr)
            leak_conv, leak_div = cur[:, 0], cur[:, 1]
            err_floor, err_ceil, noise_gate = cur[:, 2], cur[:, 3], cur[:, 4]
            call_r = col(isv, I_RG_CALL) + 1
            poor_r = jnp.where(poor_exc, 0, col(isv, I_RG_POOR)) + 1
            isv = setcol(isv, I_RG_CALL, call_r)
            isv = setcol(isv, I_RG_POOR, poor_r)
            no_upd = ((poor_r < size_r) | sat | (call_r <= size_r))
            sizef = size_r.astype(jnp.float32)[:, None]
            mu = jnp.where(
                X2_ref >= noise_gate[:, None],
                H_err / (0.5 * H_err * X2_ref + sizef * E2_r), 0.0)
            mu = jnp.where(nmask > 0, 0.0, mu)
            mu = jnp.where(no_upd[:, None], 0.0, mu)
            H_err = H_err - 0.5 * mu * X2_ref * H_err
            Gr = jnp.where(no_upd[:, None], 0.0, mu * Er)
            Gi = jnp.where(no_upd[:, None], 0.0, mu * Ei)
            hang = col(isv, I_RESET_HANG)
            disallow = hang > 0
            erl = jnp.sum(freq, axis=1)  # (SB, 65)
            leak = jnp.where(((E2_r <= E2_c) | disallow[:, None]),
                             leak_conv[:, None], leak_div[:, None])
            H_err = H_err + leak * erl
            H_err = jnp.clip(H_err, err_floor[:, None], err_ceil[:, None])
            # Adjusted channels get zero refined gain (subtractor.cc:268).
            Gr = jnp.where(adjust[:, None], 0.0, Gr)
            Gi = jnp.where(adjust[:, None], 0.0, Gi)

            if stage < 6:
                o_eref[:, k] = e_ref
                o_ecoa[:, k] = e_coa
                continue
            # ---- refined update size + adapt + constrain.
            new_size, new_old, new_ctr = _update_size(
                col(isv, I_R_CUR), col(isv, I_R_TGT), col(isv, I_R_OLD),
                col(isv, I_R_CTR), duration)
            keep_new = 1.0 - ((iota4(P) >= s4(col(isv, I_R_CUR), P))
                              & (iota4(P) < s4(new_size, P))).astype(
                                  jnp.float32)
            Hr = Hr * keep_new
            Hi = Hi * keep_new
            isv = setcol(isv, I_R_CUR, new_size)
            isv = setcol(isv, I_R_OLD, new_old)
            isv = setcol(isv, I_R_CTR, new_ctr)
            pc = jnp.minimum(col(isv, I_R_PC), new_size - 1)
            size_r = new_size

            maskp = (iota4(P) < s4(size_r, P)).astype(jnp.float32)
            Xmr = Xr * maskp
            Xmi = -Xi * maskp  # conj
            # adapt all partitions
            Gr4, Gi4 = g4(Gr, P), g4(Gi, P)
            Hr_a = Hr + Xmr * Gr4 - Xmi * Gi4
            Hi_a = Hi + Xmr * Gi4 + Xmi * Gr4
            # constrain partition pc: one-hot row select in VMEM.
            pc_oh = (iota4(P) == s4(pc, P)).astype(jnp.float32)
            Hpc_r = jnp.sum(Hr_a * pc_oh, axis=1)  # (SB, R, 65)
            Hpc_i = jnp.sum(Hi_a * pc_oh, axis=1)
            flat_r = Hpc_r.reshape(SB * R, NUM_BINS)
            flat_i = Hpc_i.reshape(SB * R, NUM_BINS)
            h_head = (jnp.dot(flat_r, idh[:NUM_BINS],
                              preferred_element_type=jnp.float32)
                      + jnp.dot(flat_i, idh[NUM_BINS:],
                                preferred_element_type=jnp.float32))
            Hn_r = jnp.dot(h_head, dlo[:, :NUM_BINS],
                           preferred_element_type=jnp.float32)
            Hn_i = jnp.dot(h_head, dlo[:, NUM_BINS:],
                           preferred_element_type=jnp.float32)
            Hn_r = Hn_r.reshape(SB, R, NUM_BINS)
            Hn_i = Hn_i.reshape(SB, R, NUM_BINS)
            Hr = jnp.where(pc_oh > 0, r4(Hn_r, P), Hr_a)
            Hi = jnp.where(pc_oh > 0, r4(Hn_i, P), Hi_a)

            # impulse response row pc <- max-|.|-per-tap across render chs.
            hh = h_head.reshape(SB, R, BLOCK)
            seg = hh[:, 0]
            for rr in range(1, R):
                cand = hh[:, rr]
                seg = jnp.where(jnp.abs(seg) < jnp.abs(cand), cand, seg)
            pc_m = (iota3(P, BLOCK) == s3(pc, P, BLOCK)).astype(
                jnp.float32)
            seg_b = bdim(seg, (SB, P, BLOCK), (0, 2))
            imp = jnp.where(pc_m > 0, seg_b, imp)
            isv = setcol(isv, I_R_PC,
                         jnp.where(pc < size_r - 1, pc + 1, 0))

            # frequency response: max over render channels of |H|^2,
            # zero beyond current size (full recompute — H is on-chip).
            H2 = jnp.max(Hr * Hr + Hi * Hi, axis=2)  # (SB, P, 65)
            freq = H2 * (iota3(P, NUM_BINS)
                         < s3(size_r, P, NUM_BINS)).astype(jnp.float32)

            if stage < 7:
                o_eref[:, k] = e_ref
                o_ecoa[:, k] = e_coa
                o_ofreq[:, k] = freq
                o_oimp[:, k] = imp
                o_osize[:, k] = size_r
                continue
            # ---- coarse filter path (subtractor.cc:282-311).
            poor_c = jnp.where(e2_r < e2_c, col(isv, I_POOR_COARSE) + 1, 0)
            reset_c = poor_c >= 5
            poor_c = jnp.where(reset_c, 0, poor_c)
            isv = setcol(isv, I_POOR_COARSE, poor_c)

            csize, cold, cctr = _update_size(
                col(isv, I_C_CUR), col(isv, I_C_TGT), col(isv, I_C_OLD),
                col(isv, I_C_CTR), duration)
            keep_c = 1.0 - ((iota4(Pc) >= s4(col(isv, I_C_CUR), Pc))
                            & (iota4(Pc) < s4(csize, Pc))).astype(jnp.float32)
            Hcr = Hcr * keep_c
            Hci = Hci * keep_c
            isv = setcol(isv, I_C_CUR, csize)
            isv = setcol(isv, I_C_OLD, cold)
            isv = setcol(isv, I_C_CTR, cctr)
            rc = reset_c[:, None, None, None]
            Hcr = jnp.where(rc, Hr[:, :Pc], Hcr)
            Hci = jnp.where(rc, Hi[:, :Pc], Hci)
            hang = jnp.where(reset_c, coarse_reset_hangover_blocks,
                             jnp.maximum(hang - 1, 0))
            isv = setcol(isv, I_RESET_HANG, hang)
            Efr = jnp.where(reset_c[:, None], Er, Ecr)
            Efi = jnp.where(reset_c[:, None], Ei, Eci)

            ccur, ccold, ccctr = _interp_gain_config(
                getvec(fs, F_CG_CUR, 2), getvec(fs, F_CG_TGT, 2),
                getvec(fs, F_CG_OLD, 2), col(isv, I_CG_CTR), duration)
            fs = setvec(fs, F_CG_CUR, ccur)
            fs = setvec(fs, F_CG_OLD, ccold)
            isv = setcol(isv, I_CG_CTR, ccctr)
            rate, cngate = ccur[:, 0], ccur[:, 1]
            call_c = col(isv, I_CG_CALL) + 1
            poorx_c = jnp.where(poor_exc, 0, col(isv, I_CG_POOR)) + 1
            isv = setcol(isv, I_CG_CALL, call_c)
            isv = setcol(isv, I_CG_POOR, poorx_c)
            no_upd_c = ((poorx_c < csize) | sat | (call_c <= csize))
            mu_c = jnp.where(X2_coa > cngate[:, None],
                             rate[:, None] / jnp.maximum(X2_coa, 1e-30), 0.0)
            mu_c = jnp.where(nmask > 0, 0.0, mu_c)
            Gcr = jnp.where(no_upd_c[:, None], 0.0, mu_c * Efr)
            Gci = jnp.where(no_upd_c[:, None], 0.0, mu_c * Efi)

            cmask = (iota4(Pc) < s4(csize, Pc)).astype(jnp.float32)
            Xcr = Xr[:, :Pc] * cmask
            Xci = -Xi[:, :Pc] * cmask
            Gcr4, Gci4 = g4(Gcr, Pc), g4(Gci, Pc)
            Hcr_a = Hcr + Xcr * Gcr4 - Xci * Gci4
            Hci_a = Hci + Xcr * Gci4 + Xci * Gcr4
            cpc = jnp.minimum(col(isv, I_C_PC), csize - 1)
            cpc_oh = (iota4(Pc) == s4(cpc, Pc)).astype(jnp.float32)
            Cpc_r = jnp.sum(Hcr_a * cpc_oh, axis=1)
            Cpc_i = jnp.sum(Hci_a * cpc_oh, axis=1)
            cflat_r = Cpc_r.reshape(SB * R, NUM_BINS)
            cflat_i = Cpc_i.reshape(SB * R, NUM_BINS)
            ch_head = (jnp.dot(cflat_r, idh[:NUM_BINS],
                               preferred_element_type=jnp.float32)
                       + jnp.dot(cflat_i, idh[NUM_BINS:],
                                 preferred_element_type=jnp.float32))
            Cn_r = jnp.dot(ch_head, dlo[:, :NUM_BINS],
                           preferred_element_type=jnp.float32)
            Cn_i = jnp.dot(ch_head, dlo[:, NUM_BINS:],
                           preferred_element_type=jnp.float32)
            Cn_r = Cn_r.reshape(SB, R, NUM_BINS)
            Cn_i = Cn_i.reshape(SB, R, NUM_BINS)
            Hcr = jnp.where(cpc_oh > 0, r4(Cn_r, Pc), Hcr_a)
            Hci = jnp.where(cpc_oh > 0, r4(Cn_i, Pc), Hci_a)
            isv = setcol(isv, I_C_PC,
                         jnp.where(cpc < csize - 1, cpc + 1, 0))

            # ---- per-block outputs.
            o_eref[:, k] = e_ref
            o_ecoa[:, k] = e_coa
            o_scal[:, k] = jnp.stack(
                [y2, e2_r, e2_c, s2_r, s2_c, smax_r, smax_c], axis=-1
            )
            o_ofreq[:, k] = freq
            o_oimp[:, k] = imp
            o_osize[:, k] = size_r

        o_hr[:] = Hr
        o_hi[:] = Hi
        o_hcr[:] = Hcr
        o_hci[:] = Hci
        o_herr[:] = H_err
        o_freq[:] = freq
        o_imp[:] = imp
        o_fscal[:] = jnp.stack([fs[i] for i in range(NF)], axis=-1)
        o_iscal[:] = jnp.stack([isv[i] for i in range(NI)], axis=-1)

    def run(state_arrays, chains, per_block, sb=8):
        (Hr, Hi, Hcr, Hci, H_err, freq, imp, fs, isv) = state_arrays
        (Cr, Ci, Cs) = chains
        (offs, y, nmask, flags, sat) = per_block
        B = Hr.shape[0]
        assert B % sb == 0, (B, sb)
        grid = (B // sb,)

        def bs(shape_tail):
            return pl.BlockSpec((sb,) + shape_tail,
                                lambda i: (i,) + (0,) * len(shape_tail),
                                memory_space=pltpu.VMEM)

        def shared(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        idt = jnp.asarray(idft_tail)
        idh = jnp.asarray(idft_head)
        dlo_a = jnp.asarray(dft_lo)
        dhi_a = jnp.asarray(dft_hi)

        out_shape = [
            jax.ShapeDtypeStruct(Hr.shape, jnp.float32),
            jax.ShapeDtypeStruct(Hi.shape, jnp.float32),
            jax.ShapeDtypeStruct(Hcr.shape, jnp.float32),
            jax.ShapeDtypeStruct(Hci.shape, jnp.float32),
            jax.ShapeDtypeStruct(H_err.shape, jnp.float32),
            jax.ShapeDtypeStruct(freq.shape, jnp.float32),
            jax.ShapeDtypeStruct(imp.shape, jnp.float32),
            jax.ShapeDtypeStruct(fs.shape, jnp.float32),
            jax.ShapeDtypeStruct(isv.shape, jnp.int32),
            jax.ShapeDtypeStruct((B, nb, BLOCK), jnp.float32),   # e_ref
            jax.ShapeDtypeStruct((B, nb, BLOCK), jnp.float32),   # e_coa
            jax.ShapeDtypeStruct((B, nb, NO), jnp.float32),      # scalars
            jax.ShapeDtypeStruct((B, nb, P, NUM_BINS), jnp.float32),
            jax.ShapeDtypeStruct((B, nb, P, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((B, nb), jnp.int32),            # size
        ]
        in_specs = [
            bs(Hr.shape[1:]), bs(Hi.shape[1:]),
            bs(Hcr.shape[1:]), bs(Hci.shape[1:]),
            bs(H_err.shape[1:]), bs(freq.shape[1:]), bs(imp.shape[1:]),
            bs(fs.shape[1:]), bs(isv.shape[1:]),
            bs(Cr.shape[1:]), bs(Ci.shape[1:]), bs(Cs.shape[1:]),
            bs(offs.shape[1:]), bs(y.shape[1:]), bs(nmask.shape[1:]),
            bs(flags.shape[1:]), bs(sat.shape[1:]),
            shared(idt.shape), shared(idh.shape),
            shared(dlo_a.shape), shared(dhi_a.shape),
        ]
        out_specs = [
            bs(Hr.shape[1:]), bs(Hi.shape[1:]),
            bs(Hcr.shape[1:]), bs(Hci.shape[1:]),
            bs(H_err.shape[1:]), bs(freq.shape[1:]), bs(imp.shape[1:]),
            bs(fs.shape[1:]), bs(isv.shape[1:]),
            bs((nb, BLOCK)), bs((nb, BLOCK)), bs((nb, NO)),
            bs((nb, P, NUM_BINS)), bs((nb, P, BLOCK)), bs((nb,)),
        ]
        return pl.pallas_call(
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
        )(Hr, Hi, Hcr, Hci, H_err, freq, imp, fs, isv,
          Cr, Ci, Cs, offs, y, nmask, flags, sat,
          idt, idh, dlo_a, dhi_a)

    return run
