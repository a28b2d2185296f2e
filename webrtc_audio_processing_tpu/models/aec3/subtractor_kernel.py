"""Pallas pair-megakernel front-end for the AEC3 subtractor.

Bridges models/aec3/subtractor.SubtractorState to the packed-array
interface of ops/pallas_subtractor (state pack/unpack is elementwise and
therefore vmap-transparent; the kernel itself is reached through
jax.custom_batching.custom_vmap exactly like ops/pallas_mf — the AEC3
modules trace per-stream and the serving vmap supplies the batch).

Scope: any C_cap / C_ren (the reference's per-capture-channel subtractor
iterations are independent, aec3/subtractor.cc:196-321, and are unrolled
in-kernel). The XLA subtractor.process_pair is both the semantic reference
(equivalence test: tests/test_subtractor_pallas.py) and the fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from webrtc_audio_processing_tpu.models.aec3 import subtractor as subt
from webrtc_audio_processing_tpu.models.aec3.config import EchoCanceller3Config
from webrtc_audio_processing_tpu.ops import pallas_subtractor as pk

NUM_BINS = 65
BLOCK = 64


def supported(config: EchoCanceller3Config, num_capture: int) -> bool:
    del config, num_capture
    return True


def pack_state(state: subt.SubtractorState):
    """SubtractorState -> kernel arrays (unbatched): per capture channel
    (Hr, Hi, Hcr, Hci, H_error, freq, imp) then shared (fs, iv)."""
    C = state.refined.H.shape[0]
    lay = pk.ScalarLayout(C)
    arrays = []
    for c in range(C):
        H = state.refined.H[c]  # (P, R, 65) complex
        Hc = state.coarse.H[c]
        arrays += [
            H.real, H.imag, Hc.real, Hc.imag,
            state.refined_gain.H_error[c],
            state.refined_frequency_responses[c],
            state.refined_impulse_responses[c].reshape(-1, BLOCK),
        ]
    fs = jnp.concatenate([
        state.refined_gain.config.current,
        state.refined_gain.config.target,
        state.refined_gain.config.old_target,
        state.coarse_gain.config.current,
        state.coarse_gain.config.target,
        state.coarse_gain.config.old_target,
        state.mis_e2_acum, state.mis_y2_acum, state.mis_inv,
    ]).astype(jnp.float32)
    assert fs.shape == (lay.NF,)
    iv = jnp.concatenate([
        jnp.stack([
            state.refined.current_size, state.refined.target_size,
            state.refined.old_target_size, state.refined.size_change_counter,
            state.refined.partition_to_constrain,
            state.coarse.current_size, state.coarse.target_size,
            state.coarse.old_target_size, state.coarse.size_change_counter,
            state.coarse.partition_to_constrain,
            state.refined_gain.config.counter,
            state.coarse_gain.config.counter,
            state.refined_gain.poor_excitation_counter,
            state.refined_gain.call_counter,
            state.coarse_gain.poor_excitation_counter,
            state.coarse_gain.call_counter,
        ]),
        state.mis_blocks_acum, state.mis_overhang,
        state.poor_coarse_filter_counters,
        state.coarse_filter_reset_hangover,
    ]).astype(jnp.int32)
    assert iv.shape == (lay.NI,)
    return tuple(arrays) + (fs, iv)


def unpack_state(state: subt.SubtractorState, arrays):
    """Kernel arrays -> SubtractorState."""
    C = state.refined.H.shape[0]
    lay = pk.ScalarLayout(C)
    ch = [arrays[c * pk.N_CH_ARRAYS:(c + 1) * pk.N_CH_ARRAYS]
          for c in range(C)]
    fs, iv = arrays[C * pk.N_CH_ARRAYS:C * pk.N_CH_ARRAYS + 2]
    iv = iv.astype(jnp.int32)
    H = jnp.stack([jax.lax.complex(ch[c][0], ch[c][1]) for c in range(C)])
    Hc = jnp.stack([jax.lax.complex(ch[c][2], ch[c][3]) for c in range(C)])
    H_err = jnp.stack([ch[c][4] for c in range(C)])
    freq = jnp.stack([ch[c][5] for c in range(C)])
    imp = jnp.stack([ch[c][6].reshape(-1) for c in range(C)])
    rg_cfg = subt.GainConfigState(
        current=fs[pk.F_RG_CUR:pk.F_RG_CUR + 5],
        target=fs[pk.F_RG_TGT:pk.F_RG_TGT + 5],
        old_target=fs[pk.F_RG_OLD:pk.F_RG_OLD + 5],
        counter=iv[pk.I_RG_CTR],
    )
    cg_cfg = subt.GainConfigState(
        current=fs[pk.F_CG_CUR:pk.F_CG_CUR + 2],
        target=fs[pk.F_CG_TGT:pk.F_CG_TGT + 2],
        old_target=fs[pk.F_CG_OLD:pk.F_CG_OLD + 2],
        counter=iv[pk.I_CG_CTR],
    )
    return state.replace(
        refined=state.refined.replace(
            H=H,
            current_size=iv[pk.I_R_CUR],
            target_size=iv[pk.I_R_TGT],
            old_target_size=iv[pk.I_R_OLD],
            size_change_counter=iv[pk.I_R_CTR],
            partition_to_constrain=iv[pk.I_R_PC],
        ),
        coarse=state.coarse.replace(
            H=Hc,
            current_size=iv[pk.I_C_CUR],
            target_size=iv[pk.I_C_TGT],
            old_target_size=iv[pk.I_C_OLD],
            size_change_counter=iv[pk.I_C_CTR],
            partition_to_constrain=iv[pk.I_C_PC],
        ),
        refined_gain=state.refined_gain.replace(
            config=rg_cfg,
            H_error=H_err,
            poor_excitation_counter=iv[pk.I_RG_POOR],
            call_counter=iv[pk.I_RG_CALL],
        ),
        coarse_gain=state.coarse_gain.replace(
            config=cg_cfg,
            poor_excitation_counter=iv[pk.I_CG_POOR],
            call_counter=iv[pk.I_CG_CALL],
        ),
        mis_e2_acum=fs[lay.F_MIS_E2:lay.F_MIS_E2 + C],
        mis_y2_acum=fs[lay.F_MIS_Y2:lay.F_MIS_Y2 + C],
        mis_blocks_acum=iv[lay.I_MIS_BLK:lay.I_MIS_BLK + C],
        mis_inv=fs[lay.F_MIS_INV:lay.F_MIS_INV + C],
        mis_overhang=iv[lay.I_MIS_OVER:lay.I_MIS_OVER + C],
        poor_coarse_filter_counters=iv[
            lay.I_POOR_COARSE:lay.I_POOR_COARSE + C],
        coarse_filter_reset_hangover=iv[
            lay.I_RESET_HANG:lay.I_RESET_HANG + C],
        refined_frequency_responses=freq,
        refined_impulse_responses=imp,
    )


def _cfg_key(config: EchoCanceller3Config, nb, C, P, Pc, R, W2):
    f = config.filter
    return (
        nb, C, P, Pc, R, W2, f.config_change_duration_blocks,
        tuple(float(v) for v in (
            f.refined.leakage_converged, f.refined.leakage_diverged,
            f.refined.error_floor, f.refined.error_ceil,
            f.refined.noise_gate)),
        tuple(float(v) for v in (f.coarse.rate, f.coarse.noise_gate)),
        tuple(float(v) for v in (
            f.refined_initial.leakage_converged,
            f.refined_initial.leakage_diverged,
            f.refined_initial.error_floor, f.refined_initial.error_ceil,
            f.refined_initial.noise_gate)),
        tuple(float(v) for v in (f.coarse_initial.rate,
                                 f.coarse_initial.noise_gate)),
        int(f.refined_initial.length_blocks),
        int(f.coarse_initial.length_blocks),
        int(f.refined.length_blocks), int(f.coarse.length_blocks),
        int(f.coarse_reset_hangover_blocks),
        bool(f.enable_coarse_filter_output_usage),
    )


@functools.lru_cache(maxsize=32)
def _make_core(key, interpret: bool, sb: int):
    (nb, C, P, Pc, R, W2, duration, r_cfg, c_cfg, r_cfg0, c_cfg0,
     sz_r0, sz_c0, sz_r, sz_c, hangover, coarse_out) = key
    n_state = C * pk.N_CH_ARRAYS + 2
    run = pk.make_pair_kernel(
        nb=nb, C=C, P=P, Pc=Pc, R=R, W2=W2, duration=duration,
        refined_cfg=r_cfg, coarse_cfg=c_cfg,
        refined_initial_cfg=r_cfg0, coarse_initial_cfg=c_cfg0,
        initial_size_refined=sz_r0, initial_size_coarse=sz_c0,
        size_refined=sz_r, size_coarse=sz_c,
        coarse_reset_hangover_blocks=hangover,
        enable_coarse_output_usage=coarse_out,
        interpret=interpret,
    )

    def batched(args):
        state_arrays = args[:n_state]
        chains = args[n_state:n_state + 3]
        per_block = args[n_state + 3:]
        B = state_arrays[0].shape[0]
        eff_sb = sb
        while B % eff_sb:
            eff_sb //= 2
        # Never build a 1-stream-tile kernel: Mosaic cannot lower the
        # (1,)-vector -> 4D broadcasts it needs ("Broadcast in both
        # sublanes and lanes"), and on the axon attachment that compile
        # failure surfaces as a runtime UNIMPLEMENTED. Pad tiny batches
        # up to one full tile instead.
        if B < sb or eff_sb < sb:
            pad = -B % sb
            args_p = tuple(
                jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]
                ) if pad else a
                for a in args
            )
            out = run(args_p[:n_state], args_p[n_state:n_state + 3],
                      args_p[n_state + 3:], sb=sb)
            return tuple(o[:B] for o in out)
        return tuple(run(state_arrays, chains, per_block, sb=eff_sb))

    @jax.custom_batching.custom_vmap
    def core(*args):
        out = batched(tuple(a[None] for a in args))
        return tuple(o[0] for o in out)

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, b in zip(args, in_batched))
        out = batched(args)
        return out, tuple(True for _ in out)

    return core


def process_pair_kernel(
    config: EchoCanceller3Config,
    state: subt.SubtractorState,
    chain_fft,  # (2W, R, 65) complex — the per-pair sf fft chain
    chain_spec_sum,  # (2W, 65) — channel-summed spectra chain
    offsets,  # (nb,) int32 row offsets into the chain per block
    ys,  # (nb, C_cap, 64)
    narrow_masks,  # (nb, 65) bool
    poor_excitations,  # (nb,) bool
    delay_changes,  # (nb,) bool
    gain_changes,  # (nb,) bool
    transitions,  # (nb,) bool
    saturated_capture,  # () bool
    interpret: bool = False,
    sb: int = 32,  # streams per grid step; 32 measured fastest at B=1024
    #   (in-kernel compute 1.12 vs 1.53 ms/call at sb=8 — bigger stream
    #   tiles amortize per-step scalar/matmul overheads; VMEM still fits)
):
    """Kernel-backed subtractor.process_pair (same contract/outputs)."""
    nb = int(ys.shape[0])
    C = state.refined.H.shape[0]
    P = state.refined.H.shape[1]
    Pc = state.coarse.H.shape[1]
    R = state.refined.H.shape[2]  # (C, P, R, 65)
    W2 = int(chain_fft.shape[0])
    n_state = C * pk.N_CH_ARRAYS + 2

    arrays = pack_state(state)
    flags = jnp.stack([
        poor_excitations.astype(jnp.int32),
        delay_changes.astype(jnp.int32),
        gain_changes.astype(jnp.int32),
        transitions.astype(jnp.int32),
    ], axis=-1)  # (nb, 4)
    per_block = (
        offsets.astype(jnp.int32),
        ys.reshape(nb * C, BLOCK).astype(jnp.float32),
        narrow_masks.astype(jnp.float32),
        flags,
        jnp.asarray(saturated_capture).astype(jnp.int32)[None],  # (1,)
    )
    chains = (
        chain_fft.real.astype(jnp.float32),
        chain_fft.imag.astype(jnp.float32),
        chain_spec_sum.astype(jnp.float32),
    )

    core = _make_core(_cfg_key(config, nb, C, P, Pc, R, W2), interpret, sb)
    out = core(*arrays, *chains, *per_block)
    new_arrays = out[:n_state]
    e_ref, e_coa, scal = out[n_state:n_state + 3]
    ofreq = out[n_state + 3:n_state + 3 + C]
    oimp = out[n_state + 3 + C:n_state + 3 + 2 * C]
    osize = out[n_state + 3 + 2 * C]

    e_ref = e_ref.reshape(nb, C, BLOCK)
    e_coa = e_coa.reshape(nb, C, BLOCK)
    scal = scal.reshape(nb, C, pk.NO)

    new_state = unpack_state(state, new_arrays)
    outs = []
    for k in range(nb):
        outs.append(dict(
            e_refined=e_ref[k],
            e_coarse=e_coa[k],
            y2=scal[k, :, pk.O_Y2],
            e2_refined=scal[k, :, pk.O_E2R],
            e2_coarse=scal[k, :, pk.O_E2C],
            s2_refined=scal[k, :, pk.O_S2R],
            s2_coarse=scal[k, :, pk.O_S2C],
            s_refined_max_abs=scal[k, :, pk.O_SMAXR],
            s_coarse_max_abs=scal[k, :, pk.O_SMAXC],
            refined_frequency_responses=jnp.stack(
                [ofreq[c][k] for c in range(C)]),
            refined_impulse_responses=jnp.stack(
                [oimp[c][k].reshape(-1) for c in range(C)]),
            refined_current_size=osize[k],
        ))
    return new_state, outs
