"""Analytics (pitch-based) VAD chain: VadAudioProc + PitchBasedVad +
StandaloneVad, composed by VoiceActivityDetector.

Reference:
- modules/audio_processing/vad/{voice_activity_detector, vad_audio_proc,
  pitch_based_vad, pitch_internal, pole_zero_filter, standalone_vad,
  vad_circular_buffer, gmm}.cc and the GMM tables headers.
- The iSAC pitch DSP it drives: modules/audio_coding/codecs/isac/main/
  source/{isac_vad, filter_functions, pitch_estimator, pitch_filter}.c.

TPU design notes:
- All math is float32 under jit (the reference uses doubles on the host;
  tests bound the drift against a float64 oracle).
- Per-sample IIRs run as lax.scan. The iSAC pitch pre-filters exploit that
  lag_offset >= FRACORDER + segment_length, so each 12-sample granule is
  computed as one vectorized window-matmul instead of a sample loop.
- The correlation-surface peak search evaluates all cells in parallel and
  keeps the first 10 peaks in the reference's scan order via masked
  cumulative counts. Reads outside the surface land in a zero guard (the
  C code reads a small uninitialized guard region there).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.models.vad import legacy_vad

# ------------------------------------------------------------ constants

FRAMESAMPLES = 480
FRAMESAMPLES_HALF = 240
QLOOKAHEAD = 24
PITCH_FRAME_LEN = 240
PITCH_MAX_LAG = 140
PITCH_MIN_LAG = 20
PITCH_LAG_SPAN2 = PITCH_MAX_LAG // 2 - PITCH_MIN_LAG // 2 + 5  # 65
PITCH_CORR_LEN2 = 60
PITCH_CORR_STEP2 = PITCH_FRAME_LEN // 4  # 60
PITCH_SUBFRAMES = 4
PITCH_SUBFRAME_LEN = 60
PITCH_GRAN_PER_SUBFRAME = 5
PITCH_UPDATE = 12
PITCH_WLPCORDER = 6
PITCH_WLPCWINLEN = 240
PITCH_WLPCBUFLEN = 240
PITCH_WLPCASYM = 0.3
PITCH_BUFFSIZE = PITCH_MAX_LAG + 50  # 190
PITCH_INTBUFFSIZE = PITCH_FRAME_LEN + PITCH_BUFFSIZE
PITCH_UPSTEP = 1.5
PITCH_DOWNSTEP = 0.67
PITCH_DAMPORDER = 5
PITCH_FILTDELAY = 1.5
PITCH_FRACS = 8
PITCH_FRACORDER = 9
PITCH_BW = 11
PITCH_MAX_NUM_PEAKS = 10
PITCH_PEAK_DECAY = 0.85
PITCH_MAX_GAIN = 0.45
PITCH_MAX_GAIN_06 = 0.27
ALLPASSSECTIONS = 2
W_SURF = PITCH_LAG_SPAN2 + 4  # surface row stride
DEC_KEEP = (PITCH_CORR_LEN2 + PITCH_CORR_STEP2 + PITCH_MAX_LAG // 2
            - PITCH_FRAME_LEN // 2 + 2)  # 72
DEC_TOTAL = PITCH_CORR_LEN2 + PITCH_CORR_STEP2 + PITCH_MAX_LAG // 2 + 2

UPPER_AP = np.array([0.0347, 0.3826], np.float32)
LOWER_AP = np.array([0.1544, 0.744], np.float32)
COMPOSITE_AP = np.array([0.0347, 0.1544, 0.3826, 0.744], np.float32)
TRANSFORM1 = np.array([
    -0.00158678506084, 0.00127157815343, -0.00104805672709, 0.00084837248079,
    0.00134467983258, -0.00107756549387, 0.00088814793277, -0.00071893072525,
], np.float32).reshape(2, 4)
TRANSFORM2 = np.array([
    -0.00170686041697, 0.00136780109829, -0.00112736532350, 0.00091257055385,
    0.00103094281812, -0.00082615076557, 0.00068092756088, -0.00055119165484,
], np.float32).reshape(2, 4)
HP_IN_COEF = np.array([-1.94895953203325, 0.94984516000000,
                       -0.05101826139794, 0.05015484000000], np.float32)
DAMP_FILTER = np.array([-0.07, 0.25, 0.64, 0.25, -0.07], np.float32)
INTERPOL_WIN = np.array([
    -0.00067556028640, 0.02184247643159, -0.12203175715679, 0.60086484101160,
    0.60086484101160, -0.12203175715679, 0.02184247643159, -0.00067556028640,
], np.float32)
INTRP_COEF = np.array([
    [-0.02239172458614, 0.06653315052934, -0.16515880017569, 0.60701333734125,
     0.64671399919202, -0.20249000396417, 0.09926548334755, -0.04765933793109,
     0.01754159521746],
    [-0.01985640750434, 0.05816126837866, -0.13991265473714, 0.44560418147643,
     0.79117042386876, -0.20266133815188, 0.09585268418555, -0.04533310458084,
     0.01654127246314],
    [-0.01463300534216, 0.04229888475060, -0.09897034715253, 0.28284326017787,
     0.90385267956632, -0.16976950138649, 0.07704272393639, -0.03584218578311,
     0.01295781500709],
    [-0.00764851320885, 0.02184035544377, -0.04985561057281, 0.13083306574393,
     0.97545011664662, -0.10177807997561, 0.04400901776474, -0.02010737175166,
     0.00719783432422],
    [0.0, 0.0, -1e-14, 1e-14, 0.99999999999999, 1e-14, -1e-14, 0.0, 0.0],
    [0.00719783432422, -0.02010737175166, 0.04400901776474,
     -0.10177807997562, 0.97545011664663, 0.13083306574393,
     -0.04985561057280, 0.02184035544377, -0.00764851320885],
    [0.01295781500710, -0.03584218578312, 0.07704272393640,
     -0.16976950138650, 0.90385267956634, 0.28284326017785,
     -0.09897034715252, 0.04229888475059, -0.01463300534216],
    [0.01654127246315, -0.04533310458085, 0.09585268418557,
     -0.20266133815190, 0.79117042386878, 0.44560418147640,
     -0.13991265473712, 0.05816126837865, -0.01985640750433],
], np.float32)
GAIN_WEIGHT = np.array([
    [0.29714285714286, -0.30857142857143, -0.05714285714286,
     0.05142857142857, 0.01714285714286],
    [-0.30857142857143, 0.67428571428571, -0.27142857142857,
     -0.14571428571429, 0.05142857142857],
    [-0.05714285714286, -0.27142857142857, 0.65714285714286,
     -0.27142857142857, -0.05714285714286],
    [0.05142857142857, -0.14571428571429, -0.27142857142857,
     0.67428571428571, -0.30857142857143],
    [0.01714285714286, 0.05142857142857, -0.05714285714286,
     -0.30857142857143, 0.29714285714286],
], np.float32)

# VadAudioProc constants (vad_audio_proc.h:38-69).
SAMPLE_RATE_HZ = 16000
LENGTH_10MS = 160
NUM_PAST_SIGNAL_SAMPLES = 80
NUM_SUBFRAME_SAMPLES = 160
NUM_10MS_SUBFRAMES = 3
BUFFER_LENGTH = NUM_PAST_SIGNAL_SAMPLES + 3 * NUM_SUBFRAME_SAMPLES  # 560
DFT_SIZE = 512
LPC_ORDER = 16
SILENCE_RMS = 5.0
FREQ_RESOLUTION = SAMPLE_RATE_HZ / float(DFT_SIZE)

HPF_NUMERATOR = np.array([0.974827, -1.949650, 0.974827], np.float32)
HPF_DENOMINATOR = np.array([1.0, -1.971999, 0.972457], np.float32)

CORR_WEIGHT = np.array([
    1.000000, 0.985000, 0.970225, 0.955672, 0.941337, 0.927217, 0.913308,
    0.899609, 0.886115, 0.872823, 0.859730, 0.846834, 0.834132, 0.821620,
    0.809296, 0.797156, 0.785199], np.float32)


def _lpc_anal_win() -> np.ndarray:
    # kLpcAnalWin (vad_audio_proc_internal.h): sin(pi*k/239), k = 0..239.
    return np.sin(np.pi * np.arange(240) / 239.0)


# GMM tables (noise_gmm_tables.h / voice_gmm_tables.h) are loaded lazily
# from the arrays defined at the bottom of this file.

# ------------------------------------------------------- small helpers


def _allpass_cascade(x, factors, state):
    """WebRtcIsac_AllPassFilter2Float (isac_vad.c:161-176)."""
    n_sec = len(factors)

    def step(st, xn):
        y = xn
        new_st = []
        for j in range(n_sec):
            temp = st[j] + factors[j] * y
            new_st.append(-factors[j] * temp + y)
            y = temp
        return jnp.stack(new_st), y

    state, ys = jax.lax.scan(step, state, x)
    return ys, state


def _autocorr(x, order):
    """WebRtcIsac_AutoCorr: r[lag] = sum x[n] x[n+lag]."""
    n = x.shape[-1]
    return jnp.stack([
        jnp.sum(x[..., : n - lag] * x[..., lag:], axis=-1)
        for lag in range(order + 1)
    ], axis=-1)


def _lev_durb(r, order):
    """WebRtcIsac_LevDurb (isac_vad.c:110-139). r: (..., order+1)."""
    eps = 1e-10
    bad = r[..., 0] < eps
    r = jnp.where(bad[..., None], jnp.ones_like(r), r)
    a = [jnp.ones_like(r[..., 0])] + [jnp.zeros_like(r[..., 0])
                                      for _ in range(order)]
    a[1] = -r[..., 1] / r[..., 0]
    alpha = r[..., 0] + r[..., 1] * a[1]
    for m in range(1, order):
        s = r[..., m + 1]
        for i in range(m):
            s = s + a[i + 1] * r[..., m - i]
        km = -s / alpha
        alpha = alpha + km * s
        m_h = (m + 1) >> 1
        for i in range(m_h):
            tmp = a[i + 1] + km * a[m - i]
            a[m - i] = a[m - i] + km * a[i + 1]
            a[i + 1] = tmp
        a[m + 1] = km
    poly = jnp.stack(a, axis=-1)
    zero_poly = jnp.concatenate(
        [jnp.ones_like(poly[..., :1]), jnp.zeros_like(poly[..., 1:])],
        axis=-1,
    )
    return jnp.where(bad[..., None], zero_poly, poly)


# -------------------------------------------------- iSAC prefilter bank


@struct.dataclass
class PreFiltBankState:
    inlabuf1: jnp.ndarray  # (24,)
    inlabuf2: jnp.ndarray
    instat1: jnp.ndarray  # (4,) only [:2] used
    instat2: jnp.ndarray
    instat_la1: jnp.ndarray
    instat_la2: jnp.ndarray
    hp_states: jnp.ndarray  # (2,)


def init_prefilt() -> PreFiltBankState:
    z = lambda n: jnp.zeros((n,), jnp.float32)  # noqa: E731
    return PreFiltBankState(z(QLOOKAHEAD), z(QLOOKAHEAD), z(4), z(4), z(4),
                            z(4), z(2))


def split_and_filter(state: PreFiltBankState, pin):
    """WebRtcIsac_SplitAndFilterFloat (isac_vad.c:210-409).

    pin: (480,). Returns (state, lp (240,), hp, lp_la, hp_la)."""

    def hp_step(st, x):
        y = x + HP_IN_COEF[2] * st[0] + HP_IN_COEF[3] * st[1]
        f = x - HP_IN_COEF[0] * st[0] - HP_IN_COEF[1] * st[1]
        return jnp.stack([f, st[0]]), y

    hp_st, inp = jax.lax.scan(hp_step, state.hp_states, pin)

    def backward_channel(first_idx, inlabuf):
        vec = inp[FRAMESAMPLES - 1 - first_idx - 2 * jnp.arange(
            FRAMESAMPLES_HALF)]
        vec, st = _allpass_cascade(vec, COMPOSITE_AP,
                                   jnp.zeros((4,), jnp.float32))
        main = vec[::-1]
        la, _ = _allpass_cascade(inlabuf, COMPOSITE_AP, st)
        tempin = jnp.concatenate([la[::-1], main])
        new_inlabuf = inp[FRAMESAMPLES - 1 - first_idx
                          - 2 * jnp.arange(QLOOKAHEAD)]
        return tempin, st, new_inlabuf

    t1, for1, new_la1 = backward_channel(0, state.inlabuf1)
    t2, for2, new_la2 = backward_channel(1, state.inlabuf2)

    instat1 = state.instat1.at[:2].add(jnp.asarray(TRANSFORM1) @ for1)
    instat2 = state.instat2.at[:2].add(jnp.asarray(TRANSFORM2) @ for2)

    o1, instat1_2 = _allpass_cascade(t1[:FRAMESAMPLES_HALF], UPPER_AP,
                                     instat1[:2])
    o2, instat2_2 = _allpass_cascade(t2[:FRAMESAMPLES_HALF], LOWER_AP,
                                     instat2[:2])
    lp = 0.5 * (o1 + o2)
    hp = 0.5 * (o1 - o2)

    l1, la1_2 = _allpass_cascade(inp[1::2], UPPER_AP, state.instat_la1[:2])
    l2, la2_2 = _allpass_cascade(inp[0::2], LOWER_AP, state.instat_la2[:2])
    lp_la = 0.5 * (l1 + l2)
    hp_la = 0.5 * (l1 - l2)

    state = state.replace(
        inlabuf1=new_la1, inlabuf2=new_la2,
        instat1=instat1.at[:2].set(instat1_2),
        instat2=instat2.at[:2].set(instat2_2),
        instat_la1=state.instat_la1.at[:2].set(la1_2),
        instat_la2=state.instat_la2.at[:2].set(la2_2),
        hp_states=hp_st,
    )
    return state, lp, hp, lp_la, hp_la


# -------------------------------------------------- weighting filter


@struct.dataclass
class WeightFiltState:
    buffer: jnp.ndarray  # (240,)
    weo_state: jnp.ndarray  # (6,) [y-1..y-6]
    who_state: jnp.ndarray  # (6,) unused by the identity pole section


def _weight_window() -> np.ndarray:
    t = 0.5 + np.arange(PITCH_WLPCWINLEN)
    denum = 1.0 / PITCH_WLPCWINLEN
    d = (PITCH_WLPCASYM * t * denum
         + (1 - PITCH_WLPCASYM) * t * t * denum * denum) * 3.14159265
    return (np.sin(d) ** 2).astype(np.float32)


WEIGHT_WINDOW = _weight_window()


def init_weight_filt() -> WeightFiltState:
    z = jnp.zeros
    return WeightFiltState(z((240,), jnp.float32), z((6,), jnp.float32),
                           z((6,), jnp.float32))


def weighting_filter(state: WeightFiltState, x):
    """WebRtcIsac_WeightingFilter (filter_functions.c:118-180).

    x: (240,). Returns (state, weighted (240,), whitened (240,))."""
    tmp = jnp.concatenate([state.buffer, x])  # (480,)
    new_buffer = tmp[PITCH_FRAME_LEN:]

    weout = []
    whout = []
    weo_st = state.weo_state  # [y-1, ..., y-6]
    win = jnp.asarray(WEIGHT_WINDOW)
    for n in range(PITCH_SUBFRAMES):
        endpos = PITCH_WLPCBUFLEN + (n + 1) * PITCH_SUBFRAME_LEN
        ext = win * jax.lax.dynamic_slice(
            tmp, (endpos - PITCH_WLPCWINLEN,), (PITCH_WLPCWINLEN,)
        )
        corr = _autocorr(ext, PITCH_WLPCORDER)
        corr = corr.at[0].set(1.01 * corr[0] + 1.0)
        apol = _lev_durb(corr, PITCH_WLPCORDER)
        apolr = apol * (0.9 ** jnp.arange(PITCH_WLPCORDER + 1,
                                          dtype=jnp.float32))

        base = PITCH_WLPCBUFLEN + n * PITCH_SUBFRAME_LEN
        seg_ext = jax.lax.dynamic_slice(
            tmp, (base - PITCH_WLPCORDER,),
            (PITCH_SUBFRAME_LEN + PITCH_WLPCORDER,)
        )
        # All-zero sections (vectorized FIR over the 60-sample segment).
        idx = (jnp.arange(PITCH_SUBFRAME_LEN)[:, None]
               + jnp.arange(PITCH_WLPCORDER + 1)[None, :])
        wins = seg_ext[idx + 0]  # window [n-6 .. n] reversed below
        # coefficient k multiplies In[-k]: order reversed windows
        zflip = wins[:, ::-1]
        we_zero = zflip @ apol
        who_seg = zflip @ apolr

        # All-pole with apolr on we_zero (sequential, 60 steps).
        def pole_step(hist, xn):
            s = jnp.dot(apolr[1:], hist)
            y = xn - s
            return jnp.concatenate([y[None], hist[:-1]]), y

        weo_st, we_seg = jax.lax.scan(pole_step, weo_st, we_zero)
        weout.append(we_seg)
        whout.append(who_seg)

    state = state.replace(
        buffer=new_buffer,
        weo_state=weo_st,
        who_state=state.who_state,
    )
    return state, jnp.concatenate(weout), jnp.concatenate(whout)


# ---------------------------------------------------- pitch filters


@struct.dataclass
class PitchFiltState:
    ubuf: jnp.ndarray  # (190,)
    ystate: jnp.ndarray  # (5,) [u_{n-1}..u_{n-5}]
    oldlag: jnp.ndarray  # ()
    oldgain: jnp.ndarray  # ()


def init_pitch_filt() -> PitchFiltState:
    return PitchFiltState(
        ubuf=jnp.zeros((PITCH_BUFFSIZE,), jnp.float32),
        ystate=jnp.zeros((PITCH_DAMPORDER,), jnp.float32),
        oldlag=jnp.asarray(50.0, jnp.float32),
        oldgain=jnp.asarray(0.0, jnp.float32),
    )


_DG_PAD = 160  # covers max lag_offset reads below index 0


def _filter_granule(in_data, buf, out_dg_pad, damper, damper_dg, coeffs,
                    gain, lag_offset, index, num_samples: int, mode: str,
                    sub_frame: int, gain_mult):
    """FilterSegment (pitch_filter.c:128-215), one granule vectorized.

    Within a granule all fractional-lag reads precede the granule's writes
    (lag_offset >= 25 > FRACORDER + num_samples is guaranteed by
    PITCH_MIN_LAG), so the interpolation is one window-matmul. Returns
    (buf, out_seg (num_samples,), out_dg_pad, damper, damper_dg)."""
    pos = index + PITCH_BUFFSIZE
    pos_lag = pos - lag_offset
    sl = jax.lax.dynamic_slice(buf, (pos_lag,),
                               (num_samples + PITCH_FRACORDER - 1,))
    widx = (jnp.arange(num_samples)[:, None]
            + jnp.arange(PITCH_FRACORDER)[None, :])
    s = sl[widx] @ coeffs  # (num,)
    u = gain * s

    u_ext = jnp.concatenate([damper[:4][::-1], u])
    uw = u_ext[jnp.arange(num_samples)[:, None]
               + jnp.arange(PITCH_DAMPORDER)[None, :]]
    # y_n = sum_m kDamp[m] * u_{n-m}  -> reversed damp filter over window
    damp_r = jnp.asarray(DAMP_FILTER)[::-1]

    if mode == "pre_gain":
        lag_index = index - lag_offset
        dsl = jax.lax.dynamic_slice(
            out_dg_pad, (0, lag_index + _DG_PAD),
            (4, num_samples + PITCH_FRACORDER - 1),
        )
        s2 = jnp.einsum("jnm,m->jn", dsl[:, widx], coeffs)  # (4, num)
        u_dg = gain_mult[:, None] * s[None, :] + gain * s2  # (4, num)
        u_dg_ext = jnp.concatenate([damper_dg[:, :4][:, ::-1], u_dg], axis=1)
        uw_dg = u_dg_ext[:, jnp.arange(num_samples)[:, None]
                         + jnp.arange(PITCH_DAMPORDER)[None, :]]
        out_dg_seg = -jnp.einsum("jnm,m->jn", uw_dg, damp_r)
        # Only sub_frame+1 rows are active; rows beyond keep zero.
        active = (jnp.arange(4) <= sub_frame)[:, None]
        out_dg_seg = jnp.where(active, out_dg_seg, 0.0)
        out_dg_pad = jax.lax.dynamic_update_slice(
            out_dg_pad, out_dg_seg, (0, index + _DG_PAD)
        )
        damper_dg = u_dg_ext[:, -PITCH_DAMPORDER:][:, ::-1]
        damper_dg = jnp.where(active, damper_dg, 0.0)

    sumd = uw @ damp_r
    x_seg = jax.lax.dynamic_slice(in_data, (index,), (num_samples,))
    out_seg = x_seg - sumd
    buf = jax.lax.dynamic_update_slice(buf, x_seg + out_seg, (pos,))
    damper = u_ext[-PITCH_DAMPORDER:][::-1]
    return buf, out_seg, out_dg_pad, damper, damper_dg


def pitch_filter_frame(in_data, pf: PitchFiltState, lags, gains, mode: str):
    """FilterFrame (pitch_filter.c:244-344) for pre/pre_la/pre_gain modes.

    in_data: (264,) (only the first 240 consumed for 'pre').
    Returns (new_pf, out (264,), out_dg (4, 264))."""
    total = PITCH_FRAME_LEN + QLOOKAHEAD
    buf = jnp.concatenate([
        pf.ubuf, jnp.zeros((total,), jnp.float32)
    ])
    damper = pf.ystate
    out = jnp.zeros((total,), jnp.float32)
    out_dg_pad = jnp.zeros((4, total + _DG_PAD), jnp.float32)
    damper_dg = jnp.zeros((4, PITCH_DAMPORDER), jnp.float32)
    gain_mult = jnp.zeros((4,), jnp.float32)

    old_lag = pf.oldlag
    old_gain = pf.oldgain
    jump = (lags[0] > PITCH_UPSTEP * old_lag) | (
        lags[0] < PITCH_DOWNSTEP * old_lag
    )
    old_lag = jnp.where(jump, lags[0], old_lag)
    old_gain = jnp.where(jump, gains[0], old_gain)
    if mode == "pre_gain":
        gain_mult = gain_mult.at[0].set(jnp.where(jump, 1.0, 0.0))

    index = 0
    cur_gain = old_gain
    cur_lag = old_lag
    coeffs = jnp.asarray(INTRP_COEF[4])
    lag_offset = jnp.asarray(52, jnp.int32)
    for m in range(PITCH_SUBFRAMES):
        lag_delta = (lags[m] - old_lag) / PITCH_GRAN_PER_SUBFRAME
        cur_lag = old_lag
        gain_delta = (gains[m] - old_gain) / PITCH_GRAN_PER_SUBFRAME
        cur_gain = old_gain
        old_lag = lags[m]
        old_gain = gains[m]
        for _ in range(PITCH_GRAN_PER_SUBFRAME):
            cur_gain = cur_gain + gain_delta
            cur_lag = cur_lag + lag_delta
            # Update() (pitch_filter.c:218-241).
            lag_offset = jnp.rint(cur_lag + PITCH_FILTDELAY + 0.5).astype(
                jnp.int32
            )
            fraction = lag_offset.astype(jnp.float32) - (
                cur_lag + PITCH_FILTDELAY
            )
            frac_idx = jnp.clip(
                jnp.rint(PITCH_FRACS * fraction - 0.5).astype(jnp.int32),
                0, PITCH_FRACS - 1,
            )
            coeffs = jnp.asarray(INTRP_COEF)[frac_idx]
            if mode == "pre_gain":
                gain_mult = gain_mult.at[m].set(
                    jnp.minimum(gain_mult[m] + 0.2, 1.0)
                )
                if m > 0:
                    gain_mult = gain_mult.at[m - 1].add(-0.2)
            buf, seg, out_dg_pad, damper, damper_dg = _filter_granule(
                in_data, buf, out_dg_pad, damper, damper_dg, coeffs,
                cur_gain, lag_offset, index, PITCH_UPDATE, mode, m,
                gain_mult,
            )
            out = jax.lax.dynamic_update_slice(out, seg, (index,))
            index += PITCH_UPDATE

    new_pf = pf
    if mode != "pre_gain":
        new_pf = pf.replace(
            ubuf=jax.lax.dynamic_slice(buf, (PITCH_FRAME_LEN,),
                                       (PITCH_BUFFSIZE,)),
            ystate=damper,
            oldlag=old_lag,
            oldgain=old_gain,
        )
    if mode in ("pre_gain", "pre_la"):
        # The 24-sample lookahead runs as two 12-sample granules so that
        # fractional-lag reads never overlap this granule's writes even at
        # the minimum lag (the C code processes it sample-by-sample).
        for half in range(2):
            buf, seg, out_dg_pad, damper, damper_dg = _filter_granule(
                in_data, buf, out_dg_pad, damper, damper_dg, coeffs,
                cur_gain, lag_offset, index, QLOOKAHEAD // 2, mode,
                PITCH_SUBFRAMES - 1, gain_mult,
            )
            out = jax.lax.dynamic_update_slice(out, seg, (index,))
            index += QLOOKAHEAD // 2
    return new_pf, out, out_dg_pad[:, _DG_PAD:]


# ------------------------------------------------ pitch initialization


@struct.dataclass
class PitchAnalysisState:
    dec_buffer: jnp.ndarray  # (72,)
    decimator_state: jnp.ndarray  # (5,)
    hp_state: jnp.ndarray  # (2,)
    whitened_buf: jnp.ndarray  # (24,)
    inbuf: jnp.ndarray  # (24,)
    pf_wght: PitchFiltState
    pf: PitchFiltState
    wght: WeightFiltState


def init_pitch_analysis() -> PitchAnalysisState:
    return PitchAnalysisState(
        dec_buffer=jnp.zeros((DEC_KEEP,), jnp.float32),
        decimator_state=jnp.zeros((2 * ALLPASSSECTIONS + 1,), jnp.float32),
        hp_state=jnp.zeros((2,), jnp.float32),
        whitened_buf=jnp.zeros((QLOOKAHEAD,), jnp.float32),
        inbuf=jnp.zeros((QLOOKAHEAD,), jnp.float32),
        pf_wght=init_pitch_filt(),
        pf=init_pitch_filt(),
        wght=init_weight_filt(),
    )


def _decimate_allpass(x, dec_state):
    """WebRtcIsac_DecimateAllpass (pitch_estimator.c:147-171)."""
    n = x.shape[0]
    data = jnp.concatenate([dec_state[4][None], x[: n - 1]])
    new_z = x[n - 1]

    # upper sections on data[1::2] (odd positions of data_vec+1 in C),
    # lower on data[0::2].
    up = data[1::2]
    lo = data[0::2]

    def section(vals, st, factors):
        for j in range(ALLPASSSECTIONS):
            def step(s, v):
                o = s + factors[j] * v
                return -factors[j] * o + v, o
            st_j, vals = jax.lax.scan(step, st[j], vals)
            st = st.at[j].set(st_j)
        return vals, st

    up, st_up = section(up, dec_state[:2], UPPER_AP)
    lo, st_lo = section(lo, dec_state[2:4], LOWER_AP)
    out = lo + up  # data[2n] + data[2n+1]
    new_state = jnp.concatenate([st_up, st_lo, new_z[None]])
    return out, new_state


def _pcorr_ordered(buf):
    """PCorr (pitch_estimator.c:96-127): outcorr[SPAN2-1-k] corresponds to
    window shift k, so the ordered output is the reversed shift series."""
    x0 = PITCH_MAX_LAG // 2 + 2
    x = jax.lax.dynamic_slice(buf, (x0,), (PITCH_CORR_LEN2,))
    k_idx = jnp.arange(PITCH_LAG_SPAN2)
    widx = k_idx[:, None] + jnp.arange(PITCH_CORR_LEN2)[None, :]
    wins = buf[widx]  # (65, 60)
    sums = wins @ x
    ysums = 1e-13 + jnp.sum(wins * wins, axis=1)
    return (sums / jnp.sqrt(ysums))[::-1]


def initialize_pitch(state: PitchAnalysisState, weighted, old_lag, old_gain):
    """WebRtcIsac_InitializePitch (pitch_estimator.c:175-480).

    Returns (state, lags (4,))."""
    dec, dec_state = _decimate_allpass(weighted, state.decimator_state)
    buf0 = jnp.concatenate([state.dec_buffer, dec])

    def lp_step(carry, xk):
        y1, y2 = carry
        y = xk + 0.75 * y1 - 0.25 * y2
        return (y, y1), y

    head = buf0[:DEC_KEEP]
    (y1, y2) = (buf0[DEC_KEEP - 1], buf0[DEC_KEEP - 2])
    _, tail = jax.lax.scan(lp_step, (y1, y2), buf0[DEC_KEEP:])
    buf = jnp.concatenate([head, tail])
    state = state.replace(
        dec_buffer=jax.lax.dynamic_slice(
            buf, (PITCH_FRAME_LEN // 2,), (DEC_KEEP,)
        ),
        decimator_state=dec_state,
    )

    corrvec1 = _pcorr_ordered(buf)
    corrvec2 = _pcorr_ordered(buf[PITCH_CORR_STEP2:])

    log_lag = jnp.log(0.5 * old_lag)
    gain_bias = jnp.minimum(4.0 * old_gain * old_gain, 0.8)
    k = jnp.arange(PITCH_LAG_SPAN2, dtype=jnp.float32)
    ratio = jnp.log(k + (PITCH_MIN_LAG // 2 - 2)) - log_lag
    corrvec1 = corrvec1 * (1.0 + gain_bias * jnp.exp(-5.0 * ratio * ratio))

    lagwin = jnp.asarray([0.2, 0.5, 0.98] + [1.0] * (PITCH_LAG_SPAN2 - 6)
                         + [0.98, 0.5, 0.2], jnp.float32)
    corrvec1 = corrvec1 * lagwin
    corrvec2 = corrvec2 * lagwin

    # Build the correlation surface (rows 0..2*BW+2; rows 0 and 2BW+1/2BW+2
    # unused beyond guards).
    n_rows = 2 * PITCH_BW + 3
    surf = jnp.zeros((n_rows, W_SURF), jnp.float32)
    surf = surf.at[PITCH_BW, 2:2 + PITCH_LAG_SPAN2].set(corrvec1 + corrvec2)

    for m in range(0, PITCH_BW):
        # row m (upper half) and row 2*BW-m (lower half)
        m_off = PITCH_BW - m
        scale = {PITCH_BW: 0.2, PITCH_BW - 1: 0.9}.get(m_off, 1.0)
        length = PITCH_LAG_SPAN2 - m_off
        i1 = jnp.arange(length)
        i2 = i1 + m_off
        r = (i1 + 12).astype(jnp.float32) / (i2 + 12).astype(jnp.float32)
        adj = scale * r * (2.0 - r)
        surf = surf.at[m, 2:2 + length].set(
            adj * (corrvec1[i1] + corrvec2[i2])
        )
        # CorrSurfPtr2 column start is PITCH_BW + 2 - m == 2 + m_off
        # (pitch_estimator.c:262, 284, 305).
        surf = surf.at[2 * PITCH_BW - m, 2 + m_off:
                       2 + m_off + length].set(
            adj * (corrvec1[i2] + corrvec2[i1])
        )

    flat = surf.reshape(-1)
    PAD = 3 * W_SURF
    padded = jnp.concatenate([
        jnp.zeros((PAD,), jnp.float32), flat, jnp.zeros((PAD,), jnp.float32)
    ])

    corr_max_all = jnp.max(flat)
    max_ind = jnp.argmax(flat).astype(jnp.int32)

    # ---- peak candidates in the reference's scan order.
    cand_rows = []
    cand_cols = []
    for m in range(1, PITCH_BW + 1):
        for kk in range(2, PITCH_LAG_SPAN2 - PITCH_BW - 2 + m):
            cand_rows.append(m)
            cand_cols.append(kk)
    for m in range(PITCH_BW + 1, 2 * PITCH_BW):
        for kk in range(2 + m - PITCH_BW, PITCH_LAG_SPAN2 - 2):
            cand_rows.append(m)
            cand_cols.append(kk)
    cand_p = np.array(cand_rows) * W_SURF + np.array(cand_cols)
    cand_p = jnp.asarray(cand_p, jnp.int32)

    thr = corr_max_all * 0.6
    cv = padded[cand_p + PAD]
    is_peak = (cv > thr) \
        & (cv > padded[cand_p + PAD - (W_SURF + 1)]) \
        & (cv > padded[cand_p + PAD - W_SURF]) \
        & (cv > padded[cand_p + PAD + W_SURF]) \
        & (cv > padded[cand_p + PAD + W_SURF + 1])
    order = jnp.cumsum(is_peak.astype(jnp.int32))
    keep = is_peak & (order <= PITCH_MAX_NUM_PEAKS)
    n_peaks = jnp.sum(keep.astype(jnp.int32))

    # Gather the first up-to-10 peak positions into fixed slots.
    slot_of = jnp.where(keep, order - 1, PITCH_MAX_NUM_PEAKS)
    slots_p = jnp.zeros((PITCH_MAX_NUM_PEAKS + 1,), jnp.int32)
    slots_p = slots_p.at[slot_of].set(cand_p)
    slots_p = slots_p[:PITCH_MAX_NUM_PEAKS]
    slot_valid = jnp.arange(PITCH_MAX_NUM_PEAKS) < n_peaks

    def interp_at(i):
        w = jax.lax.dynamic_slice(padded, (i + PAD - 3,), (8,))
        return jnp.dot(jnp.asarray(INTERPOL_WIN), w)

    def examine(p):
        W = W_SURF
        g = lambda i: padded[i + PAD]  # noqa: E731
        ia = interp_at(p - (W + 1))
        ib = interp_at(p - 1)
        ic = interp_at(p)
        idd = interp_at(p + W)
        corr = g(p)
        cmax = jnp.maximum(jnp.maximum(ia, ib), jnp.maximum(ic, idd))
        row = p // W
        l1 = (p - row * W + (PITCH_MIN_LAG // 2 - 4)).astype(jnp.float32)
        l2 = l1 + (PITCH_BW - row).astype(jnp.float32)

        # Four branch variants of (dl1, dl2, T).
        c_gt = corr > cmax
        a_mx = ia == cmax
        b_mx = ib == cmax
        c_mx = ic == cmax

        def Tsel(*vals):
            # vals ordered: (main, a, b, c, d) per entry
            main, va, vb, vc, vd = vals
            return jnp.where(
                c_gt, main,
                jnp.where(a_mx, va,
                          jnp.where(b_mx, vb, jnp.where(c_mx, vc, vd))))

        T00 = Tsel(g(p - (W + 1)), interp_at(p - 2 * (W + 1)),
                   interp_at(p - (W + 2)), ia, ib)
        T20 = Tsel(g(p - W), interp_at(p - (2 * W + 1)), ia,
                   interp_at(p - W), ic)
        T11 = Tsel(corr, ia, ib, ic, idd)
        T02 = Tsel(g(p + W), ib, interp_at(p + W - 1), idd,
                   interp_at(p + 2 * W))
        T22 = Tsel(g(p + W + 1), ic, idd, interp_at(p + W + 1),
                   interp_at(p + 2 * W + 1))
        T10 = Tsel(ia, g(p - (2 * W + 1)), g(p - (W + 1)), g(p - W), corr)
        T01 = Tsel(ib, g(p - (W + 1)), g(p - 1), corr, g(p + W))
        T21 = Tsel(ic, g(p - W), corr, g(p + 1), g(p + W + 1))
        T12 = Tsel(idd, corr, g(p + W), g(p + W + 1), g(p + 2 * W + 1))

        dl1 = Tsel(0.0, -0.5, -0.5, 0.5, 0.5)
        dl2 = Tsel(0.0, 0.5, -0.5, 0.5, -0.5)
        l1b = l1 + dl1
        l2b = l2 + dl2

        # Intrpol2D (pitch_estimator.c:43-93).
        c = T11
        b0 = 0.5 * (T12 + T21 - T01 - T10)
        b1 = 0.5 * (T10 + T21 - T01 - T12)
        A01 = -0.5 * (T01 + T21 - T10 - T12)
        t1 = 0.5 * (T00 + T22) - c
        t2 = 0.5 * (T20 + T02) - c
        d = (T01 + T12 + T10 + T21) - 4.0 * c - t1 - t2
        A00 = -t1 - 0.5 * d
        A11 = -t2 - 0.5 * d
        singular = (A00 < 1e-7) | ((A00 * A11 - A01 * A01) < 1e-7)
        A00s = jnp.sqrt(jnp.maximum(A00, 1e-20))
        A01n = A01 / A00s
        A11s = jnp.sqrt(jnp.maximum(A11 - A01n * A01n, 1e-20))
        t1c = b0 / A00s
        t2c = (b1 - t1c * A01n) / A11s
        delta2 = t2c / A11s
        delta1 = 0.5 * (t1c - delta2 * A01n) / A00s
        delta2 = delta2 * 0.5
        nrm = delta1 * delta1 + delta2 * delta2
        scale = jnp.where(nrm > 1.0, 1.0 / jnp.maximum(nrm, 1e-20), 1.0)
        delta1 = delta1 * scale
        delta2 = delta2 * scale
        peak_val = 0.5 * (b0 * delta1 + b1 * delta2) + c
        l1o = jnp.where(singular, l1b, l1b + delta1)
        l2o = jnp.where(singular, l2b, l2b + delta2)
        pv = jnp.where(singular, T11, peak_val)
        return l1o, l2o, pv

    l1s, l2s, pvs = jax.vmap(examine)(slots_p)
    biased = pvs * jnp.power(
        jnp.asarray(PITCH_PEAK_DECAY, jnp.float32),
        jnp.log(jnp.maximum(l1s + l2s, 1e-6)),
    )
    biased = jnp.where(slot_valid & (biased > 0), biased, -jnp.inf)
    best = jnp.argmax(biased)
    l1 = jnp.clip(l1s[best] * 2.0, PITCH_MIN_LAG, PITCH_MAX_LAG)
    l2 = jnp.clip(l2s[best] * 2.0, PITCH_MIN_LAG, PITCH_MAX_LAG)

    # Fallback when no peaks qualify.
    row_f = max_ind // W_SURF
    l1f = (max_ind - row_f * W_SURF + (PITCH_MIN_LAG // 2 - 4)).astype(
        jnp.float32
    )
    l2f = l1f + (PITCH_BW - row_f).astype(jnp.float32)
    l1f = jnp.clip(l1f, PITCH_MIN_LAG, PITCH_MAX_LAG)
    l2f = jnp.clip(l2f, PITCH_MIN_LAG, PITCH_MAX_LAG)

    have = n_peaks > 0
    l1 = jnp.where(have, l1, l1f)
    l2 = jnp.where(have, l2, l2f)
    lags = jnp.stack([l1, l1, l2, l2])
    return state, lags


def pitch_analysis(state: PitchAnalysisState, inp):
    """WebRtcIsac_PitchAnalysis (pitch_estimator.c:547-695).

    inp: (240,) lower-band signal. Returns (state, lags (4,), gains (4,))."""
    a_coef = jnp.asarray([1.86864659625574, -0.88360000000000], jnp.float32)
    b_coef = jnp.asarray([-1.99524591718270, 0.99600400000000], jnp.float32)

    def hp_step(st, x):
        y = x + st[1]
        s1 = st[0] + b_coef[0] * x + a_coef[0] * y
        s0 = b_coef[1] * x + a_coef[1] * y
        return jnp.stack([s0, s1]), y

    hp_st, hpin = jax.lax.scan(hp_step, state.hp_state, inp)
    state = state.replace(hp_state=hp_st)

    wght, weighted, whit_new = weighting_filter(state.wght, hpin)
    whitened = jnp.concatenate([state.whitened_buf, whit_new])
    state = state.replace(wght=wght,
                          whitened_buf=whitened[PITCH_FRAME_LEN:])

    old_lag = state.pf_wght.oldlag
    old_gain = state.pf_wght.oldgain
    state, lags = initialize_pitch(state, weighted, old_lag, old_gain)

    nrg_wht = jnp.maximum(jnp.dot(whitened, whitened), 1e-12)
    Wnrg = 1.0 / nrg_wht
    Wgain = 0.005
    Wfluct = 3.0
    gains = jnp.full((4,), PITCH_MAX_GAIN_06, jnp.float32)
    kW = jnp.asarray(GAIN_WEIGHT)

    for _ in range(2):
        _, out_g, out_dg = pitch_filter_frame(
            whitened, state.pf_wght, lags, gains, "pre_gain"
        )
        grad = (out_dg @ out_g) * Wnrg  # (4,)
        H = (out_dg @ out_dg.T) * Wnrg  # (4,4), lower triangle used
        grad = grad + (kW[1:, 0] * old_gain + kW[1:, 1:] @ gains) * Wfluct
        H = H + kW[1:, 1:] * Wfluct
        tmp = 1.0 / (1.0 - gains)
        gd = tmp * tmp * Wgain
        grad = grad + gd * jnp.asarray([1.0, 1.0, 1.0, 1.33], jnp.float32)
        H = H + jnp.diag(
            2.0 * tmp * gd * jnp.asarray([1.0, 1.0, 1.0, 1.33], jnp.float32)
        )

        # 4x4 Cholesky solve, hand-rolled like the reference (:640-668).
        H00 = H[0, 0]
        H01 = H[1, 0] / H00
        H02 = H[2, 0] / H00
        H03 = H[3, 0] / H00
        H11 = H[1, 1] - H00 * H01 * H01
        H12 = (H[2, 1] - H01 * H[2, 0]) / H11
        H13 = (H[3, 1] - H01 * H[3, 0]) / H11
        H22 = H[2, 2] - H00 * H02 * H02 - H11 * H12 * H12
        H23 = (H[3, 2] - H02 * H[3, 0] - H12 * H11 * H13) / H22
        H33 = (H[3, 3] - H00 * H03 * H03 - H11 * H13 * H13
               - H22 * H23 * H23)
        d0 = -grad[0]
        d1 = -grad[1] - d0 * H01
        d2 = -grad[2] - d0 * H02 - d1 * H12
        d3 = -grad[3] - d0 * H03 - d1 * H13 - d2 * H23
        d0 = d0 / H00
        d1 = d1 / H11
        d2 = d2 / H22
        d3 = d3 / H33
        d2 = d2 - d3 * H23
        d1 = d1 - d3 * H13 - d2 * H12
        d0 = d0 - d3 * H03 - d2 * H02 - d1 * H01
        gains = jnp.clip(gains + jnp.stack([d0, d1, d2, d3]), 0.0,
                         PITCH_MAX_GAIN)

    new_pf_wght, _, _ = pitch_filter_frame(
        whitened, state.pf_wght, lags, gains, "pre"
    )
    inbuf = jnp.concatenate([state.inbuf, inp])
    new_pf, _, _ = pitch_filter_frame(inbuf, state.pf, lags, gains, "pre_la")
    state = state.replace(
        pf_wght=new_pf_wght,
        pf=new_pf,
        inbuf=inbuf[PITCH_FRAME_LEN:],
    )
    return state, lags, gains


# ------------------------------------------------------- VadAudioProc


@struct.dataclass
class VadAudioProcState:
    audio_buffer: jnp.ndarray  # (560,)
    hpf_past_in: jnp.ndarray  # (2,)
    hpf_past_out: jnp.ndarray  # (2,)
    log_old_gain: jnp.ndarray  # ()
    old_lag: jnp.ndarray  # ()
    pitch: PitchAnalysisState
    prefilt: PreFiltBankState


def init_audio_proc() -> VadAudioProcState:
    return VadAudioProcState(
        audio_buffer=jnp.zeros((BUFFER_LENGTH,), jnp.float32),
        hpf_past_in=jnp.zeros((2,), jnp.float32),
        hpf_past_out=jnp.zeros((2,), jnp.float32),
        log_old_gain=jnp.asarray(-2.0, jnp.float32),
        old_lag=jnp.asarray(50.0, jnp.float32),
        pitch=init_pitch_analysis(),
        prefilt=init_prefilt(),
    )


def _pole_zero_hpf(state: VadAudioProcState, frame):
    """PoleZeroFilter::Filter with kCoeffNumerator/Denominator
    (pole_zero_filter.cc:73-103, vad_audio_proc_internal.h:96-100)."""
    b = jnp.asarray(HPF_NUMERATOR)
    a = jnp.asarray(HPF_DENOMINATOR)

    def step(st, x):
        pin, pout = st
        y = (b[0] * x + b[1] * pin[0] + b[2] * pin[1]
             - a[1] * pout[0] - a[2] * pout[1])
        return (jnp.stack([x, pin[0]]), jnp.stack([y, pout[0]])), y

    (pin, pout), ys = jax.lax.scan(
        step, (state.hpf_past_in, state.hpf_past_out),
        frame.astype(jnp.float32),
    )
    return state.replace(hpf_past_in=pin, hpf_past_out=pout), ys


def _subframe_lpc_peaks(audio_buffer):
    """GetLpcPolynomials + FindFirstSpectralPeaks
    (vad_audio_proc.cc:120-230). Returns spectral peaks (3,) in Hz."""
    win = jnp.asarray(_lpc_anal_win().astype(np.float32))
    cw = jnp.asarray(CORR_WEIGHT)
    starts = np.arange(NUM_10MS_SUBFRAMES) * NUM_SUBFRAME_SAMPLES
    segs = jnp.stack([
        jax.lax.dynamic_slice(audio_buffer, (int(s),), (240,))
        for s in starts
    ])  # (3, 240)
    wa = segs * win[None, :]
    corr = _autocorr(wa, LPC_ORDER)  # (3, 17)
    corr = corr.at[:, 0].set(corr[:, 0] * 1.0001)
    corr = corr * cw[None, :]
    lpc = _lev_durb(corr, LPC_ORDER)  # (3, 17)

    data = jnp.zeros((NUM_10MS_SUBFRAMES, DFT_SIZE), jnp.float32)
    data = data.at[:, : LPC_ORDER + 1].set(lpc)
    spec = jnp.fft.rfft(data, DFT_SIZE, axis=-1)  # (3, 257)
    magn_sqr = spec.real ** 2 + spec.imag ** 2

    # Main scan (vad_audio_proc.cc:186-205): candidate minima are bins
    # 1..254 (curr bin j+1 at column j), first hit wins.
    n_coef = DFT_SIZE // 2 + 1  # 257
    prev = magn_sqr[:, 0:n_coef - 2]  # bins 0..254
    curr = magn_sqr[:, 1:n_coef - 1]  # bins 1..255
    nxt = magn_sqr[:, 2:n_coef]  # bins 2..256
    is_min = (curr < prev) & (curr < nxt)
    cand = is_min[:, :n_coef - 3]  # columns 0..253 -> bins 1..254
    found = jnp.any(cand, axis=1)
    j = jnp.argmax(cand, axis=1)
    index_peak = jnp.where(found, j + 1, 0)

    p_prev = jnp.take_along_axis(prev, j[:, None], 1)[:, 0]
    p_curr = jnp.take_along_axis(curr, j[:, None], 1)[:, 0]
    p_next = jnp.take_along_axis(nxt, j[:, None], 1)[:, 0]
    # QuadraticInterpolation (vad_audio_proc.cc:162-177) on inverted values.
    nv = 1.0 / jnp.maximum(p_next, 1e-30)
    pv = 1.0 / jnp.maximum(p_prev, 1e-30)
    cv = 1.0 / jnp.maximum(p_curr, 1e-30)
    denom = nv + pv - 2.0 * cv
    frac = jnp.where(
        jnp.abs(denom) > 1e-30, -(nv - pv) * 0.5 / denom, 0.0
    )
    frac = jnp.where(found, frac, 0.0)

    # Tail check (vad_audio_proc.cc:206-211): bin 255 as local minimum
    # (vs bin 254 and the data[1] coefficient) reports index 256.
    last_is_min = (~found) & (magn_sqr[:, 255] < magn_sqr[:, 254]) & (
        magn_sqr[:, 255] < magn_sqr[:, 256]
    )
    index_peak = jnp.where(last_is_min, n_coef - 1, index_peak)

    return (index_peak.astype(jnp.float32) + frac) * FREQ_RESOLUTION


def extract_features(state: VadAudioProcState, frame, full: bool):
    """VadAudioProc::ExtractFeatures (vad_audio_proc.cc:84-123).

    frame: (160,) int16-valued floats at 16 kHz. `full` is static: True on
    every third call, when the 30 ms buffer is complete.

    Returns (state, features dict) where features contains rms (3,),
    log_pitch_gain (3,), pitch_lag_hz (3,), spectral_peak (3,),
    silence flag. Only meaningful when full=True.
    """
    state, filtered = _pole_zero_hpf(state, frame)
    # The fill level cycles 80 -> 240 -> 400 -> 560 deterministically, so
    # the append + ResetBuffer bookkeeping collapses into a rolling buffer:
    # at every third call the content equals C's [80 past | 480 current].
    buf = jnp.concatenate([state.audio_buffer[LENGTH_10MS:], filtered])
    state = state.replace(audio_buffer=buf)
    if not full:
        return state, None

    # The completed buffer layout equals C's: [80 past | 480 current].
    audio = state.audio_buffer

    seg = audio[NUM_PAST_SIGNAL_SAMPLES:].reshape(3, NUM_SUBFRAME_SAMPLES)
    rms = jnp.sqrt(jnp.mean(seg * seg, axis=1))
    silence = jnp.any(rms < SILENCE_RMS)

    # Pitch analysis (vad_audio_proc.cc:246-270).
    prefilt, lp, hp, lp_la, hp_la = split_and_filter(
        state.prefilt, audio[NUM_PAST_SIGNAL_SAMPLES:]
    )
    pitch, lags4, gains4 = pitch_analysis(state.pitch, lp_la)

    # GetSubframesPitchParameters (pitch_internal.cc:24-55).
    log_gains = jnp.log(gains4 + 1e-12)
    log_pitch_gain = jnp.stack([
        1.0 / 6.0 * state.log_old_gain + 5.0 / 6.0 * log_gains[0],
        5.0 / 6.0 * log_gains[1] + 1.0 / 6.0 * log_gains[2],
        0.5 * log_gains[2] + 0.5 * log_gains[3],
    ])
    lag_interp = jnp.stack([
        1.0 / 6.0 * state.old_lag + 5.0 / 6.0 * lags4[0],
        5.0 / 6.0 * lags4[1] + 1.0 / 6.0 * lags4[2],
        0.5 * lags4[2] + 0.5 * lags4[3],
    ])
    pitch_lag_hz = (SAMPLE_RATE_HZ / 2.0) / lag_interp

    spectral_peak = _subframe_lpc_peaks(audio)

    # Reset buffer (keep last kNumPastSignalSamples) happens implicitly via
    # the rolling append above. State updates are gated on non-silence
    # (the reference bails out before PitchAnalysis on silence).
    def keep_if_active(new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(silence, b, a), new, old
        )

    state = state.replace(
        prefilt=keep_if_active(prefilt, state.prefilt),
        pitch=keep_if_active(pitch, state.pitch),
        log_old_gain=jnp.where(silence, state.log_old_gain, log_gains[3]),
        old_lag=jnp.where(silence, state.old_lag, lags4[3]),
    )
    features = {
        "rms": rms,
        "log_pitch_gain": log_pitch_gain,
        "pitch_lag_hz": pitch_lag_hz,
        "spectral_peak": spectral_peak,
        "silence": silence,
    }
    return state, features


# --------------------------------------------------- pitch-based VAD


NOISE_GMM_WEIGHTS = np.array([
    -1.09422832086193e+01, -1.10847897513425e+01, -1.36767587732187e+01,
    -1.79789356118641e+01, -1.42830169160894e+01, -1.56500228061379e+01,
    -1.83124990950113e+01, -1.69979436177477e+01, -1.12329424387828e+01,
    -1.41311785780639e+01, -1.47171861448585e+01, -1.35963362781839e+01])

VOICE_GMM_WEIGHTS = np.array([
    -1.39789694361035e+01, -1.19527720202104e+01, -1.32396317929055e+01,
    -1.09436815209238e+01, -1.13440027478149e+01, -1.12200721834504e+01,
    -1.02537324043693e+01, -1.60789861938302e+01, -1.03394494048344e+01,
    -1.83207938586818e+01, -1.31186044948288e+01, -9.52479998673554e+00])

NOISE_GMM_MEAN = np.array([
    [-2.01386094766163e+00, 1.69702162045397e+02, 7.41715804872181e+01],
    [-1.94684591777290e+00, 1.42398396732668e+02, 1.64186321157831e+02],
    [-2.29319297562437e+00, 3.86415425589868e+02, 2.13452215267125e+02],
    [-3.25487177070268e+00, 1.08668712553616e+03, 2.33119949467419e+02],
    [-2.13159632447467e+00, 4.83821702557717e+03, 6.86786166673740e+01],
    [-2.26171410780526e+00, 4.79420193982422e+03, 1.53222513286450e+02],
    [-3.32166740703185e+00, 4.35161135834358e+03, 1.33206448431316e+02],
    [-2.19290322814343e+00, 3.98325506609408e+03, 2.13249167359934e+02],
    [-2.02898459255404e+00, 7.37039893155007e+03, 1.12518527491926e+02],
    [-2.26150236399500e+00, 1.54896745196145e+03, 1.49717357868579e+02],
    [-2.00417668301790e+00, 3.82434760310304e+03, 1.07438913004312e+02],
    [-2.30193040814533e+00, 1.43953696546439e+03, 7.04085275122649e+01]])

VOICE_GMM_MEAN = np.array([
    [-2.15020241646536e+00, 4.97079062999877e+02, 4.77078119504505e+02],
    [-8.92097680029190e-01, 5.92064964199921e+02, 1.81045145941059e+02],
    [-1.29435784144398e+00, 4.98450293410611e+02, 1.71991263804064e+02],
    [-1.03925228397884e+00, 4.99511274321571e+02, 1.05838336539105e+02],
    [-1.29229047206129e+00, 4.15026762566707e+02, 1.12861119017125e+02],
    [-7.88748114599810e-01, 4.48739336688113e+02, 1.89784216956337e+02],
    [-8.77777402332642e-01, 4.86620285054533e+02, 1.13477708016491e+02],
    [-2.06465957063057e+00, 6.33385049870607e+02, 2.32758546796149e+02],
    [-6.98893789231685e-01, 5.93622051503385e+02, 1.92536982473203e+02],
    [-2.55901217508894e+00, 1.55914919756205e+03, 1.39769980835570e+02],
    [-1.92070024165837e+00, 4.87983940444185e+02, 1.02745468128289e+02],
    [-7.29187507662854e-01, 5.22717685022855e+02, 1.16377942283991e+02]])

NOISE_GMM_COVAR_INV = np.array([
    [[7.36219567592941e+00, 4.83060785179861e-03, 1.23335151497610e-02],
     [4.83060785179861e-03, 1.65289507047817e-04, -2.41490588169997e-04],
     [1.23335151497610e-02, -2.41490588169997e-04, 6.59472060689382e-03]],
    [[8.70265239309140e+00, -5.30636201431086e-04, 5.44014966585347e-03],
     [-5.30636201431086e-04, 3.11095453521008e-04, -1.86287206836035e-04],
     [5.44014966585347e-03, -1.86287206836035e-04, 6.29493388790744e-04]],
    [[4.53467851955055e+00, -3.92977536695197e-03, -2.46521420693317e-03],
     [-3.92977536695197e-03, 4.94650752632750e-05, -1.08587438501826e-05],
     [-2.46521420693317e-03, -1.08587438501826e-05, 9.28793975422261e-05]],
    [[9.26817997114275e-01, -4.03976069276753e-04, -3.56441427392165e-03],
     [-4.03976069276753e-04, 2.51976251631430e-06, 1.46914206734572e-07],
     [-3.56441427392165e-03, 1.46914206734572e-07, 8.19914567685373e-05]],
    [[7.61715986787441e+00, -1.54889041216888e-04, 2.41756280071656e-02],
     [-1.54889041216888e-04, 3.50282550461672e-07, -6.27251196972490e-06],
     [2.41756280071656e-02, -6.27251196972490e-06, 1.45061847649872e-02]],
    [[8.31193642663158e+00, -3.84070508164323e-04, -3.09750630821876e-02],
     [-3.84070508164323e-04, 3.80433432277336e-07, -1.14321142836636e-06],
     [-3.09750630821876e-02, -1.14321142836636e-06, 8.35091486289997e-04]],
    [[9.67283151270894e-01, 5.82465812445039e-05, -3.18350798617053e-03],
     [5.82465812445039e-05, 2.23762672000318e-07, -7.74196587408623e-07],
     [-3.18350798617053e-03, -7.74196587408623e-07, 3.85120938338325e-04]],
    [[8.28066236985388e+00, 5.87634508319763e-05, 6.99303090891743e-03],
     [5.87634508319763e-05, 2.93746018618058e-07, 3.40843332882272e-07],
     [6.99303090891743e-03, 3.40843332882272e-07, 1.99379171190344e-04]],
    [[6.07488998675646e+00, -1.11494526618473e-02, 5.10013111123381e-03],
     [-1.11494526618473e-02, 6.99238879921751e-04, 5.36718550370870e-05],
     [5.10013111123381e-03, 5.36718550370870e-05, 5.26909853276753e-04]],
    [[6.90492021419175e+00, 4.20639355257863e-04, -2.38612752336481e-03],
     [4.20639355257863e-04, 3.31246767338153e-06, -2.42052288150859e-08],
     [-2.38612752336481e-03, -2.42052288150859e-08, 4.46608368363412e-04]],
    [[1.31069150869715e+01, -1.73718583865670e-04, -1.97591814508578e-02],
     [-1.73718583865670e-04, 2.80451716300124e-07, 9.96570755379865e-07],
     [-1.97591814508578e-02, 9.96570755379865e-07, 2.41361900868847e-03]],
    [[4.69566344239814e+00, -2.61077567563690e-04, 5.26359000761433e-03],
     [-2.61077567563690e-04, 1.82420859823767e-06, -7.83645887541601e-07],
     [5.26359000761433e-03, -7.83645887541601e-07, 1.33586288288802e-02]]])

VOICE_GMM_COVAR_INV = np.array([
    [[1.83673825579513e+00, -8.09791637570095e-04, 4.60106414365986e-03],
     [-8.09791637570095e-04, 8.89351738394608e-04, -9.80188953277734e-04],
     [4.60106414365986e-03, -9.80188953277734e-04, 1.38706060206582e-03]],
    [[6.76228912850703e+01, -1.98893120119660e-02, -3.53548357253551e-03],
     [-1.98893120119660e-02, 3.96216858500530e-05, -4.08492938394097e-05],
     [-3.53548357253551e-03, -4.08492938394097e-05, 9.31864352856416e-04]],
    [[9.98612435944558e+00, -5.27880954316893e-03, -6.30342541619017e-03],
     [-5.27880954316893e-03, 4.54359480225226e-05, 6.30804591626044e-05],
     [-6.30342541619017e-03, 6.30804591626044e-05, 5.36466441382942e-04]],
    [[3.39917474216349e+01, -1.56213579433191e-03, -4.01459014990225e-02],
     [-1.56213579433191e-03, 6.40415424897724e-05, 6.20076342427833e-05],
     [-4.01459014990225e-02, 6.20076342427833e-05, 3.51199070103063e-03]],
    [[1.34545062271428e+01, -7.94513610147144e-03, -5.34401019341728e-02],
     [-7.94513610147144e-03, 1.16511820098649e-04, 4.66063702069293e-05],
     [-5.34401019341728e-02, 4.66063702069293e-05, 2.72354323774163e-03]],
    [[1.08557844314806e+02, -1.54885805673668e-02, -1.88029692674851e-02],
     [-1.54885805673668e-02, 1.16404042786406e-04, 6.45579292702802e-06],
     [-1.88029692674851e-02, 6.45579292702802e-06, 4.32330478391416e-04]],
    [[8.22940066541450e+01, -1.15903110231303e-02, -4.92166764865343e-02],
     [-1.15903110231303e-02, 7.42510742165261e-05, 3.73007314191290e-06],
     [-4.92166764865343e-02, 3.73007314191290e-06, 3.64005221593244e-03]],
    [[2.31133605685660e+00, -7.83261568950254e-04, 7.45744012346313e-04],
     [-7.83261568950254e-04, 1.29460648214142e-05, -2.22774455093730e-06],
     [7.45744012346313e-04, -2.22774455093730e-06, 1.05117294093010e-04]],
    [[3.78767849189611e+02, 1.57759761011568e-03, -2.08551217988774e-02],
     [1.57759761011568e-03, 4.76066236886865e-05, -2.33977412299324e-05],
     [-2.08551217988774e-02, -2.33977412299324e-05, 5.24261005371196e-04]],
    [[6.98580096506135e-01, -5.13850255217378e-04, -4.01124551717056e-04],
     [-5.13850255217378e-04, 1.40501021984840e-06, -2.09496928716569e-06],
     [-4.01124551717056e-04, -2.09496928716569e-06, 2.82879357740037e-04]],
    [[2.62770945162399e+00, -2.31825753241430e-03, -5.30447217466318e-03],
     [-2.31825753241430e-03, 4.59108572227649e-05, 7.67631886355405e-05],
     [-5.30447217466318e-03, 7.67631886355405e-05, 2.28521601674098e-03]],
    [[1.89940391362152e+02, -4.23280856852379e-03, -2.70608873541399e-02],
     [-4.23280856852379e-03, 6.77547582742563e-05, 2.69154203800467e-05],
     [-2.70608873541399e-02, 2.69154203800467e-05, 3.88574543373470e-03]]])


def evaluate_gmm(x, weights, means, covar_inv):
    """EvaluateGmm (gmm.cc:42-61). x: (3,). Returns scalar pdf."""
    d = x[None, :] - jnp.asarray(means, jnp.float32)  # (12, 3)
    q = -0.5 * jnp.einsum(
        "mi,mij,mj->m", d, jnp.asarray(covar_inv, jnp.float32), d
    )
    return jnp.sum(jnp.exp(q + jnp.asarray(weights, jnp.float32)))


@struct.dataclass
class PitchBasedVadState:
    """PitchBasedVad + VadCircularBuffer (pitch_based_vad.cc:57-66)."""

    p_prior: jnp.ndarray  # ()
    ring: jnp.ndarray  # (500,)
    ring_index: jnp.ndarray  # () int32
    ring_full: jnp.ndarray  # () bool
    ring_sum: jnp.ndarray  # ()


def init_pitch_based_vad() -> PitchBasedVadState:
    return PitchBasedVadState(
        p_prior=jnp.asarray(0.3, jnp.float32),
        ring=jnp.zeros((500,), jnp.float32),
        ring_index=jnp.asarray(0, jnp.int32),
        ring_full=jnp.asarray(False),
        ring_sum=jnp.asarray(0.0, jnp.float32),
    )


def _ring_insert(st: PitchBasedVadState, value):
    sum_ = st.ring_sum - jnp.where(st.ring_full, st.ring[st.ring_index], 0.0)
    ring = st.ring.at[st.ring_index].set(value)
    idx = st.ring_index + 1
    full = st.ring_full | (idx >= 500)
    idx = jnp.mod(idx, 500)
    return st.replace(ring=ring, ring_index=idx, ring_full=full,
                      ring_sum=sum_ + value)


def _ring_remove_transient(st: PitchBasedVadState):
    """VadCircularBuffer::RemoveTransient(7, 0.2)
    (vad_circular_buffer.cc:104-133)."""
    level = jnp.where(st.ring_full, 500, st.ring_index)
    enough = level >= 7 + 2
    # Logical index i (0 = newest) maps to linear index_ - 1 - i mod 500.
    lin = jnp.mod(st.ring_index - 1 - jnp.arange(9), 500)
    vals = st.ring[lin]
    newest_low = vals[0] < 0.2
    # Find, scanning i = 8 down to 1, the first v < 0.2; zero entries
    # i..1 (inclusive of the break index).
    low = vals < 0.2
    desc = jnp.arange(8, 0, -1)
    low_desc = low[desc]
    has_break = jnp.any(low_desc)
    # Zero logical entries [1, break] when a break exists; with no break
    # the C loop runs out (index == 0) and the zeroing loop does nothing.
    start = jnp.where(has_break, desc[jnp.argmax(low_desc)], 0)
    zero_mask = (jnp.arange(9) >= 1) & (jnp.arange(9) <= start)
    zero_mask = zero_mask | (jnp.arange(9) == 0)  # newest set to 0 too
    act = enough & newest_low
    new_vals = jnp.where(act & zero_mask, 0.0, vals)
    ring = st.ring.at[lin].set(new_vals)
    sum_ = st.ring_sum - jnp.sum(jnp.where(act & zero_mask, vals, 0.0))
    return st.replace(ring=ring, ring_sum=sum_)


def pitch_based_voicing(st: PitchBasedVadState, features, p_combined,
                        num_frames: int = NUM_10MS_SUBFRAMES):
    """PitchBasedVad::VoicingProbability (pitch_based_vad.cc:101-147).

    features: dict from extract_features; p_combined: (num_frames,)
    standalone probabilities. num_frames is static (the reference's
    features.num_frames; 3 in the APM pipeline, 1 in the golden-vector
    harness pitch_based_vad_unittest.cc:48-67). Returns (state, p')."""
    outs = []
    for n in range(num_frames):
        x = jnp.stack([
            features["log_pitch_gain"][n],
            features["spectral_peak"][n],
            features["pitch_lag_hz"][n],
        ])
        pdf_v = evaluate_gmm(x, VOICE_GMM_WEIGHTS, VOICE_GMM_MEAN,
                             VOICE_GMM_COVAR_INV)
        pdf_n = evaluate_gmm(x, NOISE_GMM_WEIGHTS, NOISE_GMM_MEAN,
                             NOISE_GMM_COVAR_INV)
        sp = features["spectral_peak"][n]
        lg = features["log_pitch_gain"][n]
        kEps = 1e-12
        low_voice = (sp < 200.0) | (sp > 2000.0) | (lg < -2.0)
        high_voice = lg > -0.9
        pdf_v2 = jnp.where(low_voice, kEps * pdf_n, pdf_v)
        pdf_n2 = jnp.where(~low_voice & high_voice, kEps * pdf_v2, pdf_n)

        p = st.p_prior * pdf_v2 / jnp.maximum(
            pdf_v2 * st.p_prior + pdf_n2 * (1.0 - st.p_prior), 1e-35
        )
        p = jnp.clip(p, 0.01, 0.99)
        prod_a = p * p_combined[n]
        prod_i = (1.0 - p) * (1.0 - p_combined[n])
        pc = prod_a / jnp.maximum(prod_a + prod_i, 1e-35)
        outs.append(pc)

        st = _ring_insert(st, pc)
        st = _ring_remove_transient(st)
        level = jnp.where(st.ring_full, 500.0,
                          st.ring_index.astype(jnp.float32))
        mean = jnp.where(level > 0, st.ring_sum / jnp.maximum(level, 1.0),
                         0.0)
        st = st.replace(p_prior=jnp.clip(mean, 0.01, 0.99))
    return st, jnp.stack(outs)


# ------------------------------------------- VoiceActivityDetector


@struct.dataclass
class VoiceActivityDetectorState:
    """voice_activity_detector.{h,cc}: standalone VAD + audio proc +
    pitch-based VAD, 30 ms cadence over 10 ms chunks."""

    audio_proc: VadAudioProcState
    pitch_vad: PitchBasedVadState
    standalone: legacy_vad.VadState
    sa_buffer: jnp.ndarray  # (480,) accumulated 16 kHz samples
    last_probability: jnp.ndarray  # ()


def init_voice_activity_detector() -> VoiceActivityDetectorState:
    return VoiceActivityDetectorState(
        audio_proc=init_audio_proc(),
        pitch_vad=init_pitch_based_vad(),
        standalone=legacy_vad.init_state(),
        sa_buffer=jnp.zeros((480,), jnp.int32),
        last_probability=jnp.asarray(1.0, jnp.float32),
    )


def process_chunk(state: VoiceActivityDetectorState, frame, phase: int):
    """VoiceActivityDetector::ProcessChunk (voice_activity_detector.cc:54).

    frame: (160,) int16-valued int32 at 16 kHz. phase: static frame index
    mod 3; probabilities update on phase == 2.

    Returns (state, probabilities (3,), rms (3,), valid flag). When
    phase != 2, probabilities/rms are zeros and valid is False.
    """
    state = state.replace(
        sa_buffer=jnp.concatenate([state.sa_buffer[160:], frame])
    )
    ap_state, features = extract_features(
        state.audio_proc, frame.astype(jnp.float32), full=(phase == 2)
    )
    state = state.replace(audio_proc=ap_state)
    if phase != 2:
        z = jnp.zeros((3,), jnp.float32)
        return state, z, z, jnp.asarray(False)

    # StandaloneVad::GetActivity over the 30 ms buffer at mode 3. On a
    # silence chunk the reference never calls GetActivity, so the
    # standalone state is held.
    silence_pre = features["silence"]
    sa_state, activity = legacy_vad.process(
        state.standalone, state.sa_buffer, SAMPLE_RATE_HZ, mode=3
    )
    sa_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(silence_pre, b, a), sa_state,
        state.standalone,
    )
    state = state.replace(standalone=sa_state)
    p0 = jnp.where(activity == 0, 0.01, 0.5).astype(jnp.float32)
    p = jnp.broadcast_to(p0, (3,))

    pv_state, p = pitch_based_voicing(state.pitch_vad, features, p)
    # Silence: arbitrary low probability, pitch states untouched
    # (voice_activity_detector.cc:92-99).
    silence = features["silence"]
    p = jnp.where(silence, 0.01, p)
    pv_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(silence, b, a), pv_state, state.pitch_vad
    )
    state = state.replace(
        pitch_vad=pv_state,
        last_probability=p[-1],
    )
    return state, p, features["rms"], jnp.asarray(True)
