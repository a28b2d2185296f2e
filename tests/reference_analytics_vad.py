"""Float64 numpy oracle of the analytics (pitch-based) VAD chain.

Independent re-derivation of modules/audio_processing/vad/* and the iSAC
pitch-analysis DSP it relies on, used to validate the JAX implementation in
webrtc_audio_processing_tpu/models/vad/analytics_vad.py.
"""

import numpy as np

# iSAC constants (settings.h).
FRAMESAMPLES = 480
FRAMESAMPLES_HALF = 240
QLOOKAHEAD = 24
QORDER = 3
NUMBEROFCHANNELAPSECTIONS = 2
PITCH_FRAME_LEN = 240
PITCH_MAX_LAG = 140
PITCH_MIN_LAG = 20
PITCH_LAG_SPAN2 = PITCH_MAX_LAG // 2 - PITCH_MIN_LAG // 2 + 5
PITCH_CORR_LEN2 = 60
PITCH_CORR_STEP2 = PITCH_FRAME_LEN // 4
PITCH_SUBFRAMES = 4
PITCH_SUBFRAME_LEN = PITCH_FRAME_LEN // PITCH_SUBFRAMES
PITCH_GRAN_PER_SUBFRAME = 5
PITCH_UPDATE = PITCH_SUBFRAME_LEN // PITCH_GRAN_PER_SUBFRAME
PITCH_WLPCORDER = 6
PITCH_WLPCWINLEN = PITCH_FRAME_LEN
PITCH_WLPCBUFLEN = PITCH_WLPCWINLEN
PITCH_WLPCASYM = 0.3
PITCH_BUFFSIZE = PITCH_MAX_LAG + 50
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

UPPER_AP = np.array([0.0347, 0.3826])
LOWER_AP = np.array([0.1544, 0.744])
COMPOSITE_AP = np.array([0.0347, 0.1544, 0.3826, 0.744])
TRANSFORM1 = np.array([
    -0.00158678506084, 0.00127157815343, -0.00104805672709, 0.00084837248079,
    0.00134467983258, -0.00107756549387, 0.00088814793277, -0.00071893072525,
]).reshape(2, 4)
TRANSFORM2 = np.array([
    -0.00170686041697, 0.00136780109829, -0.00112736532350, 0.00091257055385,
    0.00103094281812, -0.00082615076557, 0.00068092756088, -0.00055119165484,
]).reshape(2, 4)
HP_IN_COEF = np.array([-1.94895953203325, 0.94984516000000,
                       -0.05101826139794, 0.05015484000000])

DAMP_FILTER = np.array([-0.07, 0.25, 0.64, 0.25, -0.07])
INTERPOL_WIN = np.array([
    -0.00067556028640, 0.02184247643159, -0.12203175715679, 0.60086484101160,
    0.60086484101160, -0.12203175715679, 0.02184247643159, -0.00067556028640,
])
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
])
WEIGHT = np.array([
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
])


def lrint(x):
    # round-half-to-even like lrint with default rounding mode
    return int(np.rint(x))


def all_pass_2(inout, factors, state):
    for j in range(len(factors)):
        for n in range(len(inout)):
            temp = state[j] + factors[j] * inout[n]
            state[j] = -factors[j] * temp + inout[n]
            inout[n] = temp
    return inout, state


class PreFiltBank:
    def __init__(self):
        self.inlabuf1 = np.zeros(QLOOKAHEAD)
        self.inlabuf2 = np.zeros(QLOOKAHEAD)
        self.instat1 = np.zeros(2 * (QORDER - 1))
        self.instat2 = np.zeros(2 * (QORDER - 1))
        self.instat_la1 = np.zeros(2 * (QORDER - 1))
        self.instat_la2 = np.zeros(2 * (QORDER - 1))
        self.hp_states = np.zeros(2)

    def split_and_filter(self, pin):
        inp = np.zeros(FRAMESAMPLES)
        for k in range(FRAMESAMPLES):
            inp[k] = (pin[k] + HP_IN_COEF[2] * self.hp_states[0]
                      + HP_IN_COEF[3] * self.hp_states[1])
            ftmp = (pin[k] - HP_IN_COEF[0] * self.hp_states[0]
                    - HP_IN_COEF[1] * self.hp_states[1])
            self.hp_states[1] = self.hp_states[0]
            self.hp_states[0] = ftmp

        tempin_ch1 = np.zeros(FRAMESAMPLES_HALF + QLOOKAHEAD)
        tempin_ch2 = np.zeros(FRAMESAMPLES_HALF + QLOOKAHEAD)

        # channel 1 (odd samples backwards)
        st = np.zeros(4)
        vec = inp[FRAMESAMPLES - 1 - 2 * np.arange(FRAMESAMPLES_HALF)].copy()
        vec, st = all_pass_2(vec, COMPOSITE_AP, st)
        tempin_ch1[QLOOKAHEAD:] = vec[::-1]
        for_transform1 = st.copy()
        la = self.inlabuf1.copy()
        la, st = all_pass_2(la, COMPOSITE_AP, st)
        tempin_ch1[:QLOOKAHEAD] = la[::-1]
        self.inlabuf1 = inp[FRAMESAMPLES - 1 - 2 * np.arange(QLOOKAHEAD)]

        # channel 2 (even samples backwards)
        st = np.zeros(4)
        vec = inp[FRAMESAMPLES - 2 - 2 * np.arange(FRAMESAMPLES_HALF)].copy()
        vec, st = all_pass_2(vec, COMPOSITE_AP, st)
        tempin_ch2[QLOOKAHEAD:] = vec[::-1]
        for_transform2 = st.copy()
        la = self.inlabuf2.copy()
        la, st = all_pass_2(la, COMPOSITE_AP, st)
        tempin_ch2[:QLOOKAHEAD] = la[::-1]
        self.inlabuf2 = inp[FRAMESAMPLES - 2 - 2 * np.arange(QLOOKAHEAD)]

        self.instat1[:2] += TRANSFORM1 @ for_transform1
        self.instat2[:2] += TRANSFORM2 @ for_transform2

        t1, self.instat1 = all_pass_2(
            tempin_ch1[: FRAMESAMPLES_HALF].copy(), UPPER_AP, self.instat1
        )
        t2, self.instat2 = all_pass_2(
            tempin_ch2[: FRAMESAMPLES_HALF].copy(), LOWER_AP, self.instat2
        )
        lp = 0.5 * (t1 + t2)
        hp = 0.5 * (t1 - t2)

        t1b, self.instat_la1 = all_pass_2(
            inp[1::2].copy(), UPPER_AP, self.instat_la1
        )
        t2b, self.instat_la2 = all_pass_2(
            inp[0::2].copy(), LOWER_AP, self.instat_la2
        )
        lp_la = 0.5 * (t1b + t2b)
        hp_la = 0.5 * (t1b - t2b)
        return lp, hp, lp_la, hp_la


def autocorr(x, order):
    r = np.zeros(order + 1)
    for lag in range(order + 1):
        r[lag] = np.dot(x[: len(x) - lag], x[lag:])
    return r


def lev_durb(r, order):
    a = np.zeros(order + 1)
    k = np.zeros(order)
    a[0] = 1.0
    if r[0] < 1e-10:
        return a, k, 0.0
    a[1] = k[0] = -r[1] / r[0]
    alpha = r[0] + r[1] * k[0]
    for m in range(1, order):
        s = r[m + 1]
        for i in range(m):
            s += a[i + 1] * r[m - i]
        k[m] = -s / alpha
        alpha += k[m] * s
        m_h = (m + 1) >> 1
        for i in range(m_h):
            tmp = a[i + 1] + k[m] * a[m - i]
            a[m - i] += k[m] * a[i + 1]
            a[i + 1] = tmp
        a[m + 1] = k[m]
    return a, k, alpha


def all_pole(x, coef, zi):
    # zi: previous outputs [y[-1], ..., y[-order]]
    order = len(coef) - 1
    y = np.concatenate([zi[::-1], np.zeros(len(x))])
    for n in range(len(x)):
        s = 0.0
        for kk in range(1, order + 1):
            s += coef[kk] * y[order + n - kk]
        y[order + n] = x[n] - s
    return y[order:]


def all_zero(x, coef, zi):
    order = len(coef) - 1
    xx = np.concatenate([zi[::-1], x])
    out = np.zeros(len(x))
    for n in range(len(x)):
        s = 0.0
        for kk in range(order + 1):
            s += coef[kk] * xx[order + n - kk]
        out[n] = s
    return out


class WeightFilt:
    def __init__(self):
        self.buffer = np.zeros(PITCH_WLPCBUFLEN)
        self.weo_state = np.zeros(PITCH_WLPCORDER)
        self.who_state = np.zeros(PITCH_WLPCORDER)
        t = 0.5 + np.arange(PITCH_WLPCWINLEN)
        denum = 1.0 / PITCH_WLPCWINLEN
        d = (PITCH_WLPCASYM * t * denum
             + (1 - PITCH_WLPCASYM) * t * t * denum * denum) * 3.14159265
        self.window = np.sin(d) ** 2

    def process(self, x):
        tmp = np.concatenate([self.buffer, x])
        self.buffer = tmp[PITCH_FRAME_LEN:].copy()
        weout = np.zeros(PITCH_FRAME_LEN)
        whout = np.zeros(PITCH_FRAME_LEN)
        weo_st = self.weo_state.copy()
        who_st = self.who_state.copy()
        endpos = PITCH_WLPCBUFLEN + PITCH_SUBFRAME_LEN
        opol = np.zeros(PITCH_WLPCORDER + 1)
        opol[0] = 1.0
        for n in range(PITCH_SUBFRAMES):
            start = endpos - PITCH_WLPCWINLEN
            ext = self.window * tmp[start:endpos]
            corr = autocorr(ext, PITCH_WLPCORDER)
            corr[0] = 1.01 * corr[0] + 1.0
            apol, _, _ = lev_durb(corr, PITCH_WLPCORDER)
            apolr = apol * (0.9 ** np.arange(PITCH_WLPCORDER + 1))
            seg = tmp[PITCH_WLPCBUFLEN + n * PITCH_SUBFRAME_LEN:
                      PITCH_WLPCBUFLEN + (n + 1) * PITCH_SUBFRAME_LEN]
            zi_in = tmp[PITCH_WLPCBUFLEN + n * PITCH_SUBFRAME_LEN
                        - PITCH_WLPCORDER:
                        PITCH_WLPCBUFLEN + n * PITCH_SUBFRAME_LEN][::-1]
            we = all_zero(seg, apol, zi_in)
            we = all_pole_with_state(we, apolr, weo_st)
            weout[n * PITCH_SUBFRAME_LEN:(n + 1) * PITCH_SUBFRAME_LEN] = we
            weo_st = weout[(n + 1) * PITCH_SUBFRAME_LEN - PITCH_WLPCORDER:
                           (n + 1) * PITCH_SUBFRAME_LEN][::-1].copy()
            wh = all_zero(seg, apolr, zi_in)
            whout[n * PITCH_SUBFRAME_LEN:(n + 1) * PITCH_SUBFRAME_LEN] = wh
            endpos += PITCH_SUBFRAME_LEN
        self.weo_state = weout[-PITCH_WLPCORDER:][::-1].copy()
        self.who_state = whout[-PITCH_WLPCORDER:][::-1].copy()
        return weout, whout


def all_pole_with_state(x, coef, zi):
    # zi ordered [y[-1], y[-2], ...]
    order = len(coef) - 1
    hist = list(zi)
    out = np.zeros(len(x))
    for n in range(len(x)):
        s = 0.0
        for kk in range(1, order + 1):
            s += coef[kk] * hist[kk - 1]
        out[n] = x[n] - s
        hist = [out[n]] + hist[:-1]
    return out


class PitchFilt:
    def __init__(self):
        self.ubuf = np.zeros(PITCH_BUFFSIZE)
        self.ystate = np.zeros(PITCH_DAMPORDER)
        self.oldlag = 50.0
        self.oldgain = 0.0


def pcorr(buf):
    out = np.zeros(PITCH_LAG_SPAN2)
    ysum = 1e-13
    x0 = PITCH_MAX_LAG // 2 + 2
    for n in range(PITCH_CORR_LEN2):
        ysum += buf[n] * buf[n]
    out[PITCH_LAG_SPAN2 - 1] = np.dot(
        buf[x0:x0 + PITCH_CORR_LEN2], buf[:PITCH_CORR_LEN2]
    ) / np.sqrt(ysum)
    for k in range(1, PITCH_LAG_SPAN2):
        ysum -= buf[k - 1] * buf[k - 1]
        ysum += buf[PITCH_CORR_LEN2 + k - 1] * buf[PITCH_CORR_LEN2 + k - 1]
        out[PITCH_LAG_SPAN2 - 1 - k] = np.dot(
            buf[x0:x0 + PITCH_CORR_LEN2], buf[k:k + PITCH_CORR_LEN2]
        ) / np.sqrt(ysum)
    return out


def interpol_filter(vec):
    return float(np.dot(INTERPOL_WIN, vec))


def intrpol2d(T, x, y):
    c = T[1][1]
    b = np.array([
        0.5 * (T[1][2] + T[2][1] - T[0][1] - T[1][0]),
        0.5 * (T[1][0] + T[2][1] - T[0][1] - T[1][2]),
    ])
    A01 = -0.5 * (T[0][1] + T[2][1] - T[1][0] - T[1][2])
    t1 = 0.5 * (T[0][0] + T[2][2]) - c
    t2 = 0.5 * (T[2][0] + T[0][2]) - c
    d = (T[0][1] + T[1][2] + T[1][0] + T[2][1]) - 4.0 * c - t1 - t2
    A00 = -t1 - 0.5 * d
    A11 = -t2 - 0.5 * d
    if A00 < 1e-7 or (A00 * A11 - A01 * A01) < 1e-7:
        return x, y, T[1][1]
    A00 = np.sqrt(A00)
    A01 = A01 / A00
    A11 = np.sqrt(A11 - A01 * A01)
    t1 = b[0] / A00
    t2 = (b[1] - t1 * A01) / A11
    delta2 = t2 / A11
    delta1 = 0.5 * (t1 - delta2 * A01) / A00
    delta2 *= 0.5
    t1 = delta1 * delta1 + delta2 * delta2
    if t1 > 1.0:
        delta1 /= t1
        delta2 /= t1
    peak_val = 0.5 * (b[0] * delta1 + b[1] * delta2) + c
    return x + delta1, y + delta2, peak_val


class PitchAnalysis:
    def __init__(self):
        dec_len = (PITCH_CORR_LEN2 + PITCH_CORR_STEP2 + PITCH_MAX_LAG // 2
                   - PITCH_FRAME_LEN // 2 + 2)
        self.dec_buffer = np.zeros(dec_len)
        self.decimator_state = np.zeros(2 * ALLPASSSECTIONS + 1)
        self.hp_state = np.zeros(2)
        self.whitened_buf = np.zeros(QLOOKAHEAD)
        self.inbuf = np.zeros(QLOOKAHEAD)
        self.pf_wght = PitchFilt()
        self.pf = PitchFilt()
        self.wght = WeightFilt()

    def decimate_allpass(self, x):
        N = len(x)
        data = np.zeros(N + 1)
        data[1:N] = x[: N - 1]
        data[0] = self.decimator_state[2 * ALLPASSSECTIONS]
        self.decimator_state[2 * ALLPASSSECTIONS] = x[N - 1]
        # upper on odd positions of data[1:], stride-2 in-place
        for j in range(ALLPASSSECTIONS):
            st = self.decimator_state[j]
            for n in range(1, N + 1, 2):
                temp = data[n]
                data[n] = st + UPPER_AP[j] * temp
                st = -UPPER_AP[j] * data[n] + temp
            self.decimator_state[j] = st
        for j in range(ALLPASSSECTIONS):
            st = self.decimator_state[ALLPASSSECTIONS + j]
            for n in range(0, N, 2):
                temp = data[n]
                data[n] = st + LOWER_AP[j] * temp
                st = -LOWER_AP[j] * data[n] + temp
            self.decimator_state[ALLPASSSECTIONS + j] = st
        return data[0:N:2] + data[1:N + 1:2]

    def initialize_pitch(self, weighted, old_lag, old_gain):
        dec_keep = len(self.dec_buffer)
        total = PITCH_CORR_LEN2 + PITCH_CORR_STEP2 + PITCH_MAX_LAG // 2 + 2
        buf = np.zeros(total)
        buf[:dec_keep] = self.dec_buffer
        buf[dec_keep:] = self.decimate_allpass(weighted)
        for k in range(dec_keep, total):
            buf[k] += 0.75 * buf[k - 1] - 0.25 * buf[k - 2]
        self.dec_buffer = buf[PITCH_FRAME_LEN // 2:].copy()

        corrvec1 = pcorr(buf)
        corrvec2 = pcorr(buf[PITCH_CORR_STEP2:])

        log_lag = np.log(0.5 * old_lag)
        gain_bias = min(4.0 * old_gain * old_gain, 0.8)
        for k in range(PITCH_LAG_SPAN2):
            ratio = np.log(k + PITCH_MIN_LAG // 2 - 2) - log_lag
            corrvec1[k] *= 1.0 + gain_bias * np.exp(-5.0 * ratio * ratio)
        lagwin = [0.2, 0.5, 0.98]
        for k in range(3):
            corrvec1[k] *= lagwin[k]
            corrvec2[k] *= lagwin[k]
            corrvec1[PITCH_LAG_SPAN2 - 1 - k] *= lagwin[k]
            corrvec2[PITCH_LAG_SPAN2 - 1 - k] *= lagwin[k]

        W = PITCH_LAG_SPAN2 + 4
        surf = np.zeros((2 * PITCH_BW + 3, W))
        flat = lambda r, c: r * W + c  # noqa: E731
        corr_max = 0.0
        max_ind = 0
        for k in range(PITCH_LAG_SPAN2):
            corr = corrvec1[k] + corrvec2[k]
            surf[PITCH_BW][2 + k] = corr
            if corr > corr_max:
                corr_max = corr
                max_ind = flat(PITCH_BW, 2 + k)
        for m_off, rows, scale in ((PITCH_BW, (0, 2 * PITCH_BW), 0.2),
                                   (PITCH_BW - 1, (1, 2 * PITCH_BW - 1), 0.9)):
            ind1 = 0
            ind2 = m_off
            r_lo, r_hi = rows
            for k in range(PITCH_LAG_SPAN2 - m_off):
                ratio = (ind1 + 12) / (ind2 + 12)
                adj = scale * ratio * (2.0 - ratio)
                corr = adj * (corrvec1[ind1] + corrvec2[ind2])
                surf[r_lo][2 + k] = corr
                if corr > corr_max:
                    corr_max = corr
                    max_ind = flat(r_lo, 2 + k)
                corr = adj * (corrvec1[ind2] + corrvec2[ind1])
                surf[r_hi][(PITCH_BW + 2 - (PITCH_BW - m_off)) + k] = corr
                if corr > corr_max:
                    corr_max = corr
                    max_ind = flat(r_hi, PITCH_BW + 2 - (PITCH_BW - m_off) + k)
                ind1 += 1
                ind2 += 1
        for m in range(2, PITCH_BW):
            ind1 = 0
            ind2 = PITCH_BW - m
            for k in range(PITCH_LAG_SPAN2 - PITCH_BW + m):
                ratio = (ind1 + 12) / (ind2 + 12)
                adj = ratio * (2.0 - ratio)
                corr = adj * (corrvec1[ind1] + corrvec2[ind2])
                surf[m][2 + k] = corr
                if corr > corr_max:
                    corr_max = corr
                    max_ind = flat(m, 2 + k)
                corr = adj * (corrvec1[ind2] + corrvec2[ind1])
                surf[2 * PITCH_BW - m][PITCH_BW + 2 - m + k] = corr
                if corr > corr_max:
                    corr_max = corr
                    max_ind = flat(2 * PITCH_BW - m, PITCH_BW + 2 - m + k)
                ind1 += 1
                ind2 += 1

        # The C implementation keeps a small guard region before the
        # surface and can read slightly outside it in rare interpolation
        # branches; we use a deterministic zero guard on both sides.
        PAD = 3 * W
        padded = np.concatenate([np.zeros(PAD), surf.reshape(-1),
                                 np.zeros(PAD)])

        def g(i):
            return padded[i + PAD]

        def gvec(i):
            return padded[i + PAD - 3:i + PAD + 5]

        corr_thr = corr_max * 0.6
        peaks = []
        for m in range(1, PITCH_BW + 1):
            if len(peaks) == PITCH_MAX_NUM_PEAKS:
                break
            for k in range(2, PITCH_LAG_SPAN2 - PITCH_BW - 2 + m):
                p = flat(m, k)
                corr = g(p)
                if corr > corr_thr:
                    if (corr > g(p - (W + 1)) and corr > g(p - W)
                            and corr > g(p + W) and corr > g(p + W + 1)):
                        peaks.append(p)
                        if len(peaks) == PITCH_MAX_NUM_PEAKS:
                            break
        for m in range(PITCH_BW + 1, 2 * PITCH_BW):
            if len(peaks) == PITCH_MAX_NUM_PEAKS:
                break
            for k in range(2 + m - PITCH_BW, PITCH_LAG_SPAN2 - 2):
                p = flat(m, k)
                corr = g(p)
                if corr > corr_thr:
                    if (corr > g(p - (W + 1)) and corr > g(p - W)
                            and corr > g(p + W) and corr > g(p + W + 1)):
                        peaks.append(p)
                        if len(peaks) == PITCH_MAX_NUM_PEAKS:
                            break

        lags = np.zeros(4)
        if peaks:
            lags1 = np.zeros(len(peaks))
            lags2 = np.zeros(len(peaks))
            peak_vals = np.zeros(len(peaks))
            for kk, p in enumerate(peaks):
                ia = interpol_filter(gvec(p - (W + 1)))
                ib = interpol_filter(gvec(p - 1))
                ic = interpol_filter(gvec(p))
                idd = interpol_filter(gvec(p + W))
                corr = g(p)
                cmax = max(ia, ib, ic, idd)
                row = p // W
                lags1[kk] = (p - row * W) + PITCH_MIN_LAG // 2 - 4
                lags2[kk] = lags1[kk] + PITCH_BW - row
                T = [[0.0] * 3 for _ in range(3)]
                if corr > cmax:
                    T[0][0] = g(p - (W + 1))
                    T[2][0] = g(p - W)
                    T[1][1] = corr
                    T[0][2] = g(p + W)
                    T[2][2] = g(p + W + 1)
                    T[1][0] = ia
                    T[0][1] = ib
                    T[2][1] = ic
                    T[1][2] = idd
                elif ia == cmax:
                    lags1[kk] -= 0.5
                    lags2[kk] += 0.5
                    T[0][0] = interpol_filter(gvec(p - 2 * (W + 1)))
                    T[2][0] = interpol_filter(gvec(p - (2 * W + 1)))
                    T[1][1] = ia
                    T[0][2] = ib
                    T[2][2] = ic
                    T[1][0] = g(p - (2 * W + 1))
                    T[0][1] = g(p - (W + 1))
                    T[2][1] = g(p - W)
                    T[1][2] = corr
                elif ib == cmax:
                    lags1[kk] -= 0.5
                    lags2[kk] -= 0.5
                    T[0][0] = interpol_filter(gvec(p - (W + 2)))
                    T[2][0] = ia
                    T[1][1] = ib
                    T[0][2] = interpol_filter(gvec(p + W - 1))
                    T[2][2] = idd
                    T[1][0] = g(p - (W + 1))
                    T[0][1] = g(p - 1)
                    T[2][1] = corr
                    T[1][2] = g(p + W)
                elif ic == cmax:
                    lags1[kk] += 0.5
                    lags2[kk] += 0.5
                    T[0][0] = ia
                    T[2][0] = interpol_filter(gvec(p - W))
                    T[1][1] = ic
                    T[0][2] = idd
                    T[2][2] = interpol_filter(gvec(p + W + 1))
                    T[1][0] = g(p - W)
                    T[0][1] = corr
                    T[2][1] = g(p + 1)
                    T[1][2] = g(p + W + 1)
                else:
                    lags1[kk] += 0.5
                    lags2[kk] -= 0.5
                    T[0][0] = ib
                    T[2][0] = ic
                    T[1][1] = idd
                    T[0][2] = interpol_filter(gvec(p + 2 * W))
                    T[2][2] = interpol_filter(gvec(p + 2 * W + 1))
                    T[1][0] = corr
                    T[0][1] = g(p + W)
                    T[2][1] = g(p + W + 1)
                    T[1][2] = g(p + 2 * W + 1)
                lags1[kk], lags2[kk], peak_vals[kk] = intrpol2d(
                    T, lags1[kk], lags2[kk])
            cmax2 = 0.0
            best = 0
            for kk in range(len(peaks)):
                c = peak_vals[kk] * (
                    PITCH_PEAK_DECAY ** np.log(lags1[kk] + lags2[kk])
                )
                if c > cmax2:
                    cmax2 = c
                    best = kk
            l1 = np.clip(lags1[best] * 2.0, PITCH_MIN_LAG, PITCH_MAX_LAG)
            l2 = np.clip(lags2[best] * 2.0, PITCH_MIN_LAG, PITCH_MAX_LAG)
            lags[:] = [l1, l1, l2, l2]
        else:
            row = max_ind // W
            l1 = (max_ind - row * W) + PITCH_MIN_LAG // 2 - 4
            l2 = l1 + PITCH_BW - row
            l1 = np.clip(l1, PITCH_MIN_LAG, PITCH_MAX_LAG)
            l2 = np.clip(l2, PITCH_MIN_LAG, PITCH_MAX_LAG)
            lags[:] = [l1, l1, l2, l2]
        return lags

    def highpass(self, x):
        a = [1.86864659625574, -0.88360000000000]
        b = [-1.99524591718270, 0.99600400000000]
        out = np.zeros(len(x))
        st = self.hp_state
        for k in range(len(x)):
            out[k] = x[k] + st[1]
            st[1] = st[0] + b[0] * x[k] + a[0] * out[k]
            st[0] = b[1] * x[k] + a[1] * out[k]
        return out

    def analyze(self, inp):
        hp = self.highpass(inp)
        whitened = np.zeros(PITCH_FRAME_LEN + QLOOKAHEAD)
        whitened[:QLOOKAHEAD] = self.whitened_buf
        weighted, whitened[QLOOKAHEAD:] = self.wght.process(hp)
        self.whitened_buf = whitened[PITCH_FRAME_LEN:].copy()

        old_lag = self.pf_wght.oldlag
        old_gain = self.pf_wght.oldgain
        lags = self.initialize_pitch(weighted, old_lag, old_gain)

        nrg_wht = float(np.dot(whitened, whitened))
        Wnrg = 1.0 / nrg_wht
        Wgain = 0.005
        Wfluct = 3.0
        gains = np.full(4, PITCH_MAX_GAIN_06)
        for _ in range(2):
            out_g, out_dg = pitch_filter_frame(
                whitened, self.pf_wght, lags, gains, mode="pre_gain")
            grad = np.zeros(4)
            H = np.zeros((4, 4))
            for k in range(4):
                grad[k] = np.dot(out_g, out_dg[k]) * Wnrg
            for k in range(4):
                for m in range(k + 1):
                    H[k][m] = np.dot(out_dg[m], out_dg[k]) * Wnrg
            for k in range(4):
                tmp = WEIGHT[k + 1][0] * old_gain
                for m in range(4):
                    tmp += WEIGHT[k + 1][m + 1] * gains[m]
                grad[k] += tmp * Wfluct
            for k in range(4):
                for m in range(k + 1):
                    H[k][m] += WEIGHT[k + 1][m + 1] * Wfluct
            for k in range(3):
                tmp = 1.0 / (1 - gains[k])
                grad[k] += tmp * tmp * Wgain
                H[k][k] += 2.0 * tmp * (tmp * tmp * Wgain)
            tmp = 1.0 / (1 - gains[3])
            grad[3] += 1.33 * (tmp * tmp * Wgain)
            H[3][3] += 2.66 * tmp * (tmp * tmp * Wgain)

            H01 = H[1][0] / H[0][0]
            H02 = H[2][0] / H[0][0]
            H03 = H[3][0] / H[0][0]
            H11 = H[1][1] - H[0][0] * H01 * H01
            H12 = (H[2][1] - H01 * H[2][0]) / H11
            H13 = (H[3][1] - H01 * H[3][0]) / H11
            H22 = H[2][2] - H[0][0] * H02 * H02 - H11 * H12 * H12
            H23 = (H[3][2] - H02 * H[3][0] - H12 * H11 * H13) / H22
            H33 = (H[3][3] - H[0][0] * H03 * H03 - H11 * H13 * H13
                   - H22 * H23 * H23)
            dG = [-g for g in grad]
            dG[1] -= dG[0] * H01
            dG[2] -= dG[0] * H02 + dG[1] * H12
            dG[3] -= dG[0] * H03 + dG[1] * H13 + dG[2] * H23
            dd = [H[0][0], H11, H22, H33]
            for k in range(4):
                dG[k] /= dd[k]
            dG[2] -= dG[3] * H23
            dG[1] -= dG[3] * H13 + dG[2] * H12
            dG[0] -= dG[3] * H03 + dG[2] * H02 + dG[1] * H01
            for k in range(4):
                gains[k] = np.clip(gains[k] + dG[k], 0.0, PITCH_MAX_GAIN)

        out, _ = pitch_filter_frame(whitened, self.pf_wght, lags, gains,
                                    mode="pre")
        inbuf = np.concatenate([self.inbuf, inp])
        out2, _ = pitch_filter_frame(inbuf, self.pf, lags, gains,
                                     mode="pre_la")
        self.inbuf = inbuf[PITCH_FRAME_LEN:].copy()
        return lags.copy(), gains.copy()


def pitch_filter_frame(in_data, pf, lags, gains, mode):
    """FilterFrame (pitch_filter.c:244-344)."""
    buf = np.zeros(PITCH_INTBUFFSIZE + QLOOKAHEAD)
    buf[:PITCH_BUFFSIZE] = pf.ubuf
    damper = pf.ystate.copy()
    out = np.zeros(PITCH_FRAME_LEN + QLOOKAHEAD)
    out_dg = np.zeros((4, PITCH_FRAME_LEN + QLOOKAHEAD))
    damper_dg = np.zeros((4, PITCH_DAMPORDER))
    gain_mult = np.zeros(4)
    gains = gains.copy()

    old_lag = pf.oldlag
    old_gain = pf.oldgain
    if lags[0] > PITCH_UPSTEP * old_lag or lags[0] < PITCH_DOWNSTEP * old_lag:
        old_lag = lags[0]
        old_gain = gains[0]
        if mode == "pre_gain":
            gain_mult[0] = 1.0

    index = 0
    cur_gain = 0.0
    cur_lag = 0.0
    for m in range(PITCH_SUBFRAMES):
        lag_delta = (lags[m] - old_lag) / PITCH_GRAN_PER_SUBFRAME
        cur_lag = old_lag
        gain_delta = (gains[m] - old_gain) / PITCH_GRAN_PER_SUBFRAME
        cur_gain = old_gain
        old_lag = lags[m]
        old_gain = gains[m]
        for n in range(PITCH_GRAN_PER_SUBFRAME):
            cur_gain += gain_delta
            cur_lag += lag_delta
            lag_offset = lrint(cur_lag + PITCH_FILTDELAY + 0.5)
            fraction = lag_offset - (cur_lag + PITCH_FILTDELAY)
            frac_idx = lrint(PITCH_FRACS * fraction - 0.5)
            coeffs = INTRP_COEF[frac_idx]
            if mode == "pre_gain":
                gain_mult[m] = min(gain_mult[m] + 0.2, 1.0)
                if m > 0:
                    gain_mult[m - 1] -= 0.2
            index, damper = _filter_segment(
                in_data, buf, out, out_dg, damper, damper_dg, coeffs,
                cur_gain, lag_offset, index, PITCH_UPDATE, mode, m,
                gain_mult)
    if mode != "pre_gain":
        pf.ubuf = buf[PITCH_FRAME_LEN:PITCH_FRAME_LEN + PITCH_BUFFSIZE].copy()
        pf.ystate = damper.copy()
        pf.oldlag = old_lag
        pf.oldgain = old_gain
    if mode in ("pre_gain", "pre_la"):
        index, damper = _filter_segment(
            in_data, buf, out, out_dg, damper, damper_dg,
            coeffs, cur_gain, lag_offset, index, QLOOKAHEAD, mode,
            PITCH_SUBFRAMES - 1, gain_mult)
    return out, out_dg


def _filter_segment(in_data, buf, out, out_dg, damper, damper_dg, coeffs,
                    gain, lag_offset, index, num_samples, mode, sub_frame,
                    gain_mult):
    pos = index + PITCH_BUFFSIZE
    pos_lag = pos - lag_offset
    for n in range(num_samples):
        damper[1:] = damper[:-1].copy()
        s = float(np.dot(buf[pos_lag:pos_lag + PITCH_FRACORDER], coeffs))
        damper[0] = gain * s
        if mode == "pre_gain":
            lag_index = index - lag_offset
            m_tmp = -lag_index if lag_index < 0 else 0
            damper_dg[:, 1:] = damper_dg[:, :-1].copy()
            for j in range(sub_frame + 1):
                s2 = 0.0
                for m in range(PITCH_FRACORDER - 1, m_tmp - 1, -1):
                    s2 += out_dg[j][lag_index + m] * coeffs[m]
                damper_dg[j][0] = gain_mult[j] * s + gain * s2
            for j in range(sub_frame + 1):
                out_dg[j][index] = -float(np.dot(damper_dg[j], DAMP_FILTER))
        sumd = float(np.dot(damper, DAMP_FILTER))
        out[index] = in_data[index] - sumd
        buf[pos] = in_data[index] + out[index]
        index += 1
        pos += 1
        pos_lag += 1
    return index, damper


# ---------------------------------------------------- VadAudioProc oracle

from webrtc_audio_processing_tpu.models.vad import analytics_vad as AV  # noqa: E402


class AudioProcOracle:
    def __init__(self):
        self.audio_buffer = np.zeros(560)
        self.past_in = np.zeros(2)
        self.past_out = np.zeros(2)
        self.log_old_gain = -2.0
        self.old_lag = 50.0
        self.pitch = PitchAnalysis()
        self.prefilt = PreFiltBank()
        self.fill = 80

    def hpf(self, x):
        b = np.array([0.974827, -1.949650, 0.974827])
        a = np.array([1.0, -1.971999, 0.972457])
        out = np.zeros(len(x))
        for n in range(len(x)):
            y = (b[0] * x[n] + b[1] * self.past_in[0] + b[2] * self.past_in[1]
                 - a[1] * self.past_out[0] - a[2] * self.past_out[1])
            self.past_in = np.array([x[n], self.past_in[0]])
            self.past_out = np.array([y, self.past_out[0]])
            out[n] = y
        return out

    def extract(self, frame):
        filtered = self.hpf(frame)
        self.audio_buffer[self.fill:self.fill + 160] = filtered
        self.fill += 160
        if self.fill < 560:
            return None
        audio = self.audio_buffer
        seg = audio[80:].reshape(3, 160)
        rms = np.sqrt(np.mean(seg * seg, axis=1))
        silence = bool(np.any(rms < 5.0))
        feats = {"rms": rms, "silence": silence}
        if silence:
            self.reset_buffer()
            return feats

        lp, hp, lp_la, hp_la = self.prefilt.split_and_filter(audio[80:])
        lags4, gains4 = self.pitch.analyze(lp_la)
        log_gains = np.log(gains4 + 1e-12)
        feats["log_pitch_gain"] = np.array([
            1/6 * self.log_old_gain + 5/6 * log_gains[0],
            5/6 * log_gains[1] + 1/6 * log_gains[2],
            0.5 * log_gains[2] + 0.5 * log_gains[3]])
        lag_i = np.array([
            1/6 * self.old_lag + 5/6 * lags4[0],
            5/6 * lags4[1] + 1/6 * lags4[2],
            0.5 * lags4[2] + 0.5 * lags4[3]])
        feats["pitch_lag_hz"] = 8000.0 / lag_i
        self.log_old_gain = log_gains[3]
        self.old_lag = lags4[3]
        feats["spectral_peak"] = self.spectral_peaks(audio)
        self.reset_buffer()
        return feats

    def reset_buffer(self):
        self.audio_buffer[:80] = self.audio_buffer[480:560]
        self.fill = 80

    def spectral_peaks(self, audio):
        win = np.sin(np.pi * np.arange(240) / 239.0)
        cw = np.array(AV.CORR_WEIGHT, np.float64)
        peaks = np.zeros(3)
        for i in range(3):
            wa = audio[i * 160:i * 160 + 240] * win
            corr = autocorr(wa, 16)
            corr[0] *= 1.0001
            corr *= cw
            lpc, _, _ = lev_durb(corr, 16)
            spec = np.fft.rfft(np.concatenate([lpc, np.zeros(512 - 17)]))
            mag2 = np.abs(spec) ** 2
            found = False
            index_peak = 0
            frac = 0.0
            prev = mag2[0]
            curr = mag2[1]
            for n in range(2, 256):
                nxt = mag2[n]
                if curr < prev and curr < nxt:
                    found = True
                    index_peak = n - 1
                    pv, cv, nv = 1/prev, 1/curr, 1/nxt
                    frac = -(nv - pv) * 0.5 / (nv + pv - 2 * cv)
                    break
                prev = curr
                curr = nxt
            if not found:
                if mag2[255] < mag2[254] and mag2[255] < mag2[256]:
                    index_peak = 256
            peaks[i] = (index_peak + frac) * (16000.0 / 512.0)
        return peaks


class PitchBasedVadOracle:
    def __init__(self):
        self.p_prior = 0.3
        self.ring = np.zeros(500)
        self.idx = 0
        self.full = False
        self.sum = 0.0

    def gmm(self, x, w, mean, cov):
        f = 0.0
        for n in range(12):
            d = x - mean[n]
            q = -0.5 * d @ cov[n] @ d + w[n]
            f += np.exp(q)
        return f

    def insert(self, v):
        if self.full:
            self.sum -= self.ring[self.idx]
        self.sum += v
        self.ring[self.idx] = v
        self.idx += 1
        if self.idx >= 500:
            self.full = True
            self.idx = 0

    def get(self, i):
        j = self.idx - 1 - i
        if j < 0:
            j += 500
        return self.ring[j]

    def set(self, i, v):
        j = self.idx - 1 - i
        if j < 0:
            j += 500
        self.sum -= self.ring[j]
        self.ring[j] = v
        self.sum += v

    def remove_transient(self):
        level = 500 if self.full else self.idx
        if not self.full and self.idx < 9:
            return
        if self.get(0) < 0.2:
            self.set(0, 0.0)
            index = 8
            while index > 0:
                if self.get(index) < 0.2:
                    break
                index -= 1
            while index > 0:
                self.set(index, 0.0)
                index -= 1

    def mean(self):
        if self.full:
            return self.sum / 500
        return self.sum / self.idx if self.idx > 0 else 0.0

    def voicing(self, feats, p_comb):
        out = np.array(p_comb, np.float64)
        for n in range(3):
            x = np.array([feats["log_pitch_gain"][n],
                          feats["spectral_peak"][n],
                          feats["pitch_lag_hz"][n]])
            pv = self.gmm(x, AV.VOICE_GMM_WEIGHTS, AV.VOICE_GMM_MEAN,
                          AV.VOICE_GMM_COVAR_INV)
            pn = self.gmm(x, AV.NOISE_GMM_WEIGHTS, AV.NOISE_GMM_MEAN,
                          AV.NOISE_GMM_COVAR_INV)
            if (x[1] < 200 or x[1] > 2000 or x[0] < -2.0):
                pv = 1e-12 * pn
            elif x[0] > -0.9:
                pn = 1e-12 * pv
            p = self.p_prior * pv / (pv * self.p_prior
                                     + pn * (1 - self.p_prior))
            p = np.clip(p, 0.01, 0.99)
            pa = p * out[n]
            pi = (1 - p) * (1 - out[n])
            out[n] = pa / (pa + pi)
            self.insert(out[n])
            self.remove_transient()
            self.p_prior = np.clip(self.mean(), 0.01, 0.99)
        return out


class VoiceActivityDetectorOracle:
    def __init__(self):
        self.ap = AudioProcOracle()
        self.pv = PitchBasedVadOracle()
        self.sa = None  # legacy VAD oracle
        self.sa_buffer = []
        self.last_p = 1.0

    def process_chunk(self, frame):
        from tests import reference_vad
        if self.sa is None:
            self.sa = reference_vad.Oracle(mode=3)
        self.sa_buffer.extend(int(v) for v in frame)
        feats = self.ap.extract(np.asarray(frame, np.float64))
        if feats is None:
            return None
        buf = np.array(self.sa_buffer[-480:], np.int64)
        self.sa_buffer = []
        if feats["silence"]:
            return np.full(3, 0.01), feats["rms"]
        act = self.sa.process(buf, 16000)
        p0 = 0.01 if act == 0 else 0.5
        p = self.pv.voicing(feats, np.full(3, p0))
        self.last_p = p[-1]
        return p, feats["rms"]
