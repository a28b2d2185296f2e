"""Python/numpy oracle of the legacy fixed-point GMM VAD.

Independent re-derivation of common_audio/vad/* integer semantics used to
validate webrtc_audio_processing_tpu/models/vad/legacy_vad.py bit-exactly.
"""

import numpy as np

from webrtc_audio_processing_tpu.models.vad import legacy_vad as LV


def s16(v):
    return ((int(v) + 0x8000) & 0xFFFF) - 0x8000


def s32(v):
    return ((int(v) + 0x80000000) & 0xFFFFFFFF) - 0x80000000


def norm_w32(x):
    x = s32(x)
    if x == 0:
        return 0
    ax = ~x if x < 0 else x
    n = 0
    for shift, mask in ((16, 0xFFFF0000), (8, 0xFF000000), (4, 0xF0000000),
                        (2, 0xC0000000), (1, 0x80000000)):
        if ((ax << n) & 0xFFFFFFFF) & mask == 0:
            n += shift
    return n - 1


def norm_u32(x):
    u = int(x) & 0xFFFFFFFF
    if u == 0:
        return 0
    n = 0
    while not (u << n) & 0xFFFFFFFF & 0x80000000:
        n += 1
    return n


def div_w32_w16(num, den):
    num, den = int(num), int(den)
    if den == 0:
        return 0x7FFF
    q = abs(num) // abs(den)
    return -q if (num < 0) != (den < 0) else q


class Oracle:
    def __init__(self, mode=0):
        self.noise_means = LV.NOISE_DATA_MEANS.astype(np.int64).copy()
        self.speech_means = LV.SPEECH_DATA_MEANS.astype(np.int64).copy()
        self.noise_stds = LV.NOISE_DATA_STDS.astype(np.int64).copy()
        self.speech_stds = LV.SPEECH_DATA_STDS.astype(np.int64).copy()
        self.frame_counter = 0
        self.over_hang = 0
        self.num_of_speech = 0
        self.low_value_vector = np.full((6, 16), 10000, np.int64)
        self.index_vector = np.zeros((6, 16), np.int64)
        self.mean_value = np.full(6, 1600, np.int64)
        self.upper_state = np.zeros(5, np.int64)
        self.lower_state = np.zeros(5, np.int64)
        self.hp_filter_state = np.zeros(4, np.int64)
        self.ds_states = np.zeros(4, np.int64)
        self.mode = mode

    # -------------------------------------------------------- filterbank

    def _all_pass(self, data, coeff, band, which):
        states = self.upper_state if which == "u" else self.lower_state
        state32 = s32(int(states[band]) << 16)
        out = []
        for x in data:
            tmp32 = s32(state32 + coeff * int(x))
            y = s16(tmp32 >> 16)
            out.append(y)
            state32 = s32(s32((int(x) << 14) - coeff * y) * 2)
        states[band] = s16(state32 >> 16)
        return np.array(out, np.int64)

    def _split(self, data, band):
        hp = self._all_pass(data[0::2], LV.ALLPASS_Q15[0], band, "u")
        lp = self._all_pass(data[1::2], LV.ALLPASS_Q15[1], band, "l")
        hp_out = np.array([s16(a - b) for a, b in zip(hp, lp)], np.int64)
        lp_out = np.array([s16(a + b) for a, b in zip(hp, lp)], np.int64)
        return hp_out, lp_out

    def _hpf(self, data):
        st = self.hp_filter_state
        out = []
        for x in data:
            tmp32 = (LV.HP_ZERO_COEFS[0] * int(x)
                     + LV.HP_ZERO_COEFS[1] * int(st[0])
                     + LV.HP_ZERO_COEFS[2] * int(st[1]))
            st[1] = st[0]
            st[0] = int(x)
            tmp32 -= LV.HP_POLE_COEFS[1] * int(st[2])
            tmp32 -= LV.HP_POLE_COEFS[2] * int(st[3])
            st[3] = st[2]
            st[2] = s16(s32(tmp32) >> 14)
            out.append(int(st[2]))
        return np.array(out, np.int64)

    def _log_energy(self, data, offset, total_energy):
        length = len(data)
        nbits = int(np.floor(np.log2(length))) + 1
        smax = int(np.max(np.abs(data)))
        if smax == 0:
            scaling = 0
        else:
            t = norm_w32(smax * smax)
            scaling = 0 if t > nbits else nbits - t
        energy = 0
        for x in data:
            energy = s32(energy + ((int(x) * int(x)) >> scaling))
        tot_rshifts = scaling
        if energy != 0:
            nsh = 17 - norm_u32(energy)
            tot_rshifts += nsh
            e = energy & 0xFFFFFFFF
            e = (e << -nsh) & 0xFFFFFFFF if nsh < 0 else e >> nsh
            log2_e = LV.LOG_ENERGY_INT_PART + ((e & 0x3FFF) >> 4)
            log_e = ((LV.LOG_CONST * log2_e) >> 19) + (
                (tot_rshifts * LV.LOG_CONST) >> 9
            )
            log_e = max(log_e, 0) + offset
            if total_energy <= LV.MIN_ENERGY:
                if tot_rshifts >= 0:
                    total_energy += LV.MIN_ENERGY + 1
                else:
                    total_energy = s16(total_energy + (e >> -tot_rshifts))
        else:
            log_e = offset
        return log_e, total_energy

    def calculate_features(self, data):
        total_energy = 0
        features = [0] * 6
        hp120, lp120 = self._split(data, 0)
        hp60, lp60 = self._split(hp120, 1)
        features[5], total_energy = self._log_energy(hp60, 176, total_energy)
        features[4], total_energy = self._log_energy(lp60, 176, total_energy)
        hp60b, lp60b = self._split(lp120, 2)
        features[3], total_energy = self._log_energy(hp60b, 176, total_energy)
        hp120b, lp120b = self._split(lp60b, 3)
        features[2], total_energy = self._log_energy(hp120b, 272,
                                                     total_energy)
        hp60c, lp60c = self._split(lp120b, 4)
        features[1], total_energy = self._log_energy(hp60c, 368, total_energy)
        hp_out = self._hpf(lp60c)
        features[0], total_energy = self._log_energy(hp_out, 368,
                                                     total_energy)
        return np.array(features, np.int64), total_energy

    # ------------------------------------------------------------ vad_sp

    def downsample(self, data, offset):
        out = []
        s1, s2 = int(self.ds_states[offset]), int(self.ds_states[offset + 1])
        for i in range(0, len(data), 2):
            x0, x1 = int(data[i]), int(data[i + 1])
            t1 = s16((s32(s1) >> 1) + ((LV.ALLPASS_Q13[0] * x0) >> 14))
            s1 = s32(x0 - ((LV.ALLPASS_Q13[0] * t1) >> 12))
            t2 = s16((s32(s2) >> 1) + ((LV.ALLPASS_Q13[1] * x1) >> 14))
            s2 = s32(x1 - ((LV.ALLPASS_Q13[1] * t2) >> 12))
            out.append(s16(t1 + t2))
        self.ds_states[offset] = s1
        self.ds_states[offset + 1] = s2
        return np.array(out, np.int64)

    def find_minimum(self, value, ch):
        age = self.index_vector[ch]
        sv = self.low_value_vector[ch]
        i = 0
        while i < 16:
            if age[i] != 100:
                age[i] += 1
            else:
                for j in range(i, 15):
                    sv[j] = sv[j + 1]
                    age[j] = age[j + 1]
                age[15] = 101
                sv[15] = 10000
            i += 1
        position = -1
        for i in range(16):
            if value < sv[i]:
                position = i
                break
        if position > -1:
            for i in range(15, position, -1):
                sv[i] = sv[i - 1]
                age[i] = age[i - 1]
            sv[position] = value
            age[position] = 1
        if self.frame_counter > 2:
            median = int(sv[2])
        elif self.frame_counter > 0:
            median = int(sv[0])
        else:
            median = 1600
        alpha = 0
        if self.frame_counter > 0:
            alpha = (LV.SMOOTHING_DOWN if median < self.mean_value[ch]
                     else LV.SMOOTHING_UP)
        tmp32 = (alpha + 1) * int(self.mean_value[ch])
        tmp32 += (32767 - alpha) * median
        tmp32 += 16384
        self.mean_value[ch] = s16(tmp32 >> 15)
        return int(self.mean_value[ch])

    # ----------------------------------------------------------- vad_gmm

    @staticmethod
    def gaussian_probability(x, mean, std):
        inv_std = div_w32_w16(131072 + (std >> 1), std)
        t = inv_std >> 2
        inv_std2 = (t * t) >> 2
        x7 = s16((x << 3) - mean)
        delta = s16((inv_std2 * x7) >> 10)
        expo = s32((delta * x7) >> 9)
        exp_value = 0
        if expo < LV.COMP_VAR:
            t16 = s16(-((LV.LOG2_EXP * expo) >> 12))
            exp_value = 0x0400 | (t16 & 0x03FF)
            t2 = s16(t16 ^ 0xFFFF) >> 10
            t2 += 1
            exp_value >>= t2
        return inv_std * exp_value, delta

    # ---------------------------------------------------------- vad_core

    def gmm_probability(self, features, total_power, frame_index):
        oh1, oh2, individual, total = (t[frame_index]
                                       for t in LV._MODE_TABLES[self.mode])
        vadflag = 0
        if total_power > LV.MIN_ENERGY:
            deltaN = np.zeros((2, 6), np.int64)
            deltaS = np.zeros((2, 6), np.int64)
            ngprvec = np.zeros((2, 6), np.int64)
            sgprvec = np.zeros((2, 6), np.int64)
            sum_llr = 0
            noise_prob = np.zeros(2, np.int64)
            speech_prob = np.zeros(2, np.int64)
            for ch in range(6):
                h0_test = 0
                h1_test = 0
                for k in range(2):
                    p, d = self.gaussian_probability(
                        int(features[ch]), int(self.noise_means[k, ch]),
                        int(self.noise_stds[k, ch]))
                    deltaN[k, ch] = d
                    noise_prob[k] = LV.NOISE_DATA_WEIGHTS[k, ch] * p
                    h0_test = s32(h0_test + noise_prob[k])
                    p, d = self.gaussian_probability(
                        int(features[ch]), int(self.speech_means[k, ch]),
                        int(self.speech_stds[k, ch]))
                    deltaS[k, ch] = d
                    speech_prob[k] = LV.SPEECH_DATA_WEIGHTS[k, ch] * p
                    h1_test = s32(h1_test + speech_prob[k])
                sh0 = 31 if h0_test == 0 else norm_w32(h0_test)
                sh1 = 31 if h1_test == 0 else norm_w32(h1_test)
                llr = sh0 - sh1
                sum_llr += llr * LV.SPECTRUM_WEIGHT[ch]
                if llr * 4 > individual:
                    vadflag = 1
                h0 = s16(h0_test >> 12)
                if h0 > 0:
                    t32 = s32((int(noise_prob[0]) & ~0xFFF) << 2)
                    ngprvec[0, ch] = div_w32_w16(t32, h0)
                    ngprvec[1, ch] = 16384 - ngprvec[0, ch]
                else:
                    ngprvec[0, ch] = 16384
                h1 = s16(h1_test >> 12)
                if h1 > 0:
                    t32 = s32((int(speech_prob[0]) & ~0xFFF) << 2)
                    sgprvec[0, ch] = div_w32_w16(t32, h1)
                    sgprvec[1, ch] = 16384 - sgprvec[0, ch]
            vadflag |= int(sum_llr >= total)

            maxspe = 12800
            for ch in range(6):
                fmin = self.find_minimum(int(features[ch]), ch)
                ngm = 0
                for k in range(2):
                    ngm += int(self.noise_means[k, ch]
                               * LV.NOISE_DATA_WEIGHTS[k, ch])
                tmp1 = s16(s32(ngm) >> 6)
                for k in range(2):
                    nmk = int(self.noise_means[k, ch])
                    smk = int(self.speech_means[k, ch])
                    nsk = int(self.noise_stds[k, ch])
                    ssk = int(self.speech_stds[k, ch])
                    nmk2 = nmk
                    if not vadflag:
                        delt = s16((int(ngprvec[k, ch])
                                    * int(deltaN[k, ch])) >> 11)
                        nmk2 = s16(nmk + ((delt * LV.NOISE_UPDATE_CONST)
                                          >> 22))
                    ndelt = s16((fmin << 4) - tmp1)
                    nmk3 = s16(nmk2 + ((ndelt * LV.BACK_ETA) >> 9))
                    nmk3 = max(nmk3, (k + 5) << 7)
                    nmk3 = min(nmk3, (72 + k - ch) << 7)
                    self.noise_means[k, ch] = nmk3
                    if vadflag:
                        delt = s16((int(sgprvec[k, ch])
                                    * int(deltaS[k, ch])) >> 11)
                        t16 = s16((delt * LV.SPEECH_UPDATE_CONST) >> 21)
                        smk2 = s16(smk + ((t16 + 1) >> 1))
                        smk2 = max(smk2, int(LV.MINIMUM_MEAN[k]))
                        smk2 = min(smk2, maxspe + 640)
                        self.speech_means[k, ch] = smk2
                        t16 = (smk + 4) >> 3
                        t16 = s16(int(features[ch]) - t16)
                        t1_32 = s32((int(deltaS[k, ch]) * t16) >> 3)
                        t2_32 = s32(t1_32 - 4096)
                        t16 = int(sgprvec[k, ch]) >> 2
                        t1_32 = s32(t16 * t2_32)
                        t2_32 = s32(t1_32 >> 4)
                        if t2_32 > 0:
                            t16 = div_w32_w16(t2_32, ssk * 10)
                        else:
                            t16 = -div_w32_w16(-t2_32, ssk * 10)
                        t16 += 128
                        ssk += t16 >> 8
                        ssk = max(ssk, LV.MIN_STD)
                        self.speech_stds[k, ch] = ssk
                    else:
                        t16 = s16(int(features[ch]) - (nmk >> 3))
                        t1_32 = s32((int(deltaN[k, ch]) * t16) >> 3)
                        t1_32 = s32(t1_32 - 4096)
                        t16 = (int(ngprvec[k, ch]) + 2) >> 2
                        t2_32 = s32(t16 * t1_32)
                        t1_32 = s32(t2_32 >> 14)
                        if t1_32 > 0:
                            t16 = div_w32_w16(t1_32, nsk)
                        else:
                            t16 = -div_w32_w16(-t1_32, nsk)
                        t16 += 32
                        nsk += t16 >> 6
                        nsk = max(nsk, LV.MIN_STD)
                        self.noise_stds[k, ch] = nsk
                ngm = 0
                sgm = 0
                for k in range(2):
                    ngm += int(self.noise_means[k, ch]
                               * LV.NOISE_DATA_WEIGHTS[k, ch])
                    sgm += int(self.speech_means[k, ch]
                               * LV.SPEECH_DATA_WEIGHTS[k, ch])
                diff = s16(s32(sgm) >> 9) - s16(s32(ngm) >> 9)
                if diff < LV.MINIMUM_DIFFERENCE[ch]:
                    t16 = LV.MINIMUM_DIFFERENCE[ch] - diff
                    t1_16 = s16((13 * t16) >> 2)
                    t2_16 = s16((3 * t16) >> 2)
                    sgm = 0
                    for k in range(2):
                        self.speech_means[k, ch] = s16(
                            self.speech_means[k, ch] + t1_16)
                        sgm += int(self.speech_means[k, ch]
                                   * LV.SPEECH_DATA_WEIGHTS[k, ch])
                    ngm = 0
                    for k in range(2):
                        self.noise_means[k, ch] = s16(
                            self.noise_means[k, ch] - t2_16)
                        ngm += int(self.noise_means[k, ch]
                                   * LV.NOISE_DATA_WEIGHTS[k, ch])
                maxspe = int(LV.MAXIMUM_SPEECH[ch])
                t2_16 = s16(s32(sgm) >> 7)
                if t2_16 > maxspe:
                    t2_16 -= maxspe
                    for k in range(2):
                        self.speech_means[k, ch] = s16(
                            self.speech_means[k, ch] - t2_16)
                t2_16 = s16(s32(ngm) >> 7)
                if t2_16 > LV.MAXIMUM_NOISE[ch]:
                    t2_16 -= int(LV.MAXIMUM_NOISE[ch])
                    for k in range(2):
                        self.noise_means[k, ch] = s16(
                            self.noise_means[k, ch] - t2_16)
            self.frame_counter += 1

        if not vadflag:
            if self.over_hang > 0:
                vadflag = 2 + self.over_hang
                self.over_hang -= 1
            self.num_of_speech = 0
        else:
            self.num_of_speech += 1
            if self.num_of_speech > LV.MAX_SPEECH_FRAMES:
                self.num_of_speech = LV.MAX_SPEECH_FRAMES
                self.over_hang = oh2
            else:
                self.over_hang = oh1
        return vadflag

    def process(self, audio, rate):
        if rate == 32000:
            wb = self.downsample(audio, 2)
            nb = self.downsample(wb, 0)
        elif rate == 16000:
            nb = self.downsample(audio, 0)
        else:
            nb = np.asarray(audio, np.int64)
        frame_index = {80: 0, 160: 1, 240: 2}[len(nb)]
        features, total_power = self.calculate_features(nb)
        flag = self.gmm_probability(features, total_power, frame_index)
        return 1 if flag > 0 else 0
