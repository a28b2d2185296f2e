"""Sequential numpy oracle of the reference noise suppressor.

Re-derived loop-for-loop from modules/audio_processing/ns/*.cc (cited per
method) in float32, including the fast_math bit-trick approximations. Serves
to validate the vectorized reformulations in
webrtc_audio_processing_tpu/models/noise_suppressor.py (gamma bin-chain,
quantile slot selection, histogram peak scan).
"""

from __future__ import annotations

import numpy as np

F = np.float32
FFT_SIZE = 256
NB = 129
FRAME = 160
OVERLAP = 96
SHORT_STARTUP = 50
LONG_STARTUP = 200
WINDOW_SIZE = 500
HIST_SIZE = 1000
BIN_LRT, BIN_FLAT, BIN_DIFF = 0.1, 0.05, 0.1

_half = np.sin(np.pi * np.arange(96) / 192.0).astype(F)
WINDOW = np.concatenate([_half, np.ones(65, F), _half[95:0:-1]])

LOG_TABLE = np.log(np.maximum(np.arange(NB), 1)).astype(F)
LOG_TABLE[:5] = 0.0


def fast_log2(x):
    bits = np.asarray(x, F).view(np.uint32).astype(F)
    return F(bits * F(1.1920929e-7) - F(126.942695))


def log_approx(x):
    return F(fast_log2(x) * F(np.log(2.0)))


FAST_LOG2_10 = fast_log2(F(10.0))


def exp_approx(x):
    return np.exp2(F(np.asarray(x, F) * F(np.log10(np.e))) * FAST_LOG2_10, dtype=F)


def pow_approx(x, p):
    return np.exp2(F(p) * fast_log2(x), dtype=F)


class SuppressionParams:
    def __init__(self, level):
        self.over_subtraction_factor, self.minimum_attenuating_gain, \
            self.use_attenuation_adjustment = {
                "low": (1.0, 0.5, False),
                "moderate": (1.0, 0.25, True),
                "high": (1.1, 0.125, True),
                "very_high": (1.25, 0.09, True),
            }[level]


class QuantileNoiseEstimator:
    """quantile_noise_estimator.cc:25-93."""

    SIMULT = 3

    def __init__(self):
        self.density = np.full(3 * NB, 0.3, F)
        self.log_quantile = np.full(3 * NB, 8.0, F)
        self.quantile = np.zeros(NB, F)
        self.counter = np.floor(
            LONG_STARTUP * (np.arange(3) + 1.0) / 3
        ).astype(np.int64)
        self.num_updates = 1

    def estimate(self, signal_spectrum):
        log_spectrum = log_approx(signal_spectrum)
        idx_ret = -1
        for s in range(3):
            k = s * NB
            one_by_cp1 = F(1.0 / (self.counter[s] + 1.0))
            for i in range(NB):
                j = k + i
                delta = F(40.0 / self.density[j]) if self.density[j] > 1.0 else F(40.0)
                mult = F(delta * one_by_cp1)
                if log_spectrum[i] > self.log_quantile[j]:
                    self.log_quantile[j] += F(0.25) * mult
                else:
                    self.log_quantile[j] -= F(0.75) * mult
                if abs(log_spectrum[i] - self.log_quantile[j]) < 0.01:
                    self.density[j] = F(
                        (self.counter[s] * self.density[j] + F(1.0 / 0.02))
                        * one_by_cp1
                    )
            if self.counter[s] >= LONG_STARTUP:
                self.counter[s] = 0
                if self.num_updates >= LONG_STARTUP:
                    idx_ret = k
            self.counter[s] += 1
        if self.num_updates < LONG_STARTUP:
            idx_ret = NB * 2
            self.num_updates += 1
        if idx_ret >= 0:
            self.quantile = exp_approx(self.log_quantile[idx_ret : idx_ret + NB])
        return self.quantile.copy()


class NoiseEstimator:
    """noise_estimator.cc:58-206."""

    def __init__(self, params):
        self.p = params
        self.white_noise_level = F(0.0)
        self.pink_noise_numerator = F(0.0)
        self.pink_noise_exp = F(0.0)
        self.prev_noise = np.zeros(NB, F)
        self.conservative = np.zeros(NB, F)
        self.parametric = np.zeros(NB, F)
        self.noise = np.zeros(NB, F)
        self.quantile = QuantileNoiseEstimator()

    def prepare_analysis(self):
        self.prev_noise = self.noise.copy()

    def pre_update(self, n, signal_spectrum, spectral_sum):
        self.noise = self.quantile.estimate(signal_spectrum)
        if n < SHORT_STARTUP:
            start = 5
            sum_log_i = F(np.sum(LOG_TABLE[start:], dtype=F))
            sum_log_i_sq = F(np.sum(LOG_TABLE[start:] ** 2, dtype=F))
            log_sig = log_approx(signal_spectrum[start:])
            sum_log_magn = F(np.sum(log_sig, dtype=F))
            sum_log_i_log_magn = F(np.sum(LOG_TABLE[start:] * log_sig, dtype=F))

            self.white_noise_level += F(
                spectral_sum * F(1.0 / NB) * F(self.p.over_subtraction_factor)
            )
            denom = F(sum_log_i_sq * (NB - start) - sum_log_i * sum_log_i)
            num = F(sum_log_i_sq * sum_log_magn - sum_log_i * sum_log_i_log_magn)
            self.pink_noise_numerator += max(F(num / denom), F(0.0))
            num = F(sum_log_i * sum_log_magn - (NB - start) * sum_log_i_log_magn)
            self.pink_noise_exp += min(max(F(num / denom), F(0.0)), F(1.0))

            one_by_np1 = F(1.0 / (n + 1.0))
            parametric_exp = F(0.0)
            parametric_num = F(0.0)
            if self.pink_noise_exp > 0:
                parametric_num = exp_approx(self.pink_noise_numerator * one_by_np1)
                parametric_num = F(parametric_num * F(n + 1.0))
                parametric_exp = F(self.pink_noise_exp * one_by_np1)
            for i in range(NB):
                if self.pink_noise_exp == 0.0:
                    self.parametric[i] = self.white_noise_level
                else:
                    use_band = F(start if i < start else i)
                    self.parametric[i] = F(
                        parametric_num / pow_approx(use_band, parametric_exp)
                    )
            for i in range(NB):
                self.noise[i] = F(self.noise[i] * n)
                tmp = F(self.parametric[i] * F(SHORT_STARTUP - n))
                self.noise[i] = F(self.noise[i] + F(tmp * one_by_np1))
                self.noise[i] = F(self.noise[i] * F(1.0 / SHORT_STARTUP))

    def post_update(self, speech_prob, signal_spectrum):
        gamma = F(0.9)
        for i in range(NB):
            ps = speech_prob[i]
            pn = F(1.0 - ps)
            tmp = F(
                gamma * self.prev_noise[i]
                + F(1.0 - gamma) * F(pn * signal_spectrum[i] + ps * self.prev_noise[i])
            )
            gamma_old = gamma
            gamma = F(0.99) if ps > 0.2 else F(0.9)
            if ps < 0.2:
                self.conservative[i] += F(
                    0.05 * (signal_spectrum[i] - self.conservative[i])
                )
            if gamma == gamma_old:
                self.noise[i] = tmp
            else:
                self.noise[i] = F(
                    gamma * self.prev_noise[i]
                    + F(1.0 - gamma)
                    * F(pn * signal_spectrum[i] + ps * self.prev_noise[i])
                )
                self.noise[i] = min(self.noise[i], tmp)


class Histograms:
    def __init__(self):
        self.lrt = np.zeros(HIST_SIZE, np.int64)
        self.flat = np.zeros(HIST_SIZE, np.int64)
        self.diff = np.zeros(HIST_SIZE, np.int64)

    def clear(self):
        self.lrt[:] = 0
        self.flat[:] = 0
        self.diff[:] = 0

    def update(self, feats):
        if 0 <= feats["lrt"] < HIST_SIZE * BIN_LRT:
            self.lrt[int(F(1.0 / BIN_LRT) * feats["lrt"])] += 1
        if 0 <= feats["flat"] < HIST_SIZE * BIN_FLAT:
            self.flat[int(feats["flat"] * F(1.0 / BIN_FLAT))] += 1
        if 0 <= feats["diff"] < HIST_SIZE * BIN_DIFF:
            self.diff[int(feats["diff"] * F(1.0 / BIN_DIFF))] += 1


def find_peaks(bin_size, hist):
    """prior_signal_model_estimator.cc:33-76."""
    peak_v = sec_v = 0
    peak_pos = sec_pos = 0.0
    peak_w = sec_w = 0
    for i in range(HIST_SIZE):
        bin_mid = F((i + 0.5) * bin_size)
        if hist[i] > peak_v:
            sec_v, sec_w, sec_pos = peak_v, peak_w, peak_pos
            peak_v, peak_w, peak_pos = hist[i], hist[i], bin_mid
        elif hist[i] > sec_v:
            sec_v, sec_w, sec_pos = hist[i], hist[i], bin_mid
    if abs(sec_pos - peak_pos) < 2 * bin_size and sec_w > 0.5 * peak_w:
        peak_w += sec_w
        peak_pos = 0.5 * (peak_pos + sec_pos)
    return F(peak_pos), peak_w


class PriorModel:
    def __init__(self):
        self.lrt = F(0.5)
        self.flatness_threshold = F(0.5)
        self.template_diff_threshold = F(0.5)
        self.lrt_weighting = F(1.0)
        self.flatness_weighting = F(0.0)
        self.difference_weighting = F(0.0)

    def update(self, hist):
        """prior_signal_model_estimator.cc:78-188."""
        average = F(0.0)
        count = 0
        for i in range(10):
            bin_mid = F((i + 0.5) * BIN_LRT)
            average += F(hist.lrt[i] * bin_mid)
            count += hist.lrt[i]
        if count > 0:
            average = F(average / count)
        avg_sq = F(0.0)
        avg_compl = F(0.0)
        for i in range(HIST_SIZE):
            bin_mid = F((i + 0.5) * BIN_LRT)
            avg_sq += F(hist.lrt[i] * bin_mid * bin_mid)
            avg_compl += F(hist.lrt[i] * bin_mid)
        avg_sq = F(avg_sq / WINDOW_SIZE)
        avg_compl = F(avg_compl / WINDOW_SIZE)
        low_fluct = avg_sq - F(average * avg_compl) < 0.05
        self.lrt = F(1.0) if low_fluct else min(F(1.0), max(F(0.2), F(1.2 * average)))

        flat_pos, flat_w = find_peaks(BIN_FLAT, hist.flat)
        diff_pos, diff_w = find_peaks(BIN_DIFF, hist.diff)
        use_flat = 0 if (flat_w < 0.3 * 500 or flat_pos < 0.6) else 1
        use_diff = 0 if (diff_w < 0.3 * 500 or low_fluct) else 1
        self.template_diff_threshold = min(
            F(1.0), max(F(0.16), F(1.2 * diff_pos))
        )
        one_by_sum = F(1.0 / (1.0 + use_flat + use_diff))
        self.lrt_weighting = one_by_sum
        if use_flat:
            self.flatness_threshold = min(F(0.95), max(F(0.1), F(0.9 * flat_pos)))
            self.flatness_weighting = one_by_sum
        else:
            self.flatness_weighting = F(0.0)
        self.difference_weighting = one_by_sum if use_diff else F(0.0)


class SignalModelEstimator:
    def __init__(self):
        self.lrt = F(0.5)
        self.flat = F(0.5)
        self.diff = F(0.5)
        self.avg_log_lrt = np.full(NB, 0.5, F)
        self.diff_normalization = F(0.0)
        self.signal_energy_sum = F(0.0)
        self.histogram_counter = 500
        self.histograms = Histograms()
        self.prior = PriorModel()

    def adjust_normalization(self, n, energy):
        self.diff_normalization = F(
            F(F(self.diff_normalization * n) + energy) / F(n + 1)
        )

    def update(self, prior_snr, post_snr, conservative, signal_spectrum,
               spectral_sum, energy):
        """signal_model_estimator.cc:126-178."""
        # Spectral flatness.
        if np.any(signal_spectrum[1:] == 0.0):
            self.flat -= F(0.3) * self.flat
        else:
            num = F(np.sum(log_approx(signal_spectrum[1:]), dtype=F) * F(1.0 / NB))
            den = F(F(spectral_sum - signal_spectrum[0]) * F(1.0 / NB))
            tmp = F(exp_approx(num) / den)
            self.flat += F(0.3) * F(tmp - self.flat)

        # Spectral diff.
        noise_avg = F(np.sum(conservative, dtype=F) * F(1.0 / NB))
        signal_avg = F(spectral_sum * F(1.0 / NB))
        sig_d = signal_spectrum - signal_avg
        noi_d = conservative - noise_avg
        cov = F(np.sum(sig_d * noi_d, dtype=F) * F(1.0 / NB))
        nvar = F(np.sum(noi_d * noi_d, dtype=F) * F(1.0 / NB))
        svar = F(np.sum(sig_d * sig_d, dtype=F) * F(1.0 / NB))
        sd = F(svar - F(cov * cov) / F(nvar + 1e-4))
        sd = F(sd / F(self.diff_normalization + 1e-4))
        self.diff += F(0.3) * F(sd - self.diff)

        self.signal_energy_sum += energy

        self.histogram_counter -= 1
        if self.histogram_counter > 0:
            self.histograms.update(
                {"lrt": self.lrt, "flat": self.flat, "diff": self.diff}
            )
        else:
            self.prior.update(self.histograms)
            self.histograms.clear()
            self.histogram_counter = WINDOW_SIZE
            self.signal_energy_sum = F(self.signal_energy_sum / WINDOW_SIZE)
            self.diff_normalization = F(
                0.5 * F(self.signal_energy_sum + self.diff_normalization)
            )
            self.signal_energy_sum = F(0.0)

        # LRT.
        for i in range(NB):
            tmp1 = F(1.0 + 2.0 * prior_snr[i])
            tmp2 = F(2.0 * prior_snr[i] / F(tmp1 + 1e-4))
            bessel = F(F(post_snr[i] + 1.0) * tmp2)
            self.avg_log_lrt[i] += F(0.5) * F(
                bessel - log_approx(tmp1) - self.avg_log_lrt[i]
            )
        self.lrt = F(np.sum(self.avg_log_lrt, dtype=F) * F(1.0 / NB))


class SpeechProbabilityEstimator:
    def __init__(self):
        self.prior_prob = F(0.5)
        self.prob = np.zeros(NB, F)
        self.model = SignalModelEstimator()

    def update(self, n, prior_snr, post_snr, conservative, signal_spectrum,
               spectral_sum, energy):
        """speech_probability_estimator.cc:31-109."""
        m = self.model
        if n < LONG_STARTUP:
            m.adjust_normalization(n, energy)
        m.update(prior_snr, post_snr, conservative, signal_spectrum,
                 spectral_sum, energy)

        w0, w1 = F(4.0), F(8.0)
        pm = m.prior
        w = w1 if m.lrt < pm.lrt else w0
        ind0 = F(0.5 * (np.tanh(w * F(m.lrt - pm.lrt)) + 1.0))
        w = w1 if m.flat > pm.flatness_threshold else w0
        ind1 = F(0.5 * (np.tanh(F(1.0) * w * F(pm.flatness_threshold - m.flat)) + 1.0))
        w = w1 if m.diff < pm.template_diff_threshold else w0
        ind2 = F(0.5 * (np.tanh(w * F(m.diff - pm.template_diff_threshold)) + 1.0))
        ind_prior = F(
            pm.lrt_weighting * ind0
            + pm.flatness_weighting * ind1
            + pm.difference_weighting * ind2
        )
        self.prior_prob += F(0.1) * F(ind_prior - self.prior_prob)
        self.prior_prob = max(min(self.prior_prob, F(1.0)), F(0.01))
        gain_prior = F(F(1.0 - self.prior_prob) / F(self.prior_prob + 1e-4))
        inv_lrt = exp_approx(-m.avg_log_lrt)
        self.prob = (F(1.0) / (F(1.0) + gain_prior * inv_lrt)).astype(F)


class WienerFilter:
    def __init__(self, params):
        self.p = params
        self.filter = np.ones(NB, F)
        self.initial_spectral_estimate = np.zeros(NB, F)
        self.spectrum_prev_process = np.zeros(NB, F)

    def update(self, n, noise, prev_noise, parametric_noise, signal_spectrum):
        for i in range(NB):
            prev_tsa = F(
                self.spectrum_prev_process[i]
                / F(prev_noise[i] + 1e-4)
                * self.filter[i]
            )
            if signal_spectrum[i] > noise[i]:
                current_tsa = F(signal_spectrum[i] / F(noise[i] + 1e-4) - 1.0)
            else:
                current_tsa = F(0.0)
            snr_prior = F(0.98 * prev_tsa + 0.02 * current_tsa)
            self.filter[i] = F(
                snr_prior / F(self.p.over_subtraction_factor + snr_prior)
            )
            self.filter[i] = max(
                min(self.filter[i], F(1.0)), F(self.p.minimum_attenuating_gain)
            )
        if n < SHORT_STARTUP:
            for i in range(NB):
                self.initial_spectral_estimate[i] += signal_spectrum[i]
                fi = F(
                    self.initial_spectral_estimate[i]
                    - F(self.p.over_subtraction_factor) * parametric_noise[i]
                )
                fi = F(fi / F(self.initial_spectral_estimate[i] + 1e-4))
                fi = max(min(fi, F(1.0)), F(self.p.minimum_attenuating_gain))
                fi = F(fi * (SHORT_STARTUP - n))
                self.filter[i] = F(self.filter[i] * n)
                self.filter[i] = F(self.filter[i] + fi)
                self.filter[i] = F(self.filter[i] * F(1.0 / SHORT_STARTUP))
        self.spectrum_prev_process = signal_spectrum.copy()

    def overall_scaling(self, n, prior_prob, e_before, e_after):
        if not self.p.use_attenuation_adjustment or n <= LONG_STARTUP:
            return F(1.0)
        gain = F(np.sqrt(e_after / (e_before + 1.0), dtype=F))
        sf1 = F(1.0)
        if gain > 0.5:
            sf1 = F(1.0 + 1.3 * (gain - 0.5))
            if gain * sf1 > 1.0:
                sf1 = F(1.0 / gain)
        sf2 = F(1.0)
        if gain < 0.5:
            gain = max(gain, F(self.p.minimum_attenuating_gain))
            sf2 = F(1.0 - 0.3 * (0.5 - gain))
        return F(prior_prob * sf1 + F(1.0 - prior_prob) * sf2)


def fft(extended):
    spec = np.fft.rfft(extended.astype(np.float64)).astype(np.complex64)
    return spec.real.astype(F), spec.imag.astype(F)


def magnitude(re, im):
    mag = np.empty(NB, F)
    mag[0] = abs(re[0]) + 1.0
    mag[-1] = abs(re[-1]) + 1.0
    mag[1:-1] = np.sqrt(re[1:-1] ** 2 + im[1:-1] ** 2, dtype=F) + F(1.0)
    return mag


def compute_snr(filt, prev_signal, signal, prev_noise, noise):
    prior = np.empty(NB, F)
    post = np.empty(NB, F)
    for i in range(NB):
        prev_est = F(prev_signal[i] / F(prev_noise[i] + 1e-4) * filt[i])
        post[i] = (
            F(signal[i] / F(noise[i] + 1e-4) - 1.0) if signal[i] > noise[i] else F(0.0)
        )
        prior[i] = F(0.98 * prev_est + 0.02 * post[i])
    return prior, post


class ChannelState:
    def __init__(self, params, num_bands):
        self.wiener = WienerFilter(params)
        self.noise_est = NoiseEstimator(params)
        self.speech = SpeechProbabilityEstimator()
        self.analyze_mem = np.zeros(OVERLAP, F)
        self.prev_analysis_spectrum = np.ones(NB, F)
        self.process_analysis_mem = np.zeros(OVERLAP, F)
        self.process_synthesis_mem = np.zeros(OVERLAP, F)
        self.delay_mem = [np.zeros(OVERLAP, F) for _ in range(num_bands - 1)]


class NoiseSuppressorRef:
    """noise_suppressor.cc:255-528, mono/multi-channel."""

    def __init__(self, level, num_bands, num_channels):
        self.params = SuppressionParams(level)
        self.num_bands = num_bands
        self.channels = [ChannelState(self.params, num_bands)
                         for _ in range(num_channels)]
        self.n = -1

    def analyze(self, bands):
        # bands: (num_bands, 160, C)
        zero = all(
            np.sum(ch.analyze_mem**2) + np.sum(bands[0, :, c] ** 2) == 0.0
            for c, ch in enumerate(self.channels)
        )
        if zero:
            return
        self.n += 1
        if self.n < 0:
            self.n = 0
        for c, ch in enumerate(self.channels):
            frame = bands[0, :, c].astype(F)
            extended = np.concatenate([ch.analyze_mem, frame])
            ch.analyze_mem = extended[-OVERLAP:].copy()
            windowed = (extended * WINDOW).astype(F)
            re, im = fft(windowed)
            mag = magnitude(re, im)
            energy = F(np.sum(re**2 + im**2, dtype=F) / NB)
            ssum = F(np.sum(mag, dtype=F))

            ch.noise_est.prepare_analysis()
            ch.noise_est.pre_update(self.n, mag, ssum)
            prior_snr, post_snr = compute_snr(
                ch.wiener.filter, ch.prev_analysis_spectrum, mag,
                ch.noise_est.prev_noise, ch.noise_est.noise,
            )
            ch.speech.update(
                self.n, prior_snr, post_snr, ch.noise_est.conservative,
                mag, ssum, energy,
            )
            ch.noise_est.post_update(ch.speech.prob, mag)
            ch.prev_analysis_spectrum = mag.copy()

    def process(self, bands):
        bands = bands.astype(F).copy()
        C = len(self.channels)
        specs, mags, e_before = [], [], []
        upper_gains = []
        for c, ch in enumerate(self.channels):
            frame = bands[0, :, c]
            extended = np.concatenate([ch.process_analysis_mem, frame])
            ch.process_analysis_mem = extended[-OVERLAP:].copy()
            windowed = (extended * WINDOW).astype(F)
            e_before.append(F(np.sum(windowed**2, dtype=F)))
            re, im = fft(windowed)
            mag = magnitude(re, im)
            specs.append((re, im))
            mags.append(mag)
            ch.wiener.update(
                self.n, ch.noise_est.noise, ch.noise_est.prev_noise,
                ch.noise_est.parametric, mag,
            )
            if self.num_bands > 1:
                filt = ch.wiener.filter
                prob = ch.speech.prob
                avg_prob = F(np.sum(prob[NB - 33 : NB - 1], dtype=F) / 32)
                avg_gain = F(np.sum(filt[NB - 33 : NB - 1], dtype=F) / 32)
                sum_an = F(np.sum(ch.prev_analysis_spectrum, dtype=F))
                sum_pr = F(np.sum(mag, dtype=F))
                avg_prob = F(avg_prob * sum_pr / sum_an)
                g = F(0.5 * (np.tanh(2.0 * avg_prob - 1.0) + 1.0))
                if avg_prob >= 0.5:
                    g = F(0.25 * g + 0.75 * avg_gain)
                else:
                    g = F(0.5 * g + 0.5 * avg_gain)
                upper_gains.append(
                    min(max(g, F(self.params.minimum_attenuating_gain)), F(1.0))
                )

        filt = self.channels[0].wiener.filter.copy()
        for ch in self.channels[1:]:
            filt = np.minimum(filt, ch.wiener.filter)

        gain_adjs = []
        exts = []
        for c, ch in enumerate(self.channels):
            re, im = specs[c]
            re = re.copy()
            im = im.copy()
            re[:NB] *= filt
            im[:NB] *= filt
            spec = re[:NB] + 1j * im[:NB]
            ext = np.fft.irfft(spec.astype(np.complex128), FFT_SIZE).astype(F)
            e_after = F(np.sum(ext**2, dtype=F))
            ext = (ext * WINDOW).astype(F)
            exts.append(ext)
            gain_adjs.append(
                ch.wiener.overall_scaling(
                    self.n, ch.speech.prior_prob, e_before[c], e_after
                )
            )
        gain_adj = min(gain_adjs)
        for c, ch in enumerate(self.channels):
            ext = (exts[c] * gain_adj).astype(F)
            out = np.empty(FRAME, F)
            out[:OVERLAP] = ch.process_synthesis_mem + ext[:OVERLAP]
            out[OVERLAP:] = ext[OVERLAP:FRAME]
            ch.process_synthesis_mem = ext[FRAME:].copy()
            bands[0, :, c] = out

        if self.num_bands > 1:
            ub = min(upper_gains)
            for c, ch in enumerate(self.channels):
                for b in range(1, self.num_bands):
                    frame = bands[b, :, c]
                    delayed = np.concatenate(
                        [ch.delay_mem[b - 1], frame[: FRAME - OVERLAP]]
                    )
                    ch.delay_mem[b - 1] = frame[FRAME - OVERLAP :].copy()
                    bands[b, :, c] = F(ub) * delayed

        return np.clip(bands, -32768.0, 32767.0)
