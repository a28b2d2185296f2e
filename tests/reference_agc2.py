"""Sequential numpy oracle for the AGC2 chain (limiter + adaptive digital).

Re-derived from agc2/fixed_digital_level_estimator.cc, interpolated_gain_
curve.cc, limiter.cc, noise_level_estimator.cc, speech_level_estimator_impl.cc,
saturation_protector.cc and adaptive_digital_gain_controller.cc.
"""

from __future__ import annotations

import numpy as np

from webrtc_audio_processing_tpu.models.agc2.limiter import _M, _Q, _X

F = np.float32
MIN_DBFS = -90.30899869919436
MIN_LEVEL_DBFS = -90.31
VAD_THR = 0.95
ADJ_THR = 12
DECAY = 0.9971259
MAX_INPUT = 36766.300710566735


def float_s16_to_dbfs(v):
    return MIN_DBFS if v <= 1.0 else 20.0 * np.log10(v) + MIN_DBFS


def energy_to_dbfs(e, n):
    r = e / n
    return MIN_DBFS if r <= 1.0 else 10.0 * np.log10(r) + MIN_DBFS


class LevelEstimator:
    def __init__(self):
        self.state = 0.0

    def compute(self, x):  # x: (N, C)
        n = x.shape[0]
        sub = n // 20
        env = np.zeros(20)
        for c in range(x.shape[1]):
            for s in range(20):
                env[s] = max(env[s], np.abs(x[s * sub : (s + 1) * sub, c]).max())
        for s in range(19):
            if env[s] < env[s + 1]:
                env[s] = env[s + 1]
        out = np.zeros(20)
        for s in range(20):
            if env[s] > self.state:
                out[s] = env[s]
            else:
                out[s] = env[s] * (1 - DECAY) + self.state * DECAY
            self.state = out[s]
        return out


def look_up_gain(level):
    if level <= _X[0]:
        return 1.0
    if level >= MAX_INPUT:
        return 32768.0 / level
    idx = int(np.searchsorted(_X, level, side="left")) - 1
    return _M[idx] * level + _Q[idx]


class Limiter:
    def __init__(self):
        self.level_est = LevelEstimator()
        self.last_scaling = 1.0

    def process(self, x):
        n = x.shape[0]
        sub = n // 20
        env = self.level_est.compute(x)
        factors = np.concatenate([[self.last_scaling],
                                  [look_up_gain(e) for e in env]])
        per_sample = np.zeros(n)
        is_attack = factors[0] > factors[1]
        start = 0
        if is_attack:
            for i in range(sub):
                t = i / sub
                per_sample[i] = (1 - t) ** 8 * (factors[0] - factors[1]) + factors[1]
            start = 1
        for s in range(start, 20):
            diff = (factors[s + 1] - factors[s]) / sub
            for j in range(sub):
                per_sample[s * sub + j] = factors[s] + diff * j
        self.last_scaling = factors[-1]
        return np.clip(x * per_sample[:, None], -32768.0, 32767.0)


class NoiseFloorEstimator:
    def __init__(self, rate):
        self.min_e = rate * 4.0 / 100
        self.first = True
        self.pre_set = False
        self.pre = self.min_e
        self.noise = self.min_e
        self.counter = 500

    def analyze(self, x):
        n = x.shape[0]
        e = max(np.sum(x[:, c] ** 2) for c in range(x.shape[1]))
        if e <= self.min_e:
            return energy_to_dbfs(self.noise, n)
        if self.pre_set:
            self.pre = min(self.pre, e)
        else:
            self.pre = e
            self.pre_set = True
        if self.counter == 0:
            self.first = False
            if self.noise < self.pre:
                self.noise = 0.5 * self.pre + 0.5 * self.noise
            else:
                self.noise = self.pre
            self.counter = 500
            self.pre_set = False
        elif self.first:
            self.noise = self.pre
            self.counter -= 1
        else:
            self.noise = min(self.noise, self.pre)
            self.counter -= 1
        return energy_to_dbfs(self.noise, n)


class SpeechLevelEstimator:
    def __init__(self, initial_gain_db, headroom_db):
        self.init_level = float(np.clip(-20.0 - initial_gain_db - headroom_db,
                                        -90.0, 30.0))
        self.pre = [400.0, self.init_level, 1.0]  # [ttc, num, den]
        self.rel = [400.0, self.init_level, 1.0]
        self.level = self.init_level
        self.n_adj = 0
        self.confident = False

    def update(self, rms_dbfs, p):
        if p < VAD_THR:
            if self.n_adj >= ADJ_THR:
                self.rel = list(self.pre)
            elif self.n_adj > 0:
                self.pre = list(self.rel)
            self.n_adj = 0
        else:
            self.n_adj += 1
            full = self.pre[0] == 0
            if not full:
                self.pre[0] -= 10
            leak = (1.0 - 1.0 / 400) if full else 1.0
            self.pre[1] = self.pre[1] * leak + rms_dbfs * p
            self.pre[2] = self.pre[2] * leak + p
            if self.n_adj >= ADJ_THR:
                self.level = float(np.clip(self.pre[1] / self.pre[2], -90, 30))
        self.confident = self.rel[0] == 0 or (
            self.n_adj >= ADJ_THR and self.pre[0] == 0
        )


class SatBuffer:
    def __init__(self):
        self.buf = np.zeros(4)
        self.next = 0
        self.size = 0

    def push(self, v):
        self.buf[self.next] = v
        self.next = (self.next + 1) % 4
        self.size = min(self.size + 1, 4)

    def front(self):
        if self.size == 0:
            return None
        return self.buf[self.next if self.size == 4 else 0]

    def clone(self):
        b = SatBuffer()
        b.buf = self.buf.copy()
        b.next = self.next
        b.size = self.size
        return b


class SatSub:
    def __init__(self):
        self.headroom = 20.0
        self.ring = SatBuffer()
        self.max_peaks = MIN_LEVEL_DBFS
        self.t = 0

    def clone(self):
        s = SatSub()
        s.headroom = self.headroom
        s.ring = self.ring.clone()
        s.max_peaks = self.max_peaks
        s.t = self.t
        return s

    def update(self, peak, level):
        kA, kD = 0.9988493699365052, 0.9997697679981565
        self.max_peaks = max(self.max_peaks, peak)
        self.t += 10
        if self.t > 400:
            self.ring.push(self.max_peaks)
            self.max_peaks = MIN_LEVEL_DBFS
            self.t = 0
        f = self.ring.front()
        delayed = self.max_peaks if f is None else f
        diff = delayed - level
        if diff > self.headroom:
            self.headroom = self.headroom * kA + diff * (1 - kA)
        else:
            self.headroom = self.headroom * kD + diff * (1 - kD)
        self.headroom = float(np.clip(self.headroom, 12.0, 25.0))


class SaturationProtector:
    def __init__(self):
        self.n_adj = 0
        self.headroom = 20.0
        self.pre = SatSub()
        self.rel = SatSub()

    def analyze(self, p, peak, level):
        if p < VAD_THR:
            if self.n_adj >= ADJ_THR:
                self.rel = self.pre.clone()
            elif self.n_adj > 0:
                self.pre = self.rel.clone()
            self.n_adj = 0
        else:
            self.n_adj += 1
            self.pre.update(peak, level)
            if self.n_adj >= ADJ_THR:
                self.headroom = self.pre.headroom


class AdaptiveDigitalController:
    def __init__(self, cfg):
        self.cfg = cfg
        self.last_gain_db = cfg["initial_gain_db"]
        self.last_factor = 10 ** (cfg["initial_gain_db"] / 20)
        self.frames_allowed = ADJ_THR

    def process(self, x, p, level, reliable, noise, headroom, lim_env_dbfs):
        c = self.cfg
        max_per_10ms = c["max_gain_change_db_per_second"] * 0.01
        input_level = level + headroom
        if input_level < -(c["headroom_db"] + c["max_gain_db"]):
            gain = c["max_gain_db"]
        elif input_level < -c["headroom_db"]:
            gain = -c["headroom_db"] - input_level
        else:
            gain = 0.0
        max_by_noise = c["max_output_noise_level_dbfs"] - noise
        gain = min(gain, max(max_by_noise, 0.0))
        if not (reliable or lim_env_dbfs <= -1.0):
            before = lim_env_dbfs - self.last_gain_db
            gain = min(max(-1.0 - before, 0.0), gain)

        first_conf = False
        if p < VAD_THR:
            self.frames_allowed = ADJ_THR
        elif self.frames_allowed > 0:
            self.frames_allowed -= 1
            first_conf = self.frames_allowed == 0
        allowed = self.frames_allowed == 0
        max_inc = max_per_10ms * (ADJ_THR if first_conf else 1)
        diff = gain - self.last_gain_db
        if not allowed:
            diff = min(diff, 0.0)
        change = float(np.clip(diff, -max_per_10ms, max_inc))
        new_factor = self.last_factor
        if change != 0.0:
            new_factor = 10 ** ((self.last_gain_db + change) / 20)
        n = x.shape[0]
        inc = (new_factor - self.last_factor) / n
        g = self.last_factor + inc * np.arange(n)
        y = x * g[:, None]
        self.last_factor = new_factor
        self.last_gain_db += change
        return y


class GainController2Ref:
    """gain_controller2.cc:183-263 with external speech probability."""

    def __init__(self, rate, adaptive_cfg, fixed_gain_db=0.0):
        self.rate = rate
        self.cfg = adaptive_cfg
        self.fixed_factor = 10 ** (fixed_gain_db / 20)
        self.limiter = Limiter()
        self.noise = NoiseFloorEstimator(rate)
        self.speech = SpeechLevelEstimator(
            adaptive_cfg["initial_gain_db"], adaptive_cfg["headroom_db"]
        )
        self.sat = SaturationProtector()
        self.adaptive = AdaptiveDigitalController(adaptive_cfg)

    def process(self, x, p):
        x = np.array(x, np.float64)
        ch0 = x[:, 0]
        peak_dbfs = float_s16_to_dbfs(np.abs(ch0).max())
        rms_dbfs = float_s16_to_dbfs(np.sqrt(np.sum(ch0**2) / x.shape[0]))
        noise_dbfs = self.noise.analyze(x)
        self.speech.update(rms_dbfs, p)
        self.sat.analyze(p, peak_dbfs, self.speech.level)
        lim_env = float_s16_to_dbfs(self.limiter.level_est.state)
        y = self.adaptive.process(
            x, p, self.speech.level, self.speech.confident, noise_dbfs,
            self.sat.headroom, lim_env,
        )
        y = y * self.fixed_factor
        return self.limiter.process(y)
