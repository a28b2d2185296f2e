"""Analytics VAD: JAX f32 vs float64 oracle, component and chain level."""

import jax
import jax.numpy as jnp
import numpy as np

from webrtc_audio_processing_tpu.models.vad import analytics_vad as AV
from tests import reference_analytics_vad as REF

RNG = np.random.default_rng(23)


def _voiced(n, fs=16000, amp=4000.0):
    # Voiced-speech-like: pitch ~125 Hz with a formant-like emphasis near
    # 500 Hz (the analytics GMM expects the spectral envelope peak in
    # [200, 2000] Hz like real speech).
    t = np.arange(n) / fs
    f0 = 125 * (1 + 0.04 * np.sin(2 * np.pi * 2.7 * t))
    ph = 2 * np.pi * np.cumsum(f0) / fs
    w = {1: 0.3, 2: 0.6, 3: 1.0, 4: 1.0, 5: 0.7, 6: 0.4}
    saw = sum(w.get(k, 1.0 / k) * np.sin(k * ph) for k in range(1, 10))
    env = 0.7 + 0.3 * np.sin(2 * np.pi * 1.3 * t)
    x = saw * env
    return amp * x / np.abs(x).max() + RNG.normal(size=n) * 20.0


def test_split_and_filter_matches_oracle():
    x = _voiced(480 * 4)
    st = AV.init_prefilt()
    ob = REF.PreFiltBank()
    fn = jax.jit(AV.split_and_filter)
    for f in range(4):
        seg = x[f * 480 : (f + 1) * 480]
        st, lp, hp, lp_la, hp_la = fn(st, jnp.asarray(seg, jnp.float32))
        olp, ohp, olp_la, ohp_la = ob.split_and_filter(seg)
        scale = np.abs(olp_la).max() + 1e-9
        assert np.max(np.abs(np.asarray(lp_la) - olp_la)) / scale < 1e-4
        assert np.max(np.abs(np.asarray(lp) - olp)) / scale < 1e-4
        assert np.max(np.abs(np.asarray(hp_la) - ohp_la)) / scale < 1e-4


def test_weighting_filter_matches_oracle():
    x = _voiced(240 * 6, fs=8000, amp=3000.0)
    st = AV.init_weight_filt()
    ob = REF.WeightFilt()
    fn = jax.jit(AV.weighting_filter)
    for f in range(6):
        seg = x[f * 240 : (f + 1) * 240]
        st, we, wh = fn(st, jnp.asarray(seg, jnp.float32))
        owe, owh = ob.process(seg)
        scale = np.abs(owe).max() + np.abs(seg).max() + 1e-9
        assert np.max(np.abs(np.asarray(we) - owe)) / scale < 5e-3, f
        assert np.max(np.abs(np.asarray(wh) - owh)) / scale < 5e-3, f


def test_pitch_analysis_matches_oracle():
    # Lags should agree closely (same peak picked); gains within tolerance.
    x = _voiced(240 * 8, fs=8000, amp=3000.0)
    st = AV.init_pitch_analysis()
    ob = REF.PitchAnalysis()
    fn = jax.jit(AV.pitch_analysis)
    agree = 0
    for f in range(8):
        seg = x[f * 240 : (f + 1) * 240]
        st, lags, gains = fn(st, jnp.asarray(seg, jnp.float32))
        olags, ogains = ob.analyze(seg)
        if np.max(np.abs(np.asarray(lags) - olags)) < 1.0:
            agree += 1
            assert np.max(np.abs(np.asarray(gains) - ogains)) < 0.05, f
    assert agree >= 6, agree


def test_full_chain_probabilities():
    fs = 16000
    n = 160 * 60
    speech = _voiced(n, fs, amp=4000.0)
    noise = RNG.normal(size=n) * 80.0

    def run(sig):
        st = AV.init_voice_activity_detector()
        steps = [
            jax.jit(lambda s, f, ph=ph: AV.process_chunk(s, f, ph))
            for ph in range(3)
        ]
        ps = []
        ostate = REF.VoiceActivityDetectorOracle()
        omeans = []
        for k in range(n // 160):
            frame = np.trunc(sig[k * 160 : (k + 1) * 160]).astype(np.int64)
            st, p, rms, valid = steps[k % 3](
                st, jnp.asarray(frame, jnp.int32)
            )
            o = ostate.process_chunk(frame)
            if k % 3 == 2:
                assert bool(valid)
                ps.append(np.asarray(p))
                assert o is not None
                omeans.append(o[0])
        return np.concatenate(ps), np.concatenate(omeans)

    p_speech, o_speech = run(speech)
    p_noise, o_noise = run(noise)
    # Behavioral: voiced speech scores high, noise low, and the JAX chain
    # tracks the float64 oracle.
    assert p_speech[6:].mean() > 0.7, p_speech.mean()
    assert p_noise[6:].mean() < 0.3, p_noise.mean()
    assert abs(p_speech.mean() - o_speech.mean()) < 0.1
    assert abs(p_noise.mean() - o_noise.mean()) < 0.1
