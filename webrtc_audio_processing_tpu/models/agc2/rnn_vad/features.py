"""RNN-VAD 42-dim feature extraction.

Reference: agc2/rnn_vad/features_extraction.cc (pipeline), lp_residual.cc
(LPC + inverse filtering), spectral_features.cc + spectral_features_internal.cc
(Opus-band energies, smoothed log spectrum, DCT cepstrum, cepstral history
stats). Feature vector layout (features_extraction.cc:75-95):

  [0:6]   average of lower-band cepstra over 3 frames
  [6:22]  higher-band cepstral coefficients
  [22:28] first derivative  (kernel [1, 0, -1])
  [28:34] second derivative (kernel [1, -2, 1])
  [34:40] pitch-lagged cepstral cross-correlation
  [40]    normalized pitch period: 0.01 * (period_48k - 300)
  [41]    spectral variability

TPU re-design: the pffft 480-pt FFT becomes a mixed-radix 32x15
Cooley-Tukey FFT (ops/mixed_fft.py; a plain 480-point jnp.fft.rfft lowers
to a naive DFT on the TPU backend); the triangular
Opus-band aggregation becomes a precomputed (20, 240) matrix product; the
symmetric cepstral-difference matrix is recomputed each frame from the
(8, 22) cepstral ring (exact, since all pairs live in the ring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from webrtc_audio_processing_tpu.models.agc2.rnn_vad import pitch as pitch_mod
from webrtc_audio_processing_tpu.ops import mixed_fft

NUM_BANDS = 22
NUM_LOWER_BANDS = 6
CEPSTRAL_HISTORY = 8
OPUS_BANDS_24K = 20
FEATURE_VECTOR_SIZE = 42
SILENCE_THRESHOLD = 0.04  # spectral_features.cc:32
FRAME_20MS = pitch_mod.FRAME_20MS_24K  # 480
FRAME_10MS = pitch_mod.FRAME_10MS_24K  # 240
BUF_SIZE = pitch_mod.BUF_SIZE_24K  # 864
NUM_LPC = 5  # lp_residual.h kNumLpcCoefficients


def _vorbis_window() -> np.ndarray:
    """ComputeScaledHalfVorbisWindow (spectral_features.cc:58-69), scaled by
    1/480, mirrored to the full frame (:80-88)."""
    half = np.arange(FRAME_20MS // 2)
    s = np.sin(0.5 * np.pi * (half + 0.5) / (FRAME_20MS // 2))
    hw = (np.sin(0.5 * np.pi * s * s) / FRAME_20MS).astype(np.float32)
    return np.concatenate([hw, hw[::-1]])


WINDOW = jnp.asarray(_vorbis_window())

_BAND_SIZES = [4] * 8 + [8] * 4 + [16] * 3 + [24] * 2 + [32, 48]  # 19 bands


def _band_matrix() -> np.ndarray:
    """Triangular Opus-band aggregation (spectral_features_internal.cc:30-131)
    as a dense (20, 240) matrix."""
    m = np.zeros((OPUS_BANDS_24K, FRAME_20MS // 2), np.float32)
    k = 0
    for i, size in enumerate(_BAND_SIZES):
        for j in range(size):
            w = j / size
            m[i, k] += 1.0 - w
            m[i + 1, k] += w
            k += 1
    assert k == FRAME_20MS // 2
    m[0] *= 2.0  # first band gets half contribution otherwise (:122)
    return m


BAND_MATRIX = jnp.asarray(_band_matrix())


def _dct_table() -> np.ndarray:
    """ComputeDctTable (spectral_features_internal.cc:160-170): T[j, i]."""
    i = np.arange(NUM_BANDS)
    t = np.cos((i[:, None] + 0.5) * i[None, :] * np.pi / NUM_BANDS)
    t[:, 0] *= np.sqrt(0.5)
    return t.astype(np.float32)


DCT_TABLE = jnp.asarray(_dct_table())
DCT_SCALE = 0.301511345  # spectral_features_internal.cc:176


@struct.dataclass
class FeatureState:
    pitch_buffer: jnp.ndarray  # (864,)
    cepstral_history: jnp.ndarray  # (8, 22), row 0 = newest
    last_pitch_period_48k: jnp.ndarray  # () int32
    last_pitch_strength: jnp.ndarray  # ()


def init_state(dtype=jnp.float32) -> FeatureState:
    return FeatureState(
        pitch_buffer=jnp.zeros((BUF_SIZE,), dtype),
        cepstral_history=jnp.zeros((CEPSTRAL_HISTORY, NUM_BANDS), dtype),
        last_pitch_period_48k=jnp.asarray(0, jnp.int32),
        last_pitch_strength=jnp.asarray(0.0, dtype),
    )


def compute_lpc_coefficients(x):
    """ComputeAndPostProcessLpcCoefficients (lp_residual.cc:90-118).

    x: (864,). Returns (5,) inverse-filter coefficients.
    """
    dt = x.dtype
    n = x.shape[0]
    ac = jnp.stack([jnp.dot(x[: n - lag], x[lag:]) for lag in range(NUM_LPC)])
    empty = ac[0] == 0.0

    # DenoiseAutoCorrelation (:41-52).
    denoise = jnp.asarray([1.0001, 1 - 0.000064, 1 - 0.000256, 1 - 0.000576,
                           1 - 0.001024], dt)
    ac = ac * denoise

    # Levinson-Durbin with early termination (:56-88), unrolled with masks.
    lpc = jnp.zeros((4,), dt)
    error = ac[0]
    broken = jnp.asarray(False)
    for i in range(4):
        rc = ac[i + 1]
        for j in range(i):
            rc = rc + lpc[j] * ac[i - j]
        safe_error = jnp.where(
            jnp.abs(error) < 1e-6, jnp.copysign(1e-6, error), error
        )
        rc = rc / -safe_error
        new_lpc = lpc.at[i].set(rc)
        for j in range((i + 1) >> 1):
            t1 = new_lpc[j]
            t2 = new_lpc[i - 1 - j]
            new_lpc = new_lpc.at[j].set(t1 + rc * t2)
            if i - 1 - j != j:
                new_lpc = new_lpc.at[i - 1 - j].set(t2 + rc * t1)
        new_error = error - rc * rc * error
        lpc = jnp.where(broken, lpc, new_lpc)
        error = jnp.where(broken, error, new_error)
        broken = broken | (error < 0.001 * ac[0])

    # Post-processing (:103-117).
    damp = jnp.asarray([0.9, 0.81, 0.729, 0.6561], dt)
    pre = lpc * damp
    kc = 0.8
    out = jnp.stack([
        pre[0] + kc,
        pre[1] + kc * pre[0],
        pre[2] + kc * pre[1],
        pre[3] + kc * pre[2],
        kc * pre[3],
    ])
    return jnp.where(empty, jnp.zeros((NUM_LPC,), dt), out)


def compute_lp_residual(lpc, x):
    """ComputeLpResidual (lp_residual.cc:120-140): causal FIR [1, lpc...]."""
    kernel = jnp.concatenate([jnp.ones((1,), x.dtype), lpc])
    return jnp.convolve(x, kernel, mode="full")[: x.shape[0]]


def _band_energies(spec):
    """SpectralCorrelator::ComputeCrossCorrelation
    (spectral_features_internal.cc:102-124). spec: product spectrum v_k."""
    return BAND_MATRIX @ spec


def _smoothed_log_energies(bands_energy):
    """ComputeSmoothedLogMagnitudeSpectrum
    (spectral_features_internal.cc:133-158)."""
    raw = jnp.concatenate([
        jnp.log10(0.01 + bands_energy),
        jnp.full((NUM_BANDS - OPUS_BANDS_24K,), -2.0, bands_energy.dtype),
    ])

    def step(carry, x):
        log_max, follow = carry
        x = jnp.maximum(log_max - 7.0, jnp.maximum(follow - 1.5, x))
        return (jnp.maximum(log_max, x), jnp.maximum(follow - 1.5, x)), x

    (_, _), out = jax.lax.scan(step, (jnp.asarray(-2.0, raw.dtype),) * 2, raw)
    return out


def _dct(x, out_size: int):
    """ComputeDct (spectral_features_internal.cc:172-196)."""
    n = x.shape[0]
    return (x @ DCT_TABLE[:n, :out_size]) * DCT_SCALE


def extract_features(state: FeatureState, frame_24k):
    """FeaturesExtractor::CheckSilenceComputeFeatures
    (features_extraction.cc:56-95).

    frame_24k: (240,). Returns (new_state, features (42,), is_silence).
    On silence the reference skips all spectral state updates; we emulate by
    selecting the old state.
    """
    dt = frame_24k.dtype
    pitch_buf = jnp.concatenate([state.pitch_buffer[FRAME_10MS:], frame_24k])

    lpc = compute_lpc_coefficients(pitch_buf)
    residual = compute_lp_residual(lpc, pitch_buf)
    period_48k, strength = pitch_mod.estimate_pitch(
        residual, state.last_pitch_period_48k, state.last_pitch_strength
    )

    # Reference frame = most recent 20 ms; lagged frame per pitch period.
    # The per-stream window read goes through the Pallas gather kernel
    # (ops/pallas_window.py) — a vmapped dynamic-slice would serialize.
    from webrtc_audio_processing_tpu.ops import pallas_window

    ref = pitch_buf[BUF_SIZE - FRAME_20MS :]
    lag_start = pitch_mod.MAX_PITCH_24K - period_48k // 2
    lagged = pallas_window.make_take_window(FRAME_20MS)(
        pitch_buf, jnp.clip(lag_start, 0, BUF_SIZE - FRAME_20MS)
    )

    ref_spec = mixed_fft.rfft480(ref * WINDOW)[: FRAME_20MS // 2]
    ref_energy = _band_energies((ref_spec.real**2 + ref_spec.imag**2).astype(dt))
    is_silence = jnp.sum(ref_energy) < SILENCE_THRESHOLD

    lag_spec = mixed_fft.rfft480(lagged * WINDOW)[: FRAME_20MS // 2]
    lag_energy = _band_energies((lag_spec.real**2 + lag_spec.imag**2).astype(dt))

    log_energy = _smoothed_log_energies(ref_energy)
    cepstrum = _dct(log_energy, NUM_BANDS)
    cepstrum = cepstrum.at[0].add(-12.0).at[1].add(-4.0)

    history = jnp.concatenate(
        [cepstrum[None], state.cepstral_history[:-1]], axis=0
    )

    # Average / first / second derivative over the 3 newest cepstra
    # (spectral_features.cc:165-183).
    curr, prev1, prev2 = history[0], history[1], history[2]
    average = (curr + prev1 + prev2)[:NUM_LOWER_BANDS]
    first_d = (curr - prev2)[:NUM_LOWER_BANDS]
    second_d = (curr - 2 * prev1 + prev2)[:NUM_LOWER_BANDS]

    # Normalized cepstral cross-correlation (spectral_features.cc:185-202).
    cross = _band_energies(
        (ref_spec.real * lag_spec.real + ref_spec.imag * lag_spec.imag).astype(dt)
    )
    cross = cross / jnp.sqrt(0.001 + ref_energy * lag_energy)
    cross_cep = _dct(cross, NUM_LOWER_BANDS)
    cross_cep = cross_cep.at[0].add(-1.3).at[1].add(-0.9)

    # Variability from pairwise cepstral distances (spectral_features.cc:204-219
    # + the symmetric matrix buffer, recomputed exactly from the ring).
    diffs = history[:, None, :] - history[None, :, :]  # (8, 8, 22)
    dists = jnp.sum(diffs * diffs, axis=-1)
    dists = dists + jnp.eye(CEPSTRAL_HISTORY, dtype=dt) * jnp.finfo(dt).max
    variability = jnp.sum(jnp.min(dists, axis=1)) / CEPSTRAL_HISTORY - 2.1

    features = jnp.concatenate([
        average,
        cepstrum[NUM_LOWER_BANDS:],
        first_d,
        second_d,
        cross_cep,
        (0.01 * (period_48k.astype(dt) - 300))[None],
        variability[None],
    ])

    new_state = FeatureState(
        pitch_buffer=pitch_buf,
        cepstral_history=jnp.where(is_silence, state.cepstral_history, history),
        last_pitch_period_48k=period_48k.astype(jnp.int32),
        last_pitch_strength=strength,
    )
    return new_state, features, is_silence
