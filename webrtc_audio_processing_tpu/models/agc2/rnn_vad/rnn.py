"""RNN-VAD network: FC(42->24, tansig) + GRU(24) + FC(24->1, sigmoid).

Reference: agc2/rnn_vad/rnn.cc, rnn_fc.cc, rnn_gru.cc with the quantized
int8 rnnoise weights (third_party/rnnoise/src/rnn_vad_weights.cc, scale
1/256) and the table-based activations (rnn_activations.h).

The weights ship as ``rnnoise_weights.npz`` (extracted from the public
rnnoise weight arrays); layers are plain matmuls batched by vmap.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from flax import struct

WEIGHTS_SCALE = 1.0 / 256.0  # rnn_vad_weights.h:10
INPUT_SIZE = 42
HIDDEN_SIZE = 24

# Tansig lookup table (rnn_activations.h:36-70): round(tanh(0.04 i), 6).
TANSIG_TABLE = jnp.asarray(
    np.round(np.tanh(0.04 * np.arange(201)), 6).astype(np.float32)
)


def tansig_approx(x):
    """TansigApproximated (rnn_activations.h:36-96), vectorized.

    The table entry round(tanh(0.04 i), 6) is computed arithmetically
    instead of gathered: a 201-entry per-element gather lowers to a slow
    serialized access pattern on TPU, while tanh + round-to-1e-6 is pure
    VPU work and matches the table to ~2 f32 ulps (the goldens assert
    1e-4).
    """
    sign = jnp.where(x < 0.0, -1.0, 1.0)
    ax = jnp.abs(x)
    i = jnp.floor(0.5 + 25.0 * jnp.minimum(ax, 8.0)).astype(jnp.int32)
    i = jnp.clip(i, 0, 200)
    y = jnp.round(jnp.tanh(0.04 * i.astype(x.dtype)) * 1e6) * 1e-6
    xx = ax - 0.04 * i.astype(x.dtype)
    y = y + xx * (1.0 - y * y) * (1.0 - y * xx)
    out = sign * y
    out = jnp.where(x >= 8.0, 1.0, out)
    out = jnp.where(x <= -8.0, -1.0, out)
    return jnp.where(jnp.isnan(x), 1.0, out)


def sigmoid_approx(x):
    """SigmoidApproximated (rnn_activations.h:98-100)."""
    return 0.5 + 0.5 * tansig_approx(0.5 * x)


def _load_weights():
    path = os.path.join(os.path.dirname(__file__), "rnnoise_weights.npz")
    raw = np.load(path)
    s = WEIGHTS_SCALE

    def fc(w, in_size, out_size):
        # rnn_fc.cc PreprocessWeights: stored input-major [i*out + o].
        return (w.astype(np.float32) * s).reshape(in_size, out_size)

    def gru(w, n, out_size):
        # rnn_gru.cc PreprocessGruTensor: [i*3*out + g*out + o] -> (3, n, out).
        return (w.astype(np.float32) * s).reshape(n, 3, out_size).transpose(1, 0, 2)

    # Cache plain numpy (never jnp: arrays created while tracing would cache
    # tracers and leak across jit boundaries); get_weights converts per call.
    return {
        "fc1_w": fc(raw["input_weights"], INPUT_SIZE, HIDDEN_SIZE),
        "fc1_b": raw["input_bias"].astype(np.float32) * s,
        "gru_w": gru(raw["gru_weights"], HIDDEN_SIZE, HIDDEN_SIZE),
        "gru_r": gru(raw["gru_recurrent_weights"], HIDDEN_SIZE, HIDDEN_SIZE),
        "gru_b": (raw["gru_bias"].astype(np.float32) * s).reshape(
            3, HIDDEN_SIZE
        ),
        "fc2_w": raw["output_weights"].astype(np.float32) * s,
        "fc2_b": raw["output_bias"].astype(np.float32) * s,
    }


_WEIGHTS_CACHE = None


def get_weights():
    global _WEIGHTS_CACHE
    if _WEIGHTS_CACHE is None:
        _WEIGHTS_CACHE = _load_weights()
    return {k: jnp.asarray(v) for k, v in _WEIGHTS_CACHE.items()}


@struct.dataclass
class RnnState:
    gru: jnp.ndarray  # (24,)


def init_state(dtype=jnp.float32) -> RnnState:
    return RnnState(gru=jnp.zeros((HIDDEN_SIZE,), dtype))


def compute_vad_probability(state: RnnState, features, is_silence):
    """RnnVad::ComputeVadProbability (rnn.cc:70-84).

    On silence the GRU state resets and the probability is 0.
    """
    w = get_weights()
    h1 = tansig_approx(features @ w["fc1_w"] + w["fc1_b"])

    s = state.gru
    update = sigmoid_approx(h1 @ w["gru_w"][0] + s @ w["gru_r"][0] + w["gru_b"][0])
    reset = sigmoid_approx(h1 @ w["gru_w"][1] + s @ w["gru_r"][1] + w["gru_b"][1])
    cand = h1 @ w["gru_w"][2] + (s * reset) @ w["gru_r"][2] + w["gru_b"][2]
    new_s = update * s + (1.0 - update) * jnp.maximum(0.0, cand)

    prob = sigmoid_approx(jnp.dot(new_s, w["fc2_w"]) + w["fc2_b"][0])
    new_s = jnp.where(is_silence, jnp.zeros_like(new_s), new_s)
    prob = jnp.where(is_silence, 0.0, prob)
    return RnnState(gru=new_s), prob
