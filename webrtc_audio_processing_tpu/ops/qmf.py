"""Two-band QMF analysis/synthesis (all-pass polyphase pair).

Reference: webrtc/common_audio/signal_processing/splitting_filter.c
(float QMF: WebRtcSpl_AnalysisQMF :134-167, WebRtcSpl_SynthesisQMF :169-204,
all-pass kernel WebRtcSpl_AllPassQMF :47-131) as used by
modules/audio_processing/splitting_filter.cc:57-75 for the 32 kHz 2-band
split.

Each branch is a cascade of three first-order all-pass sections
``y[n] = x[n-1] + a (x[n] - y[n-1])``; the recursive part is a first-order
affine recurrence solved with an associative scan
(recurrence.affine_scan_1), the feed-forward part is a shift+scale.

State layout per branch: 3 sections x (x[-1], y[-1]) = 6 floats, mirroring
the reference's ``filter_state`` (splitting_filter.h:30: 6 words per band).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from webrtc_audio_processing_tpu.ops import recurrence

# QMF all-pass coefficients (splitting_filter.c:25-28).
ALLPASS_COEF_1 = (0.0979309082, 0.5643005371, 0.8737335205)
ALLPASS_COEF_2 = (0.32551574707, 0.74862670898, 0.96145629882)


@struct.dataclass
class QmfState:
    """State for one analysis or synthesis QMF over one channel.

    Attributes:
      state1: (3, 2, ...) — per all-pass section (x[-1], y[-1]) for branch 1.
      state2: (3, 2, ...) — same for branch 2.
    """

    state1: jnp.ndarray
    state2: jnp.ndarray


def init_state(batch_shape=(), dtype=jnp.float32):
    z = jnp.zeros((3, 2) + tuple(batch_shape), dtype)
    return QmfState(state1=z, state2=z)


def _allpass_chain(x, coefs, state):
    """Cascade of three first-order all-pass sections.

    ``y[n] = x[n-1] + a * (x[n] - y[n-1])`` (splitting_filter.c:54-131),
    evaluated with the reference's exact operation order — one fused
    sequential step per sample — so outputs are float-bit-exact with the C
    (the associative-scan form reassociates the rounding and drifts ~1 LSB
    over the reference harnesses' tolerance). ``state`` is (3, 2, ...) of
    (x[-1], y[-1]) per section.
    """
    import jax

    new_states = []
    sig = x
    for k, a in enumerate(coefs):
        x_prev = state[k, 0]
        y_prev = state[k, 1]
        x_shift = jnp.concatenate([x_prev[None], sig[:-1]], axis=0)
        a = jnp.asarray(a, sig.dtype)

        def step(y_p, xx):
            xp, xc = xx
            y = xp + a * (xc - y_p)
            return y, y

        _, y = jax.lax.scan(step, y_prev, (x_shift, sig))
        new_states.append(jnp.stack([sig[-1], y[-1]], axis=0))
        sig = y
    return sig, jnp.stack(new_states, axis=0)


def analysis(x, state: QmfState):
    """Split (N, ...) full-rate signal into (low, high) half-rate bands.

    Matches WebRtcSpl_AnalysisQMF (splitting_filter.c:134-167): even samples
    feed branch 2, odd samples feed branch 1; low = (f1 + f2)/2,
    high = (f1 - f2)/2.
    """
    even = x[0::2]
    odd = x[1::2]
    f1, s1 = _allpass_chain(odd, ALLPASS_COEF_1, state.state1)
    f2, s2 = _allpass_chain(even, ALLPASS_COEF_2, state.state2)
    low = (f1 + f2) * 0.5
    high = (f1 - f2) * 0.5
    return (low, high), QmfState(state1=s1, state2=s2)


def synthesis(low, high, state: QmfState):
    """Merge (low, high) half-rate bands back to a (2N, ...) signal.

    Matches WebRtcSpl_SynthesisQMF (splitting_filter.c:169-204); output is
    clamped to int16 range (float_s16 domain) like the reference.
    """
    sum_band = low + high
    diff_band = low - high
    f1, s1 = _allpass_chain(sum_band, ALLPASS_COEF_2, state.state1)
    f2, s2 = _allpass_chain(diff_band, ALLPASS_COEF_1, state.state2)
    n = low.shape[0]
    out = jnp.empty((2 * n,) + low.shape[1:], low.dtype)
    out = out.at[0::2].set(f2)
    out = out.at[1::2].set(f1)
    out = jnp.clip(out, -32768.0, 32767.0)
    return out, QmfState(state1=s1, state2=s2)
