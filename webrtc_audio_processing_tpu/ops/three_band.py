"""Three-band filter bank (48 kHz -> 3 x 16 kHz) with DCT modulation.

Reference: modules/audio_processing/three_band_filter_bank.{h,cc} — sparsity-4
polyphase FIR (4 taps at stride 4, 10 non-zero of 12 modulated filters), DCT
modulation to center frequencies [1/12, 3/12, 5/12], 24-sample delay,
non-perfect reconstruction (~9.5 dB SNR; three_band_filter_bank.h:31-43).

TPU design: the reference's FilterCore (three_band_filter_bank.cc:113-151)
reduces to ``out[k] = sum_i filter[i] * u[k - shift - 4*i]`` over the
state-extended subsampled signal ``u``; here each of the 10 filters becomes 4
static shifted slices of the extended signal — all branches and bands compute
as one fused elementwise/DCT-matmul program, no per-sample loops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

NUM_BANDS = 3
SPARSITY = 4
STRIDE = 4
FILTER_SIZE = 4
MEMORY_SIZE = FILTER_SIZE * STRIDE - 1  # 15
FULL_BAND_SIZE = 480
SPLIT_BAND_SIZE = 160
NUM_NON_ZERO = SPARSITY * NUM_BANDS - 2  # 10

# Low-pass prototype, polyphase rows (three_band_filter_bank.cc:79-89);
# fir1(47, 1/6, kaiser(48, 3.5)) reshaped, zero rows 3 and 9 dropped.
FILTER_COEFFS = np.array(
    [
        [-0.00047749, -0.00496888, +0.16547118, +0.00425496],
        [-0.00173287, -0.01585778, +0.14989004, +0.00994113],
        [-0.00304815, -0.02536082, +0.12154542, +0.01157993],
        [-0.00346946, -0.02587886, +0.04760441, +0.00607594],
        [-0.00154717, -0.01136076, +0.01387458, +0.00186353],
        [+0.00186353, +0.01387458, -0.01136076, -0.00154717],
        [+0.00607594, +0.04760441, -0.02587886, -0.00346946],
        [+0.00983212, +0.08543175, -0.02982767, -0.00383509],
        [+0.00994113, +0.14989004, -0.01585778, -0.00173287],
        [+0.00425496, +0.16547118, -0.00496888, -0.00047749],
    ],
    np.float32,
)

_SQRT3 = np.sqrt(3.0, dtype=np.float64)
# DCT modulation per non-zero filter (three_band_filter_bank.cc:95-106).
DCT_MODULATION = np.array(
    [
        [2, 2, 2],
        [_SQRT3, 0, -_SQRT3],
        [1, -2, 1],
        [-1, 2, -1],
        [-_SQRT3, 0, _SQRT3],
        [-2, -2, -2],
        [-_SQRT3, 0, _SQRT3],
        [-1, 2, -1],
        [1, -2, 1],
        [_SQRT3, 0, -_SQRT3],
    ],
    np.float32,
)

# Map the 12 (downsampling, shift) combos to non-zero filter indices,
# skipping kZeroFilterIndex1=3, kZeroFilterIndex2=9
# (three_band_filter_bank.cc:91-93, :199-209).
_COMBOS = []  # (filter_index, downsampling_index, in_shift)
for _shift in range(STRIDE):
    for _ds in range(NUM_BANDS):
        _index = _ds + _shift * NUM_BANDS
        if _index in (3, 9):
            continue
        _fi = _index if _index < 3 else (_index - 1 if _index < 9 else _index - 2)
        _COMBOS.append((_fi, _ds, _shift))
_COMBOS.sort()


@struct.dataclass
class ThreeBandState:
    """Per-channel analysis+synthesis filter memories.

    analysis: (NUM_BANDS, MEMORY_SIZE, ...) — per downsampling branch (the
      reference keeps one per filter, but all filters of a branch see the
      same input so the memories coincide; three_band_filter_bank.cc:146-150).
    synthesis: (NUM_NON_ZERO, MEMORY_SIZE, ...) — per filter (inputs differ).
    """

    analysis: jnp.ndarray
    synthesis: jnp.ndarray


def init_state(batch_shape=(), dtype=jnp.float32):
    return ThreeBandState(
        analysis=jnp.zeros((NUM_BANDS, MEMORY_SIZE) + tuple(batch_shape), dtype),
        synthesis=jnp.zeros((NUM_NON_ZERO, MEMORY_SIZE) + tuple(batch_shape), dtype),
    )


def _filter_core(ext, coeffs, shift):
    """out[k] = sum_i coeffs[i] * ext[MEMORY_SIZE + k - shift - 4i].

    ext: (MEMORY_SIZE + SPLIT_BAND_SIZE, ...) state-extended signal.
    """
    acc = None
    for i in range(FILTER_SIZE):
        start = MEMORY_SIZE - shift - STRIDE * i
        sl = ext[start : start + SPLIT_BAND_SIZE]
        term = coeffs[i] * sl
        acc = term if acc is None else acc + term
    return acc


def analysis(x, state: ThreeBandState):
    """Split (480, ...) signal into ((3, 160, ...) bands, new state).

    Mirrors ThreeBandFilterBank::Analysis (three_band_filter_bank.cc:173-225).
    """
    # Serial-to-parallel: in_sub[ds, k] = x[(2 - ds) + 3k].
    par = x.reshape((SPLIT_BAND_SIZE, NUM_BANDS) + x.shape[1:])
    in_sub = jnp.flip(jnp.moveaxis(par, 1, 0), axis=0)  # (3, 160, ...)
    ext = jnp.concatenate([state.analysis, in_sub], axis=1)  # (3, 175, ...)

    bands = None
    for fi, ds, shift in _COMBOS:
        filtered = _filter_core(ext[ds], FILTER_COEFFS[fi], shift)
        mod = DCT_MODULATION[fi].reshape((NUM_BANDS,) + (1,) * filtered.ndim)
        contrib = mod * filtered[None]
        bands = contrib if bands is None else bands + contrib

    new_analysis = in_sub[:, -MEMORY_SIZE:]
    return bands, state.replace(analysis=new_analysis)


def synthesis(bands, state: ThreeBandState):
    """Merge (3, 160, ...) bands into ((480, ...) signal, new state).

    Mirrors ThreeBandFilterBank::Synthesis (three_band_filter_bank.cc:233-278).
    """
    out_par = [None] * NUM_BANDS  # per upsampling branch, (160, ...)
    new_syn = []
    for fi, up, shift in _COMBOS:
        mod = DCT_MODULATION[fi].reshape((NUM_BANDS,) + (1,) * (bands.ndim - 1))
        in_sub = jnp.sum(mod * bands, axis=0)  # (160, ...)
        ext = jnp.concatenate([state.synthesis[fi], in_sub], axis=0)
        filtered = _filter_core(ext, FILTER_COEFFS[fi], shift)
        out_par[up] = filtered if out_par[up] is None else out_par[up] + filtered
        new_syn.append(in_sub[-MEMORY_SIZE:])

    # Parallel-to-serial with x3 upsampling gain: out[up + 3k] = 3 * out_par[up].
    stacked = jnp.stack(out_par, axis=1) * np.float32(NUM_BANDS)  # (160, 3, ...)
    out = stacked.reshape((FULL_BAND_SIZE,) + bands.shape[2:])
    return out, state.replace(synthesis=jnp.stack(new_syn, axis=0))
