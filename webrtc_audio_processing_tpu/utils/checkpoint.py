"""Checkpoint/resume of stream state pytrees.

The reference has no checkpointing (SURVEY.md section 5): its nearest analogs
are ``Initialize()`` (reset) and AecDump record/replay. With the TPU design
every per-stream carry is an explicit pytree of fixed-size arrays, so
serializing a live call — or a whole vmapped pool of thousands of calls —
is a flat array dump. This module provides that as a first-class feature:

* ``save(path, state)`` / ``load(path, like=None)`` — single state or any
  pytree (e.g. the batched pool state of runtime/streaming.py).
* ``pack(state)`` / ``unpack(blob, like)`` — in-memory bytes, for shipping
  carries between hosts when rebalancing streams across chips.

Format: numpy ``.npz`` keyed by the flattened tree path; dataclass node
types are reconstructed from the ``like`` template (or from the stored
module/qualname when the pytree is made only of containers).
"""

from __future__ import annotations

import io

import jax
import numpy as np

__all__ = ["save", "load", "pack", "unpack", "save_stream", "load_stream"]

_NONE = "__none__"


def _flatten(state):
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out, treedef


def pack(state) -> bytes:
    """Serialize a state pytree to bytes (npz)."""
    arrays, _ = _flatten(state)
    buf = io.BytesIO()
    np.savez(buf, **{k if k else _NONE: v for k, v in arrays.items()})
    return buf.getvalue()


def unpack(blob: bytes, like):
    """Rebuild a state pytree from ``pack`` output, using ``like`` (any
    pytree with the same structure, e.g. a freshly init'd state) for the
    tree structure and leaf placement."""
    with np.load(io.BytesIO(blob)) as data:
        arrays = {(_NONE if k == _NONE else k): data[k] for k in data.files}
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for path, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(path) or _NONE
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = arrays[key]
        ref = np.asarray(leaf)
        if arr.shape != ref.shape:
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != "
                f"state shape {ref.shape}"
            )
        new_leaves.append(arr.astype(ref.dtype, copy=False))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save(path: str, state) -> None:
    with open(path, "wb") as f:
        f.write(pack(state))


def load(path: str, like):
    with open(path, "rb") as f:
        return unpack(f.read(), like)


# ---------------------------------------------------------------- API layer


def save_stream(path: str, ap) -> None:
    """Checkpoint a live api.AudioProcessing instance (its jit-side state
    carry plus the host-side frame counters needed to resume glitch-free)."""
    if ap._state is None:
        raise ValueError("AudioProcessing not initialized; nothing to save")
    host = {
        "frame_index": np.asarray(ap._frame_index),
        "stream_delay_ms": np.asarray(ap._stream_delay_ms),
        "render_queue": np.asarray(len(ap._render_queue)),
    }
    arrays, _ = _flatten(ap._state)
    merged = {f"state{k}": v for k, v in arrays.items()}
    merged.update({f"host/{k}": v for k, v in host.items()})
    with open(path, "wb") as f:
        np.savez(f, **merged)


def load_stream(path: str, ap) -> None:
    """Restore a checkpoint into an initialized api.AudioProcessing with the
    same config/geometry (raises on structure mismatch)."""
    if ap._state is None:
        raise ValueError(
            "initialize the AudioProcessing (process one frame or call "
            "_ensure_initialized) before restoring"
        )
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
        ap._state
    )
    new_leaves = []
    for p, leaf in leaves_with_paths:
        key = "state" + jax.tree_util.keystr(p)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        ref = np.asarray(leaf)
        arr = arrays[key]
        if arr.shape != ref.shape:
            raise ValueError(f"checkpoint leaf {key!r} shape mismatch")
        new_leaves.append(arr.astype(ref.dtype, copy=False))
    ap._state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    ap._frame_index = int(arrays["host/frame_index"])
    ap._stream_delay_ms = int(arrays["host/stream_delay_ms"])
