"""AecDump: record/replay of APM sessions.

Reference: api/audio/aec_dump.h + tests/proto/debug.proto (Event stream of
INIT / REVERSE_STREAM / STREAM / CONFIG / RUNTIME_SETTING messages) and the
audioproc_f replay tool. This implementation stores the same event stream
in a single .npz container (no protobuf dependency): each event carries the
debug.proto field content; `replay()` feeds a recorded dump back through a
fresh AudioProcessing instance exactly like audioproc_f.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import numpy as np

EVENT_INIT = 0
EVENT_REVERSE_STREAM = 1
EVENT_STREAM = 2
EVENT_CONFIG = 3
EVENT_RUNTIME_SETTING = 4


class AecDumpRecorder:
    """Collects the debug.proto-equivalent event stream."""

    def __init__(self, path: str):
        self._path = path
        self._events: list[dict[str, Any]] = []
        self._arrays: dict[str, np.ndarray] = {}
        self._n = 0

    def _store(self, array) -> str:
        key = f"a{self._n}"
        self._n += 1
        self._arrays[key] = np.asarray(array, np.float32)
        return key

    def on_init(self, sample_rate: int, num_input_channels: int,
                num_output_channels: int, reverse_sample_rate: int,
                num_reverse_channels: int, output_sample_rate: int):
        """WriteInitMessage (debug.proto Init)."""
        self._events.append({
            "type": EVENT_INIT,
            "sample_rate": sample_rate,
            "num_input_channels": num_input_channels,
            "num_output_channels": num_output_channels,
            "reverse_sample_rate": reverse_sample_rate,
            "num_reverse_channels": num_reverse_channels,
            "output_sample_rate": output_sample_rate,
        })

    def on_config(self, config) -> None:
        """WriteConfig (debug.proto Config): the full config snapshot.

        Stored both as a human-readable repr and as a JSON field dict
        (enums by value) for tooling."""
        self._events.append({
            "type": EVENT_CONFIG,
            "config_repr": repr(config),
            "config": json.dumps(
                dataclasses.asdict(config),
                default=lambda o: getattr(o, "value", str(o)),
            ),
        })

    def on_reverse_stream(self, render: np.ndarray) -> None:
        self._events.append({
            "type": EVENT_REVERSE_STREAM,
            "data": self._store(render),
        })

    def on_stream(self, capture_in: np.ndarray, capture_out: np.ndarray,
                  delay_ms: int, applied_input_volume: int,
                  keypress: bool = False) -> None:
        self._events.append({
            "type": EVENT_STREAM,
            "input": self._store(capture_in),
            "output": self._store(capture_out),
            "delay": int(delay_ms),
            "applied_input_volume": int(applied_input_volume),
            "keypress": bool(keypress),
        })

    def on_runtime_setting(self, setting_type: int, value) -> None:
        """WriteRuntimeSetting (debug.proto RuntimeSetting message)."""
        self._events.append({
            "type": EVENT_RUNTIME_SETTING,
            "setting_type": int(setting_type),
            "value": value if isinstance(value, (int, float, bool))
            else str(value),
        })

    def close(self) -> None:
        np.savez_compressed(
            self._path,
            __events__=np.frombuffer(
                json.dumps(self._events).encode(), np.uint8
            ),
            **self._arrays,
        )


def load_dump(path: str):
    """Returns (events list, arrays dict)."""
    z = np.load(path)
    events = json.loads(bytes(z["__events__"]).decode())
    arrays = {k: z[k] for k in z.files if k != "__events__"}
    return events, arrays


def replay(path: str, config=None, progress=None):
    """Replays a dump through a fresh AudioProcessing (audioproc_f analog).

    config: optional Config override (None uses the recorded CONFIG event).
    Returns a list of (recorded_output, replayed_output) frame pairs.
    """
    from webrtc_audio_processing_tpu import config as cfg_mod
    from webrtc_audio_processing_tpu.api import AudioProcessing

    events, arrays = load_dump(path)
    ap = None
    sample_rate = 16000
    pairs = []
    for ev in events:
        t = ev["type"]
        if t == EVENT_INIT:
            sample_rate = ev["sample_rate"]
        elif t == EVENT_CONFIG and ap is None and config is None:
            # Best-effort reconstruction from the JSON snapshot; enum
            # fields are rebuilt by value, unknown content falls back to
            # the defaults (pass `config` explicitly for exact replay).
            try:
                raw = json.loads(ev["config"])

                def build(cls, d):
                    defaults = cls()
                    kwargs = {}
                    for f in dataclasses.fields(cls):
                        if f.name not in d:
                            continue
                        v = d[f.name]
                        cur = getattr(defaults, f.name)
                        if dataclasses.is_dataclass(cur) and isinstance(
                            v, dict
                        ):
                            kwargs[f.name] = build(type(cur), v)
                        elif hasattr(type(cur), "__members__"):
                            kwargs[f.name] = type(cur)(v)
                        else:
                            kwargs[f.name] = v
                    return cls(**kwargs)

                config = build(cfg_mod.Config, raw)
            except Exception:
                config = None
        elif t == EVENT_REVERSE_STREAM:
            if ap is None:
                ap = AudioProcessing(config or cfg_mod.Config())
            ap.process_reverse_stream(arrays[ev["data"]], sample_rate)
        elif t == EVENT_STREAM:
            if ap is None:
                ap = AudioProcessing(config or cfg_mod.Config())
            ap.set_stream_delay_ms(ev["delay"])
            ap.set_stream_analog_level(ev["applied_input_volume"])
            err, out = ap.process_stream(arrays[ev["input"]], sample_rate)
            pairs.append((arrays[ev["output"]], np.asarray(out)))
            if progress:
                progress(len(pairs))
    return pairs
