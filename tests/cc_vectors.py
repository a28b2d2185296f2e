"""Extract reference-committed test vectors from the reference unittests.

The reference hard-codes its bit-exactness goldens as C float/int arrays
inside TEST bodies (e.g. `kOutputReference` in gain_control_unittest.cc,
high_pass_filter_unittest.cc — helpers tests/test_utils/
bitexactness_tools.cc:15-45). Parsing them at test time keeps the numbers
reference-owned: these tests assert against the reference's own values,
not against oracles written in this repo.
"""

from __future__ import annotations

import re

import numpy as np

REF = "/root/reference"
RES = f"{REF}/tests/resources"

_TEST_RE = re.compile(
    r"TEST(?:_F|_P)?\(\s*(\w+)\s*,\s*(\w+)\s*\)\s*{", re.S
)
_ARRAY_RE = re.compile(
    r"const\s+(float|int16_t|int)\s+(\w+)\s*\[\]\s*=\s*{(.*?)}\s*;", re.S
)
_SCALAR_RE = re.compile(
    r"const\s+(?:int|float)\s+(\w+)\s*=\s*([-\d.ef]+)\s*;"
)


def _block(src: str, start: int) -> str:
    """Brace-matched TEST body starting at the '{' at `start`."""
    depth = 0
    for i in range(start, len(src)):
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
            if depth == 0:
                return src[start:i + 1]
    return src[start:]


def parse_tests(path: str) -> dict:
    """Returns {test_name: {"arrays": {name: np.ndarray},
    "scalars": {name: value}}} for each TEST in the file."""
    src = open(path).read()
    out = {}
    for m in _TEST_RE.finditer(src):
        name = m.group(2)
        body = _block(src, m.end() - 1)
        arrays = {}
        for am in _ARRAY_RE.finditer(body):
            ctype, aname, vals = am.groups()
            nums = [
                float(v.rstrip("f"))
                for v in re.split(r"[,\s]+", vals.strip()) if v
            ]
            arrays[aname] = np.asarray(
                nums, np.float32 if ctype == "float" else np.int32
            )
        scalars = {}
        for sm in _SCALAR_RE.finditer(body):
            sname, sval = sm.groups()
            scalars[sname] = float(sval.rstrip("f")) if (
                "." in sval or "e" in sval or "f" in sval
            ) else int(sval)
        out[name] = {"arrays": arrays, "scalars": scalars}
    return out


def read_stereo_pcm_frames(path: str, samples_per_channel: int,
                           num_channels: int, num_frames: int) -> np.ndarray:
    """ReadFloatSamplesFromStereoFile (bitexactness_tools.cc:60-78):
    int16 interleaved stereo -> float [-1, 1), first `num_channels` kept.
    Returns (num_frames, samples_per_channel, num_channels)."""
    raw = np.fromfile(path, "<i2",
                      count=samples_per_channel * 2 * num_frames)
    raw = raw.reshape(-1, 2)[:, :num_channels].astype(np.float32) / 32768.0
    n = raw.shape[0] // samples_per_channel
    return raw[: n * samples_per_channel].reshape(
        n, samples_per_channel, num_channels
    )


def render_file(rate: int) -> str:
    return f"{RES}/far{rate // 1000}_stereo.pcm"


def capture_file(rate: int) -> str:
    return f"{RES}/near{rate // 1000}_stereo.pcm"
