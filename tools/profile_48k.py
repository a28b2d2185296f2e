"""Profile the 48 kHz stereo full-APM step on the attached TPU.

Runs one jitted 10-frame chunk at a given batch size under
jax.profiler.trace and prints the top device ops by total duration —
the tool used to find each round's HBM/VPU bottlenecks (PERF.md).

Usage: python tools/profile_48k.py [batch] [mode]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    mode = sys.argv[2] if len(sys.argv) > 2 else "48k_stereo"

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    init, pair_step, frame, cap_ch, ren_ch = bench.build_step(mode)
    init_one = init()
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), init_one
    )

    PAIRS = 5

    def chunk(s, frames, n0s):
        def body(carry, xs):
            fr, n0 = xs
            return jax.vmap(pair_step, in_axes=(0, 0, 0, 0, 0, None))(
                carry, fr[0], fr[1], fr[2], fr[3], n0
            )

        return jax.lax.scan(body, s, (frames, n0s))

    step = jax.jit(chunk, donate_argnums=(0,))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((PAIRS, 4, batch, frame, max(cap_ch, ren_ch)))
        .astype(np.float32)[:, :, :, :, :cap_ch]
        * 0.03
    )
    n0s = jnp.asarray(5 * np.arange(PAIRS), jnp.int32)

    state, y = step(state, frames, n0s)
    jax.block_until_ready(y)

    trace_dir = "/tmp/prof48"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        state, y = step(state, frames, n0s + 5 * PAIRS)
        jax.block_until_ready(y)

    # Parse the trace: sum device-op durations by name.
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found under", trace_dir)
        return
    by_name = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            # Device lanes only (skip python/host threads).
            name = ev.get("name", "")
            args = ev.get("args") or {}
            if "device_duration_ps" in args or "long_name" in args or (
                ev.get("pid") is not None and "tid" in ev
            ):
                pass
            cat = args.get("group_id")
            dur = ev.get("dur", 0) / 1e3  # us -> ms
            if not name or name.startswith("$") or name.startswith("Thread"):
                continue
            key = name.split(".")[0]
            by_name[key][0] += dur
            by_name[key][1] += 1
            total += dur
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])[:40]
    print(f"top ops by summed duration (ms) over one {PAIRS*2}-frame chunk, "
          f"batch={batch}:")
    for name, (dur, cnt) in rows:
        print(f"  {dur:9.3f} ms  x{cnt:<6d} {name[:100]}")
    print(f"total traced: {total:.1f} ms")


if __name__ == "__main__":
    main()
