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

    # Match bench.py's CHUNK_PAIRS so the jitted chunk hits the persistent
    # compilation cache entry from a prior bench run (the scan length is
    # part of the cache key; a fresh 48 kHz compile through the remote
    # attachment takes ~20 min).
    PAIRS = 25

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

    # Parse the xplane proto: the remote attachment's chrome-trace export
    # omits device ops, but the XSpace TPU plane has every op with its
    # duration and jax source line.
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane file found under", trace_dir)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if "TPU" in p.name]
    if not planes:
        print("no TPU plane in xplane; planes:",
              [p.name for p in xs.planes])
        return
    plane = planes[0]
    emeta = plane.event_metadata
    smeta = plane.stat_metadata
    src = {}
    for mid, md in emeta.items():
        for st in md.stats:
            if smeta[st.metadata_id].name == "source":
                src[mid] = st.str_value or (
                    st.ref_value and smeta[st.ref_value].name
                ) or ""
    by_name = defaultdict(lambda: [0.0, 0])
    by_src = defaultdict(float)
    by_file = defaultdict(float)
    total = 0.0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = emeta[ev.metadata_id].name
            if name.startswith("%while"):
                continue  # wrappers: their bodies are counted individually
            dur = ev.duration_ps / 1e9  # ps -> ms
            by_name[name.split(" = ")[0]][0] += dur
            by_name[name.split(" = ")[0]][1] += 1
            s = src.get(ev.metadata_id, "?")
            tail = s.rsplit("/", 1)[-1] if s else "?"
            by_src[tail] += dur
            by_file[tail.split(":")[0]] += dur
            total += dur
    print(f"device total {total:.1f} ms over one {PAIRS*2}-frame chunk, "
          f"batch={batch}")
    print("\nby source file:")
    for k, v in sorted(by_file.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v:8.1f} ms  {k}")
    print("\ntop 40 source lines:")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {v:8.2f} ms  {k}")
    print("\ntop 30 ops:")
    for name, (dur, cnt) in sorted(
        by_name.items(), key=lambda kv: -kv[1][0]
    )[:30]:
        print(f"  {dur:9.3f} ms x{cnt:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
