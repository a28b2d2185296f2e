#!/usr/bin/env python
"""Batched multi-stream serving example.

Runs N independent APM streams as one vmapped device program — the
TPU-native serving model: per-stream state is a pytree batched on the
leading axis, frames arrive as (N, frame, ch) arrays, and one jitted step
advances every stream. With --mesh the stream axis is sharded over all
available devices (`jax.sharding.Mesh`), which is the whole multi-chip
story for this workload: streams are independent, so scaling is pure
batch-axis sharding with no collectives in the math.

Usage:
  python examples/serve_batch.py [--streams 64] [--frames 100]
      [--rate 16000] [--mesh]
CPU smoke test:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python examples/serve_batch.py --streams 8 --frames 20
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--rate", type=int, default=16000)
    ap.add_argument("--channels", type=int, default=1)
    ap.add_argument("--mesh", action="store_true",
                    help="shard the stream axis over all devices")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from webrtc_audio_processing_tpu import apm, config as cfg_mod
    from webrtc_audio_processing_tpu.utils import complex_boundary as cb

    c = cfg_mod.Config().replace(
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
        gain_controller2=cfg_mod.GainController2(
            enabled=True,
            adaptive_digital=cfg_mod.AdaptiveDigital(enabled=True),
        ),
    )
    geo = apm.ApmGeometry.create(
        c, args.rate, args.channels,
        render_input_rate=args.rate, num_render_channels=args.channels,
    )
    frame = args.rate // 100
    zero = jnp.asarray(0, jnp.int32)

    def pair_step(state, r0, c0, r1, c1, n0):
        state = cb.decode(state)
        state, _y0, _r, _s = apm.process_stream_pair(
            geo, state, c0, r0, 0, stream_delay_ms=zero,
            applied_input_volume=zero, n0=n0,
        )
        state, y1, _r, _s = apm.process_stream_pair(
            geo, state, c1, r1, 1, stream_delay_ms=zero,
            applied_input_volume=zero, n0=n0 + 2,
        )
        return cb.encode(state), y1

    n = args.streams
    init_one = cb.init_encoded(lambda: apm.init_state(geo))
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), init_one
    )

    step = jax.jit(
        jax.vmap(pair_step, in_axes=(0, 0, 0, 0, 0, None)),
        donate_argnums=(0,),
    )

    if args.mesh:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = np.array(jax.devices())
        mesh = Mesh(devices, ("streams",))
        shard = NamedSharding(mesh, P("streams"))
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P("streams", *([None] * (x.ndim - 1))))),
            state,
        )
        print(f"sharding {n} streams over {len(devices)} devices")

    rng = np.random.default_rng(0)
    t0 = time.time()
    processed = None
    for k in range(0, args.frames, 2):
        r0, c0, r1, c1 = (
            jnp.asarray(rng.standard_normal(
                (n, frame, args.channels)).astype(np.float32) * 1000)
            for _ in range(4)
        )
        n0 = jnp.asarray(5 * (k // 2), jnp.int32)
        state, processed = step(state, r0, c0, r1, c1, n0)
    jax.block_until_ready(processed)
    dt = time.time() - t0
    audio_s = args.frames * 0.010 * n
    print(f"{n} streams x {args.frames} frames: {dt:.2f}s wall "
          f"({audio_s / dt:.0f}x real-time aggregate, first-call compile "
          "included)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
