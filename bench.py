"""Benchmark: concurrent real-time streams per chip for the full APM.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline config is the BASELINE.md north star: **48 kHz stereo full APM**
(3-band QMF split + multichannel AEC3 + NS + AGC2 incl. RNN-VAD + HPF,
driven through apm.process_stream_pair — the same pure step the public API
uses). Secondary: the 16 kHz mono chain measured in round 1. vs_baseline
is against the north-star target of 10,000 concurrent real-time 48 kHz
stereo streams/chip (BASELINE.json; the reference publishes no numbers —
it is a single-stream real-time library, one stream per core).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

NORTH_STAR_STREAMS = 10000.0

# Persistent compilation cache: the remote TPU attachment compiles these
# programs in minutes; cached reruns start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

MODES = {
    # mode: (rate, capture_ch, render_ch, max_internal_rate)
    "48k_stereo": (48000, 2, 2, 48000),
    "16k_mono": (16000, 1, 1, 32000),
}


def build_step(mode):
    """Full-APM paired step (render + capture) for one stream.

    Returns (init_encoded_state, pair_step) where pair_step advances two
    frames (parity 0 then 1) so the AEC3 80<->64 rebuffering cadence stays
    static (5 blocks per 2 frames).
    """
    import jax
    import jax.numpy as jnp

    from webrtc_audio_processing_tpu import apm, config as cfg_mod
    from webrtc_audio_processing_tpu.utils import carry_pack
    from webrtc_audio_processing_tpu.utils import complex_boundary as cb

    rate, cap_ch, ren_ch, max_internal = MODES[mode]

    c = cfg_mod.Config().replace(
        pipeline=cfg_mod.Pipeline(
            multi_channel_capture=cap_ch > 1,
            multi_channel_render=ren_ch > 1,
            maximum_internal_processing_rate=max_internal,
        ),
        high_pass_filter=cfg_mod.HighPassFilter(enabled=True),
        echo_canceller=cfg_mod.EchoCanceller(enabled=True),
        noise_suppression=cfg_mod.NoiseSuppression(enabled=True),
        gain_controller2=cfg_mod.GainController2(
            enabled=True,
            adaptive_digital=cfg_mod.AdaptiveDigital(enabled=True),
        ),
    )
    # aec3_stereo_content: for the stereo mode, measure the full
    # multichannel AEC3 (the post-detection steady state, the north-star
    # config) rather than the cheaper pre-detection mono-downmix phase.
    # BENCH_RING_DTYPE=bfloat16 selects the bf16 render-ring serving mode
    # (halves the dominant per-stream HBM state; echo-reduction floor at
    # the bf16 mantissa SNR — see PERF.md). The headline stays float32.
    geo = apm.ApmGeometry.create(
        c, rate, cap_ch,
        render_input_rate=rate, num_render_channels=ren_ch,
        aec3_stereo_content=ren_ch > 1,
        aec3_ring_dtype=os.environ.get("BENCH_RING_DTYPE", "float32"),
    )

    # NOTE on carry packing (utils/carry_pack.py): packing the state's
    # small leaves into dense vectors at this scan boundary was measured
    # on-device and REGRESSES badly — tiny-leaf pack (max_elems=16):
    # 752 ms vs 407 ms per 50-frame chunk at B=1024 (the ~400 concat/
    # slice ops cost far more than the ~150 while-carry copies they
    # replace). Keep the plain carry here; the codec remains available
    # for state serialization use cases.
    del carry_pack

    def init():
        return cb.init_encoded(lambda: apm.init_state(geo))

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
        return cb.encode(state), y1[..., 0]

    frame = rate // 100
    return init, pair_step, frame, cap_ch, ren_ch


def _hint_batches(mode, default):
    """Batch-size measurement order from BENCH_HINT.json.

    The axon attachment does not support the persistent compilation cache
    (each jitted (mode, batch) pair costs a fresh multi-minute compile),
    so the driver's fixed time budget affords very few batch sizes. The
    hint file — updated whenever the in-session bench finds a better
    operating point — puts the known-best batch first so a single compile
    already records the right headline; larger candidates follow and only
    run if budget remains.
    """
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_HINT.json")) as f:
            hint = json.load(f)[mode]
        best = int(hint["best_n"])
        after = [n for n in (best * 2, best * 4) if n <= 16384]
        before = [n for n in default if n not in (best, *after)]
        return (best, *after, *before)
    except Exception:
        return default


def measure_streams(mode, budget_s, batch_sizes):
    import jax
    import jax.numpy as jnp

    init, pair_step, frame, cap_ch, ren_ch = build_step(mode)

    rng = np.random.default_rng(0)
    # 50 frames (500 ms of audio) per device dispatch: the remote TPU
    # attachment costs ~30 ms of round-trip latency per synchronized call,
    # so short chunks measure the tunnel, not the chip.
    CHUNK_PAIRS = 25

    def throughput(n_streams):
        """Wall seconds per 10 ms frame for `n_streams`: scan-carried state
        over frame chunks (amortizes dispatch), two chunks in flight
        (overlaps tunnel latency with device execution)."""
        init_one = init()
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape), init_one
        )

        def chunk(s, frames, n0s):
            # n0s: (CHUNK_PAIRS,) batch-uniform AEC3 block ordinals, one per
            # pair; unbatched under vmap so ring writes stay batch-uniform.
            def body(carry, xs):
                fr, n0 = xs
                return jax.vmap(
                    pair_step, in_axes=(0, 0, 0, 0, 0, None)
                )(carry, fr[0], fr[1], fr[2], fr[3], n0)

            return jax.lax.scan(body, s, (frames, n0s))

        step = jax.jit(chunk, donate_argnums=(0,))
        ren = rng.standard_normal(
            (CHUNK_PAIRS, 2, n_streams, frame, ren_ch)
        ).astype(np.float32) * 0.03
        cap = rng.standard_normal(
            (CHUNK_PAIRS, 2, n_streams, frame, cap_ch)
        ).astype(np.float32) * 0.03
        # (pairs, [r0 c0 r1 c1], n, frame, ch)
        frames = jnp.asarray(
            np.stack([ren[:, 0], cap[:, 0], ren[:, 1], cap[:, 1]], axis=1)
        )

        def n0s_for(chunk_idx):
            base = 5 * CHUNK_PAIRS * chunk_idx
            return jnp.asarray(base + 5 * np.arange(CHUNK_PAIRS), jnp.int32)

        state, y = step(state, frames, n0s_for(0))
        jax.block_until_ready(y)
        # Median of repeats: the remote attachment has intermittent
        # multi-second stalls (inflating a reading) AND occasional
        # spuriously-fast returns from block_until_ready through the
        # tunnel (deflating one) — the median rejects both.
        dts = []
        for rep in range(5):
            t0 = time.perf_counter()
            n_inflight = 2
            for j in range(n_inflight):
                state, y = step(state, frames, n0s_for(rep * 8 + j + 1))
            jax.block_until_ready(y)
            dts.append(
                (time.perf_counter() - t0) / (2 * CHUNK_PAIRS * n_inflight)
            )
        return float(np.median(dts))

    t_start = time.perf_counter()
    best_streams = 0
    results = {}
    min_failed_n = None
    for n in batch_sizes:
        if best_streams and time.perf_counter() - t_start > budget_s:
            print(f"# [{mode}] budget exhausted before n={n}",
                  file=sys.stderr)
            break
        if min_failed_n is not None and n >= min_failed_n:
            print(f"# [{mode}] n={n} skipped (>= failed n={min_failed_n})",
                  file=sys.stderr)
            continue
        try:
            dt = throughput(n)
        except Exception as e:
            print(f"# [{mode}] n={n} failed: {e}", file=sys.stderr)
            # e.g. OOM at large n — smaller candidates may still fit, but
            # anything at least this large will fail again and each doomed
            # attempt burns a multi-minute compile (no persistent cache on
            # the attachment).
            min_failed_n = n if min_failed_n is None else min(min_failed_n, n)
            continue
        streams = int(n * min(0.010 / dt, 1.0))
        results[n] = dt
        print(f"# [{mode}] n={n}: {dt*1e3:.2f} ms/frame -> {streams} "
              "rt streams", file=sys.stderr)
        if streams <= best_streams * 0.9:
            break
        best_streams = max(best_streams, streams)
    return best_streams, results


def _wait_for_device(max_wait_s: float) -> bool:
    """The axon TPU tunnel has hour-scale outages; probe in a subprocess
    (a failed in-process init can poison the jax backend cache) and wait
    up to max_wait_s before measuring."""
    import subprocess

    deadline = time.perf_counter() + max_wait_s
    while True:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=180,
        )
        if probe.returncode == 0:
            return True
        if time.perf_counter() >= deadline:
            print("# device unavailable after wait", file=sys.stderr)
            return False
        print("# device unavailable; retrying", file=sys.stderr)
        time.sleep(60)


def main():
    budget_s = float(os.environ.get("BENCH_TIME_BUDGET_S", "900"))
    mode = os.environ.get("BENCH_MODE", "both")
    _wait_for_device(max_wait_s=min(600.0, budget_s * 0.3))
    t0 = time.perf_counter()

    headline = 0
    secondary = None
    try:
        if mode in ("both", "48k_stereo"):
            headline, _ = measure_streams(
                "48k_stereo", budget_s * 0.75,
                _hint_batches("48k_stereo", (512, 1024, 2048, 4096, 8192)),
            )
        if mode in ("both", "16k_mono"):
            remaining = budget_s - (time.perf_counter() - t0)
            if mode == "16k_mono" or remaining > 120:
                secondary, _ = measure_streams(
                    "16k_mono", max(remaining, 60),
                    _hint_batches("16k_mono", (1024, 4096, 8192, 16384)),
                )
    except Exception as e:  # always emit the JSON line for the driver
        print(f"# bench failed: {e}", file=sys.stderr)

    out = {
        "metric": "real-time 48 kHz stereo full-APM streams per chip "
                  "(3-band QMF + multichannel AEC3 + NS + AGC2/RNN-VAD, "
                  "10 ms frames)",
        "value": headline,
        "unit": "streams",
        "vs_baseline": headline / NORTH_STAR_STREAMS,
    }
    if secondary is not None:
        out["secondary_16k_mono_streams"] = secondary
    print(json.dumps(out))


if __name__ == "__main__":
    main()
