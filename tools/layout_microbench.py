"""Microbenchmark: TPU tile-padding cost of per-stream minor-dim layouts.

TPU stores the last two dims of every materialized array padded to (8,128)
tiles. Per-stream AEC3 buffers shaped (B, ..., 2, 65) could therefore cost
up to 8x their logical bytes in HBM storage and bandwidth. This tool
measures the real multipliers on the attached chip.

Methodology: in-jit scan loops with output fed back into the carry
(serialized, nothing folds), and working sets sized well beyond VMEM
(~128 MB on v5e) so the carry actually lives in HBM — small carries stay
VMEM-resident across scan iterations and measure VMEM, not HBM.

Usage: python tools/layout_microbench.py
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

ITERS = 50


def bench(fn, *args):
    """fn(*args) -> tuple with the same shapes as args (ping-pong carry)."""
    import jax

    def looped(*a):
        def body(carry, _):
            return fn(*carry), ()

        carry, _ = jax.lax.scan(body, a, None, length=ITERS)
        return carry[0]

    def looped_sum(*a):
        # Scalar readback is the sync barrier: block_until_ready through
        # the remote attachment can return spuriously early, a
        # device->host copy cannot.
        return jax.numpy.float32(0) + looped(*a).ravel()[:8].sum()

    f = jax.jit(looped_sum)
    float(f(*args))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        dts.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(dts)) * 1e3  # ms per iteration


def main():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    P, R, K = 13, 2, 65

    # 1. Elementwise axpy on the same logical data, layouts vary.
    BE = 32768  # 221 MB logical per pair of operands
    shapes = [
        (BE, P, R, K),        # today: minor (2,65) -> 7.9x pad
        (BE, P, R * K),       # (13,130) -> 2.4x
        (BE, P * R, K),       # (26,65) -> 2.4x
        (BE, P * R * K),      # flat (B,1690) -> ~1x
    ]
    print(f"elementwise axpy (read 2, write 1), B={BE}:")
    for s in shapes:
        x, y = mk(s), mk(s)
        ms = bench(lambda a, b: (a * 1.0001 + b, a), x, y)
        mb = np.prod(s) * 4 * 3 / 1e6
        print(f"  {str(s):24s} {ms:7.3f} ms  logical {mb:5.0f} MB"
              f" -> {mb/ms:6.0f} GB/s", flush=True)

    # 2. apply+adapt on H: the subtractor's H-traffic pattern.
    B, C = 8192, 2  # H planes 2x110 MB

    def apply_adapt_cplx(Xr, Xi, Hr, Hi):
        X = (Xr + 1j * Xi).reshape(B, P, R, K)
        H = (Hr + 1j * Hi).reshape(B, C, P, R, K)
        S = jnp.einsum("bprk,bcprk->bck", X, H)
        nH = H + 1e-12 * X[:, None] * S.mean(-1)[:, :, None, None, None]
        F = R * K
        return (Xr + 1e-12 * S.real.mean(1)[:, None, :].repeat(
                    P, 1).reshape(B, P, F),
                Xi,
                nH.real.reshape(B, C, P, F), nH.imag.reshape(B, C, P, F))

    def apply_adapt_planar(Xr, Xi, Hr, Hi):
        Sr = (jnp.einsum("bpf,bcpf->bcf", Xr, Hr)
              - jnp.einsum("bpf,bcpf->bcf", Xi, Hi))
        Si = (jnp.einsum("bpf,bcpf->bcf", Xr, Hi)
              + jnp.einsum("bpf,bcpf->bcf", Xi, Hr))
        nHr = Hr + 1e-12 * Xr[:, None] * Sr[:, :, None]
        nHi = Hi + 1e-12 * Xi[:, None] * Si[:, :, None]
        return (Xr + 1e-12 * Sr.mean(1)[:, None], Xi, nHr, nHi)

    Xr, Xi = mk((B, P, R * K)), mk((B, P, R * K))
    Hr, Hi = mk((B, C, P, R * K)), mk((B, C, P, R * K))
    hmb = 2 * B * C * P * R * K * 4 / 1e6
    ms = bench(apply_adapt_cplx, Xr, Xi, Hr, Hi)
    print(f"\napply+adapt complex (B,C,P,R,K):     {ms:7.3f} ms"
          f"  (H logical {hmb:.0f} MB r+w -> {2*hmb/ms:.0f} GB/s)",
          flush=True)
    ms = bench(apply_adapt_planar, Xr, Xi, Hr, Hi)
    print(f"apply+adapt planar (B,C,P,130):      {ms:7.3f} ms"
          f"  ({2*hmb/ms:.0f} GB/s)", flush=True)

    # flat H: (B, C*P*F) with in-kernel reshape round-trip
    Hfr = mk((B, C * P * R * K))
    Hfi = mk((B, C * P * R * K))

    def apply_adapt_flat(Xr, Xi, Hfr, Hfi):
        F = R * K
        Hr = Hfr.reshape(B, C, P, F)
        Hi = Hfi.reshape(B, C, P, F)
        Sr = (jnp.einsum("bpf,bcpf->bcf", Xr, Hr)
              - jnp.einsum("bpf,bcpf->bcf", Xi, Hi))
        Si = (jnp.einsum("bpf,bcpf->bcf", Xr, Hi)
              + jnp.einsum("bpf,bcpf->bcf", Xi, Hr))
        nHr = Hr + 1e-12 * Xr[:, None] * Sr[:, :, None]
        nHi = Hi + 1e-12 * Xi[:, None] * Si[:, :, None]
        return (Xr + 1e-12 * Sr.mean(1)[:, None], Xi,
                nHr.reshape(B, -1), nHi.reshape(B, -1))

    ms = bench(apply_adapt_flat, Xr, Xi, Hfr, Hfi)
    print(f"apply+adapt flat-stored (B,6760):    {ms:7.3f} ms"
          f"  ({2*hmb/ms:.0f} GB/s)", flush=True)

    # 3. where-overwrite of one partition (the constrain write pattern).
    pc_oh = jnp.asarray(np.arange(P) == 4)

    def constrain_cplx(Hr, Hi, nr, ni):
        H = (Hr + 1j * Hi).reshape(B, C, P, R, K)
        new = (nr + 1j * ni).reshape(B, C, R, K)
        H2 = jnp.where(pc_oh[None, None, :, None, None], new[:, :, None], H)
        return (H2.real.reshape(B, C, P, R * K),
                H2.imag.reshape(B, C, P, R * K),
                nr + 1e-12 * H2.real.mean((2, 3)).reshape(B, C, 1) *
                jnp.ones_like(nr), ni)

    def constrain_planar(Hr, Hi, nr, ni):
        H2r = jnp.where(pc_oh[None, None, :, None], nr[:, :, None], Hr)
        H2i = jnp.where(pc_oh[None, None, :, None], ni[:, :, None], Hi)
        return (H2r, H2i,
                nr + 1e-12 * H2r.mean(2), ni)

    nr, ni = mk((B, C, R * K)), mk((B, C, R * K))
    ms = bench(constrain_cplx, Hr, Hi, nr, ni)
    print(f"\nconstrain-where complex:             {ms:7.3f} ms"
          f"  ({2*hmb/ms:.0f} GB/s)", flush=True)
    ms = bench(constrain_planar, Hr, Hi, nr, ni)
    print(f"constrain-where planar:              {ms:7.3f} ms"
          f"  ({2*hmb/ms:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
