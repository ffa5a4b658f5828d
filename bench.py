"""Headline benchmark: batched 1D C2C FFT on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <ratio>}

Headline config from BASELINE.json: fp32 C2C at (100000, 1024); baseline is
the reference's published GPU number for that shape (1.432 ms Mojo on an
RTX 5090, README.md:15-29 -> BASELINE.md). vs_baseline = baseline_ms / ours
(>1 means faster than the reference). Methodology mirrors fft/bench.mojo:
plan once, time execute+synchronize (here: block_until_ready).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


BATCH, N = 100_000, 1024
BASELINE_MS = 1.432  # reference Mojo GPU, same shape (BASELINE.md)
WARMUP, ITERS = 5, 30


def main() -> None:
    import tpufft
    from tpufft import SplitComplex

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    ar = jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)
    ai = jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)
    x = SplitComplex(ar, ai)

    plan = tpufft.plan_fft((BATCH, N), jnp.complex64, axes=(-1,))

    # correctness spot-check on a slice before timing
    small = SplitComplex(ar[:64], ai[:64])
    got = plan_small_out = tpufft.fft(small, axis=-1).numpy()
    ref = np.fft.fft(small.numpy())
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    if err > 1e-3:
        raise AssertionError(f"bench correctness check failed: err={err:.3e}")
    print(f"correctness err: {err:.3e}", file=sys.stderr)

    for _ in range(WARMUP):
        out = plan(x)
        out.re.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = plan(x)
        out.re.block_until_ready()
    ms = (time.perf_counter() - t0) / ITERS * 1e3

    flops = 5.0 * BATCH * N * np.log2(N)  # standard 5 N log2 N model
    gflops = flops / (ms * 1e-3) / 1e9
    gbps = (2 * 2 * 4 * BATCH * N) / (ms * 1e-3) / 1e9  # in+out, re+im, f32
    print(f"{ms:.3f} ms  {gflops:.0f} GFLOP/s  {gbps:.0f} GB/s(model)",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"1D C2C fp32 ({BATCH}, {N}) plan-execute",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
