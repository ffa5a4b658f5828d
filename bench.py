"""Headline benchmark: batched 1D C2C FFT on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <ratio>}

Headline config from BASELINE.json: fp32 C2C at (100000, 1024); baseline is
the reference's published GPU number for that shape (1.432 ms Mojo on an
RTX 5090, README.md:15-29 -> BASELINE.md). vs_baseline = baseline_ms / ours
(>1 means faster than the reference).

Methodology mirrors fft/bench.mojo (plan once, time execute+sync) adapted
to this environment: the dev tunnel has a large, variable host<->device RTT
(up to ~40 ms), so per-iteration sync would measure the tunnel, not the
chip — and RTT-subtraction silently under-reports any chain shorter than
the RTT (the round-4 protocol finding). Instead we time TWO back-to-back
CHAINED runs of k1 and k2 dispatches (each consumes the previous output,
so the device must execute them serially) and take the DIFFERENTIAL slope:
per_iter = (T2 - T1) / (k2 - k1), with (k2 - k1) * t >= ~0.25 s so the
slope is dominated by device time, not tunnel jitter.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BATCH, N = 100_000, 1024
BASELINE_MS = 1.432  # reference Mojo GPU, same shape (BASELINE.md)
CHAIN, REPEATS = 20, 5


def _sync(o):
    # scalar fetch forces completion (block_until_ready under-reports
    # through the axon tunnel)
    float(o.re[-1, -1])


def measure(plan, x) -> float:
    """Best per-iteration ms by DIFFERENTIAL chained timing: two
    back-to-back chains of CHAIN and 5*CHAIN dispatches; the slope
    (T2 - T1) / (4*CHAIN) cancels the tunnel RTT additively. The
    headline kernel's 4*CHAIN span is ~200 ms — far above the RTT
    drift that an RTT-subtraction protocol is exposed to (and sub-RTT
    chains are unusable outright: the device work hides entirely
    inside the round-trip window)."""
    out = plan(x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(8):
        float(out.re[0, 0])
    rtt = (time.perf_counter() - t0) / 8
    print(f"tunnel RTT: {rtt*1e3:.2f} ms", file=sys.stderr)

    def chain(k):
        o = x
        t0 = time.perf_counter()
        for _ in range(k):
            o = plan(o)
        _sync(o)
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(REPEATS):
        t1 = chain(CHAIN)
        t2 = chain(5 * CHAIN)
        best = min(best, (t2 - t1) / (4 * CHAIN))
    return best * 1e3


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

    # correctness spot-check against the host oracle on a few rows
    out = plan(x)
    got = np.asarray(out.re[:4]) + 1j * np.asarray(out.im[:4])
    ref = np.fft.fft(np.asarray(ar[:4]) + 1j * np.asarray(ai[:4]))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    if err > 1e-3:
        raise AssertionError(f"bench correctness check failed: err={err:.3e}")
    print(f"correctness err: {err:.3e}", file=sys.stderr)

    ms = measure(plan, x)

    flops = 5.0 * BATCH * N * np.log2(N)  # standard 5 N log2 N model
    gflops = flops / (ms * 1e-3) / 1e9
    gbps = (2 * 2 * 4 * BATCH * N) / (ms * 1e-3) / 1e9  # in+out, re+im, f32
    print(f"{ms:.3f} ms/iter  {gflops:.0f} GFLOP/s  {gbps:.0f} GB/s(model)",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"1D C2C fp32 ({BATCH}, {N}) plan-execute",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
