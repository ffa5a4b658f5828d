"""Profiler harness (role of the reference's fft/profile.mojo + nsys/ncu
pixi tasks): capture a trace of one device-saturating workload for
xprof/TensorBoard, or print a simple stage-cost breakdown.

Usage:
  python profile.py               # timing breakdown (tunnel-robust mins)
  python profile.py --trace DIR   # jax.profiler trace into DIR
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

SHAPE = (100_000, 1024)  # saturating workload, headline shape


def _sync(o):
    float(o.re[-1, -1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace (xprof)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import tpufft
    from tpufft import SplitComplex, PlanConfig

    rng = np.random.default_rng(0)
    x = SplitComplex(
        jnp.asarray(rng.standard_normal(SHAPE), jnp.float32),
        jnp.asarray(rng.standard_normal(SHAPE), jnp.float32),
    )

    variants = {
        "fused-bf16x3": PlanConfig(),
        "fused-highest": PlanConfig(precision="highest"),
        "fused-bf16-planes": PlanConfig(plane_dtype="bfloat16"),
        "xla-fallback": PlanConfig(backend="xla"),
    }
    plans = {
        name: tpufft.plan_fft(SHAPE, jnp.complex64, axes=(-1,), config=cfg)
        for name, cfg in variants.items()
    }

    for name, plan in plans.items():
        _sync(plan(x))  # compile + warm

    if args.trace:
        with jax.profiler.trace(args.trace):
            for plan in plans.values():
                _sync(plan(x))
        print(f"trace written to {args.trace} (open with tensorboard "
              f"--logdir {args.trace})", file=sys.stderr)
        return

    for name, plan in plans.items():
        # differential chained timing (same method as bench.py): two
        # back-to-back chains, slope = (T2 - T1) / dK. The tunnel RTT
        # (25-40 ms, drifting) cancels additively; chains shorter than
        # the RTT are unusable — the device work hides inside the
        # round-trip window and subtraction protocols read near-zero.
        _sync(plan(x))

        def chain(k):
            o = x
            t0 = time.perf_counter()
            for _ in range(k):
                o = plan(o)
            _sync(o)
            return time.perf_counter() - t0

        best = float("inf")
        for _ in range(3):
            t1 = chain(args.iters)
            t2 = chain(5 * args.iters)
            best = min(best, (t2 - t1) / (4 * args.iters))
        ms = best * 1e3
        gbps = (2 * 2 * 4 * SHAPE[0] * SHAPE[1]) / (ms * 1e-3) / 1e9
        print(f"{name:16s}: {ms:8.3f} ms  {gbps:5.0f} GB/s(model)")


if __name__ == "__main__":
    main()
