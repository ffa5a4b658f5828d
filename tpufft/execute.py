"""Backend dispatch and launch-config model (split-plane contract).

The TPU-native counterpart of the reference's per-dim scheduling
(``_run_gpu_nd_fft`` orchestration, fft/fft/_ndim_fft_gpu.mojo:462-642, and
the ``_GPUExecConfig`` occupancy model at :38-137): for each transformed axis
decide between

  * the fused Pallas kernel (all Stockham stages of that axis in VMEM —
    the analog of the reference's shared-memory-resident kernel), and
  * the pure-XLA jnp path (the analog of its global-memory fallback).

The decision is a VMEM-budget cost model instead of a shared-memory/occupancy
model. All data moves through this layer as split real/imag float planes
(see core.SplitComplex) because TPU has no complex arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import core
from .config import PlanConfig

__all__ = ["fft_axis", "pallas_supported", "choose_lane_block"]

_LANE = 128          # TPU lane width
_SUBLANE_F32 = 8     # f32 sublane tile


def _is_tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - defensive
        return False


def choose_lane_block(n: int, cfg: PlanConfig) -> int:
    """Pick B, the lane-axis width of the in-kernel (N, B) state block.

    VMEM must hold: input block (N,B) re+im, output block re+im, plus one
    ping-pong scratch pair and stage tables (~N*stages elements). Aim for
    roughly cfg.vmem_budget_bytes over ~6 (N,B) f32 planes.
    """
    if cfg.lane_block is not None:
        return cfg.lane_block
    planes = 6
    per_lane = n * 4 * planes
    b = cfg.vmem_budget_bytes // max(per_lane, 1)
    b = max(_LANE, min(2048, (b // _LANE) * _LANE))
    return b


def pallas_supported(n: int, bases: tuple[int, ...], cfg: PlanConfig) -> bool:
    """Can this axis run in the fused-VMEM Pallas kernel?"""
    if cfg.backend == "xla":
        return False
    if not (cfg.interpret or _is_tpu_backend()):
        return False
    b = choose_lane_block(n, cfg)
    working = 6 * n * b * 4
    if working > cfg.vmem_budget_bytes * 2:
        return False
    return n >= 2


def fft_axis(
    ar: jnp.ndarray,
    ai: jnp.ndarray | None,
    axis: int,
    bases: tuple[int, ...],
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Transform one axis of the split planes, choosing the best backend."""
    n = ar.shape[axis]
    use_pallas = pallas_supported(n, bases, config) and config.backend in (
        "auto", "pallas",
    )
    if use_pallas:
        from .kernels import stockham as _stockham

        try:
            return _stockham.fft_axis_pallas(
                ar, ai, axis, bases, inverse=inverse, scale=scale,
                config=config,
            )
        except NotImplementedError:
            if config.backend == "pallas":
                raise
    if config.backend == "pallas":
        raise ValueError(
            f"backend='pallas' requested but axis length {n} is not "
            "supported by the fused kernel (exceeds the VMEM model); use "
            "backend='auto' for automatic fallback"
        )
    return core.fft_along_axis(
        ar, ai, axis, bases, inverse=inverse, scale=scale
    )
