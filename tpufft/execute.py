"""Backend dispatch and launch-config model (split-plane contract).

The TPU-native counterpart of the reference's per-dim scheduling
(``_run_gpu_nd_fft`` orchestration, fft/fft/_ndim_fft_gpu.mojo:462-642, and
the ``_GPUExecConfig`` occupancy model at :38-137): for each transformed axis
decide between

  * the fused MXU Pallas kernel (the whole axis's transform as dense
    DFT-matrix matmuls in VMEM — kernels/mxu_fft.py), and
  * the pure-XLA jnp path (the analog of its global-memory fallback; also
    the f64 and large/prime-length path).

All data moves through this layer as split real/imag float planes (see
core.SplitComplex) because TPU has no complex arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import core
from .config import PlanConfig
from .kernels import mxu_fft

__all__ = ["fft_axis", "pallas_supported", "choose_lane_block"]

choose_lane_block = mxu_fft.choose_lane_block


def _is_tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - defensive
        return False


def pallas_supported(n: int, dtype, cfg: PlanConfig) -> bool:
    """Can this axis run in the fused MXU kernel?"""
    if cfg.backend == "xla":
        return False
    if not (cfg.interpret or _is_tpu_backend()):
        return False
    return mxu_fft.pallas_supported(n, dtype, cfg)


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
    if pallas_supported(n, ar.dtype, config) and config.backend in (
        "auto", "pallas",
    ):
        try:
            return mxu_fft.fft_axis_pallas(
                ar, ai, axis, bases, inverse=inverse, scale=scale,
                config=config,
            )
        except NotImplementedError:
            if config.backend == "pallas":
                raise
    elif config.backend == "pallas":
        raise ValueError(
            f"backend='pallas' requested but axis length {n} (dtype "
            f"{ar.dtype}) is not supported by the fused kernel; use "
            "backend='auto' for automatic fallback"
        )
    return core.fft_along_axis(
        ar, ai, axis, bases, inverse=inverse, scale=scale
    )
