"""Fused batch-minor Stockham FFT kernel (Pallas TPU), split re/im planes.

Placeholder that signals fallback until the fused kernel lands; the XLA path
in core.py executes the identical stage schedule.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PlanConfig


def fft_axis_pallas(
    ar: jnp.ndarray,
    ai: jnp.ndarray | None,
    axis: int,
    bases: tuple[int, ...],
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    raise NotImplementedError("pallas stockham kernel not yet implemented")
