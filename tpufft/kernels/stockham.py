"""Fused batch-minor Stockham FFT kernel (Pallas TPU).

Placeholder that signals fallback until the fused kernel lands; the XLA path
in core.py executes the identical stage schedule.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PlanConfig


def fft_axis_pallas(
    x: jnp.ndarray,
    axis: int,
    bases: tuple[int, ...],
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> jnp.ndarray:
    raise NotImplementedError("pallas stockham kernel not yet implemented")
