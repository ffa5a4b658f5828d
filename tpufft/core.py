"""Pure-jnp (XLA) Stockham execution path.

Plays the role the reference's CPU backend plays for its GPU backend
(``fft/fft/_ndim_fft_cpu.mojo``): a portable implementation of the same
stage schedule that (a) serves as the correctness oracle for the Pallas
kernels, (b) runs anywhere (CPU CI, interpret-free), and (c) is the fallback
execution path when a dimension does not fit the fused-VMEM kernel.

Everything here is ordinary jnp traced under ``jax.jit``: the stage loop is a
Python loop over a statically known schedule (the analog of the reference's
comptime-unrolled stages), so XLA sees a flat chain of einsum/multiply/reshape
ops, fuses the twiddle multiplies into the contractions, and constant-folds
the embedded tables.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .planner import stage_schedule
from .twiddle import stage_tables

__all__ = [
    "complex_dtype_for",
    "real_dtype_for",
    "stockham_last_axis",
    "fft_along_axis",
]


def complex_dtype_for(dtype) -> jnp.dtype:
    """Complex result dtype for a given input dtype (f32->c64, f64->c128)."""
    d = jnp.dtype(dtype)
    if d in (jnp.dtype(jnp.complex64), jnp.dtype(jnp.complex128)):
        return d
    if d == jnp.dtype(jnp.float64):
        return jnp.dtype(jnp.complex128)
    return jnp.dtype(jnp.complex64)


def real_dtype_for(dtype) -> jnp.dtype:
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.complex128) or d == jnp.dtype(jnp.float64):
        return jnp.dtype(jnp.float64)
    return jnp.dtype(jnp.float32)


def stockham_last_axis(
    x: jnp.ndarray,
    bases: tuple[int, ...],
    *,
    inverse: bool = False,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Mixed-radix Stockham FFT over the last axis of a complex array.

    ``x``: (..., N) complex. Returns same shape/dtype. The stage loop follows
    the (r, m, s) schedule from planner.stage_schedule; each stage is

        view (..., r, m, s) -> einsum radix DFT over r -> twiddle -> merge

    which is the batch-major mirror of the Pallas kernel's batch-minor loop.
    """
    n = x.shape[-1]
    cdt = complex_dtype_for(x.dtype)
    x = x.astype(cdt)
    if n == 1 or math_prod_is_one(bases):
        return x * jnp.asarray(scale, cdt) if scale != 1.0 else x
    pre = x.shape[:-1]
    for st, w, tw in stage_tables(n, bases, inverse, scale):
        r, m, s = st.radix, st.m, st.s
        a = x.reshape(pre + (r, m, s))
        # out[..., j, p, q] = tw[j, p] * sum_b W[j, b] a[..., b, p, q]
        c = jnp.einsum("jb,...bpq->...jpq", jnp.asarray(w, cdt), a)
        c = c * jnp.asarray(tw, cdt)[:, :, None]
        x = jnp.swapaxes(c, -3, -2).reshape(pre + (n,))
    return x


def math_prod_is_one(bases: tuple[int, ...]) -> bool:
    p = 1
    for b in bases:
        p *= b
    return p == 1


def fft_along_axis(
    x: jnp.ndarray,
    axis: int,
    bases: tuple[int, ...],
    *,
    inverse: bool = False,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Stockham FFT along an arbitrary axis (XLA path).

    Uses moveaxis to bring the transform axis minor; XLA chooses layouts and
    fuses the transposes with adjacent stages. The Pallas path instead handles
    non-minor axes natively (kernels/stockham.py) — this function is the
    oracle/fallback.
    """
    n = x.shape[axis]
    stage_schedule(n, tuple(bases))  # validate early with a clear error
    moved = jnp.moveaxis(x, axis, -1)
    out = stockham_last_axis(moved, tuple(bases), inverse=inverse, scale=scale)
    return jnp.moveaxis(out, -1, axis)
