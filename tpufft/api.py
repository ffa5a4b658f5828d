"""Public API: scipy.fft-like surface plus explicit plan objects.

The role of the reference's ``fft/fft/fft.mojo`` public layer (``plan_fft``
CPU/GPU overloads at :123-210 and ``fft`` entry points at :213-323), rebuilt
around JAX idioms: plans are lightweight frozen descriptors, execution is a
jitted function cached per (shape, dtype, axes, direction, norm, backend),
and validation happens in Python at plan time (the analog of the comptime
layout contract ``_check_layout_conditions_nd``, fft.mojo:20-47).

Unlike the reference — whose "rfft" reads real input but always emits the
full-length spectrum (``do_rfft``, fft/fft/_fft.mojo:115-118) — this library
offers both: ``fft(real_array)`` gives the full spectrum, while
``rfft``/``irfft`` use proper Hermitian N//2+1 packing per scipy semantics.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .config import PlanConfig
from .core import complex_dtype_for
from .planner import default_bases, validate_bases
from . import execute as _execute

__all__ = [
    "Plan",
    "plan_fft",
    "fft", "ifft", "rfft", "irfft",
    "fft2", "ifft2", "rfft2", "irfft2",
    "fftn", "ifftn", "rfftn", "irfftn",
    "hfft", "ihfft",
    "fftfreq", "rfftfreq", "fftshift", "ifftshift",
]

_NORMS = (None, "backward", "ortho", "forward")


def _norm_scale(norm, n_total: int, inverse: bool) -> float:
    """Total scaling for a transform over n_total points (numpy conventions)."""
    if norm not in _NORMS:
        raise ValueError(f"norm must be one of {_NORMS}, got {norm!r}")
    norm = norm or "backward"
    if norm == "ortho":
        return 1.0 / math.sqrt(n_total)
    if (norm == "backward" and inverse) or (norm == "forward" and not inverse):
        return 1.0 / n_total
    return 1.0


def _canon_axes(ndim: int, axes) -> tuple[int, ...]:
    if axes is None:
        axes = tuple(range(ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    axes = tuple(a % ndim if a < 0 else a for a in axes)
    for a in axes:
        if not 0 <= a < ndim:
            raise ValueError(f"axis {a} out of range for ndim {ndim}")
    if len(set(axes)) != len(axes):
        raise ValueError(f"repeated axes in {axes}")
    return axes


def _resize_axis(x, n: int, axis: int):
    """Crop or zero-pad ``x`` to length ``n`` along ``axis`` (scipy semantics)."""
    cur = x.shape[axis]
    if cur == n:
        return x
    if cur > n:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, n)
        return x[tuple(idx)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - cur)
    return jnp.pad(x, pad)


@dataclasses.dataclass(frozen=True)
class Plan:
    """An executable FFT plan.

    Holds the static description (shapes, per-axis radix schedules, direction,
    normalization, backend choice); twiddle tables are materialized as jit-time
    constants when the cached executable first traces. The analog of the
    reference's ``_CPUPlan``/``_GPUPlan`` twiddle+scratch holders
    (fft/fft/_ndim_fft_cpu.mojo:28-60, _ndim_fft_gpu.mojo:153-207) — except
    scratch lives in XLA temp allocations and the JAX compilation cache plays
    the role of the precompiled ``.mojopkg``.
    """

    shape: tuple[int, ...]
    dtype: str
    axes: tuple[int, ...]
    lengths: tuple[int, ...]          # transform length per axis (after resize)
    bases: tuple[tuple[int, ...], ...]
    inverse: bool
    norm: str | None
    kind: str                          # "c2c" | "r2c" | "c2r"
    config: PlanConfig

    @functools.cached_property
    def _fn(self):
        return jax.jit(functools.partial(_apply_plan, plan=self))

    def __call__(self, x):
        x = jnp.asarray(x)
        if tuple(x.shape) != self.shape:
            raise ValueError(
                f"plan was built for shape {self.shape}, got {tuple(x.shape)}"
            )
        return self._fn(x)

    @property
    def out_shape(self) -> tuple[int, ...]:
        shape = list(self.shape)
        for a, n in zip(self.axes, self.lengths):
            shape[a] = n
        if self.kind == "r2c":
            shape[self.axes[-1]] = self.lengths[-1] // 2 + 1
        elif self.kind == "c2r":
            shape[self.axes[-1]] = self.lengths[-1]
        return tuple(shape)


def _apply_plan(x, *, plan: Plan):
    """Trace-time body shared by every plan executable."""
    axes, lengths = plan.axes, plan.lengths
    n_total = math.prod(lengths)
    scale = _norm_scale(plan.norm, n_total, plan.inverse)

    if plan.kind == "c2r":
        # Resize the non-packed axes first, then Hermitian-unpack the last
        # transformed axis and run a plain inverse C2C.
        for a, n in zip(axes[:-1], lengths[:-1]):
            x = _resize_axis(x, n, a)
        x = _hermitian_extend(x, lengths[-1], axes[-1], other_axes=axes[:-1])

    cdt = complex_dtype_for(x.dtype)
    x = x.astype(cdt)
    for a, n in zip(axes, lengths):
        if plan.kind != "c2r":  # c2r already extended to full length
            x = _resize_axis(x, n, a)

    # Fuse the whole normalization into the last-executed axis's final stage.
    for i, (a, n) in enumerate(zip(axes, lengths)):
        axis_scale = scale if i == len(axes) - 1 else 1.0
        x = _execute.fft_axis(
            x, a, plan.bases[i], inverse=plan.inverse, scale=axis_scale,
            config=plan.config,
        )

    if plan.kind == "r2c":
        sl = [slice(None)] * x.ndim
        sl[axes[-1]] = slice(0, lengths[-1] // 2 + 1)
        x = x[tuple(sl)]
    elif plan.kind == "c2r":
        x = x.real
    return x


def _hermitian_extend(x, n: int, axis: int, other_axes: tuple[int, ...] = ()):
    """Rebuild the full spectrum from N//2+1 Hermitian-packed coefficients.

    Multi-axis Hermitian symmetry is X[-k1, ..., -kd] = conj(X[k1, ..., kd]),
    so the mirrored half must be conjugate-*and*-index-negated along every
    other transformed axis, not just flipped along the packed one.
    """
    m = x.shape[axis]
    expected = n // 2 + 1
    if m != expected:
        x = _resize_axis(x, expected, axis)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(1, (n + 1) // 2)
    mirrored = jnp.flip(jnp.conj(x[tuple(idx)]), axis=axis)
    for a in other_axes:
        # index negation mod n_a: k -> (-k) % n_a  ==  roll(flip, 1)
        mirrored = jnp.roll(jnp.flip(mirrored, axis=a), 1, axis=a)
    head = [slice(None)] * x.ndim
    head[axis] = slice(0, n // 2 + 1)
    return jnp.concatenate([x[tuple(head)], mirrored], axis=axis)


def _resolve_bases(lengths, bases, cfg: PlanConfig):
    if bases is None:
        return tuple(default_bases(n, cfg.max_radix) for n in lengths)
    if bases and isinstance(bases[0], (int, np.integer)):
        bases = [bases]
    if len(bases) != len(lengths):
        raise ValueError(
            f"need one radix list per transformed axis ({len(lengths)}), "
            f"got {len(bases)}"
        )
    return tuple(validate_bases(n, b) for n, b in zip(lengths, bases))


@functools.lru_cache(maxsize=1024)
def _cached_plan(shape, dtype, axes, lengths, bases, inverse, norm, kind, config):
    return Plan(
        shape=shape, dtype=dtype, axes=axes, lengths=lengths, bases=bases,
        inverse=inverse, norm=norm, kind=kind, config=config,
    )


def plan_fft(
    shape: Sequence[int],
    dtype=jnp.complex64,
    *,
    axes=None,
    s: Sequence[int] | None = None,
    inverse: bool = False,
    norm: str | None = None,
    kind: str = "c2c",
    bases=None,
    config: PlanConfig | None = None,
) -> Plan:
    """Build (and cache) an FFT plan. Analog of the reference ``plan_fft``
    overloads (fft/fft/fft.mojo:123-210) with the GPU knobs replaced by
    ``PlanConfig``."""
    cfg = config or PlanConfig()
    shape = tuple(int(d) for d in shape)
    axes = _canon_axes(len(shape), axes)
    if kind in ("r2c", "c2r") and axes is None:
        axes = tuple(range(len(shape)))
    if s is None:
        lengths = tuple(shape[a] for a in axes)
        if kind == "c2r":
            lengths = lengths[:-1] + (2 * (shape[axes[-1]] - 1),)
    else:
        if len(s) != len(axes):
            raise ValueError(f"len(s)={len(s)} must equal len(axes)={len(axes)}")
        lengths = tuple(int(v) for v in s)
    bases = _resolve_bases(lengths, bases, cfg)
    return _cached_plan(
        shape, str(jnp.dtype(dtype)), axes, lengths, bases, inverse, norm,
        kind, cfg,
    )


def _plan_for(x, axes, s, inverse, norm, kind, bases, config):
    x = jnp.asarray(x)
    plan = plan_fft(
        x.shape, x.dtype, axes=axes, s=s, inverse=inverse, norm=norm,
        kind=kind, bases=bases, config=config,
    )
    return plan, x


# ----------------------------------------------------------------------------
# scipy.fft-like functional surface
# ----------------------------------------------------------------------------

def fft(x, n=None, axis=-1, norm=None, *, bases=None, config=None):
    """1D complex FFT (real input allowed; full spectrum out)."""
    s = None if n is None else (n,)
    plan, x = _plan_for(x, (axis,), s, False, norm, "c2c", bases, config)
    return plan(x)


def ifft(x, n=None, axis=-1, norm=None, *, bases=None, config=None):
    s = None if n is None else (n,)
    plan, x = _plan_for(x, (axis,), s, True, norm, "c2c", bases, config)
    return plan(x)


def rfft(x, n=None, axis=-1, norm=None, *, bases=None, config=None):
    s = None if n is None else (n,)
    plan, x = _plan_for(x, (axis,), s, False, norm, "r2c", bases, config)
    return plan(x)


def irfft(x, n=None, axis=-1, norm=None, *, bases=None, config=None):
    if n is None:
        n = 2 * (jnp.asarray(x).shape[axis] - 1)
    plan, x = _plan_for(x, (axis,), (n,), True, norm, "c2r", bases, config)
    return plan(x)


def fftn(x, s=None, axes=None, norm=None, *, bases=None, config=None):
    plan, x = _plan_for(x, axes, s, False, norm, "c2c", bases, config)
    return plan(x)


def ifftn(x, s=None, axes=None, norm=None, *, bases=None, config=None):
    plan, x = _plan_for(x, axes, s, True, norm, "c2c", bases, config)
    return plan(x)


def rfftn(x, s=None, axes=None, norm=None, *, bases=None, config=None):
    plan, x = _plan_for(x, axes, s, False, norm, "r2c", bases, config)
    return plan(x)


def irfftn(x, s=None, axes=None, norm=None, *, bases=None, config=None):
    x = jnp.asarray(x)
    axes_c = _canon_axes(x.ndim, axes)
    if s is None:
        s = tuple(x.shape[a] for a in axes_c[:-1]) + (
            2 * (x.shape[axes_c[-1]] - 1),
        )
    plan, x = _plan_for(x, axes_c, s, True, norm, "c2r", bases, config)
    return plan(x)


def fft2(x, s=None, axes=(-2, -1), norm=None, **kw):
    return fftn(x, s=s, axes=axes, norm=norm, **kw)


def ifft2(x, s=None, axes=(-2, -1), norm=None, **kw):
    return ifftn(x, s=s, axes=axes, norm=norm, **kw)


def rfft2(x, s=None, axes=(-2, -1), norm=None, **kw):
    return rfftn(x, s=s, axes=axes, norm=norm, **kw)


def irfft2(x, s=None, axes=(-2, -1), norm=None, **kw):
    return irfftn(x, s=s, axes=axes, norm=norm, **kw)


def hfft(x, n=None, axis=-1, norm=None, **kw):
    """FFT of Hermitian-symmetric input (real spectrum out).

    hfft(x, n) == irfft(conj(x), n) * n under backward norm; other norms
    follow from the forward/backward scale identity.
    """
    x = jnp.asarray(x)
    if n is None:
        n = 2 * (x.shape[axis] - 1)
    res = irfft(jnp.conj(x), n=n, axis=axis, norm=None, **kw)
    scale = {None: float(n), "backward": float(n),
             "ortho": math.sqrt(n), "forward": 1.0}[norm]
    return res * jnp.asarray(scale, res.dtype)


def ihfft(x, n=None, axis=-1, norm=None, **kw):
    x = jnp.asarray(x)
    if n is None:
        n = x.shape[axis]
    res = rfft(x, n=n, axis=axis, norm=None, **kw)
    scale = {None: 1.0 / n, "backward": 1.0 / n,
             "ortho": 1.0 / math.sqrt(n), "forward": 1.0}[norm]
    return jnp.conj(res) * jnp.asarray(scale, res.dtype)


# ----------------------------------------------------------------------------
# Helper functions (host-side, numpy semantics)
# ----------------------------------------------------------------------------

def fftfreq(n, d=1.0, *, dtype=None):
    dtype = dtype or jnp.float32
    results = jnp.empty(n, dtype)
    m = (n - 1) // 2 + 1
    results = results.at[:m].set(jnp.arange(0, m, dtype=dtype))
    results = results.at[m:].set(jnp.arange(-(n // 2), 0, dtype=dtype))
    return results / (n * d)


def rfftfreq(n, d=1.0, *, dtype=None):
    dtype = dtype or jnp.float32
    return jnp.arange(0, n // 2 + 1, dtype=dtype) / (n * d)


def fftshift(x, axes=None):
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [x.shape[a] // 2 for a in axes], axes)


def ifftshift(x, axes=None):
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [-(x.shape[a] // 2) for a in axes], axes)
