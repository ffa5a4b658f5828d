"""Fused spectral filtering and FFT convolution (the scipy.signal usage
layer on top of the plan machinery — beyond reference parity; the
reference stops at raw transforms).

TPU-native design: a circular filter ``y = ifft(fft(x) * H)`` along one
axis is a LINEAR map, so the whole three-pass pipeline collapses at plan
time into one circulant matrix ``C[j, m] = c[(m - j) mod n]`` (``c`` the
impulse response) and executes as a SINGLE fused MXU matmul pass
(`kernels/mxu_fft.build_minor_dense`) — one HBM round-trip instead of
three. The classic composition (transform, pointwise multiply, inverse)
remains as the fallback for long axes and the float64 CPU path.

``fftconvolve`` follows scipy.signal.fftconvolve semantics (modes
full/same/valid, axes subsets, broadcasting on non-convolved axes) and
runs through the framework's padded fast-length plans.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .config import PlanConfig
from .core import SplitComplex
from .kernels import mxu_fft
from .planner import next_fast_len

__all__ = ["plan_filter", "FilterPlan", "fftconvolve"]

# Largest axis run as a dense circulant matmul; beyond it the plan
# composes fft -> multiply -> ifft (measured on-chip crossover, see
# FilterPlan._use_dense).
FILTER_DENSE_MAX_N = 512


# ----------------------------------------------------------------------------
# Fused circular filter


def _circulant(c: np.ndarray) -> np.ndarray:
    """C[j, m] = c[(m - j) mod n] so that (x @ C) is circular convolution
    of x with c."""
    n = c.shape[0]
    idx = (np.arange(n)[None, :] - np.arange(n)[:, None]) % n
    return c[idx]


class FilterPlan:
    """One-axis circular filter, callable like a transform plan.

    Accepts complex numpy/jax arrays, real arrays, or SplitComplex planes;
    returns the matching flavor. Differentiable (custom VJP = the
    transposed-matrix multiply).
    """

    def __init__(self, n: int, c_time: np.ndarray, axis: int,
                 config: PlanConfig):
        self.n = int(n)
        self.axis = int(axis)
        self.config = config
        c = np.asarray(c_time, np.complex128)
        C = _circulant(c)
        self._cr = np.ascontiguousarray(C.real, np.float64)
        self._ci = np.ascontiguousarray(C.imag, np.float64)
        H = np.fft.fft(c)
        self._hr = np.ascontiguousarray(H.real, np.float64)
        self._hi = np.ascontiguousarray(H.imag, np.float64)
        self._real_matrix = bool(np.max(np.abs(self._ci)) < 1e-12 * max(
            1.0, float(np.max(np.abs(self._cr)))))
        self._kernel = None
        self._kernel_real = None
        if self._use_dense() and self._kernel_backend():
            self._kernel = mxu_fft.build_minor_dense(
                self._cr.astype(np.float32), self._ci.astype(np.float32),
                512, config.precision, bool(config.interpret))
            if self._real_matrix:
                # Hermitian response on real input: the circulant is real,
                # so the whole filter is ONE real matmul — half the MXU
                # work and half the input traffic of the complex form.
                self._kernel_real = mxu_fft.build_minor_dense_real(
                    self._cr.astype(np.float32), 512, config.precision,
                    bool(config.interpret))
        self._diff = self._make_diff()
        self._diff_real = (self._make_diff_real()
                           if self._real_matrix and self._use_dense()
                           else None)
        # jit the whole plane application (moveaxis + reshape + kernel):
        # eager dispatch pays per-op host->device round-trips
        self._apply_jit = jax.jit(self._apply_planes_impl)
        self._apply_real_jit = jax.jit(self._apply_real_impl)

    def _kernel_backend(self) -> bool:
        from .execute import _is_tpu_backend

        cfg = self.config
        if cfg.backend == "xla":
            return False
        return cfg.interpret or _is_tpu_backend()

    def _use_dense(self) -> bool:
        # Measured on-chip crossover: the dense circulant matmul is O(n^2)
        # compute vs the composed transforms' O(n log n), and the saved
        # HBM pass stops paying once the matmul goes compute-bound —
        # fused wins 2.9x at n=128, 2.5x at 256, ties at 480, loses at
        # 1024. XLA/CPU backends follow the same rule (a dense matmul
        # beats separate fft calls for short axes there too).
        return 2 <= self.n <= FILTER_DENSE_MAX_N

    def _make_diff(self):
        if self._use_dense():
            cr32 = jnp.asarray(self._cr, jnp.float32)
            ci32 = jnp.asarray(self._ci, jnp.float32)
            kernel = self._kernel

            @jax.custom_vjp
            def f(xr, xi):
                if kernel is not None:
                    return tuple(kernel(xr, xi))
                yr = jnp.dot(xr, cr32) - jnp.dot(xi, ci32)
                yi = jnp.dot(xr, ci32) + jnp.dot(xi, cr32)
                return yr, yi

            def fwd(xr, xi):
                return f(xr, xi), None

            def bwd(_, g):
                gr, gi = g
                # forward planes map: yr = xr Cr - xi Ci; yi = xr Ci + xi Cr
                gxr = jnp.dot(gr, cr32.T) + jnp.dot(gi, ci32.T)
                gxi = jnp.dot(gi, cr32.T) - jnp.dot(gr, ci32.T)
                return gxr, gxi

            f.defvjp(fwd, bwd)
            return f

        # long axes: compose fft -> pointwise H -> ifft on planes (each
        # stage differentiable; runs inside this plan's jit as one program)
        from .execute import fft_axis
        from .planner import default_bases

        bases = tuple(default_bases(self.n))
        hr = jnp.asarray(self._hr, jnp.float32)
        hi = jnp.asarray(self._hi, jnp.float32)
        cfg = self.config
        inv_scale = 1.0 / self.n

        def f(xr, xi):
            Xr, Xi = fft_axis(xr, xi, 1, bases, inverse=False, scale=1.0,
                              config=cfg)
            Yr = Xr * hr - Xi * hi
            Yi = Xr * hi + Xi * hr
            return fft_axis(Yr, Yi, 1, bases, inverse=True,
                            scale=inv_scale, config=cfg)

        return f

    def _make_diff_real(self):
        cr32 = jnp.asarray(self._cr, jnp.float32)
        kernel = self._kernel_real

        @jax.custom_vjp
        def f(x):
            if kernel is not None:
                return kernel(x)
            return jnp.dot(x, cr32)

        def fwd(x):
            return f(x), None

        def bwd(_, g):
            return (jnp.dot(g, cr32.T),)

        f.defvjp(fwd, bwd)
        return f

    # -- application ---------------------------------------------------------

    def _apply_real_impl(self, x):
        axis = self.axis % x.ndim
        moved = axis != x.ndim - 1
        if moved:
            x = jnp.moveaxis(x, axis, -1)
        lead = x.shape[:-1]
        flat = math.prod(lead) if lead else 1
        y = self._diff_real(x.reshape(flat, self.n).astype(jnp.float32))
        y = y.reshape(lead + (self.n,))
        if moved:
            y = jnp.moveaxis(y, -1, axis)
        return y

    def _apply_planes(self, re, im):
        if re.shape[self.axis % re.ndim] != self.n:
            raise ValueError(
                f"filter length {self.n} != axis length "
                f"{re.shape[self.axis % re.ndim]}")
        return self._apply_jit(re, im)

    def _apply_planes_impl(self, re, im):
        axis = self.axis % re.ndim
        moved = axis != re.ndim - 1
        if moved:
            re = jnp.moveaxis(re, axis, -1)
            im = jnp.moveaxis(im, axis, -1)
        if re.shape[-1] != self.n:
            raise ValueError(
                f"filter length {self.n} != axis length {re.shape[-1]}")
        lead = re.shape[:-1]
        flat = math.prod(lead) if lead else 1
        yr, yi = self._diff(re.reshape(flat, self.n).astype(jnp.float32),
                            im.reshape(flat, self.n).astype(jnp.float32))
        yr = yr.reshape(lead + (self.n,))
        yi = yi.reshape(lead + (self.n,))
        if moved:
            yr = jnp.moveaxis(yr, -1, axis)
            yi = jnp.moveaxis(yi, -1, axis)
        return yr, yi

    def __call__(self, x):
        if isinstance(x, SplitComplex):
            yr, yi = self._apply_planes(x.re, x.im)
            return SplitComplex(yr, yi)
        is_np = not isinstance(x, jax.Array)
        if is_np and np.iscomplexobj(x):
            xn = np.asarray(x)
            if (xn.dtype == np.complex128 and jax.config.jax_enable_x64
                    and jax.default_backend() == "cpu"):
                # f64 path: plain complex matmul keeps the 1e-12 tier
                # (the fused kernel is the f32 tier)
                C = self._cr + 1j * self._ci
                return np.moveaxis(np.tensordot(
                    np.moveaxis(xn, self.axis, -1), C, axes=([-1], [0])),
                    -1, self.axis)
            # split on HOST: the TPU backend has no complex dtypes
            yr, yi = self._apply_planes(
                jnp.asarray(np.ascontiguousarray(xn.real), jnp.float32),
                jnp.asarray(np.ascontiguousarray(xn.imag), jnp.float32))
            return (np.asarray(yr).astype(np.complex64)
                    + 1j * np.asarray(yi))
        xj = jnp.asarray(x)
        if jnp.issubdtype(xj.dtype, jnp.complexfloating):
            # complex jax arrays only exist on the CPU backend
            yr, yi = self._apply_planes(jnp.real(xj), jnp.imag(xj))
            return yr.astype(jnp.complex64) + 1j * yi.astype(jnp.complex64)
        # real input: if the filter matrix is real the output is real
        if self._real_matrix:
            if xj.shape[self.axis % xj.ndim] != self.n:
                raise ValueError(
                    f"filter length {self.n} != axis length "
                    f"{xj.shape[self.axis % xj.ndim]}")
            if self._diff_real is not None:
                # single REAL matmul — no imaginary plane at all
                yr = self._apply_real_jit(xj.astype(jnp.float32))
            else:
                yr, _ = self._apply_planes(xj, jnp.zeros_like(xj))
            out = yr.astype(xj.dtype if jnp.issubdtype(xj.dtype,
                                                       jnp.floating)
                            else jnp.float32)
            return np.asarray(out) if is_np else out
        yr, yi = self._apply_planes(xj, jnp.zeros_like(xj))
        y = yr.astype(jnp.complex64) + 1j * yi.astype(jnp.complex64)
        return np.asarray(y) if is_np else y


def plan_filter(n: int, response=None, *, impulse=None, axis: int = -1,
                config: PlanConfig | None = None) -> FilterPlan:
    """Plan a circular filter along one axis: y = ifft(fft(x, axis) * H).

    Exactly one of ``response`` (frequency response H, length n) or
    ``impulse`` (time-domain circular kernel c = ifft(H), length n) must
    be given. A Hermitian-symmetric response (real impulse) applied to a
    real array returns a real array.

    The pipeline is folded into one circulant matrix at plan time and runs
    as a single fused MXU matmul pass for n <= 1024 on the kernel path
    (vs three HBM passes for fft -> multiply -> ifft).
    """
    if (response is None) == (impulse is None):
        raise ValueError("give exactly one of response= or impulse=")
    n = int(n)
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if impulse is not None:
        c = np.asarray(impulse, np.complex128)
        if c.shape != (n,):
            raise ValueError(f"impulse must have shape ({n},)")
    else:
        H = np.asarray(response, np.complex128)
        if H.shape != (n,):
            raise ValueError(f"response must have shape ({n},)")
        c = np.fft.ifft(H)
    return FilterPlan(n, c, axis, config or PlanConfig())


# ----------------------------------------------------------------------------
# fftconvolve (scipy.signal semantics)


def _conv_axes(s1, s2, axes):
    ndim = len(s1)
    if axes is None:
        axes = tuple(range(ndim))
    elif np.isscalar(axes):
        axes = (int(axes),)
    axes = tuple(sorted(a % ndim for a in axes))
    if len(set(axes)) != len(axes):
        raise ValueError("duplicate axes")
    for a in range(ndim):
        if a not in axes and s1[a] != s2[a] and 1 not in (s1[a], s2[a]):
            raise ValueError(
                f"incompatible shapes on non-convolved axis {a}: "
                f"{s1[a]} vs {s2[a]}")
    return axes


def _centered(arr, newshape):
    slices = []
    for cur, new in zip(arr.shape, newshape):
        start = (cur - new) // 2
        slices.append(slice(start, start + new))
    return arr[tuple(slices)]


def fftconvolve(in1, in2, mode: str = "full", axes=None, *,
                config: PlanConfig | None = None):
    """N-D convolution via FFT — scipy.signal.fftconvolve-compatible
    (modes "full"/"same"/"valid", axes subsets, broadcasting on
    non-convolved axes). Real inputs run the r2c kernel path; lengths pad
    to kernel-fast sizes (`next_fast_len`)."""
    from . import api

    is_np = not (isinstance(in1, jax.Array) or isinstance(in2, jax.Array))
    a = jnp.asarray(in1)
    b = jnp.asarray(in2)
    if a.ndim != b.ndim:
        raise ValueError("in1 and in2 must have the same dimensionality")
    if a.ndim == 0:
        out = a * b
        return np.asarray(out) if is_np else out
    if a.size == 0 or b.size == 0:
        out = jnp.zeros((), jnp.result_type(a.dtype, b.dtype))
        return np.asarray(out) if is_np else out
    if mode not in ("full", "same", "valid"):
        raise ValueError(f"mode must be full/same/valid, got {mode!r}")
    axes = _conv_axes(a.shape, b.shape, axes)
    s1 = a.shape
    s2 = b.shape
    if mode == "valid":
        ok1 = all(s1[ax] >= s2[ax] for ax in axes)
        ok2 = all(s2[ax] >= s1[ax] for ax in axes)
        if not (ok1 or ok2):
            raise ValueError(
                "for mode='valid' one input must be at least as large as "
                "the other in every convolved axis")
        if not ok1:
            a, b = b, a
            s1, s2 = s2, s1
    full = [s1[ax] + s2[ax] - 1 for ax in axes]
    fast = [next_fast_len(f) for f in full]
    real = not (jnp.issubdtype(a.dtype, jnp.complexfloating)
                or jnp.issubdtype(b.dtype, jnp.complexfloating))
    kw = dict(s=tuple(fast), axes=axes, config=config)
    if real:
        fa = api.rfftn(a, **kw)
        fb = api.rfftn(b, **kw)
        prod = jnp.asarray(fa) * jnp.asarray(fb)
        conv = jnp.asarray(api.irfftn(prod, **kw))
    else:
        fa = api.fftn(a, **kw)
        fb = api.fftn(b, **kw)
        prod = jnp.asarray(fa) * jnp.asarray(fb)
        conv = jnp.asarray(api.ifftn(prod, **kw))
    # crop the fast-length padding back to the full linear-conv shape
    sl = [slice(None)] * conv.ndim
    for ax, f in zip(axes, full):
        sl[ax] = slice(0, f)
    conv = conv[tuple(sl)]
    # broadcast shape on non-convolved axes
    out_full = list(np.broadcast_shapes(
        tuple(1 if i in axes else s1[i] for i in range(a.ndim)),
        tuple(1 if i in axes else s2[i] for i in range(a.ndim))))
    for ax, f in zip(axes, full):
        out_full[ax] = f
    if mode == "full":
        out = conv
    elif mode == "same":
        shape = list(out_full)
        for ax in axes:
            shape[ax] = s1[ax]
        out = _centered(conv, shape)
    else:  # valid
        shape = list(out_full)
        for ax in axes:
            shape[ax] = s1[ax] - s2[ax] + 1
        out = _centered(conv, shape)
    if real:
        want = jnp.result_type(a.dtype, b.dtype)
        if out.dtype != want and jnp.issubdtype(want, jnp.floating):
            out = out.astype(want)
    return np.asarray(out) if is_np else out
