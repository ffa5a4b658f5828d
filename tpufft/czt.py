"""Chirp-z transform and zoom FFT (scipy.signal.czt / zoom_fft surface).

Beyond reference parity: the reference (martinvuyk/hackathon-fft) stops at
plain FFTs — its any-length story is the prime-greedy planner fallback
(fft/fft/fft.mojo:83-104). tpufft already generalizes that with a Bluestein
chirp-z fallback inside the transform dispatch (execute._fft_axis_bluestein);
this module exposes the FULL chirp-z transform as public API: evaluate the
z-transform on ``m`` points of any logarithmic spiral ``z_k = a * w**-k``,
which subsumes zoomed / fractional-resolution spectra (``zoom_fft``).

TPU-native design: the CZT is a chirp-premultiplied circular convolution
(Bluestein's identity ``w**(jk) = w**(j^2/2) w**(k^2/2) / w**((k-j)^2/2)``),
evaluated as FFT_L -> pointwise -> IFFT_L at a 128-lane-aligned
kernel-friendly length ``L >= n + m - 1`` — both transforms run on the MXU
regardless of (n, m, w, a), and when the fused rectangular pad-DFT kernel
serves (n, L) the zero-pad of the premultiplied input costs no extra HBM
pass (execute.fft_axis_padded). All chirp tables are float64 host
precomputes (exact integer modular reduction of the default-w angles, the
same discipline as execute._bluestein_tables).

IO contract matches signal.FilterPlan: numpy in -> numpy complex out (host
combine — the TPU stores no complex arrays); jax real/SplitComplex in on a
complex-free backend -> SplitComplex out (no hidden host trip); complex128
input on the x64 CPU tier runs an exact host float64 pipeline.
"""

from __future__ import annotations

import cmath
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .config import PlanConfig
from .core import SplitComplex, backend_supports_complex
from .planner import default_bases, next_fast_len
from . import execute as _execute

__all__ = ["CZT", "ZoomFFT", "czt", "zoom_fft", "czt_points"]


def _validate_sizes(n: int, m: int | None) -> int:
    n = int(n)
    if n < 1:
        raise ValueError(f"Invalid number of CZT data points ({n}) specified")
    m = n if m is None else int(m)
    if m < 1:
        raise ValueError(f"Invalid number of CZT output points ({m}) "
                         "specified")
    return m


def czt_points(m: int, w: complex | None = None, a: complex = 1 + 0j):
    """The points on the z-plane a CZT samples: ``z_k = a * w**-k``
    (scipy.signal.czt_points-compatible). Default ``w`` walks the full
    unit circle (the FFT points), computed with exact angles."""
    m = _validate_sizes(1, m)
    k = np.arange(m)
    a = complex(a)
    if w is None:
        return a * np.exp(2j * np.pi * k / m)
    return a * complex(w) ** -k.astype(np.float64)


class CZT:
    """Plan for repeated chirp-z transforms (scipy.signal.CZT-compatible
    callable): length-``n`` input -> the z-transform at ``m`` spiral points
    ``a * w**-k``. Differentiable on the device path (the whole pipeline is
    jnp ops around the framework's custom-vjp transforms)."""

    def __init__(self, n: int, m: int | None = None,
                 w: complex | None = None, a: complex = 1 + 0j, *,
                 config: PlanConfig | None = None):
        m = _validate_sizes(n, m)
        k = np.arange(max(m, n), dtype=np.int64)
        if w is None:
            # default = FFT spiral: exact integer reduction of the angle
            # (pi * (k^2 mod 2m) / m == pi * k^2 / m mod 2*pi for any k)
            w = cmath.exp(-2j * np.pi / m)
            wk2 = np.exp(-1j * np.pi * ((k * k) % (2 * m)) / m)
        else:
            w = complex(w)
            if w == 0:
                raise ValueError("w must be nonzero")
            wk2 = w ** (k * k / 2.0)
        self._finish_init(int(n), m, w, complex(a), wk2, config)

    def _finish_init(self, n: int, m: int, w: complex, a: complex,
                     wk2: np.ndarray, config: PlanConfig | None):
        """Shared tail of CZT/ZoomFFT construction; ``wk2[k] = w**(k^2/2)``
        is supplied by the subclass-specific (precision-preserving)
        formula."""
        self.n, self.m, self.w, self.a = n, m, w, a
        self.config = config or PlanConfig()
        L = next_fast_len(n + m - 1, aligned=True)
        self._L = L
        # Awk2[j] = a^-j * w^(j^2/2): folds the input chirp and the spiral
        # start into ONE premultiply
        Awk2 = a ** -k_arr(n) * wk2[:n]
        # Fwk2 = FFT_L of the inverse chirp arranged so the linear
        # convolution's valid window is indices [n-1, n+m-1)
        inv = 1.0 / wk2
        vv = np.concatenate([inv[n - 1:0:-1], inv[:m]])
        Fwk2 = np.fft.fft(vv, L)
        self._Awk2 = Awk2
        self._Fwk2 = Fwk2
        self._wk2_out = wk2[:m]
        f32 = lambda x: np.asarray(x, np.float32)
        self._t32 = (f32(Awk2.real), f32(Awk2.imag),
                     f32(Fwk2.real), f32(Fwk2.imag),
                     f32(self._wk2_out.real), f32(self._wk2_out.imag))
        self._apply_jit = jax.jit(self._impl, static_argnums=(2,))

    def points(self):
        """The z-plane points this plan evaluates (czt_points of this
        plan's parameters)."""
        k = np.arange(self.m)
        return complex(self.a) * complex(self.w) ** -k.astype(np.float64)

    # -- device path (split planes, f32 tier) --------------------------------

    def _impl(self, re, im, axis: int):
        n, m, L = self.n, self.m, self._L
        ndim = re.ndim
        axis = axis % ndim
        moved = axis != ndim - 1
        if moved:
            re = jnp.moveaxis(re, axis, -1)
            im = jnp.moveaxis(im, axis, -1)
        lead = re.shape[:-1]
        flat = math.prod(lead) if lead else 1
        re = re.reshape(flat, n).astype(jnp.float32)
        im = im.reshape(flat, n).astype(jnp.float32)
        Ar, Ai, Br, Bi, Pr, Pi = (jnp.asarray(t) for t in self._t32)
        pr = re * Ar - im * Ai
        pi = re * Ai + im * Ar
        cfg = self.config
        bases = default_bases(L, cfg.max_radix)
        if L > n and _execute.pad_axis_ok(n, L, pr.dtype, cfg):
            # fused rectangular pad-DFT: the zero-pad to L costs no extra
            # HBM pass
            pr, pi = _execute.fft_axis_padded(
                pr, pi, 1, L, inverse=False, scale=1.0, config=cfg)
        else:
            pad = ((0, 0), (0, L - n))
            pr, pi = _execute.fft_axis(
                jnp.pad(pr, pad), jnp.pad(pi, pad), 1, bases,
                inverse=False, scale=1.0, config=cfg)
        pr, pi = pr * Br - pi * Bi, pr * Bi + pi * Br
        pr, pi = _execute.fft_axis(pr, pi, 1, bases, inverse=True,
                                   scale=1.0 / L, config=cfg)
        pr = pr[:, n - 1:n + m - 1]
        pi = pi[:, n - 1:n + m - 1]
        outr = pr * Pr - pi * Pi
        outi = pr * Pi + pi * Pr
        outr = outr.reshape(lead + (m,))
        outi = outi.reshape(lead + (m,))
        if moved:
            outr = jnp.moveaxis(outr, -1, axis)
            outi = jnp.moveaxis(outi, -1, axis)
        return outr, outi

    def _apply_planes(self, re, im, axis: int):
        ax = axis % re.ndim
        if re.shape[ax] != self.n:
            raise ValueError(f"CZT input length {self.n} != axis length "
                             f"{re.shape[ax]}")
        return self._apply_jit(re, im, ax)

    # -- host f64 tier --------------------------------------------------------

    def _f64_pipeline(self, xn: np.ndarray, axis: int) -> np.ndarray:
        """Exact host complex128 evaluation (the 1e-12 tier for x64 CPU
        callers, and the differential-test oracle)."""
        n, m, L = self.n, self.m, self._L
        x = np.moveaxis(np.asarray(xn, np.complex128), axis, -1)
        p = x * self._Awk2
        y = np.fft.ifft(np.fft.fft(p, L) * self._Fwk2)
        y = y[..., n - 1:n + m - 1] * self._wk2_out
        return np.moveaxis(y, -1, axis)

    def __call__(self, x, *, axis: int = -1):
        shape = x.re.shape if isinstance(x, SplitComplex) else np.shape(x)
        if shape[axis % len(shape)] != self.n:
            raise ValueError(f"CZT input length {self.n} != axis length "
                             f"{shape[axis % len(shape)]}")
        if isinstance(x, SplitComplex):
            yr, yi = self._apply_planes(x.re, x.im, axis)
            return SplitComplex(yr, yi)
        is_np = not isinstance(x, jax.Array)
        f64_host = jax.config.jax_enable_x64 \
            and jax.default_backend() == "cpu"
        if is_np:
            xn = np.asarray(x)
            if xn.dtype in (np.complex128, np.float64) and f64_host:
                y = self._f64_pipeline(xn, axis % xn.ndim)
                return y
            if np.iscomplexobj(xn):
                yr, yi = self._apply_planes(
                    jnp.asarray(np.ascontiguousarray(xn.real), jnp.float32),
                    jnp.asarray(np.ascontiguousarray(xn.imag), jnp.float32),
                    axis)
                return (np.asarray(yr).astype(np.complex64)
                        + 1j * np.asarray(yi))
            xj = jnp.asarray(xn, jnp.float32)
            yr, yi = self._apply_planes(xj, jnp.zeros_like(xj), axis)
            return (np.asarray(yr).astype(np.complex64)
                    + 1j * np.asarray(yi))
        xj = x
        if jnp.issubdtype(xj.dtype, jnp.complexfloating):
            # complex jax arrays only exist on the CPU backend
            yr, yi = self._apply_planes(jnp.real(xj), jnp.imag(xj), axis)
            out = yr.astype(jnp.complex64) + 1j * yi.astype(jnp.complex64)
            if xj.dtype == jnp.complex128 and jax.config.jax_enable_x64:
                return out.astype(jnp.complex128)
            return out
        yr, yi = self._apply_planes(xj, jnp.zeros_like(xj), axis)
        if not backend_supports_complex():
            # device input on a complex-free backend: stay on device as
            # planes (mirrors api.Plan's contract — no hidden host trip)
            return SplitComplex(yr, yi)
        return yr.astype(jnp.complex64) + 1j * yi.astype(jnp.complex64)


def k_arr(n: int) -> np.ndarray:
    """float64 0..n-1 (the a**-k exponent base; float keeps complex ** on
    the principal branch like scipy)."""
    return np.arange(n, dtype=np.float64)


class ZoomFFT(CZT):
    """Plan for repeated zoomed FFTs (scipy.signal.ZoomFFT-compatible):
    the DFT evaluated only over the band ``fn = [f1, f2]`` (or ``[0, fn]``
    for scalar ``fn``) of a signal sampled at ``fs``, with ``m`` output
    bins. A CZT on the unit-circle arc; the chirp angles are computed by
    the exact band formula (not ``w**(k^2/2)``) so precision holds for
    large ``k`` — same approach as scipy."""

    def __init__(self, n: int, fn, m: int | None = None, *, fs: float = 2,
                 endpoint: bool = False,
                 config: PlanConfig | None = None):
        m = _validate_sizes(n, m)
        k = np.arange(max(m, n), dtype=np.int64)
        fn_arr = np.asarray(fn, np.float64)
        if fn_arr.size == 2:
            f1, f2 = (float(v) for v in fn_arr.reshape(2))
        elif fn_arr.size == 1:
            f1, f2 = 0.0, float(fn_arr.reshape(()))
        else:
            raise ValueError("fn must be a scalar or 2-length sequence")
        self.f1, self.f2, self.fs = f1, f2, float(fs)
        if endpoint:
            scale = ((f2 - f1) * m) / (self.fs * (m - 1))
        else:
            scale = (f2 - f1) / self.fs
        a = cmath.exp(2j * np.pi * f1 / self.fs)
        wk2 = np.exp(-1j * np.pi * scale * (k * k).astype(np.float64) / m)
        w = cmath.exp(-2j * np.pi / m * scale)
        self._finish_init(int(n), m, w, a, wk2, config)


@functools.lru_cache(maxsize=64)
def _czt_plan(n: int, m: int | None, w: complex | None, a: complex,
              config: PlanConfig | None) -> CZT:
    return CZT(n, m=m, w=w, a=a, config=config)


@functools.lru_cache(maxsize=64)
def _zoom_plan(n: int, fn: tuple, m: int | None, fs: float, endpoint: bool,
               config: PlanConfig | None) -> ZoomFFT:
    return ZoomFFT(n, fn, m=m, fs=fs, endpoint=endpoint, config=config)


def czt(x, m: int | None = None, w: complex | None = None,
        a: complex = 1 + 0j, *, axis: int = -1,
        config: PlanConfig | None = None):
    """Chirp-z transform (scipy.signal.czt-compatible): the z-transform of
    ``x`` along ``axis`` at ``m`` points ``a * w**-k``. ``w=None`` walks
    the unit circle (``m=n`` reproduces ``fft``)."""
    shape = x.re.shape if isinstance(x, SplitComplex) else np.shape(x)
    n = shape[axis]
    plan = _czt_plan(int(n), None if m is None else int(m),
                     None if w is None else complex(w), complex(a), config)
    return plan(x, axis=axis)


def zoom_fft(x, fn, m: int | None = None, *, fs: float = 2,
             endpoint: bool = False, axis: int = -1,
             config: PlanConfig | None = None):
    """Zoomed FFT (scipy.signal.zoom_fft-compatible): the DFT of ``x``
    sampled at ``fs``, evaluated only over the band ``fn``."""
    shape = x.re.shape if isinstance(x, SplitComplex) else np.shape(x)
    n = shape[axis]
    fn_key = tuple(np.asarray(fn, np.float64).reshape(-1).tolist())
    plan = _zoom_plan(int(n), fn_key, None if m is None else int(m),
                      float(fs), bool(endpoint), config)
    return plan(x, axis=axis)
