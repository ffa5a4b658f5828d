"""Short-time / averaged spectral analysis (the scipy.signal spectral
surface: stft, istft, spectrogram, periodogram, welch, csd, coherence,
get_window).

Beyond reference parity: the reference (martinvuyk/hackathon-fft) stops at
raw transforms; this layer is the standard consumer of batched FFTs and is
where the framework's batching story pays off.

TPU-native design:
* Framing is ONE batched gather — segments become the sublane axis of a
  (..., n_seg, nperseg) array, so the whole STFT is a single batched
  transform through the fused MXU kernels (the r2c path is one rectangular
  matmul per launch; zero-padding to ``nfft`` fuses into the transform via
  the rectangular pad-DFT kernel, see execute.pad_axis_ok).
* All complex math runs on split re/im float planes (`core.SplitComplex`)
  — the TPU stores no complex arrays — and pointwise spectral ops
  (conj-multiply for csd, |X|^2 for PSD) are two fused elementwise
  expressions XLA folds into the surrounding passes.
* Windows / frequency / time vectors are float64 host precomputes (same
  discipline as twiddle.py); window resolution delegates to
  scipy.signal.get_window at plan time (host-only, never traced).

IO contract follows the package convention: numpy in -> numpy out (f64
callers on the x64 CPU tier keep 1e-12 parity with scipy), jax in ->
device-resident out (complex where the backend has it, SplitComplex planes
on TPU for complex results — never a hidden device->host transfer).
"""

from __future__ import annotations

import math
import warnings

import jax
import jax.numpy as jnp
import numpy as np

import functools

from .config import PlanConfig
from .core import SplitComplex, backend_supports_complex
from .kernels import mxu_fft
from . import api

__all__ = ["get_window", "stft", "istft", "spectrogram", "periodogram",
           "welch", "csd", "coherence", "check_NOLA", "check_COLA",
           "lombscargle"]


def get_window(window, Nx: int, fftbins: bool = True) -> np.ndarray:
    """Window vector by name/tuple (scipy.signal.get_window-compatible —
    windows are host-side f64 plan constants). The common window set is
    implemented natively (windows.py) so default spectral arguments work
    on a jax+numpy-only install; exotic windows (chebwin, dpss, taylor)
    use scipy when installed."""
    from .windows import get_window as _gw

    return _gw(window, Nx, fftbins=fftbins)


def check_NOLA(window, nperseg: int, noverlap: int, tol: float = 1e-10):
    """Nonzero-overlap-add check (scipy.signal.check_NOLA-compatible):
    istft can invert an stft iff the squared-window OLA never vanishes."""
    nperseg = int(nperseg)
    noverlap = int(noverlap)
    if nperseg < 1:
        raise ValueError("nperseg must be a positive integer")
    if noverlap >= nperseg:
        raise ValueError("noverlap must be less than nperseg")
    if noverlap < 0:
        raise ValueError("noverlap must be a nonnegative integer")
    win = _resolve_window(window, nperseg)
    step = nperseg - noverlap
    binsums = np.sum(
        [win[ii * step:(ii + 1) * step] ** 2 for ii in
         range(nperseg // step)], axis=0)
    if nperseg % step != 0:
        binsums[:nperseg % step] += win[-(nperseg % step):] ** 2
    return bool(np.min(binsums) > tol * np.median(binsums))


def check_COLA(window, nperseg: int, noverlap: int, tol: float = 1e-10):
    """Constant-overlap-add check (scipy.signal.check_COLA-compatible)."""
    nperseg = int(nperseg)
    noverlap = int(noverlap)
    if nperseg < 1:
        raise ValueError("nperseg must be a positive integer")
    if noverlap >= nperseg:
        raise ValueError("noverlap must be less than nperseg")
    if noverlap < 0:
        raise ValueError("noverlap must be a nonnegative integer")
    win = _resolve_window(window, nperseg)
    step = nperseg - noverlap
    binsums = np.sum(
        [win[ii * step:(ii + 1) * step] for ii in range(nperseg // step)],
        axis=0)
    if nperseg % step != 0:
        binsums[:nperseg % step] += win[-(nperseg % step):]
    deviation = binsums - np.median(binsums)
    return bool(np.max(np.abs(deviation)) < tol)


# ----------------------------------------------------------------------------
# plumbing: windows, framing, plane-based complex views


def _resolve_window(window, nperseg: int) -> np.ndarray:
    if isinstance(window, (str, tuple)):
        return get_window(window, int(nperseg))
    win = np.asarray(window, np.float64)
    if win.ndim != 1:
        raise ValueError("window must be 1-D")
    if win.shape[0] != nperseg:
        raise ValueError("window length does not match nperseg")
    return win


def _triage_segments(window, nperseg, input_length: int):
    """scipy._spectral_py._triage_segments semantics: window arrays pin
    nperseg; over-long nperseg shrinks to the input with a warning."""
    if isinstance(window, (str, tuple)):
        nperseg = 256 if nperseg is None else int(nperseg)
        if nperseg > input_length:
            warnings.warn(
                f"nperseg = {nperseg} is greater than input length "
                f"= {input_length}, using nperseg = {input_length}")
            nperseg = input_length
        win = get_window(window, nperseg)
    else:
        win = np.asarray(window, np.float64)
        if win.ndim != 1:
            raise ValueError("window must be 1-D")
        if input_length < win.shape[0]:
            raise ValueError("window is longer than input signal")
        if nperseg is None:
            nperseg = win.shape[0]
        elif int(nperseg) != win.shape[0]:
            raise ValueError("value specified for nperseg is different"
                             " from length of window")
        nperseg = win.shape[0]
    return win, nperseg


def _is_jax(x) -> bool:
    return isinstance(x, (jax.Array, SplitComplex))


def _split(x, xp):
    """-> (re, im|None) planes in xp from numpy/jax/SplitComplex input."""
    if isinstance(x, SplitComplex):
        return x.re, x.im
    a = xp.asarray(x)
    if np.issubdtype(np.dtype(a.dtype), np.complexfloating):
        if xp is np:
            return (np.ascontiguousarray(a.real),
                    np.ascontiguousarray(a.imag))
        return jnp.real(a), jnp.imag(a)
    return a, None


def _pack_complex(re, im, xp, want_np: bool):
    """Planes -> the caller-facing complex flavor."""
    if xp is np:
        return re + 1j * im
    if backend_supports_complex():
        out = jax.lax.complex(re, im)
        return np.asarray(out) if want_np else out
    if want_np:
        return np.asarray(re) + 1j * np.asarray(im)
    return SplitComplex(re, im)


_EXT_KINDS = ("even", "odd", "constant", "zeros", None)


def _extend(re, im, n_ext: int, boundary, xp):
    """Boundary extension by n_ext samples on both ends of the last axis
    (scipy's even/odd/constant/zero extensions)."""
    if boundary is None or n_ext == 0:
        return re, im

    def ext(a):
        if boundary == "zeros":
            pad = [(0, 0)] * (a.ndim - 1) + [(n_ext, n_ext)]
            return xp.pad(a, pad)
        if boundary == "constant":
            pad = [(0, 0)] * (a.ndim - 1) + [(n_ext, n_ext)]
            return xp.pad(a, pad, mode="edge")
        head = a[..., 1:n_ext + 1][..., ::-1]
        tail = a[..., -(n_ext + 1):-1][..., ::-1]
        if boundary == "even":
            return xp.concatenate([head, a, tail], axis=-1)
        # odd: point-reflect about the edge samples
        return xp.concatenate(
            [2 * a[..., :1] - head, a, 2 * a[..., -1:] - tail], axis=-1)

    return ext(re), None if im is None else ext(im)


def _frame(a, nperseg: int, step: int, xp):
    """(..., n) -> (..., n_seg, nperseg): one batched gather."""
    n = a.shape[-1]
    nseg = 1 + (n - nperseg) // step
    if xp is np:
        idx = (np.arange(nperseg)[None, :]
               + step * np.arange(nseg)[:, None])
        return a[..., idx]
    idx = (jnp.arange(nperseg)[None, :]
           + step * jnp.arange(nseg)[:, None])
    return a[..., idx]


def _detrend_seg(re, im, detrend, xp):
    """Per-segment detrend along the last axis (linear ops -> applied to
    each plane independently)."""
    if detrend is False or detrend is None:
        return re, im
    if callable(detrend):
        return detrend(re), None if im is None else detrend(im)
    if detrend == "constant":
        f = lambda a: a - xp.mean(a, axis=-1, keepdims=True)
    elif detrend == "linear":
        n = re.shape[-1]
        t = xp.arange(n, dtype=re.dtype) - (n - 1) / 2.0

        def f(a):
            mean = xp.mean(a, axis=-1, keepdims=True)
            slope = (xp.sum(a * t, axis=-1, keepdims=True)
                     / xp.sum(t * t))
            return a - mean - slope * t
    else:
        raise ValueError(f"unknown detrend {detrend!r}")
    return f(re), None if im is None else f(im)


def _stft_matrix(win: np.ndarray, nperseg: int, nfft: int,
                 detrend) -> np.ndarray:
    """The whole per-segment pipeline as ONE (nperseg, m1) complex matrix:
    detrend, window, zero-pad to nfft and DFT are all linear maps, so
    M = P_detrend @ diag(win) @ V_nfft[:nperseg, :m1] (f64 host trig)."""
    j = np.arange(nperseg, dtype=np.float64)
    k = np.arange(nfft // 2 + 1, dtype=np.float64)
    theta = (-2.0 * np.pi / nfft) * np.outer(j, k)
    M = win[:, None] * np.exp(1j * theta)
    if detrend == "constant":
        M = M - M.mean(axis=0)[None, :]
    elif detrend == "linear":
        A = np.stack([np.ones(nperseg), j - (nperseg - 1) / 2.0], axis=1)
        M = M - A @ (np.linalg.pinv(A) @ M)
    return M


@functools.lru_cache(maxsize=32)
def _stft_fused(win_bytes: bytes, nperseg: int, step: int, nfft: int,
                detrend_key, config: PlanConfig | None):
    """Differentiable fused overlapped-frame STFT runner (see
    mxu_fft.build_stft_overlap): signal (batch, n_sig) f32 ->
    (re, im) planes (batch, nseg, m1). The VJP is the adjoint
    frame-matmul followed by the istft-style overlap-add (plain XLA — the
    backward pass is not a serving hot path)."""
    win = np.frombuffer(win_bytes, np.float64)
    M = _stft_matrix(win, nperseg, nfft, detrend_key)
    return _stft_fused_mat(
        np.ascontiguousarray(M.real, np.float32).tobytes(),
        np.ascontiguousarray(M.imag, np.float32).tobytes(),
        nperseg, M.shape[1], step, config)


@functools.lru_cache(maxsize=8)
def _stft_fused_mat(mr_bytes: bytes, mi_bytes: bytes, nperseg: int,
                    m1: int, step: int, config: PlanConfig | None):
    """Matrix-general fused STFT runner: ``mr + i mi`` is ANY
    (nperseg, m1) linear frame->spectrum map (window, detrend, phase
    roll, mode scaling — ShortTimeFFT folds its whole _fft_func in).
    Signal (batch, n_sig) f32 -> (re, im) planes (batch, nseg, m1)."""
    cfg = config or PlanConfig()
    mr = np.frombuffer(mr_bytes, np.float32).reshape(nperseg, m1)
    mi = np.frombuffer(mi_bytes, np.float32).reshape(nperseg, m1)

    @functools.lru_cache(maxsize=8)
    def build(nseg: int, bblk: int):
        # same segment-group row split as the welch accumulator (see
        # build() in _welch_fused): measured win for bblk <= 32
        group = max(1, min(nseg, 128 // bblk)) if bblk <= 32 else 1
        return mxu_fft.build_stft_overlap(
            mr, mi, step, nseg, bblk, cfg.precision, bool(cfg.interpret),
            group=group)

    @jax.custom_vjp
    def f(x):
        nseg = 1 + (x.shape[1] - nperseg) // step
        # block the batch at its true (8-rounded) size — an oversized
        # block pads every output write (8x amplification at batch 64)
        bblk = min(512, max(8, -(-x.shape[0] // 8) * 8))
        return build(nseg, bblk)(x)

    def fwd(x):
        return f(x), (x.shape[1],)

    def bwd(res, g):
        (n_sig,) = res
        gr, gi = g                       # (batch, nseg, m1)
        gseg = (jnp.dot(gr, jnp.asarray(mr).T)
                + jnp.dot(gi, jnp.asarray(mi).T))  # (batch, nseg, nperseg)
        nseg = gseg.shape[1]
        idx = (jnp.arange(nperseg)[None, :]
               + step * jnp.arange(nseg)[:, None]).reshape(-1)
        acc = jnp.zeros(gseg.shape[:1] + (n_sig,), gseg.dtype)
        acc = acc.at[:, idx].add(gseg.reshape(gseg.shape[0], -1))
        return (acc,)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=32)
def _welch_fused(win_bytes: bytes, nperseg: int, step: int, nfft: int,
                 detrend_key, cross: bool, config: PlanConfig | None):
    """Differentiable fused Welch/CSD runner (see
    mxu_fft.build_welch_accum): signal(s) (batch, n_sig) f32 -> the
    SUM over segments of |Z|^2 (welch) or conj(Zx)Zy planes (csd),
    shape (batch, m1) — per-segment spectra never touch HBM. The VJP
    recomputes through a composed jnp reference (the backward pass is
    not a serving hot path)."""
    cfg = config or PlanConfig()
    win = np.frombuffer(win_bytes, np.float64)
    M = _stft_matrix(win, nperseg, nfft, detrend_key)
    mr = np.ascontiguousarray(M.real, np.float32)
    mi = np.ascontiguousarray(M.imag, np.float32)

    @functools.lru_cache(maxsize=8)
    def build(nseg: int, bblk: int):
        # small batches underfill the MXU's 128 sublanes — stack G
        # consecutive segments per grid step to fill the rows (and cut
        # the overlap re-read from K x to ~1x). Measured crossover on
        # v5e (nperseg=256): bblk 8/16/32 win 2-4x with G=128/bblk;
        # bblk >= 64 regresses (window-concat overhead) — keep G=1.
        group = max(1, min(nseg, 128 // bblk)) if bblk <= 32 else 1
        return mxu_fft.build_welch_accum(
            mr, mi, step, nseg, bblk, cfg.precision, bool(cfg.interpret),
            cross, group=group)

    def composed(*xs):
        # jnp reference used only for the VJP: frame -> matmul -> accum
        nseg = 1 + (xs[0].shape[1] - nperseg) // step
        idx = (jnp.arange(nperseg)[None, :]
               + step * jnp.arange(nseg)[:, None])

        def spec(v):
            seg = v[:, idx]                        # (batch, nseg, nperseg)
            return (jnp.dot(seg, jnp.asarray(mr)),
                    jnp.dot(seg, jnp.asarray(mi)))

        xr, xi = spec(xs[0])
        if cross:
            yr, yi = spec(xs[1])
            return (jnp.sum(xr * yr + xi * yi, axis=1),
                    jnp.sum(xr * yi - xi * yr, axis=1))
        return jnp.sum(xr * xr + xi * xi, axis=1)

    @jax.custom_vjp
    def f(*xs):
        nseg = 1 + (xs[0].shape[1] - nperseg) // step
        bblk = min(512, max(8, -(-xs[0].shape[0] // 8) * 8))
        return build(nseg, bblk)(*xs)

    def fwd(*xs):
        return f(*xs), xs

    def bwd(xs, g):
        return jax.vjp(composed, *xs)[1](g)

    f.defvjp(fwd, bwd)
    return f


def _welch_fused_ok(xp, xim, yim, onesided, detrend, nperseg: int,
                    step: int, nfft: int, boundary, padded,
                    cfg: PlanConfig | None) -> bool:
    from .execute import _is_tpu_backend

    cfg = cfg or PlanConfig()
    if xp is np or xim is not None or yim is not None or not onesided:
        return False
    if boundary is not None or padded:
        return False
    if detrend not in (False, None, "constant", "linear"):
        return False
    if cfg.backend == "xla" or not (cfg.interpret or _is_tpu_backend()):
        return False
    return mxu_fft.stft_overlap_supported(nperseg, step, nfft,
                                          jnp.float32, cfg)


def _istft_matrix(win: np.ndarray, nperseg: int, nfft: int,
                  unscale: float) -> np.ndarray:
    """The whole per-segment synthesis pipeline as ONE (m1, nperseg)
    complex matrix: x_seg = Re(Z @ A) where A folds the inverse onesided
    DFT (with Hermitian doubling coefficients), the truncation to
    nperseg, the synthesis window and the stft unscale (f64 host trig).
    The kernel computes x = Zr @ A.real + Zi @ A.imag
    = (c/nfft)(Re(Z) cos - Im(Z) sin) win unscale — the real part of the
    inverse transform."""
    m1 = nfft // 2 + 1
    k = np.arange(m1, dtype=np.float64)
    t = np.arange(nperseg, dtype=np.float64)
    c = np.full(m1, 2.0)
    c[0] = 1.0
    if nfft % 2 == 0:
        c[-1] = 1.0
    theta = (2.0 * np.pi / nfft) * np.outer(k, t)
    scale = (c / nfft)[:, None] * (win[None, :] * unscale)
    return scale * np.cos(theta) - 1j * (scale * np.sin(theta))


@functools.lru_cache(maxsize=32)
def _istft_fused(win_bytes: bytes, nperseg: int, step: int, nfft: int,
                 unscale: float, config: PlanConfig | None):
    """Differentiable fused inverse-STFT runner (see
    mxu_fft.build_istft_ola): segment-major spectrum planes
    (nseg, batch, m1) f32 -> (batch, n_out) un-normalized overlap-add.
    The VJP is the adjoint framing matmul (plain XLA)."""
    win = np.frombuffer(win_bytes, np.float64)
    A = _istft_matrix(win, nperseg, nfft, unscale)
    return _istft_fused_mat(
        np.ascontiguousarray(A.real, np.float32).tobytes(),
        np.ascontiguousarray(A.imag, np.float32).tobytes(),
        A.shape[0], nperseg, step, config)


@functools.lru_cache(maxsize=8)
def _istft_fused_mat(ar_bytes: bytes, ai_bytes: bytes, m1: int,
                     nperseg: int, step: int, config: PlanConfig | None):
    """Matrix-general fused inverse-STFT runner: the kernel computes
    ``x = Zr @ ar + Zi @ ai`` per segment and overlap-adds, so
    ``ar/ai`` may fold ANY (m1, nperseg) linear synthesis map (inverse
    DFT, dual window, phase roll, mode unscaling)."""
    cfg = config or PlanConfig()
    ar = np.frombuffer(ar_bytes, np.float32).reshape(m1, nperseg)
    ai = np.frombuffer(ai_bytes, np.float32).reshape(m1, nperseg)

    @functools.lru_cache(maxsize=8)
    def build(nseg: int, bblk: int):
        # same segment-group row split as the welch/stft kernels:
        # small batches stack G chunks' segments per grid step
        group = max(1, min(nseg, 128 // bblk)) if bblk <= 32 else 1
        return mxu_fft.build_istft_ola(
            ar, ai, step, nseg, bblk, cfg.precision, bool(cfg.interpret),
            group=group)

    @jax.custom_vjp
    def f(zr, zi):
        nseg = zr.shape[0]
        bblk = min(512, max(8, -(-zr.shape[1] // 8) * 8))
        return build(nseg, bblk)(zr, zi)

    def fwd(zr, zi):
        return f(zr, zi), (zr.shape[0],)

    def bwd(res, g):
        (nseg,) = res                       # g: (batch, n_out)
        idx = (jnp.arange(nperseg)[None, :]
               + step * jnp.arange(nseg)[:, None])  # (nseg, nperseg)
        frames = g[:, idx]                  # (batch, nseg, nperseg)
        gr = jnp.einsum("bst,mt->sbm", frames, jnp.asarray(ar))
        gi = jnp.einsum("bst,mt->sbm", frames, jnp.asarray(ai))
        return gr, gi

    f.defvjp(fwd, bwd)
    return f


def _istft_fused_ok(xp, onesided, n_freq: int, nperseg: int, step: int,
                    nfft: int, cfg: PlanConfig | None) -> bool:
    from .execute import _is_tpu_backend
    from .kernels.mxu_fft import istft_ola_supported

    cfg = cfg or PlanConfig()
    if xp is np or not onesided or n_freq != nfft // 2 + 1:
        return False
    if cfg.backend == "xla" or not (cfg.interpret or _is_tpu_backend()):
        return False
    return istft_ola_supported(nperseg, step, nfft, cfg)


def _stft_fused_ok(xp, im, onesided, detrend, dtype, nperseg: int,
                   step: int, nfft: int, cfg: PlanConfig | None) -> bool:
    from .execute import _is_tpu_backend

    cfg = cfg or PlanConfig()
    if xp is np or im is not None or not onesided:
        return False
    if detrend not in (False, None, "constant", "linear"):
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    if cfg.backend == "xla" or not (cfg.interpret or _is_tpu_backend()):
        return False
    return mxu_fft.stft_overlap_supported(nperseg, step, nfft,
                                          jnp.float32, cfg)


def _transform_segments(re, im, nfft: int, onesided: bool,
                        config: PlanConfig | None, xp):
    """Batched per-segment DFT of the last axis -> spectrum planes.

    One call = one batched kernel launch over every segment of every
    batch row; the zero-pad to nfft fuses into the rectangular pad-DFT
    when the kernel path serves it."""
    if onesided:
        assert im is None
        X = api.rfft(re, n=nfft, axis=-1, config=config)
    elif xp is np:
        X = api.fft(re if im is None else re + 1j * im, n=nfft, axis=-1,
                    config=config)
    else:
        x = SplitComplex(re, jnp.zeros_like(re) if im is None else im)
        X = api.fft(x, n=nfft, axis=-1, config=config)
    return _split(X, xp)


def _spectral_helper(x, y, fs, window, nperseg, noverlap, nfft, detrend,
                     return_onesided, scaling, axis, mode, boundary,
                     padded, config, reduce_mean=False):
    """The shared stft/psd engine (scipy._spectral_helper semantics,
    split-plane execution). Returns (freqs, t, (re, im|None), xp,
    want_np, onesided).

    ``reduce_mean`` (psd mode): the caller will mean over segments —
    when the fused Welch accumulator serves the shape, the reduction
    happens IN the kernel and the result comes back with a
    single-segment time axis (csd's reducer then strips it)."""
    if boundary not in _EXT_KINDS:
        raise ValueError(
            f"Unknown boundary option '{boundary}', must be one of "
            f"{list(_EXT_KINDS)}")
    same_data = y is x
    axis = int(axis)

    is_np_x = not _is_jax(x)
    xp = np if is_np_x and (same_data or not _is_jax(y)) else jnp
    want_np = xp is np

    xre, xim = _split(x, xp)
    if not same_data:
        yre, yim = _split(y, xp)
        # scipy zero-pads the shorter signal along axis
        ax = axis % max(xre.ndim, yre.ndim)
        nx, ny = xre.shape[ax], yre.shape[ax]
        if nx != ny:
            def padto(a, n_to, ax_):
                pad = [(0, 0)] * a.ndim
                pad[ax_] = (0, n_to - a.shape[ax_])
                return xp.pad(a, pad)
            if nx < ny:
                xre = padto(xre, ny, ax)
                xim = None if xim is None else padto(xim, ny, ax)
            else:
                yre = padto(yre, nx, ax)
                yim = None if yim is None else padto(yim, nx, ax)
    else:
        yre = yim = None

    complex_in = xim is not None or (not same_data and yim is not None)
    onesided = bool(return_onesided)
    if onesided and complex_in:
        warnings.warn("Input data is complex, switching to "
                      "return_onesided=False")
        onesided = False

    ndim = xre.ndim
    axis = axis % ndim
    moved = axis != ndim - 1
    if moved:
        xre = xp.moveaxis(xre, axis, -1)
        xim = None if xim is None else xp.moveaxis(xim, axis, -1)
        if not same_data:
            yre = xp.moveaxis(yre, axis, -1)
            yim = None if yim is None else xp.moveaxis(yim, axis, -1)

    n_in = xre.shape[-1]
    win, nperseg = _triage_segments(window, nperseg, n_in)
    if noverlap is None:
        noverlap = nperseg // 2
    else:
        noverlap = int(noverlap)
    if noverlap >= nperseg:
        raise ValueError("noverlap must be less than nperseg.")
    nfft = nperseg if nfft is None else int(nfft)
    if nfft < nperseg:
        raise ValueError("nfft must be greater than or equal to nperseg.")
    step = nperseg - noverlap

    if scaling == "density":
        scale = 1.0 / (fs * (win * win).sum())
    elif scaling == "spectrum":
        scale = 1.0 / win.sum() ** 2
    else:
        raise ValueError(f"Unknown scaling: {scaling!r}")
    if mode == "stft":
        scale = math.sqrt(scale)

    def run(re, im):
        re, im = _extend(re, im, nperseg // 2, boundary, xp)
        n_ext = re.shape[-1]
        if padded:
            nadd = (-(n_ext - nperseg) % step) % nperseg
            if nadd:
                pad = [(0, 0)] * (re.ndim - 1) + [(0, nadd)]
                re = xp.pad(re, pad)
                im = None if im is None else xp.pad(im, pad)
        if _stft_fused_ok(xp, im, onesided, detrend, re.dtype, nperseg,
                          step, nfft, config):
            # fused overlapped-frame kernel: frames stream straight from
            # the signal in HBM; detrend/window/pad/DFT are one matmul —
            # no gather pass, no materialized (..., nseg, nperseg) tensor
            n_sig = re.shape[-1]
            nseg = 1 + (n_sig - nperseg) // step
            used = nperseg + (nseg - 1) * step
            lead = re.shape[:-1]
            flat = math.prod(lead) if lead else 1
            x2 = re[..., :used].reshape(flat, used).astype(jnp.float32)
            fk = _stft_fused(win.tobytes(), nperseg, step, nfft,
                             detrend if not callable(detrend) else None,
                             config)
            Xr, Xi = fk(x2)
            m1 = Xr.shape[-1]
            return (Xr.reshape(lead + (nseg, m1)),
                    Xi.reshape(lead + (nseg, m1)))
        re = _frame(re, nperseg, step, xp)
        im = None if im is None else _frame(im, nperseg, step, xp)
        re, im = _detrend_seg(re, im, detrend, xp)
        if xp is np:
            w = win.astype(re.dtype)
        else:
            w = jnp.asarray(win).astype(re.dtype)
        re = re * w
        im = None if im is None else im * w
        return _transform_segments(re, im, nfft, onesided and im is None,
                                   config, xp)

    if (mode == "psd" and reduce_mean
            and _welch_fused_ok(xp, xim, yim, onesided, detrend, nperseg,
                                step, nfft, boundary, padded, config)
            and xre.shape[-1] >= nperseg):
        # fused Welch/CSD accumulator: per-segment spectra never touch
        # HBM (mxu_fft.build_welch_accum); mean+scale are scalar passes
        # on the tiny (batch, m1) result
        n_sig = xre.shape[-1]
        nseg_f = 1 + (n_sig - nperseg) // step
        used = nperseg + (nseg_f - 1) * step
        lead = xre.shape[:-1]
        flat = math.prod(lead) if lead else 1
        dkey = detrend if not callable(detrend) else None
        fk = _welch_fused(win.tobytes(), nperseg, step, nfft, dkey,
                          not same_data, config)
        x2 = xre[..., :used].reshape(flat, used).astype(jnp.float32)
        if same_data:
            Pr, Pi = fk(x2), None
        else:
            y2 = yre[..., :used].reshape(flat, used).astype(jnp.float32)
            Pr, Pi = fk(x2, y2)
        k = float(scale) / nseg_f
        m1 = Pr.shape[-1]
        Rr = (Pr * k).reshape(lead + (1, m1))
        Ri = None if Pi is None else (Pi * k).reshape(lead + (1, m1))
    else:
        Xr, Xi = run(xre, xim)
        if same_data:
            Yr, Yi = Xr, Xi
        else:
            Yr, Yi = run(yre, yim)

        if mode == "stft":
            Rr, Ri = Xr * scale, (None if Xi is None else Xi * scale)
            if Ri is None:
                Ri = xp.zeros_like(Rr)
        else:  # psd: conj(X) * Y
            if Xi is None:
                Xi = xp.zeros_like(Xr)
            if Yi is None:
                Yi = xp.zeros_like(Yr)
            Rr = (Xr * Yr + Xi * Yi) * scale
            Ri = None if same_data else (Xr * Yi - Xi * Yr) * scale
    if mode != "stft" and onesided:
        # double the interior bins (the energy of the dropped
        # conjugate half); DC and (even-nfft) Nyquist stay single
        hi = Rr.shape[-1] - (1 if nfft % 2 == 0 else 0)

        def dbl(a):
            head = a[..., :1]
            mid = a[..., 1:hi] * 2
            tail = a[..., hi:]
            return xp.concatenate([head, mid, tail], axis=-1)
        Rr = dbl(Rr)
        Ri = None if Ri is None else dbl(Ri)

    nseg = Rr.shape[-2]
    if onesided:
        freqs = np.fft.rfftfreq(nfft, 1.0 / fs)
    else:
        freqs = np.fft.fftfreq(nfft, 1.0 / fs)
    t = (np.arange(nseg) * step + nperseg / 2.0) / fs
    if boundary is not None:
        t -= (nperseg / 2.0) / fs

    # (..., nseg, nfreq) -> freq back on the data axis, time trailing
    def place(a):
        a = xp.swapaxes(a, -1, -2)
        if moved:
            a = xp.moveaxis(a, -2, axis)
        return a

    Rr = place(Rr)
    Ri = None if Ri is None else place(Ri)
    return freqs, t, (Rr, Ri), xp, want_np, onesided


# ----------------------------------------------------------------------------
# public surface


def stft(x, fs: float = 1.0, window="hann", nperseg: int | None = 256,
         noverlap: int | None = None, nfft: int | None = None,
         detrend=False, return_onesided: bool = True, boundary="zeros",
         padded: bool = True, axis: int = -1, scaling: str = "spectrum",
         *, config: PlanConfig | None = None):
    """Short-time Fourier transform (scipy.signal.stft-compatible):
    returns (f, t, Zxx) with the frequency axis at ``axis`` and segment
    times trailing. The whole STFT is ONE batched kernel transform."""
    if scaling == "psd":
        sc = "density"
    elif scaling == "spectrum":
        sc = "spectrum"
    else:
        raise ValueError(f"Parameter scaling={scaling!r} not in "
                         "['spectrum', 'psd']")
    freqs, t, (Rr, Ri), xp, want_np, _ = _spectral_helper(
        x, x, fs, window, nperseg, noverlap, nfft, detrend,
        return_onesided, sc, axis, "stft", boundary, padded, config)
    Z = _pack_complex(Rr, Ri, xp, want_np)
    return freqs, t, Z


def istft(Zxx, fs: float = 1.0, window="hann", nperseg: int | None = None,
          noverlap: int | None = None, nfft: int | None = None,
          input_onesided: bool = True, boundary: bool = True,
          time_axis: int = -1, freq_axis: int = -2,
          scaling: str = "spectrum", *,
          config: PlanConfig | None = None):
    """Inverse STFT via windowed overlap-add
    (scipy.signal.istft-compatible): returns (t, x). The batched inverse
    transform is one kernel launch; the overlap-add is one scatter-add."""
    xp = jnp if _is_jax(Zxx) else np
    want_np = xp is np
    Zr, Zi = _split(Zxx, xp)
    if Zi is None:
        Zi = xp.zeros_like(Zr)
    if Zr.ndim < 2:
        raise ValueError("Input stft must be at least 2d!")
    ndim = Zr.ndim
    time_axis = time_axis % ndim
    freq_axis = freq_axis % ndim
    if time_axis == freq_axis:
        raise ValueError("Must specify differing time and frequency axes!")

    n_freq = Zr.shape[freq_axis]
    if input_onesided:
        n_default = 2 * (n_freq - 1)
    else:
        n_default = n_freq
    if nperseg is None:
        nperseg = n_default
    else:
        nperseg = int(nperseg)
        if nperseg < 1:
            raise ValueError("nperseg must be a positive integer")
    if nfft is None:
        if input_onesided and nperseg == n_default + 1:
            nfft = nperseg  # odd nperseg, onesided
        else:
            nfft = n_default
    elif int(nfft) < nperseg:
        raise ValueError("nfft must be greater than or equal to nperseg.")
    else:
        nfft = int(nfft)
    if noverlap is None:
        noverlap = nperseg // 2
    else:
        noverlap = int(noverlap)
    if noverlap >= nperseg:
        raise ValueError("noverlap must be less than nperseg.")
    step = nperseg - noverlap

    win = _resolve_window(window, nperseg)
    if not check_NOLA(win, nperseg, noverlap):
        # scipy >= 1.15 warns (it used to raise): the division below
        # substitutes 1 for the vanished OLA bins
        warnings.warn("NOLA condition failed, STFT may not be invertible")

    if scaling == "spectrum":
        unscale = win.sum()
    elif scaling == "psd":
        unscale = math.sqrt(fs * (win * win).sum())
    else:
        raise ValueError(f"Parameter scaling={scaling!r} not in "
                         "['spectrum', 'psd']")

    # -> (..., nseg, nfreq)
    Zr = xp.moveaxis(Zr, (freq_axis, time_axis), (-1, -2))
    Zi = xp.moveaxis(Zi, (freq_axis, time_axis), (-1, -2))
    nseg = Zr.shape[-2]

    if _istft_fused_ok(xp, input_onesided, n_freq, nperseg, step, nfft,
                       config):
        # fused overlap-add kernel: inverse transform, window and OLA in
        # one pass — no scatter-add (see mxu_fft.build_istft_ola); the
        # time-varying window-sum normalization stays below
        lead = Zr.shape[:-2]
        flat = math.prod(lead) if lead else 1
        zsr = jnp.transpose(Zr.reshape(flat, nseg, n_freq),
                            (1, 0, 2)).astype(jnp.float32)
        zsi = jnp.transpose(Zi.reshape(flat, nseg, n_freq),
                            (1, 0, 2)).astype(jnp.float32)
        fk = _istft_fused(win.tobytes(), nperseg, step, nfft,
                          float(unscale), config)
        xout = fk(zsr, zsi).reshape(lead + (-1,))
        xout_i = None
        n_out = nperseg + (nseg - 1) * step
        xsub = None
    elif input_onesided:
        if want_np:
            xsub = api.irfft(Zr + 1j * Zi, n=nfft, axis=-1, config=config)
        else:
            out = api.irfft(SplitComplex(Zr, Zi), n=nfft, axis=-1,
                            config=config)
            xsub = out.re if isinstance(out, SplitComplex) else out
        xsub_i = None
    else:
        if want_np:
            z = api.ifft(Zr + 1j * Zi, n=nfft, axis=-1, config=config)
            xsub, xsub_i = np.ascontiguousarray(z.real), \
                np.ascontiguousarray(z.imag)
        else:
            out = api.ifft(SplitComplex(Zr, Zi), n=nfft, axis=-1,
                           config=config)
            xsub, xsub_i = out.re, out.im
    if xsub is not None:
        xsub = xsub[..., :nperseg] * unscale
        if xsub_i is not None:
            xsub_i = xsub_i[..., :nperseg] * unscale

        n_out = nperseg + (nseg - 1) * step
        wj = win if xp is np else xp.asarray(win.astype(np.float32))
        lead = xsub.shape[:-2]

        def ola(seg):
            seg = seg * (wj.astype(seg.dtype) if xp is np else wj)
            if xp is np:
                out = np.zeros(lead + (n_out,), seg.dtype)
                idx = (np.arange(nperseg)[None, :]
                       + step * np.arange(nseg)[:, None])
                np.add.at(out, (..., idx.reshape(-1)),
                          seg.reshape(lead + (-1,)))
                return out
            idx = (jnp.arange(nperseg)[None, :]
                   + step * jnp.arange(nseg)[:, None]).reshape(-1)
            out = jnp.zeros(lead + (n_out,), seg.dtype)
            return out.at[..., idx].add(seg.reshape(lead + (-1,)))

        xout = ola(xsub)
        xout_i = None if xsub_i is None else ola(xsub_i)
    normw = np.zeros(n_out)
    idxh = (np.arange(nperseg)[None, :]
            + step * np.arange(nseg)[:, None]).reshape(-1)
    np.add.at(normw, idxh, np.tile(win ** 2, nseg))
    norm = np.where(normw > 1e-10, normw, 1.0)
    normj = norm if xp is np else xp.asarray(norm.astype(np.float32))
    xout = xout / (normj.astype(xout.dtype) if xp is np else normj)
    if xout_i is not None:
        xout_i = xout_i / (normj.astype(xout_i.dtype) if xp is np
                           else normj)

    if boundary:
        half = nperseg // 2
        xout = xout[..., half:n_out - half]
        if xout_i is not None:
            xout_i = xout_i[..., half:n_out - half]

    t = np.arange(xout.shape[-1]) / fs
    # put the reconstructed axis back at the (freq-axis-consumed-adjusted)
    # time-axis position — scipy.istft axis contract
    if xout.ndim > 0 and Zr.ndim - 2 > 0 and time_axis != ndim - 1:
        ta = time_axis - 1 if freq_axis < time_axis else time_axis
        xout = xp.moveaxis(xout, -1, ta)
        if xout_i is not None:
            xout_i = xp.moveaxis(xout_i, -1, ta)
    if xout_i is not None:
        xres = _pack_complex(xout, xout_i, xp, want_np)
    else:
        xres = xout
    return t, xres


def spectrogram(x, fs: float = 1.0, window=("tukey", 0.25),
                nperseg: int | None = None, noverlap: int | None = None,
                nfft: int | None = None, detrend="constant",
                return_onesided: bool = True, scaling: str = "density",
                axis: int = -1, mode: str = "psd", *,
                config: PlanConfig | None = None):
    """Spectrogram (scipy.signal.spectrogram-compatible): returns
    (f, t, Sxx) with segment times on the last axis."""
    modelist = ["psd", "complex", "magnitude", "angle", "phase"]
    if mode not in modelist:
        raise ValueError(f"unknown value for mode {mode}, must be one of "
                         f"{modelist}")
    if mode == "psd":
        helper_mode = "psd"
    else:
        helper_mode = "stft"
    # scipy: nperseg defaults via triage, noverlap = nperseg // 8
    if noverlap is None:
        n_in = np.shape(x)[axis] if not isinstance(x, SplitComplex) \
            else x.re.shape[axis]
        _, nperseg_r = _triage_segments(window, nperseg, n_in)
        noverlap = nperseg_r // 8
    freqs, t, (Rr, Ri), xp, want_np, _ = _spectral_helper(
        x, x, fs, window, nperseg, noverlap, nfft, detrend,
        return_onesided, scaling, axis, helper_mode, None, False, config)
    if mode == "psd":
        S = np.asarray(Rr) if want_np else Rr
        return freqs, t, S
    if mode == "complex":
        return freqs, t, _pack_complex(Rr, Ri, xp, want_np)
    if mode == "magnitude":
        S = xp.sqrt(Rr * Rr + Ri * Ri)
        return freqs, t, (np.asarray(S) if want_np and xp is not np else S)
    # angle / phase
    ang = xp.arctan2(Ri, Rr)
    if mode == "phase":
        # unwrap along the time (last) axis
        ang = xp.unwrap(ang, axis=-1)
    return freqs, t, (np.asarray(ang) if want_np and xp is not np else ang)


def _median_bias(n: int) -> float:
    ii_2 = 2 * np.arange(1.0, (n - 1) // 2 + 1)
    return float(1 + np.sum(1.0 / (ii_2 + 1) - 1.0 / ii_2))


def csd(x, y, fs: float = 1.0, window="hann", nperseg: int | None = None,
        noverlap: int | None = None, nfft: int | None = None,
        detrend="constant", return_onesided: bool = True,
        scaling: str = "density", axis: int = -1, average: str = "mean",
        *, config: PlanConfig | None = None):
    """Cross power spectral density Pxy by Welch's method
    (scipy.signal.csd-compatible)."""
    if average not in ("mean", "median"):
        raise ValueError(f"average must be 'mean' or 'median', got "
                         f"{average!r}")
    same = y is x
    freqs, _, (Rr, Ri), xp, want_np, _ = _spectral_helper(
        x, y, fs, window, nperseg, noverlap, nfft, detrend,
        return_onesided, scaling, axis, "psd", None, False, config,
        reduce_mean=(average == "mean"))
    # average over the trailing (segment-time) axis
    if Rr.ndim >= 2 and Rr.shape[-1] > 1:
        if average == "median":
            bias = _median_bias(Rr.shape[-1])
            Rr = xp.median(Rr, axis=-1) / bias
            Ri = None if Ri is None else xp.median(Ri, axis=-1) / bias
        else:
            Rr = xp.mean(Rr, axis=-1)
            Ri = None if Ri is None else xp.mean(Ri, axis=-1)
    else:
        Rr = Rr.reshape(Rr.shape[:-1])
        Ri = None if Ri is None else Ri.reshape(Ri.shape[:-1])
    if same and Ri is None:
        P = np.asarray(Rr) if want_np and xp is not np else Rr
        return freqs, P
    if Ri is None:
        Ri = xp.zeros_like(Rr)
    return freqs, _pack_complex(Rr, Ri, xp, want_np)


def welch(x, fs: float = 1.0, window="hann", nperseg: int | None = None,
          noverlap: int | None = None, nfft: int | None = None,
          detrend="constant", return_onesided: bool = True,
          scaling: str = "density", axis: int = -1,
          average: str = "mean", *, config: PlanConfig | None = None):
    """Power spectral density by Welch's method
    (scipy.signal.welch-compatible): returns (f, Pxx)."""
    freqs, Pxx = csd(x, x, fs=fs, window=window, nperseg=nperseg,
                     noverlap=noverlap, nfft=nfft, detrend=detrend,
                     return_onesided=return_onesided, scaling=scaling,
                     axis=axis, average=average, config=config)
    if isinstance(Pxx, SplitComplex):
        return freqs, Pxx.re
    xp = np if isinstance(Pxx, np.ndarray) else jnp
    if np.issubdtype(np.dtype(Pxx.dtype), np.complexfloating):
        Pxx = xp.real(Pxx)
    return freqs, Pxx


def periodogram(x, fs: float = 1.0, window="boxcar",
                nfft: int | None = None, detrend="constant",
                return_onesided: bool = True, scaling: str = "density",
                axis: int = -1, *, config: PlanConfig | None = None):
    """Periodogram PSD estimate (scipy.signal.periodogram-compatible):
    one full-length segment through welch."""
    if window is None:
        window = "boxcar"
    n = (x.re.shape[axis] if isinstance(x, SplitComplex)
         else np.shape(x)[axis])
    if nfft is None:
        nperseg = n
    elif nfft == n:
        nperseg = nfft
    elif nfft > n:
        nperseg = n
    else:  # nfft < n: crop (scipy semantics)
        if isinstance(x, SplitComplex):
            sl = [slice(None)] * x.re.ndim
            sl[axis % x.re.ndim] = slice(0, nfft)
            x = SplitComplex(x.re[tuple(sl)], x.im[tuple(sl)])
        else:
            sl = [slice(None)] * np.ndim(x)
            sl[axis % np.ndim(x)] = slice(0, nfft)
            x = x[tuple(sl)]
        nperseg = nfft
        nfft = None
    return welch(x, fs=fs, window=window, nperseg=nperseg, noverlap=0,
                 nfft=nfft, detrend=detrend,
                 return_onesided=return_onesided, scaling=scaling,
                 axis=axis, config=config)


def coherence(x, y, fs: float = 1.0, window="hann",
              nperseg: int | None = None, noverlap: int | None = None,
              nfft: int | None = None, detrend="constant", axis: int = -1,
              *, config: PlanConfig | None = None):
    """Magnitude-squared coherence Cxy = |Pxy|^2 / (Pxx Pyy)
    (scipy.signal.coherence-compatible)."""
    freqs, Pxx = welch(x, fs=fs, window=window, nperseg=nperseg,
                       noverlap=noverlap, nfft=nfft, detrend=detrend,
                       axis=axis, config=config)
    _, Pyy = welch(y, fs=fs, window=window, nperseg=nperseg,
                   noverlap=noverlap, nfft=nfft, detrend=detrend,
                   axis=axis, config=config)
    _, Pxy = csd(x, y, fs=fs, window=window, nperseg=nperseg,
                 noverlap=noverlap, nfft=nfft, detrend=detrend, axis=axis,
                 config=config)
    if isinstance(Pxy, SplitComplex):
        mag2 = Pxy.re * Pxy.re + Pxy.im * Pxy.im
    else:
        xp = np if isinstance(Pxy, np.ndarray) else jnp
        mag2 = xp.abs(Pxy) ** 2
    Cxy = mag2 / Pxx / Pyy
    return freqs, Cxy


# ---------------------------------------------------------------------------
# Lomb-Scargle periodogram (unevenly sampled data)
# ---------------------------------------------------------------------------

_NOVALUE = object()


def _ls_core(xv, yv, wv, freqs, floating_mean: bool, mode: str, xp):
    """Generalized Lomb-Scargle (Zechmeister & Kuerster 2009) sums.

    One (N, F) trig tile + weighted matvecs — on device these are the
    MXU/VPU shapes the chip wants; the tau rotation reuses the first trig
    tile (cos(t - tau) via the angle-difference identity) instead of a
    second transcendental pass.  Returns (a, b, tau, pgram_power, YY).
    """
    w = wv / xp.sum(wv)
    wy = w * yv
    theta = xv[:, None] * freqs[None, :]          # (N, F)
    cos = xp.cos(theta)
    sin = xp.sin(theta)
    CC = w @ (cos * cos)
    CS = w @ (cos * sin)
    SS = 1.0 - CC
    Y = xp.sum(wy)
    if floating_mean:
        C = w @ cos
        S = w @ sin
        CC = CC - C * C
        SS = SS - S * S
        CS = CS - C * S
    tau = 0.5 * xp.arctan2(2.0 * CS, CC - SS)
    ct, st = xp.cos(tau), xp.sin(tau)
    cos_t = cos * ct[None, :] + sin * st[None, :]  # cos(theta - tau)
    sin_t = sin * ct[None, :] - cos * st[None, :]
    YC = wy @ cos_t
    YS = wy @ sin_t
    CC = w @ (cos_t * cos_t)
    SS = 1.0 - CC
    if floating_mean:
        C = w @ cos_t
        S = w @ sin_t
        YC = YC - Y * C
        YS = YS - Y * S
        CC = CC - C * C
        SS = SS - S * S
    eps = xp.finfo(yv.dtype).epsneg if xp is np else float(
        np.finfo(np.dtype(yv.dtype)).epsneg)
    CC = xp.maximum(CC, eps)
    SS = xp.maximum(SS, eps)
    a = YC / CC
    b = YS / SS
    power = 2.0 * (a * YC + b * YS)
    YY = xp.sum(wy * yv)
    if floating_mean:
        YY = YY - Y * Y
    return a, b, tau, power, YY


@functools.partial(jax.jit, static_argnames=("floating_mean", "mode"))
def _ls_device(xv, yv, wv, freqs, floating_mean: bool, mode: str):
    a, b, tau, power, YY = _ls_core(xv, yv, wv, freqs, floating_mean,
                                    mode, jnp)
    if mode == "power":
        return power * (xv.shape[0] / 4.0)
    if mode == "normalize":
        return power * (0.5 / YY)
    # amplitude: (a + ib) e^{i tau}, kept as planes (TPU has no complex)
    ct, st = jnp.cos(tau), jnp.sin(tau)
    return a * ct - b * st, a * st + b * ct


def lombscargle(x, y, freqs, *, precenter=_NOVALUE, normalize=False,
                weights=None, floating_mean: bool = False):
    """Lomb-Scargle periodogram for unevenly sampled data
    (scipy.signal.lombscargle-compatible, incl. the generalized
    floating-mean / weighted form and the 'power'/'normalize'/'amplitude'
    output modes).

    numpy in -> host f64 numpy out (scipy-exact); jax in -> the whole
    O(N*F) trig tile and its weighted reductions run jitted on device
    (float32 on TPU), returning a device array — 'amplitude' returns
    SplitComplex planes on complex-free backends.  No counterpart in the
    reference (martinvuyk/hackathon-fft); parity target is
    scipy/signal/_spectral_py.py:lombscargle.
    """
    device = _is_jax(x) or _is_jax(y) or _is_jax(freqs)
    xp = jnp if device else np
    if isinstance(normalize, bool):
        mode = "normalize" if normalize else "power"
    else:
        mode = normalize
    if mode not in ("power", "normalize", "amplitude"):
        raise ValueError("normalize must be False ('power'), True "
                         "('normalize'), or 'amplitude'")
    if weights is None:
        wv = np.ones(np.shape(y), np.float64)
    else:
        wv = np.asarray(weights, np.float64) if not _is_jax(weights) \
            else weights
        if not _is_jax(wv) and not (np.all(wv >= 0) and np.sum(wv) > 0):
            # validate host-side whenever the weights themselves are host
            # data — even when x/y are device arrays (the common mixed
            # case); jax-array weights cannot be value-checked without a
            # device sync and remain the caller's contract
            raise ValueError("weights must be non-negative and sum to a "
                             "positive value")
    xv = xp.asarray(x)
    yv = xp.asarray(y)
    fv = xp.asarray(freqs)
    if not device:
        xv = xv.astype(np.float64)
        yv = yv.astype(np.float64)
        fv = fv.astype(np.float64)
    wv = xp.asarray(wv)
    if not (xv.ndim == 1 and xv.size > 0
            and xv.shape == yv.shape == wv.shape):
        raise ValueError("x, y, weights must be 1-D arrays of equal "
                         "non-zero length")
    if not (fv.ndim == 1 and fv.size > 0):
        raise ValueError("freqs must be a 1-D array of non-zero length")
    if precenter is not _NOVALUE:
        warnings.warn("'precenter' is deprecated (scipy 1.17): pass "
                      "y - y.mean() or use floating_mean=True",
                      DeprecationWarning, stacklevel=2)
        if precenter:
            yv = yv - yv.mean()

    if device:
        out = _ls_device(xv, yv, wv, fv, bool(floating_mean), mode)
        if mode != "amplitude":
            return out
        re, im = out
        if backend_supports_complex():
            return re + 1j * im
        return SplitComplex(re, im)

    a, b, tau, power, YY = _ls_core(xv, yv, wv, fv, bool(floating_mean),
                                    mode, np)
    if mode == "power":
        return power * (xv.shape[0] / 4.0)
    if mode == "normalize":
        return power * (0.5 / YY)
    return (a + 1j * b) * np.exp(1j * tau)
