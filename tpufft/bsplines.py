"""B-spline signal processing: spline coefficient (pre)filters,
evaluation, and symmetric IIR filtering.

Beyond reference parity (the reference, martinvuyk/hackathon-fft, stops
at raw transforms); scipy parity targets are
scipy/signal/_bsplines.py / _spline_filters.py (gauss_spline,
cspline1d, qspline1d, cspline1d_eval, qspline1d_eval, cspline2d,
qspline2d, spline_filter, sepfir2d, symiirorder1, symiirorder2).

Design note — EXACT banded solves instead of recursive startups. These
filters are all zero-phase symmetric IIRs applied under a mirror-
symmetric (half-sample) boundary. scipy implements them as cascaded
causal/anticausal recursions whose initial conditions are truncated
series (the ``precision`` argument); this module instead solves the
defining banded linear system with the boundary folded into the band —
the exact solution of the variational/interpolation problem, O(N) per
row via a small-bandwidth LU factored once per (length, filter) and
substituted with numpy ops vectorized across rows. Consequences:

* cspline1d/qspline1d (lamb=0), symiirorder1: matches scipy to
  ~1e-12 (scipy's default precision effectively converges).
* symiirorder2 and smoothing cspline1d (lamb>0): matches scipy to
  ~1e-3..1e-5 near the edges — the difference IS scipy's startup
  truncation; this implementation satisfies the defining equations to
  machine precision everywhere (asserted in the tests).

The ``precision`` parameters are accepted for API compatibility and
ignored (the solve is always exact).

Cost note: the LU factors converge geometrically to a fixed point
away from the edges, so the factorization runs O(edge-rows) Python
work regardless of N, and the substitutions run the constant-
coefficient interior as BLOCKED state propagation (a lower-triangular
Toeplitz matmul plus a homogeneous-response correction per 128-sample
block — exact, no truncation). A 100k-sample cspline1d costs ~30 ms
(~3x scipy's C recursion, down from ~2 s for the naive per-sample
loop); the few edge rows still run scalar. LU factors are cached only
for signals up to 64k samples.
"""

from __future__ import annotations

import functools
import math

import numpy as np

__all__ = ["gauss_spline", "cspline1d", "qspline1d", "cspline1d_eval",
           "qspline1d_eval", "cspline2d", "qspline2d", "spline_filter",
           "sepfir2d", "symiirorder1", "symiirorder2"]


def gauss_spline(x, n: int):
    """Gaussian approximation of an order-n B-spline
    (scipy.signal.gauss_spline-compatible): variance (n+1)/12."""
    x = np.asarray(x)
    s2 = (n + 1) / 12.0
    return 1.0 / np.sqrt(2 * np.pi * s2) * np.exp(-x ** 2 / (2 * s2))


# ---------------------------------------------------------------------------
# Folded banded solver


@functools.lru_cache(maxsize=64)
def _folded_lu(taps_items: tuple, N: int, complex_: bool):
    """LU factors (no pivoting; these systems are diagonally dominant)
    of the N x N matrix whose row n has ``taps[d]`` at column n+d, with
    out-of-range columns folded by the half-sample mirror rule
    x[-1-k] = x[k], x[N+k] = x[N-1-k].

    The band entries are constant away from the first/last p rows and
    the elimination multipliers converge geometrically to a fixed
    point, so the factorization runs the scalar recurrence only until
    the factors stop changing (typically < 100 rows), fills the
    interior with the steady values, and finishes the last few rows
    where the bottom-edge fold re-perturbs the band — O(edge) Python
    work regardless of N."""
    taps = dict(taps_items)
    p = max(abs(d) for d in taps)
    dtype = np.complex128 if complex_ else np.float64
    # dense band storage: A[n, p + d] = entry (n, n + d); constant
    # interior filled by slicing, the 2p edge rows rebuilt with folds
    A = np.zeros((N, 2 * p + 1), dtype)
    for d, v in taps.items():
        A[:, p + d] = v
    for n in list(range(min(p, N))) + list(range(max(N - p, 0), N)):
        A[n] = 0.0
        for d, v in taps.items():
            j = n + d
            while j < 0 or j > N - 1:
                j = -j - 1 if j < 0 else 2 * N - 1 - j
            dd = j - n
            if abs(dd) > p:
                raise ValueError("mirror fold escapes the band "
                                 "(signal shorter than the filter)")
            A[n, p + dd] += v

    L = np.zeros((N, p), dtype)

    def elim_step(k, lo):
        piv = A[k, p]
        for i in range(max(k + 1, lo), min(k + p, N - 1) + 1):
            di = i - k
            m = A[i, p - di] / piv
            L[i, di - 1] = m
            for dk in range(-di + 1, p - di + 1):
                A[i, p + dk] -= m * A[k, p + dk + di]
            A[i, p - di] = 0.0

    margin = 2 * p + 4
    k = 0
    stable = 0
    while k < N - 1:
        elim_step(k, 0)
        # row k+1 is now final; check for a converged fixed point
        if k >= 1 and k + 1 < N - margin:
            if np.array_equal(A[k + 1], A[k]) and \
                    np.array_equal(L[k + 1], L[k]):
                stable += 1
            else:
                stable = 0
            if stable >= 2:
                fill_to = N - margin
                A[k + 2:fill_to] = A[k + 1]
                L[k + 2:fill_to] = L[k + 1]
                # resume near the bottom; steps re-read final rows but
                # must only update the not-yet-filled tail rows — and
                # steps <= k already updated EVERY row in pass 1, so
                # never replay them (p = 2 can put fill_to - p <= k)
                for kk in range(max(fill_to - p, k + 1), N - 1):
                    elim_step(kk, fill_to)
                break
        k += 1
    return A, L, p


def _var_rows(M: np.ndarray) -> tuple:
    """(head, tail) counts of rows that differ from the steady interior
    row (the mid row)."""
    N = M.shape[0]
    steady = M[N // 2]
    diff = np.any(M != steady, axis=1)
    head = 0
    while head < N and diff[head]:
        head += 1
    tail = 0
    while tail < N - head and diff[N - 1 - tail]:
        tail += 1
    return head, tail


_BLOCK = 128


def _ar_blocked(y: np.ndarray, coefs: np.ndarray, head: int, tail: int):
    """In place: y[i] -= sum_d coefs[i, d-1] * y[i - d] for i = 1..N-1,
    with the coefficient rows constant outside the first ``head`` and
    last ``tail`` rows. The constant middle runs as blocked
    state-propagation: y_blk = T @ y_blk + G @ state, with T the
    lower-triangular Toeplitz of the AR impulse response and G the
    homogeneous responses — two dense matmuls per block instead of a
    per-sample Python loop."""
    N, p = coefs.shape
    lo = max(head, p) + 1
    hi = N - tail
    for i in range(1, min(lo, N)):
        for d in range(1, min(p, i) + 1):
            y[i] -= coefs[i, d - 1] * y[i - d]
    if lo < hi - _BLOCK:
        m = coefs[(lo + hi) // 2]
        s = _BLOCK
        # impulse response h and homogeneous responses G of
        # y[k] = c[k] - sum m_d y[k-d]
        h = np.zeros(s, coefs.dtype)
        G = np.zeros((s, p), coefs.dtype)
        for k in range(s):
            acc_h = 1.0 if k == 0 else 0.0
            for d in range(1, p + 1):
                if k - d >= 0:
                    acc_h -= m[d - 1] * h[k - d]
            h[k] = acc_h
            for j in range(p):
                acc = 0.0
                for d in range(1, p + 1):
                    if k - d >= 0:
                        acc -= m[d - 1] * G[k - d, j]
                    elif k - d == -(j + 1):
                        acc -= m[d - 1]
                G[k, j] = acc
        ii, jj = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
        T = np.where(ii >= jj, h[np.clip(ii - jj, 0, s - 1)], 0.0)
        i0 = lo
        while i0 + s <= hi:
            state = np.stack([y[i0 - 1 - j] for j in range(p)])
            y[i0:i0 + s] = T @ y[i0:i0 + s] + G @ state
            i0 += s
        lo = i0
    for i in range(lo, N):
        for d in range(1, min(p, i) + 1):
            y[i] -= coefs[i, d - 1] * y[i - d]


def _solve_folded(taps: dict, b: np.ndarray) -> np.ndarray:
    """Solve the folded banded system for each column of b (shape
    (N, ...) treated as N x M right-hand sides)."""
    N = b.shape[0]
    complex_ = np.iscomplexobj(b) or any(
        isinstance(v, complex) for v in taps.values())
    factor = _folded_lu if N <= 65536 else _folded_lu.__wrapped__
    A, L, p = factor(tuple(sorted(taps.items())), N, complex_)
    shp = b.shape
    y = np.array(b, np.complex128 if complex_ else np.float64,
                 copy=True).reshape(N, -1)
    # forward substitution: unit-lower solve with multipliers L
    head, tail = _var_rows(L)
    _ar_blocked(y, L, head, tail)
    # back substitution: flip so it is the same forward AR shape
    # y[i] = (c[i] - sum u_d y[i+d]) / u0  ->  normalize rows by the
    # diagonal, then the flipped recurrence has coefficients u_d/u0
    diag = A[:, p:p + 1]
    coefs_b = A[:, p + 1:] / diag
    y /= diag
    # (correctness: with z the final solution, z[i] = c[i]/u0[i]
    # - sum (u_d/u0)[i] z[i+d] — the division applies to the RHS, and
    # the flipped recurrence is again the forward AR shape)
    yf = y[::-1]
    cf = np.ascontiguousarray(coefs_b[::-1])
    headb, tailb = _var_rows(cf)
    _ar_blocked(yf, cf, headb, tailb)
    return y.reshape(shp)


# ---------------------------------------------------------------------------
# Symmetric IIR filters


def symiirorder1(signal, c0, z1, precision=-1.0):
    """Zero-phase IIR ``c0 / ((1 - z1 z^-1)(1 - z1 z))`` under the
    mirror-symmetric boundary (scipy.signal.symiirorder1-compatible;
    solved exactly — ``precision`` accepted and ignored, see module
    docstring)."""
    x = np.asarray(signal)
    if x.ndim != 1:
        raise ValueError("signal must be 1-D")
    if abs(z1) >= 1:
        raise ValueError("|z1| must be less than 1.0")
    taps = {0: (1 + z1 * z1) / c0, -1: -z1 / c0, 1: -z1 / c0}
    out = _solve_folded(taps, x.astype(
        np.complex128 if (np.iscomplexobj(x) or isinstance(z1, complex)
                          or isinstance(c0, complex)) else np.float64))
    return out


def symiirorder2(input, r, omega, precision=-1.0):
    """Zero-phase IIR ``cs^2 / (A(z) A(1/z))`` with
    ``A(z) = 1 - 2 r cos(omega) z^-1 + r^2 z^-2`` and
    ``cs = 1 - 2 r cos(omega) + r^2``, mirror-symmetric boundary
    (scipy.signal.symiirorder2-compatible up to scipy's startup
    truncation — this solve is exact; ``precision`` ignored)."""
    x = np.asarray(input, np.float64)
    if x.ndim != 1:
        raise ValueError("input must be 1-D")
    r = float(r)
    if not 0 <= r < 1:
        raise ValueError("r must be in [0, 1)")
    cs = 1 - 2 * r * math.cos(omega) + r * r
    a = np.array([1.0, -2 * r * math.cos(omega), r * r])
    taps: dict = {}
    for i, ai in enumerate(a):
        for j, aj in enumerate(a):
            taps[i - j] = taps.get(i - j, 0.0) + ai * aj / (cs * cs)
    return _solve_folded(taps, x)


# ---------------------------------------------------------------------------
# Spline coefficient prefilters


def _spline_taps(kind: str, lamb: float) -> dict:
    if kind == "cubic":
        base = {-1: 1 / 6.0, 0: 4 / 6.0, 1: 1 / 6.0}
    else:
        base = {-1: 1 / 8.0, 0: 6 / 8.0, 1: 1 / 8.0}
    if lamb == 0.0:
        return base
    # cubic smoothing spline: B3 + lamb * D2^T D2 (Unser 1993 part II)
    pent = {-2: 1.0, -1: -4.0, 0: 6.0, 1: -4.0, 2: 1.0}
    return {d: base.get(d, 0.0) + lamb * pent[d] for d in range(-2, 3)}


def cspline1d(signal, lamb: float = 0.0):
    """Cubic B-spline coefficients of a 1-D signal
    (scipy.signal.cspline1d-compatible): solves the interpolation
    system ``(c[n-1] + 4 c[n] + c[n+1])/6 = x[n]`` (lamb=0) or the
    smoothing-spline normal equations ``(B3 + lamb D4) c = x``
    (lamb>0), mirror-symmetric boundary, exactly."""
    x = np.asarray(signal, np.float64)
    if x.ndim != 1:
        raise ValueError("signal must be 1-D")
    return _solve_folded(_spline_taps("cubic", float(lamb)), x)


def qspline1d(signal, lamb: float = 0.0):
    """Quadratic B-spline coefficients
    (scipy.signal.qspline1d-compatible; like scipy, only lamb=0 is
    defined for the quadratic family)."""
    if lamb != 0.0:
        raise ValueError("smoothing quadratic splines are not "
                         "supported (lamb must be 0)")
    x = np.asarray(signal, np.float64)
    if x.ndim != 1:
        raise ValueError("signal must be 1-D")
    return _solve_folded(_spline_taps("quad", 0.0), x)


def cspline2d(input, lamb: float = 0.0, precision=-1.0):
    """Cubic spline coefficients of a 2-D array: the separable per-axis
    prefilter (scipy.signal.cspline2d-compatible; exact solve,
    ``precision`` ignored)."""
    im = np.asarray(input, np.float64)
    if im.ndim != 2:
        raise ValueError("input must be 2-D")
    taps = _spline_taps("cubic", float(lamb))
    out = _solve_folded(taps, im)            # along axis 0, all columns
    out = _solve_folded(taps, out.T).T       # along axis 1
    return out


def qspline2d(input, lamb: float = 0.0, precision=-1.0):
    """Quadratic spline coefficients of a 2-D array
    (scipy.signal.qspline2d-compatible)."""
    if lamb != 0.0:
        raise ValueError("smoothing quadratic splines are not "
                         "supported (lamb must be 0)")
    im = np.asarray(input, np.float64)
    if im.ndim != 2:
        raise ValueError("input must be 2-D")
    taps = _spline_taps("quad", 0.0)
    out = _solve_folded(taps, im)
    out = _solve_folded(taps, out.T).T
    return out


# ---------------------------------------------------------------------------
# Evaluation and separable FIR


def _bspline3(u: np.ndarray) -> np.ndarray:
    au = np.abs(u)
    return np.where(
        au < 1, 2 / 3.0 - au * au * (1 - au / 2.0),
        np.where(au < 2, (2 - au) ** 3 / 6.0, 0.0))


def _bspline2(u: np.ndarray) -> np.ndarray:
    au = np.abs(u)
    return np.where(
        au < 0.5, 0.75 - au * au,
        np.where(au < 1.5, (au - 1.5) ** 2 / 2.0, 0.0))


def _mirror_index(k: np.ndarray, N: int) -> np.ndarray:
    """Half-sample mirror of the coefficient index (cj[-1] = cj[0],
    cj[N] = cj[N-1]) — scipy's evaluation-side coefficient extension
    (determined empirically against scipy 1.17; note it differs from
    the whole-sample rule used to fold the evaluation POINTS)."""
    if N == 1:
        return np.zeros_like(k)
    period = 2 * N
    k = np.mod(k, period)    # numpy mod of negatives is non-negative
    return np.where(k >= N, period - 1 - k, k)


def _spline_eval(cj, newx, dx: float, x0: float, basis, support: int):
    cj = np.asarray(cj, np.float64)
    N = cj.shape[0]
    t = (np.asarray(newx, np.float64) - x0) / float(dx)
    # fold the evaluation points by the whole-sample mirror rule first
    # (scipy evaluates reflected points recursively; one fold of the
    # argument is the closed form)
    tf = np.abs(t) % (2 * (N - 1)) if N > 1 else np.zeros_like(t)
    tf = np.where(tf > N - 1, 2 * (N - 1) - tf, tf)
    lo = np.floor(tf).astype(np.intp) - support
    out = np.zeros_like(tf)
    for j in range(2 * support + 1):
        k = lo + j
        out += cj[_mirror_index(k, N)] * basis(tf - k)
    return out


def cspline1d_eval(cj, newx, dx: float = 1.0, x0: float = 0):
    """Evaluate a cubic spline from its coefficients at ``newx``
    (scipy.signal.cspline1d_eval-compatible: points outside the knot
    range mirror back in)."""
    return _spline_eval(cj, newx, dx, x0, _bspline3, 2)


def qspline1d_eval(cj, newx, dx: float = 1.0, x0: float = 0):
    """Evaluate a quadratic spline from its coefficients
    (scipy.signal.qspline1d_eval-compatible)."""
    return _spline_eval(cj, newx, dx, x0, _bspline2, 2)


def sepfir2d(input, hrow, hcol):
    """Separable 2-D FIR filter with mirror-symmetric boundary
    (scipy.signal.sepfir2d-compatible; odd-length kernels)."""
    im = np.asarray(input, np.float64)
    hrow = np.asarray(hrow, np.float64)
    hcol = np.asarray(hcol, np.float64)
    if im.ndim != 2:
        raise ValueError("input must be 2-D")
    if hrow.ndim != 1 or hcol.ndim != 1 or \
            hrow.size % 2 != 1 or hcol.size % 2 != 1:
        raise ValueError("hrow and hcol must be 1-D with odd length")
    out = im
    for axis, h in ((0, hcol), (1, hrow)):
        if h.size == 1:
            out = out * h[0]
            continue
        p = h.size // 2
        pad = [(0, 0), (0, 0)]
        pad[axis] = (p, p)
        ext = np.pad(out, pad, mode="symmetric")   # half-sample mirror
        out = np.apply_along_axis(
            lambda v: np.convolve(v, h, mode="valid"), axis, ext)
    return out


def spline_filter(Iin, lmbda: float = 5.0):
    """Smoothing spline image filter (scipy.signal.spline_filter-
    compatible): smoothing cubic coefficients followed by the B3
    reconstruction kernel [1, 4, 1]/6 in both axes."""
    im = np.asarray(Iin, np.float64)
    ck = cspline2d(im, lmbda)
    h = np.array([1.0, 4.0, 1.0]) / 6.0
    return sepfir2d(ck, h, h)
