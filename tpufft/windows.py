"""Native window functions (scipy.signal.windows-compatible subset).

The spectral layer's window vectors are host-f64 plan constants (never
traced), so they are plain numpy here — the same discipline as the
twiddle tables (twiddle.py). Implemented natively so the DEFAULT
arguments of the spectral surface (welch/stft/csd/... with
window="hann") work on a jax+numpy-only install; scipy remains an
optional extra used only as a fallback for exotic windows (chebwin,
dpss, taylor, ...).

Construction matches scipy.signal.windows bit-for-bit: cosine-sum
windows evaluate sum_k a_k cos(k * linspace(-pi, pi, M)) and periodic
("fftbins") windows compute the M+1-point symmetric window and drop the
last sample, exactly like scipy's _len_guards/_extend/_truncate
machinery. No counterpart in the reference (martinvuyk/hackathon-fft);
parity target is scipy/signal/windows/_windows.py.
"""

from __future__ import annotations

import numpy as np

__all__ = ["get_window"]


def _len_guard(M: int) -> bool:
    """True when the trivial small-M result should be returned."""
    if int(M) != M or M < 0:
        raise ValueError("Window length M must be a non-negative integer")
    return M <= 1


def _extend(M: int, sym: bool) -> tuple:
    """(window size to compute, needs_trunc): periodic = sym of M+1."""
    return (M, False) if sym else (M + 1, True)


def _trunc(w: np.ndarray, needed: bool) -> np.ndarray:
    return w[:-1] if needed else w


def general_cosine(M: int, a, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    fac = np.linspace(-np.pi, np.pi, M)
    w = np.zeros(M)
    for k, ak in enumerate(a):
        w += ak * np.cos(k * fac)
    return _trunc(w, trunc)


def boxcar(M: int, sym: bool = True) -> np.ndarray:
    if int(M) != M or M < 0:
        raise ValueError("Window length M must be a non-negative integer")
    return np.ones(M, float)


def hann(M: int, sym: bool = True) -> np.ndarray:
    return general_cosine(M, [0.5, 0.5], sym)


def hamming(M: int, sym: bool = True) -> np.ndarray:
    return general_hamming(M, 0.54, sym)


def general_hamming(M: int, alpha: float, sym: bool = True) -> np.ndarray:
    return general_cosine(M, [alpha, 1.0 - alpha], sym)


def blackman(M: int, sym: bool = True) -> np.ndarray:
    return general_cosine(M, [0.42, 0.50, 0.08], sym)


def blackmanharris(M: int, sym: bool = True) -> np.ndarray:
    return general_cosine(M, [0.35875, 0.48829, 0.14128, 0.01168], sym)


def nuttall(M: int, sym: bool = True) -> np.ndarray:
    return general_cosine(M, [0.3635819, 0.4891775, 0.1365995, 0.0106411],
                          sym)


def flattop(M: int, sym: bool = True) -> np.ndarray:
    a = [0.21557895, 0.41663158, 0.277263158, 0.083578947, 0.006947368]
    return general_cosine(M, a, sym)


def bartlett(M: int, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    n = np.arange(0, M)
    w = np.where(np.less_equal(n, (M - 1) / 2.0),
                 2.0 * n / (M - 1), 2.0 - 2.0 * n / (M - 1))
    return _trunc(w, trunc)


def triang(M: int, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    n = np.arange(1, (M + 1) // 2 + 1)
    if M % 2 == 0:
        w = (2 * n - 1.0) / M
        w = np.r_[w, w[::-1]]
    else:
        w = 2 * n / (M + 1.0)
        w = np.r_[w, w[-2::-1]]
    return _trunc(w, trunc)


def barthann(M: int, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    n = np.arange(0, M)
    fac = np.abs(n / (M - 1.0) - 0.5)
    w = 0.62 - 0.48 * fac + 0.38 * np.cos(2 * np.pi * fac)
    return _trunc(w, trunc)


def cosine(M: int, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    w = np.sin(np.pi / M * (np.arange(0, M) + 0.5))
    return _trunc(w, trunc)


def bohman(M: int, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    fac = np.abs(np.linspace(-1, 1, M)[1:-1])
    w = (1 - fac) * np.cos(np.pi * fac) + 1.0 / np.pi * np.sin(np.pi * fac)
    w = np.r_[0, w, 0]
    return _trunc(w, trunc)


def parzen(M: int, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    n = np.arange(-(M - 1) / 2.0, (M - 1) / 2.0 + 0.5, 1.0)
    na = np.extract(n < -(M - 1) / 4.0, n)
    nb = np.extract(abs(n) <= (M - 1) / 4.0, n)
    wa = 2 * (1 - np.abs(na) / (M / 2.0)) ** 3.0
    wb = (1 - 6 * (np.abs(nb) / (M / 2.0)) ** 2.0
          + 6 * (np.abs(nb) / (M / 2.0)) ** 3.0)
    w = np.r_[wa, wb, wa[::-1]]
    return _trunc(w, trunc)


def lanczos(M: int, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    w = np.sinc(2 * np.arange(M) / (M - 1) - 1.0)
    return _trunc(w, trunc)


def kaiser(M: int, beta: float, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    n = np.arange(0, M)
    alpha = (M - 1) / 2.0
    w = (np.i0(beta * np.sqrt(1 - ((n - alpha) / alpha) ** 2.0))
         / np.i0(beta))
    return _trunc(w, trunc)


def gaussian(M: int, std: float, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    n = np.arange(0, M) - (M - 1.0) / 2.0
    sig2 = 2 * std * std
    w = np.exp(-n ** 2 / sig2)
    return _trunc(w, trunc)


def general_gaussian(M: int, p: float, sig: float,
                     sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    n = np.arange(0, M) - (M - 1.0) / 2.0
    w = np.exp(-0.5 * np.abs(n / sig) ** (2 * p))
    return _trunc(w, trunc)


def tukey(M: int, alpha: float = 0.5, sym: bool = True) -> np.ndarray:
    if _len_guard(M):
        return np.ones(M)
    if alpha <= 0:
        return np.ones(M, "d")
    if alpha >= 1.0:
        return hann(M, sym=sym)
    M, trunc = _extend(M, sym)
    n = np.arange(0, M)
    width = int(np.floor(alpha * (M - 1) / 2.0))
    n1 = n[0:width + 1]
    n2 = n[width + 1:M - width - 1]
    n3 = n[M - width - 1:]
    w1 = 0.5 * (1 + np.cos(np.pi * (-1 + 2.0 * n1 / alpha / (M - 1))))
    w2 = np.ones(n2.shape[0])
    w3 = 0.5 * (1 + np.cos(np.pi * (-2.0 / alpha + 1
                                    + 2.0 * n3 / alpha / (M - 1))))
    return _trunc(np.concatenate((w1, w2, w3)), trunc)


def exponential(M: int, center=None, tau: float = 1.0,
                sym: bool = True) -> np.ndarray:
    if sym and center is not None:
        raise ValueError("If sym==True, center must be None.")
    if _len_guard(M):
        return np.ones(M)
    M, trunc = _extend(M, sym)
    if center is None:
        center = (M - 1) / 2
    n = np.arange(0, M)
    w = np.exp(-np.abs(n - center) / tau)
    return _trunc(w, trunc)


# name -> (function, n_params) with scipy's aliases
_WINDOWS = {}
for _names, _fn, _np_ in [
    (("boxcar", "box", "ones", "rect", "rectangular"), boxcar, 0),
    (("triang", "triangle", "tri"), triang, 0),
    (("bartlett", "bart", "brt"), bartlett, 0),
    (("hann", "han"), hann, 0),
    (("hamming", "hamm", "ham"), hamming, 0),
    (("blackman", "black", "blk"), blackman, 0),
    (("blackmanharris", "blackharr", "bkh"), blackmanharris, 0),
    (("nuttall", "nutl", "nut"), nuttall, 0),
    (("flattop", "flat", "flt"), flattop, 0),
    (("barthann", "brthan", "bth"), barthann, 0),
    (("cosine", "halfcosine"), cosine, 0),
    (("bohman", "bman", "bmn"), bohman, 0),
    (("parzen", "parz", "par"), parzen, 0),
    (("lanczos", "sinc"), lanczos, 0),
    (("kaiser", "ksr"), kaiser, 1),
    (("gaussian", "gauss", "gss"), gaussian, 1),
    (("general gaussian", "general_gaussian", "general gauss",
      "general_gauss", "ggs"), general_gaussian, 2),
    (("general hamming", "general_hamming"), general_hamming, 1),
    (("general cosine", "general_cosine"), general_cosine, 1),
    (("tukey", "tuk"), tukey, -1),          # optional parameter
    (("exponential", "poisson"), exponential, -2),
]:
    for _n in _names:
        _WINDOWS[_n] = (_fn, _np_)

# windows scipy supports that need special functions we don't carry —
# resolved through the scipy fallback when it is installed
_SCIPY_ONLY = ("chebwin", "cheb", "dpss", "taylor", "taylr", "taylor_win",
               "kaiser bessel derived", "kaiser_bessel_derived", "kbd")


def get_window(window, Nx: int, fftbins: bool = True) -> np.ndarray:
    """scipy.signal.get_window-compatible dispatch, natively implemented
    for the common window set (f64 host plan constants). Exotic windows
    (chebwin, dpss, taylor, ...) fall back to scipy when available."""
    sym = not fftbins
    if isinstance(window, str):
        args = ()
    elif isinstance(window, tuple):
        if len(window) == 0:
            raise ValueError("window tuple must have at least one entry")
        if not isinstance(window[0], str):
            raise ValueError(f"first entry of window tuple {window!r} "
                             "must be a window-name string")
        window, args = window[0], tuple(window[1:])
    else:
        # bare number (incl. numpy scalars) = kaiser beta, like scipy
        try:
            beta = float(window)
        except (TypeError, ValueError) as e:
            # e.g. a pre-built vector (scipy raises here too; the
            # spectral layer's _triage_segments handles arrays before
            # reaching us)
            raise ValueError(
                f"unknown window specification {window!r}") from e
        window, args = "kaiser", (beta,)

    try:
        fn, npar = _WINDOWS[window.lower()]
    except KeyError:
        # unknown name: scipy fallback (covers the _SCIPY_ONLY set and
        # lets scipy raise its own error for true typos)
        try:
            from scipy.signal import get_window as _gw
        except ImportError as e:
            raise ValueError(
                f"window {window!r} is not in tpufft's native set "
                f"({sorted(set(_WINDOWS))}) and scipy is not "
                "installed for the fallback") from e
        spec = (window, *args) if args else window
        return np.asarray(_gw(spec, Nx, fftbins=fftbins), np.float64)
    if npar == 0:
        if args:
            raise ValueError(f"window {window!r} takes no parameters")
        w = fn(Nx, sym=sym)
    elif npar == -1:            # tukey: one optional parameter
        w = fn(Nx, *args, sym=sym)
    elif npar == -2:            # exponential: center/tau optional
        w = fn(Nx, *args, sym=sym)
    else:
        if len(args) != npar:
            raise ValueError(f"window {window!r} requires {npar} "
                             f"parameter(s), got {len(args)}")
        w = fn(Nx, *args, sym=sym)
    return np.asarray(w, np.float64)
