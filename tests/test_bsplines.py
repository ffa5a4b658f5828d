"""tpufft.bsplines vs scipy.signal: spline prefilters, evaluation,
symmetric IIR. The exact-solve design means lamb=0 / order-1 cases
match scipy to ~1e-12; the order-2 / smoothing cases match to scipy's
own startup-truncation error AND satisfy the defining banded equations
to machine precision (the stronger property, asserted below)."""

import numpy as np
import pytest
import scipy.signal as sps

import tpufft
from tpufft import bsplines as bs


@pytest.fixture
def x(rng=None):
    return np.random.default_rng(0).standard_normal(60)


def _fold_apply(c, taps):
    N = len(c)
    out = np.zeros(N)
    for n in range(N):
        for d, v in taps.items():
            j = n + d
            while j < 0 or j > N - 1:
                j = -j - 1 if j < 0 else 2 * N - 1 - j
            out[n] += v * c[j]
    return out


def test_gauss_spline():
    g = np.linspace(-3, 3, 50)
    for n in (1, 3, 5):
        np.testing.assert_allclose(bs.gauss_spline(g, n),
                                   sps.gauss_spline(g, n), atol=1e-14)


def test_cspline_qspline_1d(x):
    np.testing.assert_allclose(bs.cspline1d(x), sps.cspline1d(x),
                               atol=1e-10)
    np.testing.assert_allclose(bs.qspline1d(x), sps.qspline1d(x),
                               atol=1e-10)
    with pytest.raises(ValueError):
        bs.qspline1d(x, lamb=1.0)
    # the interpolation property itself: B3 * c == x exactly
    np.testing.assert_allclose(
        _fold_apply(bs.cspline1d(x), bs._spline_taps("cubic", 0.0)), x,
        atol=1e-12)


def test_cspline_smoothing(x):
    mine = bs.cspline1d(x, 2.5)
    ref = sps.cspline1d(x, 2.5)
    # interior agrees; edges differ by scipy's truncated startup
    np.testing.assert_allclose(mine[8:-8], ref[8:-8], atol=1e-4)
    # ours satisfies the smoothing normal equations exactly
    np.testing.assert_allclose(
        _fold_apply(mine, bs._spline_taps("cubic", 2.5)), x, atol=1e-12)


def test_symiirorder1(x):
    for c0, z1 in [(1.5, 0.4), (6.0, np.sqrt(3) - 2), (2.0, -0.6)]:
        np.testing.assert_allclose(bs.symiirorder1(x, c0, z1),
                                   sps.symiirorder1(x, c0, z1),
                                   atol=1e-9)
    with pytest.raises(ValueError):
        bs.symiirorder1(x, 1.0, 1.5)


def test_symiirorder2(x):
    for r, w in [(0.5, 0.8), (0.3, 1.7)]:
        np.testing.assert_allclose(bs.symiirorder2(x, r, w),
                                   sps.symiirorder2(x, r, w), atol=1e-3)
    # near-unit poles: scipy's startup sums may fail to converge; the
    # exact solve simply works — check the defining residual
    r, w = 0.95, 0.2
    cs = 1 - 2 * r * np.cos(w) + r * r
    a = np.array([1.0, -2 * r * np.cos(w), r * r])
    taps = {}
    for i, ai in enumerate(a):
        for j, aj in enumerate(a):
            taps[i - j] = taps.get(i - j, 0.0) + ai * aj / (cs * cs)
    out = bs.symiirorder2(x, r, w)
    np.testing.assert_allclose(_fold_apply(out, taps), x, atol=1e-9)
    with pytest.raises(ValueError):
        bs.symiirorder2(x, 1.2, 0.5)


def test_spline_eval(x):
    cj = sps.cspline1d(x)
    qj = sps.qspline1d(x)
    newx = np.linspace(-5, 70, 300)     # covers mirrored out-of-range
    np.testing.assert_allclose(bs.cspline1d_eval(cj, newx),
                               sps.cspline1d_eval(cj, newx), atol=1e-12)
    np.testing.assert_allclose(bs.qspline1d_eval(qj, newx),
                               sps.qspline1d_eval(qj, newx), atol=1e-12)
    np.testing.assert_allclose(
        bs.cspline1d_eval(cj, newx, dx=0.5, x0=-2),
        sps.cspline1d_eval(cj, newx, dx=0.5, x0=-2), atol=1e-12)
    # interpolation: evaluating at the knots returns the signal
    np.testing.assert_allclose(
        bs.cspline1d_eval(cj, np.arange(len(x), dtype=float)), x,
        atol=1e-9)


def test_2d_and_sepfir(x):
    rng = np.random.default_rng(1)
    im = rng.standard_normal((24, 31))
    # scipy's 2-D recursion truncates its startup sums at ~1e-6 by
    # default; the exact solve sits inside that envelope
    np.testing.assert_allclose(bs.cspline2d(im), sps.cspline2d(im),
                               atol=1e-5)
    np.testing.assert_allclose(bs.qspline2d(im), sps.qspline2d(im),
                               atol=1e-5)
    hr = np.array([1.0, 2.0, -1.0])
    hc = np.array([0.5, 3.0, 1.0, -0.2, 0.1])
    np.testing.assert_allclose(bs.sepfir2d(im, hr, hc),
                               sps.sepfir2d(im, hr, hc), atol=1e-12)
    with pytest.raises(ValueError):
        bs.sepfir2d(im, np.ones(2), hc)     # even kernel
    # spline_filter parity at a lmbda where scipy's recursion
    # converges (edges carry scipy's startup truncation)
    ref = sps.spline_filter(im, 3.0)
    out = bs.spline_filter(im, 3.0)
    np.testing.assert_allclose(out, ref, atol=1e-2)
    np.testing.assert_allclose(out[4:-4, 4:-4], ref[4:-4, 4:-4],
                               atol=1e-3)
    # ...and at lmbda=5.0, where scipy 1.17 raises ('Sum to find
    # symmetric boundary conditions did not converge'), the exact
    # solve still delivers
    with pytest.raises(ValueError):
        sps.spline_filter(im, 5.0)
    assert np.all(np.isfinite(bs.spline_filter(im, 5.0)))


def test_exports():
    assert tpufft.cspline1d is bs.cspline1d
    assert tpufft.symiirorder2 is bs.symiirorder2
