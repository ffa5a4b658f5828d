"""scipy.signal utility surface (detrend, hilbert2, wiener, deconvolve,
correlation_lags, choose_conv_method) vs scipy.

Reference scope: no counterpart in martinvuyk/hackathon-fft — these are
scipy.signal companions of the convolution/spectral layers (parity
targets in scipy/signal/_signaltools.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy import signal as sps

import tpufft
from tpufft.sigtools import (choose_conv_method, correlation_lags,
                             deconvolve, detrend, wiener)
from tpufft.signal import hilbert2
from tpufft.core import SplitComplex


@pytest.fixture
def rng():
    return np.random.default_rng(99)


@pytest.mark.parametrize("typ", ["constant", "linear"])
def test_detrend_matches_scipy(rng, typ):
    x = rng.standard_normal((3, 400)) + np.linspace(0, 5, 400)
    np.testing.assert_allclose(detrend(x, type=typ),
                               sps.detrend(x, type=typ), atol=1e-12)


def test_detrend_breakpoints_and_axis(rng):
    x = rng.standard_normal((3, 400)) + np.linspace(0, 5, 400)
    np.testing.assert_allclose(detrend(x, bp=[100, 250]),
                               sps.detrend(x, bp=[100, 250]), atol=1e-12)
    np.testing.assert_allclose(detrend(x.T, axis=0),
                               sps.detrend(x.T, axis=0), atol=1e-12)
    with pytest.raises(ValueError, match="Trend type"):
        detrend(x, type="bogus")
    with pytest.raises(ValueError, match="Breakpoints"):
        detrend(x, bp=[500])


def test_detrend_device_path(rng):
    x = (rng.standard_normal((2, 300))
         + np.linspace(0, 3, 300)).astype(np.float32)
    y = detrend(jnp.asarray(x))
    assert isinstance(y, jax.Array)
    np.testing.assert_allclose(np.asarray(y),
                               sps.detrend(x.astype(np.float64)),
                               rtol=1e-4, atol=1e-4)


def test_hilbert2_matches_scipy(rng):
    im = rng.standard_normal((32, 48))
    np.testing.assert_allclose(hilbert2(im), sps.hilbert2(im), atol=1e-12)
    np.testing.assert_allclose(hilbert2(im, N=(40, 56)),
                               sps.hilbert2(im, N=(40, 56)), atol=1e-12)
    np.testing.assert_allclose(hilbert2(im, N=16),
                               sps.hilbert2(im, N=16), atol=1e-12)


def test_hilbert2_errors(rng):
    im = rng.standard_normal((8, 8))
    with pytest.raises(ValueError, match="real"):
        hilbert2(im + 0j)
    with pytest.raises(ValueError, match="positive"):
        hilbert2(im, N=0)
    with pytest.raises(ValueError, match="two positive|exactly"):
        hilbert2(im, N=(1, 2, 3))
    with pytest.raises(ValueError, match="distinct"):
        hilbert2(im, axes=(0, 0))


def test_hilbert2_device_path(rng):
    im = rng.standard_normal((16, 32)).astype(np.float32)
    out = hilbert2(jnp.asarray(im))
    ref = sps.hilbert2(im.astype(np.float64))
    if isinstance(out, SplitComplex):
        got = np.asarray(out.re) + 1j * np.asarray(out.im)
    else:
        got = np.asarray(out)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_wiener_matches_scipy(rng):
    im = rng.standard_normal((40, 40)) + 2
    np.testing.assert_allclose(wiener(im), sps.wiener(im), atol=1e-10)
    np.testing.assert_allclose(wiener(im, mysize=5, noise=0.5),
                               sps.wiener(im, mysize=5, noise=0.5),
                               atol=1e-10)
    x1 = rng.standard_normal(200)
    np.testing.assert_allclose(wiener(x1, mysize=7),
                               sps.wiener(x1, mysize=7), atol=1e-10)


def test_wiener_device_path(rng):
    im = (rng.standard_normal((24, 24)) + 2).astype(np.float32)
    out = wiener(jnp.asarray(im))
    assert isinstance(out, jax.Array)
    np.testing.assert_allclose(np.asarray(out),
                               sps.wiener(im.astype(np.float64)),
                               rtol=1e-3, atol=1e-3)


def test_deconvolve_matches_scipy(rng):
    div = rng.standard_normal(7)
    div[0] = 2.0
    sig = np.convolve(div, rng.standard_normal(60))
    q1, r1 = deconvolve(sig, div)
    q0, r0 = sps.deconvolve(sig, div)
    np.testing.assert_allclose(q1, q0, atol=1e-10)
    np.testing.assert_allclose(r1, r0, atol=1e-10)
    # reconstruction identity
    np.testing.assert_allclose(np.convolve(div, q1) + r1, sig, atol=1e-9)
    # divisor longer than signal
    q1, r1 = deconvolve(sig[:3], div)
    assert q1.size == 0 and np.allclose(r1, sig[:3])
    with pytest.raises(ValueError, match="non-empty"):
        deconvolve(np.zeros((2, 2)), div)


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("l1,l2", [(10, 7), (7, 10), (8, 8), (9, 4)])
def test_correlation_lags_matches_scipy(mode, l1, l2):
    np.testing.assert_array_equal(correlation_lags(l1, l2, mode),
                                  sps.correlation_lags(l1, l2, mode))


def test_correlation_lags_pins_correlate(rng):
    # the lag vector must index our correlate output correctly
    a = rng.standard_normal(40)
    b = np.roll(a, 5)[:30]  # b[n] = a[n-5] -> peak at lag -5
    corr = tpufft.correlate(a, b, mode="full")
    lags = correlation_lags(len(a), len(b), "full")
    assert lags[np.argmax(corr)] == -5
    assert lags[np.argmax(sps.correlate(a, b, mode="full"))] == -5


def test_choose_conv_method_contract(rng):
    assert choose_conv_method(rng.standard_normal(5000),
                              rng.standard_normal(500)) == "fft"
    assert choose_conv_method(np.arange(10), np.arange(5)) == "direct"
    c, times = choose_conv_method(rng.standard_normal(1000),
                                  rng.standard_normal(100), measure=True)
    assert c in ("fft", "direct") and set(times) == {"fft", "direct"}
    with pytest.raises(ValueError, match="mode"):
        correlation_lags(5, 5, "bogus")


def test_sigtools_exported():
    for name in ("detrend", "deconvolve", "wiener", "correlation_lags",
                 "choose_conv_method", "hilbert2"):
        assert hasattr(tpufft, name), name
        assert name in tpufft.__all__


@pytest.mark.parametrize("mode", ["interp", "mirror", "constant",
                                  "nearest", "wrap"])
def test_savgol_matches_scipy(rng, mode):
    from tpufft.sigtools import savgol_filter

    x = rng.standard_normal((3, 300))
    kw = dict(mode=mode)
    if mode == "constant":
        kw["cval"] = 1.5
    for wl, po, d in [(11, 3, 0), (21, 4, 1), (31, 5, 2)]:
        np.testing.assert_allclose(
            savgol_filter(x, wl, po, deriv=d, delta=0.7, **kw),
            sps.savgol_filter(x, wl, po, deriv=d, delta=0.7, **kw),
            atol=1e-10)


def test_savgol_axis_device_errors(rng):
    from tpufft.sigtools import savgol_filter

    x = rng.standard_normal((200, 3))
    np.testing.assert_allclose(savgol_filter(x, 11, 3, axis=0),
                               sps.savgol_filter(x, 11, 3, axis=0),
                               atol=1e-10)
    xj = jnp.asarray(x.astype(np.float32))
    y = savgol_filter(xj, 11, 3, axis=0)
    assert isinstance(y, jax.Array)
    np.testing.assert_allclose(np.asarray(y),
                               sps.savgol_filter(x, 11, 3, axis=0),
                               rtol=1e-3, atol=1e-4)
    with pytest.raises(ValueError, match="mode"):
        savgol_filter(x, 11, 3, mode="bogus")
    with pytest.raises(ValueError, match="window_length"):
        savgol_filter(x[:8], 11, 3, axis=0)
    assert "savgol_filter" in tpufft.__all__


# ---------------------------------------------------------------------------
# Round-5: convolve / convolve2d / correlate2d


class TestConvolve:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("method", ["auto", "direct", "fft"])
    def test_int_exact(self, rng, mode, method):
        a = rng.integers(-9, 9, 40)
        b = rng.integers(-9, 9, 7)
        out = tpufft.convolve(a, b, mode, method)
        ref = sps.convolve(a, b, mode, method)
        assert out.dtype == ref.dtype
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("shp1,shp2", [((20, 15), (4, 5)),
                                           ((6, 7, 8), (3, 2, 4)),
                                           ((5,), (12,))])
    @pytest.mark.parametrize("mode", ["full", "same"])
    @pytest.mark.parametrize("method", ["direct", "fft"])
    def test_float_nd(self, rng, shp1, shp2, mode, method):
        x = rng.standard_normal(shp1)
        h = rng.standard_normal(shp2)
        np.testing.assert_allclose(tpufft.convolve(x, h, mode, method),
                                   sps.convolve(x, h, mode, method),
                                   atol=2e-5)

    def test_valid_swap_and_error(self, rng):
        x = rng.standard_normal((4, 5))
        h = rng.standard_normal((9, 9))
        np.testing.assert_allclose(tpufft.convolve(x, h, "valid"),
                                   sps.convolve(x, h, "valid"), atol=1e-8)
        with pytest.raises(ValueError):
            tpufft.convolve(rng.standard_normal((4, 9)),
                            rng.standard_normal((6, 3)), "valid")
        with pytest.raises(ValueError):
            tpufft.convolve(np.ones(4), np.ones((4, 4)))
        with pytest.raises(ValueError):
            tpufft.convolve(np.ones(4), np.ones(4), mode="bogus")
        with pytest.raises(ValueError):
            tpufft.convolve(np.ones(4), np.ones(4), method="bogus")

    @pytest.mark.parametrize("method", ["auto", "direct", "fft"])
    def test_bool_or_semantics(self, rng, method):
        # scipy's bool direct/auto result is the OR-convolution; its
        # bool-fft output is an unrounded FP cast (noise-dependent), so
        # the OR-convolution is the parity target for every method here
        a = rng.integers(0, 2, 30).astype(bool)
        b = rng.integers(0, 2, 5).astype(bool)
        out = tpufft.convolve(a, b, "full", method)
        ref = sps.convolve(a, b, "full", "direct")
        assert out.dtype == np.bool_
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("method", ["direct", "fft"])
    def test_complex(self, rng, method):
        a = rng.standard_normal(20) + 1j * rng.standard_normal(20)
        b = rng.standard_normal(6) + 1j * rng.standard_normal(6)
        out = tpufft.convolve(a, b, "full", method)
        ref = sps.convolve(a, b, "full", method)
        assert out.dtype == ref.dtype
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_jax_input_returns_jax(self, rng):
        x = jnp.asarray(rng.standard_normal(64).astype(np.float32))
        h = jnp.asarray(rng.standard_normal(9).astype(np.float32))
        out = tpufft.convolve(x, h, "same")
        assert isinstance(out, jax.Array)
        np.testing.assert_allclose(
            np.asarray(out),
            sps.convolve(np.asarray(x), np.asarray(h), "same"), atol=1e-4)


class TestConvolve2d:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
    def test_float_and_int(self, rng, mode, boundary):
        x = rng.standard_normal((12, 10))
        h = rng.standard_normal((4, 3))
        np.testing.assert_allclose(
            tpufft.convolve2d(x, h, mode, boundary),
            sps.convolve2d(x, h, mode, boundary), atol=1e-8)
        xi = rng.integers(-5, 5, (12, 10))
        hi = rng.integers(-5, 5, (4, 3))
        np.testing.assert_array_equal(
            tpufft.convolve2d(xi, hi, mode, boundary),
            sps.convolve2d(xi, hi, mode, boundary))

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
    def test_correlate2d(self, rng, mode, boundary):
        x = rng.standard_normal((12, 10))
        h = rng.standard_normal((4, 3))
        np.testing.assert_allclose(
            tpufft.correlate2d(x, h, mode, boundary),
            sps.correlate2d(x, h, mode, boundary), atol=1e-8)

    def test_even_kernel_same_centering(self, rng):
        # correlate2d 'same' crops at K//2; 1-D correlate at (K-1)//2 —
        # scipy's documented inconsistency, mirrored exactly
        x = rng.standard_normal((12, 10))
        h = rng.standard_normal((4, 4))
        np.testing.assert_allclose(tpufft.convolve2d(x, h, "same"),
                                   sps.convolve2d(x, h, "same"), atol=1e-8)
        np.testing.assert_allclose(tpufft.correlate2d(x, h, "same"),
                                   sps.correlate2d(x, h, "same"), atol=1e-8)
        np.testing.assert_allclose(
            tpufft.correlate2d(x, h, "same", "wrap"),
            sps.correlate2d(x, h, "same", "wrap"), atol=1e-8)

    def test_fillvalue_and_complex(self, rng):
        x = rng.standard_normal((12, 10))
        h = rng.standard_normal((4, 3))
        np.testing.assert_allclose(
            tpufft.convolve2d(x, h, "full", "fill", 2.5),
            sps.convolve2d(x, h, "full", "fill", 2.5), atol=1e-8)
        xc = x + 1j * rng.standard_normal((12, 10))
        hc = h + 1j * rng.standard_normal((4, 3))
        np.testing.assert_allclose(tpufft.correlate2d(xc, hc, "full"),
                                   sps.correlate2d(xc, hc, "full"),
                                   atol=1e-8)

    def test_errors(self):
        with pytest.raises(ValueError):
            tpufft.convolve2d(np.ones(5), np.ones((2, 2)))
        with pytest.raises(ValueError):
            tpufft.convolve2d(np.ones((5, 5)), np.ones((2, 2)),
                              boundary="bogus")
        with pytest.raises(ValueError):
            tpufft.convolve2d(np.ones((3, 3)), np.ones((5, 5)),
                              "full", "wrap")


# Round-5: rank filters and vectorstrength


class TestRankFilters:
    def test_order_filter(self, rng):
        a = rng.standard_normal((12, 11))
        dom = np.ones((3, 5))
        dom[0, 0] = 0
        dom[2, 4] = 0
        for rank in (0, 5, 12):
            np.testing.assert_allclose(tpufft.order_filter(a, dom, rank),
                                       sps.order_filter(a, dom, rank))
        with pytest.raises(ValueError):
            tpufft.order_filter(a, np.ones((2, 3)), 1)   # even domain
        with pytest.raises(ValueError):
            tpufft.order_filter(a, dom, 13)              # rank too big

    @pytest.mark.parametrize("ks", [3, (3, 5), (5, 3)])
    def test_medfilt_2d(self, rng, ks):
        a = rng.standard_normal((12, 11))
        np.testing.assert_allclose(tpufft.medfilt(a, ks),
                                   sps.medfilt(a, ks))

    def test_medfilt_other_ranks(self, rng):
        v = rng.standard_normal(300)
        np.testing.assert_allclose(tpufft.medfilt(v, 7),
                                   sps.medfilt(v, 7))
        v3 = rng.standard_normal((6, 7, 8))
        np.testing.assert_allclose(tpufft.medfilt(v3, (3, 3, 5)),
                                   sps.medfilt(v3, (3, 3, 5)))
        a = rng.standard_normal((12, 11))
        np.testing.assert_allclose(tpufft.medfilt2d(a, 5),
                                   sps.medfilt2d(a, 5))
        with pytest.raises(ValueError):
            tpufft.medfilt(v, 4)                          # even kernel
        with pytest.raises(ValueError):
            tpufft.medfilt2d(v, 3)                        # not 2-D


def test_vectorstrength(rng):
    ev = rng.uniform(0, 100, 200)
    sm, pm = tpufft.vectorstrength(ev, 3.7)
    sr, pr = sps.vectorstrength(ev, 3.7)
    assert np.isclose(sm, sr) and np.isclose(pm, pr)
    sm, pm = tpufft.vectorstrength(ev, [1.0, 2.5, 7.7])
    sr, pr = sps.vectorstrength(ev, [1.0, 2.5, 7.7])
    np.testing.assert_allclose(sm, sr)
    np.testing.assert_allclose(pm, pr)
    with pytest.raises(ValueError):
        tpufft.vectorstrength(ev, -1.0)
    with pytest.raises(ValueError):
        tpufft.vectorstrength(np.ones((2, 2)), 1.0)


def test_rank_filter_chunked_path(rng, monkeypatch):
    # force the block loop to take many iterations and check exactness
    from tpufft import sigtools as st
    monkeypatch.setattr(st, "_RANK_CHUNK_BYTES", 1 << 12)
    a = rng.standard_normal((64, 50))
    np.testing.assert_allclose(tpufft.medfilt(a, (5, 3)),
                               sps.medfilt(a, (5, 3)))
