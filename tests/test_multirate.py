"""Multirate resampling (upfirdn/resample_poly/decimate) and IIR
filtering (sosfilt/sosfiltfilt) vs scipy.signal.

Reference scope: the reference (martinvuyk/hackathon-fft) has no
resampling or filtering layer — parity targets are scipy's semantics
(scipy/signal/_upfirdn.py, _signaltools.py), the standard consumers of
the batched FFT-convolution path this package accelerates.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy import signal as sps

import tpufft
from tpufft.multirate import upfirdn, resample_poly, decimate
from tpufft.iir import sosfilt, sosfiltfilt


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# ----------------------------------------------------------------------------
# upfirdn


@pytest.mark.parametrize("up,down", [(1, 1), (3, 1), (1, 4), (2, 3),
                                     (5, 2)])
def test_upfirdn_matches_scipy(rng, up, down):
    x = rng.standard_normal((3, 500))
    h = rng.standard_normal(33)
    y1 = upfirdn(h, x, up, down)
    y0 = sps.upfirdn(h, x, up, down)
    assert y1.shape == y0.shape
    np.testing.assert_allclose(y1, y0, atol=1e-10)


@pytest.mark.parametrize("mode", ["constant", "wrap", "edge", "smooth",
                                  "symmetric", "reflect", "antisymmetric",
                                  "antireflect", "line"])
def test_upfirdn_boundary_modes(rng, mode):
    x = rng.standard_normal((2, 300))
    h = rng.standard_normal(21)
    cval = 0.5 if mode == "constant" else 0
    y1 = upfirdn(h, x, 2, 3, mode=mode, cval=cval)
    y0 = sps.upfirdn(h, x, 2, 3, mode=mode, cval=cval)
    np.testing.assert_allclose(y1, y0, atol=1e-10)


def test_upfirdn_axis_and_int_input(rng):
    x = rng.integers(-5, 5, size=(40, 3))
    h = [1.0, 2.0, 1.0]
    y1 = upfirdn(h, x, 2, 1, axis=0)
    y0 = sps.upfirdn(h, x, 2, 1, axis=0)
    np.testing.assert_allclose(y1, y0, atol=1e-12)


def test_upfirdn_docstring_identities():
    # the scipy docstring identities pin the output-length contract
    np.testing.assert_allclose(upfirdn([1, 1, 1], [1., 1, 1]),
                               [1, 2, 3, 2, 1], atol=1e-12)
    np.testing.assert_allclose(upfirdn([1], [1., 2, 3], 3),
                               [1, 0, 0, 2, 0, 0, 3], atol=1e-12)
    np.testing.assert_allclose(upfirdn([1], np.arange(10.), 1, 3),
                               [0, 3, 6, 9], atol=1e-12)


def test_upfirdn_errors(rng):
    x = rng.standard_normal(32)
    with pytest.raises(ValueError, match="mode"):
        upfirdn([1.0, 1.0], x, mode="bogus")
    with pytest.raises(ValueError, match="up and down"):
        upfirdn([1.0], x, up=0)
    with pytest.raises(ValueError, match="1-D"):
        upfirdn(np.ones((2, 2)), x)
    with pytest.raises(ValueError, match="longer"):
        upfirdn(np.ones(64), x[:8], mode="symmetric")


def test_upfirdn_device_path(rng):
    x = rng.standard_normal((3, 400)).astype(np.float32)
    h = rng.standard_normal(17)
    y1 = upfirdn(h, jnp.asarray(x), 2, 3)
    assert isinstance(y1, jax.Array)
    y0 = sps.upfirdn(h, x.astype(np.float64), 2, 3)
    np.testing.assert_allclose(np.asarray(y1), y0, rtol=2e-5, atol=2e-5)


# ----------------------------------------------------------------------------
# resample_poly


@pytest.mark.parametrize("up,down", [(3, 2), (2, 5), (7, 3), (160, 441)])
def test_resample_poly_matches_scipy(rng, up, down):
    x = rng.standard_normal((3, 600))
    y1 = resample_poly(x, up, down, axis=-1)
    y0 = sps.resample_poly(x, up, down, axis=-1)
    assert y1.shape == y0.shape
    np.testing.assert_allclose(y1, y0, atol=1e-10)


@pytest.mark.parametrize("padtype", ["constant", "mean", "median", "line",
                                     "maximum", "minimum"])
def test_resample_poly_padtypes(rng, padtype):
    x = rng.standard_normal(400) + 3.0
    y1 = resample_poly(x, 2, 3, padtype=padtype)
    y0 = sps.resample_poly(x, 2, 3, padtype=padtype)
    np.testing.assert_allclose(y1, y0, atol=1e-10)


def test_resample_poly_window_array_and_axis(rng):
    x = rng.standard_normal((200, 4))
    w = sps.firwin(31, 0.4)
    y1 = resample_poly(x, 2, 1, axis=0, window=w)
    y0 = sps.resample_poly(x, 2, 1, axis=0, window=w)
    np.testing.assert_allclose(y1, y0, atol=1e-10)


def test_resample_poly_errors(rng):
    x = rng.standard_normal(64)
    with pytest.raises(ValueError, match=">= 1"):
        resample_poly(x, 0, 2)
    with pytest.raises(ValueError, match="cval"):
        resample_poly(x, 2, 3, padtype="mean", cval=1.0)
    with pytest.raises(ValueError, match="padtype"):
        resample_poly(x, 2, 3, padtype="bogus")


def test_resample_poly_device_path(rng):
    x = rng.standard_normal((2, 300)).astype(np.float32)
    y1 = resample_poly(jnp.asarray(x), 3, 2, axis=-1)
    assert isinstance(y1, jax.Array)
    y0 = sps.resample_poly(x.astype(np.float64), 3, 2, axis=-1)
    np.testing.assert_allclose(np.asarray(y1), y0, rtol=2e-5, atol=2e-5)


# ----------------------------------------------------------------------------
# sosfilt / sosfiltfilt


def test_sosfilt_matches_scipy(rng):
    sos = sps.cheby1(8, 0.05, 0.3, output="sos")
    x = rng.standard_normal((3, 700))
    np.testing.assert_allclose(sosfilt(sos, x), sps.sosfilt(sos, x),
                               atol=1e-10)


def test_sosfilt_zi_and_zf(rng):
    sos = sps.butter(4, 0.2, output="sos")
    x = rng.standard_normal((2, 300))
    zi = np.tile(sps.sosfilt_zi(sos)[:, None, :], (1, 2, 1))
    y1, zf1 = sosfilt(sos, x, zi=zi)
    y0, zf0 = sps.sosfilt(sos, x, zi=zi)
    np.testing.assert_allclose(y1, y0, atol=1e-12)
    np.testing.assert_allclose(zf1, zf0, atol=1e-12)
    # streaming equivalence: two chunks with carried state == one call
    # (zero initial state, matching the zi-less single call)
    ya, zfa = sosfilt(sos, x[:, :100], zi=np.zeros_like(zi))
    yb, _ = sosfilt(sos, x[:, 100:], zi=zfa)
    np.testing.assert_allclose(np.concatenate([ya, yb], -1),
                               sps.sosfilt(sos, x), atol=1e-12)


def test_sosfilt_axis0(rng):
    sos = sps.butter(6, 0.3, output="sos")
    x = rng.standard_normal((250, 3))
    np.testing.assert_allclose(sosfilt(sos, x, axis=0),
                               sps.sosfilt(sos, x, axis=0), atol=1e-10)


def test_sosfilt_errors(rng):
    with pytest.raises(ValueError, match="n_sections"):
        sosfilt(np.ones((2, 5)), np.ones(16))
    with pytest.raises(ValueError, match="zi"):
        sosfilt(sps.butter(2, 0.5, output="sos"), np.ones(16),
                zi=np.ones((1, 3)))


@pytest.mark.parametrize("padtype", ["odd", "even", "constant", None])
def test_sosfiltfilt_matches_scipy(rng, padtype):
    sos = sps.cheby1(6, 0.1, 0.25, output="sos")
    x = rng.standard_normal((2, 500))
    np.testing.assert_allclose(
        sosfiltfilt(sos, x, padtype=padtype),
        sps.sosfiltfilt(sos, x, padtype=padtype), atol=1e-9)


def test_sosfiltfilt_padlen_and_errors(rng):
    sos = sps.butter(4, 0.2, output="sos")
    x = rng.standard_normal(200)
    np.testing.assert_allclose(sosfiltfilt(sos, x, padlen=50),
                               sps.sosfiltfilt(sos, x, padlen=50),
                               atol=1e-10)
    with pytest.raises(ValueError, match="padlen"):
        sosfiltfilt(sos, x[:10])
    with pytest.raises(ValueError, match="padtype"):
        sosfiltfilt(sos, x, padtype="bogus")


def test_sosfilt_device_path_and_grad(rng):
    sos = sps.butter(4, 0.25, output="sos")
    x = rng.standard_normal((2, 300)).astype(np.float32)
    xj = jnp.asarray(x)
    y1 = sosfilt(sos, xj)
    assert isinstance(y1, jax.Array) and y1.dtype == jnp.float32
    y0 = sps.sosfilt(sos, x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(y1), y0, rtol=2e-4, atol=2e-5)
    g = jax.grad(lambda v: jnp.sum(sosfilt(sos, v) ** 2))(xj)
    assert np.isfinite(np.asarray(g)).all()


# ----------------------------------------------------------------------------
# decimate


@pytest.mark.parametrize("ftype", ["fir", "iir"])
@pytest.mark.parametrize("zero_phase", [True, False])
@pytest.mark.parametrize("q", [2, 4, 13])
def test_decimate_matches_scipy(rng, ftype, zero_phase, q):
    x = rng.standard_normal((2, 800))
    y1 = decimate(x, q, ftype=ftype, zero_phase=zero_phase)
    y0 = sps.decimate(x, q, ftype=ftype, zero_phase=zero_phase)
    assert y1.shape == y0.shape
    np.testing.assert_allclose(y1, y0, atol=1e-9)


def test_decimate_axis_and_order(rng):
    x = rng.standard_normal((600, 3))
    np.testing.assert_allclose(decimate(x, 3, axis=0),
                               sps.decimate(x, 3, axis=0), atol=1e-9)
    np.testing.assert_allclose(decimate(x, 3, n=4, axis=0),
                               sps.decimate(x, 3, n=4, axis=0), atol=1e-9)


def test_decimate_errors(rng):
    x = rng.standard_normal(64)
    with pytest.raises(ValueError, match="ftype"):
        decimate(x, 2, ftype="bogus")
    with pytest.raises(ValueError, match="positive"):
        decimate(x, 0)


def test_decimate_device_path(rng):
    x = rng.standard_normal((2, 600)).astype(np.float32)
    y1 = decimate(jnp.asarray(x), 4)
    assert isinstance(y1, jax.Array)
    y0 = sps.decimate(x.astype(np.float64), 4)
    np.testing.assert_allclose(np.asarray(y1), y0, rtol=5e-4, atol=5e-5)


def test_multirate_exported():
    for name in ("upfirdn", "resample_poly", "decimate", "sosfilt",
                 "sosfiltfilt"):
        assert hasattr(tpufft, name), name
        assert name in tpufft.__all__


# ----------------------------------------------------------------------------
# lfilter / filtfilt (transfer-function form)


def test_lfilter_iir_matches_scipy(rng):
    b, a = sps.butter(5, 0.25)
    x = rng.standard_normal((3, 600))
    np.testing.assert_allclose(tpufft.lfilter(b, a, x),
                               sps.lfilter(b, a, x), atol=1e-10)
    zi = np.tile(sps.lfilter_zi(b, a), (3, 1))
    y1, zf1 = tpufft.lfilter(b, a, x, zi=zi)
    y0, zf0 = sps.lfilter(b, a, x, zi=zi)
    np.testing.assert_allclose(y1, y0, atol=1e-10)
    np.testing.assert_allclose(zf1, zf0, atol=1e-10)


def test_lfilter_fir_paths(rng):
    bf = sps.firwin(101, 0.3)  # order 100 > scan cap: FFT-conv branch
    x = rng.standard_normal((2, 400))
    np.testing.assert_allclose(tpufft.lfilter(bf, [1.0], x),
                               sps.lfilter(bf, [1.0], x), atol=1e-10)
    zi = rng.standard_normal((2, 100))
    y1, zf1 = tpufft.lfilter(bf, [1.0], x, zi=zi)
    y0, zf0 = sps.lfilter(bf, [1.0], x, zi=zi)
    np.testing.assert_allclose(y1, y0, atol=1e-10)
    np.testing.assert_allclose(zf1, zf0, atol=1e-10)
    # signal shorter than the filter: zi shifts into zf
    y1, zf1 = tpufft.lfilter(bf, [1.0], x[:, :50], zi=zi)
    y0, zf0 = sps.lfilter(bf, [1.0], x[:, :50], zi=zi)
    np.testing.assert_allclose(y1, y0, atol=1e-10)
    np.testing.assert_allclose(zf1, zf0, atol=1e-10)


def test_lfilter_long_b_arma_and_errors(rng):
    x = rng.standard_normal((2, 300))
    blong = sps.firwin(64, 0.4)
    a2 = [1.0, -0.5, 0.25]
    np.testing.assert_allclose(tpufft.lfilter(blong, a2, x),
                               sps.lfilter(blong, a2, x), atol=1e-9)
    with pytest.raises(ValueError, match="second-order sections"):
        tpufft.lfilter(blong, np.r_[1.0, np.ones(30)], x,
                       zi=np.zeros((2, 63)))
    with pytest.raises(ValueError, match="nonzero"):
        tpufft.lfilter([1.0], [0.0, 1.0], x)
    with pytest.raises(ValueError, match="zi"):
        tpufft.lfilter([1.0, 0.5], [1.0, -0.3], x, zi=np.zeros((2, 7)))


def test_lfilter_device_path(rng):
    b, a = sps.butter(4, 0.3)
    x = rng.standard_normal((2, 500)).astype(np.float32)
    y = tpufft.lfilter(b, a, jnp.asarray(x))
    assert isinstance(y, jax.Array)
    np.testing.assert_allclose(np.asarray(y),
                               sps.lfilter(b, a, x.astype(np.float64)),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("padtype", ["odd", "even", "constant", None])
def test_filtfilt_matches_scipy(rng, padtype):
    b, a = sps.butter(4, 0.2)
    x = rng.standard_normal((2, 400))
    np.testing.assert_allclose(
        tpufft.filtfilt(b, a, x, padtype=padtype),
        sps.filtfilt(b, a, x, padtype=padtype), atol=1e-9)


def test_filtfilt_padlen_and_gust(rng):
    b, a = sps.butter(3, 0.3)
    x = rng.standard_normal(300)
    np.testing.assert_allclose(tpufft.filtfilt(b, a, x, padlen=33),
                               sps.filtfilt(b, a, x, padlen=33),
                               atol=1e-10)
    with pytest.raises(NotImplementedError, match="gust|pad"):
        tpufft.filtfilt(b, a, x, method="gust")
    with pytest.raises(ValueError, match="padlen"):
        tpufft.filtfilt(b, a, x[:5])
