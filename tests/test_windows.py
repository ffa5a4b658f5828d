"""Native window functions (tpufft/windows.py) vs scipy.signal.

Covers VERDICT round-4 item 3: the default spectral surface must work on
a jax+numpy-only install. Parity target: scipy/signal/windows/_windows.py
(no counterpart in the reference)."""

import sys

import numpy as np
import pytest
import scipy.signal as sps

from tpufft.windows import get_window

NOPARAM = ["boxcar", "triang", "bartlett", "hann", "hamming", "blackman",
           "blackmanharris", "nuttall", "flattop", "barthann", "cosine",
           "bohman", "parzen", "lanczos", "tukey", "exponential"]
PARAM = [("kaiser", 8.6), ("kaiser", 0.5), ("gaussian", 7.0),
         ("general_gaussian", 1.5, 5.0), ("general_hamming", 0.7),
         ("tukey", 0.25), ("tukey", 0.75), ("exponential", None, 3.0),
         ("general_cosine", (0.4, 0.5, 0.1))]


@pytest.mark.parametrize("name", NOPARAM)
@pytest.mark.parametrize("M", [1, 2, 7, 64, 255, 256])
@pytest.mark.parametrize("fftbins", [True, False])
def test_noparam_parity(name, M, fftbins):
    got = get_window(name, M, fftbins=fftbins)
    want = sps.get_window(name, M, fftbins=fftbins)
    np.testing.assert_allclose(got, want, atol=1e-15)
    assert got.dtype == np.float64


@pytest.mark.parametrize("spec", PARAM)
@pytest.mark.parametrize("M", [8, 65, 128])
@pytest.mark.parametrize("fftbins", [True, False])
def test_param_parity(spec, M, fftbins):
    got = get_window(spec, M, fftbins=fftbins)
    want = sps.get_window(spec, M, fftbins=fftbins)
    np.testing.assert_allclose(got, want, atol=1e-15)


def test_aliases_and_float_beta():
    np.testing.assert_allclose(get_window("han", 32), get_window("hann", 32))
    np.testing.assert_allclose(get_window("blk", 32),
                               sps.get_window("blackman", 32))
    # bare float means kaiser(beta), scipy semantics
    np.testing.assert_allclose(get_window(8.6, 64), sps.get_window(8.6, 64))
    # numpy scalars coerce like scipy's float(window)
    np.testing.assert_allclose(get_window(np.float32(8.6), 64),
                               sps.get_window(np.float32(8.6), 64))
    np.testing.assert_allclose(get_window(np.int64(8), 64),
                               sps.get_window(np.int64(8), 64))
    # non-string tuple head is a clean ValueError (scipy parity)
    with pytest.raises(ValueError, match="window-name string"):
        get_window((8.6,), 64)


def test_scipy_only_fallback():
    # chebwin needs scipy.special; routes through the fallback
    got = get_window(("chebwin", 100), 64)
    want = sps.get_window(("chebwin", 100), 64)
    np.testing.assert_allclose(got, want, atol=1e-15)


def test_validation():
    with pytest.raises(ValueError):
        get_window("hann", -3)
    with pytest.raises(ValueError):
        get_window(("hann", 0.5), 32)        # hann takes no parameters
    with pytest.raises(ValueError):
        get_window(("kaiser",), 32)          # kaiser requires beta
    with pytest.raises(ValueError):
        get_window((), 32)
    with pytest.raises(ValueError):
        get_window(np.ones(32), 32)          # arrays rejected like scipy


class _BlockScipy:
    """Context manager: make every (re-)import of scipy raise ImportError
    without disturbing modules already holding references."""

    def __enter__(self):
        self._saved = {k: sys.modules.pop(k) for k in list(sys.modules)
                       if k == "scipy" or k.startswith("scipy.")}
        sys.modules["scipy"] = None          # import machinery -> ImportError
        return self

    def __exit__(self, *exc):
        del sys.modules["scipy"]
        sys.modules.update(self._saved)
        return False


def test_default_spectral_surface_without_scipy():
    """welch/stft/csd/get_window on DEFAULT arguments must not require
    scipy (VERDICT item 3; reference bar: zero runtime deps)."""
    import tpufft

    x = np.random.default_rng(0).standard_normal(2048)
    y = np.random.default_rng(1).standard_normal(2048)
    with _BlockScipy():
        w = tpufft.get_window("hann", 256)
        f, p = tpufft.welch(x)
        fz, t, Z = tpufft.stft(x)
        fc, pxy = tpufft.csd(x, y)
        fs, ts, sxx = tpufft.spectrogram(x)
        win = get_window(("kaiser", 5.0), 128)
    # and the numbers match the scipy-present path
    np.testing.assert_allclose(w, sps.get_window("hann", 256))
    np.testing.assert_allclose(p, tpufft.welch(x)[1])
    np.testing.assert_allclose(win, sps.get_window(("kaiser", 5.0), 128))
    with _BlockScipy():
        # the round-5 natively-implemented exotica work without scipy...
        np.testing.assert_allclose(get_window(("chebwin", 100), 64),
                                   sps.get_window(("chebwin", 100), 64))
        np.testing.assert_allclose(get_window(("dpss", 3), 64),
                                   sps.get_window(("dpss", 3), 64))
        # ...and only truly unknown names hit the scipy fallback error
        with pytest.raises(ValueError, match="scipy is not"):
            get_window("no_such_window", 64)


def test_shorttime_from_window_without_scipy():
    from tpufft import ShortTimeFFT

    with _BlockScipy():
        s = ShortTimeFFT.from_window("hann", 1.0, 256, 128)
    np.testing.assert_allclose(s.win, sps.get_window("hann", 256))


# ---------------------------------------------------------------------------
# Round-5 native exotica: chebwin, taylor, kaiser_bessel_derived, dpss


class TestExoticWindows:
    @pytest.mark.parametrize("M", [8, 9, 51, 64])
    @pytest.mark.parametrize("at", [45, 60, 100])
    def test_chebwin(self, M, at):
        from tpufft.windows import chebwin
        np.testing.assert_allclose(chebwin(M, at), sps.windows.chebwin(M, at),
                                   atol=1e-12)
        np.testing.assert_allclose(chebwin(M, at, sym=False),
                                   sps.windows.chebwin(M, at, sym=False),
                                   atol=1e-12)

    def test_chebwin_low_attenuation_warns(self):
        from tpufft.windows import chebwin
        with pytest.warns(UserWarning):
            chebwin(51, 30)

    @pytest.mark.parametrize("M", [8, 9, 51, 64])
    @pytest.mark.parametrize("nbar,sll,norm", [(4, 30, True), (6, 50, True),
                                               (4, 30, False)])
    def test_taylor(self, M, nbar, sll, norm):
        from tpufft.windows import taylor
        np.testing.assert_allclose(
            taylor(M, nbar, sll, norm),
            sps.windows.taylor(M, nbar, sll, norm), atol=1e-12)
        np.testing.assert_allclose(
            taylor(M, nbar, sll, norm, sym=False),
            sps.windows.taylor(M, nbar, sll, norm, sym=False), atol=1e-12)

    @pytest.mark.parametrize("M", [8, 64, 128])
    @pytest.mark.parametrize("beta", [4.0, 8.6])
    def test_kaiser_bessel_derived(self, M, beta):
        from tpufft.windows import kaiser_bessel_derived as kbd
        np.testing.assert_allclose(
            kbd(M, beta), sps.windows.kaiser_bessel_derived(M, beta),
            atol=1e-12)

    def test_kbd_errors(self):
        from tpufft.windows import kaiser_bessel_derived as kbd
        with pytest.raises(ValueError):
            kbd(63, 8.6)           # odd length
        with pytest.raises(ValueError):
            kbd(64, 8.6, sym=False)

    @pytest.mark.parametrize("M,NW,K", [(64, 3, 4), (65, 2.5, 3),
                                        (128, 4, 7)])
    def test_dpss(self, M, NW, K):
        from tpufft.windows import dpss
        np.testing.assert_allclose(dpss(M, NW, K), sps.windows.dpss(M, NW, K),
                                   atol=1e-8)
        for nm in ("approximate", "subsample"):
            np.testing.assert_allclose(
                dpss(M, NW, K, norm=nm),
                sps.windows.dpss(M, NW, K, norm=nm), atol=1e-8)
        wm, rm = dpss(M, NW, K, return_ratios=True)
        wr, rr = sps.windows.dpss(M, NW, K, return_ratios=True)
        np.testing.assert_allclose(rm, rr, atol=1e-8)
        np.testing.assert_allclose(
            dpss(M, NW, K, sym=False), sps.windows.dpss(M, NW, K, sym=False),
            atol=1e-8)

    def test_dpss_singleton_and_errors(self):
        from tpufft.windows import dpss
        np.testing.assert_allclose(dpss(64, 3), sps.windows.dpss(64, 3),
                                   atol=1e-8)
        w, r = dpss(64, 3, return_ratios=True)
        w2, r2 = sps.windows.dpss(64, 3, return_ratios=True)
        assert np.isclose(r, r2) and w.ndim == 1
        for bad in (dict(Kmax=0), dict(Kmax=100), dict(NW=40.0),
                    dict(norm="bogus")):
            with pytest.raises(ValueError):
                dpss(64, bad.pop("NW", 3), **bad)

    def test_get_window_dispatch(self):
        for spec, M, kw in [(("chebwin", 60), 65, {}),
                            ("taylor", 51, {}),
                            (("taylor", 5, 40), 51, {}),
                            (("dpss", 3), 64, {}),
                            (("kaiser bessel derived", 8.6), 64,
                             {"fftbins": False})]:
            np.testing.assert_allclose(
                get_window(spec, M, **kw),
                sps.get_window(spec, M, **kw), atol=1e-9)
        # scipy-matching rejection: KBD is symmetric-only, so periodic
        # (fftbins=True) raises in both libraries
        with pytest.raises(ValueError):
            get_window(("kaiser bessel derived", 8.6), 64)

    def test_submodule_exported(self):
        import tpufft
        assert tpufft.windows.hann is not None
        assert hasattr(tpufft.windows, "dpss")
