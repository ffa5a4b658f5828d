"""tpufft.peaks vs scipy.signal: exact index/property parity for the
peak-finding surface (find_peaks filter chain, prominences, widths,
argrel family) on adversarial inputs — plateaus, borders, equal
heights, wlen-restricted windows."""

import numpy as np
import pytest
import scipy.signal as sps

import tpufft
from tpufft import peaks as pk


@pytest.fixture(scope="module")
def signals():
    rng = np.random.default_rng(0)
    return {
        "noise": rng.standard_normal(500),
        "walk": np.cumsum(rng.standard_normal(1000)),
        "sine": np.sin(np.linspace(0, 40, 800))
        + 0.3 * rng.standard_normal(800),
        "plateau": np.repeat(rng.integers(0, 8, 120),
                             rng.integers(1, 5, 120)).astype(float),
        "edges": np.array([5.0, 1, 2, 1, 3, 3, 3, 1, 4, 4, 1, 6.0]),
    }


def test_local_maxima_and_plateaus(signals):
    for x in signals.values():
        np.testing.assert_array_equal(tpufft.find_peaks(x)[0],
                                      sps.find_peaks(x)[0])


@pytest.mark.parametrize("wlen", [None, 31, 10])
def test_peak_prominences(signals, wlen):
    for x in signals.values():
        peaks, _ = sps.find_peaks(x)
        mine = pk.peak_prominences(x, peaks, wlen)
        ref = sps.peak_prominences(x, peaks, wlen)
        for a, b in zip(mine, ref):
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("rel_height", [0.5, 0.75, 1.0])
def test_peak_widths(signals, rel_height):
    for x in signals.values():
        peaks, _ = sps.find_peaks(x)
        if not len(peaks):
            continue
        mine = pk.peak_widths(x, peaks, rel_height)
        ref = sps.peak_widths(x, peaks, rel_height)
        for a, b in zip(mine, ref):
            np.testing.assert_allclose(a, b)


@pytest.mark.parametrize("kw", [
    dict(height=0.5), dict(height=(0.1, 2.0)), dict(threshold=0.2),
    dict(distance=7), dict(distance=1.5), dict(prominence=0.8),
    dict(width=3), dict(width=(2, 9), rel_height=0.7),
    dict(plateau_size=2), dict(plateau_size=(1, 3)),
    dict(height=0.2, distance=5, prominence=0.5, width=2),
    dict(prominence=0.5, wlen=25),
])
def test_find_peaks_filters(signals, kw):
    for x in signals.values():
        p_m, prop_m = tpufft.find_peaks(x, **kw)
        p_r, prop_r = sps.find_peaks(x, **kw)
        np.testing.assert_array_equal(p_m, p_r)
        assert set(prop_m) == set(prop_r)
        for key in prop_r:
            np.testing.assert_allclose(prop_m[key], prop_r[key])


def test_find_peaks_array_conditions(signals):
    for x in signals.values():
        h = np.full(x.shape, 0.3)
        h[:len(h) // 2] = 1.2
        p_m, _ = tpufft.find_peaks(x, height=h)
        p_r, _ = sps.find_peaks(x, height=h)
        np.testing.assert_array_equal(p_m, p_r)


def test_find_peaks_errors():
    x = np.sin(np.linspace(0, 10, 100))
    with pytest.raises(ValueError):
        tpufft.find_peaks(x, distance=0.5)
    with pytest.raises(ValueError):
        tpufft.find_peaks(np.ones((3, 3)))
    with pytest.raises(ValueError):
        tpufft.find_peaks(x, prominence=1, wlen=1)
    with pytest.raises(ValueError):
        tpufft.peak_prominences(x, np.array([1000]))
    with pytest.raises(TypeError):
        tpufft.peak_prominences(x, np.array([1.5]))


@pytest.mark.parametrize("order", [1, 3])
@pytest.mark.parametrize("mode", ["clip", "wrap"])
def test_argrel_family(signals, order, mode):
    for x in signals.values():
        np.testing.assert_array_equal(
            pk.argrelmax(x, order=order, mode=mode)[0],
            sps.argrelmax(x, order=order, mode=mode)[0])
        np.testing.assert_array_equal(
            pk.argrelmin(x, order=order, mode=mode)[0],
            sps.argrelmin(x, order=order, mode=mode)[0])


def test_argrelextrema_2d():
    rng = np.random.default_rng(1)
    x2 = rng.standard_normal((40, 30))
    for ax in (0, 1):
        mine = pk.argrelextrema(x2, np.greater, axis=ax, order=2)
        ref = sps.argrelextrema(x2, np.greater, axis=ax, order=2)
        np.testing.assert_array_equal(mine[0], ref[0])
        np.testing.assert_array_equal(mine[1], ref[1])
    with pytest.raises(ValueError):
        pk.argrelmax(x2, order=0)


def test_wlen_between_one_and_two():
    # scipy's rule: any wlen > 1 rounds up to 2; only <= 1 is an error
    x = np.sin(np.linspace(0, 30, 400))
    np.testing.assert_array_equal(
        tpufft.find_peaks(x, prominence=0.5, wlen=1.9)[0],
        sps.find_peaks(x, prominence=0.5, wlen=1.9)[0])
    with pytest.raises(ValueError):
        tpufft.find_peaks(x, prominence=0.5, wlen=1)


# find_peaks_cwt (round 5): bit-exact index parity incl. the signed-
# percentile noise convention


class TestFindPeaksCwt:
    @pytest.fixture(scope="class")
    def cwt_signals(self):
        rng = np.random.default_rng(0)
        t = np.linspace(0, 10, 500)
        return {
            "gausses": (np.exp(-((t - 2) / 0.3) ** 2)
                        + 0.7 * np.exp(-((t - 6) / 0.5) ** 2)
                        + 0.03 * rng.standard_normal(500)),
            "sine": np.sin(np.linspace(0, 30, 600))
            + 0.1 * rng.standard_normal(600),
            "noise": rng.standard_normal(400),
            "walk": np.cumsum(rng.standard_normal(700)),
        }

    @pytest.mark.parametrize("widths", [np.arange(1, 20),
                                        np.arange(3, 40, 2),
                                        [5, 10, 15]])
    def test_default_parity(self, cwt_signals, widths):
        for x in cwt_signals.values():
            np.testing.assert_array_equal(
                tpufft.find_peaks_cwt(x, widths),
                sps.find_peaks_cwt(x, widths))

    @pytest.mark.parametrize("kw", [
        dict(min_snr=2), dict(noise_perc=20), dict(min_length=6),
        dict(gap_thresh=1), dict(window_size=41),
        dict(max_distances=np.full(19, 3.0)),
    ])
    def test_kwargs_parity(self, cwt_signals, kw):
        x = cwt_signals["gausses"]
        np.testing.assert_array_equal(
            tpufft.find_peaks_cwt(x, np.arange(1, 20), **kw),
            sps.find_peaks_cwt(x, np.arange(1, 20), **kw))

    def test_custom_wavelet_and_edge_cases(self, cwt_signals):
        def gauss_wav(points, a):
            tt = np.arange(points) - (points - 1) / 2
            return np.exp(-(tt / a) ** 2)
        x = cwt_signals["gausses"]
        np.testing.assert_array_equal(
            tpufft.find_peaks_cwt(x, np.arange(2, 15),
                                  wavelet=gauss_wav),
            sps.find_peaks_cwt(x, np.arange(2, 15), wavelet=gauss_wav))
        np.testing.assert_array_equal(
            tpufft.find_peaks_cwt(np.zeros(100), np.arange(1, 10)),
            sps.find_peaks_cwt(np.zeros(100), np.arange(1, 10)))
        # it actually finds the two Gaussian bumps
        locs = tpufft.find_peaks_cwt(x, np.arange(3, 20))
        assert any(abs(l - 100) < 6 for l in locs)    # t=2 -> idx ~100
        assert any(abs(l - 300) < 6 for l in locs)    # t=6 -> idx ~300


def test_find_peaks_cwt_asym_fractional_complex():
    # regressions: conj-reversed kernel (asymmetric wavelets), float
    # window sizing (fractional widths), real-part complex handling
    rng = np.random.default_rng(0)
    t = np.linspace(0, 10, 500)
    x = (np.exp(-((t - 2) / 0.3) ** 2)
         + 0.7 * np.exp(-((t - 6) / 0.5) ** 2)
         + 0.03 * rng.standard_normal(500))

    def asym(n, a):
        tt = np.arange(n) - (np.asarray(n) - 1) / 2
        return np.exp(-(tt / a) ** 2) * (1 + 0.5 * np.tanh(tt / a))

    def cplx(n, a):
        tt = np.arange(n) - (np.asarray(n) - 1) / 2
        return np.exp(1j * tt / a) * np.exp(-(tt / a) ** 2)

    np.testing.assert_array_equal(
        tpufft.find_peaks_cwt(x, [3, 5, 8], wavelet=asym),
        sps.find_peaks_cwt(x, [3, 5, 8], wavelet=asym))
    np.testing.assert_array_equal(
        tpufft.find_peaks_cwt(x, [3, 5], wavelet=cplx),
        sps.find_peaks_cwt(x, [3, 5], wavelet=cplx))
    np.testing.assert_array_equal(
        tpufft.find_peaks_cwt(x, [2.55, 3.7, 5.1, 7.77]),
        sps.find_peaks_cwt(x, [2.55, 3.7, 5.1, 7.77]))
