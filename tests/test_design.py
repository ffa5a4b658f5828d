"""tpufft.design vs scipy.signal: prototypes, full designs, converters,
order selection, FIR design, response evaluation, zi constants.

sos arrays are compared by RESPONSE (factorizations are not unique);
prototypes by root-set matching (lexsort order is unstable when equal
real parts differ in the last bits)."""

import numpy as np
import pytest
import scipy.signal as ss

import tpufft
from tpufft import design as d


def rootset_err(a, b):
    # scipy returns 0-d arrays for N=1 prototypes; compare as root SETS
    a = np.atleast_1d(np.asarray(a, complex))
    b = np.atleast_1d(np.asarray(b, complex))
    if a.shape != b.shape:
        return np.inf
    if a.size == 0:
        return 0.0
    used = np.zeros(b.size, bool)
    tot = 0.0
    for x in a:
        i = np.argmin(np.where(used, np.inf, np.abs(b - x)))
        used[i] = True
        tot = max(tot, abs(b[i] - x) / max(1.0, abs(x)))
    return tot


def resp_err(ba1, ba2, n=512):
    _, h1 = ss.freqz(*ba1, worN=n)
    _, h2 = ss.freqz(*ba2, worN=n)
    return np.max(np.abs(h1 - h2)) / max(1e-30, np.max(np.abs(h2)))


@pytest.mark.parametrize("N", [1, 2, 3, 5, 8])
def test_buttap_cheb_prototypes(N):
    for mine, ref, args in [(d.buttap, ss.buttap, ()),
                            (d.cheb1ap, ss.cheb1ap, (1.0,)),
                            (d.cheb1ap, ss.cheb1ap, (0.05,)),
                            (d.cheb2ap, ss.cheb2ap, (40.0,)),
                            (d.cheb2ap, ss.cheb2ap, (80.0,))]:
        z1, p1, k1 = mine(N, *args)
        z2, p2, k2 = ref(N, *args)
        assert rootset_err(p1, p2) < 1e-10
        assert rootset_err(z1, z2) < 1e-10
        assert abs(k1 - k2) / abs(k2) < 1e-10


@pytest.mark.parametrize("N", [1, 2, 3, 4, 5, 7, 8])
@pytest.mark.parametrize("rp,rs", [(1.0, 40.0), (0.1, 80.0), (3.0, 30.0),
                                   (0.01, 100.0)])
def test_ellipap(N, rp, rs):
    z1, p1, k1 = d.ellipap(N, rp, rs)
    z2, p2, k2 = ss.ellipap(N, rp, rs)
    assert rootset_err(p1, p2) < 1e-8
    assert rootset_err(z1, z2) < 1e-8
    assert abs(k1 - k2) / abs(k2) < 1e-8


@pytest.mark.parametrize("N", [1, 2, 4, 6, 9, 12])
@pytest.mark.parametrize("norm", ["phase", "delay", "mag"])
def test_besselap(N, norm):
    z1, p1, k1 = d.besselap(N, norm=norm)
    z2, p2, k2 = ss.besselap(N, norm=norm)
    assert rootset_err(p1, p2) < 1e-9
    assert abs(k1 - k2) / abs(k2) < 1e-9


@pytest.mark.parametrize("kind,args", [
    ("butter", (4, 0.3)), ("butter", (5, [0.2, 0.5])),
    ("cheby1", (4, 1, 0.3)), ("cheby1", (7, 0.5, [0.1, 0.7])),
    ("cheby2", (6, 40, 0.4)), ("cheby2", (5, 60, [0.3, 0.6])),
    ("ellip", (5, 1, 40, 0.3)), ("ellip", (4, 0.5, 60, [0.2, 0.6])),
    ("bessel", (4, 0.25)), ("bessel", (7, [0.1, 0.4])),
])
def test_full_designs_response(kind, args):
    f1, f2 = getattr(d, kind), getattr(ss, kind)
    btypes = (["low", "high"] if np.ndim(args[-1]) == 0
              else ["bandpass", "bandstop"])
    for btype in btypes:
        assert resp_err(f1(*args, btype=btype),
                        f2(*args, btype=btype)) < 1e-7


def test_analog_and_fs_forms():
    assert resp_err(d.butter(4, 100, fs=1000), ss.butter(4, 100, fs=1000)) \
        < 1e-9
    b1, a1 = d.butter(4, 100, analog=True, btype="low")
    b2, a2 = ss.butter(4, 100, analog=True, btype="low")
    assert np.allclose(b1, b2) and np.allclose(a1, a2)


def test_sos_output_response_equivalent():
    for zpk in [ss.ellip(6, 1, 40, [0.2, 0.6], btype="bandpass",
                         output="zpk"),
                ss.butter(7, [0.1, 0.3], btype="bandstop", output="zpk"),
                ss.cheby2(5, 50, 0.4, output="zpk")]:
        sos = d.zpk2sos(*zpk)
        b, a = ss.zpk2tf(*zpk)
        _, h1 = ss.sosfreqz(sos, worN=512)
        _, h2 = ss.freqz(b, a, worN=512)
        assert np.max(np.abs(h1 - h2)) / np.max(np.abs(h2)) < 1e-6
        # highest-Q poles must be in the LAST section (round-off ordering)
        dist = [abs(1 - np.abs(np.roots(row[3:])).max(initial=0.0))
                for row in sos]
        assert dist[-1] == min(dist)


def test_converters_roundtrip():
    sos = ss.butter(6, 0.3, output="sos")
    b1, a1 = d.sos2tf(sos)
    b2, a2 = ss.sos2tf(sos)
    assert np.allclose(b1, b2) and np.allclose(a1, a2)
    z, p, k = d.sos2zpk(sos)
    z2, p2, k2 = ss.sos2zpk(sos)
    assert rootset_err(p, p2) < 1e-12 and abs(k - k2) < 1e-12
    b, a = ss.butter(4, 0.3)
    z, p, k = d.tf2zpk(b, a)
    bb, aa = d.zpk2tf(z, p, k)
    assert np.allclose(bb, b) and np.allclose(aa, a)
    assert not np.iscomplexobj(bb)


def test_bilinear_matches():
    b1, a1 = d.bilinear([1.0], [1.0, 1.0], fs=2)
    b2, a2 = ss.bilinear([1.0], [1.0, 1.0], fs=2)
    assert np.allclose(b1, b2) and np.allclose(a1, a2)


@pytest.mark.parametrize("fn1,fn2", [(d.buttord, ss.buttord),
                                     (d.cheb1ord, ss.cheb1ord),
                                     (d.cheb2ord, ss.cheb2ord),
                                     (d.ellipord, ss.ellipord)])
@pytest.mark.parametrize("wp,ws", [(0.2, 0.3), (0.4, 0.25),
                                   ([0.2, 0.5], [0.1, 0.6])])
def test_ord_selection(fn1, fn2, wp, ws):
    N1, wn1 = fn1(wp, ws, 3, 60)
    N2, wn2 = fn2(wp, ws, 3, 60)
    assert N1 == N2
    assert np.allclose(np.sort(np.atleast_1d(wn1)),
                       np.sort(np.atleast_1d(wn2)), atol=1e-9)


def test_ord_bandstop_exact():
    # bandstop edge optimization: scipy-exact N (the classical formula
    # over-designed this case at N=11 vs scipy's 9)
    N1, wn1 = d.buttord([0.1, 0.6], [0.2, 0.5], 3, 40)
    N2, wn2 = ss.buttord([0.1, 0.6], [0.2, 0.5], 3, 40)
    assert N1 == N2
    assert np.allclose(np.sort(np.atleast_1d(wn1)),
                       np.sort(np.atleast_1d(wn2)), atol=1e-6)


@pytest.mark.parametrize("fn1,fn2", [(d.buttord, ss.buttord),
                                     (d.cheb1ord, ss.cheb1ord),
                                     (d.cheb2ord, ss.cheb2ord),
                                     (d.ellipord, ss.ellipord)])
def test_ord_bandstop_sweep(fn1, fn2):
    # random band configurations: N must match scipy exactly
    rng = np.random.default_rng(42)
    for _ in range(20):
        lo = rng.uniform(0.05, 0.4)
        hi = rng.uniform(lo + 0.15, 0.95)
        gap_lo = rng.uniform(lo + 0.01, lo + (hi - lo) * 0.4)
        gap_hi = rng.uniform(gap_lo + 0.02, hi - 0.01)
        gpass = rng.uniform(0.1, 3.0)
        gstop = rng.uniform(20.0, 80.0)
        wp, ws = [lo, hi], [gap_lo, gap_hi]
        N1, wn1 = fn1(wp, ws, gpass, gstop)
        N2, wn2 = fn2(wp, ws, gpass, gstop)
        assert N1 == N2, (wp, ws, gpass, gstop, N1, N2)
        assert np.allclose(np.sort(np.atleast_1d(wn1)),
                           np.sort(np.atleast_1d(wn2)), atol=1e-6)


@pytest.mark.parametrize("args,kw", [
    ((31, 0.4), {}), ((30, 0.3), {"window": "blackman"}),
    ((65, [0.2, 0.5]), {"pass_zero": False}),
    ((33, [0.1, 0.3, 0.6]), {}),
    ((64, 0.4), {"width": 0.05}),
    ((21, 0.3), {"pass_zero": "highpass"}),
    ((129, [0.1, 0.9]), {"pass_zero": "bandstop", "scale": False}),
    ((31, 100.0), {"fs": 1000.0}),
])
def test_firwin(args, kw):
    assert np.max(np.abs(d.firwin(*args, **kw)
                         - ss.firwin(*args, **kw))) < 1e-12


def test_firwin_errors():
    with pytest.raises(ValueError):
        d.firwin(30, 0.5, pass_zero="highpass")  # even taps, nyq pass
    with pytest.raises(ValueError):
        d.firwin(31, [0.5, 0.2])
    with pytest.raises(ValueError):
        d.firwin(31, 1.5)


@pytest.mark.parametrize("args,kw", [
    ((65, [0, 0.3, 0.7, 1], [1, 1, 0, 0]), {}),
    ((64, [0, 0.5, 1], [0, 1, 1]), {"antisymmetric": True}),
    ((33, [0, 0.2, 0.2, 1], [1, 1, 0, 0]), {}),
    ((51, [0, 0.3, 1], [1, 1, 0]), {"window": "blackman"}),
])
def test_firwin2(args, kw):
    assert np.max(np.abs(d.firwin2(*args, **kw)
                         - ss.firwin2(*args, **kw))) < 1e-10


def test_kaiser_helpers():
    nt1, b1 = d.kaiserord(60, 0.1)
    nt2, b2 = ss.kaiserord(60, 0.1)
    assert nt1 == nt2 and abs(b1 - b2) < 1e-12
    assert abs(d.kaiser_atten(101, 0.05) - ss.kaiser_atten(101, 0.05)) \
        < 1e-12


def test_freqz_matches_scipy():
    b, a = ss.butter(4, 0.3)
    for kw in [{"worN": 256}, {"worN": 256, "whole": True},
               {"worN": np.linspace(0, np.pi, 64)},
               {"worN": 128, "fs": 1000.0}]:
        w1, h1 = d.freqz(b, a, **kw)
        w2, h2 = ss.freqz(b, a, **kw)
        assert np.allclose(w1, w2) and np.allclose(h1, h2)
    # FFT fast path (scalar denominator)
    w1, h1 = d.freqz(b, worN=256)
    w2, h2 = ss.freqz(b, worN=256)
    assert np.allclose(h1, h2)


def test_freqz_device_fft_path():
    import jax.numpy as jnp
    b = np.asarray(ss.firwin(63, 0.4))
    w1, h1 = d.freqz(jnp.asarray(b), worN=256)
    w2, h2 = ss.freqz(b, worN=256)
    assert np.allclose(np.asarray(h1), h2, atol=1e-6)


def test_freqz_zpk_sos_group_delay():
    z, p, k = ss.butter(4, 0.3, output="zpk")
    w1, h1 = d.freqz_zpk(z, p, k, worN=128)
    w2, h2 = ss.freqz_zpk(z, p, k, worN=128)
    assert np.allclose(h1, h2)
    sos = ss.butter(6, 0.3, output="sos")
    w1, h1 = d.sosfreqz(sos, worN=128)
    w2, h2 = ss.sosfreqz(sos, worN=128)
    assert np.allclose(h1, h2)
    b, a = ss.butter(4, 0.3)
    w1, g1 = d.group_delay((b, a), w=128)
    w2, g2 = ss.group_delay((b, a), w=128)
    assert np.allclose(g1, g2)


def test_zi_constants():
    b, a = ss.butter(5, 0.25)
    assert np.allclose(d.lfilter_zi(b, a), ss.lfilter_zi(b, a))
    sos = ss.ellip(7, 1, 40, 0.3, output="sos")
    assert np.allclose(d.sosfilt_zi(sos), ss.sosfilt_zi(sos))


def test_savgol_coeffs():
    from tpufft.sigtools import savgol_coeffs
    for args, kw in [((31, 4), {}), ((31, 4), {"deriv": 2, "delta": 0.5}),
                     ((11, 3), {"pos": 2}), ((10, 3), {}),
                     ((9, 2), {"use": "dot"})]:
        assert np.allclose(savgol_coeffs(*args, **kw),
                           ss.savgol_coeffs(*args, **kw), atol=1e-12)


def test_native_pipeline_end_to_end():
    """decimate/filtfilt run on tpufft-designed coefficients with no
    scipy design call, matching scipy's same pipeline."""
    x = np.random.default_rng(0).normal(size=(3, 500))
    assert np.allclose(np.asarray(tpufft.decimate(x, 4, ftype="iir")),
                       ss.decimate(x, 4, ftype="iir"), atol=1e-10)
    assert np.allclose(np.asarray(tpufft.decimate(x, 4, ftype="fir")),
                       ss.decimate(x, 4, ftype="fir"), atol=1e-10)
    b, a = tpufft.butter(4, 0.2)
    assert np.allclose(np.asarray(tpufft.filtfilt(b, a, x)),
                       ss.filtfilt(b, a, x), atol=1e-10)


def test_iirfilter_validation():
    with pytest.raises(ValueError):
        d.iirfilter(4, 1.5, btype="low")
    with pytest.raises(ValueError):
        d.iirfilter(4, [0.5, 0.2], btype="bandpass")
    with pytest.raises(ValueError):
        d.iirfilter(4, 0.3, btype="low", ftype="cheby1")  # rp missing
    with pytest.raises(ValueError):
        d.butter(4, 0.3, output="bogus")


# ---------------------------------------------------------------------------
# remez / minimum_phase
# ---------------------------------------------------------------------------

def _amplitude(h, f, anti=False):
    """Real amplitude of a linear-phase filter at normalized f (fs=1)."""
    _, H = ss.freqz(h, worN=2 * np.pi * f)
    rot = H * np.exp(1j * 2 * np.pi * f * (len(h) - 1) / 2.0)
    return rot.imag if anti else rot.real


def _weighted_ripple(h, bands, des, weight=None, anti=False):
    f = np.linspace(0.0, 0.5, 20001)[1:-1]
    amp = _amplitude(h, f, anti)
    err = 0.0
    for b in range(len(des)):
        sel = (f >= bands[2 * b]) & (f <= bands[2 * b + 1])
        w = 1.0 if weight is None else weight[b]
        err = max(err, w * np.max(np.abs(amp[sel] - des[b])))
    return err


REMEZ_CASES = [
    # numtaps, bands, desired, weight, type
    (72, [0, 0.1, 0.2, 0.5], [1, 0], None, "bandpass"),
    (55, [0, 0.12, 0.17, 0.33, 0.38, 0.5], [0, 1, 0], [1, 2, 1], "bandpass"),
    (101, [0, 0.15, 0.18, 0.5], [1, 0], [1, 10], "bandpass"),
    (24, [0, 0.08, 0.16, 0.5], [1, 0], None, "bandpass"),   # even, type II
    (64, [0.05, 0.45], [1], None, "hilbert"),
    (65, [0.05, 0.45], [1], None, "hilbert"),               # odd, type III
    (31, [0.02, 0.48], [1], None, "differentiator"),
    (32, [0.02, 0.48], [1], None, "differentiator"),        # even, type IV
]


@pytest.mark.parametrize("numtaps,bands,des,weight,ftype", REMEZ_CASES)
def test_remez_matches_scipy(numtaps, bands, des, weight, ftype):
    mine = d.remez(numtaps, bands, des, weight=weight, type=ftype, fs=1.0)
    ref = ss.remez(numtaps, bands, des, weight=weight, type=ftype, fs=1.0)
    assert mine.shape == ref.shape
    # both converge to the unique minimax solution up to grid
    # discretization: coefficients agree to ~1e-3 relative
    assert np.max(np.abs(mine - ref)) <= 2e-3 * np.max(np.abs(ref))


@pytest.mark.parametrize("numtaps,bands,des,weight,ftype",
                         [c for c in REMEZ_CASES if c[4] == "bandpass"])
def test_remez_minimax_optimality(numtaps, bands, des, weight, ftype):
    # the real bar: OUR equiripple error must not exceed scipy's
    mine = d.remez(numtaps, bands, des, weight=weight, type=ftype, fs=1.0)
    ref = ss.remez(numtaps, bands, des, weight=weight, type=ftype, fs=1.0)
    rip_mine = _weighted_ripple(mine, bands, des, weight)
    rip_ref = _weighted_ripple(ref, bands, des, weight)
    assert rip_mine <= rip_ref * 1.02


def test_remez_fs_scaling():
    a = d.remez(41, [0, 1000, 1500, 4000], [1, 0], fs=8000)
    b = d.remez(41, [0, 0.125, 0.1875, 0.5], [1, 0], fs=1.0)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_remez_linear_phase_structure():
    h = d.remez(24, [0, 0.08, 0.16, 0.5], [1, 0], fs=1.0)
    np.testing.assert_allclose(h, h[::-1], atol=1e-12)   # type II symmetric
    h = d.remez(65, [0.05, 0.45], [1], type="hilbert", fs=1.0)
    np.testing.assert_allclose(h, -h[::-1], atol=1e-12)  # type III antisym
    assert abs(h[32]) < 1e-12


def test_remez_validation():
    with pytest.raises(ValueError):
        d.remez(2, [0, 0.1, 0.2, 0.5], [1, 0])
    with pytest.raises(ValueError):
        d.remez(31, [0, 0.2, 0.1, 0.5], [1, 0])           # non-monotonic
    with pytest.raises(ValueError):
        d.remez(31, [0, 0.1, 0.2, 0.5], [1, 0], weight=[1, 2, 3])
    with pytest.raises(ValueError):
        d.remez(31, [0, 0.1, 0.2, 0.5], [1, 0], type="nope")


@pytest.mark.parametrize("half", [True, False])
@pytest.mark.parametrize("numtaps", [13, 151, 152])
def test_minimum_phase_homomorphic(numtaps, half):
    hlin = ss.firwin(numtaps, 0.3)
    mine = d.minimum_phase(hlin, method="homomorphic", half=half)
    ref = ss.minimum_phase(hlin, method="homomorphic", half=half)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-9)


def test_minimum_phase_hilbert():
    hlin = ss.remez(151, [0, 0.2, 0.3, 0.5], [1, 0], fs=1.0)
    mine = d.minimum_phase(hlin, method="hilbert")
    ref = ss.minimum_phase(hlin, method="hilbert")
    # the hilbert construction is only ~2*n_stop/n_fft accurate and sqrt
    # near the stopband floor is non-Lipschitz: implementations agree to
    # ~1e-4, not machine precision
    np.testing.assert_allclose(mine, ref, atol=2e-4)
    # approximately minimum-phase (scipy's own output has roots at
    # 1.0004 for this spec — the method's epsilon, not a bug)
    assert np.all(np.abs(np.roots(mine)) <= 1.0 + 1e-3)


def test_minimum_phase_is_minimum_phase():
    # all zeros of the result inside (or on) the unit circle
    hlin = ss.firwin(51, 0.4)
    hmin = d.minimum_phase(hlin)
    assert np.all(np.abs(np.roots(hmin)) <= 1.0 + 1e-6)


def test_minimum_phase_validation():
    with pytest.raises(ValueError):
        d.minimum_phase(np.array([1.0, 2.0]))
    with pytest.raises(ValueError):
        d.minimum_phase(np.array([1 + 1j, 2, 1]))
    with pytest.raises(ValueError):
        d.minimum_phase(ss.firwin(9, 0.3), method="hilbert", half=False)
    with pytest.raises(ValueError):
        d.minimum_phase(ss.firwin(9, 0.3), n_fft=4)
    with pytest.warns(RuntimeWarning):
        d.minimum_phase(np.array([1.0, 2.0, 3.0, 4.0]))


FIRLS_CASES = [
    (31, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0], None, None),
    (51, [0, 0.1, 0.15, 0.4, 0.45, 1.0], [0, 0, 1, 1, 0, 0],
     [1, 2, 0.5], None),
    (71, [0, 200, 300, 500], [1, 0.8, 0, 0], None, 1000),
    (11, [0, 0.5, 0.6, 1.0], [1, 1, 0, 0], [1, 3], None),
]


@pytest.mark.parametrize("numtaps,bands,des,weight,fs", FIRLS_CASES)
def test_firls_matches_scipy(numtaps, bands, des, weight, fs):
    kw = {} if fs is None else {"fs": fs}
    mine = d.firls(numtaps, bands, des, weight=weight, **kw)
    ref = ss.firls(numtaps, bands, des, weight=weight, **kw)
    np.testing.assert_allclose(mine, ref, atol=1e-7)
    np.testing.assert_allclose(mine, mine[::-1], atol=1e-14)  # type I


def test_firls_validation():
    with pytest.raises(ValueError):
        d.firls(10, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0])       # even numtaps
    with pytest.raises(ValueError):
        d.firls(11, [0, 0.3, 0.2, 1.0], [1, 1, 0, 0])       # non-monotonic
    with pytest.raises(ValueError):
        d.firls(11, [0, 0.2, 0.3, 1.0], [1, 1, 0])          # odd desired
    with pytest.raises(ValueError):
        d.firls(11, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0], weight=[1])


def test_remez_maxiter_truncation_consistent():
    """Exhausting maxiter must return the best-so-far consistent
    iterate: ripple decreases monotonically toward the converged
    solution (the old code paired the NEXT node set with the previous
    iteration's coefficients, making maxiter=2 WORSE than maxiter=1)."""
    from tpufft.design import remez

    w = np.linspace(0, np.pi, 2048)
    E = np.exp(-1j * np.outer(w, np.arange(33)))
    f = w / (2 * np.pi)

    def ripple(h):
        H = np.abs(E @ h)
        return max(np.max(np.abs(H[f <= 0.2] - 1)), np.max(H[f >= 0.3]))

    rips = [ripple(remez(33, [0, 0.2, 0.3, 0.5], [1, 0], maxiter=mi))
            for mi in (1, 2, 3, 25)]
    assert rips[0] > rips[1] > rips[2] >= rips[3] * 0.999
    import scipy.signal as sps
    rip_scipy = ripple(sps.remez(33, [0, 0.2, 0.3, 0.5], [1, 0]))
    assert rips[-1] <= rip_scipy * 1.01


# ---------------------------------------------------------------------------
# Round-5 additions: tf-form lp2*, iirnotch/iirpeak/iircomb, iirdesign,
# freqs family, findfreqs, freqz_sos, band_stop_obj


@pytest.mark.parametrize("proto", [
    ss.butter(4, 1.0, analog=True),
    ss.cheby1(3, 1.0, 1.0, analog=True),
    (np.array([1.0, 2.0]), np.array([1.0, 2.0, 3.0, 1.0])),
])
def test_lp2_tf_transforms(proto):
    b, a = proto
    for mine, ref, args in [
        (d.lp2lp, ss.lp2lp, (2.5,)),
        (d.lp2hp, ss.lp2hp, (2.5,)),
        (d.lp2bp, ss.lp2bp, (2.0, 0.7)),
        (d.lp2bs, ss.lp2bs, (2.0, 0.7)),
    ]:
        bm, am = mine(b, a, *args)
        br, ar = ref(b, a, *args)
        assert np.allclose(bm, br, rtol=1e-10, atol=1e-12), mine.__name__
        assert np.allclose(am, ar, rtol=1e-10, atol=1e-12), mine.__name__


@pytest.mark.parametrize("w0,Q,fs", [(0.3, 30, 2.0), (60, 35, 200.0),
                                     (1000, 12, 8000.0)])
def test_iirnotch_iirpeak(w0, Q, fs):
    for mine, ref in [(d.iirnotch, ss.iirnotch), (d.iirpeak, ss.iirpeak)]:
        bm, am = mine(w0, Q, fs=fs)
        br, ar = ref(w0, Q, fs=fs)
        assert np.allclose(bm, br, rtol=1e-12)
        assert np.allclose(am, ar, rtol=1e-12)


@pytest.mark.parametrize("ftype", ["notch", "peak"])
@pytest.mark.parametrize("pass_zero", [False, True])
def test_iircomb(ftype, pass_zero):
    for w0, Q, fs in [(50, 30, 200.0), (25, 18, 200.0), (1000, 35, 8000.0)]:
        bm, am = d.iircomb(w0, Q, ftype=ftype, fs=fs, pass_zero=pass_zero)
        br, ar = ss.iircomb(w0, Q, ftype=ftype, fs=fs, pass_zero=pass_zero)
        assert np.allclose(bm, br, rtol=1e-12)
        assert np.allclose(am, ar, rtol=1e-12)
    with pytest.raises(ValueError):
        d.iircomb(33.3, 30, fs=200.0)   # period does not divide fs


@pytest.mark.parametrize("wp,ws,gp,gs,ftype", [
    (0.2, 0.3, 1, 40, "ellip"),
    (0.3, 0.2, 1, 40, "butter"),
    ([0.2, 0.5], [0.1, 0.6], 2, 30, "cheby1"),
    ([0.1, 0.6], [0.2, 0.5], 2, 30, "cheby2"),
])
def test_iirdesign(wp, ws, gp, gs, ftype):
    bm, am = d.iirdesign(wp, ws, gp, gs, ftype=ftype)
    br, ar = ss.iirdesign(wp, ws, gp, gs, ftype=ftype)
    assert resp_err((bm, am), (br, ar)) < 1e-7


def test_iirdesign_fs_and_errors():
    bm, am = d.iirdesign(200, 300, 1, 40, ftype="butter", fs=2000)
    br, ar = ss.iirdesign(200, 300, 1, 40, ftype="butter", fs=2000)
    assert resp_err((bm, am), (br, ar)) < 1e-9
    with pytest.raises(ValueError):
        d.iirdesign(0.2, 0.3, 1, 40, ftype="bessel")
    with pytest.raises(ValueError):
        d.iirdesign([0.1, 0.6], [0.05, 0.5], 1, 40)  # non-nested bands


def test_freqs_family():
    b, a = ss.butter(4, 1.0, analog=True)
    w = np.logspace(-1, 2, 50)
    wm, hm = d.freqs(b, a, worN=w)
    wr, hr_ba = ss.freqs(b, a, worN=w)
    assert np.allclose(hm, hr_ba)
    z, p, k = ss.butter(3, 1.5, analog=True, output="zpk")
    wm, hm = d.freqs_zpk(z, p, k, worN=w)
    wr, hr = ss.freqs_zpk(z, p, k, worN=w)
    assert np.allclose(hm, hr)
    # auto grid (int worN) matches scipy's heuristic on these systems
    assert np.allclose(d.findfreqs(b, a, 15), ss.findfreqs(b, a, 15))
    assert np.allclose(d.findfreqs(z, p, 15, kind="zp"),
                       ss.findfreqs(z, p, 15, kind="zp"))
    wm, hm = d.freqs(b, a, worN=25)
    assert wm.shape == hm.shape == (25,)
    seen = []
    d.freqs(b, a, worN=w, plot=lambda w_, h_: seen.append((w_, h_)))
    assert len(seen) == 1 and np.allclose(seen[0][1], hr_ba)


def test_freqz_sos_alias_and_band_stop_obj():
    sos = ss.butter(6, [0.2, 0.5], btype="band", output="sos")
    wm, hm = d.freqz_sos(sos, worN=256)
    wr, hr = ss.freqz_sos(sos, worN=256)
    assert np.allclose(hm, hr)
    passb, stopb = np.array([0.1, 0.6]), np.array([0.2, 0.5])
    for kind in ("butter", "cheby", "ellip"):
        v1 = d.band_stop_obj(0.15, 0, passb, stopb, 2, 30, kind)
        v2 = ss.band_stop_obj(0.15, 0, passb, stopb, 2, 30, kind)
        assert np.allclose(v1, v2), kind
    with pytest.raises(ValueError):
        d.band_stop_obj(0.15, 0, passb, stopb, 2, 30, "bessel")


# Partial-fraction expansion (round 5)


def _sorted_rp(r, p):
    order = np.lexsort((np.round(np.imag(p), 6), np.round(np.real(p), 6)))
    return np.asarray(r)[order], np.asarray(p)[order]


PFE_S_CASES = [
    ([1.0, 2.0], [1.0, 5.0, 6.0]),            # simple real poles
    ([3.0], [1.0, 2.0, 1.0]),                 # double pole
    ([1.0, 0.0, 1.0], [1.0, 0.0, 0.0, -1.0]), # complex poles
    ([1.0, 2.0, 3.0, 4.0], [1.0, 3.0, 3.0, 1.0]),  # improper + triple
    ([2.0, 1.0], [1.0, -1.0, 0.25]),
]


@pytest.mark.parametrize("b,a", PFE_S_CASES)
def test_residue_invres(b, a):
    b, a = np.asarray(b), np.asarray(a)
    rm, pm, km = d.residue(b, a)
    rr, pr, kr = ss.residue(b, a)
    rm2, pm2 = _sorted_rp(rm, pm)
    rr2, pr2 = _sorted_rp(rr, pr)
    np.testing.assert_allclose(pm2, pr2, atol=1e-7)
    np.testing.assert_allclose(rm2, rr2, atol=1e-7)
    s = 1j * np.linspace(0.3, 4, 9) + 0.1
    h_ref = np.polyval(b, s) / np.polyval(a, s)
    # invres reconstructs the transfer function
    bm, am = d.invres(rr, pr, kr if np.size(kr) else np.array([0.0]))
    h_inv = np.polyval(bm, s) / np.polyval(am, s)
    np.testing.assert_allclose(h_inv, h_ref, atol=1e-6)


PFE_Z_CASES = [
    ([1.0, -1.0], [1.0, -1.5, 0.56]),
    ([1.0], [1.0, -1.0, 0.25]),               # double pole at 0.5
    ([2.0, 1.0, 0.5, 0.1], [1.0, -0.9]),      # improper (direct terms)
    ([1.0, 0.3], [1.0, 0.0, 0.64]),           # complex poles
]


@pytest.mark.parametrize("b,a", PFE_Z_CASES)
def test_residuez_invresz(b, a):
    b, a = np.asarray(b), np.asarray(a)
    rm, pm, km = d.residuez(b, a)
    rr, pr, kr = ss.residuez(b, a)
    rm2, pm2 = _sorted_rp(rm, pm)
    rr2, pr2 = _sorted_rp(rr, pr)
    np.testing.assert_allclose(pm2, pr2, atol=1e-7)
    np.testing.assert_allclose(rm2, rr2, atol=1e-7)
    km_t = np.trim_zeros(np.atleast_1d(km), "f")
    kr_t = np.trim_zeros(np.atleast_1d(kr), "f") if np.size(kr) else kr
    np.testing.assert_allclose(km_t, kr_t, atol=1e-7)
    # coefficient parity of the inverse on scipy's own expansion
    bm, am = d.invresz(rr, pr, kr if np.size(kr) else np.array([0.0]))
    br, ar = ss.invresz(rr, pr, kr if np.size(kr) else np.array([0.0]))
    np.testing.assert_allclose(np.atleast_1d(bm), np.atleast_1d(br),
                               atol=1e-8)
    np.testing.assert_allclose(am, ar, atol=1e-8)


@pytest.mark.parametrize("rtype", ["min", "max", "avg"])
def test_unique_roots(rtype):
    p = np.array([1.0, 1.0005, 2.0, 2.0, 3.0])
    um, mm = d.unique_roots(p, tol=1e-2, rtype=rtype)
    ur, mr = ss.unique_roots(p, tol=1e-2, rtype=rtype)
    np.testing.assert_allclose(np.sort(um), np.sort(ur))
    assert sorted(mm) == sorted(mr)
    with pytest.raises(ValueError):
        d.unique_roots(p, rtype="bogus")


def test_lfiltic():
    rng = np.random.default_rng(3)
    y = rng.standard_normal(5)
    x = rng.standard_normal(5)
    cases = [ss.butter(3, 0.3),
             (np.array([1.0, 0.5, 0.2]), np.array([1.0])),
             (np.array([0.2]), np.array([1.0, -0.7, 0.1, 0.05])),
             (np.array([2.0, 1.0]), np.array([2.0, -1.0, 0.3]))]
    for b, a in cases:
        for xx in (None, x, x[:1]):
            np.testing.assert_allclose(d.lfiltic(b, a, y, xx),
                                       ss.lfiltic(b, a, y, xx),
                                       atol=1e-12)
        np.testing.assert_allclose(d.lfiltic(b, a, y[:1]),
                                   ss.lfiltic(b, a, y[:1]), atol=1e-12)
    # the state actually continues a filtering run (scipy's doc contract)
    b, a = ss.butter(4, 0.25)
    sig = rng.standard_normal(64)
    full = ss.lfilter(b, a, sig)
    head = full[:20]
    zi = d.lfiltic(b, a, head[::-1], sig[:20][::-1])
    tail, _ = ss.lfilter(b, a, sig[20:], zi=zi)
    np.testing.assert_allclose(tail, full[20:], atol=1e-12)


def test_lp2lp_coefficient_scale_small_wo():
    # scipy convention: the shorter array's leading coefficient keeps
    # its scale even for wo < 1 (regression: the old common factor was
    # wrong when wo < 1 and len(b) != len(a))
    b, a = ss.butter(3, 1, analog=True)
    for wo in (0.3, 1.0, 2.5):
        bm, am = d.lp2lp(b, a, wo)
        br, ar = ss.lp2lp(b, a, wo)
        np.testing.assert_allclose(bm, br, rtol=1e-12)
        np.testing.assert_allclose(am, ar, rtol=1e-12)


def test_band_stop_obj_infeasible_edge_nan():
    import warnings as w
    with w.catch_warnings():
        w.simplefilter("ignore")
        v = d.band_stop_obj(0.21, 0, np.array([0.2, 0.5]),
                            np.array([0.1, 0.6]), 1, 30, "cheby")
    assert np.isnan(v)


def test_gammatone():
    for freq, fs in [(440, 16000), (1000, 8000), (100, 2000), (0.3, 2.0),
                     (440, 44100)]:
        for ft in ("iir", "fir"):
            bm, am = d.gammatone(freq, ft, fs=fs)
            br, ar = ss.gammatone(freq, ft, fs=fs)
            # atol floor: coefficients that are analytically zero carry
            # different cancellation roundoff
            np.testing.assert_allclose(bm, br, rtol=1e-9,
                                       atol=1e-12 * np.abs(br).max())
            np.testing.assert_allclose(am, ar, rtol=1e-9)
    bm, _ = d.gammatone(300, "fir", order=2, numtaps=64, fs=4000)
    br, _ = ss.gammatone(300, "fir", order=2, numtaps=64, fs=4000)
    np.testing.assert_allclose(bm, br, rtol=1e-9)
    for bad in (dict(freq=0), dict(freq=2000, fs=2000)):
        with pytest.raises(ValueError):
            d.gammatone(bad.pop("freq"), "iir", **bad)
    with pytest.raises(ValueError):
        d.gammatone(100, "bogus", fs=2000)
    with pytest.raises(ValueError):
        d.gammatone(100, "fir", order=30, fs=2000)


class TestFirwin2d:
    @pytest.mark.parametrize("hsize,window,fc,kw", [
        ((5, 5), (("kaiser", 5.0), ("kaiser", 5.0)), 0.1, {}),
        ((8, 6), ("hamming", "hann"), 0.3, {}),
        ((7, 5), ("hamming", "hann"), 100.0, {"fs": 1000.0}),
    ])
    def test_separable_scipy_parity(self, hsize, window, fc, kw):
        np.testing.assert_allclose(
            d.firwin_2d(hsize, window, fc=fc, **kw),
            ss.firwin_2d(hsize, window, fc=fc, **kw), atol=1e-14)

    def test_separable_honors_pass_zero_and_scale(self):
        # documented semantics (scipy 1.17 silently ignores both)
        h = d.firwin_2d((9, 9), ("blackman", "blackman"), fc=0.25,
                        pass_zero=False)
        np.testing.assert_allclose(
            h, np.outer(d.firwin(9, 0.25, window="blackman",
                                 pass_zero=False),
                        d.firwin(9, 0.25, window="blackman",
                                 pass_zero=False)), atol=1e-14)
        H = np.fft.fft2(h, (64, 64))
        # highpass product: unit gain at the Nyquist corner, attenuated
        # DC (a 9-tap design leaks; scipy's output would be a LOWPASS
        # with DC gain 1 here)
        assert abs(abs(H[32, 32]) - 1.0) < 1e-9
        assert abs(H[0, 0]) < 0.1
        h2 = d.firwin_2d((7, 5), ("hamming", "hann"), fc=0.3,
                         scale=False)
        np.testing.assert_allclose(
            h2, np.outer(d.firwin(7, 0.3, window="hamming", scale=False),
                         d.firwin(5, 0.3, window="hann", scale=False)),
            atol=1e-14)

    def test_circular_is_a_circular_lowpass(self):
        h = d.firwin_2d((33, 33), "hamming", fc=0.3, circular=True)
        assert np.allclose(h, h.T) and np.allclose(h, h[::-1, ::-1])
        H = np.abs(np.fft.fftshift(np.fft.fft2(h, (128, 128))))
        f = np.fft.fftshift(np.fft.fftfreq(128))
        rr = np.hypot(*np.meshgrid(f, f, indexing="ij"))
        assert abs(H[64, 64] - 1.0) < 1e-6           # unit DC gain
        assert H[rr < 0.1].mean() > 0.99             # flat passband
        assert H[rr > 0.25].max() < 0.01             # -40 dB stopband
        # rotational symmetry of the response along a PASSBAND ring
        # (a ring at the cutoff sits on the transition slope, where
        # radial discretization shows up as spread)
        ring = np.abs(rr - 0.05) < 0.004
        assert H[ring].std() < 0.02

    def test_errors(self):
        with pytest.raises(ValueError):
            d.firwin_2d((5, 5), "hamming", fc=0.3)      # separable str
        with pytest.raises(ValueError):
            d.firwin_2d((5, 5), ("hamming", "hann"))    # fc required
        with pytest.raises(ValueError):
            d.firwin_2d((5,), ("hamming", "hann"), fc=0.3)
        with pytest.raises(ValueError):
            d.firwin_2d((5, 7), "hamming", fc=0.3, circular=True)


def test_gammatone_iir_through_lfilter_is_stable():
    # regression: an order-8 gammatone (4 repeated pole pairs at radius
    # ~0.98) overflowed the full-order companion scan; the zero-state
    # high-order path now routes through the SOS cascade
    import tpufft
    fs = 16000.0
    t = np.arange(4096) / fs
    x = np.sin(2 * np.pi * 300 * t)
    b, a = d.gammatone(300.0, "iir", fs=fs)
    y = tpufft.lfilter(b, a, x)
    ref = ss.lfilter(b, a, x)
    assert np.all(np.isfinite(np.asarray(y)))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_firwin_2d_circular_rejections():
    with pytest.raises(ValueError):
        d.firwin_2d((9, 9), "hamming", fc=[0.2, 0.4], circular=True)
    with pytest.raises(ValueError):
        d.firwin_2d((9, 9), "hamming", fc=0.3, circular=True,
                    pass_zero="highpass")


def test_filtfilt_high_order_stable_and_b_longer_lfilter():
    import tpufft
    fs = 16000.0
    t = np.arange(2048) / fs
    x = np.sin(2 * np.pi * 300 * t) + np.sin(2 * np.pi * 2000 * t)
    b, a = d.gammatone(300.0, "iir", fs=fs)
    y = tpufft.filtfilt(b, a, x)
    ref = ss.filtfilt(b, a, x)
    assert np.all(np.isfinite(np.asarray(y)))
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4)
    # zero-state lfilter with numerator longer than denominator and
    # clustered near-unit poles takes the FIR o AR + SOS route
    bb = np.convolve(b, [1.0, 0.5, 0.25, 0.1, 0.05, 0.02])
    ym = tpufft.lfilter(bb, a, x)
    yr = ss.lfilter(bb, a, x)
    assert np.all(np.isfinite(np.asarray(ym)))
    np.testing.assert_allclose(np.asarray(ym), yr, atol=1e-4)
