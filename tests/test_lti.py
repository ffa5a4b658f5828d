"""tpufft.lti vs scipy.signal: representations, conversions,
discretization (all 7 methods), simulation (host exact loop + jax
associative-scan path), and frequency response."""

import numpy as np
import pytest
import scipy.signal as sps
import scipy.linalg as sl

import jax
import jax.numpy as jnp

import tpufft
from tpufft import ltisys as L


@pytest.fixture(scope="module")
def sysc():
    return sps.butter(3, 2.0, analog=True)


@pytest.fixture(scope="module")
def sysd():
    return sps.cont2discrete(
        sps.tf2ss(*sps.butter(3, 2.0, analog=True)), 0.05)


@pytest.mark.parametrize("n", [1, 3, 6])
@pytest.mark.parametrize("scale", [0.1, 1.0, 40.0])
def test_expm(n, scale):
    rng = np.random.default_rng(n * 7 + int(scale * 10))
    A = rng.standard_normal((n, n)) * scale
    ref = sl.expm(A)
    np.testing.assert_allclose(L.expm(A), ref,
                               atol=1e-8 * max(1.0, np.abs(ref).max()))


TF_CASES = [
    ([1.0, 3.0, 3.0], [1.0, 2.0, 1.0]),
    ([2.0], [1.0, 2.0, 1.0]),
    ([1.0, 0.0], [2.0, 1.0, 3.0]),
    ([[1.0, 3.0], [2.0, 1.0]], [1.0, 0.4]),      # two outputs
]


@pytest.mark.parametrize("num,den", TF_CASES)
def test_tf_ss_roundtrip(num, den):
    m = L.tf2ss(num, den)
    r = sps.tf2ss(num, den)
    for a, b in zip(m, r):
        np.testing.assert_allclose(a, b, atol=1e-12)
    mtf = L.ss2tf(*m)
    rtf = sps.ss2tf(*r)
    np.testing.assert_allclose(mtf[0], rtf[0], atol=1e-12)
    np.testing.assert_allclose(mtf[1], rtf[1], atol=1e-12)


def test_zpk_ss_and_abcd():
    z, p, k = sps.butter(3, 0.4, output="zpk")
    m = L.zpk2ss(z, p, k)
    r = sps.zpk2ss(z, p, k)
    for a, b in zip(m, r):
        np.testing.assert_allclose(a, b, atol=1e-12)
    zm, pm, km = L.ss2zpk(*m)
    zr, pr, kr = sps.ss2zpk(*r)
    np.testing.assert_allclose(np.sort_complex(pm), np.sort_complex(pr),
                               atol=1e-9)
    np.testing.assert_allclose(km, kr, atol=1e-9)
    rng = np.random.default_rng(0)
    A = rng.standard_normal((3, 3))
    B = rng.standard_normal((3, 2))
    C = np.zeros((2, 3))
    for a, b in zip(L.abcd_normalize(A=A, B=B, C=C),
                    sps.abcd_normalize(A=A, B=B, C=C)):
        np.testing.assert_allclose(a, b)
    with pytest.raises(ValueError):
        L.abcd_normalize(A=A, B=B)


@pytest.mark.parametrize("method,kw", [
    ("zoh", {}), ("foh", {}), ("bilinear", {}), ("euler", {}),
    ("backward_diff", {}), ("gbt", dict(alpha=0.3)), ("impulse", {}),
])
def test_cont2discrete_methods(sysc, method, kw):
    ss = sps.tf2ss(*sysc)
    m = L.cont2discrete(ss, 0.05, method=method, **kw)
    r = sps.cont2discrete(ss, 0.05, method=method, **kw)
    for a, b in zip(m[:4], r[:4]):
        np.testing.assert_allclose(a, b, atol=1e-10)
    assert m[4] == r[4]


def test_cont2discrete_flavors(sysc):
    m = L.cont2discrete(sysc, 0.1, "zoh")
    r = sps.cont2discrete(sysc, 0.1, "zoh")
    np.testing.assert_allclose(m[0], r[0], atol=1e-12)
    np.testing.assert_allclose(m[1], r[1], atol=1e-12)
    zpk = sps.butter(2, 3.0, analog=True, output="zpk")
    mz = L.cont2discrete(zpk, 0.1, "bilinear")
    rz = sps.cont2discrete(zpk, 0.1, "bilinear")
    np.testing.assert_allclose(np.sort_complex(np.atleast_1d(mz[1])),
                               np.sort_complex(np.atleast_1d(rz[1])),
                               atol=1e-12)
    # instance input preserves the representation class; the ZOH
    # discretization of a strictly proper TF has an exact-zero leading
    # numerator coefficient, and stripping it warns BadCoefficients
    # (scipy warns identically here)
    s1 = L.TransferFunction(*sysc)
    with pytest.warns(L.BadCoefficients):
        dm = L.cont2discrete(s1, 0.05)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        dr = sps.cont2discrete(sps.TransferFunction(*sysc), 0.05)
    assert isinstance(dm, L.TransferFunction) and dm.dt == 0.05
    np.testing.assert_allclose(dm.num, dr.num, atol=1e-9)
    np.testing.assert_allclose(dm.den, dr.den, atol=1e-9)
    with pytest.raises(ValueError):
        L.cont2discrete(sysc, 0.1, method="bogus")
    with pytest.raises(ValueError):
        L.cont2discrete(sysc, 0.1, method="gbt")   # alpha required


def test_dlsim(sysd):
    rng = np.random.default_rng(1)
    u = rng.standard_normal(60)
    for x0 in (None, rng.standard_normal(3)):
        m = L.dlsim(sysd, u, x0=x0)
        r = sps.dlsim(sysd, u, x0=x0)
        np.testing.assert_allclose(m[0], r[0])
        np.testing.assert_allclose(m[1], r[1], atol=1e-12)
        np.testing.assert_allclose(m[2], r[2], atol=1e-12)
    bz, az = sps.butter(3, 0.4)
    m = L.dlsim((bz, az, 1.0), u)
    r = sps.dlsim((bz, az, 1.0), u)
    assert len(m) == 2
    np.testing.assert_allclose(m[1], r[1], atol=1e-12)


def test_dlsim_jax_scan(sysd):
    rng = np.random.default_rng(2)
    u = rng.standard_normal(60).astype(np.float32)
    x0 = rng.standard_normal(3)
    r = sps.dlsim(sysd, u, x0=x0)
    m = L.dlsim(sysd, jnp.asarray(u), x0=x0)
    assert isinstance(m[1], jax.Array)
    np.testing.assert_allclose(np.asarray(m[1]), r[1], atol=5e-4)
    np.testing.assert_allclose(np.asarray(m[2]), r[2], atol=5e-4)


def test_dimpulse_dstep(sysd):
    bz, az = sps.butter(3, 0.4)
    tm, ym = L.dimpulse((bz, az, 0.5), n=40)
    tr, yr = sps.dimpulse((bz, az, 0.5), n=40)
    np.testing.assert_allclose(tm, tr)
    np.testing.assert_allclose(ym[0], yr[0], atol=1e-12)
    tm, ym = L.dstep(sysd, n=40)
    tr, yr = sps.dstep(sysd, n=40)
    np.testing.assert_allclose(ym[0], yr[0], atol=1e-12)


@pytest.mark.parametrize("interp", [True, False])
def test_lsim(sysc, interp):
    rng = np.random.default_rng(3)
    T = np.linspace(0, 5, 201)
    U = np.sin(2 * T) + 0.1 * rng.standard_normal(T.size)
    m = L.lsim(sysc, U, T, interp=interp)
    r = sps.lsim(sysc, U, T, interp=interp)
    np.testing.assert_allclose(m[1], r[1], atol=1e-7)
    np.testing.assert_allclose(m[2], r[2], atol=1e-7)
    X0 = rng.standard_normal(3)
    m = L.lsim(sps.tf2ss(*sysc), U, T, X0=X0)
    r = sps.lsim(sps.tf2ss(*sysc), U, T, X0=X0)
    np.testing.assert_allclose(m[1], r[1], atol=1e-7)
    with pytest.raises(ValueError):
        L.lsim(sysc, U, np.concatenate([T[:10], T[20:30]]))


def test_impulse_step(sysc):
    tm, ym = L.impulse(sysc)
    tr, yr = sps.impulse(sysc)
    np.testing.assert_allclose(tm, tr)
    np.testing.assert_allclose(ym, yr, atol=1e-6)
    T = np.linspace(0, 5, 201)
    np.testing.assert_allclose(L.step(sysc, T=T)[1],
                               sps.step(sysc, T=T)[1], atol=1e-7)


def test_freqresp_bode(sysc):
    w = np.logspace(-1, 2, 60)
    np.testing.assert_allclose(L.freqresp(sysc, w=w)[1],
                               sps.freqresp(sysc, w=w)[1], atol=1e-10)
    wm, mm, pm = L.bode(sysc, w=w)
    wr, mr, pr = sps.bode(sysc, w=w)
    np.testing.assert_allclose(mm, mr, atol=1e-9)
    np.testing.assert_allclose(pm, pr, atol=1e-9)
    bz, az = sps.butter(3, 0.4)
    for mine, ref in zip(L.dfreqresp((bz, az, 0.5), n=128),
                         sps.dfreqresp((bz, az, 0.5), n=128)):
        np.testing.assert_allclose(mine, ref, atol=1e-10)
    for mine, ref in zip(L.dbode((bz, az, 0.5)),
                         sps.dbode((bz, az, 0.5))):
        np.testing.assert_allclose(mine, ref, atol=1e-9)


def test_classes(sysc):
    s1 = L.TransferFunction(*sysc)
    r1 = sps.TransferFunction(*sysc)
    np.testing.assert_allclose(s1.num, r1.num)
    np.testing.assert_allclose(s1.den, r1.den)
    np.testing.assert_allclose(np.sort_complex(s1.poles),
                               np.sort_complex(r1.poles), atol=1e-9)
    np.testing.assert_allclose(s1.to_ss().A, r1.to_ss().A, atol=1e-12)
    np.testing.assert_allclose(np.atleast_1d(s1.to_zpk().gain),
                               np.atleast_1d(r1.to_zpk().gain), atol=1e-12)
    T = np.linspace(0, 5, 201)
    np.testing.assert_allclose(s1.step(T=T)[1], r1.step(T=T)[1],
                               atol=1e-7)
    w = np.logspace(-1, 2, 40)
    np.testing.assert_allclose(s1.bode(w=w)[1], r1.bode(w=w)[1],
                               atol=1e-9)
    assert isinstance(L.lti(*sysc), L.TransferFunction)
    assert isinstance(L.lti(*sps.tf2ss(*sysc)), L.StateSpace)
    bz, az = sps.butter(3, 0.4)
    dsys = L.dlti(bz, az, dt=0.5)
    rsys = sps.dlti(bz, az, dt=0.5)
    np.testing.assert_allclose(dsys.impulse(N=30)[1][0],
                               rsys.impulse(n=30)[1][0], atol=1e-12)
    # continuous/discrete guard rails
    with pytest.raises(ValueError):
        L.dlsim(L.TransferFunction(*sysc), np.zeros(4))
    with pytest.raises(ValueError):
        L.lsim(dsys, np.zeros(4), np.arange(4.0))


# Review-pass regressions (round 5)


def test_complex_gain_zpk():
    z = L.ZerosPolesGain([1j, -1j], [-1, -2], 2 + 1j)
    assert z.gain == 2 + 1j
    r = sps.ZerosPolesGain([1j, -1j], [-1, -2], 2 + 1j)
    assert z.gain == r.gain


def test_freqresp_rejects_mimo():
    A, B, C, D = sps.tf2ss(*sps.butter(2, 0.3))
    C2, D2 = np.vstack([C, C]), np.vstack([D, D])
    with pytest.raises(ValueError):
        L.freqresp((A, B, C2, D2), w=np.ones(8))
    with pytest.raises(ValueError):
        L.dfreqresp((A, B, C2, D2, 0.5), n=8)


def test_ss2tf_input_out_of_range():
    A, B, C, D = sps.tf2ss(*sps.butter(2, 0.3))
    with pytest.raises(ValueError, match="input"):
        L.ss2tf(A, B, C, D, input=5)


# place_poles (round 5): SISO gains are unique (scipy-exact); MIMO
# gains are not, so parity is the closed-loop-poles contract


class TestPlacePoles:
    def test_siso_exact(self):
        A = np.array([[0., 1.], [-2., -3.]])
        B = np.array([[0.], [1.]])
        fm = L.place_poles(A, B, [-5., -6.])
        fr = sps.place_poles(A, B, [-5., -6.])
        np.testing.assert_allclose(fm.gain_matrix, fr.gain_matrix,
                                   atol=1e-9)
        np.testing.assert_allclose(np.sort(np.real(fm.computed_poles)),
                                   [-6., -5.], atol=1e-9)
        fm = L.place_poles(A, B, [-2 + 1j, -2 - 1j])
        cp = np.linalg.eigvals(A - B @ fm.gain_matrix)
        np.testing.assert_allclose(np.sort_complex(cp),
                                   np.sort_complex(
                                       np.array([-2 - 1j, -2 + 1j])),
                                   atol=1e-9)

    @pytest.mark.parametrize("poles", [
        [-1., -2., -3., -4.],
        [-1 + 1j, -1 - 1j, -2., -3.],
        [-2., -2., -3., -4.],          # repeated up to rank(B)
    ])
    def test_mimo_contract(self, poles):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((4, 4))
        B = rng.standard_normal((4, 2))
        fm = L.place_poles(A, B, poles)
        assert np.isrealobj(fm.gain_matrix)
        cp = np.linalg.eigvals(A - B @ fm.gain_matrix)
        np.testing.assert_allclose(
            np.sort_complex(cp),
            np.sort_complex(np.asarray(poles, complex)), atol=1e-5)
        # scipy places the same poles (sanity on the same system)
        fr = sps.place_poles(A, B, poles)
        np.testing.assert_allclose(
            np.sort_complex(np.asarray(fm.computed_poles)),
            np.sort_complex(np.asarray(fr.computed_poles)), atol=1e-5)

    def test_errors(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((4, 4))
        B = rng.standard_normal((4, 2))
        with pytest.raises(ValueError):
            L.place_poles(A, B, [-1., -1., -1., -2.])   # mult > rank
        with pytest.raises(ValueError):
            L.place_poles(A, B, [-1 + 1j, -2., -3., -4.])  # no conj
        with pytest.raises(ValueError):
            L.place_poles(A, B, [-1., -2.])
        with pytest.raises(ValueError):
            L.place_poles(A, B, [-1., -2., -3., -4.], maxiter=0)
        with pytest.raises(ValueError):
            L.place_poles(A, np.zeros((4, 2)), [-1., -2., -3., -4.])


def test_place_poles_strict_conjugates_and_warning():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((4, 4))
    B = rng.standard_normal((4, 2))
    # an inexact conjugate is an error (scipy), never silently replaced
    with pytest.raises(ValueError):
        L.place_poles(A, B, [-2 + 2j, -2 - 2.0000001j, -1., -3.])
    with pytest.warns(UserWarning, match="Convergence"):
        L.place_poles(A, B, [-1., -2., -3., -4.], maxiter=1)
