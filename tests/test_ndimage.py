"""tpufft.ndimage vs scipy.ndimage — Fourier-domain filters.

Differential tests on every input flavor the house contract covers:
numpy (host), jax.Array (device), SplitComplex planes. scipy is the
oracle; an end-to-end pipeline test runs fftn -> filter -> ifftn through
the package's own plans.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

import tpufft
from tpufft.core import SplitComplex
from tpufft import ndimage as tnd

RNG = np.random.default_rng(7)


def _split(x):
    return SplitComplex(jnp.asarray(x.real.astype(np.float32)),
                        jnp.asarray(x.imag.astype(np.float32)))


def _join(s):
    return np.asarray(s.re).astype(np.complex128) \
        + 1j * np.asarray(s.im).astype(np.complex128)


CASES = [
    ("gaussian", tnd.fourier_gaussian, ndi.fourier_gaussian, 2.0),
    ("gaussian_seq", tnd.fourier_gaussian, ndi.fourier_gaussian, (1.0, 3.0)),
    ("uniform", tnd.fourier_uniform, ndi.fourier_uniform, 3),
    ("uniform_seq", tnd.fourier_uniform, ndi.fourier_uniform, (2, 5)),
    ("ellipsoid", tnd.fourier_ellipsoid, ndi.fourier_ellipsoid, 3),
    ("shift", tnd.fourier_shift, ndi.fourier_shift, 1.5),
    ("shift_seq", tnd.fourier_shift, ndi.fourier_shift, (0.5, -2.25)),
]


@pytest.mark.parametrize("name,ours,ref,param",
                         CASES, ids=[c[0] for c in CASES])
def test_numpy_complex_matches_scipy(name, ours, ref, param):
    x = (RNG.standard_normal((9, 12))
         + 1j * RNG.standard_normal((9, 12)))
    np.testing.assert_allclose(ours(x, param), ref(x, param),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("name,ours,ref,param",
                         CASES, ids=[c[0] for c in CASES])
def test_numpy_real_matches_scipy(name, ours, ref, param):
    x = RNG.standard_normal((8, 10))
    got, want = ours(x, param), ref(x, param)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("name,ours,ref,param",
                         CASES, ids=[c[0] for c in CASES])
def test_split_complex_matches_scipy(name, ours, ref, param):
    x = (RNG.standard_normal((9, 12))
         + 1j * RNG.standard_normal((9, 12)))
    got = ours(_split(x), param)
    assert isinstance(got, SplitComplex)
    np.testing.assert_allclose(_join(got), ref(x, param),
                               rtol=1e-5, atol=1e-5)


def test_rfft_axis_convention():
    x = RNG.standard_normal((8, 10))
    X = np.fft.rfftn(x)
    for ours, ref, p in [(tnd.fourier_gaussian, ndi.fourier_gaussian, 1.3),
                         (tnd.fourier_uniform, ndi.fourier_uniform, 4),
                         (tnd.fourier_shift, ndi.fourier_shift, 2.5),
                         (tnd.fourier_ellipsoid, ndi.fourier_ellipsoid, 3)]:
        np.testing.assert_allclose(ours(X, p, n=10, axis=-1),
                                   ref(X, p, n=10, axis=-1),
                                   rtol=1e-12, atol=1e-12)


def test_rank3_ellipsoid_and_rank_limit():
    x = (RNG.standard_normal((6, 6, 6))
         + 1j * RNG.standard_normal((6, 6, 6)))
    np.testing.assert_allclose(tnd.fourier_ellipsoid(x, 2.5),
                               ndi.fourier_ellipsoid(x, 2.5),
                               rtol=1e-12, atol=1e-12)
    with pytest.raises(NotImplementedError):
        tnd.fourier_ellipsoid(np.zeros((2, 2, 2, 2), complex), 1.0)


def test_sequence_length_mismatch():
    with pytest.raises(RuntimeError):
        tnd.fourier_gaussian(np.zeros((4, 4), complex), (1.0, 2.0, 3.0))


def test_jax_real_shift_returns_split_on_complexfree():
    # on the CPU test backend complex IS supported -> complex out
    x = jnp.asarray(RNG.standard_normal((6, 8)).astype(np.float32))
    got = tnd.fourier_shift(x, 1.0)
    want = ndi.fourier_shift(np.asarray(x).astype(np.float64), 1.0)
    if isinstance(got, SplitComplex):
        np.testing.assert_allclose(_join(got), want, rtol=1e-5, atol=1e-5)
    else:
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-5)


def test_end_to_end_gaussian_blur_pipeline():
    """fftn -> fourier_gaussian -> ifftn through tpufft's own plans
    matches the all-scipy pipeline."""
    x = RNG.standard_normal((16, 24))
    X = tpufft.fftn(x)
    Y = tnd.fourier_gaussian(X, 2.0)
    y = tpufft.ifftn(Y)
    want = np.fft.ifftn(ndi.fourier_gaussian(np.fft.fftn(x), 2.0))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-9, atol=1e-9)


def test_end_to_end_shift_matches_roll():
    """An integer fourier_shift is exactly np.roll."""
    x = RNG.standard_normal((12, 15))
    y = tpufft.ifftn(tnd.fourier_shift(tpufft.fftn(x), (3, -2)))
    np.testing.assert_allclose(np.asarray(y).real, np.roll(x, (3, -2),
                                                           axis=(0, 1)),
                               rtol=1e-9, atol=1e-9)


def test_output_param_numpy():
    x = (RNG.standard_normal((5, 7)) + 1j * RNG.standard_normal((5, 7)))
    out = np.empty_like(x)
    got = tnd.fourier_uniform(x, 3, output=out)
    assert got is out
    np.testing.assert_allclose(out, ndi.fourier_uniform(x, 3),
                               rtol=1e-12, atol=1e-12)
