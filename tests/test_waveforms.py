"""tpufft.waveforms vs scipy.signal: chirps, pulses, test sequences.

max_len_seq is compared bit-exactly (including the returned state and
the default taps table for every register size scipy supports); the
samplers are compared in f64 on the host and checked to be traceable on
the jax path.
"""

import numpy as np
import pytest
import scipy.signal as sps

import jax
import jax.numpy as jnp

import tpufft
from tpufft import waveforms as wf


@pytest.fixture
def t():
    return np.linspace(0, 3, 500)


@pytest.mark.parametrize("width", [1.0, 0.5, 0.0, 0.3])
def test_sawtooth(t, width):
    np.testing.assert_allclose(wf.sawtooth(t * 5, width),
                               sps.sawtooth(t * 5, width), atol=1e-12)


@pytest.mark.parametrize("duty", [0.5, 0.2, 0.9])
def test_square(t, duty):
    np.testing.assert_allclose(wf.square(t * 5, duty),
                               sps.square(t * 5, duty), atol=1e-12)


@pytest.mark.parametrize("method", ["linear", "quadratic", "logarithmic",
                                    "hyperbolic"])
def test_chirp(t, method):
    np.testing.assert_allclose(wf.chirp(t, 10, 3, 40, method),
                               sps.chirp(t, 10, 3, 40, method), atol=1e-9)
    np.testing.assert_allclose(wf.chirp(t, 10, 3, 40, method, phi=37),
                               sps.chirp(t, 10, 3, 40, method, phi=37),
                               atol=1e-9)
    # downward sweep exercises the sign/singularity branches
    np.testing.assert_allclose(wf.chirp(t, 40, 3, 10, method),
                               sps.chirp(t, 40, 3, 10, method), atol=1e-9)


def test_chirp_variants(t):
    np.testing.assert_allclose(
        wf.chirp(t, 10, 3, 40, "quadratic", vertex_zero=False),
        sps.chirp(t, 10, 3, 40, "quadratic", vertex_zero=False), atol=1e-9)
    if "complex" in sps.chirp.__doc__:
        np.testing.assert_allclose(wf.chirp(t, 10, 3, 40, complex=True),
                                   sps.chirp(t, 10, 3, 40, complex=True),
                                   atol=1e-9)
    with pytest.raises(ValueError):
        wf.chirp(t, 10, 3, 40, "bogus")
    with pytest.raises(ValueError):
        wf.chirp(t, -10, 3, 40, "logarithmic")
    with pytest.raises(ValueError):
        wf.chirp(t, 0, 3, 40, "hyperbolic")


def test_sweep_poly(t):
    p = np.poly1d([0.05, -0.75, 2.0, 5.0])
    np.testing.assert_allclose(wf.sweep_poly(t, p), sps.sweep_poly(t, p),
                               atol=1e-9)
    np.testing.assert_allclose(wf.sweep_poly(t, [1.0, 2.0], phi=10),
                               sps.sweep_poly(t, [1.0, 2.0], phi=10),
                               atol=1e-9)


def test_gausspulse():
    tt = np.linspace(-0.01, 0.01, 400)
    np.testing.assert_allclose(wf.gausspulse(tt), sps.gausspulse(tt),
                               atol=1e-12)
    mine = wf.gausspulse(tt, fc=2000, bw=0.3, retquad=True, retenv=True)
    ref = sps.gausspulse(tt, fc=2000, bw=0.3, retquad=True, retenv=True)
    for a, b in zip(mine, ref):
        np.testing.assert_allclose(a, b, atol=1e-12)
    assert np.isclose(wf.gausspulse("cutoff", fc=2000, bw=0.3),
                      sps.gausspulse("cutoff", fc=2000, bw=0.3))
    for bad in (dict(fc=-1), dict(bw=0), dict(bwr=1)):
        with pytest.raises(ValueError):
            wf.gausspulse(tt, **bad)
    with pytest.raises(ValueError):
        wf.gausspulse("nonsense")


def test_unit_impulse():
    np.testing.assert_array_equal(wf.unit_impulse(7), sps.unit_impulse(7))
    np.testing.assert_array_equal(wf.unit_impulse((5, 6), "mid"),
                                  sps.unit_impulse((5, 6), "mid"))
    np.testing.assert_array_equal(wf.unit_impulse(9, 4),
                                  sps.unit_impulse(9, 4))
    np.testing.assert_array_equal(wf.unit_impulse((4, 4), (1, 2)),
                                  sps.unit_impulse((4, 4), (1, 2)))
    assert wf.unit_impulse(5, dtype=np.int32).dtype == np.int32


@pytest.mark.parametrize("nbits", list(range(2, 33)))
def test_max_len_seq_taps_table(nbits):
    s1, st1 = wf.max_len_seq(nbits, length=64)
    s2, st2 = sps.max_len_seq(nbits, length=64)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(st1, st2)


def test_max_len_seq_features():
    state = np.array([1, 0, 1, 1, 0, 1], np.int8)
    s1, st1 = wf.max_len_seq(6, state=state, length=20)
    s2, st2 = sps.max_len_seq(6, state=state, length=20)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(st1, st2)
    s1, _ = wf.max_len_seq(7, taps=[6, 1], length=30)
    s2, _ = sps.max_len_seq(7, taps=[6, 1], length=30)
    np.testing.assert_array_equal(s1, s2)
    # state chaining concatenates to the full period
    sa, st = wf.max_len_seq(5, length=10)
    sb, _ = wf.max_len_seq(5, state=st, length=21)
    full, _ = wf.max_len_seq(5)
    np.testing.assert_array_equal(np.concatenate([sa, sb]), full)
    # a maximal sequence visits every nonzero state once per period
    seq, st = wf.max_len_seq(4)
    assert seq.sum() == 8 and st.shape == (4,)
    with pytest.raises(ValueError):
        wf.max_len_seq(33)
    with pytest.raises(ValueError):
        wf.max_len_seq(4, state=np.zeros(4))
    with pytest.raises(ValueError):
        wf.max_len_seq(4, state=np.ones(3))


def test_jax_path_traceable(t):
    tj = jnp.asarray(t.astype(np.float32))
    out = jax.jit(lambda x: wf.chirp(x, 10, 3, 40))(tj)
    assert isinstance(out, jax.Array)
    np.testing.assert_allclose(np.asarray(out), sps.chirp(t, 10, 3, 40),
                               atol=2e-3)
    out = jax.jit(lambda x: wf.square(x, 0.3))(tj * 5)
    np.testing.assert_allclose(np.asarray(out), sps.square(t * 5, 0.3))
    out = jax.jit(lambda x: wf.gausspulse(x, fc=3.0, bw=0.4))(tj)
    np.testing.assert_allclose(np.asarray(out),
                               sps.gausspulse(t, fc=3.0, bw=0.4), atol=2e-4)
    # differentiable through the sweep
    g = jax.grad(lambda x: wf.chirp(x, 10, 3, 40).sum())(tj[:8])
    assert np.all(np.isfinite(np.asarray(g)))


def test_sawtooth_array_width(t):
    warr = np.full_like(t * 5, 0.5)
    warr[:100] = 1.0
    warr[100:150] = 0.0
    np.testing.assert_allclose(wf.sawtooth(t * 5, warr),
                               sps.sawtooth(t * 5, warr), atol=1e-12)
