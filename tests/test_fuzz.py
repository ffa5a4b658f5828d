"""Seeded random-configuration fuzz: arbitrary shapes/axes/kinds/norms
against the numpy oracle, through the public API (both backends)."""

import numpy as np
import pytest

import tpufft
from tpufft import PlanConfig
from conftest import assert_spectrum_close

CFGS = {
    "xla": PlanConfig(backend="xla"),
    "kernel-interpret": PlanConfig(interpret=True, backend="auto",
                                   lane_block=128),
}


def _random_case(rng):
    ndim = int(rng.integers(1, 5))
    shape = tuple(int(rng.integers(2, 13)) for _ in range(ndim))
    n_axes = int(rng.integers(1, ndim + 1))
    axes = tuple(sorted(rng.choice(ndim, size=n_axes, replace=False).tolist()))
    norm = rng.choice([None, "ortho", "forward", "backward"])
    kind = rng.choice(["c2c", "c2c", "r2c", "c2r"])
    return shape, axes, None if norm is None else str(norm), str(kind)


@pytest.mark.parametrize("backend", sorted(CFGS))
@pytest.mark.parametrize("case", range(25))
def test_fuzz_against_numpy(case, backend, rng):
    crng = np.random.default_rng(9000 + case)
    shape, axes, norm, kind = _random_case(crng)
    cfg = CFGS[backend]
    if kind == "c2c":
        x = (crng.standard_normal(shape)
             + 1j * crng.standard_normal(shape)).astype(np.complex64)
        got = tpufft.fftn(x, axes=axes, norm=norm, config=cfg)
        ref = np.fft.fftn(x, axes=axes, norm=norm)
    elif kind == "r2c":
        x = crng.standard_normal(shape).astype(np.float32)
        got = tpufft.rfftn(x, axes=axes, norm=norm, config=cfg)
        ref = np.fft.rfftn(x.astype(np.float64), axes=axes, norm=norm)
    else:  # c2r: build a packed spectrum of a real signal
        real = crng.standard_normal(shape)
        spec = np.fft.rfftn(real, axes=axes)
        s = tuple(shape[a] for a in axes)
        got = tpufft.irfftn(spec.astype(np.complex64), s=s, axes=axes,
                            norm=norm, config=cfg)
        ref = np.fft.irfftn(spec, s=s, axes=axes, norm=norm)
    assert np.asarray(got).shape == ref.shape, (shape, axes, kind)
    assert_spectrum_close(got, ref, np.complex64)


@pytest.mark.parametrize("case", range(15))
def test_fuzz_split_roundtrip(case, rng):
    """SplitComplex I/O: plan reuse + fwd/inv roundtrip on random configs."""
    import jax.numpy as jnp
    import tpufft as tp
    from tpufft import SplitComplex

    crng = np.random.default_rng(7000 + case)
    shape, axes, norm, _ = _random_case(crng)
    cfg = CFGS["kernel-interpret"]
    x = (crng.standard_normal(shape)
         + 1j * crng.standard_normal(shape)).astype(np.complex64)
    sc = SplitComplex(jnp.asarray(x.real.copy()), jnp.asarray(x.imag.copy()))
    fwd = tp.plan_fft(shape, jnp.complex64, axes=axes, norm=norm, config=cfg)
    inv = tp.plan_fft(shape, jnp.complex64, axes=axes, norm=norm,
                      inverse=True, config=cfg)
    spec = fwd(sc)
    assert isinstance(spec, SplitComplex)
    # norms: fwd(norm) o inv(norm) == identity for backward/ortho/forward
    back = inv(spec)
    assert_spectrum_close(back.numpy(), x, np.complex64)
    # plan reuse with fresh data
    y = (crng.standard_normal(shape)
         + 1j * crng.standard_normal(shape)).astype(np.complex64)
    sy = SplitComplex(jnp.asarray(y.real.copy()), jnp.asarray(y.imag.copy()))
    assert_spectrum_close(fwd(sy).numpy(),
                          np.fft.fftn(y, axes=axes, norm=norm), np.complex64)
