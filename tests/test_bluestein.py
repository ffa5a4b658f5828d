"""Bluestein (chirp-z) fallback: any-length transforms through the fused
kernels.

Lengths whose factorizations exceed the MXU envelope (primes > 128, or
composites with an oversized prime factor) cannot use the direct or
two-pass kernel paths; the chirp-z identity re-expresses them as two
kernel FFTs of a 128-aligned fast length m >= 2n-1. The reference's
planner stops at prime 97 (fft/fft/fft.mojo:83-104); this keeps such
lengths on the accelerator path instead of the XLA fallback.
"""

import numpy as np
import pytest

import tpufft
from tpufft import PlanConfig
from tpufft.execute import _bluestein_ok
from conftest import assert_spectrum_close

CFG = PlanConfig(interpret=True, backend="pallas", lane_block=128)


def _x(rng, shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("n", [131, 257, 262, 1031])
def test_prime_lengths_forward(n, rng):
    """Prime (or prime-heavy) lengths: the direct kernel planner returns
    None, the two-pass has no valid split, Bluestein must cover (forced
    pallas backend — auto mode only dispatches here for primes > 1024,
    where the XLA dense-stage path stops being faster)."""
    from tpufft.kernels.mxu_fft import kernel_factors
    from tpufft.execute import _split_large
    assert kernel_factors(n) is None
    assert _split_large(n, np.float32, CFG) is None
    assert _bluestein_ok(n, np.float32, CFG)
    x = _x(rng, (4, n))
    got = np.asarray(tpufft.fft(x, config=CFG))
    assert_spectrum_close(got, np.fft.fft(x), np.complex64)


def test_auto_mode_threshold():
    """Auto mode keeps primes <= 1024 on the XLA dense-stage path (measured
    faster there) and routes bigger primes through Bluestein."""
    auto = PlanConfig(interpret=True, backend="auto")
    assert not _bluestein_ok(131, np.float32, auto)
    assert not _bluestein_ok(1021, np.float32, auto)
    assert _bluestein_ok(2053, np.float32, auto)
    assert _bluestein_ok(4099, np.float32, auto)


def test_prime_length_inverse_norm(rng):
    x = _x(rng, (3, 131))
    got = np.asarray(tpufft.ifft(x, norm="ortho", config=CFG))
    assert_spectrum_close(got, np.fft.ifft(x, norm="ortho"), np.complex64)


def test_prime_length_non_minor_axis(rng):
    x = _x(rng, (2, 131, 16))
    got = np.asarray(tpufft.fftn(x, axes=(1,), config=CFG))
    assert_spectrum_close(got, np.fft.fft(x, axis=1), np.complex64)


def test_prime_roundtrip(rng):
    x = _x(rng, (2, 257))
    y = np.asarray(tpufft.ifft(tpufft.fft(x, config=CFG), config=CFG))
    assert_spectrum_close(y, x, np.complex64)


def test_prime_backend_pallas_no_error(rng):
    """backend='pallas' no longer rejects unfactorable lengths — Bluestein
    IS a kernel path."""
    x = _x(rng, (2, 131))
    got = np.asarray(tpufft.fft(x, config=CFG))
    assert_spectrum_close(got, np.fft.fft(x), np.complex64)


def test_grad_through_bluestein(rng):
    import jax
    import jax.numpy as jnp
    from tpufft import SplitComplex

    re = jnp.asarray(rng.standard_normal((2, 131)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((2, 131)), jnp.float32)
    plan = tpufft.plan_fft((2, 131), jnp.complex64, axes=(-1,), config=CFG)

    def loss(re, im):
        out = plan(SplitComplex(re, im))
        return jnp.sum(out.re ** 2) + 2.0 * jnp.sum(out.im ** 2)

    def loss_ref(re, im):
        z = jnp.fft.fft(re + 1j * im, axis=-1)
        return jnp.sum(z.real ** 2) + 2.0 * jnp.sum(z.imag ** 2)

    g = jax.grad(loss, argnums=(0, 1))(re, im)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(re, im)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_kronecker_cofactor_falls_back(rng):
    """n whose only split has a Kronecker-only co-factor (1859 = 143*13,
    143 = 11*13) must take the flat two-pass, not crash the nd planner."""
    x = _x(rng, (2, 3, 1859))
    cfg = PlanConfig(interpret=True, backend="auto", lane_block=128)
    got = np.asarray(tpufft.fft(x, config=cfg))
    assert_spectrum_close(got, np.fft.fft(x), np.complex64)


def test_bluestein_preserves_bf16_planes(rng):
    """bf16-plane contract holds through Bluestein: bf16 in -> bf16 out."""
    import jax.numpy as jnp
    from tpufft import SplitComplex

    cfg = PlanConfig(interpret=True, backend="pallas", lane_block=128,
                     plane_dtype="bfloat16")
    x = _x(rng, (2, 131))
    sc = SplitComplex(jnp.asarray(x.real, jnp.bfloat16),
                      jnp.asarray(x.imag, jnp.bfloat16))
    plan = tpufft.plan_fft((2, 131), np.complex64, axes=(-1,), config=cfg)
    out = plan(sc)
    assert out.re.dtype == jnp.bfloat16
    assert out.im.dtype == jnp.bfloat16
    ref = np.fft.fft(x)
    scale = max(1.0, float(np.max(np.abs(ref))))
    assert np.max(np.abs(out.numpy() - ref)) / scale < 3e-2
