"""Test environment: CPU with 8 virtual devices, x64 enabled.

Tests run without TPU hardware: Pallas kernels run in interpret mode (the
analog of the reference forcing GPU residency tiers in software,
fft/fft/_ndim_fft_gpu.mojo:453-459), and sharding tests use a virtual
8-device CPU mesh.
"""

import os

# Note: this environment may pre-register an out-of-process TPU plugin that
# overrides JAX_PLATFORMS at interpreter start; the jax.config update below
# (which takes precedence over the plugin's selection) is what actually pins
# the tests to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def assert_spectrum_close(got, expected, dtype):
    """Tolerance contract from BASELINE.md: 1e-6 for c128-path, 1e-3 for c64.

    Normalized by the spectrum magnitude so large integer series don't turn
    absolute tolerance into a no-op.
    """
    got = np.asarray(got)
    expected = np.asarray(expected)
    scale = max(1.0, float(np.max(np.abs(expected))))
    tol = 1e-6 if np.dtype(dtype) in (np.complex128, np.float64) else 1e-3
    err = np.max(np.abs(got - expected)) / scale
    assert err < tol, f"normalized error {err:.3e} >= {tol} (dtype={dtype})"
