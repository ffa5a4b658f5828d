"""Unwritten-output canary for the fused kernels (grid-tail coverage).

The reference NaN-prefills every output buffer so any element a kernel
fails to write poisons the comparison (fft/tests.mojo:175,222,535). Pallas
outputs cannot be prefilled by the caller, but interpret mode zero-fills
them — so an element skipped by a grid-tail block would compare as 0.0
against a generically nonzero oracle value and fail the full-array check.
These tests sweep the remainder-prone launch geometries (batch not a
multiple of the lane block, single rows, narrow lane counts) for all three
kernel builders and compare EVERY output element.
"""

import numpy as np
import pytest

import tpufft
from tpufft import PlanConfig
from conftest import assert_spectrum_close

CFG = PlanConfig(interpret=True, backend="pallas", lane_block=128)


def _x(rng, shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("batch", [1, 5, 127, 129, 130])
@pytest.mark.parametrize("n", [93, 128])
def test_minor_kernel_tail_batches(batch, n, rng):
    x = _x(rng, (batch, n))
    got = np.asarray(tpufft.fft(x, config=CFG))
    assert np.isfinite(got).all()
    assert_spectrum_close(got, np.fft.fft(x), np.complex64)


@pytest.mark.parametrize("batch", [1, 129])
def test_minor_kernel_tail_batches_fourstep(batch, rng):
    x = _x(rng, (batch, 1024))
    got = np.asarray(tpufft.fft(x, config=CFG))
    assert np.isfinite(got).all()
    assert_spectrum_close(got, np.fft.fft(x), np.complex64)


@pytest.mark.parametrize("lanes", [1, 5, 130])
def test_inner_kernel_narrow_lanes(lanes, rng):
    """Non-minor axis (inner kernel) with lane counts around/below the lane
    block: every (row, lane) cell must be written."""
    x = _x(rng, (2, 64, lanes))
    got = np.asarray(tpufft.fftn(x, axes=(1,), config=CFG))
    assert np.isfinite(got).all()
    assert_spectrum_close(got, np.fft.fft(x, axis=1), np.complex64)


@pytest.mark.parametrize("batch", [1, 3])
def test_pair_kernel_tail_batches(batch, rng):
    x = _x(rng, (batch, 64, 128))
    got = np.asarray(tpufft.fftn(x, axes=(1, 2), config=CFG))
    assert np.isfinite(got).all()
    assert_spectrum_close(got, np.fft.fft2(x, axes=(1, 2)), np.complex64)


@pytest.mark.parametrize("shape,axis", [
    ((2, 25, 7, 11), 1),      # small kind; M=7 and L=11 both grid tails
    ((1, 160, 9, 48), 1),     # four_step_bf; M=9 rides the mblk tail
    ((2, 24, 5, 160), 1),     # L>=160 branch: lane block 256 over L=160
    ((2, 10, 3, 5, 48), 2),   # 5D middle axis through the nd view
])
def test_inner_nd_kernel_tails(shape, axis, rng):
    """nd-inner kernel (native trailing layout) with remainder-prone M/L
    block tails: every output element must be written."""
    x = _x(rng, shape)
    got = np.asarray(tpufft.fftn(x, axes=(axis,), config=CFG))
    assert np.isfinite(got).all()
    assert_spectrum_close(got, np.fft.fft(x, axis=axis), np.complex64)


def test_inner_nd_big_vmem_fallback(rng):
    """Big-n raised-vmem nd path (the 512^3 leading-axis geometry): a tiny
    vmem budget forces _plan_inner_nd past its normal loop into the
    raised-limit fallback; interpret mode checks the block geometry."""
    from tpufft.kernels import mxu_fft

    cfg = PlanConfig(interpret=True, backend="pallas",
                     vmem_budget_bytes=64 * 1024)
    n, M, L = 64, 24, 128
    run = mxu_fft._plan_inner_nd(n, False, 1.0, M, L, cfg, True)
    assert run is not None
    x = _x(rng, (2 * n, M, L))
    ar, ai = run(np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag))
    got = np.asarray(ar) + 1j * np.asarray(ai)
    want = np.fft.fft(x.reshape(2, n, M, L), axis=1).reshape(2 * n, M, L)
    assert np.isfinite(got).all()
    assert_spectrum_close(got, want, np.complex64)
