"""Backend dispatch and launch-config model (split-plane contract).

The TPU-native counterpart of the reference's per-dim scheduling
(``_run_gpu_nd_fft`` orchestration, fft/fft/_ndim_fft_gpu.mojo:462-642, and
the ``_GPUExecConfig`` occupancy model at :38-137): for each transformed axis
decide between

  * the fused MXU Pallas kernel (the whole axis's transform as dense
    DFT-matrix matmuls in VMEM — kernels/mxu_fft.py), and
  * the pure-XLA jnp path (the analog of its global-memory fallback; also
    the f64 and large/prime-length path).

All data moves through this layer as split real/imag float planes (see
core.SplitComplex) because TPU has no complex arithmetic.
"""

from __future__ import annotations

import functools
import logging

import numpy as np

import jax
import jax.numpy as jnp

from math import prod as math_prod

from . import core
from .config import PlanConfig
from .kernels import mxu_fft

__all__ = [
    "fft_axis", "fft_pair_last", "fft_cube_last", "pallas_supported",
    "pair_supported", "cube_supported", "choose_lane_block",
]

choose_lane_block = mxu_fft.choose_lane_block

logger = logging.getLogger("tpufft")


def _is_tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - defensive
        return False


def pallas_supported(n: int, dtype, cfg: PlanConfig) -> bool:
    """Can this axis run in the fused MXU kernel?"""
    if cfg.backend == "xla":
        return False
    if not (cfg.interpret or _is_tpu_backend()):
        return False
    return mxu_fft.pallas_supported(n, dtype, cfg)


def _split_large(n: int, dtype, cfg: PlanConfig):
    """Factor a kernel-oversized length into A * B with both components
    kernel-supported; A as balanced as possible. None if not factorable."""
    if n < 4:
        return None
    best = None
    d = 2
    while d * d <= n:
        if n % d == 0:
            a, b = n // d, d
            if (mxu_fft.pallas_supported(a, dtype, cfg)
                    and mxu_fft.pallas_supported(b, dtype, cfg)):
                best = (a, b)  # last hit = most balanced (d grows to sqrt)
        d += 1
    return best


@functools.lru_cache(maxsize=None)
def _two_pass_twiddle(a: int, b: int, inverse: bool):
    """Host f64 inter-factor twiddle T[ka, ib] = e^{-+2 pi i ka ib / (a b)}
    of the N = a*b split, shared by both two-pass variants."""
    sign = 1.0 if inverse else -1.0
    k = np.outer(np.arange(a, dtype=np.float64),
                 np.arange(b, dtype=np.float64))
    theta = (sign * 2.0 * np.pi / (a * b)) * k
    return np.cos(theta), np.sin(theta)


def _fft_axis_two_pass(ar, ai, axis, a, b, *, inverse, scale, config):
    """Four-step decomposition for lengths beyond the fused kernel's VMEM
    envelope, split on the SUBLANE side.

    n = a*b with flat index i = ia*b + ib (ia slow): viewing the axis as two
    dims (a, b) is a free reshape (major-dim split — no lane layout change),
    pass 1 transforms the ia dim through the nd-inner kernel with the
    inter-factor twiddle e(ia-hat * ib / n) folded into the kernel store,
    pass 2 transforms ib, and one swap of the two digit dims restores
    natural order (out flat k = kb*a + ka). Every pass runs over the
    array's native lane layout — the older lane-split form (kept below as
    the fallback) reshaped (batch, n) -> (batch, a, b), which physically
    repacks the padded layout AND runs passes at misaligned lane widths
    (measured (1,7680,4320): 15.1 ms -> see BENCH_SUITE.md).

    For a minor axis the array is first transposed axis-to-front (aligned
    full-bandwidth passes), transformed, and transposed back with the digit
    swap folded into the same XLA copy."""
    n = a * b
    ndim = ar.ndim
    axis = axis % ndim
    logger.debug("execute two-pass: n=%d a=%d b=%d axis=%d", n, a, b, axis)
    if ai is None:
        ai = jnp.zeros_like(ar)
    interpret = bool(config.interpret)

    # pass-1 factor must be nd-kernel-able; try both digit orders.
    def _nd_able(x):
        k = mxu_fft.kernel_factors(x)
        return k is not None and k[0] in ("small", "four_step_bf")

    if not _nd_able(a):
        if _nd_able(b):
            a, b = b, a
        else:
            return _fft_axis_two_pass_flat(
                ar, ai, axis, a, b, inverse=inverse, scale=scale,
                config=config)

    minor = axis == ndim - 1
    if minor:
        ar = jnp.moveaxis(ar, -1, 0)
        ai = jnp.moveaxis(ai, -1, 0)
        rest = ar.shape[1:]
        pre = 1
        mid = math_prod(rest[:-1]) if len(rest) > 1 else 1
        L = rest[-1] if rest else 1
    else:
        shape = ar.shape
        pre = math_prod(shape[:axis])
        rest = shape[axis + 1:]
        mid = math_prod(rest[:-1]) if len(rest) > 1 else 1
        L = rest[-1]

    M1 = b * mid
    storage = mxu_fft.storage_of(ar.dtype)
    run1 = mxu_fft._plan_inner_nd(a, inverse, 1.0, M1, L, config, interpret,
                                  with_tw=True, storage=storage)
    if mid == 1:
        run2 = "flat"
    else:
        run2 = mxu_fft._plan_inner_nd(b, inverse, float(scale), mid, L,
                                      config, interpret, storage=storage)
    # the folded twiddle table is (a, b*mid); bail out if repetition over a
    # large mid would blow host/constant memory
    if run1 is None or run2 is None or a * M1 > (1 << 22):
        if minor:
            ar = jnp.moveaxis(ar, 0, -1)
            ai = jnp.moveaxis(ai, 0, -1)
        return _fft_axis_two_pass_flat(
            ar, ai, axis, a, b, inverse=inverse, scale=scale, config=config)

    twr_h, twi_h = _two_pass_twiddle(a, b, inverse)
    if mid > 1:
        twr_h = np.repeat(twr_h, mid, axis=1)
        twi_h = np.repeat(twi_h, mid, axis=1)
    twr = jnp.asarray(twr_h, jnp.float32)
    twi = jnp.asarray(twi_h, jnp.float32)

    orig_shape = ar.shape
    ar3 = ar.reshape(pre * a, M1, L)
    ai3 = ai.reshape(pre * a, M1, L)
    ar3, ai3 = run1(ar3, ai3, twr, twi)
    if run2 == "flat":
        ar3 = ar3.reshape(pre * a, b, L)
        ai3 = ai3.reshape(pre * a, b, L)
        ar3, ai3 = mxu_fft.fft_axis_pallas(
            ar3, ai3, 1, (), inverse=inverse, scale=scale, config=config)
    else:
        ar3 = ar3.reshape(pre * a * b, mid, L)
        ai3 = ai3.reshape(pre * a * b, mid, L)
        ar3, ai3 = run2(ar3, ai3)

    # restore natural order along the axis: digits (ka, kb) -> k = kb*a + ka
    if minor:
        k_rest = len(rest)
        perm = tuple(range(2, 2 + k_rest)) + (1, 0)
        out_shape = rest + (n,)
        ar = ar3.reshape((a, b) + rest).transpose(perm).reshape(out_shape)
        ai = ai3.reshape((a, b) + rest).transpose(perm).reshape(out_shape)
        return ar, ai
    split_shape = orig_shape[:axis] + (a, b) + orig_shape[axis + 1:]
    ar = jnp.swapaxes(ar3.reshape(split_shape), axis, axis + 1)
    ai = jnp.swapaxes(ai3.reshape(split_shape), axis, axis + 1)
    return ar.reshape(orig_shape), ai.reshape(orig_shape)


def _fft_axis_two_pass_flat(ar, ai, axis, a, b, *, inverse, scale, config):
    """Six-step decomposition for lengths beyond the fused kernel's VMEM
    envelope: two fused-kernel passes with one HBM roundtrip between — the
    analog of the reference's global-memory fallback mode
    (use_shared_memory=False, fft/fft/_ndim_fft_gpu.mojo:114-136), except
    each pass is still a full MXU-matmul transform rather than one butterfly
    stage.

    n = a*b, flat index along ``axis`` = ia*b + ib (ia slow):
        X[kb*a + ka] = sum_ib W_b[kb, ib] ( T[ka, ib]
                          sum_ia W_a[ka, ia] x[ia*b + ib] )
    Pass 1 transforms the (now separated) ia axis with lanes = ib via the
    transpose-free inner-axis kernel; the inter-factor twiddle is an XLA
    elementwise multiply (fused into neighbors); pass 2 transforms ib; the
    final (ka, kb) -> (kb, ka) swap restores natural order.
    """
    n = a * b
    ndim = ar.ndim
    axis = axis % ndim
    logger.debug("execute two-pass-flat: n=%d a=%d b=%d axis=%d", n, a, b,
                 axis)
    if ai is None:
        ai = jnp.zeros_like(ar)
    twr_h, twi_h = _two_pass_twiddle(a, b, inverse)

    if axis == ndim - 1:
        pre = ar.shape[:-1]
        ar = ar.reshape(pre + (a, b))
        ai = ai.reshape(pre + (a, b))
        # pass 1: FFT over the ia axis (length a), lanes = ib
        ar, ai = mxu_fft.fft_axis_pallas(
            ar, ai, ar.ndim - 2, (), inverse=inverse, scale=1.0,
            config=config,
        )
        twr = jnp.asarray(twr_h, ar.dtype)
        twi = jnp.asarray(twi_h, ar.dtype)
        ar, ai = ar * twr - ai * twi, ar * twi + ai * twr
        # pass 2: FFT over the ib axis (length b, minor)
        ar, ai = mxu_fft.fft_axis_pallas(
            ar, ai, ar.ndim - 1, (), inverse=inverse, scale=scale,
            config=config,
        )
        # natural order: out flat k = kb*a + ka -> (kb, ka) major
        ar = jnp.swapaxes(ar, -2, -1).reshape(pre + (n,))
        ai = jnp.swapaxes(ai, -2, -1).reshape(pre + (n,))
        return ar, ai

    # Non-minor axis: stay in the inner layout throughout — both passes use
    # the transpose-free inner kernel and only the final (ka, kb) swap costs
    # an HBM pass (the moveaxis-based variant would cost two extra).
    shape = ar.shape
    pre = math_prod(shape[:axis])
    post = math_prod(shape[axis + 1:])
    ar = ar.reshape(pre, a, b, post)
    ai = ai.reshape(pre, a, b, post)
    # pass 1: FFT over ia, lane batch = (ib, post)
    ar, ai = [x.reshape(pre, a, b * post) for x in (ar, ai)]
    ar, ai = mxu_fft.fft_axis_pallas(
        ar, ai, 1, (), inverse=inverse, scale=1.0, config=config,
    )
    ar = ar.reshape(pre, a, b, post)
    ai = ai.reshape(pre, a, b, post)
    twr = jnp.asarray(twr_h, ar.dtype)[None, :, :, None]
    twi = jnp.asarray(twi_h, ar.dtype)[None, :, :, None]
    ar, ai = ar * twr - ai * twi, ar * twi + ai * twr
    # pass 2: FFT over ib, lane batch = post
    ar, ai = [x.reshape(pre * a, b, post) for x in (ar, ai)]
    ar, ai = mxu_fft.fft_axis_pallas(
        ar, ai, 1, (), inverse=inverse, scale=scale, config=config,
    )
    # natural order along the axis: (ka, kb) -> (kb, ka)
    ar = ar.reshape(pre, a, b, post).swapaxes(1, 2)
    ai = ai.reshape(pre, a, b, post).swapaxes(1, 2)
    out_shape = shape[:axis] + (n,) + shape[axis + 1:]
    return ar.reshape(out_shape), ai.reshape(out_shape)


def _bluestein_ok(n: int, dtype, cfg: PlanConfig) -> bool:
    """Is the Bluestein fallback both (a) faster than the XLA path here and
    (b) guaranteed to recurse into kernel paths (never into itself) at the
    padded length m?

    (a): the XLA path runs an unfactorable prime p as ONE dense-DFT stage —
    which XLA lowers to an MXU matmul, and that is FAST for moderate p
    (measured crossover, batch ~13M elements: p=1021 XLA 3.0 ms vs
    Bluestein 4.2; p=2053 7.4 vs 6.8; p=4099 14.5 vs 5.1 — and the XLA
    side grows ~linearly in p plus an O(p^2) twiddle constant). Bluestein
    dispatches only when the largest prime factor exceeds 1024."""
    if n < 8:
        return False
    from . import planner  # local import: no cycle

    if cfg.backend != "pallas" and max(planner.factorize(n)) <= 1024:
        return False  # auto mode: dense-stage XLA path measured faster
    m = planner.next_fast_len(2 * n - 1, aligned=True)
    return (mxu_fft.pallas_supported(m, jnp.float32, cfg)
            or _split_large(m, jnp.float32, cfg) is not None)


@functools.lru_cache(maxsize=None)
def _bluestein_tables(n: int, m: int, inverse: bool, scale: float):
    """Host-precomputed chirp constants for the Bluestein (chirp-z) path.

    Angles use the exact integer reduction k^2 mod 2n so f64 precision
    holds for any k (pi * (k^2 mod 2n) / n == pi * k^2 / n mod 2*pi).
    Returns (cr, ci, c_out_r, c_out_i, Br, Bi): the input chirp c[k],
    the output chirp (user scale folded), and FFT_m of the wrapped
    conjugate chirp.
    """
    k = np.arange(n, dtype=np.int64)
    sq = (k * k) % (2 * n)
    ang = np.pi * sq.astype(np.float64) / n
    s = 1.0 if inverse else -1.0
    cr = np.cos(ang)
    ci = s * np.sin(ang)                      # c[k] = exp(s*i*pi*k^2/n)
    b = np.zeros(m, np.complex128)
    conj_c = cr - 1j * ci
    b[:n] = conj_c
    b[m - n + 1:] = conj_c[1:][::-1]          # b[m-j] = conj(c[j])
    B = np.fft.fft(b)
    # host numpy only: jnp conversion happens per trace (a cached device
    # constant created inside one jit trace would leak its tracer into the
    # next)
    f32 = lambda x: np.asarray(x, np.float32)
    return (f32(cr), f32(ci), f32(cr * scale), f32(ci * scale),
            f32(B.real), f32(B.imag))


def _fft_axis_bluestein(ar, ai, axis, *, inverse, scale, config):
    """Bluestein (chirp-z) fallback: ANY length through the fused kernels.

    Lengths the kernel planner cannot factorize (a prime > 128, or any n
    whose co-factors exceed the MXU envelope) would otherwise fall to the
    pure-XLA path (5-30x slower on TPU). The DFT is re-expressed as a
    circular convolution of chirp-premultiplied input with a fixed chirp,
    evaluated as fft_m -> pointwise -> ifft_m at a 128-aligned
    kernel-friendly length m >= 2n-1 — both transforms run on the MXU
    regardless of n's factorization. The convolution direction is always
    forward/inverse-m; the USER direction lives in the chirp's sign.

    Covers the same any-length contract as the reference's prime-greedy
    planner fallback (fft/fft/fft.mojo:83-104) but at kernel speed.
    """
    from . import planner  # local import: no cycle

    n = ar.shape[axis]
    m = planner.next_fast_len(2 * n - 1, aligned=True)
    ndim = ar.ndim
    axis = axis % ndim
    if ai is None:
        ai = jnp.zeros_like(ar)
    # The chirp multiplies promote bf16 planes to f32; remember the storage
    # dtype so the bf16-plane contract (bf16 in -> bf16 out) holds here too.
    in_dtype = ar.dtype
    cr, ci, por, poi, Br, Bi = (
        jnp.asarray(t) for t in _bluestein_tables(
            n, m, bool(inverse), float(scale)))

    moved = axis != ndim - 1
    if moved:
        ar = jnp.moveaxis(ar, axis, -1)
        ai = jnp.moveaxis(ai, axis, -1)
    shape = ar.shape
    ar = ar.reshape(-1, n)
    ai = ai.reshape(-1, n)
    # a[j] = x[j] * c[j], zero-padded to m
    pr = ar * cr - ai * ci
    pi = ar * ci + ai * cr
    pad = ((0, 0), (0, m - n))
    pr = jnp.pad(pr, pad)
    pi = jnp.pad(pi, pad)
    # A = FFT_m(a);  C = A * B;  y = IFFT_m(C)  (1/m folded into the ifft)
    pr, pi = _fft_axis_impl(pr, pi, 1, (), inverse=False, scale=1.0,
                            config=config)
    pr, pi = pr * Br - pi * Bi, pr * Bi + pi * Br
    pr, pi = _fft_axis_impl(pr, pi, 1, (), inverse=True, scale=1.0 / m,
                            config=config)
    pr = pr[:, :n]
    pi = pi[:, :n]
    outr = (pr * por - pi * poi).astype(in_dtype)
    outi = (pr * poi + pi * por).astype(in_dtype)
    outr = outr.reshape(shape)
    outi = outi.reshape(shape)
    if moved:
        outr = jnp.moveaxis(outr, -1, axis)
        outi = jnp.moveaxis(outi, -1, axis)
    return outr, outi


def pair_supported(n1: int, n2: int, dtype, cfg: PlanConfig) -> bool:
    """Can the trailing two axes run as one fused 2D VMEM tile?"""
    if cfg.backend == "xla":
        return False
    if not (cfg.interpret or _is_tpu_backend()):
        return False
    return mxu_fft.pair_supported(n1, n2, dtype, cfg)


@functools.lru_cache(maxsize=None)
def _fft_pair_diff(inverse: bool, scale: float, config: PlanConfig,
                   n2_io: tuple[int, int] | None = None):
    """custom-vjp wrapper for the fused trailing-pair kernel (same
    conjugate-transform transpose identity as _fft_axis_diff). With
    ``n2_io = (m_in, m_out)`` the minor axis is the rectangular zero-pad
    DFT; its adjoint is the conjugate pair with the swapped rectangle."""

    @jax.custom_vjp
    def f(ar, ai):
        return mxu_fft.fft_pair_pallas(
            ar, ai, inverse=inverse, scale=scale, config=config,
            n2_io=n2_io,
        )

    def fwd(ar, ai):
        return f(ar, ai), None

    def bwd(_, g):
        gr, gi = g
        adj_io = None if n2_io is None else (n2_io[1], n2_io[0])
        return _fft_pair_diff(not inverse, scale, config, adj_io)(gr, gi)

    f.defvjp(fwd, bwd)
    return f


def fft_pair_last(
    ar: jnp.ndarray,
    ai: jnp.ndarray | None,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
    n2_out: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused transform of the last two axes (single HBM pass,
    differentiable). ``n2_out``: zero-pad the minor axis to this length
    inside the pass (rectangular right-multiply — no pad pass)."""
    if ai is None:
        ai = jnp.zeros_like(ar)
    n2_io = None
    if n2_out is not None and n2_out != ar.shape[-1]:
        n2_io = (int(ar.shape[-1]), int(n2_out))
    return _fft_pair_diff(bool(inverse), float(scale), config, n2_io)(ar, ai)


def pair_pad_ok(n1: int, n2_in: int, n2: int, dtype,
                cfg: PlanConfig) -> bool:
    """Can the trailing pair fuse the minor-axis zero-pad (n2_in -> n2)?"""
    if cfg.backend == "xla":
        return False
    if not (cfg.interpret or _is_tpu_backend()):
        return False
    return mxu_fft.pair_pad_supported(n1, n2_in, n2, dtype, cfg)


def mid_pair_ok(n1: int, n2: int, dtype, cfg: PlanConfig) -> bool:
    """Can two adjacent middle axes run as one fused kernel pass?"""
    if cfg.backend == "xla":
        return False
    if not (cfg.interpret or _is_tpu_backend()):
        return False
    return mxu_fft.mid_pair_supported(n1, n2, dtype, cfg)


@functools.lru_cache(maxsize=None)
def _fft_mid_pair_diff(inverse: bool, scale: float, config: PlanConfig):
    """custom-vjp wrapper for the fused middle-pair kernel (same
    conjugate-transform transpose identity as the other fused passes)."""

    @jax.custom_vjp
    def f(ar, ai):
        return mxu_fft.fft_mid_pair_pallas(
            ar, ai, inverse=inverse, scale=scale, config=config)

    def fwd(ar, ai):
        return f(ar, ai), None

    def bwd(_, g):
        gr, gi = g
        return _fft_mid_pair_diff(not inverse, scale, config)(gr, gi)

    f.defvjp(fwd, bwd)
    return f


def fft_mid_pair(ar, ai, axis1: int, *, inverse: bool, scale: float,
                 config: PlanConfig):
    """Fused transform of the ADJACENT axes (axis1, axis1 + 1) in one HBM
    pass. The trailing dims flatten into the lane axis — free only when
    the array's physical layout is dense (caller checks; see
    api._apply_plan_split mid-pair gate)."""
    if ai is None:
        ai = jnp.zeros_like(ar)
    shape = ar.shape
    a = axis1 % ar.ndim
    pre = math_prod(shape[:a]) if a else 1
    L = math_prod(shape[a + 2:]) if a + 2 < ar.ndim else 1
    view = (pre, shape[a], shape[a + 1], L)
    outr, outi = _fft_mid_pair_diff(bool(inverse), float(scale), config)(
        ar.reshape(view), ai.reshape(view))
    return outr.reshape(shape), outi.reshape(shape)


def cube_supported(n1: int, n2: int, n3: int, dtype, cfg: PlanConfig) -> bool:
    """Can the trailing three axes run as one fused 3D VMEM tile?"""
    if cfg.backend == "xla":
        return False
    if not (cfg.interpret or _is_tpu_backend()):
        return False
    return mxu_fft.cube_supported(n1, n2, n3, dtype, cfg)


@functools.lru_cache(maxsize=None)
def _fft_cube_diff(inverse: bool, scale: float, config: PlanConfig):
    """custom-vjp wrapper for the fused trailing-cube kernel (same
    conjugate-transform transpose identity as _fft_axis_diff)."""

    @jax.custom_vjp
    def f(ar, ai):
        return mxu_fft.fft_cube_pallas(
            ar, ai, inverse=inverse, scale=scale, config=config
        )

    def fwd(ar, ai):
        return f(ar, ai), None

    def bwd(_, g):
        gr, gi = g
        return _fft_cube_diff(not inverse, scale, config)(gr, gi)

    f.defvjp(fwd, bwd)
    return f


def fft_cube_last(
    ar: jnp.ndarray,
    ai: jnp.ndarray | None,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused transform of the last three axes (single HBM pass,
    differentiable)."""
    if ai is None:
        ai = jnp.zeros_like(ar)
    return _fft_cube_diff(bool(inverse), float(scale), config)(ar, ai)


@functools.lru_cache(maxsize=None)
def _fft_cube_fused_diff(inverse: bool, scale: float, config: PlanConfig):
    """custom-vjp wrapper for the fused-STORAGE cube kernel (plan
    layout='lane-fused'). The fused array is the stacked [re | im] real
    vector, on which the DFT is the real matrix A = [[Fr, -Fi], [Fi, Fr]];
    F symmetric gives A^T = the opposite-sign transform, same scale."""

    @jax.custom_vjp
    def f(st):
        return mxu_fft.fft_cube_fused_pallas(
            st, inverse=inverse, scale=scale, config=config
        )

    def fwd(st):
        return f(st), None

    def bwd(_, g):
        return (_fft_cube_fused_diff(not inverse, scale, config)(g),)

    f.defvjp(fwd, bwd)
    return f


def fft_cube_fused(
    st: jnp.ndarray,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> jnp.ndarray:
    """Fused-storage transform of the last three logical axes of a
    lane-fused (..., n1, n2, 2*n3) array (differentiable)."""
    return _fft_cube_fused_diff(bool(inverse), float(scale), config)(st)


@functools.lru_cache(maxsize=None)
def _fft_pair_fused_diff(inverse: bool, scale: float, config: PlanConfig):
    """custom-vjp wrapper for the fused-storage pair pass (both real
    matrices transpose to the opposite-sign transform, same scale)."""

    @jax.custom_vjp
    def f(st):
        return mxu_fft.fft_pair_fused_pallas(
            st, inverse=inverse, scale=scale, config=config
        )

    def fwd(st):
        return f(st), None

    def bwd(_, g):
        return (_fft_pair_fused_diff(not inverse, scale, config)(g),)

    f.defvjp(fwd, bwd)
    return f


def fft_pair_fused(
    st: jnp.ndarray,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> jnp.ndarray:
    """Fused-storage transform of the last two logical axes of a
    lane-fused (..., n2, 2*n3) array (differentiable)."""
    return _fft_pair_fused_diff(bool(inverse), float(scale), config)(st)


@functools.lru_cache(maxsize=None)
def _fft_minor_fused_diff(inverse: bool, scale: float, config: PlanConfig):
    """custom-vjp wrapper for the fused-storage minor pass (the block
    matrix [[Wr, Wi], [-Wi, Wr]] is transposed by flipping the transform
    sign, same scale)."""

    @jax.custom_vjp
    def f(st):
        return mxu_fft.fft_minor_fused_pallas(
            st, inverse=inverse, scale=scale, config=config
        )

    def fwd(st):
        return f(st), None

    def bwd(_, g):
        return (_fft_minor_fused_diff(not inverse, scale, config)(g),)

    f.defvjp(fwd, bwd)
    return f


def fft_minor_fused(
    st: jnp.ndarray,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> jnp.ndarray:
    """Fused-storage transform of the minor logical axis of a lane-fused
    (..., 2*n) array (differentiable)."""
    return _fft_minor_fused_diff(bool(inverse), float(scale), config)(st)


@functools.lru_cache(maxsize=None)
def _fft_axis_fused_diff(axis: int, inverse: bool, scale: float,
                         config: PlanConfig):
    """custom-vjp wrapper for the fused-storage leading-axis pass (same
    opposite-sign transpose identity)."""

    @jax.custom_vjp
    def f(st):
        return mxu_fft.fft_axis_fused_pallas(
            st, axis, inverse=inverse, scale=scale, config=config
        )

    def fwd(st):
        return f(st), None

    def bwd(_, g):
        return (_fft_axis_fused_diff(axis, not inverse, scale, config)(g),)

    f.defvjp(fwd, bwd)
    return f


def fft_axis_fused(
    st: jnp.ndarray,
    axis: int,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> jnp.ndarray:
    """Fused-storage transform along a leading logical axis
    (differentiable)."""
    return _fft_axis_fused_diff(int(axis), bool(inverse), float(scale),
                                config)(st)


@functools.lru_cache(maxsize=None)
def _fft_axis_diff(axis: int, bases: tuple[int, ...], inverse: bool,
                   scale: float, config: PlanConfig):
    """custom-vjp wrapper per static config.

    The split-plane DFT is a real-linear map with matrix
    A = [[Fr, -Fi], [Fi, Fr]] and F symmetric, so A^T g = conj(F(conj g))
    = the same transform with the opposite twiddle sign: the VJP of a
    forward fft_axis is an inverse-signed fft_axis with the same scale.
    Needed because pallas_call has no automatic transpose/grad rule (the
    pure-XLA path would differentiate fine, but the fused kernels would
    not)."""

    @jax.custom_vjp
    def f(ar, ai):
        return _fft_axis_impl(ar, ai, axis, bases, inverse=inverse,
                              scale=scale, config=config)

    def fwd(ar, ai):
        return f(ar, ai), None

    def bwd(_, g):
        gr, gi = g
        return _fft_axis_diff(axis, bases, not inverse, scale, config)(gr, gi)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _fft_axis_diff_real(axis: int, bases: tuple[int, ...], inverse: bool,
                        scale: float, config: PlanConfig):
    """Real-input variant (imag plane elided): the transpose of
    (embed-real then transform) is (conjugate transform then take the real
    plane)."""

    @jax.custom_vjp
    def f(ar):
        return _fft_axis_impl(ar, None, axis, bases, inverse=inverse,
                              scale=scale, config=config)

    def fwd(ar):
        return f(ar), None

    def bwd(_, g):
        gr, gi = g
        br, _ = _fft_axis_diff(axis, bases, not inverse, scale, config)(
            gr, gi)
        return (br,)

    f.defvjp(fwd, bwd)
    return f


def fft_axis(
    ar: jnp.ndarray,
    ai: jnp.ndarray | None,
    axis: int,
    bases: tuple[int, ...],
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Transform one axis of the split planes (differentiable)."""
    key = (axis % ar.ndim, tuple(bases), bool(inverse), float(scale), config)
    if ai is None:
        return _fft_axis_diff_real(*key)(ar)
    return _fft_axis_diff(*key)(ar, ai)


def r2c_minor_supported(n: int, dtype, cfg: PlanConfig) -> bool:
    """Can the direct rectangular r2c/c2r kernel serve this axis?"""
    if cfg.backend == "xla":
        return False
    if not (cfg.interpret or _is_tpu_backend()):
        return False
    return mxu_fft.r2c_minor_supported(n, dtype, cfg)


def pad_axis_ok(n_in: int, n_out: int, dtype, cfg: PlanConfig) -> bool:
    """Can a zero-padded axis (plan length n_out > input length n_in) run
    as ONE fused rectangular pad-DFT matmul instead of an XLA zero-pad
    pass followed by a transform? The pad-pass elimination is what makes
    ``s="fast-aligned"`` plans fast on as-is inputs: the XLA pad of a
    misaligned layout costs more than the transform itself (measured
    (1000000, 93): the pad pass alone ~5 ms)."""
    if cfg.backend == "xla":
        return False
    if not (cfg.interpret or _is_tpu_backend()):
        return False
    return mxu_fft.pad_minor_supported(n_in, n_out, dtype, cfg)


@functools.lru_cache(maxsize=None)
def _pad_fft_minor_diff(n_in: int, n_out: int, inverse: bool, scale: float,
                        config: PlanConfig):
    """Differentiable fused zero-pad DFT of the last axis (rectangular
    X = x @ W[:n_in, :]). The VJP is the adjoint crop-DFT g @ W^H — plain
    XLA dots (the backward pass is not a serving hot path)."""

    @jax.custom_vjp
    def f(ar, ai):
        bblk = mxu_fft.choose_lane_block(n_out, config)
        run = mxu_fft._build_minor_rect(
            n_in, n_out, n_out, inverse, float(scale), bblk,
            config.precision, bool(config.interpret),
            mxu_fft.storage_of(ar.dtype))
        return run(ar, ai)

    def fwd(ar, ai):
        return f(ar, ai), jnp.zeros((0,), ar.dtype)

    def bwd(res, g):
        gr, gi = g
        wr, wi = mxu_fft._tables_rect(n_in, n_out, n_out, inverse,
                                      float(scale))
        wrT = jnp.asarray(wr).T
        wiT = jnp.asarray(wi).T
        gr32 = gr.astype(jnp.float32)
        gi32 = gi.astype(jnp.float32)
        dxr = jnp.dot(gr32, wrT) + jnp.dot(gi32, wiT)
        dxi = jnp.dot(gi32, wrT) - jnp.dot(gr32, wiT)
        return dxr.astype(res.dtype), dxi.astype(res.dtype)

    f.defvjp(fwd, bwd)
    return f


def fft_axis_padded(
    ar: jnp.ndarray,
    ai: jnp.ndarray | None,
    axis: int,
    n_out: int,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-pad ``axis`` to length ``n_out`` AND transform it, fused into
    one rectangular kernel pass (pad_axis_ok must hold)."""
    axis = axis % ar.ndim
    n_in = ar.shape[axis]
    if ai is None:
        ai = jnp.zeros_like(ar)
    moved = axis != ar.ndim - 1
    if moved:
        ar = jnp.moveaxis(ar, axis, -1)
        ai = jnp.moveaxis(ai, axis, -1)
    pre = ar.shape[:-1]
    outr, outi = _pad_fft_minor_diff(n_in, n_out, bool(inverse),
                                     float(scale), config)(
        ar.reshape(-1, n_in), ai.reshape(-1, n_in))
    outr = outr.reshape(pre + (n_out,))
    outi = outi.reshape(pre + (n_out,))
    if moved:
        outr = jnp.moveaxis(outr, -1, axis)
        outi = jnp.moveaxis(outi, -1, axis)
    return outr, outi


@functools.lru_cache(maxsize=None)
def _rfft_minor_diff(n: int, scale: float, config: PlanConfig):
    """Differentiable direct-rectangular rfft of the last axis.

    X = x @ V is real-linear, so the VJP is two plain matmuls with V^T —
    run as XLA dots (the backward pass is not a serving hot path)."""

    @jax.custom_vjp
    def f(x):
        bblk = mxu_fft.choose_lane_block(n, config)
        run = mxu_fft._build_minor_r2c(
            n, float(scale), bblk, config.precision, bool(config.interpret),
            mxu_fft.storage_of(x.dtype))
        return run(x)

    def fwd(x):
        # Residual must be a JAX type: carry the input dtype as an empty
        # array (a bare np.dtype raises TypeError under jax.vjp).
        return f(x), jnp.zeros((0,), x.dtype)

    def bwd(res, g):
        gr, gi = g
        vr, vi = mxu_fft._tables_r2c(n, float(scale))
        gx = (jnp.dot(gr.astype(jnp.float32), jnp.asarray(vr).T)
              + jnp.dot(gi.astype(jnp.float32), jnp.asarray(vi).T))
        return (gx.astype(res.dtype),)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _irfft_minor_diff(n: int, scale: float, config: PlanConfig):
    """Differentiable direct Hermitian synthesis of the last axis."""

    @jax.custom_vjp
    def f(ar, ai):
        bblk = mxu_fft.choose_lane_block(n, config)
        run = mxu_fft._build_minor_c2r(
            n, float(scale), bblk, config.precision, bool(config.interpret),
            mxu_fft.storage_of(ar.dtype))
        return run(ar, ai)

    def fwd(ar, ai):
        return f(ar, ai), jnp.zeros((0,), ar.dtype)

    def bwd(res, g):
        cr, ci = mxu_fft._tables_c2r(n, float(scale))
        g32 = g.astype(jnp.float32)
        return (jnp.dot(g32, jnp.asarray(cr).T).astype(res.dtype),
                jnp.dot(g32, jnp.asarray(ci).T).astype(res.dtype))

    f.defvjp(fwd, bwd)
    return f


def rfft_minor(ar, axis: int, n: int, scale: float, config: PlanConfig):
    """Direct rectangular rfft along ``axis`` of the real plane ``ar``:
    one fused MXU pass, any n <= R2C_MAX_N (odd and prime included).
    Returns (re, im) planes packed to n//2+1."""
    axis = axis % ar.ndim
    moved = axis != ar.ndim - 1
    if moved:
        ar = jnp.moveaxis(ar, axis, -1)
    pre = ar.shape[:-1]
    out = _rfft_minor_diff(n, float(scale), config)(ar.reshape(-1, n))
    outr = out[0].reshape(pre + (n // 2 + 1,))
    outi = out[1].reshape(pre + (n // 2 + 1,))
    if moved:
        outr = jnp.moveaxis(outr, -1, axis)
        outi = jnp.moveaxis(outi, -1, axis)
    return outr, outi


def irfft_minor(ar, ai, axis: int, n: int, scale: float, config: PlanConfig):
    """Direct Hermitian synthesis along ``axis``: packed n//2+1 planes in,
    length-n real plane out, one fused MXU pass."""
    axis = axis % ar.ndim
    moved = axis != ar.ndim - 1
    if moved:
        ar = jnp.moveaxis(ar, axis, -1)
        ai = jnp.moveaxis(ai, axis, -1)
    pre = ar.shape[:-1]
    m1 = ar.shape[-1]
    out = _irfft_minor_diff(n, float(scale), config)(
        ar.reshape(-1, m1), ai.reshape(-1, m1))
    out = out.reshape(pre + (n,))
    if moved:
        out = jnp.moveaxis(out, -1, axis)
    return out


def _fft_axis_impl(
    ar: jnp.ndarray,
    ai: jnp.ndarray | None,
    axis: int,
    bases: tuple[int, ...],
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Transform one axis of the split planes, choosing the best backend."""
    n = ar.shape[axis]
    kernel_ok = config.backend in ("auto", "pallas") and (
        config.interpret or _is_tpu_backend()
    )
    if kernel_ok and pallas_supported(n, ar.dtype, config):
        try:
            return mxu_fft.fft_axis_pallas(
                ar, ai, axis, bases, inverse=inverse, scale=scale,
                config=config,
            )
        except NotImplementedError:
            if config.backend == "pallas":
                raise
    elif kernel_ok and mxu_fft.storage_of(ar.dtype) is not None:
        # Traffic-dominated big-n axes: ONE full-length kernel pass under
        # the raised VMEM ceiling halves the HBM traffic of the sublane
        # two-pass (measured v5e: (1, 7680, 4320) 8.0 -> ~6.2 ms). Small
        # arrays keep the two-pass — its cheaper butterfly compute wins
        # when everything is resident anyway ((100, 16384): 0.07 ms).
        plane_bytes = ar.size * jnp.dtype(ar.dtype).itemsize
        if (plane_bytes >= mxu_fft._BIG_PASS_MIN_BYTES
                and mxu_fft.big_pass_supported(n, ar.dtype, config)):
            try:
                return mxu_fft.fft_axis_pallas(
                    ar, ai, axis, bases, inverse=inverse, scale=scale,
                    config=config, big_pass=True,
                )
            except NotImplementedError:
                pass
        two = _split_large(n, ar.dtype, config)
        if two is not None:
            return _fft_axis_two_pass(
                ar, ai, axis, two[0], two[1], inverse=inverse, scale=scale,
                config=config,
            )
        if _bluestein_ok(n, ar.dtype, config):
            return _fft_axis_bluestein(
                ar, ai, axis, inverse=inverse, scale=scale, config=config,
            )
        if config.backend == "pallas":
            raise ValueError(
                f"backend='pallas' requested but axis length {n} is not "
                "factorable into kernel-supported components; use "
                "backend='auto' for automatic fallback"
            )
    elif config.backend == "pallas":
        raise ValueError(
            f"backend='pallas' requested but axis length {n} (dtype "
            f"{ar.dtype}) is not supported by the fused kernel; use "
            "backend='auto' for automatic fallback"
        )
    # XLA fallback. bf16 planes (plane_dtype mode) are upcast around it:
    # the pure-XLA Stockham in bf16 would lose ~all mantissa over log(n)
    # stages, and the point of bf16 storage is HBM traffic, which the
    # fallback path doesn't optimize anyway.
    bf16 = jnp.dtype(ar.dtype) == jnp.dtype(jnp.bfloat16)
    if bf16:
        ar = ar.astype(jnp.float32)
        ai = None if ai is None else ai.astype(jnp.float32)
    outr, outi = core.fft_along_axis(
        ar, ai, axis, bases, inverse=inverse, scale=scale
    )
    if bf16:
        outr = outr.astype(jnp.bfloat16)
        outi = outi.astype(jnp.bfloat16)
    return outr, outi
