"""Fused MXU FFT kernels (Pallas TPU), split re/im planes.

The TPU-native replacement for the reference's thread-per-element Stockham
GPU kernel (fft/fft/_ndim_fft_gpu.mojo:279-450) designed around what the
hardware is actually fast at: the MXU contracts 128-deep matmuls at
hundreds of TFLOP/s while strided butterfly index math starves the VPU.
So instead of per-element butterflies, a whole transform is computed as
dense DFT-matrix contractions entirely in VMEM:

* N <= 128 ("small"): one complex matmul with the dense W_N —
  Z = W_N @ X^T for a (bblk, N) batch block.
* 128 < N ("four-step"): the Bailey factorization N = A * B with the flat
  index n = a*B + b and k = kb*A + ka:

      X[kb*A + ka] = sum_b e(b kb/B) [ e(b ka/N) sum_a e(a ka/A) x[a*B+b] ]

  step 1 is a dense (A x A) @ (A x B*bblk) matmul (A chosen as the largest
  factor <= 128 — full MXU contraction depth for power-of-two N), the
  inter-factor twiddle is an elementwise multiply, and step 2's small
  radix-B DFT is padded to full MXU depth as the block-diagonal Kronecker
  matrix W_B (x) I_f (f = largest divisor of A with B*f <= 128) — trading
  redundant (structurally zero) FLOPs, which the MXU has to spare, for
  full utilization. The output falls out in natural order by construction
  (rows (k2, f, g) == k2*A + k1), so unlike the reference's GPU path
  (fft/fft/_ndim_fft_gpu.mojo:634-642) no digit reversal and no separate
  transpose kernels are needed.

Complex arithmetic is split-plane: each complex matmul is four real MXU
matmuls (config-selectable precision: 6-pass f32 "highest" or 3-pass
bf16x3 emulation, which measures ~1e-6 relative error — far inside the
c32 tolerance).

Two entry layouts:
* minor axis (batch, N): transposed to (N, bblk) lanes=batch inside the
  kernel (a cheap in-VMEM 2D transpose);
* inner axis (pre, N, L): the transform axis is already on sublanes with a
  natural lane batch — no transpose at all. This is what makes ND
  transforms transpose-free end-to-end (the reference spends 2(k-1) global
  transpose kernel launches per ND FFT, fft/fft/_ndim_fft_gpu.mojo:567-642).
"""

from __future__ import annotations

import functools
import logging
import math

import numpy as np

logger = logging.getLogger("tpufft")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PlanConfig

_LANE = 128
_MAX_DEPTH = 128  # MXU systolic depth
# Raised scoped-vmem ceiling for big-n nd blocks (v5e: 128 MiB physical).
_BIG_VMEM_LIMIT = 100 * 1024 * 1024


# ----------------------------------------------------------------------------
# Factor planning
# ----------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _divisors(n: int) -> tuple[int, ...]:
    out = []
    d = 1
    while d * d <= n:
        if n % d == 0:
            out.append(d)
            if d != n // d:
                out.append(n // d)
        d += 1
    return tuple(sorted(out))


@functools.lru_cache(maxsize=None)
def kernel_factors(n: int):
    """Choose the MXU factorization for length n.

    Returns ("small", n), ("four_step_bf", A, B), ("four_step", A, B, f) or
    None (not supported by the fused kernel -> caller falls back to XLA).

    "four_step_bf" is the preferred decomposition N = B * A with
    B in {2, 4, 8}: the B-factor runs as exact-f32 radix-B butterflies over
    sublane slices (VPU adds; the only irrational constant is 1/sqrt2) and
    the A-factor as B twiddle-folded dense matmuls M_t = W_A diag(w^{rt}) —
    half the MXU pass volume of the Kronecker four-step, no inter-stage
    twiddle, no step-1 bf16 splits, and the digit interleave is a free
    sublane permute. Measured 2.2 ms vs 6.1 ms on (100000, 1024).
    """
    if n < 2:
        return None
    if n <= _MAX_DEPTH:
        return ("small", n)
    for B in (2, 4, 8):  # smallest B first: matmul volume/element = 12/A
        if n % B == 0:
            A = n // B
            if A <= _MAX_DEPTH and A % 8 == 0:
                return ("four_step_bf", A, B)
    divs = _divisors(n)
    cands = [d for d in divs if d <= _MAX_DEPTH and n // d <= _MAX_DEPTH]
    if not cands:
        return None  # e.g. prime > 128 or n > 16384
    A = max(cands)
    B = n // A
    f = max(d for d in _divisors(A) if B * d <= _MAX_DEPTH)
    return ("four_step", A, B, f)


def choose_lane_block(n: int, cfg: PlanConfig) -> int:
    """Lane-axis batch width per kernel invocation, from the VMEM model.

    The working set is ~10 (N, bblk) f32 planes (double-buffered in/out
    pairs + intermediates); the analog of the reference's shared-memory
    budget (_GPUExecConfig.use_shared_memory, _ndim_fft_gpu.mojo:114-136).
    """
    planes = 10
    if cfg.lane_block is not None:
        # A raw override is a Mosaic compile crash waiting to happen:
        # the Kronecker four-step's in-kernel sublane<->lane reshapes
        # need a 128-multiple lane dim, and an oversized block blows the
        # scoped-vmem compile. Round to the lane grid and cap by the
        # raised VMEM ceiling; 0 (reject -> XLA fallback) if even one
        # 128-lane block cannot fit.
        lb = (max(0, int(cfg.lane_block)) // _LANE) * _LANE
        while lb >= _LANE and planes * n * lb * 4 > _BIG_VMEM_LIMIT:
            lb -= _LANE
        return lb
    b = cfg.vmem_budget_bytes // max(planes * n * 4, 1)
    b = (b // _LANE) * _LANE
    # 128 measured best at N=1024; small N wants bigger blocks (fewer grid
    # steps — at N=93 a 128-lane block means ~8k grid steps for a 1M batch
    # and per-step overhead dominates). Sub-128 lane blocks save no VMEM
    # anyway (tiles pad the lane dim to 128).
    cap = _LANE if n > 512 else 512
    return max(0, min(cap, b))


def pallas_supported(n: int, dtype, cfg: PlanConfig) -> bool:
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False  # f32/bf16 planes on TPU; f64 runs on the XLA/CPU path
    if kernel_factors(n) is None:
        return False
    return choose_lane_block(n, cfg) >= _LANE


# Plane-byte threshold above which a big-n axis prefers ONE full-length
# kernel pass (raised VMEM ceiling, 128-wide lane blocks) over the sublane
# two-pass: halving HBM traffic beats the denser Kronecker matmuls only
# once the array is large enough to be traffic-dominated. Measured on v5e:
# (1, 7680, 4320) f32 dropped 8.0 -> ~6.2 ms; (100, 16384) (6.5 MB planes)
# stays two-pass at its 0.07 ms floor.
_BIG_PASS_MIN_BYTES = 64 * 1024 * 1024


def big_pass_supported(n: int, dtype, cfg: PlanConfig) -> bool:
    """Can length n run as ONE kernel pass under the raised VMEM ceiling
    when the default VMEM model rejects it (choose_lane_block == 0)?

    The (n, 128) working set (~10 f32 plane blocks) must fit the raised
    scoped-vmem ceiling, and the length needs any kernel factorization
    (the Kronecker four-step's lane reshapes are satisfied by the forced
    128-wide lane blocks)."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    if kernel_factors(n) is None:
        return False
    return 10 * n * _LANE * 4 <= _BIG_VMEM_LIMIT


# ----------------------------------------------------------------------------
# Tables
# ----------------------------------------------------------------------------

def _cis_outer(i: int, j: int, den: float, inverse: bool):
    sign = 1.0 if inverse else -1.0
    k = np.outer(np.arange(i, dtype=np.float64), np.arange(j, dtype=np.float64))
    theta = (sign * 2.0 * np.pi / den) * k
    return np.cos(theta), np.sin(theta)


@functools.lru_cache(maxsize=None)
def _tables(n: int, inverse: bool, scale: float):
    """Host-precomputed f32 table planes for the chosen factorization.

    float64 trig then cast — same discipline as the reference uploading
    host tables in _GPUPlan.__init__ (fft/fft/_ndim_fft_gpu.mojo:196-207).
    The norm scale is folded into the last matmul's matrix (the analog of
    the reference's fused 1/N in the final stage, fft/fft/_fft.mojo:292-295).
    """
    kind = kernel_factors(n)
    assert kind is not None
    f32 = lambda x: np.ascontiguousarray(x, np.float32)  # noqa: E731
    if kind[0] == "small":
        wr, wi = _cis_outer(n, n, float(n), inverse)
        return (f32(wr * scale), f32(wi * scale))
    if kind[0] == "four_step_bf":
        # B matrices M_t[m, r] = w^{rt} W_A[m, r] (twiddle folded; LHS of a
        # left-multiply over the r sublanes), scale folded in.
        _, A, B = kind
        sign = 1.0 if inverse else -1.0
        r = np.arange(A, dtype=np.float64)
        wa_r, wa_i = _cis_outer(A, A, float(A), inverse)  # [m?, r] symmetric
        out = []
        for t in range(B):
            theta = (sign * 2.0 * np.pi / n) * r * t
            tr, ti = np.cos(theta), np.sin(theta)
            mr = wa_r * tr[None, :] - wa_i * ti[None, :]
            mi = wa_r * ti[None, :] + wa_i * tr[None, :]
            out.extend([f32(mr * scale), f32(mi * scale)])
        return tuple(out)
    _, A, B, f = kind
    w1r, w1i = _cis_outer(A, A, float(A), inverse)
    twr, twi = _cis_outer(A, B, float(n), inverse)
    w2r, w2i = _cis_outer(B, B, float(B), inverse)
    eye = np.eye(f)
    w2r_k = np.kron(w2r * scale, eye)
    w2i_k = np.kron(w2i * scale, eye)
    return (f32(w1r), f32(w1i), f32(twr), f32(twi), f32(w2r_k), f32(w2i_k))


# ----------------------------------------------------------------------------
# Kernel bodies
# ----------------------------------------------------------------------------

def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_bf16_host(x: np.ndarray):
    hi = np.asarray(x, np.float32).astype(jnp.bfloat16)
    lo = (np.asarray(x, np.float32)
          - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def _prep_w(table_pair, precision: str):
    """Host layout of one complex W matrix for the chosen precision:
    f32 (wr, wi) for highest/default, pre-split bf16 (rh, rl, ih, il) for
    bf16x3 (measured ~15% kernel time saved vs splitting constants
    per-block in the kernel)."""
    wr, wi = table_pair
    if precision == "bf16x3":
        return (*_split_bf16_host(wr), *_split_bf16_host(wi))
    return (wr, wi)


def _dotl(w, x, *, precision=None):
    """W @ x contracting W's dim 1 with x's dim 0.

    x may be rank 2 (n, lanes) or rank 3 (n, m, l) — dim-0 contraction of a
    plain 3D block is the one N-D dot_general form Mosaic accepts (middle-dim
    3D contractions and contractions through rank>3 refs are rejected)."""
    return jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)


def _cmm(precision: str, W, xr, xi):
    """Complex matmul (W) @ (xr + i xi) as real MXU matmuls; x rank 2 or 3.

    For bf16x3, the x planes are hi/lo-split once and each real matmul is
    the 3-pass emulation ah@bh + ah@bl + al@bh (~1e-6 rel err)."""
    if precision == "bf16x3":
        rh, rl, ih, il = W
        xrh, xrl = _split_bf16(xr)
        xih, xil = _split_bf16(xi)

        def m(wh, wl, bh, bl):
            return _dotl(wh, bh) + (_dotl(wh, bl) + _dotl(wl, bh))

        return (m(rh, rl, xrh, xrl) - m(ih, il, xih, xil),
                m(rh, rl, xih, xil) + m(ih, il, xrh, xrl))
    wr, wi = W
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    return (_dotl(wr, xr, precision=prec) - _dotl(wi, xi, precision=prec),
            _dotl(wr, xi, precision=prec) + _dotl(wi, xr, precision=prec))


def _cmm_right(precision: str, W, xr, xi):
    """Complex matmul (xr + i xi) @ W for a symmetric DFT matrix W (the
    right-multiply form X @ W^T with W^T == W): contraction over the lane
    axis, used by the minor-axis small-N kernel to avoid all transposes."""
    if precision == "bf16x3":
        rh, rl, ih, il = W
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        xrh, xrl = _split_bf16(xr)
        xih, xil = _split_bf16(xi)

        def m(bh, bl, wh, wl):
            return d(bh, wh) + (d(bl, wh) + d(bh, wl))

        return (m(xrh, xrl, rh, rl) - m(xih, xil, ih, il),
                m(xih, xil, rh, rl) + m(xrh, xrl, ih, il))
    wr, wi = W
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    mm = functools.partial(jnp.dot, precision=prec,
                           preferred_element_type=jnp.float32)
    return mm(xr, wr) - mm(xi, wi), mm(xi, wr) + mm(xr, wi)


def _rmm_right(precision: str, W, x):
    """Real x times a complex matrix: (x @ Wr, x @ Wi) — the half-cost form
    of _cmm_right for a real input plane (r2c kernels)."""
    if precision == "bf16x3":
        rh, rl, ih, il = W
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        xh, xl = _split_bf16(x)

        def m(wh, wl):
            return d(xh, wh) + (d(xl, wh) + d(xh, wl))

        return m(rh, rl), m(ih, il)
    wr, wi = W
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    mm = functools.partial(jnp.dot, precision=prec,
                           preferred_element_type=jnp.float32)
    return mm(x, wr), mm(x, wi)


# Largest minor-axis length served by the direct rectangular r2c/c2r
# matmul kernels: the (n, n//2+1) table must stay a modest VMEM constant —
# 4.2 MB at n=1024 under every precision (4 bf16 planes for bf16x3, 2 f32
# planes otherwise); n=2048 would double that and crowd out the data
# blocks.
R2C_MAX_N = 1024


@functools.lru_cache(maxsize=None)
def _tables_r2c(n: int, scale: float):
    """Rectangular DFT matrix V[j, k] = e^{-2 pi i j k / n} (n, n//2+1),
    f64 host trig, scale folded. The WHOLE rfft is X = x @ V: no
    deinterleave, no Hermitian untangle, any n (odd and prime included) —
    the half-length packing trick saves FLOPs the MXU has to spare, while
    its XLA-side lane gathers cost more than the transform itself
    (measured (500000, 128): 16.7 ms packed vs 1.5 ms direct)."""
    j = np.arange(n, dtype=np.float64)
    k = np.arange(n // 2 + 1, dtype=np.float64)
    theta = (-2.0 * np.pi / n) * np.outer(j, k)
    f32 = lambda x: np.ascontiguousarray(x, np.float32)  # noqa: E731
    return (f32(np.cos(theta) * scale), f32(np.sin(theta) * scale))


@functools.lru_cache(maxsize=None)
def _tables_c2r(n: int, scale: float):
    """Hermitian synthesis matrices (n//2+1, n): x = Xr @ Cr + Xi @ Ci.

    Cr[k, j] = c_k cos(2 pi j k / n), Ci[k, j] = -c_k sin(2 pi j k / n)
    with c_0 = c_{n/2} = 1 (even n) and c_k = 2 otherwise (the dropped
    mirror half), times the caller's scale. The Ci rows for DC (and
    Nyquist, even n) are zero — numpy's irfft treats those imaginary
    parts as inert."""
    m1 = n // 2 + 1
    j = np.arange(n, dtype=np.float64)
    k = np.arange(m1, dtype=np.float64)
    theta = (2.0 * np.pi / n) * np.outer(k, j)
    c = np.full(m1, 2.0)
    c[0] = 1.0
    if n % 2 == 0:
        c[m1 - 1] = 1.0
    cr = c[:, None] * np.cos(theta) * scale
    ci = -c[:, None] * np.sin(theta) * scale
    ci[0, :] = 0.0
    if n % 2 == 0:
        ci[m1 - 1, :] = 0.0
    f32 = lambda x: np.ascontiguousarray(x, np.float32)  # noqa: E731
    return (f32(cr), f32(ci))


def r2c_minor_supported(n: int, dtype, cfg: PlanConfig) -> bool:
    """Can the direct rectangular r2c/c2r kernel serve length n?"""
    if storage_of(dtype) is None:
        return False
    return 2 <= n <= R2C_MAX_N and choose_lane_block(n, cfg) >= _LANE


@functools.lru_cache(maxsize=None)
def _build_minor_r2c(n: int, scale: float, bblk: int, precision: str,
                     interpret: bool, storage: str = "f32"):
    """(batch, n) real -> (batch, n//2+1) complex planes in ONE pass."""
    m1 = n // 2 + 1
    tables = _prep_w(_tables_r2c(n, float(scale)), precision)
    out_dt = _STORAGE_DTYPES[storage]
    logger.debug("mxu_fft minor-r2c: n=%d bblk=%d precision=%s storage=%s",
                 n, bblk, precision, storage)

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        xr_ref, or_ref, oi_ref = refs[len(tables):]
        w = tuple(r[:] for r in t_refs)
        zr, zi = _rmm_right(precision, w, _load_f32(xr_ref))
        or_ref[:] = zr.astype(or_ref.dtype)
        oi_ref[:] = zi.astype(oi_ref.dtype)

    din = pl.BlockSpec((bblk, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dout = pl.BlockSpec((bblk, m1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        return pl.BlockSpec(t.shape, (lambda i: (0, 0)),
                            memory_space=pltpu.VMEM)

    def run(xr):
        batch = xr.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(batch, bblk),),
            in_specs=[tspec(t) for t in tables] + [din],
            out_specs=[dout, dout],
            out_shape=[jax.ShapeDtypeStruct((batch, m1), out_dt)] * 2,
            interpret=interpret,
        )(*[jnp.asarray(t) for t in tables], xr)

    return run


@functools.lru_cache(maxsize=None)
def _build_minor_c2r(n: int, scale: float, bblk: int, precision: str,
                     interpret: bool, storage: str = "f32"):
    """(batch, n//2+1) complex planes -> (batch, n) real in ONE pass."""
    m1 = n // 2 + 1
    tables = _prep_w(_tables_c2r(n, float(scale)), precision)
    out_dt = _STORAGE_DTYPES[storage]
    logger.debug("mxu_fft minor-c2r: n=%d bblk=%d precision=%s storage=%s",
                 n, bblk, precision, storage)

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        xr_ref, xi_ref, o_ref = refs[len(tables):]
        w = tuple(r[:] for r in t_refs)
        # out = Xr @ Cr + Xi @ Ci: two real products sharing the prep
        if precision == "bf16x3":
            rh, rl, ih, il = w
            d = functools.partial(jnp.dot,
                                  preferred_element_type=jnp.float32)
            arh, arl = _split_bf16(_load_f32(xr_ref))
            aih, ail = _split_bf16(_load_f32(xi_ref))

            def m(bh, bl, wh, wl):
                return d(bh, wh) + (d(bl, wh) + d(bh, wl))

            out = m(arh, arl, rh, rl) + m(aih, ail, ih, il)
        else:
            cr, ci = w
            prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                    else jax.lax.Precision.DEFAULT)
            mm = functools.partial(jnp.dot, precision=prec,
                                   preferred_element_type=jnp.float32)
            out = mm(_load_f32(xr_ref), cr) + mm(_load_f32(xi_ref), ci)
        o_ref[:] = out.astype(o_ref.dtype)

    din = pl.BlockSpec((bblk, m1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dout = pl.BlockSpec((bblk, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def tspec(t):
        return pl.BlockSpec(t.shape, (lambda i: (0, 0)),
                            memory_space=pltpu.VMEM)

    def run(ar, ai):
        batch = ar.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(batch, bblk),),
            in_specs=[tspec(t) for t in tables] + [din, din],
            out_specs=dout,
            out_shape=jax.ShapeDtypeStruct((batch, n), out_dt),
            interpret=interpret,
        )(*[jnp.asarray(t) for t in tables], ar, ai)

    return run


# Largest transform length served by the rectangular pad-DFT kernel: the
# dense (n_in, n_out) table must stay a modest VMEM constant (same budget
# math as the r2c kernels — 4 MB at 1024x1024 under bf16x3).
PAD_MAX_N = 1024


def pad_minor_supported(n_in: int, n_out: int, dtype, cfg: PlanConfig) -> bool:
    """Can a zero-padded transform (length n_in input, length n_out DFT)
    run as ONE fused rectangular matmul on the minor axis?"""
    if storage_of(dtype) is None:
        return False
    if not (2 <= n_in < n_out <= PAD_MAX_N):
        return False
    return choose_lane_block(n_out, cfg) >= _LANE


@functools.lru_cache(maxsize=None)
def _tables_rect(m_in: int, m_out: int, den: int, inverse: bool,
                 scale: float):
    wr, wi = _cis_outer(m_in, m_out, float(den), inverse)
    return (np.ascontiguousarray(wr * scale, np.float32),
            np.ascontiguousarray(wi * scale, np.float32))


@functools.lru_cache(maxsize=None)
def _build_minor_rect(m_in: int, m_out: int, den: int, inverse: bool,
                      scale: float, bblk: int, precision: str,
                      interpret: bool, storage: str = "f32"):
    """(batch, m_in) -> (batch, m_out): one rectangular complex matmul
    X = x @ W with W[j, k] = e(-+2pi i jk/den) * scale.

    With m_in < m_out = den this IS the DFT of the zero-padded input — the
    pad never touches HBM (the aligned-padding plan's fast path: a
    misaligned minor axis is read once at its native width and written
    once at the aligned width; measured (1000000, 93 -> 128): 8.9 ms as-is
    vs ~2 ms fused — the XLA zero-pad pass alone costs ~5 ms on that
    layout). With m_in > m_out it is the adjoint crop-DFT (the VJP).
    Same design as the rectangular r2c kernels (_build_minor_r2c)."""
    tables = _prep_w(_tables_rect(m_in, m_out, den, inverse, scale),
                     precision)
    out_dt = _STORAGE_DTYPES[storage]
    logger.debug("mxu_fft minor-rect: (%d -> %d)/%d bblk=%d inverse=%s "
                 "precision=%s storage=%s", m_in, m_out, den, bblk, inverse,
                 precision, storage)

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        xr_ref, xi_ref, or_ref, oi_ref = refs[len(tables):]
        w = tuple(r[:] for r in t_refs)
        zr, zi = _cmm_right(precision, w, _load_f32(xr_ref),
                            _load_f32(xi_ref))
        or_ref[:] = zr.astype(or_ref.dtype)
        oi_ref[:] = zi.astype(oi_ref.dtype)

    din = pl.BlockSpec((bblk, m_in), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    dout = pl.BlockSpec((bblk, m_out), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        return pl.BlockSpec(t.shape, (lambda i: (0, 0)),
                            memory_space=pltpu.VMEM)

    def run(ar, ai):
        batch = ar.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(batch, bblk),),
            in_specs=[tspec(t) for t in tables] + [din, din],
            out_specs=[dout, dout],
            out_shape=[jax.ShapeDtypeStruct((batch, m_out), out_dt)] * 2,
            interpret=interpret,
        )(*[jnp.asarray(t) for t in tables], ar, ai)

    return run


def build_minor_dense(wr: np.ndarray, wi: np.ndarray, bblk: int,
                      precision: str, interpret: bool, storage: str = "f32"):
    """(batch, m_in) -> (batch, m_out): one fused complex matmul with an
    ARBITRARY host-provided (m_in, m_out) matrix — the execution engine
    for plan-time-fused spectral pipelines (``signal.plan_filter``
    collapses fft -> diag(H) -> ifft into a single circulant matrix, so a
    whole filtering pipeline costs ONE HBM pass instead of three).
    Same kernel geometry as the rectangular pad-DFT kernel
    (_build_minor_rect); not lru-cached — callers own the closure."""
    m_in, m_out = int(wr.shape[0]), int(wr.shape[1])
    tables = _prep_w((np.ascontiguousarray(wr, np.float32),
                      np.ascontiguousarray(wi, np.float32)), precision)
    out_dt = _STORAGE_DTYPES[storage]
    logger.debug("mxu_fft minor-dense: (%d -> %d) bblk=%d precision=%s "
                 "storage=%s", m_in, m_out, bblk, precision, storage)

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        xr_ref, xi_ref, or_ref, oi_ref = refs[len(tables):]
        w = tuple(r[:] for r in t_refs)
        zr, zi = _cmm_right(precision, w, _load_f32(xr_ref),
                            _load_f32(xi_ref))
        or_ref[:] = zr.astype(or_ref.dtype)
        oi_ref[:] = zi.astype(oi_ref.dtype)

    din = pl.BlockSpec((bblk, m_in), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    dout = pl.BlockSpec((bblk, m_out), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        return pl.BlockSpec(t.shape, (lambda i: (0, 0)),
                            memory_space=pltpu.VMEM)

    def run(ar, ai):
        batch = ar.shape[0]
        params = {}
        if not interpret:
            # bblk=512 tiles of n=1024 plus the bf16 table splits exceed
            # the 16MB default scoped-vmem budget; raise it like the
            # other big-tile kernels (v5e has 128 MiB physical VMEM)
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(batch, bblk),),
            in_specs=[tspec(t) for t in tables] + [din, din],
            out_specs=[dout, dout],
            out_shape=[jax.ShapeDtypeStruct((batch, m_out), out_dt)] * 2,
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in tables], ar, ai)

    return run


def build_minor_dense_real(mat: np.ndarray, bblk: int, precision: str,
                           interpret: bool, storage: str = "f32"):
    """(batch, m_in) real -> (batch, m_out) real: one fused matmul with an
    arbitrary host-provided REAL matrix — the half-cost form of
    ``build_minor_dense`` for real-input pipelines whose matrix is real
    (a Hermitian-response filter: real impulse -> real circulant)."""
    m_in, m_out = int(mat.shape[0]), int(mat.shape[1])
    tables = _prep_real(np.ascontiguousarray(mat, np.float32), precision)
    out_dt = _STORAGE_DTYPES[storage]
    logger.debug("mxu_fft minor-dense-real: (%d -> %d) bblk=%d "
                 "precision=%s", m_in, m_out, bblk, precision)

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        x_ref, o_ref = refs[len(tables):]
        w = tuple(r[:] for r in t_refs)
        x = _load_f32(x_ref)
        if precision == "bf16x3":
            xh, xl = _split_bf16(x)
        else:
            xh, xl = x, None
        o_ref[:] = _rdot3(w, precision, xh, xl, right=True).astype(
            o_ref.dtype)

    din = pl.BlockSpec((bblk, m_in), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    dout = pl.BlockSpec((bblk, m_out), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        return pl.BlockSpec(t.shape, (lambda i: (0, 0)),
                            memory_space=pltpu.VMEM)

    def run(x):
        batch = x.shape[0]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(batch, bblk),),
            in_specs=[tspec(t) for t in tables] + [din],
            out_specs=dout,
            out_shape=jax.ShapeDtypeStruct((batch, m_out), out_dt),
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in tables], x)

    return run


def build_stft_overlap(mr: np.ndarray, mi: np.ndarray, hop: int,
                       nseg: int, bblk: int, precision: str,
                       interpret: bool, transpose_out: bool = True,
                       group: int = 1):
    """Overlapped-frame windowed r2c for the STFT hot path:
    (batch, (nseg + K - 1) * hop) real signal -> (batch, nseg, m1)
    spectrum planes in ONE kernel pass, with NO materialized frame
    tensor. Frames are read straight from the signal in HBM via
    K = nperseg // hop offset block refs over the SAME array and
    lane-concatenated in VMEM (round-3 probe: lane concat compiles in
    Mosaic); the window, any linear per-segment detrend, the zero-pad to
    nfft, and the stft scale are all folded into the host-provided
    (nperseg, m1) matrix ``mr + i mi`` (they are linear maps, so
    M = P_detrend @ diag(win) @ V_nfft[:nperseg, :m1] * scale). The
    gather pass AND the frame write+read round-trip of the composed path
    disappear. Requires nperseg % hop == 0 and hop % 128 == 0 (lane
    blocks). ``group`` (G): segments per grid step, stacked on sublanes
    before the matmul (small batches underfill the MXU's 128 rows —
    same trick as build_welch_accum): G frames are hop-aligned lane
    slices of one shared (bblk, (G+K-1)*hop) window and the output
    block becomes (G, bblk, m1); tail blocks past nseg are store-masked
    by Pallas, input window indices clamp. Not lru-cached — callers own
    the closure."""
    nperseg, m1 = int(mr.shape[0]), int(mr.shape[1])
    if nperseg % hop:
        raise ValueError("nperseg must be a multiple of hop")
    K = nperseg // hop
    G = max(1, min(int(group), nseg))
    nwin = G + K - 1
    nblk_sig = nseg + K - 1
    tables = _prep_w((np.ascontiguousarray(mr, np.float32),
                      np.ascontiguousarray(mi, np.float32)), precision)
    logger.debug("mxu_fft stft-overlap: nperseg=%d hop=%d K=%d m1=%d "
                 "nseg=%d bblk=%d group=%d precision=%s", nperseg, hop,
                 K, m1, nseg, bblk, G, precision)

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        x_refs = refs[len(tables):len(tables) + nwin]
        or_ref, oi_ref = refs[len(tables) + nwin:]
        w = tuple(r[:] for r in t_refs)
        if nwin == 1:
            x = _load_f32(x_refs[0])
        else:
            x = jnp.concatenate([_load_f32(r) for r in x_refs], axis=-1)
        if G == 1:
            zr, zi = _rmm_right(precision, w, x)
            or_ref[:] = zr[None, :, :].astype(or_ref.dtype)
            oi_ref[:] = zi[None, :, :].astype(oi_ref.dtype)
            return
        frames = [x[:, g * hop:g * hop + nperseg] for g in range(G)]
        zr, zi = _rmm_right(precision, w, jnp.concatenate(frames, axis=0))
        for g in range(G):
            or_ref[g] = zr[g * bblk:(g + 1) * bblk].astype(or_ref.dtype)
            oi_ref[g] = zi[g * bblk:(g + 1) * bblk].astype(oi_ref.dtype)

    def tspec(t):
        return pl.BlockSpec(t.shape, (lambda i, j: (0, 0)),
                            memory_space=pltpu.VMEM)

    def xidx(t):
        if G == 1:
            return lambda i, j, t=t: (i, j + t)
        return lambda i, j, t=t: (i, jnp.minimum(j * G + t, nblk_sig - 1))

    xspecs = [pl.BlockSpec((bblk, hop), xidx(t), memory_space=pltpu.VMEM)
              for t in range(nwin)]
    # Mosaic block rule: the last TWO block dims must be %8/%128 or equal
    # the array dims — a (bblk, 1, m1) segment-minor block is rejected on
    # hardware, so the kernel emits (nseg, batch, m1) with (G, bblk, m1)
    # blocks and the caller transposes back on the XLA side.
    dout = pl.BlockSpec((G, bblk, m1), lambda i, j: (j, i, 0),
                        memory_space=pltpu.VMEM)

    def run(x):
        batch = x.shape[0]
        if x.shape[1] != (nseg + K - 1) * hop:
            raise ValueError(
                f"signal length {x.shape[1]} != (nseg + K - 1) * hop = "
                f"{(nseg + K - 1) * hop}")
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        zr, zi = pl.pallas_call(
            kernel,
            grid=(pl.cdiv(batch, bblk), pl.cdiv(nseg, G)),
            in_specs=[tspec(t) for t in tables] + xspecs,
            out_specs=[dout, dout],
            out_shape=[jax.ShapeDtypeStruct((nseg, batch, m1),
                                            jnp.float32)] * 2,
            interpret=interpret,
            **params,
        )(*([jnp.asarray(t) for t in tables] + [x] * nwin))
        if not transpose_out:
            return zr, zi  # (nseg, batch, m1) — segment-major raw layout
        return (jnp.transpose(zr, (1, 0, 2)), jnp.transpose(zi, (1, 0, 2)))

    return run


def build_istft_ola(ar: np.ndarray, ai: np.ndarray, hop: int,
                    nseg: int, bblk: int, precision: str,
                    interpret: bool, group: int = 1):
    """Fused inverse-STFT overlap-add: segment-major spectrum planes
    (nseg, batch, m1) -> (batch, (nseg + K - 1) * hop) real signal in ONE
    kernel pass — the windowed inverse transform AND the overlap-add that
    the composed path pays a scatter-add for. ``ar + i ai`` is the
    (m1, nperseg) host matrix folding the inverse DFT truncation, the
    synthesis window and the stft unscale (all linear). Output hop-chunk
    j sums K = nperseg // hop segment contributions s = j-k, each an MXU
    matmul against the 128-aligned lane slice A[:, k*hop:(k+1)*hop];
    out-of-range segments are masked by a scalar 0/1 factor (the block
    index map clamps). The window-sum normalization is time-varying only
    at the edges, so it stays an elementwise XLA pass in the caller.

    ``group`` (G): output chunks per grid step — the segment-group row
    split for small batches (see build_welch_accum). The T = G+K-1
    segments covering chunks jG..jG+G-1 are loaded once (each masked by
    its own validity scalar at load), stacked on sublanes per tap k as a
    (G*bblk, m1) operand for ONE matmul set, and the per-chunk rows are
    lane-concatenated back into a (bblk, G*hop) output block — no XLA
    repack, the output array layout is unchanged."""
    m1, nperseg = int(ar.shape[0]), int(ar.shape[1])
    if nperseg % hop:
        raise ValueError("nperseg must be a multiple of hop")
    K = nperseg // hop
    tables = _prep_w((np.ascontiguousarray(ar, np.float32),
                      np.ascontiguousarray(ai, np.float32)), precision)
    nchunk = nseg + K - 1
    G = max(1, min(int(group), nchunk))
    T = G + K - 1
    logger.debug("mxu_fft istft-ola: nperseg=%d hop=%d K=%d m1=%d "
                 "nseg=%d bblk=%d group=%d precision=%s", nperseg, hop,
                 K, m1, nseg, bblk, G, precision)

    def wslice(w, lo, hi):
        if precision == "bf16x3":
            rh, rl, ih, il = w
            return (rh[:, lo:hi], rl[:, lo:hi], ih[:, lo:hi], il[:, lo:hi])
        wr, wi = w
        return (wr[:, lo:hi], wi[:, lo:hi])

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        z_refs = refs[len(tables):len(tables) + 2 * T]
        o_ref = refs[len(tables) + 2 * T]
        w = tuple(r[:] for r in t_refs)
        j = pl.program_id(1)
        if G == 1:
            acc = None
            for k in range(K):
                zr = _load_f32(z_refs[2 * k])[0]
                zi = _load_f32(z_refs[2 * k + 1])[0]
                part = _c2r_mm(precision,
                               wslice(w, k * hop, (k + 1) * hop), zr, zi)
                s = j - k
                mask = jnp.where((s >= 0) & (s < nseg), 1.0, 0.0)
                part = part * mask
                acc = part if acc is None else acc + part
            o_ref[:] = acc.astype(o_ref.dtype)
            return
        # grouped: segment t covers index jG - (K-1) + t; mask at load
        segs = []
        for t in range(T):
            s = j * G - (K - 1) + t
            mask = jnp.where((s >= 0) & (s < nseg), 1.0, 0.0)
            segs.append((_load_f32(z_refs[2 * t])[0] * mask,
                         _load_f32(z_refs[2 * t + 1])[0] * mask))
        acc = None
        for k in range(K):
            # chunk g at tap k reads segment t = g + (K-1-k)
            t0 = K - 1 - k
            zr = jnp.concatenate([segs[t0 + g][0] for g in range(G)],
                                 axis=0)
            zi = jnp.concatenate([segs[t0 + g][1] for g in range(G)],
                                 axis=0)
            part = _c2r_mm(precision,
                           wslice(w, k * hop, (k + 1) * hop), zr, zi)
            acc = part if acc is None else acc + part
        # (G*bblk, hop) rows -> (bblk, G*hop) lane-ordered chunks
        o_ref[:] = jnp.concatenate(
            [acc[g * bblk:(g + 1) * bblk] for g in range(G)],
            axis=-1).astype(o_ref.dtype)

    def tspec(t):
        return pl.BlockSpec(t.shape, (lambda i, j: (0, 0)),
                            memory_space=pltpu.VMEM)

    zspecs = []
    for t in range(T):
        if G == 1:
            idx = (lambda i, j, k=t:
                   (jnp.clip(j - k, 0, nseg - 1), i, 0))
        else:
            idx = (lambda i, j, t=t:
                   (jnp.clip(j * G - (K - 1) + t, 0, nseg - 1), i, 0))
        spec = pl.BlockSpec((1, bblk, m1), idx, memory_space=pltpu.VMEM)
        zspecs += [spec, spec]
    dout = pl.BlockSpec((bblk, G * hop), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)

    def run(zr, zi):
        if zr.shape[0] != nseg:
            raise ValueError(f"segment count {zr.shape[0]} != {nseg}")
        batch = zr.shape[1]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        zin = []
        for _ in range(T):
            zin += [zr, zi]
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(batch, bblk), pl.cdiv(nchunk, G)),
            in_specs=[tspec(t) for t in tables] + zspecs,
            out_specs=dout,
            out_shape=jax.ShapeDtypeStruct((batch, nchunk * hop),
                                           jnp.float32),
            interpret=interpret,
            **params,
        )(*([jnp.asarray(t) for t in tables] + zin))

    return run


def build_welch_accum(mr: np.ndarray, mi: np.ndarray, hop: int,
                      nseg: int, bblk: int, precision: str,
                      interpret: bool, cross: bool, group: int = 1):
    """Fused Welch/CSD accumulator: overlapped frames stream from HBM
    exactly as in ``build_stft_overlap``, but the per-segment spectra
    NEVER touch HBM — each grid step computes Z = frame @ M and
    accumulates |Z|^2 (welch) or conj(Zx)·Zy (csd) into a tiny
    (batch, m1) output block revisited across the segment grid dim
    (init at j == 0, add after — the matmul-k-loop revisiting pattern).
    For a (8, 1M) welch this removes the entire (batch, nseg, m1)
    spectrum round-trip. The mean, the PSD scale and the onesided
    doubling are cheap XLA elementwise passes on the (batch, m1) result.
    ``cross``: two input signals, complex conj(Zx)·Zy accumulation.

    ``group`` (G): segments processed per grid step, stacked on the
    SUBLANE axis before the matmul — a batch-8 welch fills only 8 of the
    MXU's 128 rows per pass; G=16 stacks 16 consecutive segments into a
    (G*bblk, nperseg) operand. The G frames are lane slices (hop-aligned)
    of one shared (bblk, (G+K-1)*hop) signal window, so the overlap
    re-read amplification also drops from K× to (G+K-1)/G ≈ 1×. Tail
    segments (j*G+g >= nseg) are masked by scalar 0/1 factors before the
    cross-group sum; window block indices past the signal end are
    clamped (their garbage is masked)."""
    nperseg, m1 = int(mr.shape[0]), int(mr.shape[1])
    if nperseg % hop:
        raise ValueError("nperseg must be a multiple of hop")
    K = nperseg // hop
    G = max(1, min(int(group), nseg))
    nwin = G + K - 1          # hop-blocks of signal per grid step
    nblk_sig = nseg + K - 1   # total hop-blocks in the signal
    nsig = 2 if cross else 1
    tables = _prep_w((np.ascontiguousarray(mr, np.float32),
                      np.ascontiguousarray(mi, np.float32)), precision)
    logger.debug("mxu_fft welch-accum: nperseg=%d hop=%d K=%d m1=%d "
                 "nseg=%d bblk=%d group=%d cross=%s precision=%s",
                 nperseg, hop, K, m1, nseg, bblk, G, cross, precision)

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        x_refs = refs[len(tables):len(tables) + nsig * nwin]
        o_refs = refs[len(tables) + nsig * nwin:]
        w = tuple(r[:] for r in t_refs)
        j = pl.program_id(1)

        def spectrum(refs_w):
            if nwin == 1:
                win = _load_f32(refs_w[0])
            else:
                win = jnp.concatenate([_load_f32(r) for r in refs_w],
                                      axis=-1)
            if G == 1:
                return _rmm_right(precision, w, win)
            # G frames = hop-aligned lane slices of the shared window,
            # stacked on sublanes -> one (G*bblk, nperseg) MXU operand
            frames = [win[:, g * hop:g * hop + nperseg] for g in range(G)]
            return _rmm_right(precision, w, jnp.concatenate(frames, axis=0))

        xr, xi = spectrum(x_refs[:nwin])
        if cross:
            yr, yi = spectrum(x_refs[nwin:])
            parts = (xr * yr + xi * yi, xr * yi - xi * yr)
        else:
            parts = (xr * xr + xi * xi,)
        if G > 1:
            # mask tail segments, sum the group rows back to (bblk, m1)
            def fold(p):
                acc = None
                for g in range(G):
                    m = jnp.where(j * G + g < nseg, 1.0, 0.0)
                    pg = p[g * bblk:(g + 1) * bblk] * m
                    acc = pg if acc is None else acc + pg
                return acc
            parts = tuple(fold(p) for p in parts)
        for o_ref, p in zip(o_refs, parts):
            @pl.when(j == 0)
            def _init(o_ref=o_ref, p=p):
                o_ref[:] = p.astype(o_ref.dtype)

            @pl.when(j != 0)
            def _acc(o_ref=o_ref, p=p):
                o_ref[:] = o_ref[:] + p.astype(o_ref.dtype)

    def tspec(t):
        return pl.BlockSpec(t.shape, (lambda i, j: (0, 0)),
                            memory_space=pltpu.VMEM)

    def xidx(t):
        if G == 1:
            return lambda i, j, t=t: (i, j + t)
        # clamp: the last group's window may run past the signal end
        return lambda i, j, t=t: (i, jnp.minimum(j * G + t, nblk_sig - 1))

    xspecs = [pl.BlockSpec((bblk, hop), xidx(t), memory_space=pltpu.VMEM)
              for _ in range(nsig) for t in range(nwin)]
    dout = pl.BlockSpec((bblk, m1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)

    def run(*xs):
        batch = xs[0].shape[0]
        for x in xs:
            if x.shape[1] != (nseg + K - 1) * hop:
                raise ValueError(
                    f"signal length {x.shape[1]} != (nseg + K - 1) * hop"
                    f" = {(nseg + K - 1) * hop}")
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT,
                dimension_semantics=("parallel", "arbitrary"))
        nout = 2 if cross else 1
        out = pl.pallas_call(
            kernel,
            grid=(pl.cdiv(batch, bblk), pl.cdiv(nseg, G)),
            in_specs=[tspec(t) for t in tables] + xspecs,
            out_specs=[dout] * nout,
            out_shape=[jax.ShapeDtypeStruct((batch, m1),
                                            jnp.float32)] * nout,
            interpret=interpret,
            **params,
        )(*([jnp.asarray(t) for t in tables]
            + [x for x in xs for _ in range(nwin)]))
        return out[0] if not cross else tuple(out)

    return run


def _c2r_mm(precision: str, W, zr, zi):
    """out = zr @ Wr + zi @ Wi (complex-to-real product half of _cmm_right,
    shared by the c2r and istft kernels)."""
    if precision == "bf16x3":
        rh, rl, ih, il = W
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        arh, arl = _split_bf16(zr)
        aih, ail = _split_bf16(zi)

        def m(bh, bl, wh, wl):
            return d(bh, wh) + (d(bl, wh) + d(bh, wl))

        return m(arh, arl, rh, rl) + m(aih, ail, ih, il)
    wr, wi = W
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    mm = functools.partial(jnp.dot, precision=prec,
                           preferred_element_type=jnp.float32)
    return mm(zr, wr) + mm(zi, wi)


def stft_overlap_supported(nperseg: int, hop: int, nfft: int, dtype,
                           cfg: PlanConfig) -> bool:
    """Gate for the fused overlapped-frame STFT kernel: the matrix must
    fit the r2c VMEM envelope and the hop must tile 128 lanes."""
    if storage_of(dtype) is None:
        return False
    return (2 <= nfft <= R2C_MAX_N and nperseg <= nfft
            and hop >= 1 and nperseg % hop == 0 and hop % _LANE == 0
            and choose_lane_block(nfft, cfg) >= _LANE)


def istft_ola_supported(nperseg: int, hop: int, nfft: int,
                        cfg: PlanConfig) -> bool:
    """Gate for the fused overlap-add iSTFT kernel (build_istft_ola):
    the synthesis matrix must fit the r2c VMEM envelope, the window
    length must tile into hops and the hop must tile 128 lanes. The
    single source of truth for this geometry — tpufft.spectral and
    tpufft.shorttime both gate through here."""
    return (2 <= nfft <= R2C_MAX_N and nperseg <= nfft
            and hop >= 1 and nperseg % hop == 0 and hop % _LANE == 0
            and choose_lane_block(nfft, cfg) >= _LANE)


def _pack_tables(n: int, inverse: bool, scale: float, precision: str):
    """Flat host-table tuple + an unpacker reconstructing the logical
    (W-groups, twiddle) structure from the kernel's refs."""
    kind = kernel_factors(n)
    raw = _tables(n, inverse, scale)
    if kind[0] == "small":
        w = _prep_w(raw, precision)
        flat = tuple(w)
        def unpack(vals):
            return (tuple(vals),)
    elif kind[0] == "four_step_bf":
        ws = [_prep_w(raw[2 * t:2 * t + 2], precision)
              for t in range(kind[2])]
        per = len(ws[0])
        flat = tuple(t for w in ws for t in w)
        def unpack(vals):
            return tuple(tuple(vals[i * per:(i + 1) * per])
                         for i in range(len(vals) // per))
    else:
        w1 = _prep_w(raw[0:2], precision)
        tw = raw[2:4]
        w2 = _prep_w(raw[4:6], precision)
        flat = (*w1, *tw, *w2)
        n1, n2 = len(w1), len(w2)
        def unpack(vals):
            return (tuple(vals[:n1]), tuple(vals[n1:n1 + 2]),
                    tuple(vals[n1 + 2:n1 + 2 + n2]))
    return flat, unpack


def _butterfly(xs, B, inverse):
    """Exact-constant radix-B DFT over B (re, im) block pairs (B in 2/4/8).

    i-multiplies are plane swaps; the only irrational constant is 1/sqrt2.
    This is the reference's phasor-specialization idea
    (fft/fft/_utils.mojo:291-372) applied at whole-block granularity.
    """
    h = float(1.0 / np.sqrt(2.0))

    def add(a, b):
        return (a[0] + b[0], a[1] + b[1])

    def sub(a, b):
        return (a[0] - b[0], a[1] - b[1])

    def m_i(a):  # * -i (forward) / * +i (inverse)
        return (a[1], -a[0]) if not inverse else (-a[1], a[0])

    if B == 2:
        return [add(xs[0], xs[1]), sub(xs[0], xs[1])]
    if B == 4:
        t0, t1 = add(xs[0], xs[2]), sub(xs[0], xs[2])
        t2, t3 = add(xs[1], xs[3]), sub(xs[1], xs[3])
        it3 = m_i(t3)
        return [add(t0, t2), add(t1, it3), sub(t0, t2), sub(t1, it3)]
    assert B == 8

    def m_w8(a):   # * e^{-+i pi/4}
        if not inverse:
            return (h * (a[0] + a[1]), h * (a[1] - a[0]))
        return (h * (a[0] - a[1]), h * (a[1] + a[0]))

    def m_w83(a):  # * e^{-+i 3pi/4}
        if not inverse:
            return (h * (a[1] - a[0]), h * (-a[0] - a[1]))
        return (h * (-a[0] - a[1]), h * (a[0] - a[1]))

    x0, x1, x2, x3, x4, x5, x6, x7 = xs
    a0, a1 = add(x0, x4), sub(x0, x4)
    a2, a3 = add(x2, x6), sub(x2, x6)
    a4, a5 = add(x1, x5), sub(x1, x5)
    a6, a7 = add(x3, x7), sub(x3, x7)
    b0, b1 = add(a0, a2), sub(a0, a2)
    b2, b3 = add(a4, a6), sub(a4, a6)
    y0, y4 = add(b0, b2), sub(b0, b2)
    ib3 = m_i(b3)
    y2, y6 = add(b1, ib3), sub(b1, ib3)
    ia3 = m_i(a3)
    c1, c2 = add(a1, ia3), sub(a1, ia3)
    ia7 = m_i(a7)
    d1, d2 = add(a5, ia7), sub(a5, ia7)
    e1, e2 = m_w8(d1), m_w83(d2)
    y1, y5 = add(c1, e1), sub(c1, e1)
    y3, y7 = add(c2, e2), sub(c2, e2)
    return [y0, y1, y2, y3, y4, y5, y6, y7]


def _compute(precision, n, kind, groups, xr, xi, inverse=False):
    """xr/xi: (n, *lanes) -> (n, *lanes), natural order in and out.

    ``lanes`` is one trailing dim (classic 2D tile) or two (native N-D
    layout tile (n, m, l) — used by the nd-inner kernel so arrays with
    non-128-multiple trailing dims are never lane-merge-reshaped, which
    XLA implements as a physical repack of the padded layout). The
    Kronecker "four_step" path needs sublane<->lane reshapes and stays
    rank-2 only."""
    tail = xr.shape[1:]
    if kind[0] == "small":
        (w,) = groups
        return _cmm(precision, w, xr, xi)
    if kind[0] == "four_step_bf":
        # rows n = q*A + r: radix-B butterflies over the B sublane slices
        # (exact f32), then per-t twiddle-folded matmul over r, then the
        # (t, m) -> (m, t) digit interleave as a free sublane permute.
        _, A, B = kind
        xs = [(xr[q * A:(q + 1) * A], xi[q * A:(q + 1) * A])
              for q in range(B)]
        ys = _butterfly(xs, B, inverse)
        zs = [_cmm(precision, groups[t], ys[t][0], ys[t][1])
              for t in range(B)]
        zr = jnp.concatenate([z[0] for z in zs], axis=0)   # rows (t, m)
        zi = jnp.concatenate([z[1] for z in zs], axis=0)
        perm = (1, 0) + tuple(range(2, 2 + len(tail)))
        zr = zr.reshape((B, A) + tail).transpose(perm).reshape((n,) + tail)
        zi = zi.reshape((B, A) + tail).transpose(perm).reshape((n,) + tail)
        return zr, zi
    assert len(tail) == 1, "Kronecker four_step is a 2D-tile kernel"
    _, A, B, f = kind
    lanes = xr.shape[-1]
    w1, (twr, twi), w2 = groups
    # rows a, lane-cols (b, lanes)
    xr = xr.reshape(A, B * lanes)
    xi = xi.reshape(A, B * lanes)
    yr, yi = _cmm(precision, w1, xr, xi)
    # inter-factor twiddle T[ka, b]
    yr = yr.reshape(A, B, lanes)
    yi = yi.reshape(A, B, lanes)
    tr = twr[:, :, None]
    ti = twi[:, :, None]
    yr, yi = yr * tr - yi * ti, yr * ti + yi * tr
    # rows (b, k1_hi): (A,B,lanes) -> (B,A,lanes) -> (B*f, (A/f)*lanes)
    yr = yr.transpose(1, 0, 2).reshape(B * f, (A // f) * lanes)
    yi = yi.transpose(1, 0, 2).reshape(B * f, (A // f) * lanes)
    zr, zi = _cmm(precision, w2, yr, yi)
    # rows (k2, k1_hi), lane-cols (k1_lo, lanes) -> natural (n, lanes)
    return zr.reshape(n, lanes), zi.reshape(n, lanes)


# ----------------------------------------------------------------------------
# pallas_call builders (cached per static config)
# ----------------------------------------------------------------------------

def _const_specs(tables):
    return [
        pl.BlockSpec(t.shape, (lambda i, j: (0, 0)), memory_space=pltpu.VMEM)
        for t in tables
    ]


_STORAGE_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16}


def storage_of(dtype) -> str | None:
    """Kernel storage tag for a plane dtype (None = unsupported)."""
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.float32):
        return "f32"
    if d == jnp.dtype(jnp.bfloat16):
        return "bf16"
    return None


def _load_f32(ref):
    return ref[:].astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _build_minor(n: int, inverse: bool, scale: float, bblk: int,
                 precision: str, interpret: bool, storage: str = "f32",
                 vmem_limit: int | None = None):
    """(batch, n) -> (batch, n): transform along the minor axis.

    ``storage``: HBM plane dtype ("f32" or "bf16"). bf16 planes halve all
    DMA traffic (the memory-bound regime for every large shape); blocks are
    upcast to f32 at load, all compute stays f32, and the store rounds
    back. ~3.9e-3 relative error from the storage rounding alone.

    ``vmem_limit``: raise Mosaic's scoped-vmem ceiling so big-n single-pass
    blocks fit (the big-pass dispatch, see ``big_pass_supported``)."""
    kind = kernel_factors(n)
    tables, unpack = _pack_tables(n, inverse, scale, precision)
    out_dt = _STORAGE_DTYPES[storage]
    logger.debug("mxu_fft minor: n=%d %s bblk=%d inverse=%s precision=%s "
                 "storage=%s", n, kind, bblk, inverse, precision, storage)

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        xr_ref, xi_ref, or_ref, oi_ref = refs[len(tables):]
        groups = unpack([r[:] for r in t_refs])
        if kind[0] == "small":
            # right-multiply form: (bblk, n) @ W^T — no transposes at all
            # (W is symmetric: W^T == W, so the same tables serve)
            zr, zi = _cmm_right(precision, groups[0], _load_f32(xr_ref),
                                _load_f32(xi_ref))
            or_ref[:] = zr.astype(or_ref.dtype)
            oi_ref[:] = zi.astype(oi_ref.dtype)
        else:
            xr = _load_f32(xr_ref).T  # (n, bblk): lanes = batch
            xi = _load_f32(xi_ref).T
            zr, zi = _compute(precision, n, kind, groups, xr, xi,
                              inverse=inverse)
            or_ref[:] = zr.T.astype(or_ref.dtype)
            oi_ref[:] = zi.T.astype(oi_ref.dtype)

    data = pl.BlockSpec((bblk, n), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)

    def run(ar, ai):
        batch = ar.shape[0]
        grid = (pl.cdiv(batch, bblk), 1)
        params = {}
        if vmem_limit is not None and not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=_const_specs(tables) + [data, data],
            out_specs=[data, data],
            out_shape=[jax.ShapeDtypeStruct((batch, n), out_dt)] * 2,
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in tables], ar, ai)

    return run


@functools.lru_cache(maxsize=None)
def _build_inner(n: int, inverse: bool, scale: float, lblk: int, pblk: int,
                 precision: str, interpret: bool, storage: str = "f32",
                 vmem_limit: int | None = None):
    """(pre, n, L) -> (pre, n, L): transform along the middle axis.

    The transform axis is already on sublanes with trailing lanes — the
    transpose-free ND path. ``pblk`` pre-elements share one grid step
    (unrolled in-kernel loop) so small (n, L) tiles still move in chunky
    DMAs — without it a shape like (7680, 72, 60) issues thousands of
    ~17 KB transfers and is descriptor-bound.
    """
    kind = kernel_factors(n)
    tables, unpack = _pack_tables(n, inverse, scale, precision)
    out_dt = _STORAGE_DTYPES[storage]
    logger.debug("mxu_fft inner: n=%d %s lblk=%d pblk=%d inverse=%s "
                 "precision=%s storage=%s", n, kind, lblk, pblk, inverse,
                 precision, storage)

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        xr_ref, xi_ref, or_ref, oi_ref = refs[len(tables):]
        groups = unpack([r[:] for r in t_refs])
        for p in range(pblk):
            zr, zi = _compute(precision, n, kind, groups,
                              xr_ref[p].astype(jnp.float32),
                              xi_ref[p].astype(jnp.float32),
                              inverse=inverse)
            or_ref[p] = zr.astype(or_ref.dtype)
            oi_ref[p] = zi.astype(oi_ref.dtype)

    data = pl.BlockSpec((pblk, n, lblk), lambda p, j: (p, 0, j),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, (lambda p, j: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def run(ar, ai):
        pre, _, L = ar.shape
        grid = (pl.cdiv(pre, pblk), pl.cdiv(L, lblk))
        params = {}
        if vmem_limit is not None and not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tspec(t) for t in tables] + [data, data],
            out_specs=[data, data],
            out_shape=[jax.ShapeDtypeStruct((pre, n, L), out_dt)] * 2,
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in tables], ar, ai)

    return run


@functools.lru_cache(maxsize=None)
def _build_inner_nd(n: int, inverse: bool, scale: float, mblk: int,
                    lblk: int, precision: str, interpret: bool,
                    with_tw: bool = False, vmem_limit: int | None = None,
                    storage: str = "f32"):
    """(pre*n, M, L) -> (pre*n, M, L): transform along dim 0 in groups of n,
    reading the array's NATIVE trailing layout.

    The block is (n, mblk, lblk) at offset (p*n, m*mblk, j*lblk): the whole
    transform axis on the major dim (dim-0 contraction of a plain 3D block
    is the one N-D matmul Mosaic compiles), lanes = the native (M, L) tile.
    This is what keeps N-D FFTs over padded layouts (trailing dim not a
    multiple of 128) free of XLA repack passes: the caller's reshape to
    (pre*n, M, L) only merges major dims, which is layout-preserving, while
    the old flat (pre, n, M*L) view forced a physical lane-merge repack both
    ways (measured 24 ms -> the same bytes as a flat 3D array ran 3 ms).
    Supports "small" and "four_step_bf" factorizations (the Kronecker
    four-step needs lane reshapes that don't exist for rank-3 tiles).

    ``with_tw``: multiply the transformed block by a complex twiddle of
    shape (n, M) before the store — the inter-factor twiddle of the
    sublane-split two-pass, folded in so it never costs an HBM pass.

    ``vmem_limit``: raise Mosaic's scoped-vmem ceiling (default 16 MiB) so
    big-n blocks fit — the v5e has 128 MiB physical VMEM and a
    (512, 16, 128) working set is only ~half of it."""
    kind = kernel_factors(n)
    assert kind[0] in ("small", "four_step_bf")
    tables, unpack = _pack_tables(n, inverse, scale, precision)
    logger.debug("mxu_fft inner-nd: n=%d %s mblk=%d lblk=%d inverse=%s "
                 "precision=%s tw=%s", n, kind, mblk, lblk, inverse,
                 precision, with_tw)

    def kernel(*refs):
        t_refs = refs[:len(tables)]
        rest = refs[len(tables):]
        if with_tw:
            twr_ref, twi_ref, xr_ref, xi_ref, or_ref, oi_ref = rest
        else:
            xr_ref, xi_ref, or_ref, oi_ref = rest
        groups = unpack([r[:] for r in t_refs])
        zr, zi = _compute(precision, n, kind, groups, _load_f32(xr_ref),
                          _load_f32(xi_ref), inverse=inverse)
        if with_tw:
            twr = twr_ref[:]   # (n, mblk, 1): lane-broadcasts over the block
            twi = twi_ref[:]
            zr, zi = zr * twr - zi * twi, zr * twi + zi * twr
        or_ref[:] = zr.astype(or_ref.dtype)
        oi_ref[:] = zi.astype(oi_ref.dtype)

    data = pl.BlockSpec((n, mblk, lblk), lambda p, m, j: (p, m, j),
                        memory_space=pltpu.VMEM)
    # (n, M, 1) with a unit minor dim: a 2D (n, mblk) block would violate
    # the (8, 128)-divisibility rule on its last dim whenever mblk is a
    # sublane-only multiple; the unit lane dim is exempt (equals the array).
    twspec = pl.BlockSpec((n, mblk, 1), lambda p, m, j: (0, m, 0),
                          memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, (lambda p, m, j: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def run(ar, ai, twr=None, twi=None):
        pn, M, L = ar.shape
        grid = (pn // n, pl.cdiv(M, mblk), pl.cdiv(L, lblk))
        tw_specs = [twspec, twspec] if with_tw else []
        tw_args = ((twr.reshape(twr.shape[0], M, 1),
                    twi.reshape(twi.shape[0], M, 1)) if with_tw else ())
        params = {}
        if vmem_limit is not None and not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tspec(t) for t in tables] + tw_specs + [data, data],
            out_specs=[data, data],
            out_shape=[jax.ShapeDtypeStruct((pn, M, L),
                                            _STORAGE_DTYPES[storage])] * 2,
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in tables], *tw_args, ar, ai)

    return run


@functools.lru_cache(maxsize=None)
def _build_mid_pair(n1: int, n2: int, inverse: bool, scale: float,
                    lblk: int, precision: str, interpret: bool,
                    storage: str = "f32"):
    """(PRE, n1, n2, L) -> same: transform the two ADJACENT middle axes in
    ONE HBM pass.

    Block (1, n1, n2, lblk): transform n1 as a dim-0 contraction of the
    rank-3 (n1, n2, lblk) tile, bring n2 to dim 0 with an in-VMEM rank-3
    (1, 0, 2) transpose (probed: Mosaic compiles it — unlike (2, 0, 1)),
    transform n2, transpose back. Two independent axis DFTs — no
    inter-factor twiddle. Halves the HBM passes of consecutive middle
    axes: the (1,25,160,160,128) aligned 5D spends 2.61 + 2.50 ms on its
    two middle passes, ~1.6x the per-pass traffic floor each.
    Reference counterpart: none — the reference runs every ND axis as a
    separate kernel + transpose launches (_ndim_fft_gpu.mojo:567-642)."""
    kind1 = kernel_factors(n1)
    kind2 = kernel_factors(n2)
    tables1, unpack1 = _pack_tables(n1, inverse, 1.0, precision)
    tables2, unpack2 = _pack_tables(n2, inverse, scale, precision)
    n_t1 = len(tables1)
    out_dt = _STORAGE_DTYPES[storage]
    logger.debug("mxu_fft mid-pair: (%d, %d) %s x %s lblk=%d inverse=%s "
                 "precision=%s", n1, n2, kind1, kind2, lblk, inverse,
                 precision)

    def kernel(*refs):
        g1 = unpack1([r[:] for r in refs[:n_t1]])
        g2 = unpack2([r[:] for r in refs[n_t1:-4]])
        xr_ref, xi_ref, or_ref, oi_ref = refs[-4:]
        xr = xr_ref[0].astype(jnp.float32)        # (n1, n2, lblk)
        xi = xi_ref[0].astype(jnp.float32)
        xr, xi = _compute(precision, n1, kind1, g1, xr, xi, inverse=inverse)
        xr = jnp.transpose(xr, (1, 0, 2))         # (n2, n1, lblk)
        xi = jnp.transpose(xi, (1, 0, 2))
        xr, xi = _compute(precision, n2, kind2, g2, xr, xi, inverse=inverse)
        or_ref[0] = jnp.transpose(xr, (1, 0, 2)).astype(or_ref.dtype)
        oi_ref[0] = jnp.transpose(xi, (1, 0, 2)).astype(oi_ref.dtype)

    data = pl.BlockSpec((1, n1, n2, lblk), lambda p, j: (p, 0, 0, j),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, (lambda p, j: (0,) * nd),
                            memory_space=pltpu.VMEM)

    all_tables = list(tables1) + list(tables2)

    def run(ar, ai):
        pre, _, _, L = ar.shape
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        return pl.pallas_call(
            kernel,
            grid=(pre, pl.cdiv(L, lblk)),
            in_specs=[tspec(t) for t in all_tables] + [data, data],
            out_specs=[data, data],
            out_shape=[jax.ShapeDtypeStruct(ar.shape, out_dt)] * 2,
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in all_tables], ar, ai)

    return run


def mid_pair_supported(n1: int, n2: int, dtype, cfg: PlanConfig) -> bool:
    """Can two adjacent MIDDLE axes run as one fused rank-4-block pass?"""
    if storage_of(dtype) is None:
        return False
    k1 = kernel_factors(n1)
    k2 = kernel_factors(n2)
    if k1 is None or k1[0] not in ("small", "four_step_bf"):
        return False
    if k2 is None or k2[0] not in ("small", "four_step_bf"):
        return False
    if n1 < 2 or n2 < 2 or n2 % 8 != 0:
        # n2 sits on the view's sublane-adjacent dim: a non-8-multiple
        # would make the (PRE, n1, n2, L) view a padded relayout
        return False
    # ~15 plane-equivalents like the nd kernel, on an (n1, n2, lblk) tile
    return 15 * n1 * n2 * _LANE * 4 <= _BIG_VMEM_LIMIT


def fft_mid_pair_pallas(ar, ai, *, inverse: bool, scale: float,
                        config: PlanConfig):
    """Fused transform of axes 1 and 2 of a rank-4 (PRE, n1, n2, L) view."""
    _, n1, n2, L = ar.shape
    if not mid_pair_supported(n1, n2, ar.dtype, config):
        raise NotImplementedError(f"no fused mid-pair kernel for "
                                  f"({n1}, {n2})")
    run = _build_mid_pair(n1, n2, inverse, float(scale), _LANE,
                          config.precision, bool(config.interpret),
                          storage_of(ar.dtype))
    outr, outi = run(ar, ai)
    return outr, outi


def _plan_inner_nd(n: int, inverse: bool, scale: float, M: int, L: int,
                   config: PlanConfig, interpret: bool,
                   with_tw: bool = False, storage: str = "f32"):
    """VMEM-model block sizes for the nd-inner kernel; None if nothing fits.

    lanes = the native (mblk, L-block) tile; bytes per plane block are
    n x round8(mblk) x round128(lblk) x 4 (VMEM tiles pad the minor dims).
    """
    # The nd kernel supports only the rank-3-tile factorizations; Kronecker
    # "four_step" needs lane reshapes that don't exist for rank-3 tiles.
    # Returning None (instead of letting _build_inner_nd assert) lets every
    # caller — fft_axis_pallas and the sublane two-pass — fall back cleanly
    # for lengths like 143 = 11*13 whose only split is Kronecker.
    kind = kernel_factors(n)
    if kind is None or kind[0] not in ("small", "four_step_bf"):
        return None
    # 15 plane-equivalents measured: double-buffered in/out pairs (8) plus
    # bf16x3 splits, butterfly temporaries and the interleave copy (a
    # (25, 88, 128) block OOMed the 16M scoped vmem at 14.6x plane bytes).
    planes = 15
    # Block lane dims must be 128-multiples: Mosaic compiles the dim-0 3D
    # dot_general ONLY when the block's minor dim is lane-aligned (measured:
    # (n,8,48) blocks crash the compile helper, (n,8,128) blocks over the
    # same 48-wide array work — Pallas masks the tail lanes, and every op
    # in _compute is lane-independent so the garbage never contaminates).
    lpad = ((min(L, 512) + _LANE - 1) // _LANE) * _LANE
    # descending candidates capped at lpad (an ASCENDING step could never
    # fit if the smaller one did not)
    for lblk in dict.fromkeys(c for c in (lpad, 256, 128) if c <= lpad):
        unit8 = planes * n * 8 * lblk * 4  # one 8-sublane group (VMEM pads)
        groups = config.vmem_budget_bytes // max(unit8, 1)
        if groups < 1:
            continue
        mblk = min(M, groups * 8)
        return _build_inner_nd(n, inverse, scale, int(mblk), int(lblk),
                               config.precision, interpret, with_tw,
                               storage=storage)
    # Big-n fallback: nothing fits the default scoped-vmem budget, but the
    # v5e has 128 MiB physical VMEM — raise Mosaic's ceiling instead of
    # falling back to the flat path, whose (pre, n, post) view puts n on
    # sublanes and physically repacks the whole array both ways (measured
    # 512^3 leading axis: 11.3 ms flat vs 4.1 ms here). (512, 16, 128)
    # blocks measured best; bigger lane blocks pipelined worse ((8,512):
    # 5.9 ms, (16,256): 6.2 ms).
    big = _BIG_VMEM_LIMIT
    lblk = min(lpad, _LANE)
    unit8 = planes * n * 8 * lblk * 4
    groups = min(2, big // max(unit8, 1))
    if groups >= 1:
        mblk = min(M, groups * 8)
        return _build_inner_nd(n, inverse, scale, int(mblk), int(lblk),
                               config.precision, interpret, with_tw,
                               vmem_limit=big, storage=storage)
    return None


@functools.lru_cache(maxsize=None)
def _build_2d(n1: int, n2: int, inverse: bool, scale: float,
              precision: str, interpret: bool, storage: str = "f32",
              pblk: int = 1, vmem_limit: int | None = None,
              n2_io: tuple[int, int] | None = None):
    """(pre, n1, n2) -> (pre, n1, n2): both trailing axes in ONE HBM pass.

    A 2D transform tile lives entirely in VMEM. For small n2 (dense-W
    kind, <= 128): transform n1 sublane-side, then n2 as a right-multiply
    X @ W_n2 — zero transposes. Otherwise: transform n1, transpose
    in-VMEM, transform n2, transpose back. Halves the HBM traffic of a 2D
    FFT and cuts a 3D FFT from 3 passes to 2 — the reference instead pays
    a global transpose kernel between every pair of axes
    (fft/fft/_ndim_fft_gpu.mojo:634-642).

    ``pblk`` batches several (n1, n2) tiles per grid step (unrolled loop)
    so small tiles still move in chunky DMAs — the narrow-trailing-dim
    regime (e.g. (160, 48) of the 5D reference shape) is descriptor-bound
    at one tile per step.

    ``n2_io = (m_in, m_out)``: the axis-2 transform is a length-n2 DFT
    with a SHORT input (zero-pad fused, m_in < n2) or a SHORT output
    (adjoint crop, m_out < n2) — input tiles are (n1, m_in), output
    (n1, m_out). An aligned-padding plan's trailing pair thus reads the
    misaligned native width ONCE and every downstream pass runs aligned.
    Small-kind n2 uses a rectangular dense right-multiply; four-step n2
    pads/crops in VMEM around the square transform (sublane concat /
    lane slice — both free next to the matmuls)."""
    kind1 = kernel_factors(n1)
    kind2 = kernel_factors(n2)
    right2 = kind2[0] == "small"
    m_in, m_out = n2_io if n2_io is not None else (n2, n2)
    tables1, unpack1 = _pack_tables(n1, inverse, 1.0, precision)
    if n2_io is not None and right2:
        tables2 = _prep_w(_tables_rect(m_in, m_out, n2, inverse, scale),
                          precision)
        unpack2 = lambda vals: (tuple(vals),)  # noqa: E731
    else:
        tables2, unpack2 = _pack_tables(n2, inverse, scale, precision)
    logger.debug("mxu_fft 2d-pair: (%d, %d) %s x %s right=%s pblk=%d "
                 "io=(%d->%d) inverse=%s precision=%s", n1, n2, kind1,
                 kind2, right2, pblk, m_in, m_out, inverse, precision)
    n_t1 = len(tables1)
    n_t2 = len(tables2)

    def kernel(*refs):
        g1 = unpack1([r[:] for r in refs[:n_t1]])
        g2 = unpack2([r[:] for r in refs[n_t1:n_t1 + n_t2]])
        xr_ref, xi_ref, or_ref, oi_ref = refs[-4:]
        for p in range(pblk):
            xr = xr_ref[p].astype(jnp.float32)     # (n1, m_in)
            xi = xi_ref[p].astype(jnp.float32)
            xr, xi = _compute(precision, n1, kind1, g1, xr, xi,
                              inverse=inverse)
            if right2:
                xr, xi = _cmm_right(precision, g2[0], xr, xi)
            else:
                xr, xi = xr.T, xi.T                # (m_in, n1)
                if m_in < n2:   # zero-pad fused: sublane concat in VMEM
                    zp = jnp.zeros((n2 - m_in, xr.shape[-1]), jnp.float32)
                    xr = jnp.concatenate([xr, zp], axis=0)
                    xi = jnp.concatenate([xi, zp], axis=0)
                xr, xi = _compute(precision, n2, kind2, g2, xr, xi,
                                  inverse=inverse)
                xr, xi = xr.T, xi.T                # (n1, n2)
                if m_out < n2:  # adjoint crop: lane slice at offset 0
                    xr = xr[:, :m_out]
                    xi = xi[:, :m_out]
            or_ref[p] = xr.astype(or_ref.dtype)
            oi_ref[p] = xi.astype(oi_ref.dtype)

    din = pl.BlockSpec((pblk, n1, m_in), lambda p: (p, 0, 0),
                       memory_space=pltpu.VMEM)
    dout = pl.BlockSpec((pblk, n1, m_out), lambda p: (p, 0, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, (lambda p: (0,) * nd),
                            memory_space=pltpu.VMEM)

    all_tables = list(tables1) + list(tables2)

    def run(ar, ai):
        pre = ar.shape[0]
        params = {}
        if vmem_limit is not None and not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit))
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(pre, pblk),),
            in_specs=[tspec(t) for t in all_tables] + [din, din],
            out_specs=[dout, dout],
            out_shape=[jax.ShapeDtypeStruct((pre, n1, m_out),
                                            _STORAGE_DTYPES[storage])] * 2,
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in all_tables], ar, ai)

    return run


def pair_supported(n1: int, n2: int, dtype, cfg: PlanConfig) -> bool:
    """Can the trailing (n1, n2) axes run as one fused 2D tile?

    Beyond VMEM fit, Mosaic requires the four-step's sublane->lane reshapes
    to keep the lane dim 128-aligned: a four-step axis needs the *other*
    axis (its lane batch inside the tile) to be a multiple of 128; the
    small (dense-W) kernel has no such reshape and tolerates any lane
    width.
    """
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    k1 = kernel_factors(n1)
    k2 = kernel_factors(n2)
    if k1 is None or k2 is None:
        return False
    if n1 < 2 or n2 < 2:
        return False
    # Narrow n2 (< 64 lanes) is viable only through the transpose-free
    # right-multiply form (dense-W small kind): the .T form wastes most of
    # each relayout on pad lanes.
    if n2 < _LANE // 2 and k2[0] != "small":
        return False
    # The Kronecker four-step's sublane<->lane reshapes need a 128-aligned
    # lane batch; "four_step_bf" and "small" have no such reshape.
    if k1[0] == "four_step" and n2 % _LANE != 0:
        return False
    if k2[0] == "four_step" and n1 % _LANE != 0:
        return False
    planes = 10
    return planes * n1 * n2 * 4 <= cfg.vmem_budget_bytes


def pair_pad_supported(n1: int, n2_in: int, n2: int, dtype,
                       cfg: PlanConfig) -> bool:
    """Can the trailing pair fuse a minor-axis zero-pad (n2_in -> n2)?
    Small-kind n2 runs a rectangular dense right-multiply; four-step n2
    pads in VMEM around the square transform (see _build_2d)."""
    if not (pair_supported(n1, n2, dtype, cfg) and 2 <= n2_in < n2):
        return False
    # A Kronecker-kind n1 needs its lane batch 128-aligned at the ACTUAL
    # (unpadded) input width, not just the target width.
    k1 = kernel_factors(n1)
    return not (k1[0] == "four_step" and n2_in % _LANE != 0)


def fft_pair_pallas(
    ar: jnp.ndarray,
    ai: jnp.ndarray | None,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
    n2_io: tuple[int, int] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused transform of the LAST TWO axes of ``ar``/``ai``.

    ``n2_io = (m_in, m_out)``: the minor axis runs a rectangular
    length-``m_out`` zero-pad DFT (forward) or its adjoint crop — the
    input's last dim is m_in and the output's is m_out (see _build_2d)."""
    n1, n2 = ar.shape[-2:]
    if n2_io is not None:
        m_in, m_out = n2_io
        n2 = max(m_in, m_out)  # the DFT length of the rectangular axis
        if not pair_pad_supported(n1, min(m_in, m_out), n2, ar.dtype,
                                  config):
            raise NotImplementedError(
                f"no fused padded 2D kernel for ({n1}, {m_in}->{m_out})")
    else:
        m_in = m_out = n2
        if not pair_supported(n1, n2, ar.dtype, config):
            raise NotImplementedError(f"no fused 2D kernel for ({n1}, {n2})")
    if ai is None:
        ai = jnp.zeros_like(ar)
    shape = ar.shape
    pre = math.prod(shape[:-2]) if len(shape) > 2 else 1
    # Batch small tiles per grid step (chunky DMA); bounded by the VMEM
    # model (lane dim pads to 128 in VMEM).
    lanes = ((max(m_in, m_out) + _LANE - 1) // _LANE) * _LANE
    tile = n1 * lanes * 4
    pblk = max(1, min(pre, 512 * 1024 // tile,
                      config.vmem_budget_bytes // (10 * tile)))
    run = _build_2d(n1, n2, inverse, float(scale), config.precision,
                    bool(config.interpret), storage_of(ar.dtype), int(pblk),
                    n2_io=(None if n2_io is None else (int(m_in),
                                                      int(m_out))))
    outr, outi = run(ar.reshape(pre, n1, m_in), ai.reshape(pre, n1, m_in))
    out_shape = shape[:-1] + (m_out,)
    return outr.reshape(out_shape), outi.reshape(out_shape)


# ----------------------------------------------------------------------------
# Public entry
def _tables_block_w(n: int, inverse: bool, scale: float):
    """Block-complex right-multiply matrix for the cube kernel's lane axis.

    For a lane-fused tile ``st = [xr | xi]`` (lanes ``2n``), one REAL
    matmul ``st @ Wb`` computes the whole complex DFT over the lane index:
    ``Wb = [[Wr, Wi], [-Wi, Wr]]`` gives ``z = [xr Wr - xi Wi | xr Wi +
    xi Wr]``. Full 128-lane MXU occupancy and a single (3-pass under
    bf16x3) matmul where the split-plane form needs four."""
    wr, wi = _cis_outer(n, n, float(n), inverse)
    top = np.concatenate([wr, wi], axis=1)
    bot = np.concatenate([-wi, wr], axis=1)
    return np.ascontiguousarray(
        np.concatenate([top, bot], axis=0) * scale, np.float32)


def _prep_real(mat: np.ndarray, precision: str):
    """Host layout of one REAL matrix for the chosen precision (hi/lo bf16
    pair for bf16x3, the f32 matrix otherwise)."""
    if precision == "bf16x3":
        return _split_bf16_host(mat)
    return (np.ascontiguousarray(mat, np.float32),)


def _rdot3(pack, precision, sth, stl, right=False):
    """One REAL matmul W @ st (or st @ W when ``right``) at the kernel's
    precision. ``(sth, stl)`` is the bf16 hi/lo split of st (stl unused
    outside bf16x3)."""
    if precision == "bf16x3":
        wh, wl = pack
        if right:
            d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
            return d(sth, wh) + (d(stl, wh) + d(sth, wl))
        return _dotl(wh, sth) + (_dotl(wh, stl) + _dotl(wl, sth))
    (w,) = pack
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    if right:
        return jnp.dot(sth, w, precision=prec,
                       preferred_element_type=jnp.float32)
    return _dotl(w, sth, precision=prec)


# f32 plane-equivalents of VMEM working set per lane-fused (n1, n2, 2*n3)
# cube tile (= 2 data planes): st + hi/lo splits + P/Q transients ~ 8
# planes, before the double-buffered in/out DMA blocks (8 * pblk planes,
# accounted separately in fft_cube_pallas). Gated against the raised
# scoped-vmem ceiling (v5e: 128 MiB physical).
_CUBE_PLANES = 10


def cube_supported(n1: int, n2: int, n3: int, dtype, cfg: PlanConfig) -> bool:
    """Can the trailing (n1, n2, n3) axes run as ONE fused VMEM tile?

    All three transforms happen per tile — a 3D FFT in a single HBM pass
    instead of three (the reference instead runs one kernel per dim plus
    2(k-1) global transposes, fft/fft/_ndim_fft_gpu.mojo:567-642). The
    kernel works on a LANE-FUSED tile ``st = [re | im]`` (lanes 2*n3):
    n1/n2 as dim-0 contractions with a lane half-swap combining the Wr/Wi
    products, n3 as one block-complex right-multiply — every MXU pass at
    full 128-lane occupancy. Gate: dense-W lengths only, n3 a multiple of
    64 so the half-swap sits on a vreg boundary, working set under the
    raised VMEM ceiling."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    if min(n1, n2, n3) < 8 or n1 % 8 or n2 % 8 or n3 % 64:
        return False
    for n in (n1, n2, n3):
        k = kernel_factors(n)
        if k is None or k[0] != "small":
            return False
    return (_CUBE_PLANES + 8) * n1 * n2 * n3 * 4 <= _BIG_VMEM_LIMIT


def _axis_dim0_fused(wr_pack, wi_pack, st, precision: str):
    """Complex DFT over dim 0 of a lane-fused (n, m, 2*l) tile.

    ``st`` holds ``[re | im]`` on its lane halves; the complex combine is
    ``P + sign * roll(Q, l)`` with P/Q the Wr/Wi real contractions and
    sign = -1 on the re half (the lane half-swap turns -Wi*im / +Wi*re
    into one rolled add)."""
    l2 = st.shape[-1]
    if precision == "bf16x3":
        sth, stl = _split_bf16(st)
    else:
        sth, stl = st, None
    p = _rdot3(wr_pack, precision, sth, stl)
    q = _rdot3(wi_pack, precision, sth, stl)
    qs = jnp.roll(q, l2 // 2, axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, qs.shape, qs.ndim - 1)
    sign = jnp.where(lane < l2 // 2, -1.0, 1.0).astype(jnp.float32)
    return p + qs * sign


def _axis_dim0_stacked(sw_pack, st, precision: str):
    """Stacked single-contraction form of ``_axis_dim0_fused``: ONE
    ``[Wr; Wi] @ st`` matmul (M = 2n) computes both real contractions
    where the separate Wr/Wi passes each run at M = n <= 64 — half the
    MXU's 128 sublane rows idle. Measured v5e (100, 64^3) fast-profile
    cube: 1.03 -> 0.76 ms. Requires n % 8 == 0 (the P/Q row split must
    sit on a sublane boundary); ``_dim0_tables`` gates on that."""
    l2 = st.shape[-1]
    if precision == "bf16x3":
        sth, stl = _split_bf16(st)
    else:
        sth, stl = st, None
    pq = _rdot3(sw_pack, precision, sth, stl)
    n = pq.shape[0] // 2
    p, q = pq[:n], pq[n:]
    qs = jnp.roll(q, l2 // 2, axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, qs.shape, qs.ndim - 1)
    sign = jnp.where(lane < l2 // 2, -1.0, 1.0).astype(jnp.float32)
    return p + qs * sign


def _dim0_tables(n: int, inverse: bool, precision: str, scale: float = 1.0):
    """(host tables, apply) for one fused dim-0 axis transform.

    Returns a flat list of host matrices plus ``apply(vals, st)`` taking
    the same number of in-kernel table values. Lengths with n % 8 == 0
    get the stacked [Wr; Wi] single-matmul form (full 128-row MXU
    occupancy); others keep the separate Wr/Wi contractions (the P/Q
    row split of the stacked product would need an unaligned sublane
    slice)."""
    wr, wi = _cis_outer(n, n, float(n), inverse)
    if scale != 1.0:
        wr = wr * scale
        wi = wi * scale
    if n % 8 == 0:
        tabs = _prep_real(np.concatenate([wr, wi], axis=0), precision)

        def apply(vals, st):
            return _axis_dim0_stacked(tuple(vals), st, precision)

        return [np.ascontiguousarray(t) for t in tabs], apply
    ta = _prep_real(np.ascontiguousarray(wr), precision)
    tb = _prep_real(np.ascontiguousarray(wi), precision)
    k = len(ta)

    def apply(vals, st):
        return _axis_dim0_fused(tuple(vals[:k]), tuple(vals[k:]), st,
                                precision)

    return ([np.ascontiguousarray(t) for t in ta]
            + [np.ascontiguousarray(t) for t in tb]), apply


@functools.lru_cache(maxsize=None)
def _build_3d(n1: int, n2: int, n3: int, inverse: bool, scale: float,
              precision: str, interpret: bool, storage: str = "f32",
              pblk: int = 1):
    """(pre, n1, n2, n3) -> (pre, n1, n2, n3): all THREE trailing axes in
    one HBM pass (the whole cube lives in VMEM, lane-fused).

    Per tile: build ``st = concat([re, im], lanes)`` (n1, n2, 2*n3) — from
    here every MXU pass runs with FULL 128-lane occupancy, where separate
    64-wide re/im planes would waste half the array. A complex dim-0
    transform is two real dot_generals plus a lane half-swap:
    ``P = Wr @ st = [Wr xr | Wr xi]``, ``Q = Wi @ st``, and
    ``out = P + sign * roll(Q, n3)`` with sign = -1 on the re half —
    6 MXU passes under bf16x3 where the split-plane _cmm form needs 12 on
    2x-padded data. Axis n2 via (1, 0, 2) sublane transposes. Axis n3 is
    ONE block-complex right-multiply ``st @ [[Wr, Wi], [-Wi, Wr]]`` over a
    major-merged (n1*n2, 2*n3) view: 3 passes where v1 needed 12. The norm
    scale rides the n3 block matrix. Natural order throughout."""
    tw1, ap1 = _dim0_tables(n1, inverse, precision)
    tw2, ap2 = _dim0_tables(n2, inverse, precision)
    w3 = _prep_real(_tables_block_w(n3, inverse, scale), precision)
    logger.debug("mxu_fft 3d-cube: (%d, %d, %d) lane-fused pblk=%d "
                 "inverse=%s precision=%s", n1, n2, n3, pblk, inverse,
                 precision)
    flat_tables = tw1 + tw2 + [np.ascontiguousarray(t) for t in w3]
    k1, k2 = len(tw1), len(tw2)
    out_dt = _STORAGE_DTYPES[storage]
    bf3 = precision == "bf16x3"

    def kernel(*refs):
        vals = [r[:] for r in refs[:len(flat_tables)]]
        v1, v2 = vals[:k1], vals[k1:k1 + k2]
        wb3 = tuple(vals[k1 + k2:])
        xr_ref, xi_ref, or_ref, oi_ref = refs[-4:]
        for p in range(pblk):
            xr = xr_ref[p].astype(jnp.float32)      # (n1, n2, n3)
            xi = xi_ref[p].astype(jnp.float32)
            st = jnp.concatenate([xr, xi], axis=-1)  # (n1, n2, 2*n3)
            st = ap1(v1, st)
            st = st.transpose(1, 0, 2)               # (n2, n1, 2*n3)
            st = ap2(v2, st)
            st = st.transpose(1, 0, 2)               # (n1, n2, 2*n3)
            flat = st.reshape(n1 * n2, 2 * n3)
            if bf3:
                fh, fl = _split_bf16(flat)
            else:
                fh, fl = flat, None
            z = _rdot3(wb3, precision, fh, fl, right=True)
            z = z.reshape(n1, n2, 2 * n3)
            or_ref[p] = z[..., :n3].astype(or_ref.dtype)
            oi_ref[p] = z[..., n3:].astype(oi_ref.dtype)

    data = pl.BlockSpec((pblk, n1, n2, n3), lambda p: (p, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, (lambda p: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def run(ar, ai):
        pre = ar.shape[0]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(pre, pblk),),
            in_specs=[tspec(t) for t in flat_tables] + [data, data],
            out_specs=[data, data],
            out_shape=[jax.ShapeDtypeStruct((pre, n1, n2, n3), out_dt)] * 2,
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in flat_tables], ar, ai)

    return run


def fft_cube_pallas(
    ar: jnp.ndarray,
    ai: jnp.ndarray | None,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused transform of the LAST THREE axes of ``ar``/``ai``."""
    n1, n2, n3 = ar.shape[-3:]
    if not cube_supported(n1, n2, n3, ar.dtype, config):
        raise NotImplementedError(f"no fused 3D kernel for ({n1},{n2},{n3})")
    if ai is None:
        ai = jnp.zeros_like(ar)
    shape = ar.shape
    pre = math.prod(shape[:-3]) if len(shape) > 3 else 1
    # One cube per grid step. Measured on chip (100, 64^3, bf16x3):
    # pblk=1 3.89 ms, pblk=2 4.04, pblk=4 4.36 — larger batches lose to
    # VMEM pressure on the pipelined in/out buffers despite chunkier DMA.
    pblk = 1
    run = _build_3d(n1, n2, n3, inverse, float(scale), config.precision,
                    bool(config.interpret), storage_of(ar.dtype), int(pblk))
    outr, outi = run(ar.reshape(pre, n1, n2, n3), ai.reshape(pre, n1, n2, n3))
    return outr.reshape(shape), outi.reshape(shape)


@functools.lru_cache(maxsize=None)
def _build_3d_fused(n1: int, n2: int, n3: int, inverse: bool, scale: float,
                    precision: str, interpret: bool, storage: str = "f32",
                    pblk: int = 1):
    """(pre, n1, n2, 2*n3) -> (pre, n1, n2, 2*n3): the lane-fused-STORAGE
    cube kernel (plan layout="lane-fused").

    Same math as ``_build_3d`` but the HBM array IS the fused tile — lanes
    hold ``[re(k) | im(k)]``. Two wins over the split-plane cube: (a) the
    trailing dim (2*n3 >= 128) is lane-aligned, so the DMA reads dense
    full-bandwidth tiles instead of the half-empty padded layout a minor
    dim of 64 forces (measured v5e: the padded rank-4 read wastes 2x the
    bytes AND runs the pattern at a fraction of peak), and (b) the
    in-kernel concat/split of the planes disappears. No reference
    counterpart — the reference's interleaved complex layout
    (fft/fft/fft.mojo:20-47) wastes lane pairs; this fuses at the TILE
    level instead."""
    tw1, ap1 = _dim0_tables(n1, inverse, precision)
    tw2, ap2 = _dim0_tables(n2, inverse, precision)
    w3 = _prep_real(_tables_block_w(n3, inverse, scale), precision)
    logger.debug("mxu_fft 3d-cube-fused: (%d, %d, %d) pblk=%d inverse=%s "
                 "precision=%s", n1, n2, n3, pblk, inverse, precision)
    flat_tables = tw1 + tw2 + [np.ascontiguousarray(t) for t in w3]
    k1, k2 = len(tw1), len(tw2)
    out_dt = _STORAGE_DTYPES[storage]
    bf3 = precision == "bf16x3"

    def kernel(*refs):
        vals = [r[:] for r in refs[:len(flat_tables)]]
        v1, v2 = vals[:k1], vals[k1:k1 + k2]
        wb3 = tuple(vals[k1 + k2:])
        st_ref, o_ref = refs[-2:]
        for p in range(pblk):
            st = st_ref[p].astype(jnp.float32)       # (n1, n2, 2*n3)
            st = ap1(v1, st)
            st = st.transpose(1, 0, 2)
            st = ap2(v2, st)
            st = st.transpose(1, 0, 2)
            flat = st.reshape(n1 * n2, 2 * n3)
            if bf3:
                fh, fl = _split_bf16(flat)
            else:
                fh, fl = flat, None
            z = _rdot3(wb3, precision, fh, fl, right=True)
            o_ref[p] = z.reshape(n1, n2, 2 * n3).astype(o_ref.dtype)

    data = pl.BlockSpec((pblk, n1, n2, 2 * n3), lambda p: (p, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, (lambda p: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def run(st):
        pre = st.shape[0]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(pre, pblk),),
            in_specs=[tspec(t) for t in flat_tables] + [data],
            out_specs=data,
            out_shape=jax.ShapeDtypeStruct((pre, n1, n2, 2 * n3), out_dt),
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in flat_tables], st)

    return run


@functools.lru_cache(maxsize=None)
def _build_inner_fused(n: int, inverse: bool, scale: float, mblk: int,
                       l2: int, precision: str, interpret: bool,
                       storage: str = "f32"):
    """(pre, n, M, 2*L) fused-storage -> same: transform dim 1.

    The lane-fused analog of ``_build_inner_nd``: the array's lane halves
    hold [re | im] of the minor logical axis, so a leading-axis complex
    DFT is one ``_axis_dim0_fused`` contraction per (n, mblk, 2L) tile —
    no plane pair, no concat. Scale folds into the cis tables."""
    flat_tables, ap = _dim0_tables(n, inverse, precision, scale)
    out_dt = _STORAGE_DTYPES[storage]
    logger.debug("mxu_fft inner-fused: n=%d mblk=%d l2=%d inverse=%s "
                 "precision=%s", n, mblk, l2, inverse, precision)

    def kernel(*refs):
        vals = [r[:] for r in refs[:len(flat_tables)]]
        x_ref, o_ref = refs[-2:]
        st = x_ref[0].astype(jnp.float32)        # (n, mblk, 2L)
        z = ap(vals, st)
        o_ref[0] = z.astype(o_ref.dtype)

    data = pl.BlockSpec((1, n, mblk, l2), lambda p, m: (p, 0, m, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, (lambda p, m: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def run(st):
        pre, _, M, _ = st.shape
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        return pl.pallas_call(
            kernel,
            grid=(pre, pl.cdiv(M, mblk)),
            in_specs=[tspec(t) for t in flat_tables] + [data],
            out_specs=data,
            out_shape=jax.ShapeDtypeStruct(st.shape, out_dt),
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in flat_tables], st)

    return run


@functools.lru_cache(maxsize=None)
def _build_inner_fused_m1(n: int, inverse: bool, scale: float, l2: int,
                          precision: str, interpret: bool,
                          storage: str = "f32", pblk: int = 1):
    """(pre, n, 2*L) fused-storage -> same: transform dim 1 — the M == 1
    case of the inner-fused pass (the axis ADJACENT to the minor, where
    the rank-4 tiling would pad an 8-wide sublane block over a unit dim).
    Rank-3 (pblk, n, l2) blocks; the dim-0 contraction runs per leading
    slot."""
    flat_tables, ap = _dim0_tables(n, inverse, precision, scale)
    out_dt = _STORAGE_DTYPES[storage]
    logger.debug("mxu_fft inner-fused-m1: n=%d l2=%d pblk=%d inverse=%s "
                 "precision=%s", n, l2, pblk, inverse, precision)

    def kernel(*refs):
        vals = [r[:] for r in refs[:len(flat_tables)]]
        x_ref, o_ref = refs[-2:]
        for p in range(pblk):
            st = x_ref[p].astype(jnp.float32)    # (n, l2)
            z = ap(vals, st)
            o_ref[p] = z.astype(o_ref.dtype)

    data = pl.BlockSpec((pblk, n, l2), lambda p: (p, 0, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, (lambda p: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def run(st):
        pre = st.shape[0]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(pre, pblk),),
            in_specs=[tspec(t) for t in flat_tables] + [data],
            out_specs=data,
            out_shape=jax.ShapeDtypeStruct(st.shape, out_dt),
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in flat_tables], st)

    return run


@functools.lru_cache(maxsize=None)
def _build_minor_fused(n: int, inverse: bool, scale: float, bblk: int,
                       precision: str, interpret: bool,
                       storage: str = "f32"):
    """(B, 2*n) fused-storage -> same: the MINOR logical axis as ONE
    block-complex right-multiply ``st @ [[Wr, Wi], [-Wi, Wr]]`` — the
    cube kernel's lane pass as a standalone kernel, for fused-layout
    plans whose cube working set exceeds VMEM (e.g. 128^3). The norm
    scale rides the block matrix."""
    w = _prep_real(_tables_block_w(n, inverse, scale), precision)
    flat_tables = [np.ascontiguousarray(t) for t in w]
    out_dt = _STORAGE_DTYPES[storage]
    bf3 = precision == "bf16x3"
    logger.debug("mxu_fft minor-fused: n=%d bblk=%d inverse=%s "
                 "precision=%s", n, bblk, inverse, precision)

    def kernel(*refs):
        pack = tuple(r[:] for r in refs[:-2])
        x_ref, o_ref = refs[-2:]
        st = x_ref[:].astype(jnp.float32)        # (bblk, 2n)
        if bf3:
            sth, stl = _split_bf16(st)
        else:
            sth, stl = st, None
        z = _rdot3(pack, precision, sth, stl, right=True)
        o_ref[:] = z.astype(o_ref.dtype)

    data = pl.BlockSpec((bblk, 2 * n), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, (lambda b: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def run(st):
        B = st.shape[0]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(B, bblk),),
            in_specs=[tspec(t) for t in flat_tables] + [data],
            out_specs=data,
            out_shape=jax.ShapeDtypeStruct(st.shape, out_dt),
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in flat_tables], st)

    return run


def inner_fused_supported(n: int, dtype, cfg: PlanConfig,
                          l2: int | None = None) -> bool:
    """Leading-axis lane-fused pass: dense-W lengths only; with ``l2``
    also checks the lane width (the dim-0 3D dot_general compiles only
    with a 128-multiple lane dim) and the minimum-tile VMEM fit."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    k = kernel_factors(n)
    if k is None or k[0] != "small":
        return False
    if l2 is not None:
        if l2 % 128:
            return False
        # smallest schedulable tile (mblk=8 rank-4 / pblk=1 rank-3)
        if 10 * n * 8 * l2 * 4 > _BIG_VMEM_LIMIT:
            return False
    return True


@functools.lru_cache(maxsize=None)
def _build_pair_fused(n2: int, n3: int, inverse: bool, scale: float,
                      precision: str, interpret: bool,
                      storage: str = "f32", pblk: int = 1):
    """(B, n2, 2*n3) fused-storage -> same: the LAST TWO logical axes in
    one HBM pass — the cube kernel minus its first dim-0 contraction, for
    fused-layout plans whose full cube exceeds VMEM (e.g. 128^3: the
    (128, 256) pair tile is 131 KB where the cube tile is 16.8 MB). n2 as
    a dim-0 contraction with the lane half-swap combine, n3 as the
    block-complex right-multiply carrying the norm scale."""
    tw2, ap2 = _dim0_tables(n2, inverse, precision)
    w3 = _prep_real(_tables_block_w(n3, inverse, scale), precision)
    flat_tables = tw2 + [np.ascontiguousarray(t) for t in w3]
    k2 = len(tw2)
    out_dt = _STORAGE_DTYPES[storage]
    bf3 = precision == "bf16x3"
    logger.debug("mxu_fft pair-fused: (%d, %d) pblk=%d inverse=%s "
                 "precision=%s", n2, n3, pblk, inverse, precision)

    def kernel(*refs):
        vals = [r[:] for r in refs[:len(flat_tables)]]
        v2, wb3 = vals[:k2], tuple(vals[k2:])
        x_ref, o_ref = refs[-2:]
        for p in range(pblk):
            st = x_ref[p].astype(jnp.float32)    # (n2, 2*n3)
            st = ap2(v2, st)
            if bf3:
                fh, fl = _split_bf16(st)
            else:
                fh, fl = st, None
            z = _rdot3(wb3, precision, fh, fl, right=True)
            o_ref[p] = z.astype(o_ref.dtype)

    data = pl.BlockSpec((pblk, n2, 2 * n3), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, (lambda b: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def run(st):
        B = st.shape[0]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_BIG_VMEM_LIMIT)
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(B, pblk),),
            in_specs=[tspec(t) for t in flat_tables] + [data],
            out_specs=data,
            out_shape=jax.ShapeDtypeStruct(st.shape, out_dt),
            interpret=interpret,
            **params,
        )(*[jnp.asarray(t) for t in flat_tables], st)

    return run


def pair_fused_supported(n2: int, n3: int, dtype, cfg: PlanConfig) -> bool:
    """Two-axis fused pass: dense-W lengths, vreg-aligned halves, pair
    tile + block tables inside VMEM."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    for n in (n2, n3):
        k = kernel_factors(n)
        if k is None or k[0] != "small":
            return False
    if n2 % 8 or n3 % 64:
        return False
    tables = (2 * n3) * (2 * n3) * 4 + 2 * n2 * n2 * 4
    return tables + 10 * n2 * 2 * n3 * 4 <= _BIG_VMEM_LIMIT


def fft_pair_fused_pallas(
    st: jnp.ndarray,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> jnp.ndarray:
    """Fused-storage transform of the LAST TWO logical axes of a
    lane-fused array (..., n2, 2*n3)."""
    n2, n3 = st.shape[-2], st.shape[-1] // 2
    if not pair_fused_supported(n2, n3, st.dtype, config):
        raise NotImplementedError(f"no fused pair pass for ({n2},{n3})")
    shape = st.shape
    B = math.prod(shape[:-2])
    tile = n2 * 2 * n3 * 4
    raw = config.vmem_budget_bytes // (10 * tile)
    # measured (10,128^3) on v5e: pblk=8 0.46 ms, pblk=9 (un-rounded)
    # ~0.6, pblk=4 0.61 — land on an 8-multiple when the budget allows
    pblk = max(1, min(B, raw // 8 * 8 if raw >= 8 else raw))
    run = _build_pair_fused(n2, n3, inverse, float(scale),
                            config.precision, bool(config.interpret),
                            storage_of(st.dtype), int(pblk))
    out = run(st.reshape(B, n2, 2 * n3))
    return out.reshape(shape)


def minor_fused_supported(n: int, dtype, cfg: PlanConfig) -> bool:
    """Standalone fused minor pass: dense-W length, vreg-aligned halves
    (n % 64 keeps each [re|im] half on a 128-lane boundary), block matrix
    + one bblk=8 tile row inside VMEM."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    k = kernel_factors(n)
    if k is None or k[0] != "small" or n % 64:
        return False
    tables = (2 * n) * (2 * n) * 4
    return tables + 8 * 8 * (2 * n) * 4 <= _BIG_VMEM_LIMIT


def fft_minor_fused_pallas(
    st: jnp.ndarray,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> jnp.ndarray:
    """Fused-storage transform of the MINOR logical axis of a lane-fused
    array (..., 2*n)."""
    n = st.shape[-1] // 2
    if not minor_fused_supported(n, st.dtype, config):
        raise NotImplementedError(f"no fused minor pass for n={n}")
    shape = st.shape
    B = math.prod(shape[:-1])
    tile = 2 * n * 4
    bblk = max(8, min(B // 8 * 8 or 8,
                      config.vmem_budget_bytes // (6 * tile) // 8 * 8,
                      1024))
    run = _build_minor_fused(n, inverse, float(scale), int(bblk),
                             config.precision, bool(config.interpret),
                             storage_of(st.dtype))
    out = run(st.reshape(B, 2 * n))
    return out.reshape(shape)


def fft_axis_fused_pallas(
    st: jnp.ndarray,
    axis: int,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
) -> jnp.ndarray:
    """Fused-storage transform along a leading LOGICAL axis of a
    lane-fused array (..., 2*n_minor). ``axis`` must not be the last."""
    ndim = st.ndim
    axis = axis % ndim
    if axis >= ndim - 1:
        raise ValueError("fft_axis_fused_pallas serves leading axes only")
    n = st.shape[axis]
    l2 = st.shape[-1]
    if not inner_fused_supported(n, st.dtype, config, l2):
        raise NotImplementedError(f"no fused-storage pass for n={n}")
    shape = st.shape
    pre = math.prod(shape[:axis]) if axis > 0 else 1
    M = math.prod(shape[axis + 1:-1]) if axis < ndim - 2 else 1
    if M == 1:
        # axis adjacent to the minor: rank-3 tiles, batch on the grid dim
        tile = n * l2 * 4
        pblk = max(1, min(pre,
                          config.vmem_budget_bytes // (12 * tile)))
        run = _build_inner_fused_m1(n, inverse, float(scale), l2,
                                    config.precision,
                                    bool(config.interpret),
                                    storage_of(st.dtype), int(pblk))
        out = run(st.reshape(pre, n, l2))
        return out.reshape(shape)
    # tile VMEM model: ~10 live tile-equivalents (splits + P/Q/roll)
    per_m = n * l2 * 4
    mblk = max(8, min(M, config.vmem_budget_bytes // (10 * per_m) // 8 * 8,
                      512))
    run = _build_inner_fused(n, inverse, float(scale), int(mblk), l2,
                             config.precision, bool(config.interpret),
                             storage_of(st.dtype))
    out = run(st.reshape(pre, n, M, l2))
    return out.reshape(shape)


def fft_cube_fused_pallas(
    st: jnp.ndarray,
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
    pblk: int = 1,
) -> jnp.ndarray:
    """Fused-storage transform of the last three LOGICAL axes of ``st``
    (shape (..., n1, n2, 2*n3), lanes [re|im])."""
    n1, n2, n3 = st.shape[-3], st.shape[-2], st.shape[-1] // 2
    if not cube_supported(n1, n2, n3, st.dtype, config):
        raise NotImplementedError(f"no fused 3D kernel for ({n1},{n2},{n3})")
    shape = st.shape
    pre = math.prod(shape[:-3]) if len(shape) > 3 else 1
    run = _build_3d_fused(n1, n2, n3, inverse, float(scale),
                          config.precision, bool(config.interpret),
                          storage_of(st.dtype), int(pblk))
    out = run(st.reshape(pre, n1, n2, 2 * n3))
    return out.reshape(shape)


# ----------------------------------------------------------------------------

def fft_axis_pallas(
    ar: jnp.ndarray,
    ai: jnp.ndarray | None,
    axis: int,
    bases: tuple[int, ...],
    *,
    inverse: bool,
    scale: float,
    config: PlanConfig,
    big_pass: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-kernel transform along ``axis``. ``bases`` is advisory here:
    the kernel picks its own MXU factorization (the result is the same DFT).
    Raises NotImplementedError when the config is outside the kernel's
    envelope so the caller can fall back to the XLA path.

    ``big_pass``: run a length the default VMEM model rejects as ONE
    full-length pass with forced 128-wide lane blocks under the raised
    scoped-vmem ceiling (see ``big_pass_supported``) — half the HBM
    traffic of the sublane two-pass, for traffic-dominated arrays."""
    ndim = ar.ndim
    axis = axis % ndim
    n = ar.shape[axis]
    if big_pass:
        if not big_pass_supported(n, ar.dtype, config):
            raise NotImplementedError(f"no big-pass kernel for n={n}")
    elif not pallas_supported(n, ar.dtype, config):
        raise NotImplementedError(f"no fused kernel for n={n}")
    vmem_limit = _BIG_VMEM_LIMIT if big_pass else None
    if ai is None:
        ai = jnp.zeros_like(ar)

    interpret = bool(config.interpret)
    precision = config.precision
    storage = storage_of(ar.dtype)
    shape = ar.shape

    post = math.prod(shape[axis + 1:]) if axis < ndim - 1 else 1
    pre = math.prod(shape[:axis]) if axis > 0 else 1

    # Non-minor axes use the transpose-free inner layout even when the
    # trailing lane batch is narrow (< 128 lanes pads the tile but still
    # beats two whole-array moveaxis transposes); only truly tiny trailing
    # products fall back to the minor path.
    if axis == ndim - 1 or post < 32:
        # minor-axis layout (batch, n)
        if axis != ndim - 1:
            ar = jnp.moveaxis(ar, axis, -1)
            ai = jnp.moveaxis(ai, axis, -1)
        moved_shape = ar.shape
        bblk = _LANE if big_pass else choose_lane_block(n, config)
        run = _build_minor(n, inverse, float(scale), bblk, precision,
                           interpret, storage, vmem_limit)
        outr, outi = run(ar.reshape(-1, n), ai.reshape(-1, n))
        outr = outr.reshape(moved_shape)
        outi = outi.reshape(moved_shape)
        if axis != ndim - 1:
            outr = jnp.moveaxis(outr, -1, axis)
            outi = jnp.moveaxis(outi, -1, axis)
        return outr, outi

    # >=2 trailing dims: the nd-inner kernel reads the NATIVE trailing
    # layout (pre*n, M, L) — no lane-merge reshape, so XLA never physically
    # repacks padded (non-128-multiple trailing dim) layouts around the
    # kernel call. The Kronecker "four_step" kinds need rank-2 tiles and
    # keep the flat path.
    kind = kernel_factors(n)
    if ndim - axis >= 3 and kind[0] in ("small", "four_step_bf"):
        M = math.prod(shape[axis + 1:-1])
        L = shape[-1]
        # Measured dispatch (v5e A/B): nd wins whenever L is lane-aligned
        # (no flat-merge repack AND full-width DMA) and for badly padded
        # small L (48: 24.2 -> 12.6 ms on the 5D reference shape, where the
        # flat path repacks around every kernel call). In the 64 <= L < 160
        # band the one-off repack plus aligned flat kernel measured faster
        # than nd's half-empty lanes ((100,64^3): 7.4 vs 8.4 ms), except
        # when L%128==0 never repacks at the kernel boundary.
        use_nd = L % _LANE == 0 or L < 64 or L >= 160
        nd_run = (_plan_inner_nd(n, inverse, float(scale), M, L, config,
                                 interpret, storage=storage)
                  if use_nd else None)
        if nd_run is not None:
            outr, outi = nd_run(ar.reshape(pre * n, M, L),
                                ai.reshape(pre * n, M, L))
            return outr.reshape(shape), outi.reshape(shape)

    # inner-axis layout (pre, n, post): transpose-free
    if big_pass:
        lblk, pblk = _LANE, 1
    else:
        lblk = min(choose_lane_block(n, config), _round_lane(post))
        # amortize small tiles over several pre-elements per grid step
        # (~>=0.5 MB per input plane block), bounded by the VMEM model
        tile = n * min(lblk, post) * 4
        pblk = max(1, min(pre, 512 * 1024 // tile,
                          config.vmem_budget_bytes // (10 * n * lblk * 4)))
    run = _build_inner(n, inverse, float(scale), lblk, int(pblk),
                       precision, interpret, storage, vmem_limit)
    outr, outi = run(ar.reshape(pre, n, post), ai.reshape(pre, n, post))
    return outr.reshape(shape), outi.reshape(shape)


def _round_lane(x: int) -> int:
    return max(_LANE, (x // _LANE) * _LANE)
