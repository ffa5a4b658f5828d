"""Native C++ CPU engine tests (ctypes bindings over native/tpufft_cpu.cpp).

Skipped when no C++ toolchain is available.
"""

import numpy as np
import pytest

from tpufft import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable (no g++)"
)


def test_1d_batched_f32(rng):
    x = (rng.standard_normal((50, 96))
         + 1j * rng.standard_normal((50, 96))).astype(np.complex64)
    got = native.fft(x)
    ref = np.fft.fft(x)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-3


def test_1d_prime_f64(rng):
    x = (rng.standard_normal((10, 93))
         + 1j * rng.standard_normal((10, 93)))
    got = native.fft(x, dtype=np.float64)
    ref = np.fft.fft(x)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-12


def test_roundtrip(rng):
    x = (rng.standard_normal((20, 60))
         + 1j * rng.standard_normal((20, 60))).astype(np.complex64)
    back = native.ifft(native.fft(x))
    assert np.max(np.abs(back - x)) < 1e-4


def test_nd(rng):
    x = (rng.standard_normal((3, 6, 8, 10))
         + 1j * rng.standard_normal((3, 6, 8, 10)))
    got = native.fftn(x, dtype=np.float64)
    ref = np.fft.fftn(x, axes=(1, 2, 3))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-12


def test_nd_inverse_norm(rng):
    x = (rng.standard_normal((2, 8, 12))
         + 1j * rng.standard_normal((2, 8, 12))).astype(np.complex64)
    back = native.ifftn(native.fftn(x))
    assert np.max(np.abs(back - x)) < 1e-4


def test_matches_jax_path(rng):
    """Native engine and the jnp oracle agree (same stage schedule family)."""
    import tpufft
    x = (rng.standard_normal((4, 48))
         + 1j * rng.standard_normal((4, 48))).astype(np.complex64)
    a = native.fft(x)
    b = np.asarray(tpufft.fft(x))
    assert np.max(np.abs(a - b)) / max(1.0, np.max(np.abs(b))) < 1e-3


def test_packaged_source_in_sync():
    """The package-data copy under tpufft/native_src/ is produced at
    BUILD time by setup.py from the single source of truth
    native/tpufft_cpu.cpp. Belt-and-braces: if a (stale) copy exists in
    the working tree it must match, and the build hook must exist."""
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    a = open(os.path.join(root, "native", "tpufft_cpu.cpp")).read()
    copy = os.path.join(root, "tpufft", "native_src", "tpufft_cpu.cpp")
    if os.path.exists(copy):
        assert open(copy).read() == a, \
            "stale build copy: rm tpufft/native_src/tpufft_cpu.cpp"
    hook = open(os.path.join(root, "setup.py")).read()
    assert "native_src" in hook and "build_py" in hook


def test_n1_scale_through_c_abi():
    """n==1 identity transform must still apply scale in the batch-vector
    path (count >= 64) — regression for transform_batch_v dropping it."""
    import ctypes
    lib = native._lib()
    re = np.arange(128, dtype=np.float32)
    im = -np.arange(128, dtype=np.float32)
    out_re = np.full(128, np.nan, np.float32)
    out_im = np.full(128, np.nan, np.float32)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.tpufft_fft_strided_f32(p(re), p(im), p(out_re), p(out_im),
                                    128, 1, 1, 1, 1, 0, 2.5, 1)
    assert rc == 0
    np.testing.assert_allclose(out_re, 2.5 * re)
    np.testing.assert_allclose(out_im, 2.5 * im)


def test_planes_api(rng):
    re = rng.standard_normal((40, 96)).astype(np.float32)
    im = rng.standard_normal((40, 96)).astype(np.float32)
    o_re, o_im = native.fft_planes(re, im)
    ref = np.fft.fft(re + 1j * im)
    err = np.max(np.abs((o_re + 1j * o_im) - ref)) / np.max(np.abs(ref))
    assert err < 1e-3
    o_re, o_im = native.fftn_planes(
        rng.standard_normal((2, 6, 8)).astype(np.float32),
        np.zeros((2, 6, 8), np.float32))
    # oracle
    x = o_re + 1j * o_im
    assert x.shape == (2, 6, 8)


def test_pow2_butterfly_radices(rng):
    """Radix-8/4/2 butterfly stages (new planner policy) across pow2 n."""
    for n in (8, 16, 32, 64, 128, 256, 512, 1024, 2048):
        x = (rng.standard_normal((80, n))
             + 1j * rng.standard_normal((80, n))).astype(np.complex64)
        got = native.fft(x)
        ref = np.fft.fft(x)
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 1e-3, (n, err)
        back = native.ifft(native.fft(x))
        assert np.max(np.abs(back - x)) < 1e-3, n


def test_planes_api_rejects_mismatched_shapes():
    native = pytest.importorskip("tpufft.native")
    if not native.available():
        pytest.skip("native engine unavailable")
    with pytest.raises(ValueError, match="shapes differ"):
        native.fft_planes(np.zeros((2, 8), np.float32),
                          np.zeros((3, 8), np.float32))


def test_planes_api_normalizes_odd_dtypes():
    """f16/int inputs must be widened, never reinterpreted byte-wise by the
    wrong-width engine entry point."""
    native = pytest.importorskip("tpufft.native")
    if not native.available():
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 16))
    re16 = x.astype(np.float16)
    outr, outi = native.fft_planes(re16, np.zeros_like(re16))
    ref = np.fft.fft(re16.astype(np.float64))
    err = np.max(np.abs((outr + 1j * outi) - ref))
    assert err < 1e-2  # f16 input precision, f64 compute
    ri = np.arange(32, dtype=np.int64).reshape(4, 8)
    outr, outi = native.fft_planes(ri, np.zeros_like(ri))
    ref = np.fft.fft(ri.astype(np.float64))
    assert np.max(np.abs((outr + 1j * outi) - ref)) < 1e-9


def test_native_fourstep_lengths(rng):
    """2048 < n <= 16384 runs the vectorized four-step lane-batch path
    (round-3: these lengths used to fall to the scalar per-row path).
    Covers even/odd batch counts (SIMD groups + scalar remainder rows),
    both directions and f64."""
    native = pytest.importorskip("tpufft.native")
    if not native.available():
        pytest.skip("no native toolchain")
    for n in (4096, 6144, 16384, 3000):
        x = (rng.standard_normal((67, n))
             + 1j * rng.standard_normal((67, n))).astype(np.complex64)
        got = native.fft(x)
        ref = np.fft.fft(x, axis=1)
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(got - ref)) / scale < 3e-6, n
        back = native.ifft(got)
        assert np.max(np.abs(back - x)) < 3e-6, n
    xd = (rng.standard_normal((66, 4096))
          + 1j * rng.standard_normal((66, 4096)))
    got = native.fft(xd, dtype=np.float64)
    assert np.max(np.abs(got - np.fft.fft(xd, axis=1))) < 1e-9


def test_native_radix16_plans(rng):
    """Lengths whose vectorized plan includes radix-16 stages ([16,8,8] at
    1024, [16,16] at 256, [16] at 16) and the scalar path (small batch)
    that must NOT use them — both agree with numpy."""
    native = pytest.importorskip("tpufft.native")
    if not native.available():
        pytest.skip("no native toolchain")
    for n in (16, 256, 1024, 2048):
        # big batch -> vectorized path (radix-16 plans)
        x = (rng.standard_normal((80, n))
             + 1j * rng.standard_normal((80, n))).astype(np.complex64)
        got = native.fft(x)
        ref = np.fft.fft(x, axis=1)
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 2e-6, n
        # small batch -> scalar path (8/4/2-only plans, separate cache key)
        xs = x[:5]
        gots = native.fft(xs)
        assert np.max(np.abs(gots - ref[:5])) / np.max(np.abs(ref)) < 2e-6, n


def test_native_streaming_scatter_alignment(rng):
    """The AVX-512 streaming-store scatter needs 64B-aligned outputs; the
    unaligned fallback must produce identical results. Offsetting the
    batch start exercises both branches."""
    native = pytest.importorskip("tpufft.native")
    if not native.available():
        pytest.skip("no native toolchain")
    n = 1024
    x = (rng.standard_normal((65, n))
         + 1j * rng.standard_normal((65, n))).astype(np.complex64)
    ref = np.fft.fft(x, axis=1)
    got_all = native.fft(x)          # aligned base (numpy allocation)
    got_off = native.fft(x[1:])      # row-offset view: base + 8KB (aligned)
    assert np.max(np.abs(got_all - ref)) / np.max(np.abs(ref)) < 2e-6
    assert np.max(np.abs(got_off - ref[1:])) / np.max(np.abs(ref)) < 2e-6


def test_native_lines_fourstep_long_n(rng):
    """Non-minor axes with n > 2048 run the consecutive-lines lane batch
    THROUGH the four-step (they used to fall to the per-line scalar path:
    measured 4x slower than PocketFFT on (1, 3840, 2160))."""
    x = (rng.standard_normal((1, 4096, 32))
         + 1j * rng.standard_normal((1, 4096, 32))).astype(np.complex64)
    got = native.fftn(x)
    ref = np.fft.fftn(x, axes=(1, 2))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-3
    # inverse + odd composite length (3840 = 2^8 * 3 * 5)
    y = (rng.standard_normal((1, 3840, 18))
         + 1j * rng.standard_normal((1, 3840, 18))).astype(np.complex64)
    got = native.ifftn(y)
    ref = np.fft.ifftn(y, axes=(1, 2))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-3


def test_native_interleaved_fast_path(rng):
    """Contiguous complex input takes the interleaved engine entry
    (tpufft_fft_c64/c128): the de/re-interleave rides inside the
    gather/scatter with NO conversion passes. Non-contiguous or
    mixed-width calls fall back to the split-plane path; both must give
    the same answer."""
    for n, cnt in [(93, 67), (256, 80), (1024, 70), (4096, 65)]:
        x = (rng.standard_normal((cnt, n))
             + 1j * rng.standard_normal((cnt, n)))
        ref = np.fft.fft(x)
        got = native.fft(x.astype(np.complex64))         # interleaved c64
        g64 = native.fft(x, dtype=np.float64)            # interleaved c128
        gv = native.fft(x[::2].astype(np.complex64))     # strided: fallback
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(got - ref)) / scale < 2e-6, n
        assert np.max(np.abs(g64 - ref)) / scale < 1e-12, n
        assert np.max(np.abs(gv - ref[::2])) / scale < 2e-6, n
    # below the lane-batch count gate (count < 64) -> rc=2 fallback
    xs = (rng.standard_normal((8, 128))
          + 1j * rng.standard_normal((8, 128))).astype(np.complex64)
    assert np.max(np.abs(native.fft(xs) - np.fft.fft(xs))) < 1e-3


def test_native_split_combine_roundtrip(rng):
    """The C split/combine conversion entries (AVX-512 de/interleave with
    streaming stores) must be exact for any length, including misaligned
    tails and the scalar head before the 64B-aligned body."""
    lib = native._lib()
    for total in (1, 7, 15, 16, 17, 1000, 9999):
        x = (rng.standard_normal(total)
             + 1j * rng.standard_normal(total)).astype(np.complex64)
        re, im, pooled = native._planes(x, np.float32)
        assert pooled
        assert np.array_equal(re, x.real) and np.array_equal(im, x.imag)
        assert np.array_equal(native._combine(re, im), x)
        x64 = x.astype(np.complex128)
        re, im, _ = native._planes(x64, np.float64)
        assert np.array_equal(re, x64.real) and np.array_equal(im, x64.imag)
        assert np.array_equal(native._combine(re, im), x64)


def test_native_scratch_pool_reuse(rng):
    """Pooled scratch planes must never leak stale data into results."""
    x = (rng.standard_normal((70, 93))
         + 1j * rng.standard_normal((70, 93))).astype(np.complex64)
    first = native.fftn(x[:, None, :])   # ND path uses pooled planes
    again = native.fftn(x[:, None, :])
    assert np.array_equal(first, again)
    ref = np.fft.fft(x)[:, None, :]
    assert np.max(np.abs(first - ref)) / np.max(np.abs(ref)) < 2e-6


def test_native_split_combine_forced_multithread(rng):
    """The OpenMP range partition must cover [0, n) for ANY thread count:
    the old chunk math dropped the tail (or everything, for n < nthreads)
    whenever the per-thread chunk rounded onto a 16 boundary."""
    lib = native._lib()
    import ctypes
    cptr = ctypes.POINTER(ctypes.c_float)
    for total, nt in [(10, 16), (1283, 8), (16, 3), (4097, 16), (33, 2)]:
        x = (rng.standard_normal(total)
             + 1j * rng.standard_normal(total)).astype(np.complex64)
        re = np.full(total, np.nan, np.float32)
        im = np.full(total, np.nan, np.float32)
        lib.tpufft_split_c2p_f32(x.ctypes.data_as(cptr),
                                 re.ctypes.data_as(cptr),
                                 im.ctypes.data_as(cptr), total, nt)
        assert np.array_equal(re, x.real), (total, nt)
        assert np.array_equal(im, x.imag), (total, nt)
        out = np.full(total, np.nan, np.complex64)
        lib.tpufft_combine_p2c_f32(re.ctypes.data_as(cptr),
                                   im.ctypes.data_as(cptr),
                                   out.ctypes.data_as(cptr), total, nt)
        assert np.array_equal(out, x), (total, nt)


def test_native_interleaved_gather_no_overread(rng):
    """The interleaved AVX-512 gather must not read past the input buffer
    (the old im-plane load at base+1 touched 4 bytes past the final row).
    Exact end-of-buffer geometry: count and n multiples of 16, n >= 256."""
    import mmap
    count, n = 64, 256
    nbytes = count * n * 8
    # buffer that ends exactly at a page boundary, followed by an
    # unmapped guard region: an over-read segfaults instead of passing
    pagesz = mmap.PAGESIZE
    total = (nbytes + pagesz - 1) // pagesz * pagesz
    buf = mmap.mmap(-1, total + pagesz)
    import ctypes
    addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
    # protect the tail page
    libc = ctypes.CDLL(None, use_errno=True)
    assert libc.mprotect(ctypes.c_void_p(addr + total), pagesz, 0) == 0
    x = np.frombuffer(buf, np.complex64, count=count * n,
                      offset=total - nbytes).reshape(count, n)
    x[:] = (rng.standard_normal((count, n))
            + 1j * rng.standard_normal((count, n)))
    got = native.fft(x)
    ref = np.fft.fft(x)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 2e-6
    del x
    assert libc.mprotect(ctypes.c_void_p(addr + total), pagesz, 3) == 0
    buf.close()


def test_native_empty_input_raises():
    with pytest.raises(ValueError):
        native.fft(np.zeros((3, 0), np.complex64))
    with pytest.raises(ValueError):
        native.fftn(np.zeros((2, 3, 0), np.complex64))
