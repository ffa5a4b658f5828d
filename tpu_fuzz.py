"""Differential fuzz harness on the REAL chip: random shapes/axes/norms
through the fused kernels vs numpy. Interpret-mode CI cannot catch
Mosaic-only issues (lane masking, relayouts, DMA tails); this can. Run
manually after kernel changes: `python tpu_fuzz.py` (exit prints RESULT).
Coverage: random shape/axes/norm sweeps, r2c/c2r, two-pass, big-pass,
fused zero-pad, fused cube, mid-pair, lane-fused / transform-major
layout plans, profile='fast' (at its loosened 3e-2 tolerance), signal /
spectral / multirate / IIR pipelines (incl. the fused overlapped-frame
STFT, fused istft OLA and fused Welch-accumulator kernels), DCT/DST,
fht, czt, segment-group splits, Bluestein primes. The script COUNTS ITS
OWN CHECKS — the RESULT line's passed/total is the only authoritative
count (itemized sums in this docstring drifted twice; they are gone).
The last committed full-pass RESULT is in FUZZ_RESULT.txt."""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import tpufft
from tpufft import PlanConfig

LENGTHS = [8, 48, 64, 93, 128, 131, 160, 256, 384, 512, 1024, 2053, 4096]
rng = np.random.default_rng(123)
fails = 0
_T = 0
for case in range(40):
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(rng.choice(LENGTHS[:10])) for _ in range(ndim))
    while np.prod(shape) > 4_000_000:
        shape = shape[1:]
    if not shape:
        shape = (128,)
    n_axes = int(rng.integers(1, len(shape) + 1))
    axes = tuple(sorted(rng.choice(len(shape), n_axes, replace=False).tolist()))
    norm = [None, "ortho", "forward"][case % 3]
    inverse = bool(case % 2)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    try:
        if inverse:
            got = np.asarray(tpufft.ifftn(x, axes=axes, norm=norm))
            ref = np.fft.ifftn(x, axes=axes, norm=norm)
        else:
            got = np.asarray(tpufft.fftn(x, axes=axes, norm=norm))
            ref = np.fft.fftn(x, axes=axes, norm=norm)
        scale = max(1.0, float(np.max(np.abs(ref))))
        err = np.max(np.abs(got - ref)) / scale
        ok = err < 1e-3
    except Exception as e:
        err, ok = str(e)[:80], False
    _T += 1
    if not ok:
        fails += 1
        print(f"FAIL case {case}: shape={shape} axes={axes} norm={norm} "
              f"inv={inverse} err={err}", flush=True)
    else:
        print(f"ok {case}: {shape} ax={axes} n={norm} i={int(inverse)} "
              f"e={err:.1e}", flush=True)
# real-transform kernels (direct rectangular r2c/c2r) on-chip
for n in (93, 128, 131, 1024):
    x = rng.standard_normal((96, n)).astype(np.float32)
    got = tpufft.rfft(jnp.asarray(x))
    got = got.numpy() if hasattr(got, "numpy") else np.asarray(got)
    ref = np.fft.rfft(x)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    back = np.asarray(tpufft.irfft(got.astype(np.complex64), n=n))
    berr = np.max(np.abs(back - x))
    ok = err < 1e-3 and berr < 1e-3
    print(f"r2c/c2r {n}: e={err:.1e} rt={berr:.1e} {'ok' if ok else 'FAIL'}",
          flush=True)
    _T += 1
    fails += not ok

# big-n lengths that dispatch to the sublane two-pass on-chip (VERDICT
# round-2 weak #2: the production path for (100,16384)-class shapes)
for n in (4096, 16384, 7680):
    x = (rng.standard_normal((32, n)) + 1j * rng.standard_normal((32, n))
         ).astype(np.complex64)
    got = np.asarray(tpufft.fft(x))
    ref = np.fft.fft(x)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"two-pass {n}: e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
          flush=True)
    _T += 1
    fails += err >= 1e-3

# big-pass shapes (plane >= 64 MB routes ONE full-length kernel pass
# under the raised VMEM ceiling instead of the two-pass — Mosaic-only
# behaviors: big-tile four_step reshapes, forced 128-lane blocks)
for shape, ax in (((4096, 4320), 1), ((2, 7680, 2048), 1)):
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    got = np.asarray(tpufft.fft(x, axis=ax))
    ref = np.fft.fft(x, axis=ax)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"big-pass {shape} ax={ax}: e={err:.1e} "
          f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
    _T += 1
    fails += err >= 1e-3

# fused zero-pad cases (rectangular pad-DFT minor kernel; pair kernel
# with rectangular right-multiply; pair .T-form with in-VMEM sublane pad)
for shape, s, axes in (((512, 93), (128,), (1,)),
                       ((3, 160, 48), (160, 128), (1, 2)),
                       ((2, 640, 480), (640, 512), (1, 2))):
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    got = np.asarray(tpufft.fftn(x, s=s, axes=axes))
    ref = np.fft.fftn(x, s=s, axes=axes)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"fused-pad {shape}->{s}: e={err:.1e} "
          f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
    _T += 1
    fails += err >= 1e-3

# fused whole-cube kernel shapes (lane-fused design: concat/roll/slice
# lane ops are Mosaic-only behaviors interpret mode cannot vet)
for shape in ((7, 64, 64, 64), (3, 16, 32, 128), (2, 8, 64, 64, 64)):
    axes = tuple(range(1, len(shape)))
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    got = np.asarray(tpufft.fftn(x, axes=axes))
    ref = np.fft.fftn(x, axes=axes)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"cube {shape}: e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
          flush=True)
    _T += 1
    fails += err >= 1e-3

# lane-fused STORAGE plans (layout='lane-fused': ONE real array with
# lanes [re|im]; dense aligned DMA). Three dispatch tiers exercised:
# whole-cube, pair (cube gate closed at 128^3), and 4-axis leading-pass
for shape in ((4, 64, 64, 64), (2, 128, 128, 128), (2, 16, 16, 16, 64)):
    axes = tuple(range(1, len(shape)))
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    p = tpufft.plan_fft(shape, np.complex64, axes=axes,
                        layout="lane-fused")
    got = p.unpack(np.asarray(p(p.pack(x))))
    ref = np.fft.fftn(x, axes=axes)
    err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
    print(f"lane-fused {shape}: e={err:.1e} "
          f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
    _T += 1
    fails += err >= 1e-3

# transform-major layout plans (device planes stored transform-axis
# first; pack/unpack at the edges — the nd-inner path over the moved
# layout plus the edge conversions are Mosaic/XLA-only behaviors)
for shape, n_ax in (((20_000, 93), -1), ((1000, 363), -1)):
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    p = tpufft.plan_fft(shape, np.complex64, axes=(n_ax,),
                        layout="transform-major")
    got = p.unpack(p(p.pack(x)))
    got = np.asarray(got)
    ref = np.fft.fft(x, axis=n_ax)
    err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
    print(f"transform-major {shape}: e={err:.1e} "
          f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
    _T += 1
    fails += err >= 1e-3

# profile='fast' (bf16 planes + one-pass bf16 matmuls): the documented
# speed tier at its loosened tolerance (~8e-3 worst-case; assert 3e-2)
for shape in ((5000, 1024), (2000, 384)):
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    got = np.asarray(tpufft.fft(x, config=PlanConfig(profile="fast")))
    ref = np.fft.fft(x)
    err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
    print(f"profile-fast {shape}: e={err:.1e} "
          f"{'ok' if err < 3e-2 else 'FAIL'}", flush=True)
    _T += 1
    fails += err >= 3e-2

# fused middle-pair kernel (channels-last layout: fft over the two axes
# BEFORE an untransformed 128-multiple minor dim)
for shape in ((2, 24, 16, 128), (4, 40, 64, 256)):
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    got = np.asarray(tpufft.fftn(x, axes=(1, 2)))
    ref = np.fft.fftn(x, axes=(1, 2))
    err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
    print(f"mid-pair {shape}: e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
          flush=True)
    _T += 1
    fails += err >= 1e-3

# signal-layer pipelines on-chip (these route through rfftn/irfftn and
# the fused filter; the host/device IO contract differs from CPU CI)
import scipy.signal as _ssig
sx = rng.standard_normal((64, 128)).astype(np.float32)
checks = [
    ("hilbert", np.asarray(tpufft.hilbert(sx)),
     _ssig.hilbert(sx.astype(np.float64))),
    ("resample", np.asarray(tpufft.resample(sx, 96, axis=-1)),
     _ssig.resample(sx.astype(np.float64), 96, axis=-1)),
    ("fftconvolve", tpufft.fftconvolve(sx, sx[:4, :9]),
     _ssig.fftconvolve(sx, sx[:4, :9])),
    ("correlate", tpufft.correlate(sx[0], sx[1, :17], mode="same"),
     _ssig.correlate(sx[0], sx[1, :17], mode="same", method="fft")),
]
for name, got, ref in checks:
    err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
    print(f"signal {name}: e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
          flush=True)
    _T += 1
    fails += err >= 1e-3

# fused circulant filter kernel (signal.plan_filter: one dense-matmul
# pass via build_minor_dense — Mosaic-only geometry)
for n in (93, 128, 480):
    H = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x = (rng.standard_normal((96, n)) + 1j * rng.standard_normal((96, n))
         ).astype(np.complex64)
    plan = tpufft.plan_filter(n, response=H)
    got = np.asarray(plan(x))
    ref = np.fft.ifft(np.fft.fft(x, axis=-1) * H, axis=-1)
    scale = max(1.0, float(np.max(np.abs(ref))))
    err = np.max(np.abs(got - ref)) / scale
    print(f"filter {n}: e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
          flush=True)
    _T += 1
    fails += err >= 1e-3

# DCT/DST r2r matmul kernels on-chip (types x norms sample)
import scipy.fft as _sf
for kind, type_, n in (("dct", 2, 128), ("dct", 3, 93), ("dst", 2, 256),
                       ("dct", 1, 480), ("dst", 4, 64)):
    x = rng.standard_normal((96, n)).astype(np.float32)
    fn = getattr(tpufft, kind)
    ref = getattr(_sf, kind)(x.astype(np.float64), type=type_, axis=-1,
                             norm="ortho")
    got = np.asarray(fn(x, type=type_, axis=-1, norm="ortho"))
    err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
    print(f"{kind}{type_} {n}: e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
          flush=True)
    _T += 1
    fails += err >= 1e-3

# fast Hankel transform (FFTLog on the r2c/c2r kernel path)
for n, mu in ((128, 0.0), (256, 0.5)):
    r = np.logspace(-2, 2, n)
    dln = float(np.log(r[1] / r[0]))
    a = (r ** 1.5 * np.exp(-r)).astype(np.float64)
    ref = _sf.fht(a, dln, mu=mu)
    got = np.asarray(tpufft.fht(a.astype(np.float32), dln, mu=mu))
    err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
    print(f"fht n={n} mu={mu}: e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
          flush=True)
    _T += 1
    fails += err >= 1e-3

# czt / zoom_fft (chirp-z through the kernel path incl. fused pad-DFT)
for n, m in ((128, 128), (100, 77), (480, 300)):
    x = (rng.standard_normal((64, n)) + 1j * rng.standard_normal((64, n))
         ).astype(np.complex64)
    plan = tpufft.CZT(n, m, np.exp(-2j * np.pi * 0.137), np.exp(0.21j))
    got = np.asarray(plan(x))
    ref = _ssig.czt(x.astype(np.complex128), m, np.exp(-2j * np.pi * 0.137),
                    np.exp(0.21j))
    err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
    print(f"czt ({n},{m}): e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
          flush=True)
    _T += 1
    fails += err >= 1e-3

# spectral layer on-chip: stft batched r2c launch + welch planes pipeline
sw = rng.standard_normal((8, 1000)).astype(np.float32)
_, _, Zg = tpufft.stft(sw, nperseg=128)
_, _, Zr = _ssig.stft(sw.astype(np.float64), nperseg=128)
err = np.max(np.abs(np.asarray(Zg) - Zr)) / max(
    1.0, float(np.max(np.abs(Zr))))
print(f"stft (8,1000): e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
      flush=True)
_T += 1
fails += err >= 1e-3
# fused overlapped-frame STFT kernel (hop%128==0 routes to
# mxu_fft.build_stft_overlap: frames stream from HBM, window+pad+DFT
# folded into one matmul)
import jax.numpy as _jnp
from tpufft.core import SplitComplex as _SC
sf = rng.standard_normal((16, 4096)).astype(np.float32)
_, _, Zg = tpufft.stft(_jnp.asarray(sf), nperseg=256, noverlap=128,
                       detrend="linear")
_, _, Zr = _ssig.stft(sf.astype(np.float64), nperseg=256, noverlap=128,
                      detrend="linear")
Zg = (np.asarray(Zg.re) + 1j * np.asarray(Zg.im)
      if isinstance(Zg, _SC) else np.asarray(Zg))
err = np.max(np.abs(Zg - Zr)) / max(1.0, float(np.max(np.abs(Zr))))
print(f"stft-fused (16,4096): e={err:.1e} "
      f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 1e-3
# fused Welch accumulator (mxu_fft.build_welch_accum: per-segment
# spectra never touch HBM)
_, Pg = tpufft.welch(_jnp.asarray(sf), nperseg=256, noverlap=128)
_, Pr = _ssig.welch(sf.astype(np.float64), nperseg=256, noverlap=128)
err = np.max(np.abs(np.asarray(Pg) - Pr)) / max(
    1.0, float(np.max(np.abs(Pr))))
print(f"welch-fused (16,4096): e={err:.1e} "
      f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 1e-3
# fused istft overlap-add kernel roundtrip (mxu_fft.build_istft_ola)
_, xg = tpufft.istft(tpufft.stft(_jnp.asarray(sf), nperseg=256,
                                 noverlap=128)[2],
                     nperseg=256, noverlap=128)
err = np.max(np.abs(np.asarray(xg)[:, :4096] - sf)) / max(
    1.0, float(np.max(np.abs(sf))))
print(f"istft-fused roundtrip (16,4096): e={err:.1e} "
      f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 1e-3
_, Pg = tpufft.welch(sw, nperseg=256)
_, Pr = _ssig.welch(sw.astype(np.float64), nperseg=256)
err = np.max(np.abs(np.asarray(Pg) - Pr)) / max(
    1.0, float(np.max(np.abs(Pr))))
print(f"welch (8,1000): e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
      flush=True)
_T += 1
fails += err >= 1e-3

# small-batch segment-group kernels (G>1: sublane-stacked segments)
sg = rng.standard_normal((5, 3000)).astype(np.float32)
_, _, Zg = tpufft.stft(_jnp.asarray(sg), nperseg=256, noverlap=128)
_, _, Zr = _ssig.stft(sg.astype(np.float64), nperseg=256, noverlap=128)
Zg = (np.asarray(Zg.re) + 1j * np.asarray(Zg.im)
      if isinstance(Zg, _SC) else np.asarray(Zg))
err = np.max(np.abs(Zg - Zr)) / max(1.0, float(np.max(np.abs(Zr))))
print(f"stft-group (5,3000): e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
      flush=True)
_T += 1
fails += err >= 1e-3
_, Pg = tpufft.welch(_jnp.asarray(sg), nperseg=256, noverlap=128)
_, Pr = _ssig.welch(sg.astype(np.float64), nperseg=256, noverlap=128)
err = np.max(np.abs(np.asarray(Pg) - Pr)) / max(
    1.0, float(np.max(np.abs(Pr))))
print(f"welch-group (5,3000): e={err:.1e} "
      f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 1e-3
_, xg = tpufft.istft(tpufft.stft(_jnp.asarray(sg), nperseg=256,
                                 noverlap=128)[2],
                     nperseg=256, noverlap=128)
err = np.max(np.abs(np.asarray(xg)[:, :3000] - sg)) / max(
    1.0, float(np.max(np.abs(sg))))
print(f"istft-group roundtrip (5,3000): e={err:.1e} "
      f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 1e-3

# multirate / IIR on-chip (upfirdn rides the fused FFT-conv path;
# sosfilt is the associative-scan recurrence)
mr = rng.standard_normal((4, 20000)).astype(np.float32)
rg = np.asarray(tpufft.resample_poly(_jnp.asarray(mr), 3, 2, axis=-1))
rr = _ssig.resample_poly(mr.astype(np.float64), 3, 2, axis=-1)
err = np.max(np.abs(rg - rr)) / max(1.0, float(np.max(np.abs(rr))))
print(f"resample_poly (4,20000): e={err:.1e} "
      f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 1e-3
dg = np.asarray(tpufft.decimate(_jnp.asarray(mr), 4))
dr = _ssig.decimate(mr.astype(np.float64), 4)
err = np.max(np.abs(dg - dr)) / max(1.0, float(np.max(np.abs(dr))))
print(f"decimate-iir (4,20000): e={err:.1e} "
      f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 1e-3
_sos = _ssig.butter(6, 0.2, output="sos")
fg = np.asarray(tpufft.sosfiltfilt(_sos, _jnp.asarray(mr)))
fr = _ssig.sosfiltfilt(_sos, mr.astype(np.float64))
err = np.max(np.abs(fg - fr)) / max(1.0, float(np.max(np.abs(fr))))
print(f"sosfiltfilt (4,20000): e={err:.1e} "
      f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 1e-3

# a few big-prime Bluestein cases on-chip
for n in (2053, 4099):
    x = (rng.standard_normal((64, n)) + 1j * rng.standard_normal((64, n))
         ).astype(np.complex64)
    got = np.asarray(tpufft.fft(x))
    ref = np.fft.fft(x)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"bluestein {n}: e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
          flush=True)
    _T += 1
    fails += err >= 1e-3
# ---- round-5 surfaces ------------------------------------------------
# lombscargle device trig tile (generalized weighted + floating_mean)
ls_x = np.sort(rng.uniform(0, 100, 700)).astype(np.float32)
ls_y = (np.sin(2.1 * ls_x) + 0.4 * rng.standard_normal(700)).astype(np.float32)
ls_f = np.linspace(0.05, 5.0, 300).astype(np.float32)
ls_w = rng.uniform(0.2, 2.0, 700)
for kwargs, tag in [(dict(), "plain"),
                    (dict(weights=ls_w, floating_mean=True), "weighted+fm"),
                    (dict(normalize=True), "normalized")]:
    got = np.asarray(tpufft.lombscargle(_jnp.asarray(ls_x),
                                        _jnp.asarray(ls_y),
                                        _jnp.asarray(ls_f), **kwargs))
    ref = _ssig.lombscargle(ls_x.astype(np.float64),
                            ls_y.astype(np.float64),
                            ls_f.astype(np.float64), **kwargs)
    err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
    print(f"lombscargle {tag}: e={err:.1e} {'ok' if err < 1e-3 else 'FAIL'}",
          flush=True)
    _T += 1
    fails += err >= 1e-3

# ShortTimeFFT fused kernel path (stft + istft roundtrip, device input)
from tpufft import ShortTimeFFT as _STF
for mode, scale_to in [("onesided", None), ("onesided2X", "psd")]:
    _win = tpufft.get_window("hann", 256)
    s_our = _STF(_win, 128, 1.0, fft_mode=mode, scale_to=scale_to,
                 phase_shift=3)
    s_ref = _ssig.ShortTimeFFT(_win, 128, 1.0, fft_mode=mode,
                               scale_to=scale_to, phase_shift=3)
    st_x = rng.standard_normal((3, 2000)).astype(np.float32)
    assert s_our._fused_stft_ok(_jnp.asarray(st_x), None)
    S = s_our.stft(_jnp.asarray(st_x))
    Sg = np.asarray(S.re) + 1j * np.asarray(S.im)
    Sr = s_ref.stft(st_x.astype(np.float64))
    err = np.max(np.abs(Sg - Sr)) / max(1.0, float(np.max(np.abs(Sr))))
    print(f"ShortTimeFFT fused stft {mode}: e={err:.1e} "
          f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
    _T += 1
    fails += err >= 1e-3
    xr = s_our.istft(S, k1=2000)
    xr = np.asarray(xr.re if isinstance(xr, _SC) else xr)
    err = np.max(np.abs(xr - st_x)) / max(1.0, float(np.max(np.abs(st_x))))
    print(f"ShortTimeFFT fused istft {mode}: e={err:.1e} "
          f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
    _T += 1
    fails += err >= 1e-3

# transform-major x bf16-plane combination (single axis, misaligned 93)
tm_x = (rng.standard_normal((5000, 93))
        + 1j * rng.standard_normal((5000, 93))).astype(np.complex64)
p_tm = tpufft.plan_fft(tm_x.shape, axes=(-1,), layout="transform-major",
                       config=PlanConfig(plane_dtype="bfloat16"))
got = p_tm.unpack(p_tm(p_tm.pack(tm_x))).numpy()
ref = np.fft.fft(tm_x, axis=-1)
err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
print(f"tmajor x bf16 (5000,93): e={err:.1e} "
      f"{'ok' if err < 3e-2 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 3e-2

# ND transform-major (round-5): misaligned 5-D worst row, reduced batch
nd_x = (rng.standard_normal((1, 5, 160, 160, 48))
        + 1j * rng.standard_normal((1, 5, 160, 160, 48))
        ).astype(np.complex64)
p_nd = tpufft.plan_fft(nd_x.shape, axes=(1, 2, 3, 4),
                       layout="transform-major")
got = p_nd.unpack(p_nd(p_nd.pack(nd_x))).numpy()
ref = np.fft.fftn(nd_x, axes=(1, 2, 3, 4))
err = np.max(np.abs(got - ref)) / max(1.0, float(np.max(np.abs(ref))))
print(f"nd-tmajor (1,5,160,160,48): e={err:.1e} "
      f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 1e-3

# native windows through the fused welch path (kaiser tuple, round-5)
nw_x = rng.standard_normal((8, 8192)).astype(np.float32)
_, Pg = tpufft.welch(_jnp.asarray(nw_x), window=("kaiser", 7.0),
                     nperseg=512)
_, Pr = _ssig.welch(nw_x.astype(np.float64), window=("kaiser", 7.0),
                    nperseg=512)
err = np.max(np.abs(np.asarray(Pg) - Pr)) / max(
    1.0, float(np.max(np.abs(Pr))))
print(f"welch native-kaiser (8,8192): e={err:.1e} "
      f"{'ok' if err < 1e-3 else 'FAIL'}", flush=True)
_T += 1
fails += err >= 1e-3

print(f"RESULT: {_T - fails}/{_T} ok"
      + ("" if fails == 0 else f" — {fails} FAILURES"), flush=True)
