"""tpufft — TPU-native generic-radix N-dimensional FFT in JAX/Pallas.

A from-scratch TPU-first rebuild of the capabilities of
martinvuyk/hackathon-fft (a Mojo CPU/GPU mixed-radix Stockham FFT library):
any prime radix, forward/inverse, real and complex input, ND transforms,
explicit plans, with Stockham butterfly stages executed as small DFT-matrix
contractions in fused VMEM Pallas kernels (batch on the lane axis) and a
pure-XLA fallback/oracle path.
"""

from .config import PlanConfig
from .core import SplitComplex
from .planner import (default_bases, digit_reverse, factorize,
                      next_fast_len, stage_schedule)
from .api import (
    Plan, plan_fft,
    fft, ifft, rfft, irfft,
    fft2, ifft2, rfft2, irfft2,
    fftn, ifftn, rfftn, irfftn,
    hfft, ihfft,
    fftfreq, rfftfreq, fftshift, ifftshift,
)

__version__ = "0.1.0"

__all__ = [
    "PlanConfig", "Plan", "SplitComplex", "plan_fft",
    "fft", "ifft", "rfft", "irfft",
    "fft2", "ifft2", "rfft2", "irfft2",
    "fftn", "ifftn", "rfftn", "irfftn",
    "hfft", "ihfft",
    "fftfreq", "rfftfreq", "fftshift", "ifftshift",
    "default_bases", "digit_reverse", "factorize", "next_fast_len",
    "stage_schedule",
    "__version__",
]
