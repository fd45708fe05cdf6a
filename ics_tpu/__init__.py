"""ICS-TPU — a TPU-native (JAX/XLA/Pallas) image-processing framework.

Re-designed from scratch with the capabilities of
aurelienpierre/Image-Cases-Studies (blind / non-blind Richardson-Lucy
deconvolution with Total-Variation regularization, multi-scale pyramid,
classic filters, window generators, color utilities, 16-bit TIFF I/O),
built TPU-first: every solver iteration is a fused on-chip XLA program
(`lax.scan` inside `lax.while_loop`), stencils are Pallas kernels, and
large images shard across a `jax.sharding.Mesh` with halo exchange.

De-facto public surface of the reference (SURVEY.md §0):
  - ``deblur_module``      (reference: deconvolve.py:66)
  - ``richardson_lucy_MM`` (reference: lib/deconvolution.pyx:341)
  - ``normalize_kernel``   (reference: lib/deconvolution.pyx:73)
  - the ``utils`` module   (reference: lib/utils.py)
"""

from ics_tpu.ops.windows import (
    uniform_kernel,
    gaussian_kernel,
    kaiser_kernel,
    poisson_kernel,
    disc_blur,
    lens_blur,
)
from ics_tpu.ops.psf import normalize_kernel, rotate_180
from ics_tpu.ops.conv import convolve2d, convolve_rgb
from ics_tpu.models.rl_mm import richardson_lucy_MM, RLConfig, RLResult
from ics_tpu.models.rl_pam import richardson_lucy_PAM, PAMConfig
from ics_tpu.models.rl_pd import richardson_lucy_PD, PDConfig
from ics_tpu.models.tv_denoise import tv_denoise
from ics_tpu.models.pipeline import deblur_module, build_pyramid, pad_image

__version__ = "0.1.0"

__all__ = [
    "uniform_kernel",
    "gaussian_kernel",
    "kaiser_kernel",
    "poisson_kernel",
    "disc_blur",
    "lens_blur",
    "normalize_kernel",
    "rotate_180",
    "convolve2d",
    "convolve_rgb",
    "richardson_lucy_MM",
    "RLConfig",
    "RLResult",
    "richardson_lucy_PAM",
    "PAMConfig",
    "richardson_lucy_PD",
    "PDConfig",
    "tv_denoise",
    "deblur_module",
    "build_pyramid",
    "pad_image",
]
