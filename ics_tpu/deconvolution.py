"""Reference-compatible module path: ``ics_tpu.deconvolution`` mirrors the
reference's ``lib.deconvolution`` public surface (cpdef symbols
``richardson_lucy_MM`` and ``normalize_kernel``, ref lib/deconvolution.pyx:73,
341), so code written against the reference imports with only a package
rename:

    from lib import deconvolution as dc      # reference
    from ics_tpu import deconvolution as dc  # this framework
"""

from ics_tpu.models.rl_mm import RLConfig, RLResult, richardson_lucy_MM
from ics_tpu.ops.psf import normalize_kernel, rotate_180

__all__ = [
    "richardson_lucy_MM",
    "normalize_kernel",
    "rotate_180",
    "RLConfig",
    "RLResult",
]
