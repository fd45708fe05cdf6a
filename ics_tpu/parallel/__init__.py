"""Multi-chip execution: mesh helpers, spatial tiling with halo exchange,
batched deconvolution across images."""

from ics_tpu.parallel.mesh import make_mesh
from ics_tpu.parallel.tiling import sharded_richardson_lucy, sharded_convolve_rgb
from ics_tpu.parallel.batch import batched_deconvolve

__all__ = [
    "make_mesh",
    "sharded_richardson_lucy",
    "sharded_convolve_rgb",
    "batched_deconvolve",
]
