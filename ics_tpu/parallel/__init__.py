"""Multi-chip execution: mesh helpers, spatial tiling with halo exchange,
batched deconvolution across images, multi-host (DCN) fan-out."""

from ics_tpu.parallel.mesh import BATCH_AXIS, TILE_AXIS, make_mesh, make_mesh_2d
from ics_tpu.parallel.tiling import sharded_richardson_lucy, sharded_convolve_rgb
from ics_tpu.parallel.batch import batched_deconvolve
from ics_tpu.parallel.distributed import initialize, local_batch_slice

__all__ = [
    "BATCH_AXIS",
    "TILE_AXIS",
    "make_mesh",
    "make_mesh_2d",
    "sharded_richardson_lucy",
    "sharded_convolve_rgb",
    "batched_deconvolve",
    "initialize",
    "local_batch_slice",
]
