"""Device-mesh helpers.

The reference's only parallelism is OpenMP threads over image rows
(SURVEY.md §2.2); the TPU-native equivalent is SPMD over a
``jax.sharding.Mesh``.  Conventions used across the framework:

* axis ``"tile"`` — spatial tiling of one large image (rows across chips,
  halos over ICI),
* axis ``"batch"`` — independent images fanned out across chips/hosts.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "TILE_AXIS", "BATCH_AXIS"]

TILE_AXIS = "tile"
BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, axis_name: str = TILE_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_2d(tile: int, batch: int) -> Mesh:
    """(batch, tile) mesh: shard independent images over ``batch`` and each
    image's rows over ``tile``."""
    devices = np.array(jax.devices()[: tile * batch]).reshape(batch, tile)
    return Mesh(devices, (BATCH_AXIS, TILE_AXIS))
