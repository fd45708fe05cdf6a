"""Cubic-spline image resize matching skimage.transform.resize semantics.

The reference resizes pyramid levels with ``skimage.transform.resize(pic,
shape, order=3, mode="edge", preserve_range=True)`` (ref deconvolve.py:245-249).
skimage is not in this environment, so this reimplements the same sampling:
output pixel centers map to input coordinates via the centered convention
``x_in = (x_out + 0.5) * (in/out) - 0.5``, interpolated with an order-3
B-spline (scipy.ndimage.map_coordinates) and edge replication.

Host-side NumPy/SciPy — resizing happens between pyramid levels, off the hot
path.  A jittable `jax.image.resize` variant is provided for fully on-device
pipelines.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from scipy import ndimage

__all__ = ["resize", "resize_jax"]


def resize(image: np.ndarray, shape, order: int = 3, mode: str = "edge") -> np.ndarray:
    """Resize (H, W) or (H, W, C) to ``shape`` (spatial dims of shape only)."""
    image = np.asarray(image)
    out_h, out_w = int(shape[0]), int(shape[1])
    in_h, in_w = image.shape[:2]
    # skimage/scipy 'edge' replication is ndimage mode 'nearest'
    nd_mode = {"edge": "nearest", "reflect": "reflect", "wrap": "wrap"}[mode]

    row = (np.arange(out_h) + 0.5) * (in_h / out_h) - 0.5
    col = (np.arange(out_w) + 0.5) * (in_w / out_w) - 0.5
    rr, cc = np.meshgrid(row, col, indexing="ij")
    coords = np.stack([rr, cc])

    def _one(plane):
        return ndimage.map_coordinates(
            plane.astype(np.float64), coords, order=order, mode=nd_mode
        )

    if image.ndim == 2:
        out = _one(image)
    else:
        out = np.stack([_one(image[..., c]) for c in range(image.shape[-1])], axis=-1)
    return out.astype(image.dtype if image.dtype.kind == "f" else np.float32)


def resize_jax(image, shape, method: str = "cubic"):
    """On-device resize (jax.image.resize) for jitted pipelines.

    Runs under an explicit ``jax.jit`` (cached per shape): the eager
    composition dispatches jax.image.resize's internal gather/weighting
    ops one by one with unfused intermediates — the same eager-dispatch
    cost class measured at 2-5x on the batched solver
    (docs/PERFORMANCE.md "Batched solves").  Pyramid level shapes repeat
    across runs, so each shape compiles once.
    """
    return _resize_jit(image, (int(shape[0]), int(shape[1])), method)


@functools.partial(jax.jit, static_argnames=("hw", "method"))
def _resize_jit(image, hw, method):
    import jax.image

    return jax.image.resize(
        image, hw + tuple(image.shape[2:]), method=method
    )
