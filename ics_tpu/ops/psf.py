"""PSF (point-spread-function) utilities.

Parity targets: reference lib/deconvolution.pyx:47-75 (``_normalize_kernel``:
clamp negatives to zero, then make each channel sum to 1) and
lib/deconvolution.pyx:242-252 (``rotate_180``).  Pure functional jnp — these
fuse into the surrounding solver program under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["normalize_kernel", "rotate_180"]


def normalize_kernel(kern, mk: int | None = None):
    """Clamp negative taps to 0 and normalize each channel to sum 1.

    Works on (MK, MK) or (MK, MK, C) kernels.  ``mk`` is accepted for
    signature parity with the reference (lib/deconvolution.pyx:73) and
    ignored — shapes are static under JAX.  Functional: returns the
    normalized kernel instead of mutating in place.
    """
    kern = jnp.maximum(kern, 0.0)
    if kern.ndim == 2:
        return kern / jnp.sum(kern)
    sums = jnp.sum(kern, axis=(0, 1), keepdims=True)
    return kern / sums


def normalize_kernel_np(kern: np.ndarray) -> np.ndarray:
    """Host-side (NumPy) variant for pipeline setup code."""
    kern = np.maximum(kern, 0.0)
    if kern.ndim == 2:
        return kern / kern.sum()
    return kern / kern.sum(axis=(0, 1), keepdims=True)


def rotate_180(array):
    """Rotate (H, W) or (H, W, C) by 180° about the spatial center
    (ref lib/deconvolution.pyx:242-252)."""
    return jnp.flip(array, axis=(0, 1))
