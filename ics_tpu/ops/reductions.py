"""Whole-array scalar reductions and the Gaussian weight window.

Parity targets: reference lib/deconvolution.pyx:255-338 (nogil mean /
variance / amax / amax-abs / L1 / L2 norms over flat float buffers) and
lib/deconvolution.pyx:35-44 (``gaussian_weight`` normal pdf and
``gaussian_serie``).  Under sharding these become psum/pmax collectives
automatically; on one chip they are single fused XLA reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "mean",
    "variance",
    "amax",
    "amaxabs",
    "array_norm_L1",
    "array_norm_L2",
    "whiteness_weights",
]


def mean(a: jax.Array) -> jax.Array:
    return jnp.mean(a)


def variance(a: jax.Array, m: jax.Array | None = None) -> jax.Array:
    if m is None:
        m = jnp.mean(a)
    return jnp.mean((m - a) ** 2)


def amax(a: jax.Array) -> jax.Array:
    return jnp.max(a)


def amaxabs(a: jax.Array) -> jax.Array:
    return jnp.max(jnp.abs(a))


def array_norm_L2(a: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.sum(a * a))


def array_norm_L1(a: jax.Array) -> jax.Array:
    return jnp.sum(jnp.abs(a))


def whiteness_weights(height: int, width: int) -> np.ndarray:
    """Gaussian-tapered weight window of the residual-whiteness metric.

    Reproduces ref lib/deconvolution.pyx:392-404: take linspace(-1, 1) along
    each side, map through the N(0, 1) pdf, form sqrt(outer(...)), normalize
    to sum 1.  Host-side NumPy (built once per pyramid level).
    """
    h = np.linspace(-1.0, 1.0, num=height, dtype=np.float64)
    w = np.linspace(-1.0, 1.0, num=width, dtype=np.float64)
    pdf = lambda x: np.exp(-(x**2) / 2.0) / np.sqrt(2.0 * np.pi)
    weights = np.sqrt(np.outer(pdf(h), pdf(w)))
    weights /= weights.sum()
    return weights.astype(np.float32)
