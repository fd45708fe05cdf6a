"""Image quality metrics: SSIM and PSNR.

The reference has no metrics module — its regression strategy is
golden-image inspection by eye (SURVEY.md §4).  The rebuild's parity
criterion is SSIM >= 0.999 vs reference outputs (BASELINE.md), so SSIM is a
first-class utility here.  Implementation follows Wang et al. 2004 with the
skimage defaults (gaussian_weights=False variant: uniform 7×7 window,
K1=0.01, K2=0.03).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["ssim", "psnr"]


def _uniform_filter(x, size: int):
    kern = jnp.ones((size, size), x.dtype) / (size * size)
    from ics_tpu.ops.conv import convolve2d

    return convolve2d(x, kern, mode="valid", method="direct")


def ssim(a, b, data_range: float = 1.0, win_size: int = 7) -> float:
    """Mean SSIM over all channels (skimage-compatible defaults)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        a = a[..., jnp.newaxis]
        b = b[..., jnp.newaxis]
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    n = win_size * win_size
    cov_norm = n / (n - 1)  # sample covariance, as skimage uses

    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        ux = _uniform_filter(x, win_size)
        uy = _uniform_filter(y, win_size)
        uxx = _uniform_filter(x * x, win_size)
        uyy = _uniform_filter(y * y, win_size)
        uxy = _uniform_filter(x * y, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2)
        )
        vals.append(jnp.mean(s))
    return float(jnp.mean(jnp.stack(vals)))


def psnr(a, b, data_range: float = 1.0) -> float:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return float(10.0 * jnp.log10(data_range**2 / mse))
