"""Image quality metrics: SSIM and PSNR.

The reference has no metrics module — its regression strategy is
golden-image inspection by eye (SURVEY.md §4).  The rebuild's parity
criterion is SSIM >= 0.999 vs reference outputs (BASELINE.md), so SSIM is a
first-class utility here.  Implementation follows Wang et al. 2004 with the
skimage defaults (gaussian_weights=False variant: uniform 7×7 window,
K1=0.01, K2=0.03).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["ssim", "psnr"]

# Above this element count the metrics run on the HOST (numpy/scipy) instead
# of the accelerator: scoring a 24 MP frame right after a full-pipeline solve
# must not compete with the solver's resident buffers for HBM (a v5e OOM was
# observed doing exactly that).  The host path is the same Wang et al. math
# in float64; small inputs (all tests, golden crops) keep the jnp path.
_HOST_METRIC_ELEMS = 1 << 22


def _uniform_filter(x, size: int):
    kern = jnp.ones((size, size), x.dtype) / (size * size)
    from ics_tpu.ops.conv import convolve2d

    return convolve2d(x, kern, mode="valid", method="direct")


def _ssim_host(a, b, data_range: float, win_size: int) -> float:
    """Numpy/scipy SSIM — identical values to the jnp path on the interior.

    scipy's ``uniform_filter`` pads by reflection, which only contaminates a
    ``win_size // 2`` margin; cropping that margin from the SSIM map leaves
    exactly the valid-convolution values the jnp path computes.
    """
    from scipy.ndimage import uniform_filter

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a = a[..., np.newaxis]
        b = b[..., np.newaxis]
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    n = win_size * win_size
    cov_norm = n / (n - 1)
    pad = win_size // 2
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        ux = uniform_filter(x, win_size)
        uy = uniform_filter(y, win_size)
        uxx = uniform_filter(x * x, win_size)
        uyy = uniform_filter(y * y, win_size)
        uxy = uniform_filter(x * y, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2)
        )
        vals.append(float(np.mean(s[pad:-pad, pad:-pad])))
    return float(np.mean(vals))


def ssim(a, b, data_range: float = 1.0, win_size: int = 7) -> float:
    """Mean SSIM over all channels (skimage-compatible defaults)."""
    if np.asarray(a).size >= _HOST_METRIC_ELEMS:
        return _ssim_host(a, b, data_range, win_size)
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
    if np.asarray(a).size >= _HOST_METRIC_ELEMS:
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        mse = float(np.mean((a - b) ** 2))
        return float(10.0 * np.log10(data_range**2 / mse))
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return float(10.0 * jnp.log10(data_range**2 / mse))
