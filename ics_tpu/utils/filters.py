"""Classic filters: bilateral, Bessel/Gaussian blur, unsharp mask, blending.

Parity targets: reference lib/utils.py:173-300.  The reference's
``bilateral_filter`` splits the (2r+1)² neighbour offsets across Python
threads with shared-memory accumulation (ref lib/utils.py:207-232) and calls
an *undefined* ``gaussian(...)`` weight (ref lib/utils.py:186 — latent
defect); here the offsets are a `lax.scan` on-chip (one fused program, no
thread management) and the weight is the Gaussian pdf the reference intended
(its Cython ``gaussian_weight``, lib/deconvolution.pyx:35).  A Pallas tile
kernel for the bilateral lives in ``ics_tpu.ops.pallas_bilateral``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ics_tpu.ops.conv import convolve2d
from ics_tpu.ops.windows import gaussian_kernel, kaiser_kernel

__all__ = [
    "bilateral_filter",
    "bilateral_lab",
    "bessel_blur",
    "gaussian_blur",
    "USM",
    "overlay",
    "blending",
    "convolve",
]

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _gauss_pdf(x, sigma):
    return jnp.exp(-(x * x) / (2.0 * sigma * sigma)) * (_INV_SQRT_2PI / sigma)


@functools.partial(jax.jit, static_argnames=("radius",))
def _bilateral(source, radius: int, std_i, std_s):
    h, w = source.shape
    padded = jnp.pad(source, radius, mode="symmetric")

    r = np.arange(-radius, radius + 1)
    # same offset enumeration as the reference (tile/repeat cartesian product,
    # ref lib/utils.py:212-213)
    offsets = np.transpose([np.tile(r, len(r)), np.repeat(r, len(r))]).astype(np.int32)
    dists = np.sqrt((offsets**2).sum(axis=1)).astype(np.float32)

    def step(carry, off_dist):
        acc, weights = carry
        off, dist = off_dist
        neighbour = lax.dynamic_slice(padded, (radius + off[0], radius + off[1]), (h, w))
        gi = _gauss_pdf(neighbour - source, std_i)
        gs = _gauss_pdf(dist, std_s)
        wgt = gi * gs
        return (acc + neighbour * wgt, weights + wgt), None

    init = (jnp.zeros_like(source), jnp.zeros_like(source))
    (acc, weights), _ = lax.scan(step, init, (jnp.asarray(offsets), jnp.asarray(dists)))
    return acc / weights


def bilateral_filter(source, radius: int, std_i, std_s, parallel: int = 1):
    """Edge-preserving bilateral filter of a 2-D plane
    (parity: ref lib/utils.py:195-234; ``parallel`` accepted for signature
    compatibility — parallelism is XLA's problem now).

    On TPU the fused Pallas band kernel runs all (2r+1)² offsets out of
    VMEM in one HBM pass (ops/pallas_bilateral.py) at the largest row tile
    whose working set fits the scoped-VMEM budget; elsewhere — or when no
    tile fits (very wide frames) — the portable ``lax.scan`` of shifted
    passes."""
    if jax.default_backend() == "tpu":
        from ics_tpu.ops.pallas_bilateral import bilateral_pallas, bilateral_tile_h

        h, w = np.shape(source)
        tile_h = bilateral_tile_h(int(h), int(w), int(radius))
        if tile_h is not None:
            return bilateral_pallas(
                source, int(radius), float(std_i), float(std_s), tile_h=tile_h
            )
    return _bilateral(jnp.asarray(source, jnp.float32), int(radius), float(std_i), float(std_s))


def bilateral_lab(rgb, radius: int, std_i, std_s, luminance_only: bool = True):
    """Bilateral denoise in CIELAB (the reference's ``img/bilateral-LAB``
    workflow; BASELINE.json config 2): convert sRGB→LAB, filter L (or all
    three channels), convert back.

    ``std_i`` is in L units (0-100 scale).
    """
    from ics_tpu.utils.color import LABImage, lab_to_rgb, rgb_to_lab

    lab = rgb_to_lab(jnp.asarray(rgb, jnp.float32))
    l = bilateral_filter(lab.L, radius, std_i, std_s)
    if luminance_only:
        a, b = lab.A, lab.B
    else:
        a = bilateral_filter(lab.A, radius, std_i, std_s)
        b = bilateral_filter(lab.B, radius, std_i, std_s)
    return lab_to_rgb(LABImage(L=l, A=a, B=b))


def bessel_blur(src, radius: int, amount):
    """Kaiser-Bessel window blur (parity: ref lib/utils.py:238-249)."""
    kern = jnp.asarray(kaiser_kernel(radius, amount), jnp.float32)
    return _blur_same_symm(jnp.asarray(src, jnp.float32), kern)


def gaussian_blur(src, radius: int, amount):
    """Gaussian window blur (parity: ref lib/utils.py:253-264)."""
    kern = jnp.asarray(gaussian_kernel(radius, amount), jnp.float32)
    return _blur_same_symm(jnp.asarray(src, jnp.float32), kern)


@jax.jit
def _blur_same_symm(src, kern):
    # scipy.signal.convolve2d(..., mode='same', boundary='symm'): symmetric
    # padding by the kernel half-width, then valid convolution.
    mk, nk = kern.shape
    # 'same' slice offset of the full conv is (mk-1)//2; symmetric padding of
    # ceil/floor halves reproduces it exactly.
    top, bottom = (mk - 1) - (mk - 1) // 2, (mk - 1) // 2
    leftp, rightp = (nk - 1) - (nk - 1) // 2, (nk - 1) // 2
    padded = jnp.pad(src, ((top, bottom), (leftp, rightp)), mode="symmetric")
    return convolve2d(padded, kern, mode="valid")


def USM(src, radius: int, strength, amount, method: str = "bessel"):
    """Unsharp mask ``src + (src - blur(src)) * amount``
    (parity: ref lib/utils.py:268-277)."""
    blur = {"bessel": bessel_blur, "gauss": gaussian_blur}[method]
    src = jnp.asarray(src, jnp.float32)
    return src + (src - blur(src, radius, strength)) * amount


def overlay(upx, lpx):
    """Overlay blending on the 0–100 scale (parity: ref lib/utils.py:281-287,
    including the exclusive masks that zero out lpx == 50)."""
    upx = jnp.asarray(upx, jnp.float32)
    lpx = jnp.asarray(lpx, jnp.float32)
    low = (lpx < 50).astype(upx.dtype)
    high = (lpx > 50).astype(upx.dtype)
    return low * (2.0 * upx * lpx / 100.0) + high * (
        100.0 - 2.0 * (100.0 - upx) * (100.0 - lpx) / 100.0
    )


def blending(upx, lpx, type: str):
    """Dispatch blending modes (parity: ref lib/utils.py:291-300)."""
    types = {"overlay": overlay}
    return types[type](upx, lpx)


def convolve(a, b, domain: str):
    """General 2-D convolution with ``valid | same | full`` output domains —
    the working counterpart of the reference's backup pyFFTW ``convolve``
    (ref lib/utils.py:420-447, the "FFTW with saved wisdom" path its README
    advertises at README.md:135-136).

    Accepts (H, W) planes or (H, W, C) images (per-channel kernels as
    (MK, NK, C), or (MK, NK) broadcast).  Output sizes match the reference's
    domain table (ref lib/utils.py:430-439) and scipy.signal.convolve.  Note
    the dead backup itself crops ``irfft2`` in the FREQUENCY domain, which
    does not implement the centered same/valid crop its domain table
    implies; like the undefined ``gaussian`` in ``bilateral_filter``, the
    rebuild supplies the intended semantics (scipy-exact, property-tested in
    tests/test_conv.py).  XLA replaces FFTW planning: the compiled program
    per shape is the "saved wisdom".
    """
    if domain not in ("valid", "same", "full"):
        # ref lib/utils.py:439 raises bare SyntaxError on unknown domains
        raise ValueError(f"domain must be valid|same|full, got {domain!r}")
    from ics_tpu.ops.conv import convolve_rgb

    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        return convolve2d(a, b, mode=domain)
    return convolve_rgb(a, b, mode=domain)
