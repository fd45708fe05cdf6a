"""Color / tone operators.

Parity targets: reference lib/utils.py:45-131 (Lagrange interpolation,
grey-point shift, auto-vibrance), lib/utils.py:319-417 (backup ``divTV`` /
``gradTVEM``), and the HSV hue-shift / saturation / luminance-mask prototypes
from ``notebooks/HSV color balance.ipynb``.

The Lagrange path drops the reference's sympy symbolic detour (ref
lib/utils.py:45-82 builds a symbolic polynomial, horner-forms it and
lambdifies to numpy) for direct barycentric evaluation — identical values,
no symbolic runtime.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Lagrange_interpolation",
    "LABImage",
    "grey_point",
    "auto_vibrance",
    "divTV",
    "gradTVEM",
    "rgb_to_hsv",
    "hsv_to_rgb",
    "rgb_to_lab",
    "lab_to_rgb",
    "normal2rad",
    "rad2normal",
    "hue_shift",
    "saturation_boost",
    "luma_masks",
]

# D65 white point, sRGB primaries (IEC 61966-2-1)
_XYZ_FROM_RGB = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ]
)
_RGB_FROM_XYZ = np.linalg.inv(_XYZ_FROM_RGB)
_WHITE_D65 = np.array([0.95047, 1.0, 1.08883])


def _srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c):
    return jnp.where(
        c <= 0.0031308, c * 12.92, 1.055 * jnp.maximum(c, 1e-12) ** (1 / 2.4) - 0.055
    )


def _lab_f(t):
    d = 6.0 / 29.0
    return jnp.where(t > d**3, jnp.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def _lab_f_inv(t):
    d = 6.0 / 29.0
    return jnp.where(t > d, t**3, 3 * d * d * (t - 4.0 / 29.0))


def rgb_to_lab(rgb) -> LABImage:
    """sRGB [0,1] (..., 3) → CIELAB (L in [0,100]) as an ``LABImage``.

    Gives the reference's LAB-space ops (``grey_point``, ``auto_vibrance``,
    the ``img/bilateral-LAB`` workflow) a concrete conversion path — the
    reference assumed an external LAB container.
    """
    rgb = jnp.asarray(rgb)
    lin = _srgb_to_linear(rgb)
    xyz = jnp.einsum("ij,...j->...i", jnp.asarray(_XYZ_FROM_RGB, lin.dtype), lin)
    xyz = xyz / jnp.asarray(_WHITE_D65, lin.dtype)
    f = _lab_f(xyz)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return LABImage(L=l, A=a, B=b)


def lab_to_rgb(lab: LABImage):
    """CIELAB → sRGB [0,1] (..., 3), clipped to gamut."""
    l = jnp.asarray(lab.L)
    a = jnp.asarray(lab.A)
    b = jnp.asarray(lab.B)
    fy = (l + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_lab_f_inv(fx), _lab_f_inv(fy), _lab_f_inv(fz)], axis=-1)
    xyz = xyz * jnp.asarray(_WHITE_D65, xyz.dtype)
    lin = jnp.einsum("ij,...j->...i", jnp.asarray(_RGB_FROM_XYZ, xyz.dtype), xyz)
    return jnp.clip(_linear_to_srgb(lin), 0.0, 1.0)


def Lagrange_interpolation(points: np.ndarray, variable=None):
    """Lagrange interpolation polynomial through n points.

    Returns ``(P, Y)`` like the reference (lib/utils.py:45-82): ``P`` is the
    polynomial (an ``np.poly1d`` instead of a sympy expression) and ``Y`` its
    evaluation at ``variable`` (or None if no variable is given).
    """
    points = np.asarray(points, dtype=np.float64)
    n = points.shape[0]
    poly = np.poly1d([0.0])
    for i in range(n):
        xi, yi = points[i]
        term = np.poly1d([yi])
        for j in range(n):
            if j == i:
                continue
            xj = points[j, 0]
            term = term * np.poly1d([1.0, -xj]) / (xi - xj)
        poly = poly + term
    Y = None if variable is None else poly(np.asarray(variable))
    return poly, Y


@dataclasses.dataclass
class LABImage:
    """Minimal LAB container matching the attribute surface the reference's
    color ops expect (``src.L``, ``src.A``, ``src.B``)."""

    L: np.ndarray
    A: np.ndarray
    B: np.ndarray


def _lagrange3_eval(xs, ys, x):
    """Evaluate the quadratic through three (x, y) points at ``x`` — the jnp
    equivalent of the reference's sympy→lambdify detour (ref lib/utils.py:
    45-82).  ``xs``/``ys`` entries may be traced scalars."""
    x = jnp.asarray(x)
    total = jnp.zeros_like(x)
    for i in range(3):
        term = jnp.ones_like(x) * ys[i]
        for j in range(3):
            if j != i:
                term = term * (x - xs[j]) / (xs[i] - xs[j])
        total = total + term
    return total


def grey_point(src: LABImage, amount: float) -> LABImage:
    """Shift the grey point via the ratio of two Lagrange curves on L
    (parity: ref lib/utils.py:85-113).  Fully on-device (jittable): the
    curves are evaluated with jnp Horner/barycentric math instead of
    host-side ``np.poly1d``."""
    L = jnp.asarray(src.L)
    y1 = _lagrange3_eval([0.0, amount, 100.0], [1.0, amount, 100.0], L)
    y2 = _lagrange3_eval([0.0, jnp.mean(L), 100.0], [1.0, amount, 100.0], L)
    ratio = y2 / y1
    return LABImage(
        L=L * ratio, A=jnp.asarray(src.A) * ratio, B=jnp.asarray(src.B) * ratio
    )


# auto_vibrance's two smoothing splines are fixed curves (constant data,
# ref lib/utils.py:116-131) — fit them ONCE on host at first use, then
# evaluate the piecewise cubics on device.
_VIBRANCE_X = np.array([-100, -50, -20, 0, 20, 50, 100], dtype=np.float64)
_VIBRANCE_Y1 = np.array([100, 45, 19, 1, 19, 45, 100], dtype=np.float64)
_VIBRANCE_Y2 = np.array([100, 50, 20, 1, 20, 50, 100], dtype=np.float64)
_VIBRANCE_PP = None


def _vibrance_ppolys():
    global _VIBRANCE_PP
    if _VIBRANCE_PP is None:
        from scipy import interpolate

        pps = []
        for y in (_VIBRANCE_Y1, _VIBRANCE_Y2):
            # splrep is the public FITPACK entry with the same smoothing
            # fit as UnivariateSpline (whose tck lives only in a private
            # attribute); default s = len(w) matches UnivariateSpline's.
            tck = interpolate.splrep(_VIBRANCE_X, y, s=len(_VIBRANCE_X))
            pp = interpolate.PPoly.from_spline(tck)
            pps.append((np.asarray(pp.x), np.asarray(pp.c)))
        _VIBRANCE_PP = tuple(pps)
    return _VIBRANCE_PP


def _ppoly_eval(breaks, coefs, x):
    """Vectorized piecewise-polynomial evaluation (scipy PPoly semantics,
    end-segment extrapolation) in jnp."""
    breaks = jnp.asarray(breaks, jnp.float32)
    coefs = jnp.asarray(coefs, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    nseg = coefs.shape[1]
    idx = jnp.clip(jnp.searchsorted(breaks, x, side="right") - 1, 0, nseg - 1)
    t = x - breaks[idx]
    res = coefs[0, idx]
    for k in range(1, coefs.shape[0]):
        res = res * t + coefs[k, idx]
    return res


def auto_vibrance(src: LABImage) -> LABImage:
    """Saturation boost preserving skin tones via a spline ratio
    (parity: ref lib/utils.py:116-131).  The splines are fitted once on the
    host (their data is constant); per-pixel evaluation is on-device jnp."""
    (x1, c1), (x2, c2) = _vibrance_ppolys()
    A = jnp.asarray(src.A)
    B = jnp.asarray(src.B)
    return LABImage(
        L=src.L,
        A=A * _ppoly_eval(x2, c2, A) / _ppoly_eval(x1, c1, A),
        B=B * _ppoly_eval(x2, c2, B) / _ppoly_eval(x1, c1, B),
    )


@jax.jit
def divTV(image):
    """div(TV) via shifted forward/backward differences (working version of
    the reference's backup ``divTV``, ref lib/utils.py:319-351).  Accepts
    (H, W) planes or (H, W, C) images — trailing axes ride along, like
    ``gradTVEM`` below."""
    image = jnp.asarray(image, jnp.float32)
    trail = ((0, 0),) * (image.ndim - 2)

    def pad_shift(img, pad_spec, sl):
        return jnp.pad(img, pad_spec + trail, mode="edge")[sl]

    grad = jnp.zeros_like(image)
    # forward differences
    fx = pad_shift(image, ((0, 0), (1, 0)), np.s_[:, 1:]) - image
    fy = pad_shift(image, ((1, 0), (0, 0)), np.s_[1:, :]) - image
    grad = grad + (fx + fy) / jnp.maximum(1e-3, jnp.sqrt(fx**2 + fy**2))
    # backward x and crossed y
    fx = pad_shift(image, ((0, 0), (0, 1)), np.s_[:, :-1]) - image
    fy = pad_shift(image, ((0, 1), (1, 0)), np.s_[:-1, 1:]) - pad_shift(
        image, ((1, 0), (0, 0)), np.s_[1:, :]
    )
    grad = grad - fx / jnp.maximum(1e-3, jnp.sqrt(fx**2 + fy**2))
    # backward y and crossed x
    fy = pad_shift(image, ((0, 1), (0, 0)), np.s_[:-1, :]) - image
    fx = pad_shift(image, ((1, 0), (0, 1)), np.s_[1:, :-1]) - pad_shift(
        image, ((0, 0), (0, 1)), np.s_[:, 1:]
    )
    grad = grad - fy / jnp.maximum(1e-3, jnp.sqrt(fy**2 + fx**2))
    return grad.astype(jnp.float32)


@jax.jit
def gradTVEM(u, ut, epsilon=1e-3, tau=1e-1, p=0.5):
    """MM Total-Variation gradient ``du / TV(u) / (tau + TV(ut))``.

    Working implementation of the reference's dead backup ``gradTVEM``
    (ref lib/utils.py:357-417, which references undefined helpers): for each
    of the 4 diagonal displacement vectors we take the shifted differences of
    ``u`` and ``ut``, form their ε-regularized p-norm TV magnitudes, and
    average du/TV/(tau+TVt) as the docstring specifies.
    """
    u = jnp.asarray(u, jnp.float32)
    ut = jnp.asarray(ut, jnp.float32)
    deltas = ((1, 1), (-1, 1), (1, -1), (-1, -1))

    def shifted(img, dy, dx):
        pad_y = (max(dy, 0), max(-dy, 0))
        pad_x = (max(dx, 0), max(-dx, 0))
        pads = (pad_y, pad_x) + ((0, 0),) * (img.ndim - 2)
        padded = jnp.pad(img, pads, mode="edge")
        h, w = img.shape[0], img.shape[1]
        return padded[pad_y[1] : pad_y[1] + h, pad_x[1] : pad_x[1] + w]

    grad = jnp.zeros_like(u)
    for dy, dx in deltas:
        du_y = shifted(u, dy, 0) - u
        du_x = shifted(u, 0, dx) - u
        du = du_y + du_x
        tv = (jnp.abs(du_y) ** p + jnp.abs(du_x) ** p + epsilon) ** (1.0 / p)
        dut_y = shifted(ut, dy, 0) - ut
        dut_x = shifted(ut, 0, dx) - ut
        tvt = (jnp.abs(dut_y) ** p + jnp.abs(dut_x) ** p + epsilon) ** (1.0 / p)
        grad = grad + du / tv / (tau + tvt)
    return grad / 4.0


# --- HSV prototypes from notebooks/HSV color balance.ipynb ---------------


def _gaussian_weights(source, target, sigma):
    return jnp.exp(-((source - target) ** 2) / (2 * sigma**2)) / (
        sigma * jnp.sqrt(2 * jnp.pi)
    )


def rgb_to_hsv(rgb):
    """Vectorized RGB→HSV on [0,1] arrays, shape (..., 3)."""
    rgb = jnp.asarray(rgb)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    safe = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """Vectorized HSV→RGB on [0,1] arrays, shape (..., 3)."""
    hsv = jnp.asarray(hsv)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def normal2rad(theta):
    """[0,1] hue → [-pi, pi] radians (notebook cell 2)."""
    theta = jnp.asarray(theta) * 2 * jnp.pi
    return jnp.where(theta > jnp.pi, theta - 2 * jnp.pi, theta)


def rad2normal(theta):
    """[-pi, pi] radians → [0,1] hue (notebook cell 2)."""
    theta = jnp.asarray(theta)
    theta = jnp.where(theta < 0, 2 * jnp.pi + theta, theta)
    return theta / (2 * jnp.pi)


def hue_shift(source, target, amount):
    """Move hue angles toward ``target`` weighted by angular proximity
    (notebook ``hue``)."""
    source = jnp.asarray(source)
    if amount == 0:
        return source
    sigma = jnp.pi / 2.0
    x = jnp.cos(source) + jnp.cos(target) * _gaussian_weights(
        jnp.cos(source), jnp.cos(target), sigma
    ) * sigma * amount
    y = jnp.sin(source) + jnp.sin(target) * _gaussian_weights(
        jnp.sin(source), jnp.sin(target), sigma
    ) * sigma * amount
    return jnp.arctan2(y, x)


def saturation_boost(source, amount):
    """Saturation push weighted toward mid-saturation (notebook ``saturation``)."""
    source = jnp.asarray(source)
    if amount == 0.0:
        return source
    return source + amount * _gaussian_weights(source, 1.0 - source, 0.5)


def luma_masks(pixels, sigma=1.0 / 8.0):
    """Normalized shadows/midtones/highlights Gaussian masks
    (notebook ``luma_masks``)."""
    pixels = jnp.asarray(pixels)
    l_max = jnp.max(pixels)
    l_min = jnp.min(pixels)
    high = _gaussian_weights(pixels, l_max, 2 * sigma)
    low = _gaussian_weights(pixels, l_min, 2 * sigma)
    mid = _gaussian_weights(pixels, 0.5, sigma) * (1 + 2 * sigma)
    norm = high + low + mid
    return low / norm, mid / norm, high / norm
