"""ε-regularized Total-Variation magnitude + divergence over the 8-neighbour
stencil.

Parity target: reference lib/deconvolution.pyx:137-239 (``TV``): 2nd-order
(central) or 1st-order (forward+backward) differences, L1 or L2 norm,
diagonal terms scaled by 1/sqrt(2), a per-(order,norm) ``adjust``
normalization, and **interior-only** evaluation (the output border rows and
columns stay zero — ref lib/deconvolution.pyx:239 "borders are ignored").

Implemented as a vectorized shifted-slice stencil: XLA fuses the whole thing
into a single elementwise pass over VMEM tiles, which is the TPU-native
answer to the reference's OpenMP ``prange`` over rows.  A hand-written Pallas
tile kernel exists in ``ics_tpu.ops.pallas_tv`` for the cases XLA's fuser
leaves on the table.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["tv_op", "tv_op_auto", "collab_sup", "collab_l2"]

_SQRT2 = math.sqrt(2.0)


def collab_sup(tv: jax.Array) -> jax.Array:
    """Collaborative L^{∞,1,1} channel coupling of a per-channel TV magnitude.

    The reference's stated contribution (ref README.md:113-114) replaces the
    per-channel (decoupled) TV regularizer with the **collaborative
    L^{∞,1,1} RGB total-variation norm** of Duran, Moeller, Sbert & Cremers
    (ipol.im/pub/art/2016/141): for the gradient tensor A[pixel, direction,
    channel], apply ℓ^∞ over the COLOR axis innermost, then ℓ^1 over the
    derivative directions, then ℓ^1 over pixels.  The per-channel magnitude
    computed by :func:`tv_op` is already the ℓ^1 over directions (|ux|+|uy|
    + diagonals, ε-regularized), so the collaborative magnitude is its
    per-pixel supremum over channels — every channel is then normalized by
    the SAME (worst-channel) magnitude, which is the "handcuffs between
    channels": a gradient spike in one channel only (chromatic noise) is
    charged the full penalty, while a luminance edge shared by all three
    channels is charged once instead of three times.  That asymmetry is
    what "helps dramatically in chromatic noise removal" (ref
    README.md:114).

    Returns shape (H, W, 1), broadcastable against per-channel arrays.
    """
    return jnp.max(tv, axis=2, keepdims=True)


def collab_l2(tv: jax.Array) -> jax.Array:
    """ℓ²-over-color collaborative coupling of a per-channel TV magnitude.

    The softer sibling of :func:`collab_sup` from the same collaborative-TV
    family (Duran, Moeller, Sbert & Cremers, ipol.im/pub/art/2016/141 —
    their ℓ^{2,1,1} class; the ℓ² color coupling goes back to
    Blomgren & Chan's color TV): every channel is normalized by the
    Euclidean mean of the three channel magnitudes instead of their
    maximum.  Scaled by 1/sqrt(C) (root-MEAN-square, not root-sum) so that
    on achromatic content — all channels equal — the coupled magnitude
    equals the per-channel one, exactly like the sup coupling; the
    couplings therefore differ from 'channel' mode ONLY on chromatic
    outliers, where ℓ² charges an isolated single-channel spike
    sqrt(2/3 + 1/3·(spike/base)²)·base — the RMS of (spike, base, base)
    — between the per-channel charge and the sup's full-max charge.

    Returns shape (H, W, 1), broadcastable against per-channel arrays.
    """
    return jnp.sqrt(jnp.mean(tv * tv, axis=2, keepdims=True))


def tv_op_auto(
    u: jax.Array, epsilon: float, order: int = 2, norm: int = 1,
    method: str = "auto", collab: "bool | str" = False,
):
    """``tv_op`` with backend dispatch: 'pallas' = the VMEM band kernel
    (ops/pallas_tv.py; same math, hardware-certified bit-exact vs this
    stencil by ``bench.py --selftest``), 'xla' = the fused shifted-slice
    stencil, 'auto' = the measured winner.

    This is the ``use_tv`` solvers' entry point.  Measured on v5e (r3,
    chained-scan, order 2 / L2): XLA 1.79 ms vs Pallas 2.62 at 6.3 MP,
    8.00 vs 8.45 at 24 MP — XLA's fuser already emits a near-roofline
    single pass for the 11-read stencil, and the Pallas kernel's VMEM
    working set forces 8-16-row tiles at large widths (wider tiles fail
    Mosaic's compile — see ``tv_tile_h``), so **'auto' picks 'xla'**.
    ``collab=True`` (or ``'sup'``) returns the collaborative L^{∞,1,1}
    magnitude (:func:`collab_sup` of the per-channel magnitude, shape
    (H, W, 1)) instead of the per-channel one; ``collab='l2'`` returns the
    ℓ²-color-coupled magnitude (:func:`collab_l2`, same shape).  The
    divergence is per-channel in every case.  The channel coupling is
    applied OUTSIDE the backend kernel (XLA fuses the 3-lane max/rms into
    the stencil's output write; for the Pallas backend it is one extra
    fused elementwise pass), so both backends stay bit-identical to each
    other under either norm."""
    if method not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown tv method {method!r}")
    if collab not in (False, True, "sup", "l2"):
        raise ValueError(f"unknown collab coupling {collab!r}")
    use_pallas = method == "pallas"  # 'auto' resolves to the measured winner, xla
    out = None
    if use_pallas:
        from ics_tpu.ops.pallas_tv import tv_op_pallas, tv_tile_h

        h, w = u.shape[0], u.shape[1]
        c = u.shape[2] if u.ndim == 3 else 1
        tile_h = tv_tile_h(int(h), int(w), int(c))
        if tile_h is not None:
            out = tv_op_pallas(u, epsilon, order, norm, tile_h=tile_h)
        elif method == "pallas":
            raise ValueError(
                f"no Pallas TV row tile fits VMEM for shape {u.shape}"
            )
    if out is None:
        out = tv_op(u, epsilon, order, norm)
    if collab and u.ndim == 3 and u.shape[2] > 1:
        tv, div = out
        couple = collab_l2 if collab == "l2" else collab_sup
        out = (couple(tv), div)
    return out


def _norm_l2(x, y, epsilon):
    # ref lib/deconvolution.pyx:129-130
    return jnp.sqrt(x * x + y * y + epsilon * epsilon)


def _norm_l1(x, y, epsilon):
    # ref lib/deconvolution.pyx:133-134
    return jnp.abs(x) + jnp.abs(y) + epsilon


def _shift(u, di: int, dj: int):
    """u[i+di, j+dj] evaluated on the interior (1:-1, 1:-1) window.

    u is (H, W, C); returns (H-2, W-2, C).
    """
    h, w = u.shape[0], u.shape[1]
    return u[1 + di : h - 1 + di, 1 + dj : w - 1 + dj]


def tv_op(u: jax.Array, epsilon: float, order: int = 2, norm: int = 1):
    """Return ``(tv, div)`` with zero borders, both shaped like ``u``.

    ``tv`` is the ε-regularized TV magnitude, ``div`` its divergence, each
    divided by the reference's ``adjust`` coefficient
    (ref lib/deconvolution.pyx:149-152).
    """
    if order not in (1, 2):
        raise ValueError("order must be 1 or 2")
    if norm not in (1, 2):
        raise ValueError("norm must be 1 (L1) or 2 (L2)")

    adjust = 4.0 * (1.0 + 1.0 / _SQRT2) if norm == 1 else 2.0 * (1.0 + _SQRT2)
    norm_fn = _norm_l1 if norm == 1 else _norm_l2

    c = _shift(u, 0, 0)
    if order == 2:
        # central 2nd differences (ref lib/deconvolution.pyx:162-172)
        udx = -2.0 * c + _shift(u, -1, 0) + _shift(u, 1, 0)
        udy = -2.0 * c + _shift(u, 0, -1) + _shift(u, 0, 1)
        udxdy = (-2.0 * c + _shift(u, -1, -1) + _shift(u, 1, 1)) / _SQRT2
        udydx = (-2.0 * c + _shift(u, -1, 1) + _shift(u, 1, -1)) / _SQRT2
        div = (-udx - udy - udxdy - udydx) / adjust
        tv = (norm_fn(udx, udy, epsilon) + norm_fn(udxdy, udydx, epsilon)) / adjust
    else:
        # forward + backward 1st differences (ref lib/deconvolution.pyx:197-213)
        udx_back = c - _shift(u, -1, 0)
        udy_back = c - _shift(u, 0, -1)
        udx_forw = -c + _shift(u, 1, 0)
        udy_forw = -c + _shift(u, 0, 1)
        udxdy_back = (c - _shift(u, -1, -1)) / _SQRT2
        udydx_back = (c - _shift(u, -1, 1)) / _SQRT2
        udydx_forw = (-c + _shift(u, 1, -1)) / _SQRT2
        udxdy_forw = (-c + _shift(u, 1, 1)) / _SQRT2
        div = (
            udx_back
            + udy_back
            - udx_forw
            - udy_forw
            + udxdy_back
            + udydx_back
            - udxdy_forw
            - udydx_forw
        ) / adjust
        tv = (
            norm_fn(udx_back, udy_back, epsilon)
            + norm_fn(udx_forw, udy_forw, epsilon)
            + norm_fn(udxdy_back, udydx_back, epsilon)
            + norm_fn(udxdy_forw, udydx_forw, epsilon)
        ) / adjust

    pad = ((1, 1), (1, 1)) + ((0, 0),) * (u.ndim - 2)
    return jnp.pad(tv, pad), jnp.pad(div, pad)
