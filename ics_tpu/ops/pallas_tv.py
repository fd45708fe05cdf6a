"""Hand-written Pallas TPU kernel for the 8-neighbour TV stencil.

Same math as ``ics_tpu.ops.tv.tv_op`` (parity target: reference
lib/deconvolution.pyx:137-239), built as an explicit VMEM tile pipeline:
the (3, H, W) planar image is processed in (3, T, W+2) row bands; each grid
step assembles the band plus a 1-row halo in VMEM, evaluates the full
stencil on the VPU, and writes a (3, T, W) block of both outputs.  This is
the TPU-native replacement for the reference's OpenMP ``prange`` over rows —
the row band is the parallel unit, DMA/compute overlap comes from the Pallas
grid pipeline.

Planar (C, H, W) layout keeps W on the 128-lane axis (an (H, W, 3) block
would waste 125/128 lanes).  The public wrapper accepts the framework's
(H, W, C) layout and transposes at the boundary.

The 1-row halo cannot be expressed with plain BlockSpecs (block indices are
in block units, and halo bands overlap), so the kernel receives three
row-shifted views of the padded image whose i-th blocks are the band's top
halo row, body, and bottom halo row.

Falls back to interpret mode off-TPU, so the same tests run on CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tv_op_pallas", "tv_tile_h"]

_SQRT2 = math.sqrt(2.0)


def tv_tile_h(h: int, w: int, c: int = 3, budget: int = 9 * 2**20) -> int | None:
    """Largest row tile whose VMEM working set fits the scoped budget, or
    None (callers then use the XLA stencil).  Counts the three shifted
    input views and both outputs TWICE each (Pallas double-buffers blocks
    across grid steps) plus the in-kernel band concatenation.

    The 9 MB budget is calibrated on hardware (r3): a ~13 MB working set
    (tile 32 at width 3072) fails Mosaic's compile outright, while every
    probed configuration at or under ~7 MB (tile 16 at 3072, tile 8 at
    6016) compiles and runs — this kernel's five big blocks need more
    slack under the 16 MB scoped limit than the conv kernels' two."""
    item = 4  # float32-only kernel
    for tile_h in (64, 32, 16, 8):
        need = item * c * (
            3 * 2 * tile_h * (w + 2)  # three shifted in blocks, x2 buffers
            + (tile_h + 2) * (w + 2)  # assembled band temp
            + 2 * 2 * tile_h * w  # tv/div out blocks, x2 buffers
        )
        if need < budget:
            return tile_h
    return None


def _make_kernel(epsilon: float, order: int, norm: int, tile_h: int):
    adjust = 4.0 * (1.0 + 1.0 / _SQRT2) if norm == 1 else 2.0 * (1.0 + _SQRT2)
    if norm == 1:
        norm_fn = lambda x, y: jnp.abs(x) + jnp.abs(y) + epsilon
    else:
        norm_fn = lambda x, y: jnp.sqrt(x * x + y * y + epsilon * epsilon)

    def kernel(up_ref, mid_ref, down_ref, tv_ref, div_ref):
        # Assemble the (C, T+2, W+2) band: top halo row, body, bottom halo.
        band = jnp.concatenate(
            [up_ref[:, :1, :], mid_ref[...], down_ref[:, -1:, :]], axis=1
        )
        c_dim, _, wp2 = band.shape
        w = wp2 - 2

        def sh(di, dj):
            # static slices — Mosaic does not lower the dynamic_slice
            # primitive (and these offsets are compile-time constants)
            return band[:, 1 + di : 1 + di + tile_h, 1 + dj : 1 + dj + w]

        c = sh(0, 0)
        if order == 2:
            udx = -2.0 * c + sh(-1, 0) + sh(1, 0)
            udy = -2.0 * c + sh(0, -1) + sh(0, 1)
            udxdy = (-2.0 * c + sh(-1, -1) + sh(1, 1)) / _SQRT2
            udydx = (-2.0 * c + sh(-1, 1) + sh(1, -1)) / _SQRT2
            div = (-udx - udy - udxdy - udydx) / adjust
            tv = (norm_fn(udx, udy) + norm_fn(udxdy, udydx)) / adjust
        else:
            udx_b = c - sh(-1, 0)
            udy_b = c - sh(0, -1)
            udx_f = -c + sh(1, 0)
            udy_f = -c + sh(0, 1)
            udxdy_b = (c - sh(-1, -1)) / _SQRT2
            udydx_b = (c - sh(-1, 1)) / _SQRT2
            udydx_f = (-c + sh(1, -1)) / _SQRT2
            udxdy_f = (-c + sh(1, 1)) / _SQRT2
            div = (
                udx_b + udy_b - udx_f - udy_f
                + udxdy_b + udydx_b - udxdy_f - udydx_f
            ) / adjust
            tv = (
                norm_fn(udx_b, udy_b)
                + norm_fn(udx_f, udy_f)
                + norm_fn(udxdy_b, udydx_b)
                + norm_fn(udxdy_f, udydx_f)
            ) / adjust

        tv_ref[...] = tv
        div_ref[...] = div

    return kernel


@functools.partial(
    jax.jit, static_argnames=("epsilon", "order", "norm", "tile_h", "interpret")
)
def _tv_planar(u, *, epsilon, order, norm, tile_h, interpret):
    """u: (C, H, W) -> (tv, div) each (C, H, W), interior-only (borders 0)."""
    c, h, w = u.shape
    grid_h = -(-h // tile_h)
    h_pad = grid_h * tile_h
    # 1px zero pad = stencil halo; extra bottom rows pad H to a tile multiple.
    u_p = jnp.pad(u, ((0, 0), (1, 1 + h_pad - h), (1, 1)))

    band_spec = lambda: pl.BlockSpec(
        (c, tile_h, w + 2), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    out_spec = lambda: pl.BlockSpec(
        (c, tile_h, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    tv, div = pl.pallas_call(
        _make_kernel(epsilon, order, norm, tile_h),
        grid=(grid_h,),
        in_specs=[band_spec(), band_spec(), band_spec()],
        out_specs=(out_spec(), out_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((c, h_pad, w), u.dtype),
            jax.ShapeDtypeStruct((c, h_pad, w), u.dtype),
        ),
        interpret=interpret,
    )(u_p[:, :-2, :], u_p[:, 1:-1, :], u_p[:, 2:, :])

    # The reference evaluates the interior only; zero the border ring.
    row_mask = jnp.zeros((h,), u.dtype).at[1 : h - 1].set(1.0)
    col_mask = jnp.zeros((w,), u.dtype).at[1 : w - 1].set(1.0)
    mask = row_mask[None, :, None] * col_mask[None, None, :]
    return tv[:, :h, :] * mask, div[:, :h, :] * mask


def tv_op_pallas(
    u,
    epsilon: float,
    order: int = 2,
    norm: int = 1,
    tile_h: int = 64,
    interpret: bool | None = None,
):
    """Drop-in Pallas variant of ``ics_tpu.ops.tv.tv_op`` for (H, W, C) input."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    planar = jnp.moveaxis(u, -1, 0)
    tv, div = _tv_planar(
        planar,
        epsilon=float(epsilon),
        order=int(order),
        norm=int(norm),
        tile_h=int(tile_h),
        interpret=bool(interpret),
    )
    return jnp.moveaxis(tv, 0, -1), jnp.moveaxis(div, 0, -1)
