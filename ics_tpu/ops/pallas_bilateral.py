"""Pallas TPU kernel for the bilateral filter.

The reference splits the (2r+1)² neighbour offsets across Python threads
with shared-memory accumulation (ref lib/utils.py:207-232).  Here one fused
kernel does it all on-chip: each grid step DMAs a (T+2r, W+2r) row band of
the symmetric-padded plane from HBM into VMEM, then runs the full offset
loop out of VMEM — every neighbour read is a register-speed shifted slice,
and the (num, den) accumulators never leave VMEM.  One pass over HBM total,
versus the reference's (2r+1)² strided passes over RAM.

Used by ``ics_tpu.utils.filters.bilateral_filter`` when on TPU; the
`lax.scan` formulation there is the portable fallback.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bilateral_pallas", "bilateral_tile_h"]

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def bilateral_tile_h(h: int, w: int, radius: int, budget: int = 13 * 2**20) -> int | None:
    """Largest row tile whose VMEM working set fits the 16 MB scoped budget
    (with headroom), or None if none does.

    Counts everything live at once (the same discipline as
    ``ops.conv._pallas_tile_h``, which exists because under-counting caused
    a compile-time VMEM OOM on real v5e at 24 MP): the band scratch, the
    fori carry's rolled band copy, the num/den accumulators, and the output
    block TWICE (Pallas double-buffers out blocks across grid steps)."""
    wp = w + 2 * radius
    wp += (-wp) % 128  # lane-aligned DMA width
    item = 4  # the kernel is float32-only
    for tile_h in (128, 64, 32):
        band_rows = tile_h + _round8(2 * radius)
        need = item * (
            2 * band_rows * wp  # band scratch + rolled fori-carry copy
            + 2 * tile_h * w  # num/den accumulators
            + 2 * tile_h * w  # double-buffered output block
        )
        if need < budget:
            return tile_h
    return None


def _make_kernel(radius: int, std_i: float, std_s: float, tile_h: int, w: int):
    inv2si2 = 1.0 / (2.0 * std_i * std_i)
    norm_i = _INV_SQRT_2PI / std_i
    # Mosaic requires HBM slice extents 8-aligned on the sublane axis —
    # round the 2r halo up; the overshoot rows are never read.
    band_rows = tile_h + _round8(2 * radius)

    inv2ss2 = 1.0 / (2.0 * std_s * std_s)
    norm_s = _INV_SQRT_2PI / std_s

    def kernel(hbm_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        band = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(i * tile_h, band_rows)],
            scratch,
            sem,
        )
        band.start()
        band.wait()

        center = scratch[radius : radius + tile_h, radius : radius + w]

        # Offset ROWS iterate a fori_loop carrying a row-rolled band (at
        # step t the window scratch[t : t+tile_h] is the static slice
        # rolled[0:tile_h]); offset COLUMNS are static lane slices.  A
        # fully-unrolled (2r+1)^2 loop with value accumulators kept every
        # tap's temporaries live — 49 MB of scoped VMEM at radius 5 (a
        # compile-time OOM on real v5e; interpret mode never noticed).
        def row(t, carry):
            rolled, num, den = carry
            dyf = (t - radius).astype(jnp.float32)
            for dx in range(2 * radius + 1):
                dxf = float(dx - radius)
                gs = jnp.exp(-(dyf * dyf + dxf * dxf) * inv2ss2) * norm_s
                nb = rolled[0:tile_h, dx : dx + w]
                diff = nb - center
                gi = jnp.exp(-(diff * diff) * inv2si2) * norm_i
                wgt = gi * gs
                num = num + nb * wgt
                den = den + wgt
            rolled = jnp.concatenate([rolled[1:], rolled[:1]], axis=0)
            return rolled, num, den

        zeros = jnp.zeros((tile_h, w), jnp.float32)
        _, num, den = jax.lax.fori_loop(
            0, 2 * radius + 1, row, (scratch[...], zeros, zeros)
        )
        out_ref[...] = num / den

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "radius", "std_i", "std_s", "tile_h", "interpret"),
)
def _bilateral_plane(padded, *, h, w, radius, std_i, std_s, tile_h, interpret):
    """padded: row/lane-aligned symmetric-padded plane; returns (h, w)."""
    hp = padded.shape[0] - _round8(2 * radius)
    grid_h = hp // tile_h

    out = pl.pallas_call(
        _make_kernel(radius, std_i, std_s, tile_h, w),
        grid=(grid_h,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(
                (tile_h + _round8(2 * radius), padded.shape[1]), jnp.float32
            ),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out[:h]


def bilateral_pallas(
    source,
    radius: int,
    std_i: float,
    std_s: float,
    tile_h: int = 128,
    interpret: bool | None = None,
):
    """Bilateral filter of a 2-D plane; same semantics as
    ``ics_tpu.utils.filters.bilateral_filter``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    source = jnp.asarray(source, jnp.float32)
    h, w = source.shape
    grid_h = -(-h // tile_h)
    h_pad = grid_h * tile_h
    padded = jnp.pad(source, radius, mode="symmetric")
    # bottom-pad so every band DMA (tile_h + 8-aligned halo) stays in
    # bounds, and lane-align the width to 128 for the DMA (extra rows and
    # columns never reach the output)
    rows_needed = h_pad + _round8(2 * radius)
    padded = jnp.pad(
        padded,
        (
            (0, rows_needed - padded.shape[0]),
            (0, (-padded.shape[1]) % 128),
        ),
        mode="edge",
    )
    return _bilateral_plane(
        padded,
        h=int(h),
        w=int(w),
        radius=int(radius),
        std_i=float(std_i),
        std_s=float(std_s),
        tile_h=int(tile_h),
        interpret=bool(interpret),
    )
