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

__all__ = ["bilateral_pallas"]

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _make_kernel(radius: int, std_i: float, std_s: float, tile_h: int, w: int):
    inv2si2 = 1.0 / (2.0 * std_i * std_i)
    norm_i = _INV_SQRT_2PI / std_i

    def kernel(hbm_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        band = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(i * tile_h, tile_h + 2 * radius)],
            scratch,
            sem,
        )
        band.start()
        band.wait()

        center = scratch[radius : radius + tile_h, radius : radius + w]
        num = jnp.zeros((tile_h, w), jnp.float32)
        den = jnp.zeros((tile_h, w), jnp.float32)
        # Static unrolled offset loop: the spatial weight is a compile-time
        # constant per offset; only the range weight is data-dependent.
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                gs = (
                    math.exp(-(dy * dy + dx * dx) / (2.0 * std_s * std_s))
                    * _INV_SQRT_2PI
                    / std_s
                )
                nb = scratch[
                    radius + dy : radius + dy + tile_h,
                    radius + dx : radius + dx + w,
                ]
                diff = nb - center
                gi = jnp.exp(-(diff * diff) * inv2si2) * norm_i
                wgt = gi * gs
                num += nb * wgt
                den += wgt
        out_ref[...] = num / den

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("h", "radius", "std_i", "std_s", "tile_h", "interpret"),
)
def _bilateral_plane(padded, *, h, radius, std_i, std_s, tile_h, interpret):
    """padded: (H_pad+2r, W+2r) symmetric-padded plane; returns (h, W)."""
    hp = padded.shape[0] - 2 * radius
    w = padded.shape[1] - 2 * radius
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
            pltpu.VMEM((tile_h + 2 * radius, w + 2 * radius), jnp.float32),
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
    # pad rows at the bottom to a tile multiple (values never reach output)
    padded = jnp.pad(padded, ((0, h_pad - h), (0, 0)), mode="edge")
    return _bilateral_plane(
        padded,
        h=int(h),
        radius=int(radius),
        std_i=float(std_i),
        std_s=float(std_s),
        tile_h=int(tile_h),
        interpret=bool(interpret),
    )
