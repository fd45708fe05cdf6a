"""Banded-VMEM Pallas convolution for small per-channel PSFs.

The XLA shift-and-add backend (ops/conv.py ``stencil``) costs roughly one
HBM pass per PSF tap — measured ~9 ms per 7×7 conv at 6.3 MP (≈49 reads at
full bandwidth).  This kernel DMAs each (C, T+halo, W) row band into VMEM
once and runs all taps out of VMEM, so the HBM cost is one read plus one
write regardless of tap count: ~1 ms for the same conv, the round-2 lever
for large-frame non-blind solves.

scipy ``valid`` semantics on a pre-padded input (``same``/``full`` are
zero-pads of ``valid``, using the same centering rule as ops/conv.py).
Planar (C, H, W) layout; the PSF lives in SMEM and taps are scalar splats
(Mosaic cannot broadcast a (C,1,1) vector over sublanes and lanes).
Default for 81-961-tap kernels on TPU (``conv_method='auto'``): the
fori_loop tap-row structure keeps the Mosaic program small enough to
compile in seconds per frame shape (the fully-unrolled round-2 version
took 2-30 minutes per pyramid-level width on this host's chipless AOT
compiler — the dominant cold-start cost of the whole pipeline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ics_tpu.ops.conv import _pads

__all__ = ["conv_rgb_pallas"]


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _make_kernel(mk: int, nk: int, tile_h: int, w_out: int, c: int, dtype):
    band_rows = tile_h + _round8(mk - 1)

    def kernel(a_hbm, psf_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        band = pltpu.make_async_copy(
            a_hbm.at[:, pl.ds(i * tile_h, band_rows)], scratch, sem
        )
        band.start()
        band.wait()

        # Tap ROWS iterate a fori_loop carrying a row-rolled copy of the
        # band (at step t1 the window scratch[t1:t1+tile_h] is the STATIC
        # slice rolled[0:tile_h] — Mosaic rejects non-8-aligned dynamic
        # sublane starts); tap COLUMNS are static lane offsets, unrolled.
        # This keeps the Mosaic program O(nk) instead of O(mk*nk): the
        # fully-unrolled tap loop compiled in 2-30 MINUTES at large frame
        # widths (the per-level cold-start cost of round 2's pipeline),
        # the fori version in 2-14 s, at the same measured runtime
        # (5.1 vs 5.3 ms per 9x9 conv at 6.3 MP f32 on v5e).  Wrapped rows
        # are never read: max t1 is mk-1 and rolled[0:tile_h] =
        # scratch[t1:t1+tile_h] stays in bounds.
        for ch in range(c):

            def row(t1, carry, ch=ch):
                rolled, acc = carry
                for t2 in range(nk):
                    # psf scalars live in SMEM as f32; cast to the compute
                    # dtype so bf16 bands run at the packed 2x VPU rate.
                    # convolution = correlation with the flipped kernel
                    tap = psf_ref[ch, mk - 1 - t1, nk - 1 - t2].astype(dtype)
                    acc = acc + rolled[0:tile_h, t2 : t2 + w_out] * tap
                rolled = jnp.concatenate([rolled[1:], rolled[:1]], axis=0)
                return rolled, acc

            _, acc = jax.lax.fori_loop(
                0,
                mk,
                row,
                (scratch[ch], jnp.zeros((tile_h, w_out), dtype)),
            )
            out_ref[ch] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "tile_h", "interpret"))
def _conv_planar(a, k, *, mode, tile_h, interpret):
    """a: (C, H, W); k: (C, MK, NK) -> scipy-convolve ``mode`` output."""
    c, m, n = a.shape
    _, mk, nk = k.shape
    (plo, phi) = _pads(mk, mode)
    (qlo, qhi) = _pads(nk, mode)
    k = k.astype(jnp.float32)  # SMEM scalars; cast to compute dtype in-kernel
    a_p = jnp.pad(a, ((0, 0), (plo, phi), (qlo, qhi)))
    out_m = a_p.shape[1] - mk + 1
    out_n = a_p.shape[2] - nk + 1

    grid_h = -(-out_m // tile_h)
    rows_needed = grid_h * tile_h + _round8(mk - 1)
    a_p = jnp.pad(
        a_p,
        (
            (0, 0),
            (0, rows_needed - a_p.shape[1]),
            (0, (-a_p.shape[2]) % 128),  # lane-align the DMA
        ),
    )

    out = pl.pallas_call(
        _make_kernel(mk, nk, tile_h, out_n, c, a.dtype),
        grid=(grid_h,),
        in_specs=[
            # keep the big padded input in HBM explicitly — with ANY the
            # placer may pick VMEM and blow the scoped-vmem budget
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(k.shape, memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (c, tile_h, out_n), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, grid_h * tile_h, out_n), a.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, tile_h + _round8(mk - 1), a_p.shape[2]), a.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(a_p, k)
    return out[:, :out_m, :]


def conv_rgb_pallas(
    a, k, mode: str = "same", tile_h: int = 128, interpret: bool | None = None
):
    """(H, W, C)-layout wrapper with scipy convolve semantics.

    ``k``: (MK, NK, C) per-channel kernels or (MK, NK) broadcast.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a = jnp.asarray(a)
    if a.dtype not in (jnp.float32, jnp.bfloat16):
        a = a.astype(jnp.float32)
    if k.ndim == 2:
        k = jnp.broadcast_to(k[..., jnp.newaxis], (*k.shape, a.shape[-1]))
    a_pl = jnp.moveaxis(a, -1, 0)
    k_pl = jnp.moveaxis(jnp.asarray(k, jnp.float32), -1, 0)
    out = _conv_planar(
        a_pl, k_pl, mode=mode, tile_h=int(tile_h), interpret=bool(interpret)
    )
    return jnp.moveaxis(out, 0, -1)
