"""Pallas kernel for full-image correlation with a tiny (PSF-sized) output.

The blind PSF gradient is ``gradk = conv_valid(rot180(u), error)``
(ref lib/deconvolution.pyx:567-571): a valid convolution of two whole
images whose output is only (MK, MK).  Treated as a generic convolution
this is pathological — the "kernel" has millions of taps, so the XLA conv
path is unusable and the FFT path pays two full-image FFTs per call
(~100 ms at 6 MP).  Written as what it actually is — MK² big dot products —
it is one bandwidth pass and a few GFLOP:

    corr[c, ti, tj] = sum_{i,j} u[c, i + ti, j + tj] * err[c, i, j]
    gradk           = rot180(corr)      (convolution = flipped correlation,
                                         and the solver's rot180(u) cancels)

Each grid step loads one planar (C, T+MK-1, W) row band of ``u`` and a
(C, T, W) band of ``err`` into VMEM, evaluates all MK² shifted dot products
on the VPU (planar layout keeps W on the 128-lane axis), and accumulates
into the (C, MK²) output block — the same block revisited across the
sequential Pallas grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["psf_gradient", "correlate_psf_valid"]


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _make_kernel(mk: int, tile_h: int):
    band_rows = tile_h + _round8(mk - 1)  # DMA slices need 8-aligned rows

    def kernel(a_hbm, b_ref, out_ref, a_scratch, sem):
        # a_hbm: (C, M_pad + round8(mk-1), Wa) in HBM/ANY; b_ref: (C, tile_h, Wb)
        # out_ref: (C, mk * mk), accumulated across the sequential grid.
        i = pl.program_id(0)
        # The a-band overlaps its neighbors by mk-1 rows, which BlockSpec
        # blocking cannot express — DMA the band explicitly.  Row count and
        # offset are 8-aligned (sublane tiling); the overshoot rows past
        # mk-1 are never read by the windows below.
        band = pltpu.make_async_copy(
            a_hbm.at[:, pl.ds(i * tile_h, band_rows)], a_scratch, sem
        )
        band.start()

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        band.wait()
        b = b_ref[...]
        wb = b.shape[2]
        partial = []
        for ti in range(mk):
            for tj in range(mk):
                window = a_scratch[:, ti : ti + tile_h, tj : tj + wb]
                # Keep every intermediate rank>=2 — Mosaic's layout inference
                # aborts on rank-1 vector reshapes.
                row_sums = jnp.sum(window * b, axis=2)  # (C, tile_h)
                partial.append(jnp.sum(row_sums, axis=1, keepdims=True))
        out_ref[...] += jnp.concatenate(partial, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def _corr_planar(a, b, *, tile_h, interpret):
    """corr_valid of planar a: (C, Ma, Na) with b: (C, M, N) -> (C, MK, MK)."""
    c, m, _ = b.shape
    mk = a.shape[1] - m + 1
    grid_h = -(-m // tile_h)
    m_pad = grid_h * tile_h
    # zero-pad rows so every band is full; zero rows contribute nothing.
    # `a` additionally pads rows to the 8-aligned DMA band and columns to a
    # lane multiple (HBM DMA slices must align to the (8, 128) tiling).
    b_p = jnp.pad(b, ((0, 0), (0, m_pad - m), (0, 0)))
    a_rows_extra = (m_pad + _round8(mk - 1)) - a.shape[1]
    a_cols_extra = (-a.shape[2]) % 128
    a_p = jnp.pad(a, ((0, 0), (0, a_rows_extra), (0, a_cols_extra)))

    out = pl.pallas_call(
        _make_kernel(mk, tile_h),
        grid=(grid_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (c, tile_h, b.shape[2]),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (c, mk * mk), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, mk * mk), a.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, tile_h + _round8(mk - 1), a_p.shape[2]), a.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(a_p, b_p)
    return out.reshape(c, mk, mk)


def psf_gradient(u, error, tile_h: int = 64, interpret: bool | None = None):
    """``conv_valid(rot180(u), error)`` — the blind PSF gradient
    (ref lib/deconvolution.pyx:567-571) — without materializing any rotated
    or flipped full image: the solver's explicit rot180(u) cancels against
    convolution's kernel flip, leaving ``rot180(corr_valid(u, error))``.

    u: (uM, uN, C); error: (M, N, C); returns (MK, MK, C) with
    MK = uM - M + 1.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    u_pl = jnp.moveaxis(jnp.asarray(u), -1, 0)
    e_pl = jnp.moveaxis(jnp.asarray(error), -1, 0)
    corr = _corr_planar(u_pl, e_pl, tile_h=int(tile_h), interpret=bool(interpret))
    return jnp.flip(jnp.moveaxis(corr, 0, -1), axis=(0, 1))


def correlate_psf_valid(a, b, tile_h: int = 64, interpret: bool | None = None):
    """Generic ``conv_valid(a, b)`` for a big pair with a small output.

    Identity used: conv_valid(a, b) = rot180(corr_valid(rot180(a), b)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a_pl = jnp.moveaxis(jnp.flip(jnp.asarray(a), axis=(0, 1)), -1, 0)
    b_pl = jnp.moveaxis(jnp.asarray(b), -1, 0)
    corr = _corr_planar(a_pl, b_pl, tile_h=int(tile_h), interpret=bool(interpret))
    return jnp.flip(jnp.moveaxis(corr, 0, -1), axis=(0, 1))
