"""Pallas VMEM-resident kernel for the RL-MM inner minimization loop.

The blind PSF-estimation phase of the pipeline solves on mask-sized windows
(~255² + pad — under a megabyte per buffer).  At that size the XLA path is
bound by per-op launch overhead: each inner iteration is ~20 small ops, and
a 200-outer-iteration blind level spends ~1 s doing almost no math.  This
kernel runs the ENTIRE inner loop — all 5 iterations of: valid-conv
synthesis, residual, full-conv correlation, DoF mask, regularized update,
adaptive per-channel step, DoF blend, and (blind) the PSF gradient/update/
projection — as ONE kernel launch with every buffer resident in VMEM.

Exact float32 parity with the XLA path (same dataflow as
ics_tpu.models.rl_mm._solve in parity mode, i.e. reference
lib/deconvolution.pyx:460-591 as-checked-in); verified against it in
tests/test_pallas.py.  Only used when the problem fits comfortably in VMEM
(see ``fits_vmem``); the XLA path remains the general case.

Mosaic constraints shape the design:
- channels are unrolled into per-channel 2-D (H, W) planes (rows on
  sublanes, cols on lanes) — a (3,1,1)x(3,H,W) broadcast hits the
  unimplemented "broadcast in both sublanes and lanes";
- the PSF lives in SMEM and its taps are read as true scalars
  (scalar x vector is a supported splat);
- reductions produce rank-0 scalars, PSF updates are scalar stores;
- no value-level dynamic_update_slice — padded buffers are VMEM scratch
  written through static ref slices;
- the PSF rot180 is never materialized: taps are unrolled, so rotation is
  compile-time index flipping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["inner_loop_pallas", "fits_vmem"]

_INNER_ITER = 5  # ref lib/deconvolution.pyx:375


def fits_vmem(u_m: int, u_n: int, budget_bytes: int = 10 * 2**20) -> bool:
    """True when the whole inner loop fits in VMEM (~8 image-sized f32
    buffers plus slack)."""
    return 8 * (3 * u_m * u_n * 4) < budget_bytes


def _make_kernel(m, n, u_m, u_n, mk, *, blind, correlation):
    pad = (u_m - m) // 2
    inv_un = 1.0 / (u_m * u_n)
    C = 3

    def kernel(u_ref, image_ref, psf_ref, sf_ref, lam_ref, u_out, psf_out,
               err_out, ut_ref, epad_ref):
        # u (3, uM, uN) VMEM; image (3, M, N) VMEM; psf (3, mk, mk) SMEM;
        # sf/lam: (1, 1) SMEM scalars (gradient step factor, lambda).
        step_factor = sf_ref[0, 0]
        lambd = lam_ref[0, 0]
        ut_ref[...] = u_ref[...]

        def conv_valid_residual(c):
            """synth_c - image_c  (ref :477-488)."""
            u_c = u_ref[c]
            err = -image_ref[c]
            for t1 in range(mk):
                for t2 in range(mk):
                    tap = psf_ref[c, mk - 1 - t1, mk - 1 - t2]
                    err += u_c[t1 : t1 + m, t2 : t2 + n] * tap
            return err

        for _ in range(_INNER_ITER):
            for c in range(C):
                # 1. residual (ref :477-488)
                error_c = conv_valid_residual(c)
                err_out[c] = error_c

                # 2. gradu = conv_full(error, rot180(psf)) (ref :490-491):
                # gradu[k] = sum_t error[k-(mk-1)+t]*psf[t], via shifted
                # windows of the zero-padded residual (VMEM scratch).
                epad_ref[c] = jnp.zeros(
                    (u_m + mk - 1, u_n + mk - 1), error_c.dtype
                )
                epad_ref[c, mk - 1 : mk - 1 + m, mk - 1 : mk - 1 + n] = error_c
                epad_c = epad_ref[c]
                gradu = jnp.zeros((u_m, u_n), error_c.dtype)
                for t1 in range(mk):
                    for t2 in range(mk):
                        tap = psf_ref[c, t1, t2]
                        gradu += epad_c[t1 : t1 + u_m, t2 : t2 + u_n] * tap

                # 4. DoF mask from the raw correlation (ref :499-502)
                image_c = image_ref[c]
                gcrop = gradu[pad : pad + m, pad : pad + n]
                dof = ((gcrop - image_c) / (gcrop + image_c)) ** 2
                if not blind:
                    dof = dof / lambd

                # 5. parity-mode regularization (ref :508-519, live branch)
                u_c = u_ref[c]
                greg = lambd * gradu + (u_c - ut_ref[c]) * 0.5

                # 6. per-channel adaptive step + update (ref :522-531)
                dt = step_factor * (jnp.max(u_c) + inv_un) / (
                    jnp.max(jnp.abs(greg)) + 1e-15
                )
                u_c = u_c - dt * greg

                # 8. retain the blurry image where deblurring failed (ref :552)
                blended = (
                    (1.0 - dof) * u_c[pad : pad + m, pad : pad + n]
                    + dof * image_c
                )
                u_ref[c] = u_c
                u_ref[c, pad : pad + m, pad : pad + n] = blended

            # 9. blind PSF refinement (ref :555-589)
            if blind:
                # post-update residual, reused for the whiteness metric
                for c in range(C):
                    err_out[c] = conv_valid_residual(c)

                # gradk = conv_valid(rot180(u), error) = rot180(corr(u, err)):
                # one scalar dot per (channel, tap), indices pre-flipped.
                gradk = {}
                gk_max = None
                k_max = None
                for c in range(C):
                    u_c = u_ref[c]
                    err_c = err_out[c]
                    for a in range(mk):
                        for b in range(mk):
                            t1, t2 = mk - 1 - a, mk - 1 - b
                            g = jnp.sum(u_c[t1 : t1 + m, t2 : t2 + n] * err_c)
                            gradk[(c, a, b)] = g
                            ag = jnp.abs(g)
                            gk_max = (
                                ag if gk_max is None else jnp.maximum(gk_max, ag)
                            )
                            kv = psf_ref[c, a, b]
                            k_max = (
                                kv if k_max is None else jnp.maximum(k_max, kv)
                            )

                dtpsf = (
                    (step_factor / mk) * (k_max + inv_un / C) / (gk_max + 1e-15)
                )

                new_psf = {
                    key: psf_ref[key[0], key[1], key[2]] - dtpsf * g
                    for key, g in gradk.items()
                }
                if correlation:  # tie channels (ref :584-585)
                    for a in range(mk):
                        for b in range(mk):
                            mean = (
                                new_psf[(0, a, b)]
                                + new_psf[(1, a, b)]
                                + new_psf[(2, a, b)]
                            ) / 3.0
                            for c in range(C):
                                new_psf[(c, a, b)] = mean
                # clamp + per-channel normalization (ref :47-70)
                for c in range(C):
                    total = None
                    for a in range(mk):
                        for b in range(mk):
                            v = jnp.maximum(new_psf[(c, a, b)], 0.0)
                            new_psf[(c, a, b)] = v
                            total = v if total is None else total + v
                    for a in range(mk):
                        for b in range(mk):
                            psf_ref[c, a, b] = new_psf[(c, a, b)] / total

        u_out[...] = u_ref[...]
        for c in range(C):
            for a in range(mk):
                for b in range(mk):
                    psf_out[c, a, b] = psf_ref[c, a, b]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("blind", "correlation", "interpret")
)
def _inner_loop(u, image, psf, step_factor, lambd, *, blind, correlation, interpret):
    """One outer iteration's inner loop.  Planar (3, ...) arrays in/out;
    step_factor/lambd are traced scalars (SMEM inputs — no recompile per
    value)."""
    _, u_m, u_n = u.shape
    _, m, n = image.shape
    mk = psf.shape[1]
    kernel = _make_kernel(m, n, u_m, u_n, mk, blind=blind, correlation=correlation)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, memory_space=pltpu.SMEM)
    sf = jnp.asarray(step_factor, jnp.float32).reshape(1, 1)
    lam = jnp.asarray(lambd, jnp.float32).reshape(1, 1)
    u_new, psf_new, err = pl.pallas_call(
        kernel,
        in_specs=[vmem(), vmem(), smem(psf.shape), smem((1, 1)), smem((1, 1))],
        out_specs=(vmem(), smem(psf.shape), vmem()),
        out_shape=(
            jax.ShapeDtypeStruct(u.shape, u.dtype),
            jax.ShapeDtypeStruct(psf.shape, psf.dtype),
            jax.ShapeDtypeStruct(image.shape, image.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM(u.shape, u.dtype),
            pltpu.VMEM((3, u_m + mk - 1, u_n + mk - 1), u.dtype),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(u, image, psf, sf, lam)
    return u_new, psf_new, err


def inner_loop_pallas(
    u, image, psf, *, step_factor, lambd, blind, correlation, interpret=None
):
    """(H, W, C)-layout wrapper: runs the 5-step inner loop in one kernel.

    Returns (u', psf', error) matching the XLA inner `lax.scan` of
    ics_tpu.models.rl_mm exactly (float32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    u_pl = jnp.moveaxis(u, -1, 0)
    img_pl = jnp.moveaxis(image, -1, 0)
    psf_pl = jnp.moveaxis(psf, -1, 0)
    u2, psf2, err = _inner_loop(
        u_pl,
        img_pl,
        psf_pl,
        step_factor,
        lambd,
        blind=bool(blind),
        correlation=bool(correlation),
        interpret=bool(interpret),
    )
    return (
        jnp.moveaxis(u2, 0, -1),
        jnp.moveaxis(psf2, 0, -1),
        jnp.moveaxis(err, 0, -1),
    )
