"""TV-PAM: blind / non-blind deconvolution by Projected Alternating
Minimization (Perrone & Favaro, "Total Variation Blind Deconvolution: The
Devil is in the Details", CVPR 2014).

The reference README lists three solvers — TV-PAM, TV-PD, TV-MM (ref
README.md:42-44) — but only TV-MM survives in the checked-in tree
(SURVEY.md §2.4); PAM and PD are rebuilt here from the cited papers.

PAM minimizes  E(u, k) = ½‖k∗u − f‖² + λ_tv · TV(u)  by alternating
projected gradient steps:

  u ← u − ε_u · [ kᵀ∗(k∗u − f) − λ_tv · div(∇u/|∇u|_ε) ]
  k ← Π_Δ[ k − ε_k · u⋆(k∗u − f) ]          (blind only)

where Π_Δ projects onto the simplex {k ≥ 0, Σk = 1} (the reference's
``normalize_kernel`` clamp-and-rescale, ref lib/deconvolution.pyx:47-70, is
exactly this projection style).  Like the MM solver, the entire solve is one
jitted XLA program: a fixed inner ``lax.scan`` inside a ``lax.while_loop``
carrying the residual-whiteness stopping metric (Almeida & Figueiredo, same
criterion as ref lib/deconvolution.pyx:620-654).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax

from ics_tpu.models.rl_mm import RLResult
from ics_tpu.ops.conv import convolve_rgb, fft_autocorrelate_same
from ics_tpu.ops.psf import normalize_kernel, rotate_180
from ics_tpu.ops.reductions import whiteness_weights
from ics_tpu.ops.tv import tv_op_auto

__all__ = ["richardson_lucy_PAM", "PAMConfig"]

_INNER_ITER = 5


@dataclasses.dataclass(frozen=True)
class PAMConfig:
    lambda_tv: float = 2e-3  # TV weight (paper's λ; decoupled from the MM λ)
    epsilon: float = 1e-3  # TV ε-regularization
    conv_method: str = "auto"


@functools.partial(
    jax.jit,
    static_argnames=(
        "top",
        "bottom",
        "left",
        "right",
        "iterations",
        "blind",
        "correlation",
        "conv_method",
        "use_stopping",
    ),
)
def _solve_pam(
    image,
    u,
    psf,
    weights,
    *,
    top,
    bottom,
    left,
    right,
    tau,
    step_factor,
    lambda_tv,
    epsilon,
    iterations,
    blind,
    correlation,
    conv_method,
    use_stopping=True,
):
    m, n, _ = image.shape
    u_m, u_n, _ = u.shape
    mk = psf.shape[0]
    pad = (u_m - m) // 2
    conv = functools.partial(convolve_rgb, method=conv_method)
    f32 = jnp.float32

    def inner_step(carry, _):
        u, psf, psf_rot, error = carry

        # data-term gradient: kT * (k*u - f), full-support
        synth = conv(u, psf, mode="valid")
        error = synth - image
        grad_data = conv(error, psf_rot, mode="full")

        # TV gradient: -div(grad u / |grad u|_eps); tv_op's div is the
        # (normalized) negative divergence of the 2nd-order stencil, and
        # dividing by the e-regularized magnitude gives the curvature term.
        tv_mag, tv_div = tv_op_auto(u, epsilon, order=2, norm=2)
        grad_tv = jnp.where(tv_mag > 0.0, tv_div / tv_mag, 0.0)

        gradu = grad_data + lambda_tv * grad_tv

        # normalized step like the MM solver's adaptive dt (per channel)
        dt = (
            step_factor
            * (jnp.max(u, axis=(0, 1)) + 1.0 / (u_m * u_n))
            / (jnp.max(jnp.abs(gradu), axis=(0, 1)) + 1e-15)
        )
        u = u - dt * gradu

        if blind:
            error = conv(u, psf, mode="valid") - image
            u_rot = rotate_180(u)
            gradk = conv(u_rot, error, mode="valid")
            dtpsf = (
                step_factor
                / mk
                * (jnp.max(psf) + 1.0 / (u_m * u_n * 3))
                / (jnp.max(jnp.abs(gradk)) + 1e-15)
            )
            psf = psf - dtpsf * gradk
            if correlation:
                psf = jnp.broadcast_to(
                    jnp.mean(psf, axis=2, keepdims=True), psf.shape
                )
            psf = normalize_kernel(psf)  # simplex projection
            psf_rot = rotate_180(psf)

        return (u, psf, psf_rot, error), None

    def outer_body(state):
        u, psf, psf_rot, error, m_r, m_r_prev, it, stop = state
        (u, psf, psf_rot, error), _ = lax.scan(
            inner_step, (u, psf, psf_rot, error), None, length=_INNER_ITER
        )
        if use_stopping:
            patch = lax.slice(error, (top, left, 0), (bottom, right, 3))
            test = (patch - jnp.mean(patch)) / jnp.std(patch)
            test = test / jnp.max(jnp.abs(test))
            ac = fft_autocorrelate_same(test)
            m_r_new = jnp.mean(ac * ac * weights[..., jnp.newaxis])
            m_r_prev_new = jnp.where(it > 0, m_r, m_r_prev)
            if blind:
                hit = m_r_new > m_r_prev_new
            else:
                hit = (m_r_new - m_r_prev_new) / (m_r_new + m_r_prev_new) > tau
            stop = jnp.logical_and(it > 1, hit)
        else:
            m_r_new, m_r_prev_new = m_r, m_r_prev
            stop = jnp.array(False)
        return (u, psf, psf_rot, error, m_r_new, m_r_prev_new, it + 1, stop)

    def outer_cond(state):
        *_, it, stop = state
        return jnp.logical_and(it < iterations, jnp.logical_not(stop))

    state = (
        u,
        psf,
        rotate_180(psf),
        jnp.zeros((m, n, 3), f32),
        jnp.array(0.0, f32),
        jnp.array(0.0, f32),
        jnp.array(0, jnp.int32),
        jnp.array(False),
    )
    u, psf, _, error, m_r, _, it, stop = lax.while_loop(
        outer_cond, outer_body, state
    )

    err_win = lax.slice(error, (top, left, 0), (bottom, right, 3))
    hu = jnp.sum(err_win**2) / ((bottom - top) * (right - left) * 3)
    u_win = lax.slice(u, (top + pad, left + pad, 0), (bottom - pad, right - pad, 3))
    varu = jnp.std(u_win) ** 2
    u_out = lax.slice(u, (pad, pad, 0), (pad + m, pad + n, 3))
    return u_out, psf, it, stop, m_r, hu, varu


def richardson_lucy_PAM(
    image,
    u,
    psf,
    top: int,
    bottom: int,
    left: int,
    right: int,
    tau: float,
    iterations: int = 200,
    step_factor: float = 1e-3,
    lambd: float = 10000.0,
    blind: bool = True,
    correlation: bool = False,
    config: PAMConfig | None = None,
) -> RLResult:
    """TV-PAM deconvolution with the MM solver's calling convention.

    ``lambd`` is accepted for signature parity with ``richardson_lucy_MM``
    but the TV weight is ``config.lambda_tv`` (the PAM energy uses the
    paper's parameterization).
    """
    del lambd
    cfg = config or PAMConfig()
    image = jnp.asarray(image, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    psf = jnp.asarray(psf, jnp.float32)
    weights = jnp.asarray(whiteness_weights(bottom - top, right - left))
    u_out, psf_out, it, stop, m_r, hu, varu = _solve_pam(
        image,
        u,
        psf,
        weights,
        top=int(top),
        bottom=int(bottom),
        left=int(left),
        right=int(right),
        tau=float(tau),
        step_factor=float(step_factor),
        lambda_tv=float(cfg.lambda_tv),
        epsilon=float(cfg.epsilon),
        iterations=int(iterations),
        blind=bool(blind),
        correlation=bool(correlation),
        conv_method=cfg.conv_method,
    )
    stats = jnp.stack(
        [
            jnp.asarray(it, jnp.float32),
            jnp.asarray(stop, jnp.float32),
            jnp.asarray(m_r, jnp.float32),
            jnp.asarray(hu, jnp.float32),
            jnp.asarray(varu, jnp.float32),
        ]
    )
    return RLResult(u=u_out, psf=psf_out, image=image, stats=stats)
