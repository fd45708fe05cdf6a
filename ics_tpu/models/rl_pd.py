"""TV-PD: deconvolution by the Chambolle-Pock primal-dual algorithm.

Third solver family of the reference's README (TV-PD, "work in progress" —
ref README.md:42-44; absent from the checked-in tree, SURVEY.md §2.4),
rebuilt from the cited primal-dual literature (ref lib/deconvolution.pyx:366
cites the ROF/TV-L1 primal-dual note).

Solves  min_u ½‖k∗u − f‖² + λ·‖∇u‖₁  with the gradient operator dualized:

  y   ← Π_{‖·‖∞≤λ} ( y + σ ∇ū )                     (dual ascent + projection)
  u   ← (|K̂|² + 1/τ)⁻¹ F⁻¹[ conj(K̂)·F(f) + F(u − τ ∇ᵀy)/τ ]   (data prox, FFT)
  ū  ← 2u − u_prev                                   (extrapolation)

The data-term prox inverts the convolution exactly in the Fourier domain
(circular boundary; ``_edgetaper`` blends the borders toward the
circularly-blurred image first — MATLAB ``edgetaper``'s construction —
so the wrap seam no longer drives the solve; the caller's edge pad, ref
deconvolve.py:24-37, remains as the outer free-boundary trick).  Blind
mode alternates a PSF gradient step with
simplex projection, as in TV-PAM.  Everything is one jitted XLA program:
FFTs, the dual update, and the whiteness stop all live in the
``lax.while_loop`` body on-chip.
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

__all__ = ["richardson_lucy_PD", "PDConfig"]

_INNER_ITER = 5


@dataclasses.dataclass(frozen=True)
class PDConfig:
    """Chambolle-Pock parameters.  Defaults are the measured winner of
    the r4 (λ_tv × step) grid, re-confirmed by the r5 grid re-run WITH
    the edgetaper (8 configs, golden blind-deblur protocol,
    tests/test_golden.py::test_pam_pd_quality_bars): SSIM 0.9033 /
    PSNR 36.12; the grid plateaus at 0.8986-0.9033 so (1e-4, 0.05)
    stays on top.  Any σ·τ·8 ≤ 1 converges (L² = 8 for the gradient
    operator); the small equal steps trade per-iteration progress for a
    stabler whiteness-stop trajectory.

    ``edgetaper`` (default on, r5) blends the borders toward the
    circularly-blurred image before the Fourier data prox
    (``_edgetaper``); it lifted PD from 0.8978 / **34.01** (PSNR below
    the 35.24 blurred input — the r4-documented regression, caused by
    the wrap seam aliasing through the circular prox) to 0.9033 /
    **36.12**, above the input on both metrics.  Remaining
    characterized limitation: the exact prox still amplifies the JPEG
    input's compression noise, which caps the grid at ~0.903 SSIM (the
    r4-VERDICT 0.91 stretch bar is a measured negative result)."""

    lambda_tv: float = 1e-4  # TV weight
    sigma: float = 0.05  # dual step
    tau: float = 0.05  # primal step
    theta: float = 1.0  # extrapolation
    edgetaper: bool = True  # taper borders toward k∗f before the FFT prox


def _grad(u):
    """Forward differences with periodic wrap: (dy, dx), each like u."""
    dy = jnp.roll(u, -1, axis=0) - u
    dx = jnp.roll(u, -1, axis=1) - u
    return dy, dx


def _div(py, px):
    """Adjoint: -grad^T. div at (i,j) = py[i]-py[i-1] + px[j]-px[j-1]."""
    return (py - jnp.roll(py, 1, axis=0)) + (px - jnp.roll(px, 1, axis=1))


def _edgetaper(image, psf, otf):
    """Blur-weighted boundary blend ahead of the circular Fourier prox.

    The data prox inverts a CIRCULAR forward model, so the jump between
    the image's opposite borders aliases into ringing that a plain edge
    pad only pushes outward (this module's r4 caveat; VERDICT r4 item 8).
    The classic fix (MATLAB ``edgetaper``; Kundur & Hatzinakos' survey):
    blend the observed image toward its own circular blur within a
    PSF-support-wide band at each border,

        J = α · f + (1 − α) · (k ∗_circ f),

    where α is the separable window built from each axis' normalized PSF
    projection autocorrelation — exactly 1 beyond the PSF support, so the
    interior is untouched and only the wrap seam sees the blurred blend.
    The tapered J is both the data term's f̂ and the residual target: the
    model mismatch at the seam (where k∗u CANNOT match a discontinuous f)
    no longer drives the solve.
    """
    m, n, _ = image.shape

    def axis_alpha(size, proj):
        # periodic autocorrelation of the projection at length size-1
        # (MATLAB's construction), normalized; 1 − it is ≈0 at the border
        # pixel and exactly 1 outside the 2·mk−1 support
        z = jnp.fft.irfft(
            jnp.abs(jnp.fft.rfft(proj, size - 1)) ** 2, size - 1
        )
        z = jnp.concatenate([z, z[:1]])
        return 1.0 - z / jnp.max(z)

    psf2 = jnp.mean(psf, axis=-1)
    alpha = (
        axis_alpha(m, jnp.sum(psf2, axis=1))[:, None]
        * axis_alpha(n, jnp.sum(psf2, axis=0))[None, :]
    )[..., None]
    blurred = jnp.fft.irfft2(
        otf * jnp.fft.rfft2(image, axes=(0, 1)), s=(m, n), axes=(0, 1)
    ).astype(image.dtype)
    return alpha * image + (1.0 - alpha) * blurred


def _psf_otf(psf, m, n):
    """rfft2 of the PSF zero-padded to (m, n) with its center at (0, 0).

    The center tap is ``(mk-1)//2`` — the same scipy 'same'-mode centering
    convention as the spatial backends (ops/conv.py::_pads) and the MM/PAM
    solvers, so an even-sized PSF does not shift the forward model by one
    pixel relative to them (odd sizes are unaffected)."""
    mk = psf.shape[0]
    c = (mk - 1) // 2
    p = jnp.zeros((m, n, psf.shape[-1]), psf.dtype)
    p = lax.dynamic_update_slice(p, psf, (0, 0, 0))
    p = jnp.roll(p, shift=(-c, -c), axis=(0, 1))
    return jnp.fft.rfft2(p, axes=(0, 1))


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
        "use_stopping",
        "edgetaper",
    ),
)
def _solve_pd(
    image,
    u0,
    psf,
    weights,
    *,
    top,
    bottom,
    left,
    right,
    tau_stop,
    step_factor,
    lambda_tv,
    sigma,
    tau,
    theta,
    iterations,
    blind,
    correlation,
    use_stopping=True,
    edgetaper=True,
):
    m, n, _ = image.shape
    mk = psf.shape[0]
    f32 = jnp.float32
    otf0 = _psf_otf(psf, m, n)
    if edgetaper:
        # taper with the INITIAL psf (blind mode refines it later, but the
        # taper only needs the support width to kill the wrap seam)
        image = _edgetaper(image, psf, otf0)
    f_hat = jnp.fft.rfft2(image, axes=(0, 1))

    def data_prox(v, otf):
        """argmin_w  1/2||k*w - f||^2 + ||w - v||^2 / (2 tau), via FFT."""
        v_hat = jnp.fft.rfft2(v, axes=(0, 1))
        num = jnp.conj(otf) * f_hat + v_hat / tau
        den = jnp.abs(otf) ** 2 + 1.0 / tau
        return jnp.fft.irfft2(num / den, s=(m, n), axes=(0, 1)).astype(f32)

    def residual(u, otf):
        """Circular-model residual k∗u − f (matches the data term)."""
        u_hat = jnp.fft.rfft2(u, axes=(0, 1))
        synth = jnp.fft.irfft2(otf * u_hat, s=(m, n), axes=(0, 1)).astype(f32)
        return synth - image

    def inner_step(carry, _):
        u, u_bar, py, px, psf, otf, error = carry

        # dual ascent on the gradient + projection onto the lambda ball
        gy, gx = _grad(u_bar)
        py = py + sigma * gy
        px = px + sigma * gx
        mag = jnp.maximum(1.0, jnp.sqrt(py**2 + px**2) / lambda_tv)
        py = py / mag
        px = px / mag

        # primal descent + exact data prox in Fourier domain
        u_prev = u
        v = u + tau * _div(py, px)
        u = data_prox(v, otf)
        u_bar = u + theta * (u - u_prev)

        if blind:
            # dE/dk = u ⋆ (k∗u − f): correlate u with the circular residual.
            # u is WRAP-padded so the gradient is the true adjoint of the
            # circular forward model (a zero pad would inject a seam-driven
            # bias into every border tap).
            error = residual(u, otf)
            u_rot = rotate_180(
                jnp.pad(
                    u,
                    ((mk // 2, mk // 2), (mk // 2, mk // 2), (0, 0)),
                    mode="wrap",
                )
            )
            gradk = convolve_rgb(u_rot, error, mode="valid")
            dtpsf = (
                step_factor
                / mk
                * (jnp.max(psf) + 1.0 / (m * n * 3))
                / (jnp.max(jnp.abs(gradk)) + 1e-15)
            )
            psf = psf - dtpsf * gradk
            if correlation:
                psf = jnp.broadcast_to(
                    jnp.mean(psf, axis=2, keepdims=True), psf.shape
                )
            psf = normalize_kernel(psf)
            otf = _psf_otf(psf, m, n)

        return (u, u_bar, py, px, psf, otf, error), None

    def outer_body(state):
        u, u_bar, py, px, psf, otf, error, m_r, m_r_prev, it, stop = state
        (u, u_bar, py, px, psf, otf, error), _ = lax.scan(
            inner_step, (u, u_bar, py, px, psf, otf, error), None, length=_INNER_ITER
        )
        if not blind:
            # only the post-scan residual is ever consumed (whiteness patch
            # + final Hu) — computing it per inner step would double the
            # solve's FFT count for nothing
            error = residual(u, otf)
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
                hit = (m_r_new - m_r_prev_new) / (m_r_new + m_r_prev_new) > tau_stop
            stop = jnp.logical_and(it > 1, hit)
        else:
            m_r_new, m_r_prev_new = m_r, m_r_prev
            stop = jnp.array(False)
        return (u, u_bar, py, px, psf, otf, error, m_r_new, m_r_prev_new, it + 1, stop)

    def outer_cond(state):
        *_, it, stop = state
        return jnp.logical_and(it < iterations, jnp.logical_not(stop))

    zeros = jnp.zeros_like(u0)
    state = (
        u0,
        u0,
        zeros,
        zeros,
        psf,
        otf0,
        jnp.zeros((m, n, 3), f32),
        jnp.array(0.0, f32),
        jnp.array(0.0, f32),
        jnp.array(0, jnp.int32),
        jnp.array(False),
    )
    u, _, _, _, psf, _, error, m_r, _, it, stop = lax.while_loop(
        outer_cond, outer_body, state
    )

    err_win = lax.slice(error, (top, left, 0), (bottom, right, 3))
    hu = jnp.sum(err_win**2) / ((bottom - top) * (right - left) * 3)
    # same inset-window convention as the reference / MM / PAM
    # (ref lib/deconvolution.pyx:600: u[top+pad : bottom-pad, ...])
    pad = mk // 2
    u_win = lax.slice(
        u, (top + pad, left + pad, 0), (bottom - pad, right - pad, 3)
    )
    varu = jnp.std(u_win) ** 2
    return u, psf, it, stop, m_r, hu, varu


def richardson_lucy_PD(
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
    config: PDConfig | None = None,
) -> RLResult:
    """TV-PD deconvolution.  ``u`` may be image-sized or padded like the MM
    solver's (the pad is cropped away — PD works at image size with a
    circular model)."""
    del lambd
    cfg = config or PDConfig()
    image = jnp.asarray(image, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    psf = jnp.asarray(psf, jnp.float32)
    m, n, _ = image.shape
    if u.shape[0] != m:
        pad = (u.shape[0] - m) // 2
        u = u[pad : pad + m, pad : pad + n]
    weights = jnp.asarray(whiteness_weights(bottom - top, right - left))
    u_out, psf_out, it, stop, m_r, hu, varu = _solve_pd(
        image,
        u,
        psf,
        weights,
        top=int(top),
        bottom=int(bottom),
        left=int(left),
        right=int(right),
        tau_stop=float(tau),
        step_factor=float(step_factor),
        lambda_tv=float(cfg.lambda_tv),
        sigma=float(cfg.sigma),
        tau=float(cfg.tau),
        theta=float(cfg.theta),
        iterations=int(iterations),
        blind=bool(blind),
        correlation=bool(correlation),
        edgetaper=bool(cfg.edgetaper),
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
