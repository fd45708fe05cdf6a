"""Blind / non-blind Richardson-Lucy deconvolution with TV regularization,
Minimization-Maximization scheme (Perrone & Favaro).

Behavioral parity target: reference lib/deconvolution.pyx:341-675
(``richardson_lucy_MM``).  The reference runs an outer majorization loop
(stopping on the Almeida & Figueiredo residual-whiteness criterion) around an
inner 5-step minimization loop of: FFT convolve → residual → correlate → TV →
depth-of-field mask → regularized gradient step → DoF blend → blind PSF
refinement.  Here the **entire** solve — both loops, every convolution,
stencil and reduction — is one jitted XLA program: a ``lax.scan`` (inner, 5
fixed steps) inside a ``lax.while_loop`` (outer, data-dependent stop), so the
whole gradient descent stays on-chip with zero host round-trips.

Two math modes:

* ``use_tv=False`` (default) — *as-checked-in* behavior.  The reference
  computes ``TV(ut, ...)`` into buffers that are never written (the calls are
  commented out at lib/deconvolution.pyx:464-465), so its regularization
  branch collapses to ``gradu = λ·gradu + (u - ut)/2`` and the "denoise
  image" step is a no-op.  We replicate that dataflow exactly (and skip the
  dead TV stencils — a pure win).
* ``use_tv=True`` — the *intended* full MM update with live TV(ut) terms
  (the dead branch at lib/deconvolution.pyx:516-517 and 542-543), for better
  quality at a small extra cost.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ics_tpu.ops.conv import convolve_rgb, fft_autocorrelate_same
from ics_tpu.ops.pallas_correlate import psf_gradient
from ics_tpu.ops.pallas_solver import fits_vmem, inner_loop_pallas
from ics_tpu.ops.psf import normalize_kernel, rotate_180
from ics_tpu.ops.reductions import whiteness_weights
from ics_tpu.ops.tv import tv_op_auto

__all__ = ["richardson_lucy_MM", "RLConfig", "RLResult"]

_INNER_ITER = 5  # ref lib/deconvolution.pyx:375
_EPS_BLIND = 1e-2  # ref lib/deconvolution.pyx:435
_EPS_NONBLIND = 1e-6  # ref lib/deconvolution.pyx:437


@dataclasses.dataclass(frozen=True)
class RLConfig:
    """Solver options beyond the reference's kwarg surface."""

    use_tv: bool = False  # False = as-checked-in parity; True = intended MM math
    # TV stencil backend for use_tv mode: 'xla' = fused shifted-slice
    # stencil, 'pallas' = the VMEM band kernel (ops/pallas_tv.py, same
    # math, hardware-certified), 'auto' = the measured winner (xla: 1.79
    # vs 2.62 ms at 6.3 MP, 8.00 vs 8.45 at 24 MP on v5e — see
    # ops/tv.py::tv_op_auto).
    tv_method: str = "auto"
    # Channel coupling of the use_tv regularizer:
    #   'channel' — decoupled per-channel TV magnitudes (the literal
    #               transcription of the reference's dead branch, ref
    #               lib/deconvolution.pyx:516-517, which indexes TV buffers
    #               per channel);
    #   'collab'  — the collaborative L^{inf,1,1} RGB TV norm the reference
    #               NAMES as its central contribution (ref README.md:113-114,
    #               citing ipol.im/pub/art/2016/141): every channel's MM
    #               weight uses the per-pixel channel-SUP of the magnitude
    #               (ops/tv.py::collab_sup), handcuffing the channels
    #               together for chromatic-noise removal.  Measured on the
    #               chroma-noise fixture: see PERFORMANCE.md and
    #               tests/test_golden.py::test_collaborative_tv_chroma;
    #   'collab_l2' — the ℓ²-color coupling from the same collaborative
    #               family (Duran et al.'s ℓ^{2,1,1} class; Blomgren &
    #               Chan's color TV): channels normalized by the RMS of
    #               the three magnitudes — a softer handcuff than the sup
    #               (ops/tv.py::collab_l2), sitting between 'channel' and
    #               'collab' on chromatic outliers.
    # The epsilon in the magnitude is the scale parameter of the Cauchy
    # distribution the sharp-image prior assumes for the gradients (ref
    # README.md:99-103; lib/deconvolution.pyx:430 annotates epsilon as
    # exactly that): the MM majorizer of the Cauchy log-prior
    # log(eps + |grad u|) is the reweighted quadratic whose gradient is
    # div/(TV(u)*TV(ut)) — the use_tv step-5 term — so the Cauchy prior IS
    # the 1/TV(ut) reweighting with epsilon as its heavy-tail scale.
    tv_norm: str = "channel"
    conv_method: str = "auto"  # 'direct' | 'fft' | 'auto'
    # 'exact': float32 convs (lax.Precision.HIGHEST, 6 bf16 MXU passes) for
    # reference parity.  'high': f32 convs through the bf16x3 hi/lo-split
    # MXU kernel (3 single-pass matmuls, ~7e-6 rel err, selftest-certified
    # on hardware; measured 12.0 vs 16.2 ms per 9x9 24 MP conv = 1.34x) —
    # NOT bit-parity, so the whiteness-stop trajectory can differ from
    # 'exact' (see docs/PERFORMANCE.md "Measurement discipline"); opt-in.
    # 'fast': single-pass bf16 MXU convs — ~3-6x the conv throughput at a
    # ~4e-3 accuracy cost; validate SSIM for your use.
    conv_precision: str = "exact"
    # Compute dtype of the inner loop:
    #   'float32'  — reference parity (the default);
    #   'mixed'    — convolutions and residuals in bfloat16 (where the 2x
    #                VPU/HBM win is), but the iterate u, its update, the
    #                regularization difference (u - ut) and every reduction
    #                in float32, so sub-ulp updates don't wash out.  Meets
    #                the 0.999-SSIM bar at mask/crop scales (tested).
    #                The r2 large-frame NaN and the r4-diagnosed DoF
    #                amplifier (bf16-quantized gradu breaking the
    #                epsilon-free DoF division's f32 assumptions on long
    #                full-res solves) are closed by dof_guard, which
    #                defaults ON for this mode.
    #                FULL-RESOLUTION CAVEAT (re-measured r4, with the
    #                guard's clamp): the bf16 convs re-roll the chaotic
    #                whiteness-stop trajectory, landing a different
    #                converged iterate — on the synthetic 24 MP
    #                ground-truth pair, SSIM 0.9430/PSNR 34.48 vs truth
    #                against f32's 0.9564/35.97 (SSIM 0.9943 vs the f32
    #                output).  Prefer 'float32' for parity-grade quality
    #                work; mixed is the throughput/preview mode;
    #   'bfloat16' — everything in bf16 (fastest; SSIM ~0.990 — opt-in for
    #                throughput-first work).
    # The whiteness metric, step scalars and outputs stay float32 in every
    # mode.
    dtype: str = "float32"
    # Blind PSF-gradient path: 'pallas' = fused shifted-dot kernel (fastest
    # on TPU; exact f32), 'conv' = generic convolution (portable; what the
    # sharded/batched wrappers use), 'auto' = pallas on TPU else conv.
    psf_grad: str = "auto"
    # Inner-loop execution: 'pallas' = the whole 5-step minimization loop as
    # one VMEM-resident kernel (ops/pallas_solver.py; fori_loop + rolling-
    # window structure, compiles in seconds, exact vs XLA on real images,
    # ~16% faster per outer iteration at mask sizes on v5e), 'xla' =
    # lax.scan of XLA ops (the general path), 'pallas_unrolled' = the
    # statically-unrolled kernel body (same op order, no fori/roll
    # overheads; certified by bench.py --selftest).  'auto' = pallas on TPU
    # when the window fits VMEM and dtype is float32, else xla;
    # ICS_TPU_SOLVER_UNROLL=1 upgrades auto/pallas to the unrolled body.
    inner_loop: str = "auto"
    # Record per-outer-iteration metrics (M_r, Hu, varu) on-device and
    # return them in RLResult.trajectory — the structured replacement for
    # the reference's in-loop diagnostic prints (ref lib/deconvolution.pyx:
    # 593, 618, 658-669).
    record_metrics: bool = False
    # Guard on the depth-of-field term.  The reference computes
    # dof = ((gradu - image) / (gradu + image))**2 with NO epsilon (ref
    # lib/deconvolution.pyx:499-502) and blends u <- (1-dof)*u + dof*image
    # (ref :552) — a convex mix only for dof in [0,1].  In float32 on real
    # images the denominator neither lands on exact zero nor gets small
    # enough to push dof past 1, but bf16-quantized gradu breaks both
    # assumptions on long solves: an EXACT zero floods the frame with NaN
    # (measured on the 24 MP bench frame in r2), and a NEAR zero turns the
    # blend into an amplifier that seeds locally blown-out patches
    # (measured r4: a ~20 px max-brightness blob from a mixed coarse
    # pyramid level).  The guard closes both with the same semantics —
    # "deblurring is untrustworthy here, keep the observed pixel": dof = 1
    # exactly where gradu + image == 0, and dof capped at 1 (the pure-
    # observed-pixel limit) everywhere else.  Bit-identical on every pixel
    # where the reference's f32 assumptions hold (dof <= 1; tested).
    # None = auto: ON for 'mixed'/'bfloat16', OFF for 'float32' (strict
    # parity).  A documented deviation from the reference's epsilon-free
    # math, active only where its float32 assumptions don't hold.
    dof_guard: bool | None = None
    # Opt-in whiteness-plateau early stop for NON-BLIND solves (OFF =
    # strict reference parity).  With early_stop = r > 0, a non-blind
    # solve additionally stops once M_r has failed to improve by a
    # CUMULATIVE relative r over early_stop_patience consecutive outer
    # iterations — "no further whitening is happening", a deviation from
    # the reference's stopping rule (ref lib/deconvolution.pyx:643-654),
    # quality-gated by tests/test_golden.py::test_deblur_early_stop_quality.
    # Scope honestly characterized (r3 measurements): blind solves are
    # deliberately NOT covered — their M_r is nearly flat while the PSF
    # still improves, and cutting them costs ~0.03 SSIM — and on the
    # bench workloads the non-blind levels converge through the parity
    # rule before plateauing, so this fires only on genuinely stalled
    # solves (e.g. tau too strict / noisy inputs).
    early_stop: float = 0.0
    early_stop_patience: int = 10
    # Vestigial reference kwargs, accepted for API parity and documented as
    # unused downstream (SURVEY.md §5 "Config"): p, norm, order are forwarded
    # but hardcoded at the TV call sites (ref lib/deconvolution.pyx:495-496);
    # priority -> alpha/beta computed then never used (ref :446-454); refocus
    # accepted and unused.
    p: float = 1.0
    norm: int = 1
    order: int = 2
    priority: float = 0.0
    refocus: bool = False


@dataclasses.dataclass
class RLResult:
    """Solver result.  Scalar statistics live in ONE packed device array and
    are fetched lazily on first access — every host<->device round trip costs
    tens of milliseconds over a TPU tunnel, and the pipeline only needs the
    image/PSF device arrays between pyramid levels."""

    u: jax.Array  # deconvolved image, cropped to (M, N, 3)
    psf: jax.Array  # (refined, if blind) PSF
    image: jax.Array  # the (possibly TV-denoised, if use_tv) observed image
    stats: jax.Array  # device array [iterations, converged, M_r, Hu, varu]
    # Full solver window (M+2*pad, N+2*pad, 3) including the halo ring.  The
    # reference mutates its caller's array through a view, so the blind
    # phase's write-back covers the WHOLE window (ref deconvolve.py:277-288
    # passing a slice of deblured_image into the in-place solver) — pipeline
    # parity needs this, not just the cropped core.
    u_full: jax.Array | None = None
    # per-outer-iteration (M_r, Hu, varu), length = iterations actually run;
    # populated when RLConfig.record_metrics is set (fetches stats)
    trajectory: dict | None = None
    _stats_host: "np.ndarray | None" = dataclasses.field(
        default=None, repr=False, compare=False
    )

    def _fetch(self) -> np.ndarray:
        if self._stats_host is None:
            self._stats_host = np.asarray(self.stats)
        return self._stats_host

    @property
    def iterations(self) -> int:  # outer iterations actually run
        return int(self._fetch()[0])

    @property
    def converged(self) -> bool:  # whiteness stopping criterion met
        return bool(self._fetch()[1])

    @property
    def M_r(self) -> float:  # final residual-whiteness metric
        return float(self._fetch()[2])

    @property
    def Hu(self) -> float:  # final residual energy over the mask window
        return float(self._fetch()[3])

    @property
    def varu(self) -> float:  # final variance of u over the mask window
        return float(self._fetch()[4])


def _per_channel_max(a: jax.Array) -> jax.Array:
    return jnp.max(a, axis=(0, 1))


def _per_channel_amaxabs(a: jax.Array) -> jax.Array:
    return jnp.max(jnp.abs(a), axis=(0, 1))


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
        "use_tv",
        "tv_method",
        "tv_norm",
        "conv_method",
        "conv_precision",
        "psf_grad",
        "inner_loop",
        "dtype",
        "dof_guard",
        "early_stop",
        "early_stop_patience",
        "use_stopping",
        "record",
    ),
)
def _solve(
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
    lambd,
    iterations,
    blind,
    correlation,
    use_tv,
    tv_method="auto",
    tv_norm="channel",
    conv_method="auto",
    conv_precision="exact",
    psf_grad="auto",
    inner_loop="auto",
    dtype="float32",
    dof_guard=None,
    early_stop=0.0,
    early_stop_patience=10,
    use_stopping=True,
    record=False,
):
    m, n, _ = image.shape
    u_m, u_n, _ = u.shape
    mk = psf.shape[0]
    pad = (u_m - m) // 2
    epsilon = _EPS_BLIND if blind else _EPS_NONBLIND
    if conv_precision not in ("exact", "high", "fast"):
        raise ValueError(
            f"unknown conv_precision {conv_precision!r} "
            "(use 'exact', 'high' or 'fast')"
        )
    prec = {
        "exact": lax.Precision.HIGHEST,
        "high": "bf16x3",
        "fast": lax.Precision.DEFAULT,
    }[conv_precision]
    conv = functools.partial(convolve_rgb, method=conv_method, precision=prec)
    if tv_norm not in ("channel", "collab", "collab_l2"):
        raise ValueError(
            f"unknown tv_norm {tv_norm!r} (use 'channel', 'collab' or"
            " 'collab_l2')"
        )
    tvf = functools.partial(
        tv_op_auto,
        method=tv_method,
        collab={"channel": False, "collab": "sup", "collab_l2": "l2"}[tv_norm],
    )
    if psf_grad == "auto":
        psf_grad_method = "pallas" if jax.default_backend() == "tpu" else "conv"
    else:
        psf_grad_method = psf_grad
    if inner_loop == "auto":
        # see RLConfig.inner_loop; interpret-mode pallas off the TPU is
        # orders of magnitude slower, so auto only opts in on real hardware
        inner_loop_method = (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        )
    else:
        inner_loop_method = inner_loop
    if inner_loop_method in ("pallas", "pallas_unrolled") and (
        use_tv or not fits_vmem(u_m, u_n)
    ):
        inner_loop_method = "xla"
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    # Mixed precision applies to NON-BLIND solves (the full-frame cost
    # center).  The residual is carried in f32 and updated INCREMENTALLY:
    # error += conv(delta_u) in bf16 — conv is linear, the increment is
    # small so its bf16 representation keeps full relative accuracy, and a
    # per-outer f32 refresh bounds drift.  Computing conv(u) - image in
    # bf16 directly is catastrophic cancellation once the solve converges
    # (synth ~ image to within a bf16 ulp), measured at SSIM ~0.90.  Blind
    # solves run on small mask windows where f32 is already cheap.
    mixed = dtype == "mixed" and not blind
    compute_dtype = bf16 if dtype == "bfloat16" else f32
    # DoF zero-denominator guard (RLConfig.dof_guard): auto = only in the
    # reduced-precision modes, where exact-zero (gradu + image) actually
    # occurs; float32 stays strict reference parity.
    guard = dof_guard if dof_guard is not None else (mixed or compute_dtype != f32)
    if guard and inner_loop_method in ("pallas", "pallas_unrolled"):
        # the VMEM inner-loop kernel hardcodes the parity (unguarded) DoF
        inner_loop_method = "xla"
    if compute_dtype != f32 or mixed:
        inner_loop_method = "xla"  # the VMEM kernel is f32-only
        psf_grad_method = "conv"  # the DMA kernel's (8,128) alignment is f32

    def _lo(a):
        """Cast to the convolution dtype in mixed mode (fuses into the
        conv's operand pad/read — no extra HBM pass)."""
        return a.astype(bf16) if mixed else a

    def _hi(a):
        """Cast back to f32 for the update/reduction path in mixed mode."""
        return a.astype(f32) if mixed else a

    def inner_step(carry, _):
        u, image, psf, psf_rot, error, ut, tv_ut_l1, tv_ut_l2, delta = carry
        u_start = u

        # 1. the residual (ref :477-488).  Mixed mode: error(u_k) =
        # error(u_{k-1}) + conv(u_k - u_{k-1}) by linearity — the bf16 conv
        # of the small increment accumulates into the f32 carry.
        if mixed:
            error = error + _hi(conv(_lo(delta), _lo(psf), mode="valid"))
        else:
            synth = conv(u, psf, mode="valid")
            error = synth - image

        # 2. correlate residual with the PSF (ref :490-491)
        gradu = _hi(conv(_lo(error), _lo(psf_rot), mode="full"))

        # 3. TV stencils (order=2 hardcoded at the call sites, ref :495-496).
        # In parity mode TV(ut) is all-zero so these results are dead: skip.
        if use_tv:
            tv_u_l1, _ = tvf(u, epsilon, order=2, norm=1)
            tv_u_l2, div = tvf(u, epsilon, order=2, norm=2)

        # 4. depth-of-field mask from the *raw* correlation (ref :499-502)
        gradu_crop = lax.slice(gradu, (pad, pad, 0), (pad + m, pad + n, 3))
        if guard:
            # zero-denominator guard (see RLConfig.dof_guard): dof = 1
            # exactly where gradu + image == 0 (keep the observed pixel),
            # bit-identical everywhere else
            den = gradu_crop + image
            zero = den == 0.0
            dof = jnp.where(
                zero,
                1.0,
                ((gradu_crop - image) / jnp.where(zero, 1.0, den)) ** 2,
            )
        else:
            dof = ((gradu_crop - image) / (gradu_crop + image)) ** 2
        if not blind:
            dof = dof / lambd
        if guard:
            # The blend u <- (1-dof)*u + dof*image is only a convex mix
            # for dof in [0,1]; a NEAR-zero denominator (bf16-quantized
            # gradu almost cancelling image) makes dof an amplifier
            # (measured: a ~20px blown-out blob seeded by a coarse mixed
            # level).  dof > 1 means "no confidence in the deblurred
            # value", whose meaningful limit is keeping the observed
            # pixel — the same semantics as the exact-zero guard — so
            # clamp.  Bit-identical wherever dof <= 1, i.e. everywhere
            # the reference's own f32 assumptions hold.
            dof = jnp.minimum(dof, 1.0)

        # 5. regularization step (ref :508-519)
        if use_tv:
            live = (tv_ut_l1 != 0.0) & (tv_u_l1 != 0.0)
            full_term = (
                div / tv_u_l1 / tv_ut_l1 / 2.0
                + div / tv_u_l2 / tv_ut_l2 / 2.0
                + lambd * gradu
                + (u - ut) / 4.0
            )
            dead_term = lambd * gradu + (u - ut) / 2.0
            gradu = jnp.where(live, full_term, dead_term)
        else:
            gradu = lambd * gradu + (u - ut) / 2.0

        # 6. per-channel adaptive step and update (ref :522-531)
        dt = (
            step_factor
            * (_per_channel_max(u) + 1.0 / (u_m * u_n))
            / (_per_channel_amaxabs(gradu) + 1e-15)
        )
        u = u - dt * gradu

        # 7. TV-denoise the observed image (ref :533-549).  Dead in parity
        # mode (gradu := 0 -> image unchanged).
        if use_tv:
            denoise = jnp.where(
                live,
                div / tv_u_l1 / tv_ut_l1 / 2.0 + div / tv_u_l2 / tv_ut_l2 / 2.0,
                0.0,
            )
            dt_img = (
                step_factor
                * (_per_channel_max(image) + 1.0 / (m * n))
                / (_per_channel_amaxabs(denoise) + 1e-15)
            )
            denoise_crop = lax.slice(
                denoise, (pad, pad, 0), (pad + m, pad + n, 3)
            )
            image = image - dt_img * denoise_crop / lambd

        # 8. retain the blurry image where deblurring failed (ref :552)
        u_crop = lax.slice(u, (pad, pad, 0), (pad + m, pad + n, 3))
        u = lax.dynamic_update_slice(
            u, (1.0 - dof) * u_crop + dof * image, (pad, pad, 0)
        )

        # 9. blind PSF refinement (ref :555-589)
        if blind:
            error = conv(u, psf, mode="valid") - image
            if psf_grad_method == "pallas":
                # = conv_valid(rot180(u), error), fused (no rotated copy)
                gradk = psf_gradient(u, error)
            else:
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
                psf_mean = jnp.mean(psf, axis=2, keepdims=True)
                psf = jnp.broadcast_to(psf_mean, psf.shape)
            psf = normalize_kernel(psf)
            psf_rot = rotate_180(psf)

        if mixed:
            delta = u - u_start
        return (u, image, psf, psf_rot, error, ut, tv_ut_l1, tv_ut_l2, delta), None

    def outer_body(state):
        (u, image, psf, psf_rot, error, m_r, m_r_prev, m_r_best, since_best,
         it, stop, hist) = state

        if inner_loop_method in ("pallas", "pallas_unrolled"):
            # the whole inner loop as one VMEM-resident kernel (parity mode;
            # image is a no-op carry there)
            u, psf, error = inner_loop_pallas(
                u, image, psf,
                step_factor=step_factor, lambd=lambd,
                blind=blind, correlation=correlation,
                unroll=(inner_loop_method == "pallas_unrolled"),
            )
        else:
            ut = u
            if use_tv:
                tv_ut_l1, _ = tvf(ut, epsilon, order=2, norm=1)
                tv_ut_l2, _ = tvf(ut, epsilon, order=2, norm=2)
            else:
                # all-zero TV(ut): the as-checked-in state (ref :464-465)
                tv_ut_l1 = tv_ut_l2 = jnp.zeros((1, 1, 1), dtype=f32)

            if mixed:
                # per-outer f32 refresh bounds the incremental drift and
                # seeds the first inner iteration (delta = 0)
                error = conv(u, psf, mode="valid") - image
                delta = jnp.zeros_like(u)
            else:
                delta = jnp.zeros((1, 1, 1), f32)
            carry = (u, image, psf, psf_rot, error, ut, tv_ut_l1, tv_ut_l2, delta)
            carry, _ = lax.scan(inner_step, carry, None, length=_INNER_ITER)
            u, image, psf, psf_rot, error, _, _, _, _ = carry

        # Residual-whiteness convergence metric (Almeida & Figueiredo;
        # ref :620-654).  `error` is the state at the end of the inner loop:
        # post-DoF PSF residual when blind, the step-1 residual otherwise.
        if use_stopping:
            patch = lax.slice(error, (top, left, 0), (bottom, right, 3)).astype(f32)
            test = (patch - jnp.mean(patch)) / jnp.std(patch)
            test = test / jnp.max(jnp.abs(test))
            ac = fft_autocorrelate_same(test)
            m_r_new = jnp.mean(ac * ac * weights[..., jnp.newaxis])

            m_r_prev_new = jnp.where(it > 0, m_r, m_r_prev)
            if blind:
                hit = m_r_new > m_r_prev_new  # ref :646
            else:
                # ref :652
                hit = (m_r_new - m_r_prev_new) / (m_r_new + m_r_prev_new) > tau
            stop = jnp.logical_and(it > 1, hit)
            if early_stop > 0.0 and not blind:
                # Whiteness-plateau stop (RLConfig.early_stop): stop when
                # M_r has not improved CUMULATIVELY by the relative
                # threshold over `patience` consecutive outers.  The
                # anchor m_r_best only moves when a full threshold's
                # improvement has accumulated — tracking min() every
                # iteration would let a slow monotone decrease (e.g.
                # 5e-4/outer, threshold 1e-3) run the counter out even
                # though real progress is being made.
                # NON-BLIND ONLY (measured on the golden crop): in blind
                # solves the PSF keeps improving while M_r is nearly flat
                # (3e-5 relative per outer), so an M_r plateau cuts the
                # estimation phase and costs ~0.03 SSIM end-to-end; and a
                # PSF-change criterion cannot work either because the
                # normalized step (ref :574) keeps every update the same
                # relative size.  Residual whitening IS the progress
                # signal for non-blind solves.
                improved = m_r_new < m_r_best * (1.0 - early_stop)
                m_r_best = jnp.where(improved, m_r_new, m_r_best)
                since_best = jnp.where(improved, 0, since_best + 1)
                stop = jnp.logical_or(
                    stop,
                    jnp.logical_and(
                        it > 1, since_best >= early_stop_patience
                    ),
                )
        else:
            m_r_new, m_r_prev_new = m_r, m_r_prev
            stop = jnp.array(False)

        if record:
            u_win = lax.slice(
                u, (top + pad, left + pad, 0), (bottom - pad, right - pad, 3)
            )
            err_win = lax.slice(error, (top, left, 0), (bottom, right, 3))
            hist = {
                "M_r": hist["M_r"].at[it].set(m_r_new),
                "Hu": hist["Hu"]
                .at[it]
                .set(jnp.sum(err_win**2) / ((bottom - top) * (right - left) * 3)),
                "varu": hist["varu"].at[it].set(jnp.std(u_win) ** 2),
            }

        return (
            u, image, psf, psf_rot, error, m_r_new, m_r_prev_new, m_r_best,
            since_best, it + 1, stop, hist
        )

    def outer_cond(state):
        it, stop = state[-3], state[-2]
        return jnp.logical_and(it < iterations, jnp.logical_not(stop))

    u = u.astype(compute_dtype)
    image = image.astype(compute_dtype)
    psf = psf.astype(compute_dtype)
    psf_rot0 = rotate_180(psf)  # ref :441
    error0 = jnp.zeros((m, n, 3), dtype=compute_dtype)  # mixed carries f32
    hist_len = iterations if record else 1
    hist0 = {
        "M_r": jnp.zeros((hist_len,), f32),
        "Hu": jnp.zeros((hist_len,), f32),
        "varu": jnp.zeros((hist_len,), f32),
    }
    state = (
        u,
        image,
        psf,
        psf_rot0,
        error0,
        jnp.array(0.0, f32),
        jnp.array(0.0, f32),
        jnp.array(jnp.inf, f32),  # m_r_best (early-stop tracker)
        jnp.array(0, jnp.int32),  # since_best
        jnp.array(0, jnp.int32),
        jnp.array(False),
        hist0,
    )
    (u, image, psf, _, error, m_r, _, _, _, it, stop, hist) = lax.while_loop(
        outer_cond, outer_body, state
    )

    # Final stats over the mask window (ref :600-601)
    u_win = lax.slice(
        u, (top + pad, left + pad, 0), (bottom - pad, right - pad, 3)
    ).astype(f32)
    varu = jnp.std(u_win) ** 2
    err_win = lax.slice(error, (top, left, 0), (bottom, right, 3)).astype(f32)
    hu = jnp.sum(err_win**2) / ((bottom - top) * (right - left) * 3)

    u_out = lax.slice(u, (pad, pad, 0), (pad + m, pad + n, 3)).astype(
        f32
    )  # ref :675
    stats = jnp.stack(
        [it.astype(f32), stop.astype(f32), m_r.astype(f32), hu, varu]
    )
    return u_out, u.astype(f32), psf.astype(f32), image.astype(f32), stats, hist


def richardson_lucy_MM(
    image,
    u,
    psf,
    top: int,
    bottom: int,
    left: int,
    right: int,
    tau: float,
    M: int | None = None,
    N: int | None = None,
    C: int = 3,
    MK: int | None = None,
    iterations: int = 200,
    step_factor: float = 1e-3,
    lambd: float = 10000.0,
    blind: bool = True,
    correlation: bool = False,
    p: float = 1.0,
    norm: int = 1,
    order: int = 2,
    priority: float = 0.0,
    refocus: bool = False,
    config: RLConfig | None = None,
    verbose: bool = False,
) -> RLResult:
    """Blind / non-blind RL-TV-MM deconvolution (reference-compatible API).

    Signature mirrors ref lib/deconvolution.pyx:341-342 (M, N, C, MK are
    accepted but derived from the array shapes; ``p/norm/order/priority/
    refocus`` are vestigial in the reference and documented in ``RLConfig``).
    Functional: inputs are not mutated; the refined PSF and (in ``use_tv``
    mode) denoised image come back in ``RLResult``.
    """
    cfg = config or RLConfig(
        p=p, norm=norm, order=order, priority=priority, refocus=refocus
    )
    inner_loop = cfg.inner_loop
    # The unroll A/B knob must be resolved HERE, outside the jit: _solve's
    # cache key includes inner_loop but not the environment, so an env read
    # at trace time would silently reuse whichever variant compiled first.
    if inner_loop in ("auto", "pallas") and os.environ.get(
        "ICS_TPU_SOLVER_UNROLL", "0"
    ) == "1":
        if inner_loop == "pallas" or jax.default_backend() == "tpu":
            inner_loop = "pallas_unrolled"
    image = jnp.asarray(image, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    psf = jnp.asarray(psf, jnp.float32)
    weights = jnp.asarray(whiteness_weights(bottom - top, right - left))

    u_out, u_full, psf_out, image_out, stats, hist = _solve(
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
        lambd=float(lambd),
        iterations=int(iterations),
        blind=bool(blind),
        correlation=bool(correlation),
        use_tv=cfg.use_tv,
        tv_method=cfg.tv_method,
        tv_norm=cfg.tv_norm,
        conv_method=cfg.conv_method,
        conv_precision=cfg.conv_precision,
        psf_grad=cfg.psf_grad,
        inner_loop=inner_loop,
        dtype=cfg.dtype,
        dof_guard=cfg.dof_guard,
        early_stop=cfg.early_stop,
        early_stop_patience=cfg.early_stop_patience,
        record=cfg.record_metrics,
    )
    result = RLResult(
        u=u_out, psf=psf_out, image=image_out, stats=stats, u_full=u_full
    )
    if cfg.record_metrics:
        result.trajectory = {
            k: np.asarray(v)[: result.iterations] for k, v in hist.items()
        }
    if verbose:
        print_solver_report(result, lambd, top, bottom, left, right)
    return result


def print_solver_report(
    result: RLResult, lambd: float, top: int, bottom: int, left: int, right: int
) -> None:
    """The reference's end-of-solve diagnostics (ref lib/deconvolution.pyx:
    661-672): convergence verdict, stats line, NaN warning.  Shared by the
    single-device and sharded solver entry points."""
    if result.converged:
        print("Convergence after %i iterations." % result.iterations)
    else:
        print(
            "Did not converge after %i iterations. Don't use the result."
            % result.iterations
        )
    print(
        "Stats : autocovariance = %.6f | lamdba = %.0f | residual = %.6f | variance/noise = %.6f"
        % (
            1000 * result.M_r / ((bottom - top) * (right - left) * 3),
            lambd,
            result.Hu,
            result.varu,
        )
    )
    if np.any(np.isnan(np.asarray(result.u))):
        print("has NaN after DoF correction")
