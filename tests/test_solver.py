"""RL-MM solver vs the clean-room NumPy oracle (tests/np_reference.py) of
the reference's as-checked-in behavior (ref lib/deconvolution.pyx:341-675)."""

import numpy as np
import pytest

from ics_tpu import richardson_lucy_MM
from ics_tpu.models.rl_mm import RLConfig
from ics_tpu.ops.windows import gaussian_kernel, uniform_kernel

from np_reference import rl_mm_oracle

RNG = np.random.default_rng(11)


def _problem(mk=5, m=31, blurry=True):
    pad = mk // 2
    u_m = m + 2 * pad
    # a smooth-ish random test image
    base = RNG.random((m + 8, m + 8, 3)).astype(np.float32)
    k = gaussian_kernel(7, 1.5).astype(np.float32)
    import scipy.signal as sig

    smooth = np.stack(
        [sig.convolve(base[..., c], k, mode="valid") for c in range(3)], axis=-1
    )[: m, : m]
    image = np.clip(smooth, 0.05, 0.95).astype(np.float32)
    u = np.pad(image, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    psf = np.dstack([uniform_kernel(mk)] * 3).astype(np.float32)
    return image, u.astype(np.float32), psf, pad


@pytest.mark.parametrize("blind", [False, True])
def test_solver_matches_oracle(blind):
    image, u, psf, pad = _problem()
    m = image.shape[0]
    top, bottom, left, right = pad + 1, m - pad - 1, pad + 1, m - pad - 1
    kw = dict(tau=0.0, iterations=4, step_factor=1e-3, lambd=1000.0, blind=blind)

    res = richardson_lucy_MM(image, u, psf, top, bottom, left, right, **kw)
    u_ref, psf_ref, traj, it_ref, stop_ref = rl_mm_oracle(
        image, u, psf, top, bottom, left, right, **kw
    )

    assert res.iterations == it_ref
    assert res.converged == stop_ref
    np.testing.assert_allclose(np.asarray(res.u), u_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.psf), psf_ref, atol=2e-5)
    np.testing.assert_allclose(res.M_r, traj[-1], rtol=2e-3)


def test_solver_blind_correlation_mode():
    image, u, psf, pad = _problem()
    m = image.shape[0]
    kw = dict(tau=0.0, iterations=3, step_factor=1e-3, lambd=1000.0, blind=True,
              correlation=True)
    res = richardson_lucy_MM(image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, **kw)
    u_ref, psf_ref, *_ = rl_mm_oracle(
        image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, **kw
    )
    out_psf = np.asarray(res.psf)
    # correlation mode: all channels identical
    np.testing.assert_allclose(out_psf[..., 0], out_psf[..., 1])
    np.testing.assert_allclose(out_psf, psf_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(res.u), u_ref, atol=2e-4)


def test_solver_use_tv_mode_runs():
    image, u, psf, pad = _problem()
    m = image.shape[0]
    res = richardson_lucy_MM(
        image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        tau=0.0, iterations=2, step_factor=1e-3, lambd=1000.0, blind=True,
        config=RLConfig(use_tv=True),
    )
    assert np.isfinite(np.asarray(res.u)).all()
    assert np.isfinite(np.asarray(res.psf)).all()


def test_nonblind_deconvolution_improves_known_blur():
    """End-to-end sanity: deconvolving a synthetically blurred image with the
    true PSF must reduce the error vs the sharp original."""
    import scipy.signal as sig

    mk = 7
    pad = mk // 2
    sharp = RNG.random((49, 49, 3)).astype(np.float32)
    k = gaussian_kernel(mk, 1.2).astype(np.float32)
    sharp_s = np.stack(
        [sig.convolve(sharp[..., c], gaussian_kernel(9, 2.0), mode="same") for c in range(3)],
        axis=-1,
    ).astype(np.float32)
    sharp_s = np.clip(sharp_s, 0.05, 0.95)
    padded = np.pad(sharp_s, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    blurry = np.stack(
        [sig.convolve(padded[..., c], k, mode="valid") for c in range(3)], axis=-1
    ).astype(np.float32)

    u0 = np.pad(blurry, ((pad, pad), (pad, pad), (0, 0)), mode="edge").astype(np.float32)
    psf = np.dstack([k] * 3).astype(np.float32)
    m = blurry.shape[0]
    res = richardson_lucy_MM(
        blurry, u0, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        tau=1.0, iterations=30, step_factor=5e-3, lambd=1000.0, blind=False,
    )
    out = np.asarray(res.u)
    err_before = np.mean((blurry - sharp_s) ** 2)
    err_after = np.mean((out - sharp_s) ** 2)
    assert err_after < err_before


def test_ssim_parity_vs_oracle():
    """BASELINE criterion: >= 0.999 SSIM vs the reference behavior (here the
    NumPy oracle of the Cython solver) on a non-trivial blind run."""
    from ics_tpu.utils.metrics import ssim

    image, u, psf, pad = _problem(mk=5, m=63)
    m = image.shape[0]
    kw = dict(tau=0.0, iterations=10, step_factor=1e-3, lambd=1000.0, blind=True)
    res = richardson_lucy_MM(image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, **kw)
    u_ref, psf_ref, *_ = rl_mm_oracle(
        image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, **kw
    )
    s = ssim(np.asarray(res.u), u_ref, data_range=1.0)
    assert s >= 0.999, f"SSIM {s} < 0.999"


def test_bfloat16_mode_close_to_f32():
    from ics_tpu.utils.metrics import ssim

    image, u, psf, pad = _problem(mk=5, m=63)
    m = image.shape[0]
    kw = dict(tau=0.0, iterations=6, step_factor=1e-3, lambd=1000.0, blind=True)
    a = richardson_lucy_MM(image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, **kw)
    b = richardson_lucy_MM(
        image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        config=RLConfig(dtype="bfloat16"), **kw
    )
    out_b = np.asarray(b.u)
    assert out_b.dtype == np.float32
    assert np.isfinite(out_b).all()
    s = ssim(out_b, np.asarray(a.u), data_range=1.0)
    assert s > 0.98, f"bf16 SSIM {s}"


def test_whiteness_trajectory_matches_oracle():
    """The full per-iteration M_r sequence must track the oracle — stronger
    evidence than the final value alone (the stopping behavior depends on the
    whole trajectory)."""
    image, u, psf, pad = _problem(mk=5, m=47)
    m = image.shape[0]
    kw = dict(tau=0.0, iterations=6, step_factor=1e-3, lambd=1000.0, blind=True)
    res = richardson_lucy_MM(
        image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        config=RLConfig(record_metrics=True), **kw
    )
    _, _, traj_ref, it_ref, _ = rl_mm_oracle(
        image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, **kw
    )
    assert res.iterations == it_ref
    got = res.trajectory["M_r"]
    assert len(got) == len(traj_ref)
    np.testing.assert_allclose(got, traj_ref, rtol=5e-3)


def test_ssim_parity_on_reference_fixture():
    """Golden parity on a real reference photo crop (SURVEY §4): blind solve
    on a crop of img/blured.jpg, >= 0.999 SSIM vs the NumPy oracle."""
    import os

    import pytest

    path = "/root/reference/img/blured.jpg"
    if not os.path.exists(path):
        pytest.skip("reference fixtures not mounted")
    from PIL import Image

    from ics_tpu.utils.metrics import ssim

    with Image.open(path) as im:
        crop = np.asarray(im.crop((700, 500, 801, 601)), np.float32) / 255.0
    crop = crop ** (1 / 2.2)
    mk = 7
    pad = mk // 2
    m = crop.shape[0]
    u = np.pad(crop, ((pad, pad), (pad, pad), (0, 0)), mode="edge").astype(np.float32)
    psf = np.dstack([uniform_kernel(mk)] * 3).astype(np.float32)
    kw = dict(tau=0.0, iterations=8, step_factor=1e-3, lambd=10000.0, blind=True)

    res = richardson_lucy_MM(crop, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, **kw)
    u_ref, psf_ref, *_ = rl_mm_oracle(
        crop, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, **kw
    )
    s = ssim(np.asarray(res.u), u_ref, data_range=1.0)
    assert s >= 0.999, f"SSIM {s} < 0.999 on real fixture"
    np.testing.assert_allclose(np.asarray(res.psf), psf_ref, atol=1e-4)


def test_mixed_precision_mode_meets_parity_bar():
    """dtype='mixed' (bf16 convs, f32 iterate + incremental residual) must
    match f32 at >= 0.999 SSIM with the same stop timing — unlike pure
    bfloat16 (~0.90 at converged non-blind residuals, catastrophic
    cancellation in conv(u) - image)."""
    import os

    from PIL import Image

    from ics_tpu.models.rl_mm import RLConfig
    from ics_tpu.utils.metrics import ssim

    if not os.path.exists("/root/reference/img/blured.jpg"):
        pytest.skip("reference image corpus not mounted")
    mk = 7
    pad = mk // 2
    with Image.open("/root/reference/img/blured.jpg") as im:
        crop = np.asarray(im.crop((700, 500, 801, 601)), np.float32) / 255.0
    crop = (crop ** (1 / 2.2)).astype(np.float32)
    m = crop.shape[0]
    u0 = np.pad(crop, ((pad, pad), (pad, pad), (0, 0)), mode="edge").astype(np.float32)
    psf0 = np.dstack([uniform_kernel(mk)] * 3).astype(np.float32)
    args = (crop, u0, psf0, pad + 1, m - pad - 1, pad + 1, m - pad - 1)

    # tau=10: the relative-rise criterion can't fire -> fixed 25 iterations
    kw = dict(tau=10.0, iterations=25, step_factor=1e-3, lambd=10000.0, blind=False)
    ref = richardson_lucy_MM(*args, **kw)
    mix = richardson_lucy_MM(*args, **kw, config=RLConfig(dtype="mixed"))
    s = ssim(np.asarray(mix.u), np.asarray(ref.u), data_range=1.0)
    assert s >= 0.999, f"mixed-precision SSIM {s}"

    # stop timing must agree on the real stopping criterion
    kw2 = dict(tau=0.0, iterations=30, step_factor=1e-3, lambd=10000.0, blind=False)
    a = richardson_lucy_MM(*args, **kw2)
    b = richardson_lucy_MM(*args, **kw2, config=RLConfig(dtype="mixed"))
    assert a.iterations == b.iterations
    assert a.converged == b.converged


def test_dof_guard_closes_zero_denominator_nan():
    """RLConfig.dof_guard (VERDICT r2 item 2): the reference's epsilon-free
    DoF division NaNs when (gradu + image) lands on exact zero — certain on
    images with exactly-zero regions, and what killed 'mixed' on the 24 MP
    frame in r2.  The guard substitutes dof=1 at those pixels only.

    auto (None): ON for mixed/bf16, OFF for float32 (strict parity)."""
    import jax.numpy as jnp

    from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM

    rng = np.random.default_rng(0)
    img = np.zeros((64, 64, 3), np.float32)
    img[20:40, 20:40] = rng.random((20, 20, 3)).astype(np.float32)
    psf = np.ones((5, 5, 3), np.float32) / 25.0
    u = np.pad(img, ((2, 2), (2, 2), (0, 0)), mode="edge")

    def run(dtype, guard):
        cfg = RLConfig(dtype=dtype, dof_guard=guard)
        return richardson_lucy_MM(
            img, u, psf, 5, 59, 5, 59, 0.1, iterations=8, step_factor=1e-3,
            lambd=1000, blind=False, config=cfg, verbose=False,
        )

    # the failure mode, reproduced: guard off => NaN floods (both dtypes —
    # the zero region makes exact-zero denominators even in f32, which is
    # faithful to what the reference itself would do)
    assert not np.isfinite(run("mixed", False).M_r)
    assert not np.isfinite(np.asarray(run("float32", None).u)).all()
    # the guard closes it: mixed auto-enables, f32 opt-in
    assert np.isfinite(np.asarray(run("mixed", None).u)).all()
    assert np.isfinite(np.asarray(run("float32", True).u)).all()


def test_dof_guard_is_identity_off_degenerate_pixels():
    """Where neither of the guard's two rewrites can fire — no exact-zero
    denominator (the NaN fix) and dof <= 1 everywhere (the amplifier
    clamp; lambd here is large enough that dof = ratio^2/lambd cannot
    reach 1 short of a cancellation the fixture doesn't have) — guard on
    vs off must be BIT-identical in f32."""
    from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM

    rng = np.random.default_rng(3)
    img = (0.1 + 0.8 * rng.random((48, 48, 3))).astype(np.float32)
    psf = np.ones((3, 3, 3), np.float32) / 9.0
    u = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")

    def run(guard):
        cfg = RLConfig(dtype="float32", dof_guard=guard)
        return np.asarray(
            richardson_lucy_MM(
                img, u, psf, 4, 44, 4, 44, 0.1, iterations=6,
                step_factor=1e-3, lambd=1e12, blind=False, config=cfg,
                verbose=False,
            ).u
        )

    np.testing.assert_array_equal(run(True), run(False))


def test_dof_guard_clamps_near_zero_amplifier():
    """The guard's dof <= 1 clamp: a near-zero (not exactly zero) DoF
    denominator makes dof an amplifier in the blend
    u <- (1-dof)*u + dof*image, which seeds locally blown-out patches in
    reduced-precision solves (measured: a ~20px blob from a mixed coarse
    pyramid level).  With the guard on, the iterate must stay within the
    physically meaningful range the blend's convex form implies."""
    from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM

    rng = np.random.default_rng(7)
    img = (0.1 + 0.8 * rng.random((48, 48, 3))).astype(np.float32)
    psf = np.ones((3, 3, 3), np.float32) / 9.0
    u = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")

    # lambd=1 leaves dof = ratio^2 undamped: random fixtures contain
    # near-cancelling (gradu + image) pixels, so unguarded f32 blows up
    # (|u| far outside [0,1]) — reproducing the failure mode — while the
    # guarded solve stays bounded by the convex-blend envelope.
    def run(guard):
        cfg = RLConfig(dtype="float32", dof_guard=guard)
        return np.asarray(
            richardson_lucy_MM(
                img, u, psf, 4, 44, 4, 44, 0.1, iterations=6,
                step_factor=1e-3, lambd=1.0, blind=False, config=cfg,
                verbose=False,
            ).u
        )

    unguarded, guarded = run(False), run(True)
    # measured: unguarded peaks at ~5.4 (6x out of the [0,1] image range,
    # growing with the blob mechanism), guarded stays at ~0.9
    blown = np.nanmax(np.abs(unguarded))
    assert blown > 2.0 or not np.isfinite(unguarded).all()
    assert np.isfinite(guarded).all()
    assert np.abs(guarded).max() < 1.5


def test_early_stop_plateau_cuts_dead_iterations():
    """RLConfig.early_stop (VERDICT r2 item 3): a non-blind solve whose
    whiteness metric has plateaued must stop instead of burning the whole
    budget; blind solves are untouched (M_r is flat there while the PSF
    still improves — measured on the golden crop)."""
    from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM

    rng = np.random.default_rng(9)
    img = (0.2 + 0.6 * rng.random((48, 48, 3))).astype(np.float32)
    psf = np.ones((5, 5, 3), np.float32) / 25.0
    u = np.pad(img, ((2, 2), (2, 2), (0, 0)), mode="edge")

    def run(es, blind):
        cfg = RLConfig(early_stop=es)
        return richardson_lucy_MM(
            img, u, psf, 5, 43, 5, 43, 1e9,  # tau: parity stop never fires
            # (the non-blind rule is delta-ratio > tau, ratio bounded by 1)
            iterations=80, step_factor=1e-3, lambd=1000, blind=blind,
            config=cfg, verbose=False,
        )

    # without the plateau the budget burns fully
    assert run(0.0, blind=False).iterations == 80
    # with it, the plateaued whiteness metric stops the solve early
    res = run(1e-3, blind=False)
    assert res.converged and res.iterations < 80, res.iterations
    # blind solves keep the reference stopping rule regardless
    blind_ref = run(0.0, blind=True).iterations
    assert run(1e-3, blind=True).iterations == blind_ref


def test_solver_conv_precision_high():
    """conv_precision='high' (bf16x3 MXU convs) runs and validates; off
    TPU it falls back to the exact backends, so the result equals 'exact'
    bitwise here."""
    import pytest

    from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM

    rng = np.random.default_rng(4)
    img = (0.1 + 0.8 * rng.random((32, 32, 3))).astype(np.float32)
    u = np.pad(img, ((2, 2), (2, 2), (0, 0)), mode="edge")
    psf = np.full((5, 5, 3), 1 / 25, np.float32)

    r_exact = richardson_lucy_MM(
        img, u, psf, 0, 32, 0, 32, 0.1, iterations=3, blind=False,
        config=RLConfig(conv_precision="exact"))
    r_high = richardson_lucy_MM(
        img, u, psf, 0, 32, 0, 32, 0.1, iterations=3, blind=False,
        config=RLConfig(conv_precision="high"))
    np.testing.assert_array_equal(np.asarray(r_exact.u), np.asarray(r_high.u))

    with pytest.raises(ValueError, match="conv_precision"):
        richardson_lucy_MM(
            img, u, psf, 0, 32, 0, 32, 0.1, iterations=2, blind=False,
            config=RLConfig(conv_precision="bogus"))


def test_nonblind_deconvolution_improves_known_motion_blur():
    """Same sanity bar as the gaussian case, for the linear-motion PSF class
    (the blur='motion' mode's target, ref deconvolve.py:154-157): given the
    true motion PSF, deconvolution must move the image toward sharp."""
    import scipy.signal as sig

    from ics_tpu.ops.windows import motion_kernel

    mk = 7
    pad = mk // 2
    k = motion_kernel(mk, 45.0).astype(np.float32)
    sharp = RNG.random((49, 49, 3)).astype(np.float32)
    sharp_s = np.stack(
        [sig.convolve(sharp[..., c], gaussian_kernel(9, 2.0), mode="same") for c in range(3)],
        axis=-1,
    ).astype(np.float32)
    sharp_s = np.clip(sharp_s, 0.05, 0.95)
    padded = np.pad(sharp_s, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    blurry = np.stack(
        [sig.convolve(padded[..., c], k, mode="valid") for c in range(3)], axis=-1
    ).astype(np.float32)

    u0 = np.pad(blurry, ((pad, pad), (pad, pad), (0, 0)), mode="edge").astype(np.float32)
    psf = np.dstack([k] * 3).astype(np.float32)
    m = blurry.shape[0]
    res = richardson_lucy_MM(
        blurry, u0, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        tau=1.0, iterations=30, step_factor=5e-3, lambd=1000.0, blind=False,
    )
    out = np.asarray(res.u)
    err_before = np.mean((blurry - sharp_s) ** 2)
    err_after = np.mean((out - sharp_s) ** 2)
    assert err_after < err_before
