"""TV-PAM and TV-PD solver families (reference README lists three solvers,
only TV-MM survives in its tree — SURVEY.md §2.4; PAM/PD rebuilt from the
cited papers)."""

import numpy as np
import scipy.signal as sig

from ics_tpu.models.rl_pam import PAMConfig, richardson_lucy_PAM
from ics_tpu.models.rl_pd import PDConfig, richardson_lucy_PD
from ics_tpu.ops.windows import gaussian_kernel

RNG = np.random.default_rng(41)


def _blurred_problem(mk=7, m=49):
    pad = mk // 2
    sharp = RNG.random((m, m, 3)).astype(np.float32)
    smooth_k = gaussian_kernel(9, 2.0)
    sharp = np.stack(
        [sig.convolve(sharp[..., c], smooth_k, mode="same") for c in range(3)],
        axis=-1,
    )
    sharp = np.clip(sharp, 0.1, 0.9).astype(np.float32)
    k = gaussian_kernel(mk, 1.2).astype(np.float32)
    padded = np.pad(sharp, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    blurry = np.stack(
        [sig.convolve(padded[..., c], k, mode="valid") for c in range(3)], axis=-1
    ).astype(np.float32)
    psf = np.dstack([k] * 3).astype(np.float32)
    u0 = np.pad(blurry, ((pad, pad), (pad, pad), (0, 0)), mode="edge").astype(
        np.float32
    )
    return sharp, blurry, u0, psf, pad


def test_pam_nonblind_improves():
    sharp, blurry, u0, psf, pad = _blurred_problem()
    m = blurry.shape[0]
    res = richardson_lucy_PAM(
        blurry, u0, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        tau=1.0, iterations=30, step_factor=5e-3, blind=False,
        config=PAMConfig(lambda_tv=1e-4),
    )
    out = np.asarray(res.u)
    assert np.isfinite(out).all()
    err_before = np.mean((blurry - sharp) ** 2)
    err_after = np.mean((out - sharp) ** 2)
    assert err_after < err_before


def test_pam_blind_runs_and_keeps_psf_normalized():
    sharp, blurry, u0, psf, pad = _blurred_problem(mk=5)
    m = blurry.shape[0]
    res = richardson_lucy_PAM(
        blurry, u0, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        tau=0.0, iterations=4, step_factor=1e-3, blind=True,
    )
    psf_out = np.asarray(res.psf)
    assert np.isfinite(psf_out).all()
    assert (psf_out >= 0).all()
    np.testing.assert_allclose(psf_out.sum(axis=(0, 1)), [1, 1, 1], rtol=1e-4)


def test_pd_nonblind_improves():
    sharp, blurry, u0, psf, pad = _blurred_problem()
    m = blurry.shape[0]
    res = richardson_lucy_PD(
        blurry, u0, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        tau=1.0, iterations=30, blind=False, config=PDConfig(lambda_tv=1e-4),
    )
    out = np.asarray(res.u)
    assert out.shape == blurry.shape
    assert np.isfinite(out).all()
    err_before = np.mean((blurry - sharp) ** 2)
    err_after = np.mean((out - sharp) ** 2)
    assert err_after < err_before


def test_pd_blind_runs():
    sharp, blurry, u0, psf, pad = _blurred_problem(mk=5)
    m = blurry.shape[0]
    res = richardson_lucy_PD(
        blurry, u0, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        tau=0.0, iterations=4, blind=True,
    )
    psf_out = np.asarray(res.psf)
    assert np.isfinite(np.asarray(res.u)).all()
    assert (psf_out >= 0).all()
    np.testing.assert_allclose(psf_out.sum(axis=(0, 1)), [1, 1, 1], rtol=1e-4)


def test_pd_denoise_reduces_tv():
    """With identity PSF, PD is TV denoising: TV should drop, fidelity kept."""
    import jax.numpy as jnp

    from ics_tpu.ops.tv import tv_op

    clean, _, _, _, _ = _blurred_problem()
    noisy = np.clip(
        clean + RNG.normal(0, 0.05, clean.shape), 0.01, 0.99
    ).astype(np.float32)
    ident = np.zeros((5, 5, 3), np.float32)
    ident[2, 2, :] = 1.0
    m = noisy.shape[0]
    res = richardson_lucy_PD(
        noisy, noisy.copy(), ident, 3, m - 3, 3, m - 3,
        tau=1.0, iterations=20, blind=False, config=PDConfig(lambda_tv=5e-2),
    )
    out = np.asarray(res.u)
    tv_in, _ = tv_op(jnp.asarray(noisy), 1e-6)
    tv_out, _ = tv_op(jnp.asarray(out), 1e-6)
    assert float(jnp.sum(tv_out)) < float(jnp.sum(tv_in))
    assert np.mean((out - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_tv_denoise_chambolle():
    from ics_tpu.models.tv_denoise import tv_denoise
    from ics_tpu.ops.tv import tv_op
    import jax.numpy as jnp

    clean = np.kron(0.3 + 0.5 * RNG.random((4, 4)), np.ones((12, 12))).astype(
        np.float32
    )
    noisy = (clean + RNG.normal(0, 0.08, clean.shape)).astype(np.float32)
    out = np.asarray(tv_denoise(noisy, weight=0.15, iterations=80))
    assert np.mean((out - clean) ** 2) < np.mean((noisy - clean) ** 2)
    tv_in, _ = tv_op(jnp.asarray(noisy)[..., None], 1e-6)
    tv_out, _ = tv_op(jnp.asarray(out)[..., None], 1e-6)
    assert float(jnp.sum(tv_out)) < float(jnp.sum(tv_in))
    # rgb path
    rgb = RNG.random((20, 20, 3)).astype(np.float32)
    out3 = np.asarray(tv_denoise(rgb, weight=0.1, iterations=20))
    assert out3.shape == rgb.shape


def test_tv_denoise_matches_skimage_formulation():
    """Against a literal numpy transcription of Chambolle's iteration."""
    from ics_tpu.models.tv_denoise import tv_denoise

    f = RNG.random((15, 17)).astype(np.float64)
    weight, n_iter, tau = 0.12, 30, 0.25

    def np_grad(u):
        dy = np.zeros_like(u); dy[:-1] = u[1:] - u[:-1]
        dx = np.zeros_like(u); dx[:, :-1] = u[:, 1:] - u[:, :-1]
        return dy, dx

    def np_div(py, px):
        dy = np.zeros_like(py); dy[0] = py[0]; dy[1:-1] = py[1:-1] - py[:-2]; dy[-1] = -py[-2]
        dx = np.zeros_like(px); dx[:, 0] = px[:, 0]; dx[:, 1:-1] = px[:, 1:-1] - px[:, :-2]; dx[:, -1] = -px[:, -2]
        return dy + dx

    py = np.zeros_like(f); px = np.zeros_like(f)
    for _ in range(n_iter):
        gy, gx = np_grad(np_div(py, px) - f / weight)
        mag = np.sqrt(gy**2 + gx**2)
        py = (py + tau * gy) / (1 + tau * mag)
        px = (px + tau * gx) / (1 + tau * mag)
    expected = f - weight * np_div(py, px)

    got = np.asarray(tv_denoise(f.astype(np.float32), weight, n_iter))
    np.testing.assert_allclose(got, expected, atol=1e-4)
