"""Color ops vs reference formulas (ref lib/utils.py:45-131, 319-351;
notebooks/HSV color balance.ipynb)."""

import colorsys

import jax.numpy as jnp
import numpy as np

from ics_tpu.utils import color

RNG = np.random.default_rng(9)


def test_lagrange_interpolation_through_points():
    pts = np.array([[0.0, 1.0], [50.0, 30.0], [100.0, 100.0]])
    poly, y = color.Lagrange_interpolation(pts, pts[:, 0])
    np.testing.assert_allclose(y, pts[:, 1], atol=1e-9)
    # quadratic through 3 points: compare against numpy polyfit
    coeffs = np.polyfit(pts[:, 0], pts[:, 1], 2)
    x = np.linspace(0, 100, 11)
    np.testing.assert_allclose(poly(x), np.polyval(coeffs, x), atol=1e-6)


def test_grey_point_runs_and_moves_mean():
    src = color.LABImage(
        L=RNG.random((16, 16)) * 100,
        A=RNG.standard_normal((16, 16)) * 10,
        B=RNG.standard_normal((16, 16)) * 10,
    )
    out = color.grey_point(src, 45.0)
    assert out.L.shape == src.L.shape
    assert np.isfinite(out.L).all()


def test_auto_vibrance_boosts_saturation():
    a = RNG.standard_normal((32, 32)) * 30
    src = color.LABImage(L=RNG.random((32, 32)) * 100, A=a.copy(), B=a.copy())
    out = color.auto_vibrance(src)
    # ratio s2/s1 >= 1 in the tails -> chroma magnitude grows on average
    assert np.abs(out.A).mean() >= np.abs(src.A).mean() * 0.99


def test_divTV_matches_numpy_reference():
    image = RNG.random((12, 14)).astype(np.float32)

    def ref_divtv(img):
        grad = np.zeros_like(img)
        fx = np.pad(img, ((0, 0), (1, 0)), mode="edge")[:, 1:] - img
        fy = np.pad(img, ((1, 0), (0, 0)), mode="edge")[1:, :] - img
        grad += (fx + fy) / np.maximum(1e-3, np.sqrt(fx**2 + fy**2))
        fx = np.pad(img, ((0, 0), (0, 1)), mode="edge")[:, :-1] - img
        fy = np.pad(img, ((0, 1), (1, 0)), mode="edge")[:-1, 1:] - np.pad(
            img, ((1, 0), (0, 0)), mode="edge"
        )[1:, :]
        grad -= fx / np.maximum(1e-3, np.sqrt(fx**2 + fy**2))
        fy = np.pad(img, ((0, 1), (0, 0)), mode="edge")[:-1, :] - img
        fx = np.pad(img, ((1, 0), (0, 1)), mode="edge")[1:, :-1] - np.pad(
            img, ((0, 0), (0, 1)), mode="edge"
        )[:, 1:]
        grad -= fy / np.maximum(1e-3, np.sqrt(fy**2 + fx**2))
        return grad

    np.testing.assert_allclose(
        np.asarray(color.divTV(image)), ref_divtv(image), atol=1e-5
    )


def test_gradTVEM_finite_and_zero_on_flat():
    u = RNG.random((10, 10)).astype(np.float32)
    g = np.asarray(color.gradTVEM(u, u))
    assert np.isfinite(g).all()
    flat = np.full((10, 10), 0.5, np.float32)
    gf = np.asarray(color.gradTVEM(flat, flat))
    np.testing.assert_allclose(gf, 0.0, atol=1e-6)


def test_hsv_roundtrip_matches_colorsys():
    rgb = RNG.random((40, 3)).astype(np.float32)
    hsv = np.asarray(color.rgb_to_hsv(jnp.asarray(rgb)))
    for i in range(rgb.shape[0]):
        h, s, v = colorsys.rgb_to_hsv(*rgb[i])
        np.testing.assert_allclose(hsv[i], [h, s, v], atol=1e-5)
    back = np.asarray(color.hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_hue_rad_roundtrip():
    theta = np.linspace(0.001, 0.999, 50).astype(np.float32)
    rad = np.asarray(color.normal2rad(jnp.asarray(theta)))
    assert rad.min() >= -np.pi - 1e-6 and rad.max() <= np.pi + 1e-6
    back = np.asarray(color.rad2normal(jnp.asarray(rad)))
    np.testing.assert_allclose(back, theta, atol=1e-5)


def test_hue_shift_moves_toward_target():
    src = jnp.asarray(np.full(8, 0.5, np.float32))  # hue angle 0.5 rad
    shifted = np.asarray(color.hue_shift(src, 1.5, 1.0))
    assert (shifted > 0.5).all()  # moved toward target
    unshifted = np.asarray(color.hue_shift(src, 1.5, 0.0))
    np.testing.assert_allclose(unshifted, 0.5)


def test_luma_masks_normalized():
    l = RNG.random((15, 15)).astype(np.float32)
    low, mid, high = color.luma_masks(jnp.asarray(l))
    np.testing.assert_allclose(
        np.asarray(low + mid + high), np.ones_like(l), atol=1e-5
    )


def test_lab_roundtrip():
    rgb = RNG.random((24, 24, 3)).astype(np.float32)
    lab = color.rgb_to_lab(rgb)
    back = np.asarray(color.lab_to_rgb(lab))
    np.testing.assert_allclose(back, rgb, atol=2e-3)
    # known values: pure white -> L=100, a=b=0
    white = color.rgb_to_lab(np.ones((1, 1, 3), np.float32))
    np.testing.assert_allclose(float(white.L[0, 0]), 100.0, atol=0.1)
    np.testing.assert_allclose(float(white.A[0, 0]), 0.0, atol=0.1)
    # mid grey ~ L=53.6
    grey = color.rgb_to_lab(np.full((1, 1, 3), 0.5, np.float32))
    np.testing.assert_allclose(float(grey.L[0, 0]), 53.39, atol=0.2)


def test_grey_point_on_real_lab():
    rgb = RNG.random((16, 16, 3)).astype(np.float32) * 0.8 + 0.1
    lab = color.rgb_to_lab(rgb)
    lab_np = color.LABImage(
        L=np.asarray(lab.L), A=np.asarray(lab.A), B=np.asarray(lab.B)
    )
    out = color.grey_point(lab_np, 40.0)
    rgb_out = np.asarray(color.lab_to_rgb(out))
    assert rgb_out.shape == rgb.shape
    assert np.isfinite(rgb_out).all()


def test_grey_point_matches_host_poly1d_formulation():
    """The on-device Lagrange path must equal the reference's host-side
    np.poly1d evaluation (ref lib/utils.py:85-113)."""
    rng = np.random.default_rng(11)
    L = (rng.random((31, 29)) * 100).astype(np.float32)
    A = (rng.random((31, 29)) * 60 - 30).astype(np.float32)
    B = (rng.random((31, 29)) * 60 - 30).astype(np.float32)
    amount = 42.0
    set1 = np.array([[0, 1], [amount, amount], [100, 100]], np.float64)
    set2 = np.array([[0, 1], [np.mean(L), amount], [100, 100]], np.float64)
    _, y1 = color.Lagrange_interpolation(set1, L)
    _, y2 = color.Lagrange_interpolation(set2, L)
    ratio = y2 / y1
    out = color.grey_point(color.LABImage(L=L, A=A, B=B), amount)
    np.testing.assert_allclose(np.asarray(out.L), L * ratio, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out.A), A * ratio, rtol=2e-4, atol=1e-4)


def test_auto_vibrance_matches_host_spline():
    """The on-device piecewise-cubic evaluation must equal scipy's
    UnivariateSpline (incl. extrapolation beyond +-100)."""
    from scipy import interpolate

    x = np.array([-100, -50, -20, 0, 20, 50, 100], np.float64)
    y1 = np.array([100, 45, 19, 1, 19, 45, 100], np.float64)
    y2 = np.array([100, 50, 20, 1, 20, 50, 100], np.float64)
    s1 = interpolate.UnivariateSpline(x, y1)
    s2 = interpolate.UnivariateSpline(x, y2)
    A = np.linspace(-120, 120, 241).astype(np.float32)
    src = color.LABImage(L=np.zeros_like(A), A=A, B=A[::-1].copy())
    out = color.auto_vibrance(src)
    np.testing.assert_allclose(
        np.asarray(out.A), A * s2(A) / s1(A), rtol=2e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.B), A[::-1] * s2(A[::-1]) / s1(A[::-1]), rtol=2e-4, atol=1e-4
    )


def test_color_tone_ops_are_jittable():
    import jax

    rng = np.random.default_rng(3)
    L = (rng.random((17, 19)) * 100).astype(np.float32)
    A = (rng.random((17, 19)) * 50 - 25).astype(np.float32)
    src = color.LABImage(L=L, A=A, B=A)

    @jax.jit
    def pipeline(L, A, B):
        out = color.grey_point(color.LABImage(L=L, A=A, B=B), 40.0)
        out = color.auto_vibrance(out)
        return out.L, out.A, out.B

    outs = pipeline(L, A, A)
    eager = color.auto_vibrance(color.grey_point(src, 40.0))
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(eager.A), rtol=1e-5)
