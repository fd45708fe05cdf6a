"""TV stencil vs a direct per-pixel NumPy transcription of the reference
formulas (ref lib/deconvolution.pyx:137-239)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.ops.tv import tv_op

RNG = np.random.default_rng(7)
SQRT2 = math.sqrt(2.0)


def _tv_loops(u, eps, order, norm):
    m, n, _ = u.shape
    out = np.zeros_like(u)
    div = np.zeros_like(u)
    adjust = 4.0 * (1 + 1 / SQRT2) if norm == 1 else 2.0 * (1 + SQRT2)
    nf = (
        (lambda x, y: abs(x) + abs(y) + eps)
        if norm == 1
        else (lambda x, y: math.sqrt(x * x + y * y + eps * eps))
    )
    for i in range(1, m - 1):
        for j in range(1, n - 1):
            for k in range(3):
                if order == 2:
                    udx = -2 * u[i, j, k] + u[i - 1, j, k] + u[i + 1, j, k]
                    udy = -2 * u[i, j, k] + u[i, j - 1, k] + u[i, j + 1, k]
                    udxdy = (-2 * u[i, j, k] + u[i - 1, j - 1, k] + u[i + 1, j + 1, k]) / SQRT2
                    udydx = (-2 * u[i, j, k] + u[i - 1, j + 1, k] + u[i + 1, j - 1, k]) / SQRT2
                    div[i, j, k] = (-udx - udy - udxdy - udydx) / adjust
                    out[i, j, k] = (nf(udx, udy) + nf(udxdy, udydx)) / adjust
                else:
                    udx_b = u[i, j, k] - u[i - 1, j, k]
                    udy_b = u[i, j, k] - u[i, j - 1, k]
                    udx_f = -u[i, j, k] + u[i + 1, j, k]
                    udy_f = -u[i, j, k] + u[i, j + 1, k]
                    udxdy_b = (u[i, j, k] - u[i - 1, j - 1, k]) / SQRT2
                    udydx_b = (u[i, j, k] - u[i - 1, j + 1, k]) / SQRT2
                    udydx_f = (-u[i, j, k] + u[i + 1, j - 1, k]) / SQRT2
                    udxdy_f = (-u[i, j, k] + u[i + 1, j + 1, k]) / SQRT2
                    div[i, j, k] = (
                        udx_b + udy_b - udx_f - udy_f + udxdy_b + udydx_b - udxdy_f - udydx_f
                    ) / adjust
                    out[i, j, k] = (
                        nf(udx_b, udy_b) + nf(udx_f, udy_f) + nf(udxdy_b, udydx_b) + nf(udxdy_f, udydx_f)
                    ) / adjust
    return out, div


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("norm", [1, 2])
def test_tv_matches_reference_loops(order, norm):
    u = RNG.standard_normal((9, 8, 3)).astype(np.float32)
    eps = 1e-2
    tv, div = tv_op(jnp.asarray(u), eps, order=order, norm=norm)
    tv_ref, div_ref = _tv_loops(u.astype(np.float64), eps, order, norm)
    np.testing.assert_allclose(np.asarray(tv), tv_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(div), div_ref, atol=1e-5)


def test_tv_borders_zero():
    u = RNG.standard_normal((7, 7, 3)).astype(np.float32)
    tv, div = tv_op(jnp.asarray(u), 1e-2)
    for arr in (np.asarray(tv), np.asarray(div)):
        assert (arr[0] == 0).all() and (arr[-1] == 0).all()
        assert (arr[:, 0] == 0).all() and (arr[:, -1] == 0).all()


def test_tv_op_auto_dispatch():
    """The use_tv solvers route through tv_op_auto (VERDICT r2: the Pallas
    TV kernel must be dispatched, not an orphan).  Off-TPU auto == xla;
    the explicit pallas route (interpret mode here) matches bit-for-bit;
    the budget gate falls back instead of compiling an OOM kernel."""
    import jax.numpy as jnp

    from ics_tpu.ops.pallas_tv import tv_tile_h
    from ics_tpu.ops.tv import tv_op, tv_op_auto

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.random((40, 52, 3)), jnp.float32)
    for order in (1, 2):
        for norm in (1, 2):
            ref_tv, ref_div = tv_op(u, 1e-3, order, norm)
            for method in ("auto", "xla", "pallas"):
                tv, div = tv_op_auto(u, 1e-3, order, norm, method=method)
                np.testing.assert_allclose(tv, ref_tv, atol=1e-6)
                np.testing.assert_allclose(div, ref_div, atol=1e-6)

    # VMEM tile budget: full tile on small frames, shrinks with width,
    # None when nothing fits
    assert tv_tile_h(512, 512) == 64
    assert tv_tile_h(4000, 6000) < 64
    assert tv_tile_h(4000, 6000, budget=1024) is None


def test_collab_sup_is_channel_max():
    """Collaborative L^{inf,1,1} coupling (ref README.md:113-114, the
    Duran et al. ipol.im/pub/art/2016/141 norm): the magnitude is the
    per-pixel channel supremum of the per-channel magnitude; the
    divergence stays per-channel."""
    import jax.numpy as jnp

    from ics_tpu.ops.tv import collab_sup, tv_op, tv_op_auto

    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.random((32, 44, 3)), jnp.float32)
    for order in (1, 2):
        for norm in (1, 2):
            tv, div = tv_op(u, 1e-3, order, norm)
            ctv, cdiv = tv_op_auto(u, 1e-3, order, norm, collab=True)
            assert ctv.shape == (32, 44, 1)
            np.testing.assert_array_equal(
                np.asarray(ctv)[..., 0], np.max(np.asarray(tv), axis=2)
            )
            np.testing.assert_array_equal(np.asarray(cdiv), np.asarray(div))
            np.testing.assert_array_equal(
                np.asarray(collab_sup(tv)), np.asarray(ctv)
            )
    # pallas backend goes through the same channel-sup wrapper
    ctv_p, _ = tv_op_auto(u, 1e-3, 2, 2, method="pallas", collab=True)
    ctv_x, _ = tv_op_auto(u, 1e-3, 2, 2, method="xla", collab=True)
    np.testing.assert_allclose(np.asarray(ctv_p), np.asarray(ctv_x), atol=1e-6)


def test_collab_l2_is_channel_rms():
    """ℓ²-color collaborative coupling (collab='l2' — the Duran et al.
    ℓ^{2,1,1} class / Blomgren-Chan color TV): the magnitude is the
    per-pixel RMS over channels of the per-channel magnitude (1/sqrt(C)
    scaling so achromatic content matches 'channel' mode); the divergence
    stays per-channel."""
    import jax.numpy as jnp

    from ics_tpu.ops.tv import collab_l2, tv_op, tv_op_auto

    rng = np.random.default_rng(13)
    u = jnp.asarray(rng.random((32, 44, 3)), jnp.float32)
    for order in (1, 2):
        for norm in (1, 2):
            tv, div = tv_op(u, 1e-3, order, norm)
            ctv, cdiv = tv_op_auto(u, 1e-3, order, norm, collab="l2")
            assert ctv.shape == (32, 44, 1)
            np.testing.assert_allclose(
                np.asarray(ctv)[..., 0],
                np.sqrt(np.mean(np.asarray(tv) ** 2, axis=2)),
                rtol=1e-6,
            )
            np.testing.assert_array_equal(np.asarray(cdiv), np.asarray(div))
            np.testing.assert_array_equal(
                np.asarray(collab_l2(tv)), np.asarray(ctv)
            )
    # the l2 coupling is bounded by the sup coupling and above the
    # per-channel minimum: min_c tv <= rms_c tv <= max_c tv
    tv, _ = tv_op(u, 1e-3)
    ctv = np.asarray(collab_l2(tv))[..., 0]
    tv = np.asarray(tv)
    assert np.all(ctv <= np.max(tv, axis=2) + 1e-7)
    assert np.all(ctv >= np.min(tv, axis=2) - 1e-7)
    # unknown coupling rejected
    with np.testing.assert_raises(ValueError):
        tv_op_auto(u, 1e-3, collab="l3")


def test_collab_equals_channel_on_achromatic():
    """On a grayscale (identical-channel) image BOTH collaborative
    couplings are no-ops: the collaborative norms only change behavior
    where channels disagree — i.e. exactly on chromatic structure."""
    import jax.numpy as jnp

    from ics_tpu.ops.tv import tv_op, tv_op_auto

    rng = np.random.default_rng(12)
    g = np.repeat(rng.random((24, 24, 1)).astype(np.float32), 3, axis=2)
    tv, _ = tv_op(jnp.asarray(g), 1e-4)
    for coupling in (True, "l2"):
        ctv, _ = tv_op_auto(jnp.asarray(g), 1e-4, collab=coupling)
        np.testing.assert_allclose(
            np.asarray(ctv)[..., 0], np.asarray(tv)[..., 0], atol=1e-7
        )


def test_solver_rejects_unknown_tv_norm():
    import pytest

    from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM

    img = np.full((16, 16, 3), 0.5, np.float32)
    u = np.pad(img, ((2, 2), (2, 2), (0, 0)), mode="edge")
    psf = np.full((5, 5, 3), 1 / 25, np.float32)
    with pytest.raises(ValueError, match="tv_norm"):
        richardson_lucy_MM(
            img, u, psf, 0, 16, 0, 16, 0.1, iterations=2, blind=False,
            config=RLConfig(use_tv=True, tv_norm="bogus"),
        )
