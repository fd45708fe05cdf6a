"""PSF ops (ref lib/deconvolution.pyx:47-75, 242-252) and reductions /
whiteness weights (ref :255-338, :392-404)."""

import jax.numpy as jnp
import numpy as np

from ics_tpu.ops import reductions
from ics_tpu.ops.psf import normalize_kernel, normalize_kernel_np, rotate_180

RNG = np.random.default_rng(3)


def test_normalize_kernel_clamps_and_sums():
    k = RNG.standard_normal((5, 5, 3)).astype(np.float32)
    out = np.asarray(normalize_kernel(jnp.asarray(k)))
    assert (out >= 0).all()
    np.testing.assert_allclose(out.sum(axis=(0, 1)), [1, 1, 1], rtol=1e-5)
    # matches host-side variant
    np.testing.assert_allclose(out, normalize_kernel_np(k), rtol=1e-5)


def test_rotate_180():
    a = RNG.standard_normal((4, 6, 3)).astype(np.float32)
    out = np.asarray(rotate_180(jnp.asarray(a)))
    expected = np.stack([np.rot90(a[..., c], 2) for c in range(3)], axis=-1)
    np.testing.assert_allclose(out, expected)


def test_reductions():
    a = RNG.standard_normal((11, 13, 3)).astype(np.float32)
    j = jnp.asarray(a)
    np.testing.assert_allclose(float(reductions.mean(j)), a.mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(reductions.variance(j)), ((a.mean() - a) ** 2).mean(), rtol=1e-4
    )
    np.testing.assert_allclose(float(reductions.amax(j)), a.max())
    np.testing.assert_allclose(float(reductions.amaxabs(j)), np.abs(a).max())
    np.testing.assert_allclose(
        float(reductions.array_norm_L2(j)), np.sqrt((a**2).sum()), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(reductions.array_norm_L1(j)), np.abs(a).sum(), rtol=1e-5
    )


def test_whiteness_weights_reference_formula():
    h, w = 9, 11
    got = reductions.whiteness_weights(h, w)
    pdf = lambda x: np.exp(-(x**2) / 2) / np.sqrt(2 * np.pi)
    expected = np.sqrt(np.outer(pdf(np.linspace(-1, 1, h)), pdf(np.linspace(-1, 1, w))))
    expected /= expected.sum()
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-6)
