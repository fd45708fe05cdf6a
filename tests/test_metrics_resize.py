"""SSIM/PSNR metrics and the resize utilities."""

import numpy as np

from ics_tpu.utils.metrics import psnr, ssim
from ics_tpu.utils.resize import resize, resize_jax

RNG = np.random.default_rng(71)


def test_ssim_identity_and_ordering():
    a = RNG.random((32, 32, 3)).astype(np.float32)
    assert abs(ssim(a, a) - 1.0) < 1e-6
    n1 = np.clip(a + RNG.normal(0, 0.02, a.shape), 0, 1).astype(np.float32)
    n2 = np.clip(a + RNG.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    assert ssim(a, n2) < ssim(a, n1) < 1.0


def test_ssim_matches_published_constants():
    # flat vs flat-with-offset: SSIM = (2 m1 m2 + c1)/(m1^2 + m2^2 + c1)
    a = np.full((16, 16), 0.5, np.float32)
    b = np.full((16, 16), 0.6, np.float32)
    c1 = 0.01**2
    expected = (2 * 0.5 * 0.6 + c1) / (0.5**2 + 0.6**2 + c1)
    assert abs(ssim(a, b) - expected) < 1e-4


def test_psnr():
    a = RNG.random((16, 16)).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1).astype(np.float32)
    assert psnr(a, a) > 80
    assert 15 < psnr(a, b) < 25


def test_resize_identity():
    a = RNG.random((20, 24, 3)).astype(np.float32)
    out = resize(a, (20, 24))
    np.testing.assert_allclose(out, a, atol=1e-5)
    out_j = np.asarray(resize_jax(a, (20, 24)))
    np.testing.assert_allclose(out_j, a, atol=1e-5)


def test_resize_downscale_upscale_roundtrip():
    # smooth content survives a down/up roundtrip approximately
    x = np.linspace(0, 1, 64)
    a = np.outer(np.sin(3 * x), np.cos(2 * x)).astype(np.float32)
    down = resize(a, (32, 32))
    back = resize(down, (64, 64))
    assert np.abs(back - a).mean() < 0.02
    assert down.shape == (32, 32)
