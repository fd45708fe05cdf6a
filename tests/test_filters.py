"""Filters vs scipy/NumPy references (ref lib/utils.py:173-300)."""

import numpy as np
import pytest
import scipy.signal as sig

from ics_tpu.ops.windows import gaussian_kernel, kaiser_kernel
from ics_tpu.utils import filters

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("radius,amount", [(5, 2.0), (9, 3.5)])
def test_gaussian_blur_matches_scipy(radius, amount):
    src = RNG.random((33, 37)).astype(np.float32)
    ours = np.asarray(filters.gaussian_blur(src, radius, amount))
    ref = sig.convolve2d(src, gaussian_kernel(radius, amount), mode="same", boundary="symm")
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("radius,amount", [(5, 8.0), (8, 12.0)])
def test_bessel_blur_matches_scipy(radius, amount):
    src = RNG.random((21, 25)).astype(np.float32)
    ours = np.asarray(filters.bessel_blur(src, radius, amount))
    ref = sig.convolve2d(src, kaiser_kernel(radius, amount), mode="same", boundary="symm")
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_usm():
    src = RNG.random((19, 19)).astype(np.float32)
    blur = sig.convolve2d(src, kaiser_kernel(5, 8.0), mode="same", boundary="symm")
    expected = src + (src - blur) * 1.5
    ours = np.asarray(filters.USM(src, 5, 8.0, 1.5, method="bessel"))
    np.testing.assert_allclose(ours, expected, atol=3e-5)


def _bilateral_numpy(source, radius, std_i, std_s):
    """Direct transcription of the reference loop (lib/utils.py:173-191) with
    the intended Gaussian pdf weight."""
    pad = np.pad(source, (radius, radius), mode="symmetric")
    filt = np.zeros_like(source, dtype=np.float64)
    W = np.zeros_like(source, dtype=np.float64)
    g = lambda x, s: np.exp(-(x**2) / (2 * s**2)) / (s * np.sqrt(2 * np.pi))
    h, w = source.shape
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            nb = pad[radius + i : radius + i + h, radius + j : radius + j + w]
            gi = g(nb - source, std_i)
            gs = g(np.sqrt(i * i + j * j), std_s)
            filt += nb * gi * gs
            W += gi * gs
    return filt / W


def test_bilateral_matches_reference_loop():
    src = RNG.random((17, 15)).astype(np.float32)
    ours = np.asarray(filters.bilateral_filter(src, 3, 0.1, 2.0))
    ref = _bilateral_numpy(src.astype(np.float64), 3, 0.1, 2.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_bilateral_preserves_edges_vs_gaussian():
    # step edge: bilateral should smooth much less across the edge
    src = np.zeros((20, 20), np.float32)
    src[:, 10:] = 1.0
    src += RNG.normal(0, 0.02, src.shape).astype(np.float32)
    bil = np.asarray(filters.bilateral_filter(src, 4, 0.1, 4.0))
    edge_contrast = abs(bil[:, 11].mean() - bil[:, 8].mean())
    assert edge_contrast > 0.9


def test_overlay_parity():
    up = RNG.random((8, 8)).astype(np.float32) * 100
    lp = RNG.random((8, 8)).astype(np.float32) * 100
    lp[0, 0] = 50.0  # exact-50 pixels blend to 0 in the reference
    ours = np.asarray(filters.overlay(up, lp))
    expected = (lp < 50) * (2 * up * lp / 100) + (lp > 50) * (
        100 - 2 * (100 - up) * (100 - lp) / 100
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-5)
    assert ours[0, 0] == 0.0
    np.testing.assert_allclose(
        np.asarray(filters.blending(up, lp, "overlay")), expected, rtol=1e-5
    )


def test_bilateral_lab_denoises():
    clean = np.clip(
        np.kron(0.3 + 0.4 * RNG.random((4, 4, 3)), np.ones((8, 8, 1))), 0, 1
    ).astype(np.float32)
    noisy = np.clip(clean + RNG.normal(0, 0.03, clean.shape), 0, 1).astype(np.float32)
    out = np.asarray(filters.bilateral_lab(noisy, 3, 5.0, 3.0))
    assert out.shape == clean.shape
    assert np.mean((out - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_bilateral_tile_h_budget():
    """The Pallas bilateral tile must shrink with frame width so the VMEM
    working set (band scratch + rolled fori carry + num/den + double-
    buffered out block) stays inside the scoped budget — the same
    discipline as ops.conv._pallas_tile_h (ADVICE r2: tile_h was a fixed
    128, ~19 MB at 6000-px-wide frames => compile-time OOM on real v5e)."""
    from ics_tpu.ops.pallas_bilateral import bilateral_tile_h

    # small frames keep the full tile
    assert bilateral_tile_h(512, 512, 5) == 128
    # a 6000-px-wide frame must drop below 128 (the advisor's failing case)
    t = bilateral_tile_h(4000, 6000, 5)
    assert t is not None and t < 128
    # the chosen tile's working set actually fits the budget
    wp = 6000 + 10 + (-(6000 + 10)) % 128
    band = t + 16
    need = 4 * (2 * band * wp + 4 * t * 6000)
    assert need < 13 * 2**20
    # impossible budget -> None (callers fall back to the portable scan)
    assert bilateral_tile_h(4000, 6000, 5, budget=1024) is None


@pytest.mark.parametrize("domain", ["valid", "same", "full"])
def test_convolve_domains_match_scipy(domain):
    # working counterpart of the reference's backup pyFFTW convolve
    # (ref lib/utils.py:420-447): scipy-exact valid/same/full semantics
    a = RNG.random((23, 29)).astype(np.float32)
    b = RNG.random((5, 7)).astype(np.float32)
    ours = np.asarray(filters.convolve(a, b, domain))
    ref = sig.convolve(a, b, mode=domain)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_convolve_rgb_and_bad_domain():
    a = RNG.random((17, 19, 3)).astype(np.float32)
    b = RNG.random((3, 3)).astype(np.float32)
    out = np.asarray(filters.convolve(a, b, "same"))
    assert out.shape == a.shape
    for c in range(3):
        np.testing.assert_allclose(
            out[..., c], sig.convolve(a[..., c], b, mode="same"), atol=3e-5
        )
    with pytest.raises(ValueError):
        filters.convolve(a, b, "bogus")
