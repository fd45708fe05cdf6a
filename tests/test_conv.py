"""Convolution semantics vs scipy.signal.convolve (ref uses scipy directly,
lib/deconvolution.pyx:478,491,558,571, and fft_slice cropping :102-126)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sig

from ics_tpu.ops.conv import (
    _next_fast_len,
    convolve2d,
    convolve_rgb,
    fft_autocorrelate_same,
)

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("mode", ["valid", "same", "full"])
@pytest.mark.parametrize("method", ["stencil", "direct", "fft", "mxu"])
@pytest.mark.parametrize(
    "ashape,kshape",
    [((17, 23), (5, 7)), ((16, 16), (4, 4)), ((31, 29), (3, 3)), ((9, 9), (9, 9))],
)
def test_convolve2d_matches_scipy(mode, method, ashape, kshape):
    a = RNG.standard_normal(ashape).astype(np.float32)
    k = RNG.standard_normal(kshape).astype(np.float32)
    ours = np.asarray(convolve2d(jnp.asarray(a), jnp.asarray(k), mode, method))
    ref = sig.convolve(a, k, mode=mode)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.parametrize("mode", ["valid", "same", "full"])
@pytest.mark.parametrize("method", ["stencil", "direct", "fft", "mxu"])
def test_convolve_rgb_per_channel(mode, method):
    a = RNG.standard_normal((21, 19, 3)).astype(np.float32)
    k = RNG.standard_normal((5, 5, 3)).astype(np.float32)
    ours = np.asarray(convolve_rgb(jnp.asarray(a), jnp.asarray(k), mode, method))
    for c in range(3):
        ref = sig.convolve(a[..., c], k[..., c], mode=mode)
        np.testing.assert_allclose(ours[..., c], ref, atol=2e-4)


def test_convolve_rgb_broadcast_kernel():
    a = RNG.standard_normal((11, 13, 3)).astype(np.float32)
    k = RNG.standard_normal((3, 3)).astype(np.float32)
    ours = np.asarray(convolve_rgb(jnp.asarray(a), jnp.asarray(k), "same"))
    for c in range(3):
        ref = sig.convolve(a[..., c], k, mode="same")
        np.testing.assert_allclose(ours[..., c], ref, atol=2e-4)


@pytest.mark.parametrize("shape", [(9, 11), (12, 12), (25, 25)])
def test_fft_autocorrelate_same(shape):
    p = RNG.standard_normal((*shape, 3)).astype(np.float32)
    ours = np.asarray(fft_autocorrelate_same(jnp.asarray(p)))
    for c in range(3):
        ref = sig.convolve(p[..., c], np.rot90(p[..., c], 2), mode="same")
        np.testing.assert_allclose(ours[..., c], ref, atol=5e-4)


def test_next_fast_len():
    for n in range(1, 700):
        m = _next_fast_len(n)
        assert m >= n
        x = m
        for p in (2, 3, 5):
            while x % p == 0:
                x //= p
        assert x == 1, f"{m} not 2/3/5-smooth"
        # tight: no smaller smooth number in between
        for cand in range(n, m):
            y = cand
            for p in (2, 3, 5):
                while y % p == 0:
                    y //= p
            assert y != 1


def test_pallas_conv_under_vmap_falls_back():
    """Mosaic can't lower the banded kernel under a batch axis; the
    custom_vmap rule must reroute to the stencil with identical results."""
    rng = np.random.default_rng(9)
    batch = jnp.asarray(rng.random((2, 40, 52, 3)), jnp.float32)
    k = jnp.asarray(rng.random((9, 9, 3)) / 81.0, jnp.float32)
    out = jax.jit(
        jax.vmap(lambda x: convolve_rgb(x, k, "same", "pallas"))
    )(batch)
    want = convolve_rgb(batch[0], k, "same", "stencil")
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want), atol=1e-6)


def test_pallas_tile_sizing_fits_scoped_vmem():
    """Band scratch + DOUBLE-BUFFERED output blocks must fit the 16 MB
    scoped-VMEM limit — under-counting the second out buffer produced a
    compile-time VMEM OOM (by 450 KB) on real v5e at 24 MP bf16."""
    import ml_dtypes

    from ics_tpu.ops.conv import _pallas_tile_h

    class Arr:
        def __init__(self, shape, dt):
            self.shape, self.dtype = shape, np.dtype(dt)

    for shape, dt in [
        ((3, 4003, 6005), ml_dtypes.bfloat16),  # the 24 MP bench level
        ((3, 4003, 6005), np.float32),
        ((3, 2005, 3005), ml_dtypes.bfloat16),
        ((3, 2005, 3005), np.float32),
    ]:
        tile_h = _pallas_tile_h(Arr(shape, dt), 9)
        assert tile_h is not None
        c, _, w = shape
        w_pad = -(-w // 128) * 128
        band = tile_h + 8
        need = c * w_pad * np.dtype(dt).itemsize * (band + 2 * tile_h)
        assert need < 16 * 2**20, (shape, dt, tile_h, need)


class TestPallasMXUConv:
    """ops/pallas_conv_mxu.py — the MXU-resident banded-matmul kernel
    (interpret mode here; hardware certification is bench.py --selftest)."""

    @pytest.mark.parametrize("mode", ["valid", "same", "full"])
    @pytest.mark.parametrize("mk,nk", [(9, 9), (5, 7), (3, 3)])
    def test_matches_scipy(self, mode, mk, nk):
        from scipy.signal import convolve2d as sp_conv

        from ics_tpu.ops.pallas_conv_mxu import conv_rgb_pallas_mxu

        rng = np.random.default_rng(17)
        a = rng.random((40, 50, 3)).astype(np.float32)
        k = rng.random((mk, nk, 3)).astype(np.float32)
        got = np.asarray(conv_rgb_pallas_mxu(jnp.asarray(a), jnp.asarray(k), mode=mode))
        want = np.stack(
            [sp_conv(a[..., c], k[..., c], mode=mode) for c in range(3)], axis=-1
        )
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_wide_frame_multiblock(self):
        """More than one 128-lane block exercises the band-matrix overhang."""
        from scipy.signal import convolve2d as sp_conv

        from ics_tpu.ops.pallas_conv_mxu import conv_rgb_pallas_mxu

        rng = np.random.default_rng(18)
        a = rng.random((24, 300, 3)).astype(np.float32)
        k = rng.random((9, 9, 3)).astype(np.float32)
        got = np.asarray(conv_rgb_pallas_mxu(jnp.asarray(a), jnp.asarray(k), mode="same"))
        want = np.stack(
            [sp_conv(a[..., c], k[..., c], mode="same") for c in range(3)], axis=-1
        )
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_dispatch_method_and_vmap_fallback(self):
        """method='pallas_mxu' goes through _dispatch; a vmapped call routes
        to the portable fallback with identical math."""
        from ics_tpu.ops.conv import convolve_rgb

        rng = np.random.default_rng(19)
        a = rng.random((4, 30, 40, 3)).astype(np.float32)
        k = rng.random((5, 5, 3)).astype(np.float32)
        want = np.stack(
            [np.asarray(convolve_rgb(x, k, mode="same", method="stencil")) for x in a]
        )
        single = np.stack(
            [np.asarray(convolve_rgb(x, k, mode="same", method="pallas_mxu")) for x in a]
        )
        batched = np.asarray(
            jax.vmap(lambda x: convolve_rgb(x, k, mode="same", method="pallas_mxu"))(
                jnp.asarray(a)
            )
        )
        np.testing.assert_allclose(single, want, atol=2e-5)
        np.testing.assert_allclose(batched, want, atol=2e-5)

    def test_mxu_tile_budget(self):
        from ics_tpu.ops.pallas_conv_mxu import mxu_tile_h

        # bf16 24 MP fits at a large tile; f32 shrinks; absurd budget -> None
        assert mxu_tile_h((3, 4000, 6000), 2, 9, 9) is not None
        assert mxu_tile_h((3, 4000, 6000), 4, 9, 9) in (32, 64)
        assert mxu_tile_h((3, 4000, 6000), 4, 9, 9, budget=1024) is None
