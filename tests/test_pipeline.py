"""End-to-end deblur pipeline tests (ref deconvolve.py:24-368)."""

import numpy as np
import pytest

from ics_tpu import build_pyramid, deblur_module, pad_image

RNG = np.random.default_rng(17)


def test_build_pyramid_schedule():
    """Pyramid math must match the reference exactly (ref deconvolve.py:40-60)."""
    images, kernels = build_pyramid(13, 10.0)
    assert kernels[0] == 13
    assert all(k % 2 == 1 and k >= 3 for k in kernels)
    assert kernels[-1] == 3
    # scales shrink by sqrt(2)
    for a, b in zip(images, images[1:]):
        np.testing.assert_allclose(b, a / np.sqrt(2))
    # spot-check the exact schedule for width 13
    assert kernels == [13, 9, 7, 5, 3]


def test_build_pyramid_minimal():
    images, kernels = build_pyramid(3, 1.0)
    assert kernels == [3] and images == [1.0]


def test_pad_image_modes():
    img = RNG.random((4, 5, 3)).astype(np.float32)
    out = pad_image(img, (1, 1))
    assert out.shape == (6, 7, 3)
    np.testing.assert_allclose(out[1:-1, 1:-1], img)
    out2 = pad_image(img, ((1, 0), (0, 0)))
    assert out2.shape == (5, 5, 3)


def test_deblur_module_validations(tmp_path):
    pic = (RNG.random((64, 64, 3)) * 255).astype(np.uint8)
    with pytest.raises(ValueError, match="at least 3"):
        deblur_module(pic, "x", None, 1, verbose=False)
    with pytest.raises(ValueError, match="odd"):
        deblur_module(pic, "x", None, 4, verbose=False)
    with pytest.raises(ValueError, match="outside the picture"):
        deblur_module(pic, "x", None, 3, mask=[2, 2], mask_size=33, verbose=False)
    with pytest.raises(ValueError, match="unknown precision"):
        deblur_module(pic, "x", None, 3, mask_size=31, precision="float16",
                      verbose=False)
    with pytest.raises(ValueError, match="blind_budget"):
        deblur_module(pic, "x", None, 3, mask_size=31, blind_budget=0,
                      verbose=False)


def test_deblur_module_end_to_end(tmp_path):
    """Smallest full run: single-level pyramid, blind + non-blind phases,
    16-bit TIFF output."""
    # Synthetic scene: blurred blocks.  Kept away from 0 — the reference's
    # DoF mask divides by (gradu + image) with no epsilon (ref
    # lib/deconvolution.pyx:499), so near-zero pixels can blow up in either
    # implementation.
    sharp = np.kron(
        0.25 + 0.6 * RNG.random((12, 12, 3)), np.ones((8, 8, 1))
    ).astype(np.float32)
    import scipy.signal as sig
    from ics_tpu.ops.windows import gaussian_kernel

    k = gaussian_kernel(3, 1.0)
    blurry = np.stack(
        [sig.convolve(sharp[..., c], k, mode="same") for c in range(3)], axis=-1
    )
    pic8 = np.clip(blurry * 255, 0, 255).astype(np.uint8)

    ctimer = {}
    out = deblur_module(
        pic8,
        "test-deblur",
        str(tmp_path),
        3,
        mask_size=31,
        iterations=4,
        tolerance=10.0,
        verbose=False,
        compute_timer=ctimer,
    )
    assert out.shape == pic8.shape
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 65535
    # the bench's compute-only metric: upload-complete -> result-on-device
    assert ctimer.get("compute_s", 0.0) > 0.0 and "_t0" not in ctimer

    from ics_tpu.utils.io import imread

    saved = imread(str(tmp_path / "test-deblur.tif"))
    assert saved.dtype == np.uint16
    assert saved.shape == pic8.shape


def test_deblur_module_preview(tmp_path):
    pic8 = (RNG.random((72, 72, 3)) * 255).astype(np.uint8)
    out = deblur_module(
        pic8,
        "prev",
        str(tmp_path),
        3,
        mask_size=25,
        iterations=3,
        preview=True,
        verbose=False,
    )
    # preview crops to the mask window
    assert out.shape[0] < 72 and out.shape[1] < 72


def test_deblur_module_solver_variants(tmp_path):
    pic8 = np.clip(
        np.kron(0.3 + 0.5 * RNG.random((8, 8, 3)), np.ones((8, 8, 1))) * 255,
        0, 255,
    ).astype(np.uint8)
    for solver in ("pam", "pd"):
        out = deblur_module(
            pic8, f"s-{solver}", None, 3, mask_size=25, iterations=3,
            verbose=False, solver=solver,
        )
        assert out.shape == pic8.shape
        assert np.isfinite(out).all()


def test_deblur_module_records_trajectory():
    from ics_tpu.models.rl_mm import RLConfig

    pic8 = np.clip(
        np.kron(0.3 + 0.5 * RNG.random((8, 8, 3)), np.ones((8, 8, 1))) * 255,
        0, 255,
    ).astype(np.uint8)
    from ics_tpu import richardson_lucy_MM

    pic = pic8.astype(np.float32) / 255.0
    pad = 1
    u = np.pad(pic, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    psf = np.full((3, 3, 3), 1 / 9, np.float32)
    m = pic.shape[0]
    res = richardson_lucy_MM(
        pic, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, 0.0,
        iterations=4, step_factor=1e-3, lambd=1000.0, blind=True,
        config=RLConfig(record_metrics=True),
    )
    assert res.trajectory is not None
    assert len(res.trajectory["M_r"]) == res.iterations
    assert np.isfinite(res.trajectory["M_r"]).all()
    assert np.isfinite(res.trajectory["Hu"]).all()


def test_deblur_module_16bit_input(tmp_path):
    """bits=16 path: uint16 TIFF in, 16-bit TIFF out (ref deconvolve.py:79,97)."""
    pic16 = (
        np.kron(0.3 + 0.5 * RNG.random((8, 8, 3)), np.ones((8, 8, 1))) * 65535
    ).astype(np.uint16)
    out = deblur_module(
        pic16, "x16", str(tmp_path), 3, bits=16, mask_size=25, iterations=3,
        verbose=False,
    )
    assert out.shape == pic16.shape
    assert np.isfinite(out).all()
    from ics_tpu.utils.io import imread

    saved = imread(str(tmp_path / "x16.tif"))
    assert saved.dtype == np.uint16


def test_nonblind_levels_final_skips_coarse_scales():
    rng = np.random.default_rng(4)
    pic = np.clip(
        np.kron(60 + 140 * rng.random((8, 8, 3)), np.ones((8, 8, 1))), 0, 255
    ).astype(np.uint8)
    stats_all, stats_final = [], []
    deblur_module(pic, "a", None, 5, mask_size=25, iterations=2,
                  verbose=False, stats_out=stats_all)
    deblur_module(pic, "b", None, 5, mask_size=25, iterations=2,
                  verbose=False, stats_out=stats_final,
                  nonblind_levels="final")
    n_blind = sum(1 for s in stats_all if s["case"] == "blind")
    assert sum(1 for s in stats_final if s["case"] == "blind") == n_blind
    assert sum(1 for s in stats_all if s["case"] == "non-blind") == n_blind
    finals = [s for s in stats_final if s["case"] == "non-blind"]
    assert len(finals) == 1 and finals[0]["scale"] == 1.0

    with pytest.raises(ValueError):
        deblur_module(pic, "c", None, 5, mask_size=25, iterations=1,
                      verbose=False, nonblind_levels="some")


def test_preprocess_postprocess_jit_semantics():
    """The jitted glue matches the eager math: preprocess = pad+normalize+
    de-gamma of the raw integer frame; postprocess = clip+re-gamma+uint16
    with the NaN flag computed BEFORE the cast (a NaN would otherwise be
    silently mapped to an arbitrary integer)."""
    import jax.numpy as jnp

    from ics_tpu.models.pipeline import _postprocess_jit, _preprocess_jit

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 255, size=(6, 7, 3)).astype(np.uint8)
    got = np.asarray(_preprocess_jit(jnp.asarray(raw), 255))
    want = np.pad(raw.astype(np.float32), ((1, 1), (1, 1), (0, 0)),
                  mode="edge")
    want = (want / 255.0) ** (1 / 2.2)
    np.testing.assert_allclose(got, want, atol=2e-7)
    assert got.shape == (8, 9, 3)

    img = rng.random((5, 5, 3)).astype(np.float32) * 1.4 - 0.2  # out of range
    out, flag = _postprocess_jit(jnp.asarray(img))
    assert out.dtype == jnp.uint16 and not bool(flag)
    want16 = (np.clip(img, 0, 1) ** 2.2 * 65535).astype(np.uint16)
    np.testing.assert_allclose(np.asarray(out).astype(np.int64),
                               want16.astype(np.int64), atol=1)

    img_nan = img.copy()
    img_nan[2, 3, 1] = np.nan
    out2, flag2 = _postprocess_jit(jnp.asarray(img_nan))
    assert bool(flag2)  # flagged even though the uint16 cast hides it
    assert out2.dtype == jnp.uint16
