"""CLI integration tests (the reference's __main__ experiment block analog,
ref deconvolve.py:370-423)."""

import numpy as np
import pytest

from ics_tpu.cli import main
from ics_tpu.utils.io import imread, imsave

RNG = np.random.default_rng(81)


@pytest.fixture()
def small_image(tmp_path):
    arr = np.clip(
        np.kron(60 + 140 * RNG.random((8, 8, 3)), np.ones((8, 8, 1))), 0, 255
    ).astype(np.uint8)
    path = tmp_path / "in.tif"
    imsave(str(path), arr)
    return str(path), arr


def test_cli_deblur(small_image, tmp_path):
    path, arr = small_image
    dest = str(tmp_path / "out")
    assert main([
        "deblur", path, dest, "--blur-width", "3", "--iterations", "3",
        "--mask-size", "25",
    ]) == 0
    out = imread(f"{dest}/in-deblurred.tif")
    assert out.shape == arr.shape and out.dtype == np.uint16


def test_cli_deblur_use_tv_collab(small_image, tmp_path):
    """--use-tv --tv-norm collab reaches the collaborative L^{inf,1,1}
    regularization path (ref README.md:113-114) from the CLI."""
    path, arr = small_image
    dest = str(tmp_path / "out")
    assert main([
        "deblur", path, dest, "--blur-width", "3", "--iterations", "2",
        "--mask-size", "25", "--use-tv", "--tv-norm", "collab",
    ]) == 0
    out = imread(f"{dest}/in-deblurred.tif")
    assert out.shape == arr.shape and out.dtype == np.uint16


def test_cli_deblur_pam_solver(small_image, tmp_path):
    path, arr = small_image
    dest = str(tmp_path / "out")
    assert main([
        "deblur", path, dest, "--blur-width", "3", "--iterations", "2",
        "--mask-size", "25", "--solver", "pam",
    ]) == 0
    assert imread(f"{dest}/in-deblurred.tif").shape == arr.shape


@pytest.mark.parametrize(
    "cmd,suffix",
    [
        (["usm", "--radius", "3"], "in-usm.tif"),
        (["bilateral", "--radius", "2"], "in-bilateral.tif"),
        (["bilateral-lab", "--radius", "2"], "in-bilateral-lab.tif"),
        (["tv-denoise", "--weight", "0.05", "--iterations", "10"], "in-tv-denoise.tif"),
    ],
)
def test_cli_filters(small_image, tmp_path, cmd, suffix):
    path, arr = small_image
    dest = str(tmp_path / "out")
    assert main([cmd[0], path, dest, *cmd[1:]]) == 0
    out = imread(f"{dest}/{suffix}")
    assert out.shape == arr.shape and out.dtype == np.uint16
    assert np.isfinite(out).all()


def test_cli_filters_16bit_scaling(small_image, tmp_path):
    """A 16-bit TIFF input must normalize by 65535, not the old hardcoded
    255 (which scaled it 257x wrong — ref deconvolve.py:97 honors bits).
    The same frame stored at 8 and at 16 bits must produce (nearly) the
    same output; and an explicit --bits override must be honored."""
    path8, arr = small_image
    arr16 = (arr.astype(np.uint16) * 257)  # same [0,1] signal at 16 bits
    path16 = str(tmp_path / "in16.tif")
    imsave(path16, arr16)

    dest8 = str(tmp_path / "o8")
    dest16 = str(tmp_path / "o16")
    assert main(["usm", path8, dest8, "--radius", "3"]) == 0
    assert main(["usm", path16, dest16, "--radius", "3"]) == 0
    out8 = imread(f"{dest8}/in-usm.tif").astype(np.float64)
    out16 = imread(f"{dest16}/in16-usm.tif").astype(np.float64)
    # 255/65535-quantization only; the old /255 bug made out16 clip to all-max
    assert np.abs(out8 - out16).max() <= 300
    assert not np.array_equal(out16, np.full_like(out16, 65535))

    # explicit --bits wins over the dtype-derived depth
    dest_b = str(tmp_path / "ob")
    assert main(["usm", path16, dest_b, "--radius", "3", "--bits", "16"]) == 0
    assert np.array_equal(imread(f"{dest_b}/in16-usm.tif"), out16.astype(np.uint16))


def test_cli_rejects_bad_args(small_image, tmp_path, capsys):
    path, _ = small_image
    with pytest.raises(SystemExit):
        main(["frobnicate", path, str(tmp_path)])
    with pytest.raises(ValueError, match="odd"):
        main(["deblur", path, str(tmp_path), "--blur-width", "4"])


def test_cli_psf_save_and_reuse(small_image, tmp_path, capsys):
    """Estimate a PSF on one shot, save it, then deblur reusing it with the
    blind phase skipped — the ref README.md:131-133 workflow."""
    path, arr = small_image
    dest = str(tmp_path / "out")
    ckpt = str(tmp_path / "psf.npz")
    assert main([
        "deblur", path, dest, "--blur-width", "3", "--iterations", "3",
        "--mask-size", "25", "--save-psf", ckpt,
    ]) == 0
    from ics_tpu.models.checkpoint import load_checkpoint

    stored = load_checkpoint(ckpt)
    assert stored.psf.shape == (3, 3, 3)
    assert stored.blur_width == 3
    capsys.readouterr()

    dest2 = str(tmp_path / "out2")
    assert main([
        "deblur", path, dest2, "--iterations", "3", "--mask-size", "25",
        "--psf", ckpt,
    ]) == 0
    printed = capsys.readouterr().out
    # only the non-blind phase ran: its banner appears, the blind one
    # doesn't (the pipeline prints "===== <case> DECONVOLUTION =====" in
    # lowercase, so match the exact banner prefixes)
    assert "===== non-blind DECONVOLUTION" in printed
    assert "===== blind DECONVOLUTION" not in printed
    out = imread(f"{dest2}/in-deblurred.tif")
    assert out.shape == arr.shape and out.dtype == np.uint16


def test_cli_deblur_requires_blur_width_or_psf(small_image, tmp_path):
    path, _ = small_image
    with pytest.raises(SystemExit):
        main(["deblur", path, str(tmp_path / "out"), "--iterations", "2"])


def test_cli_deblur_batch(small_image, tmp_path, capsys):
    """deblur-batch: PSF estimated once, applied to a burst as one vmapped
    solve (the README PSF-reuse workflow at batch scale), outputs matching
    per-frame results."""
    path, arr = small_image
    ckpt = str(tmp_path / "psf.npz")
    assert main([
        "deblur", path, str(tmp_path / "o1"), "--blur-width", "3",
        "--iterations", "3", "--mask-size", "25", "--save-psf", ckpt,
    ]) == 0

    burst = str(tmp_path / "burst")
    import os as _os
    _os.makedirs(burst)
    rng = np.random.default_rng(4)
    for i in range(3):
        frame = np.clip(
            arr.astype(np.int32) + rng.integers(-6, 6, arr.shape), 0, 255
        ).astype(np.uint8)
        imsave(f"{burst}/f{i}.tif", frame)

    dest = str(tmp_path / "ob")
    assert main([
        "deblur-batch", f"{burst}/f*.tif", dest, "--psf", ckpt,
        "--iterations", "4", "--mask-size", "25",
    ]) == 0
    printed = capsys.readouterr().out
    for i in range(3):
        out = imread(f"{dest}/f{i}-deblurred.tif")
        assert out.shape == arr.shape and out.dtype == np.uint16
        assert out.max() > 0
        assert f"f{i}-deblurred:" in printed


def test_cli_deblur_batch_sharded(small_image, tmp_path, capsys):
    """deblur-batch --shard N on the virtual mesh equals the unsharded
    run bit-for-bit (the batch axis is data-parallel)."""
    path, arr = small_image
    ckpt = str(tmp_path / "psf.npz")
    assert main([
        "deblur", path, str(tmp_path / "o1"), "--blur-width", "3",
        "--iterations", "2", "--mask-size", "25", "--save-psf", ckpt,
    ]) == 0
    burst = str(tmp_path / "burst")
    import os as _os
    _os.makedirs(burst)
    for i in range(4):
        imsave(f"{burst}/f{i}.tif", arr)

    d1, d2 = str(tmp_path / "u"), str(tmp_path / "s")
    assert main(["deblur-batch", f"{burst}/f*.tif", d1, "--psf", ckpt,
                 "--iterations", "3", "--mask-size", "25"]) == 0
    assert main(["deblur-batch", f"{burst}/f*.tif", d2, "--psf", ckpt,
                 "--iterations", "3", "--mask-size", "25",
                 "--shard", "2"]) == 0
    for i in range(4):
        np.testing.assert_array_equal(
            imread(f"{d1}/f{i}-deblurred.tif"),
            imread(f"{d2}/f{i}-deblurred.tif"),
        )


def test_cli_deblur_trace(small_image, tmp_path, capsys):
    path, _ = small_image
    assert main([
        "deblur", path, str(tmp_path / "out"), "--blur-width", "3",
        "--iterations", "2", "--mask-size", "25", "--trace",
    ]) == 0
    out = capsys.readouterr().out
    assert "stage profile" in out and "solve (non-blind)" in out
