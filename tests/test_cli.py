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
