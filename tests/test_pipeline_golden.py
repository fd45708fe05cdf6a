"""End-to-end pipeline golden test: deblur_module vs the reference pipeline
replica driving the COMPILED reference solver (tests/ref_pipeline.py).

This is pipeline-vs-pipeline over both phases (pyramid, mask rescale, resize,
halo write-back, gamma/16-bit postprocessing) — much stronger evidence than
the per-level solver parity tests."""

import os

import numpy as np
import pytest

from ics_tpu.models.pipeline import deblur_module
from ics_tpu.utils.metrics import ssim

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/img/blured.jpg"),
    reason="reference tree not mounted",
)


@pytest.fixture(scope="module")
def fixture_crop():
    from PIL import Image

    with Image.open("/root/reference/img/blured.jpg") as im:
        return np.asarray(im.crop((600, 420, 841, 661)), np.uint8)


def test_deblur_module_matches_reference_pipeline(fixture_crop):
    from ref_pipeline import run_reference_pipeline

    kw = dict(
        blur_width=5,
        mask=[120, 120],
        tolerance=0.1,
        mask_size=101,
        iterations=6,
    )
    want, psf_ref, per_level = run_reference_pipeline(fixture_crop, **kw)
    got = deblur_module(
        fixture_crop,
        "golden",
        None,
        kw["blur_width"],
        mask=kw["mask"],
        tolerance=kw["tolerance"],
        mask_size=kw["mask_size"],
        iterations=kw["iterations"],
        resize_backend="scipy",
        verbose=False,
    )
    assert got.shape == want.shape
    s = ssim(got / 65535.0, want / 65535.0, data_range=1.0)
    assert s >= 0.999, f"end-to-end pipeline SSIM {s} vs compiled reference"


def test_reference_pipeline_runs_full_iterations_without_stopping(fixture_crop):
    """The checked-in reference does NOT hit its whiteness stop on real
    photographs with default-style params (measured: 200/200/200 iterations
    on the full blured.jpg v29 case — the README's '325 iterations' describes
    an older revision).  Guard that our understanding stays true on the small
    fixture: every level runs to the cap, mirroring our pipeline's behavior."""
    from ref_pipeline import run_reference_pipeline

    _, _, per_level = run_reference_pipeline(
        fixture_crop,
        blur_width=5,
        mask=[120, 120],
        tolerance=0.1,
        mask_size=101,
        iterations=4,
        phases=("blind",),
    )
    assert [(c, it) for c, _, it, _ in per_level] == [("blind", 4), ("blind", 4)]
