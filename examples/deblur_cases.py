"""Runnable example cases mirroring the reference's __main__ experiment block
(ref deconvolve.py:370-423) — its de-facto integration suite.

Each case is a function; run one with

    python examples/deblur_cases.py blured

By default images are read from the reference fixture set if present
(/root/reference/img) or from ./img.
"""

from __future__ import annotations

import os
import sys

from ics_tpu import deblur_module
from ics_tpu.utils.io import load_image

SOURCES = [p for p in ("/root/reference/img", "img") if os.path.isdir(p)]
SOURCE = SOURCES[0] if SOURCES else "img"
DEST = "out/richardson-lucy-deconvolution"


def case_blured():
    """The published benchmark case: blind TV-MM on blured.jpg
    (ref deconvolve.py:382-386; README.md:139-144)."""
    pic = load_image(os.path.join(SOURCE, "blured.jpg"))
    deblur_module(
        pic,
        "blured-v1",
        DEST,
        7,
        mask=[584, 795],
        display=False,
        tolerance=0.1,
        quality="normal",
        preview=False,
        blur="static",
        iterations=200,
    )


def case_crop_blured():
    """Small non-blind-friendly crop (BASELINE.json config 3)."""
    pic = load_image(os.path.join(SOURCE, "crop-blured.jpg"))
    deblur_module(
        pic,
        "crop-blured-v1",
        DEST,
        7,
        mask_size=255,
        display=False,
        tolerance=0.1,
        iterations=100,
    )


def case_153412_preview():
    """Large-image preview run with a chosen mask (ref deconvolve.py:412-416)."""
    pic = load_image(os.path.join(SOURCE, "153412.jpg"))
    deblur_module(
        pic,
        "153412-v1",
        DEST,
        9,
        mask=[1800, 3650],
        mask_size=811,
        display=False,
        preview=True,
        tolerance=100.0,
        iterations=100,
    )


def case_motion_blur():
    """Motion-blur mode: PSF channels tied together (ref deconvolve.py:376-378)."""
    pic = load_image(os.path.join(SOURCE, "blured.jpg"))
    deblur_module(
        pic,
        "blured-motion-v1",
        DEST,
        7,
        mask=[584, 795],
        blur="motion",
        display=False,
        tolerance=0.1,
        iterations=200,
    )


CASES = {
    "blured": case_blured,
    "crop": case_crop_blured,
    "153412": case_153412_preview,
    "motion": case_motion_blur,
}

if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "crop"
    os.makedirs(DEST, exist_ok=True)
    CASES[name]()
