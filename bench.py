"""Headline benchmark: blind RL-TV deconvolution throughput on one chip.

Reproduces the reference's published benchmark case — blind TV-MM
deconvolution of img/blured.jpg (1394×1367 ≈ 1.9 MP), which took 189 s on
the reference's 8-thread CPU (ref README.md:139-144; BASELINE.md) — with the
same parameters as its __main__ invocation (ref deconvolve.py:382-386:
blur_width 7, mask [584, 795], tolerance 0.1, quality normal, 200
iterations).

Prints ONE JSON line: {"metric", "value" (MP/s/chip), "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ics_tpu_jax_cache")

import numpy as np

BASELINE_SECONDS = 189.0  # ref README.md:139-144
BASELINE_MEGAPIXELS = 1394 * 1367 / 1e6


def _load_fixture():
    from ics_tpu.utils.io import load_image

    path = "/root/reference/img/blured.jpg"
    if os.path.exists(path):
        return np.asarray(load_image(path))
    # Fallback: synthetic image of the same size
    rng = np.random.default_rng(0)
    return (rng.random((1367, 1394, 3)) * 255).astype(np.uint8)


def main():
    import jax

    from ics_tpu import deblur_module

    pic = _load_fixture()
    mp = pic.shape[0] * pic.shape[1] / 1e6

    kwargs = dict(
        blur_width=7,
        mask=[584, 795],
        display=False,
        tolerance=0.1,
        quality="normal",
        preview=False,
        blur="static",
        iterations=200,
        verbose=False,
    )

    # Warmup: compile every pyramid level's program (the reference's CPU
    # baseline has no compile step; XLA's persistent cache plays the FFTW
    # wisdom role, ref README.md:135-136).
    t0 = time.time()
    deblur_module(pic, "bench-warmup", None, **kwargs)
    warm = time.time() - t0
    print(f"warmup (incl. compile): {warm:.2f}s", file=sys.stderr)

    t0 = time.time()
    out = deblur_module(pic, "bench", None, **kwargs)
    elapsed = time.time() - t0
    assert np.isfinite(out).all()

    mp_per_s = mp / elapsed
    baseline_mp_per_s = BASELINE_MEGAPIXELS / BASELINE_SECONDS
    result = {
        "metric": "blind RL-TV-MM deconvolution of img/blured.jpg (1.9MP), full pipeline",
        "value": round(mp_per_s, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(mp_per_s / baseline_mp_per_s, 2),
        "elapsed_s": round(elapsed, 3),
        "baseline_s": BASELINE_SECONDS,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
