"""Chromatic-noise removal with the collaborative RGB TV norms.

Demonstrates the reference's headline mathematical contribution (ref
README.md:113-117: the collaborative L^{infinite,1,1} RGB total-variation
norm "acts as handcuffs between channels and helps dramatically in
chromatic noise removal", citing ipol.im/pub/art/2016/141) through the
MM solver's intended-math TV path: a delta PSF turns the solve into pure
TV denoising, isolating the regularizer.

Couplings compared (RLConfig.tv_norm):
  channel   — decoupled per-channel TV (the literal dead-branch math)
  collab    — L^{inf,1,1}: per-pixel channel SUP (the reference's norm)
  collab_l2 — l2-color RMS coupling (Duran et al.'s l^{2,1,1} class)

    python examples/chroma_denoise.py [input.jpg] [output_dir]

Runs on a 256x256 crop by default so it finishes in seconds on CPU.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM
from ics_tpu.utils.io import load_image, save
from ics_tpu.utils.metrics import psnr, ssim


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    src = argv[0] if argv else "/root/reference/img/crop-original.jpg"
    dest = argv[1] if len(argv) > 1 else "/tmp/chroma_denoise"
    os.makedirs(dest, exist_ok=True)

    truth = load_image(src).astype(np.float32)
    truth /= truth.max()
    truth = (0.05 + 0.9 * truth[:256, :256]).astype(np.float32)

    # pure-chroma Gaussian noise: per-channel noise minus its luma part
    rng = np.random.default_rng(42)
    n = rng.normal(0, 0.08, truth.shape).astype(np.float32)
    noisy = np.clip(
        truth + n - n.mean(axis=2, keepdims=True), 0.02, 1
    ).astype(np.float32)

    # delta PSF => the MM solve is pure TV denoising (regularizer only)
    delta = np.zeros((5, 5), np.float32)
    delta[2, 2] = 1.0
    psf = np.dstack([delta] * 3)
    u0 = np.pad(noisy, ((2, 2), (2, 2), (0, 0)), mode="edge")
    h, w = noisy.shape[:2]

    def chroma(a):
        return a - a.mean(axis=2, keepdims=True)

    def report(name, a):
        print(
            "%-10s SSIM %.4f  PSNR %6.2f  chroma-PSNR %6.2f"
            % (
                name,
                ssim(a, truth, data_range=1.0),
                psnr(a, truth, 1.0),
                psnr(chroma(a), chroma(truth), 1.0),
            )
        )
        save(np.clip(a, 0, 1) * 65535.0, "%s.tif" % name, dest)

    report("noisy", noisy)
    for tv_norm in ("channel", "collab", "collab_l2"):
        res = richardson_lucy_MM(
            noisy, u0, psf, 0, h, 0, w, 1e9,
            iterations=150, blind=False, lambd=100.0, step_factor=1e-3,
            config=RLConfig(use_tv=True, tv_norm=tv_norm),
        )
        report(tv_norm, np.clip(np.asarray(res.u), 0, 1))
    print("outputs in", dest)


if __name__ == "__main__":
    main()
