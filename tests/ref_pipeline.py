"""Reference PIPELINE replica driving the compiled reference SOLVER.

Replicates deconvolve.py:66-330 (preprocessing, pyramid, mask rescale, both
phases) in NumPy with the reference's in-place view-mutation semantics, and
calls the real compiled ``richardson_lucy_MM`` (tests/_reference_build.py)
for every level.  This is the end-to-end oracle the TPU pipeline is compared
against — the reference's own pipeline cannot run here (skimage is absent),
so its resize is stood in by ics_tpu.utils.resize.resize (order-3 B-spline,
edge mode, same sampling convention as skimage.transform.resize).
"""

from __future__ import annotations

import contextlib
import io
import re

import numpy as np

from ics_tpu.utils.resize import resize as sk_resize

from _reference_build import load_reference_solver


def pad_image(image, pad, mode="edge"):
    ch = [np.pad(image[..., c], pad, mode=mode) for c in range(3)]
    return np.ascontiguousarray(np.dstack(ch), np.float32)


def build_pyramid(psf_size):
    images, kernels = [1.0], [psf_size]
    while kernels[-1] > 3:
        kernels.append(int(np.ceil(kernels[-1] / np.sqrt(2))))
        images.append(images[-1] / np.sqrt(2))
        if kernels[-1] % 2 == 0:
            kernels[-1] -= 1
        if kernels[-1] < 3:
            kernels[-1] = 3
    return images, kernels


def run_reference_pipeline(
    pic,
    blur_width,
    mask,
    tolerance=1.0,
    quality="normal",
    bits=8,
    mask_size=255,
    iterations=200,
    confidence=10,
    phases=("blind", "non-blind"),
):
    """Returns (deblured_16bit, psf, per_level) where per_level is a list of
    (case, level, iterations_run, converged)."""
    ref = load_reference_solver()

    pic = np.ascontiguousarray(np.asarray(pic), np.float32)
    pic = pad_image(pic, (1, 1))
    pic = ((pic / (2**bits - 1)) ** (1 / 2.2)).astype(np.float32)

    step = {"normal": 1e-3, "high": 5e-4, "veryhigh": 1e-4, "low": 5e-3}[quality]
    M, N = pic.shape[:2]
    top = mask[0] - mask_size // 2
    bottom = mask[0] + mask_size // 2
    left = mask[1] - mask_size // 2
    right = mask[1] + mask_size // 2
    tolerance = tolerance / 100.0
    odd_vert = odd_hor = False
    if pic.shape[0] % 2 == 0:
        pic = pad_image(pic, ((1, 0), (0, 0)))
        odd_vert = True
    if pic.shape[1] % 2 == 0:
        pic = pad_image(pic, ((0, 0), (1, 0)))
        odd_hor = True
    M, N = pic.shape[:2]

    psf = np.dstack(
        [np.full((blur_width, blur_width), 1.0 / blur_width**2, np.float32)] * 3
    )
    images, kernels = build_pyramid(blur_width)

    per_level = []
    deblured = pic.copy()
    for case in phases:
        deblured = pic.copy()
        lambd = confidence * 1000
        for li, (i, k) in enumerate(zip(reversed(images), reversed(kernels))):
            tt, tb = int(i * top), int(i * bottom)
            tl, tr = int(i * left), int(i * right)
            if (tb - tt) % 2 == 0:
                if (tb - tt) < (tr - tl):
                    tb += 1
                elif (tb - tt) > (tr - tl):
                    tt += 1
                else:
                    tt -= 1
            if (tr - tl) % 2 == 0:
                if (tb - tt) < (tr - tl):
                    tl += 1
                elif (tb - tt) > (tb - tt):
                    tr += 1
                else:
                    tr -= -1
            tw, th = int(np.floor(i * N)), int(np.floor(i * M))
            if tw % 2 == 0:
                tw += 1
            if th % 2 == 0:
                th += 1
            shape = (th, tw, 3)
            temp_blurry = sk_resize(pic, shape).astype(np.float32)
            deblured = sk_resize(deblured, shape).astype(np.float32)
            if case == "blind":
                psf_copy = sk_resize(psf, (k, k)).astype(np.float32)
                ref.normalize_kernel(psf_copy, k)
            else:
                psf_copy = psf.copy()
                k = kernels[0]
            temp_blurry = pad_image(temp_blurry, (1, 1))
            deblured = pad_image(deblured, (1, 1))
            pad = int(np.floor(k / 2))
            tol_temp = tolerance if i == 1.0 else 0

            buf = io.StringIO()
            if case == "blind":
                with contextlib.redirect_stdout(buf):
                    out = ref.richardson_lucy_MM(
                        temp_blurry[tt - 1 : tb + 1, tl - 1 : tr + 1, ...],
                        deblured[tt - pad - 1 : tb + pad + 1,
                                 tl - pad - 1 : tr + pad + 1, ...],
                        psf_copy,
                        pad + 1, tb - tt - pad - 1, pad + 1, tb - tt - pad - 1,
                        0, tb - tt + 2, tr - tl + 2, 3, k,
                        iterations, step, lambd,
                        blind=True, p=1, correlation=0, order=2, norm=2,
                        priority=0, refocus=0,
                    )
                deblured[tt - 1 : tb + 1, tl - 1 : tr + 1, ...] = out
                psf = psf_copy.copy()
            else:
                deblured = pad_image(deblured, (pad, pad))
                with contextlib.redirect_stdout(buf):
                    out = ref.richardson_lucy_MM(
                        temp_blurry, deblured, psf_copy,
                        pad + 1, tb - tt - pad - 1, pad + 1, tb - tt - pad - 1,
                        tol_temp, th + 2, tw + 2, 3, k,
                        iterations, step, lambd,
                        blind=False, p=1, order=2, norm=2, priority=0,
                        refocus=0,
                    )
                deblured[pad:-pad, pad:-pad, ...] = out
                deblured = deblured[pad:-pad, pad:-pad, ...]

            temp_blurry = temp_blurry[1:-1, 1:-1, ...]
            deblured = deblured[1:-1, 1:-1, ...]
            m = re.search(
                r"(Convergence|Did not converge) after (\d+) iterations",
                buf.getvalue(),
            )
            per_level.append((case, li, int(m.group(2)), m.group(1) == "Convergence"))

    deblured = np.clip(deblured, 0, 1) ** 2.2 * (2**16 - 1)
    if odd_hor:
        deblured = deblured[:, 1:, ...]
    if odd_vert:
        deblured = deblured[1:, :, ...]
    deblured = deblured[1:-1, 1:-1, ...]
    return deblured, psf, per_level
