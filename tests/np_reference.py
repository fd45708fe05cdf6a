"""Clean-room NumPy/SciPy oracle of the reference RL-MM solver's
*as-checked-in* behavior, used to verify the TPU solver step-for-step.

Written from the behavioral spec in SURVEY.md §3.2 (iteration anatomy of
reference lib/deconvolution.pyx:341-675): TV(ut) buffers stay all-zero (the
calls are commented out in the reference), so the regularization reduces to
``lambd*gradu + (u - ut)/2`` and the image-denoise step is a no-op.  All
arithmetic in float32 via scipy.signal.convolve, like the reference.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import convolve


def _normalize_kernel(kern):
    kern = np.maximum(kern, 0.0)
    return kern / kern.sum(axis=(0, 1), keepdims=True)


def _rot180(a):
    return a[::-1, ::-1, ...]


def _whiteness_weights(h, w):
    pdf = lambda x: np.exp(-(x**2) / 2.0) / np.sqrt(2.0 * np.pi)
    ww = np.sqrt(np.outer(pdf(np.linspace(-1, 1, h)), pdf(np.linspace(-1, 1, w))))
    return (ww / ww.sum()).astype(np.float32)


def rl_mm_oracle(
    image,
    u,
    psf,
    top,
    bottom,
    left,
    right,
    tau,
    iterations,
    step_factor,
    lambd,
    blind=True,
    correlation=False,
):
    """Returns (u_cropped, psf, trajectory) where trajectory is the list of
    per-outer-iteration M_r values."""
    image = np.array(image, np.float32)
    u = np.array(u, np.float32)
    psf = np.array(psf, np.float32)
    m, n, _ = image.shape
    u_m, u_n, _ = u.shape
    mk = psf.shape[0]
    pad = (u_m - m) // 2
    inner_iter = 5
    weights = _whiteness_weights(bottom - top, right - left)

    psf_rot = _rot180(psf).copy()
    m_r = m_r_prev = 0.0
    stop = False
    it = 0
    traj = []
    error = np.zeros_like(image)

    while it < iterations and not stop:
        ut = u.copy()
        for _ in range(inner_iter):
            synth = np.stack(
                [convolve(u[..., c], psf[..., c], mode="valid") for c in range(3)],
                axis=-1,
            ).astype(np.float32)
            error = synth - image
            gradu = np.stack(
                [
                    convolve(error[..., c], psf_rot[..., c], mode="full")
                    for c in range(3)
                ],
                axis=-1,
            ).astype(np.float32)

            gcrop = gradu[pad:-pad, pad:-pad, :]
            dof = ((gcrop - image) / (gcrop + image)) ** 2
            if not blind:
                dof = dof / lambd

            gradu = lambd * gradu + (u - ut) / 2.0

            dt = (
                step_factor
                * (u.max(axis=(0, 1)) + 1.0 / (u_m * u_n))
                / (np.abs(gradu).max(axis=(0, 1)) + 1e-15)
            )
            u = u - dt * gradu

            u[pad:-pad, pad:-pad, :] = (1.0 - dof) * u[pad:-pad, pad:-pad, :] + dof * image

            if blind:
                error = (
                    np.stack(
                        [
                            convolve(u[..., c], psf[..., c], mode="valid")
                            for c in range(3)
                        ],
                        axis=-1,
                    ).astype(np.float32)
                    - image
                )
                u_rot = _rot180(u)
                gradk = np.stack(
                    [
                        convolve(u_rot[..., c], error[..., c], mode="valid")
                        for c in range(3)
                    ],
                    axis=-1,
                ).astype(np.float32)
                dtpsf = (
                    step_factor
                    / mk
                    * (psf.max() + 1.0 / (u_m * u_n * 3))
                    / (np.abs(gradk).max() + 1e-15)
                )
                psf = psf - dtpsf * gradk
                if correlation:
                    pm = psf.mean(axis=2, keepdims=True)
                    psf = np.broadcast_to(pm, psf.shape).copy()
                psf = _normalize_kernel(psf)
                psf_rot = _rot180(psf).copy()

        if it > 0:
            m_r_prev = m_r
        patch = error[top:bottom, left:right, :]
        test = (patch - patch.mean()) / patch.std()
        test = test / np.abs(test).max()
        test = np.stack(
            [
                convolve(test[..., c], np.rot90(test[..., c], 2), mode="same")
                for c in range(3)
            ],
            axis=-1,
        )
        test = test**2 * weights[..., None]
        m_r = float(test.mean())
        traj.append(m_r)

        if it > 1:
            if blind:
                stop = m_r > m_r_prev
            else:
                stop = (m_r - m_r_prev) / (m_r + m_r_prev) > tau
        it += 1

    return u[pad : pad + m, pad : pad + n, :], psf, traj, it, stop
