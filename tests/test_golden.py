"""Golden-image quality regression against the reference's img/ corpus.

The reference's QA was manual golden-image inspection of its img/ galleries
(ref img/README.md, SURVEY §4).  The checked-in triple crop-blured.jpg /
crop-original.jpg / crop-deblurred.jpg gives an OBJECTIVE version of it:
crop-original is the ground truth, crop-blured the synthetic-blur input and
crop-deblurred the reference's own published result — so we can assert our
end-to-end output quality beats the bar the reference itself achieved.

Measured bars (against crop-original):
  crop-blured     SSIM 0.8844  PSNR 35.24   (the input)
  crop-deblurred  SSIM 0.8821  PSNR 35.51   (the reference's result)
  ours (bw=5)     SSIM 0.9027  PSNR 35.93   (round-2 measurement)
"""

import os

import numpy as np
import pytest

from ics_tpu.utils.metrics import psnr, ssim

IMG = "/root/reference/img"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(IMG, "crop-blured.jpg")),
    reason="reference image corpus not mounted",
)


@pytest.fixture(scope="module")
def crops():
    from PIL import Image

    def load(name):
        with Image.open(os.path.join(IMG, name)) as im:
            return np.asarray(im, np.float32) / 255.0

    return {
        "blured": load("crop-blured.jpg"),
        "original": load("crop-original.jpg"),
        "deblurred_ref": load("crop-deblurred.jpg"),
    }


def test_deblur_beats_reference_published_quality(crops, tmp_path):
    """End-to-end blind deblur of the reference's blurred crop must beat the
    quality of the reference's own published deblurred crop, measured
    against the ground-truth original.

    Runs in a pinned 1-device CPU subprocess: the residual-whiteness stop
    is numerically chaotic, so the stopping iteration (and with it final
    quality) shifts with fp reduction order — the 8-virtual-device test mesh
    produces a different (worse) trajectory than the canonical single
    device.  Quality bars are only meaningful on a fixed configuration."""
    import subprocess
    import sys

    out_npy = tmp_path / "deblur.npy"
    child = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from PIL import Image
from ics_tpu.models.pipeline import deblur_module
with Image.open({os.path.join(IMG, 'crop-blured.jpg')!r}) as im:
    pic = np.asarray(im, np.uint8)
out = deblur_module(pic, 'golden-deblur', None, 5, mask=[275, 275],
                    mask_size=255, tolerance=0.1, iterations=50,
                    verbose=False)
np.save({str(out_npy)!r}, out)
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", child], env=env, capture_output=True,
        text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr
    out = np.load(out_npy).astype(np.float32) / 65535.0

    truth = crops["original"]
    ref_ssim = ssim(crops["deblurred_ref"], truth, data_range=1.0)  # 0.8821
    ref_psnr = psnr(crops["deblurred_ref"], truth, 1.0)  # 35.51

    got_ssim = ssim(out, truth, data_range=1.0)
    got_psnr = psnr(out, truth, 1.0)
    assert got_ssim >= ref_ssim, (got_ssim, ref_ssim)
    assert got_psnr >= ref_psnr, (got_psnr, ref_psnr)
    # absolute floors so a simultaneous corpus change can't mask a regression
    assert got_ssim >= 0.89
    assert got_psnr >= 35.5


def test_tv_denoise_improves_noisy_image(crops):
    """Chambolle TV denoise must recover PSNR on a noised ground truth."""
    from ics_tpu.models.tv_denoise import tv_denoise

    rng = np.random.default_rng(7)
    truth = crops["original"][:256, :256]
    noisy = np.clip(truth + rng.normal(0, 0.05, truth.shape), 0, 1).astype(
        np.float32
    )
    den = np.asarray(tv_denoise(noisy, weight=0.1, iterations=50))
    assert psnr(den, truth, 1.0) > psnr(noisy, truth, 1.0) + 2.0


def test_bilateral_lab_improves_noisy_image(crops):
    """The bilateral-LAB workflow (ref img/bilateral-LAB gallery) must
    denoise: higher PSNR vs ground truth than the noisy input."""
    from ics_tpu.utils.filters import bilateral_lab

    rng = np.random.default_rng(8)
    truth = crops["original"][100:228, 100:228]
    noisy = np.clip(truth + rng.normal(0, 0.04, truth.shape), 0, 1).astype(
        np.float32
    )
    out = np.asarray(
        bilateral_lab(noisy, radius=4, std_i=15.0, std_s=4.0,
                      luminance_only=False)
    )
    # measured: 28.1 dB noisy -> 33.8 dB filtered
    assert psnr(out, truth, 1.0) > psnr(noisy, truth, 1.0) + 4.0


def test_usm_sharpens_blurred_image(crops):
    """USM (ref img/bilateral-unsharp-mask gallery) must increase gradient
    energy on a blurred input while staying close to the sharp original."""
    from ics_tpu.utils.filters import USM

    blur = crops["blured"][100:356, 100:356]
    truth = crops["original"][100:356, 100:356]
    out = np.stack(
        [np.asarray(USM(blur[..., c], 5, 2.0, 1.0)) for c in range(3)],
        axis=-1,
    )

    def grad_energy(a):
        return float(np.mean(np.diff(a, axis=0) ** 2) + np.mean(np.diff(a, axis=1) ** 2))

    # measured: 1.85x gradient energy AND +0.27 dB PSNR toward the original
    assert grad_energy(out) > 1.5 * grad_energy(blur)
    assert psnr(np.clip(out, 0, 1), truth, 1.0) >= psnr(blur, truth, 1.0)


def test_pam_pd_quality_bars(crops, tmp_path):
    """Quality characterization of the rebuilt TV-PAM / TV-PD families
    (ref README.md:42-44 lists them; the tree only ships MM).

    The reference's own claim — "PAM never reaches the sharp picture, but
    comes close" (ref README.md:146-148) — is encoded against the MM
    golden value: PAM must land above the blurred input and the
    reference's published result, but below MM.

    Measured (same protocol as the MM golden: blind, bw=5, 50 iters,
    single CPU device):
        input  SSIM 0.8844  PSNR 35.24
        MM     SSIM 0.9027  PSNR 35.93
        PAM    SSIM 0.8886  PSNR 35.63   <- close-but-below MM
        PD     SSIM 0.9033  PSNR 36.12   <- r5, edgetaper (r4: 0.8978/34.01)
    r4 had PD's PSNR pinned BELOW the blurred input (34.01 — the circular
    Fourier data prox turned the border wrap seam into ringing that the
    caller-side edge pad only pushed outward).  The r5 edgetaper
    (rl_pd.py::_edgetaper — blur-weighted boundary blend, MATLAB
    ``edgetaper``'s construction) erased that regression: PSNR is now
    ABOVE the input and SSIM marginally above even the MM parity value.
    The r5 (λ_tv × step) grid re-run plateaus at 0.8986-0.9033 with the
    r4 winner (1e-4, 0.05) still on top — the VERDICT-r4 "PD ≥ 0.91"
    stretch bar is NOT reached (documented negative result; the remaining
    gap is the prox's noise amplification on the JPEG input, not the
    boundary).
    """
    import subprocess
    import sys

    outs = {}
    for solver in ("pam", "pd"):
        out_npy = tmp_path / f"{solver}.npy"
        child = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from PIL import Image
from ics_tpu.models.pipeline import deblur_module
with Image.open({os.path.join(IMG, 'crop-blured.jpg')!r}) as im:
    pic = np.asarray(im, np.uint8)
out = deblur_module(pic, 'g', None, 5, mask=[275, 275], mask_size=255,
                    tolerance=0.1, iterations=50, verbose=False,
                    solver={solver!r})
np.save({str(out_npy)!r}, out)
"""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = ""
        proc = subprocess.run(
            [sys.executable, "-c", child], env=env, capture_output=True,
            text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr
        outs[solver] = np.load(out_npy).astype(np.float32) / 65535.0

    truth = crops["original"]
    in_ssim = ssim(crops["blured"], truth, data_range=1.0)  # 0.8844
    mm_ssim = 0.9027  # the MM golden measurement (test above)

    pam_ssim = ssim(outs["pam"], truth, data_range=1.0)
    pam_psnr = psnr(outs["pam"], truth, 1.0)
    # "comes close, never reaches": strictly between the input and MM
    assert in_ssim < pam_ssim < mm_ssim, (in_ssim, pam_ssim, mm_ssim)
    assert pam_psnr >= 35.4, pam_psnr

    pd_ssim = ssim(outs["pd"], truth, data_range=1.0)
    pd_psnr = psnr(outs["pd"], truth, 1.0)
    assert pd_ssim > in_ssim, (pd_ssim, in_ssim)
    assert pd_ssim >= 0.90, pd_ssim
    # the r5 edgetaper erased the r4 PSNR-below-input regression: PD must
    # now beat the blurred input on BOTH metrics (input PSNR 35.24)
    in_psnr = psnr(crops["blured"], truth, 1.0)  # 35.24
    assert pd_psnr > in_psnr, (pd_psnr, in_psnr)
    assert pd_psnr >= 35.9, pd_psnr


def test_deblur_early_stop_quality(crops, tmp_path):
    """The opt-in whiteness-plateau early stop (RLConfig.early_stop) must
    not cost end-to-end quality: same golden protocol as the parity test,
    same bars.  (Measured r3: identical SSIM 0.9027 / PSNR 35.93 — on this
    crop the non-blind levels converge via the parity rule first; the
    plateau pays off on large frames whose coarse levels burn the budget.)
    """
    import subprocess
    import sys

    out_npy = tmp_path / "deblur_es.npy"
    child = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from PIL import Image
from ics_tpu.models.pipeline import deblur_module
with Image.open({os.path.join(IMG, 'crop-blured.jpg')!r}) as im:
    pic = np.asarray(im, np.uint8)
out = deblur_module(pic, 'g', None, 5, mask=[275, 275], mask_size=255,
                    tolerance=0.1, iterations=50, verbose=False,
                    early_stop=1e-3)
np.save({str(out_npy)!r}, out)
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", child], env=env, capture_output=True,
        text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr
    out = np.load(out_npy).astype(np.float32) / 65535.0

    truth = crops["original"]
    assert ssim(out, truth, data_range=1.0) >= 0.89
    assert psnr(out, truth, 1.0) >= 35.5


def test_deblur_hybrid_precision_quality(crops, tmp_path):
    """precision='hybrid' (mixed on LARGE coarse non-blind levels, exact
    f32 on the final full-resolution level, the blind phase, and every
    level under ~2 MP) must hold the golden bars.  On this small fixture
    every level sits below the size threshold, so hybrid must match the
    parity pipeline — measured r4: WITHOUT the threshold the mixed coarse
    level re-rolls the final level's chaotic whiteness stop for
    0.85/34.5 vs parity's 0.9027/35.93 while saving nothing (sub-second
    solves), which is exactly why small levels keep exact f32.  The
    large-frame deviation is characterized at the 24 MP bench scale in
    docs/PERFORMANCE.md "Precision modes".  Same pinned 1-device CPU
    protocol as the parity test."""
    import subprocess
    import sys

    out_npy = tmp_path / "deblur_hybrid.npy"
    child = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from PIL import Image
from ics_tpu.models.pipeline import deblur_module
with Image.open({os.path.join(IMG, 'crop-blured.jpg')!r}) as im:
    pic = np.asarray(im, np.uint8)
out = deblur_module(pic, 'g', None, 5, mask=[275, 275], mask_size=255,
                    tolerance=0.1, iterations=50, verbose=False,
                    precision='hybrid')
np.save({str(out_npy)!r}, out)
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", child], env=env, capture_output=True,
        text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr
    out = np.load(out_npy).astype(np.float32) / 65535.0

    truth = crops["original"]
    assert ssim(out, truth, data_range=1.0) >= 0.89
    assert psnr(out, truth, 1.0) >= 35.5


def test_deblur_blind_budget_quality(crops, tmp_path):
    """blind_budget (coarse blind levels capped, final level full budget)
    must hold the golden bars: the coarse PSF estimates only seed the next
    level's refinement.  Cap at half the budget here; the measured curve
    on the bench case is in docs/PERFORMANCE.md "Blind budget"."""
    import subprocess
    import sys

    out_npy = tmp_path / "deblur_bb.npy"
    child = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from PIL import Image
from ics_tpu.models.pipeline import deblur_module
with Image.open({os.path.join(IMG, 'crop-blured.jpg')!r}) as im:
    pic = np.asarray(im, np.uint8)
out = deblur_module(pic, 'g', None, 5, mask=[275, 275], mask_size=255,
                    tolerance=0.1, iterations=50, verbose=False,
                    blind_budget=25)
np.save({str(out_npy)!r}, out)
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", child], env=env, capture_output=True,
        text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr
    out = np.load(out_npy).astype(np.float32) / 65535.0

    truth = crops["original"]
    assert ssim(out, truth, data_range=1.0) >= 0.89
    assert psnr(out, truth, 1.0) >= 35.5


def test_collaborative_tv_chroma(crops, tmp_path):
    """The collaborative L^{inf,1,1} RGB TV norm (ref README.md:113-114,
    "handcuffs between channels ... helps dramatically in chromatic noise
    removal", citing ipol.im/pub/art/2016/141) must beat the per-channel
    TV on a chromatic-noise fixture.

    Protocol: ground truth rescaled into [0.05, 0.95] plus PURE-CHROMA
    Gaussian noise (per-channel noise minus its luma component), solved
    through the MM use_tv path with a DELTA PSF and a FIXED iteration
    count.  The delta kernel isolates the REGULARIZER (the solve is pure
    TV denoising through the exact solver dataflow) and keeps the
    comparison away from the residual-whiteness stop, whose chaotic
    trajectory re-rolls across environments and swallows small margins
    (see memory of r4: the blur-deconvolution variant's 0.002-SSIM margins
    were not reproducible; this protocol is bitwise process-stable).

    Measured (r4, pinned single CPU device, it=150, lambda=100):
        input             SSIM 0.2601  PSNR 23.74  chromaPSNR 23.75
        use_tv channel    SSIM 0.2616  PSNR 23.78  chromaPSNR 23.78
        use_tv collab     SSIM 0.3033  PSNR 24.76  chromaPSNR 24.80
        use_tv collab_l2  SSIM 0.2976  PSNR 24.63  chromaPSNR 24.67
    collab wins all three metrics by fat margins (+0.042 SSIM, +1.0 dB);
    the same ordering held at lambda in {10, 30, 100} and it in {50, 150,
    300}.  The softer ℓ²-color coupling ('collab_l2', the Duran et al.
    ℓ^{2,1,1} class) lands between 'channel' and 'collab' on every
    metric — exactly where its per-pixel charge (RMS vs max over
    channels) says it should.  See PERFORMANCE.md "Collaborative TV".
    """
    import subprocess
    import sys

    out_npz = tmp_path / "collab.npz"
    child = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from PIL import Image
from ics_tpu.models.rl_mm import richardson_lucy_MM, RLConfig

with Image.open({os.path.join(IMG, 'crop-original.jpg')!r}) as im:
    truth = np.asarray(im, np.float32) / 255.0
truth = (0.05 + 0.9 * truth[100:356, 100:356]).astype(np.float32)
rng = np.random.default_rng(42)
n = rng.normal(0, 0.08, truth.shape).astype(np.float32)
noisy = np.clip(truth + n - n.mean(axis=2, keepdims=True), 0.02, 1).astype(np.float32)
delta = np.zeros((5, 5), np.float32); delta[2, 2] = 1.0
psf = np.dstack([delta] * 3)
u0 = np.pad(noisy, ((2, 2), (2, 2), (0, 0)), mode='edge')
outs = {{'noisy': noisy, 'truth': truth}}
for tvn in ('channel', 'collab', 'collab_l2'):
    r = richardson_lucy_MM(noisy, u0, psf, 0, 256, 0, 256, 1e9,
        iterations=150, blind=False, lambd=100.0, step_factor=1e-3,
        config=RLConfig(use_tv=True, tv_norm=tvn))
    outs[tvn] = np.clip(np.asarray(r.u), 0, 1)
np.savez({str(out_npz)!r}, **outs)
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", child], env=env, capture_output=True,
        text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr
    d = np.load(out_npz)
    truth = d["truth"]

    def chroma(a):
        return a - a.mean(axis=2, keepdims=True)

    def metrics(a):
        return (
            ssim(a, truth, data_range=1.0),
            psnr(a, truth, 1.0),
            psnr(chroma(a), chroma(truth), 1.0),
        )

    m_in = metrics(d["noisy"])
    m_ch = metrics(d["channel"])
    m_co = metrics(d["collab"])
    m_l2 = metrics(d["collab_l2"])
    # BOTH collaborative couplings beat per-channel AND the input on SSIM,
    # PSNR and the chroma-noise metric
    for i in range(3):
        assert m_co[i] > m_ch[i], (i, m_co, m_ch)
        assert m_co[i] > m_in[i], (i, m_co, m_in)
        assert m_l2[i] > m_ch[i], (i, m_l2, m_ch)
        assert m_l2[i] > m_in[i], (i, m_l2, m_in)
    # the margins are structural, not noise: +0.04 SSIM, +0.9 dB measured
    assert m_co[0] >= m_ch[0] + 0.03, (m_co[0], m_ch[0])
    assert m_co[1] >= m_ch[1] + 0.8, (m_co[1], m_ch[1])
    assert m_co[2] >= m_ch[2] + 0.8, (m_co[2], m_ch[2])
    # the l2 coupling's softer handcuff: +0.035/+0.85 dB over channel
    # measured (0.2976/24.63/24.67), floors with platform-drift slack
    assert m_l2[0] >= m_ch[0] + 0.025, (m_l2[0], m_ch[0])
    assert m_l2[1] >= m_ch[1] + 0.7, (m_l2[1], m_ch[1])
    # absolute floors at the measured values (slack for platform drift)
    assert m_co[0] >= 0.295 and m_co[1] >= 24.6 and m_co[2] >= 24.6, m_co
    assert m_l2[0] >= 0.29 and m_l2[1] >= 24.5 and m_l2[2] >= 24.5, m_l2


def test_use_tv_golden_quality(crops, tmp_path):
    """Golden-quality characterization of the intended-math mode
    (``use_tv=True`` — the live TV(ut) branch the reference comments out,
    ref lib/deconvolution.pyx:464-465, 516-517).

    Measured (r4, same protocol as the parity golden, pinned 1-device CPU;
    stable across confidence 1/3/10, degrading at 30):
        parity (use_tv=False)      SSIM 0.9027  PSNR 35.93
        use_tv channel             SSIM 0.8834  PSNR 35.21
        use_tv collab              SSIM 0.8842  PSNR 35.22
        (blurred input             SSIM 0.8844  PSNR 35.24)
    On this blind golden fixture the intended math LOSES ~0.02 SSIM to the
    as-checked-in parity dataflow — the reference author's decision to
    comment the TV(ut) calls out is quality-justified here, and parity
    stays our default.  The TV mode's value shows up on chromatic noise
    (test_collaborative_tv_chroma), not on this achromatic fixture.  This
    test pins the measured envelope so solver changes can't silently
    corrupt the TV path.
    """
    import subprocess
    import sys

    outs = {}
    for tvn in ("channel", "collab"):
        out_npy = tmp_path / f"usetv_{tvn}.npy"
        child = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from PIL import Image
from ics_tpu.models.pipeline import deblur_module
from ics_tpu.models.rl_mm import RLConfig
with Image.open({os.path.join(IMG, 'crop-blured.jpg')!r}) as im:
    pic = np.asarray(im, np.uint8)
out = deblur_module(pic, 'g', None, 5, mask=[275, 275], mask_size=255,
                    tolerance=0.1, iterations=50, verbose=False,
                    config=RLConfig(use_tv=True, tv_norm={tvn!r}))
np.save({str(out_npy)!r}, out)
"""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = ""
        proc = subprocess.run(
            [sys.executable, "-c", child], env=env, capture_output=True,
            text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr
        outs[tvn] = np.load(out_npy).astype(np.float32) / 65535.0

    truth = crops["original"]
    for tvn, out in outs.items():
        s = ssim(out, truth, data_range=1.0)
        p = psnr(out, truth, 1.0)
        # the measured envelope: ~input quality, not corrupted
        assert s >= 0.88, (tvn, s)
        assert p >= 35.0, (tvn, p)
        # the characterized gap vs the parity golden (0.9027) is real: if
        # use_tv ever BEATS parity here, the comment above is stale —
        # surface it rather than silently passing
        assert s <= 0.905, (tvn, s)


def test_deblur_fast_profile_quality(crops, tmp_path):
    """`deblur --profile fast` (VERDICT r4 item 9: the measured opt-in
    ladder as ONE flag — blind-budget 25 + early-stop 1e-3 + precision
    'high') must hold the same golden bars as the parity run.  Driven
    through the real CLI in the pinned 1-device CPU protocol; off-TPU the
    'high' conv split degrades to exact f32 (ops/conv.py::_dispatch), so
    this gates the budget/early-stop components — the bf16x3 component's
    24 MP quality is measured on hardware (docs/PERFORMANCE.md
    "Fast profile")."""
    import subprocess
    import sys

    out_dir = tmp_path / "fastprof"
    out_dir.mkdir()
    child = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
from ics_tpu.cli import main
main(['deblur', {os.path.join(IMG, 'crop-blured.jpg')!r}, {str(out_dir)!r},
      '--blur-width', '5', '--mask', '275', '275', '--mask-size', '255',
      '--tolerance', '0.1', '--iterations', '50', '--profile', 'fast'])
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", child], env=env, capture_output=True,
        text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr

    from ics_tpu.utils.io import imread

    out = imread(str(out_dir / "crop-blured-deblurred.tif"))
    out = np.asarray(out, np.float32) / 65535.0
    truth = crops["original"]
    assert ssim(out, truth, data_range=1.0) >= 0.89
    assert psnr(out, truth, 1.0) >= 35.5
