"""Aux subsystems: checkpoint/resume and tracing (SURVEY.md §5)."""


import numpy as np

from ics_tpu.models.checkpoint import (
    SolverCheckpoint,
    load_checkpoint,
    save_checkpoint,
)
from ics_tpu.utils.trace import Tracer, block_and_time

RNG = np.random.default_rng(51)


def test_checkpoint_roundtrip(tmp_path):
    psf = RNG.random((7, 7, 3)).astype(np.float32)
    u = RNG.random((32, 32, 3)).astype(np.float32)
    ck = SolverCheckpoint(psf=psf, u=u, blur_width=7, iterations_done=42,
                          M_r=1.5e-4, phase="non-blind")
    path = str(tmp_path / "state.npz")
    save_checkpoint(path, ck)
    back = load_checkpoint(path)
    np.testing.assert_array_equal(back.psf, psf)
    np.testing.assert_array_equal(back.u, u)
    assert back.blur_width == 7
    assert back.iterations_done == 42
    assert abs(back.M_r - 1.5e-4) < 1e-10
    assert back.phase == "non-blind"


def test_checkpoint_minimal(tmp_path):
    ck = SolverCheckpoint(psf=RNG.random((3, 3, 3)).astype(np.float32))
    path = str(tmp_path / "psf.npz")
    save_checkpoint(path, ck)
    back = load_checkpoint(path)
    assert back.u is None
    assert back.blur_width is None
    assert back.phase == "blind"


def test_tracer_accumulates():
    tr = Tracer()
    with tr.stage("a"):
        pass
    with tr.stage("a"):
        pass
    with tr.stage("b"):
        pass
    report = tr.report()
    assert "a" in report and "(2×)" in report
    assert "b" in report


def test_block_and_time():
    import jax.numpy as jnp

    out, dt = block_and_time(lambda x: jnp.sum(x * 2), jnp.ones((8, 8)))
    assert float(out) == 128.0
    assert dt >= 0


def test_pipeline_trace_stages(capsys):
    """deblur_module(trace=...) produces the per-stage profile (VERDICT r2:
    Tracer must have a production call path, not live in tests only)."""
    import numpy as np

    from ics_tpu import deblur_module

    rng = np.random.default_rng(5)
    pic = (rng.random((40, 40, 3)) * 255).astype(np.uint8)

    tr = Tracer()
    deblur_module(pic, "t", None, 3, iterations=2, mask_size=25,
                  verbose=False, trace=tr)
    report = tr.report()
    for stage in ("upload + preprocess", "resize + pad", "solve (blind)",
                  "solve (non-blind)", "postprocess + download"):
        assert stage in report, report

    # trace=True prints the report when verbose
    deblur_module(pic, "t", None, 3, iterations=2, mask_size=25,
                  verbose=True, trace=True)
    out = capsys.readouterr().out
    assert "stage profile" in out and "solve (non-blind)" in out


# ---- blind-restoration success harness (bench.py --success-rate) --------
# The measured battery itself runs on TPU via bench.py; these tests pin the
# harness MACHINERY (battery construction, forward model, metric) on CPU.


def test_success_battery_construction():
    from ics_tpu.utils.selftest import make_success_battery

    battery = make_success_battery()
    assert len(battery) == 12
    names = [n for n, _, _ in battery]
    assert len(set(names)) == 12
    assert sum(n.startswith("motion") for n in names) == 2  # blur="motion"
    for name, psf, noise in battery:
        assert psf.ndim == 2 and psf.shape[0] == psf.shape[1]
        assert psf.shape[0] % 2 == 1 and psf.shape[0] >= 3  # pipeline rule
        assert abs(float(psf.sum()) - 1.0) < 1e-5
        assert float(psf.min()) >= 0.0
        assert noise >= 0.0


def test_success_synth_and_metric():
    from ics_tpu.utils.selftest import (
        _sharp_crop,
        make_success_battery,
        rel_error,
        synth_blur_case,
    )

    sharp = _sharp_crop(96)
    assert sharp.shape == (96, 96, 3) and sharp.dtype == np.uint8
    assert np.array_equal(sharp, _sharp_crop(96))  # deterministic crop
    _, psf, _ = make_success_battery()[0]
    blurred = synth_blur_case(sharp, psf, 0.0)
    assert blurred.shape == sharp.shape and blurred.dtype == np.uint8
    assert np.array_equal(blurred, synth_blur_case(sharp, psf, 0.0))
    noisy = synth_blur_case(sharp, psf, 1.0)
    assert not np.array_equal(noisy, blurred)
    # blur must actually degrade; identity scores ~zero error
    ident16 = (sharp.astype(np.float64) / 255.0 * 65535.0).round()
    assert rel_error(ident16, sharp) < 2e-4
    assert rel_error(blurred.astype(np.float64) * 257.0, sharp) > 0.005


def test_success_case_end_to_end_machinery():
    from ics_tpu import deblur_module
    from ics_tpu.utils.selftest import (
        _sharp_crop,
        rel_error,
        synth_blur_case,
    )
    from ics_tpu.ops.windows import uniform_kernel

    sharp = _sharp_crop(96)
    blurred = synth_blur_case(sharp, uniform_kernel(5), 0.0)
    out = deblur_module(
        blurred, "success-machinery", None, blur_width=5, mask_size=63,
        iterations=2, display=False, preview=False, verbose=False,
    )
    assert out.shape == sharp.shape and out.dtype == np.uint16
    assert np.isfinite(rel_error(out, sharp))


def test_success_case_motion_blur_machinery(tmp_path):
    """blur='motion' through the FULL pipeline: the battery's motion cases
    (VERDICT r4 item 6) must drive correlation=True end-to-end — pinned by
    the saved blind PSF coming out exactly achromatic (the channel-mean
    forcing, ref lib/deconvolution.pyx:584-585 via deconvolve.py:154-157)."""
    from ics_tpu import deblur_module
    from ics_tpu.models.checkpoint import load_checkpoint
    from ics_tpu.utils.selftest import _sharp_crop, rel_error, synth_blur_case
    from ics_tpu.ops.windows import motion_kernel

    sharp = _sharp_crop(96)
    blurred = synth_blur_case(sharp, motion_kernel(5, 0.0), 0.0)
    ckpt = str(tmp_path / "motion_psf.npz")
    out = deblur_module(
        blurred, "success-motion", None, blur_width=5, blur="motion",
        mask_size=63, iterations=2, display=False, preview=False,
        verbose=False, save_psf_path=ckpt,
    )
    assert out.shape == sharp.shape and out.dtype == np.uint16
    assert np.isfinite(rel_error(out, sharp))
    psf = np.asarray(load_checkpoint(ckpt).psf)
    np.testing.assert_array_equal(psf[..., 0], psf[..., 1])
    np.testing.assert_array_equal(psf[..., 0], psf[..., 2])
