"""Multi-device sharding tests on the virtual 8-device CPU mesh
(the TPU analog of multi-node-without-a-cluster, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sig

from ics_tpu import richardson_lucy_MM
from ics_tpu.ops.windows import gaussian_kernel, uniform_kernel
from ics_tpu.parallel import (
    batched_deconvolve,
    make_mesh,
    sharded_convolve_rgb,
    sharded_richardson_lucy,
)

RNG = np.random.default_rng(21)


def test_virtual_devices_present():
    assert jax.device_count() >= 8


def test_sharded_convolve_matches_scipy():
    mesh = make_mesh(4)
    img = RNG.random((64, 40, 3)).astype(np.float32)
    kern = np.dstack([gaussian_kernel(5, 1.2)] * 3).astype(np.float32)
    out = np.asarray(sharded_convolve_rgb(jnp.asarray(img), jnp.asarray(kern), mesh))
    for c in range(3):
        ref = sig.convolve(img[..., c], kern[..., c], mode="same")
        np.testing.assert_allclose(out[..., c], ref, atol=2e-4)


def test_sharded_solver_matches_single_device():
    import scipy.signal as sig

    mk = 5
    pad = mk // 2
    m = 63  # contrived so m and u_m need uneven sharding over 4 devices
    # Smooth image: the DoF term divides by (gradu + image) with no epsilon
    # (reference behavior), which near zero chaotically amplifies the
    # reduction-order float noise legitimately introduced by sharding.
    base = RNG.random((m + 8, m + 8, 3))
    k = gaussian_kernel(9, 2.0)
    smooth = np.stack(
        [sig.convolve(base[..., c], k, mode="valid") for c in range(3)], axis=-1
    )[:m, :m]
    image = np.clip(smooth, 0.2, 0.9).astype(np.float32)
    u = np.pad(image, ((pad, pad), (pad, pad), (0, 0)), mode="edge").astype(np.float32)
    psf = np.dstack([uniform_kernel(mk)] * 3).astype(np.float32)
    kw = dict(tau=0.0, iterations=3, step_factor=1e-3, lambd=1000.0, blind=True)

    single = richardson_lucy_MM(
        image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, **kw
    )
    mesh = make_mesh(4)
    sharded = sharded_richardson_lucy(
        image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, kw["tau"],
        mesh=mesh, iterations=3, step_factor=1e-3, lambd=1000.0, blind=True,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.u), np.asarray(single.u), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded.psf), np.asarray(single.psf), atol=5e-6
    )


def test_batched_deconvolve_matches_loop():
    mk = 3
    pad = mk // 2
    m = 17
    b = 8
    images = np.clip(RNG.random((b, m, m, 3)), 0.05, 0.95).astype(np.float32)
    us = np.stack(
        [np.pad(images[i], ((pad, pad), (pad, pad), (0, 0)), mode="edge") for i in range(b)]
    ).astype(np.float32)
    psfs = np.stack([np.dstack([uniform_kernel(mk)] * 3)] * b).astype(np.float32)

    from ics_tpu.parallel.mesh import BATCH_AXIS

    mesh = make_mesh(8, axis_name=BATCH_AXIS)
    u_b, psf_b, _stats_b = batched_deconvolve(
        images, us, psfs, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        iterations=2, step_factor=1e-3, lambd=1000.0, blind=True, mesh=mesh,
    )
    u_b = np.asarray(u_b)
    psf_b = np.asarray(psf_b)

    for i in range(0, b, 3):
        single = richardson_lucy_MM(
            images[i], us[i], psfs[i], pad + 1, m - pad - 1, pad + 1, m - pad - 1,
            tau=0.0, iterations=2, step_factor=1e-3, lambd=1000.0, blind=True,
        )
        np.testing.assert_allclose(u_b[i], np.asarray(single.u), atol=1e-5)
        np.testing.assert_allclose(psf_b[i], np.asarray(single.psf), atol=1e-6)


def test_batched_tiled_2d_mesh():
    """BASELINE config 5: batched deconvolution with images row-tiled over a
    2-D (batch, tile) mesh."""
    from ics_tpu.parallel.mesh import make_mesh_2d

    mk = 3
    pad = mk // 2
    m = 16  # divisible by the tile axis (4)
    b = 2
    images = np.clip(RNG.random((b, m, m, 3)), 0.2, 0.8).astype(np.float32)
    us = np.stack(
        [np.pad(im, ((pad, pad), (pad, pad), (0, 0)), mode="edge") for im in images]
    ).astype(np.float32)
    psfs = np.stack([np.dstack([np.full((mk, mk), 1 / 9)] * 3)] * b).astype(np.float32)

    mesh = make_mesh_2d(tile=4, batch=2)
    u_b, psf_b, _stats_b = batched_deconvolve(
        images, us, psfs, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        iterations=2, blind=True, mesh=mesh,
    )
    u_b = np.asarray(u_b)
    assert u_b.shape == images.shape
    assert np.isfinite(u_b).all()
    single = richardson_lucy_MM(
        images[0], us[0], psfs[0], pad + 1, m - pad - 1, pad + 1, m - pad - 1,
        tau=0.0, iterations=2, step_factor=1e-3, lambd=10000.0, blind=True,
    )
    np.testing.assert_allclose(u_b[0], np.asarray(single.u), atol=1e-5)


def test_batched_per_lane_stopping():
    """Each lane stops on ITS OWN whiteness criterion (ref pyx:643-654 per
    image): a batch solve with stopping equals N independent solves with
    stopping, including per-lane iteration counts."""
    mk = 3
    pad = mk // 2
    m = 17
    b = 4
    # Lanes with very different content so they converge at different times.
    images = np.stack(
        [
            np.clip(RNG.random((m, m, 3)) * (0.2 + 0.25 * i), 0.02, 0.98)
            for i in range(b)
        ]
    ).astype(np.float32)
    us = np.stack(
        [np.pad(im, ((pad, pad), (pad, pad), (0, 0)), mode="edge") for im in images]
    ).astype(np.float32)
    psfs = np.stack([np.dstack([uniform_kernel(mk)] * 3)] * b).astype(np.float32)

    singles = [
        richardson_lucy_MM(
            images[i], us[i], psfs[i], pad + 1, m - pad - 1, pad + 1,
            m - pad - 1, tau=0.0, iterations=25, step_factor=1e-3,
            lambd=1000.0, blind=True,
        )
        for i in range(b)
    ]
    iters = [s_.iterations for s_ in singles]
    # the scenario must actually exercise divergent stopping points
    assert len(set(iters)) > 1, iters

    # 'vmap': one batched program; lanes match independent solves tightly
    # (the while_loop batching rule freezes finished lanes).
    # 'map' (the no-mesh default): lanes run sequentially through the FAST
    # kernel paths; the scan context shifts op fusion by ulps, which the
    # chaotic DoF division amplifies (docs/PERFORMANCE.md), so the value
    # tolerance is looser — the per-lane STOPPING ITERATION must still
    # match exactly in both schedules.
    # 'shard_map' (the batch-only-mesh default): lanes split over the mesh
    # batch axis, each device lax.map-ing its own — per-lane traces are
    # unbatched like 'map', so the same looser value tolerance applies and
    # stopping iterations must again match exactly.
    from ics_tpu.parallel.mesh import BATCH_AXIS

    batch_mesh = make_mesh(4, axis_name=BATCH_AXIS)
    # All schedules run under an explicit jit since r4 (3-5x dispatch win,
    # parallel/batch.py::_lane_runner); the jit context shifts op fusion
    # by ulps vs the unbatched reference solves, which the chaotic DoF
    # division amplifies on random fixtures — hence one loose value
    # tolerance for every schedule while STOPPING ITERATIONS must still
    # match exactly.
    for schedule, mesh, atol_u, atol_p in (
        ("vmap", None, 2e-3, 1e-4),
        ("map", None, 2e-3, 1e-4),
        ("shard_map", batch_mesh, 2e-3, 1e-4),
    ):
        u_b, psf_b, stats_b = batched_deconvolve(
            images, us, psfs, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
            iterations=25, step_factor=1e-3, lambd=1000.0, blind=True,
            use_stopping=True, schedule=schedule, mesh=mesh,
        )
        u_b, stats_b = np.asarray(u_b), np.asarray(stats_b)
        for i in range(b):
            assert int(stats_b[i, 0]) == singles[i].iterations, (schedule, i)
            np.testing.assert_allclose(
                u_b[i], np.asarray(singles[i].u), atol=atol_u,
                err_msg=f"{schedule} lane {i}",
            )
            np.testing.assert_allclose(
                np.asarray(psf_b)[i], np.asarray(singles[i].psf), atol=atol_p,
                err_msg=f"{schedule} lane {i}",
            )


def test_batched_shard_map_validations():
    import pytest

    from ics_tpu.parallel.mesh import BATCH_AXIS, make_mesh_2d

    mk = 3
    pad = mk // 2
    m = 17
    images = np.clip(RNG.random((3, m, m, 3)), 0.05, 0.95).astype(np.float32)
    us = np.stack(
        [np.pad(im, ((pad, pad), (pad, pad), (0, 0)), mode="edge") for im in images]
    ).astype(np.float32)
    psfs = np.stack([np.dstack([uniform_kernel(mk)] * 3)] * 3).astype(np.float32)
    args = (images, us, psfs, pad + 1, m - pad - 1, pad + 1, m - pad - 1)

    with pytest.raises(ValueError, match="requires a mesh"):
        batched_deconvolve(*args, schedule="shard_map")
    with pytest.raises(ValueError, match="whole on one device"):
        batched_deconvolve(
            *args, schedule="shard_map", mesh=make_mesh_2d(tile=4, batch=2)
        )
    with pytest.raises(ValueError, match="must divide"):
        batched_deconvolve(
            *args, schedule="shard_map", mesh=make_mesh(2, axis_name=BATCH_AXIS)
        )


def test_pipeline_mesh_matches_single_device():
    """deblur_module(mesh=...) shards the full-frame non-blind levels and
    must reproduce the single-device pipeline (smooth fixture — see
    test_sharded_solver_matches_single_device for why)."""
    from ics_tpu import deblur_module

    base = RNG.random((80, 88, 3))
    k = gaussian_kernel(9, 2.0)
    smooth = np.stack(
        [sig.convolve(base[..., c], k, mode="valid") for c in range(3)],
        axis=-1,
    )[:61, :65]
    pic = (np.clip(smooth, 0.2, 0.9) * 255).astype(np.uint8)

    kw = dict(
        blur_width=5, mask=[30, 32], mask_size=31, display=False,
        tolerance=0.1, quality="normal", preview=False, blur="static",
        iterations=3, verbose=False,
    )
    single = deblur_module(pic, "t", None, **kw)
    sharded = deblur_module(pic, "t", None, mesh=make_mesh(4), **kw)
    # uint16 output: sharding's reduction-order float noise may cross a
    # truncation boundary — allow 1 LSB of 65535
    np.testing.assert_allclose(
        sharded.astype(np.int32), single.astype(np.int32), atol=1
    )


def test_pipeline_mesh_rejects_non_mm():
    import pytest

    from ics_tpu import deblur_module

    with pytest.raises(ValueError, match="mesh"):
        deblur_module(
            np.zeros((32, 32, 3), np.uint8), "t", None, blur_width=3,
            mask=[16, 16], mask_size=7, solver="pam", mesh=make_mesh(2),
            verbose=False,
        )


def test_sharded_solver_honors_record_metrics():
    """RLConfig.record_metrics / conv_precision must survive the sharded
    entry point (they were silently dropped once)."""
    from ics_tpu.models.rl_mm import RLConfig

    mk = 3
    pad = mk // 2
    m = 33
    image = np.clip(RNG.random((m, m, 3)), 0.2, 0.8).astype(np.float32)
    u = np.pad(image, ((pad, pad), (pad, pad), (0, 0)), mode="edge").astype(
        np.float32
    )
    psf = np.dstack([uniform_kernel(mk)] * 3).astype(np.float32)
    res = sharded_richardson_lucy(
        image, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1, 0.0,
        mesh=make_mesh(4), iterations=3, step_factor=1e-3, lambd=1000.0,
        blind=False, config=RLConfig(record_metrics=True),
    )
    assert res.trajectory is not None
    assert len(res.trajectory["M_r"]) == res.iterations
    assert np.isfinite(res.trajectory["M_r"]).all()


def test_bench_scaling_smoke():
    """bench.py --scaling's engine must run on the virtual mesh and
    produce a per-device-count curve (tiny sizes — the recorded curve in
    docs/PERFORMANCE.md uses the real protocol)."""
    from ics_tpu.utils.selftest import bench_scaling

    res = bench_scaling(
        m=65, n=97, iterations=1, ns=(1, 2), reps=1, report=lambda *a: None
    )
    assert set(res) == {1, 2}
    assert all(v > 0 for v in res.values())
