"""Determinism property tests (SURVEY.md §5 "Race detection / sanitizers").

The reference's safety story is row-disjoint OpenMP writes plus Cython
reduction inference — races are possible in principle and undetectable in
practice.  The rebuild is functional JAX: the property to assert is
REPRODUCIBILITY — identical inputs give bitwise-identical outputs, run to
run and through the full pipeline.  (Cross-CONFIGURATION equality is NOT
promised: reduction-order changes shift the chaotic whiteness stop — see
docs/PERFORMANCE.md and the r2 planar-layout lesson.)
"""

import numpy as np

RNG = np.random.default_rng(21)


def _case():
    img = (0.1 + 0.8 * RNG.random((48, 48, 3))).astype(np.float32)
    psf = np.ones((5, 5, 3), np.float32) / 25.0
    u = np.pad(img, ((2, 2), (2, 2), (0, 0)), mode="edge")
    return img, u, psf


def test_solver_bitwise_reproducible():
    from ics_tpu.models.rl_mm import richardson_lucy_MM

    img, u, psf = _case()

    def run():
        res = richardson_lucy_MM(
            img, u, psf, 5, 43, 5, 43, 0.1, iterations=10, step_factor=1e-3,
            lambd=1000, blind=True, verbose=False,
        )
        return np.asarray(res.u), np.asarray(res.psf), np.asarray(res.stats)

    u1, p1, s1 = run()
    u2, p2, s2 = run()
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(s1, s2)


def test_pipeline_bitwise_reproducible():
    from ics_tpu import deblur_module

    pic = (RNG.random((40, 40, 3)) * 255).astype(np.uint8)
    a = deblur_module(pic, "d", None, 3, iterations=3, mask_size=25,
                      verbose=False)
    b = deblur_module(pic, "d", None, 3, iterations=3, mask_size=25,
                      verbose=False)
    np.testing.assert_array_equal(a, b)


def test_batched_lanes_deterministic():
    """vmapped lanes must equal themselves across runs (the sharded/vmapped
    reduction order is fixed by XLA's program, not by thread timing)."""
    import jax.numpy as jnp

    from ics_tpu.parallel.batch import batched_deconvolve

    imgs = np.stack([_case()[0] for _ in range(3)])
    psfs = np.stack([np.ones((5, 5, 3), np.float32) / 25.0] * 3)
    us = np.stack([np.pad(i, ((2, 2), (2, 2), (0, 0)), mode="edge")
                   for i in imgs])

    def run():
        u_b, _, stats_b = batched_deconvolve(
            jnp.asarray(imgs), jnp.asarray(us), jnp.asarray(psfs),
            5, 43, 5, 43, tau=0.1, iterations=5, step_factor=1e-3,
            lambd=1000, blind=False,
        )
        return np.asarray(u_b), np.asarray(stats_b)

    u1, s1 = run()
    u2, s2 = run()
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(s1, s2)
