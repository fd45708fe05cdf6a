"""Pallas kernels vs their XLA-fusion counterparts (interpret mode on CPU;
the same code compiles with Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.ops.pallas_bilateral import bilateral_pallas
from ics_tpu.ops.pallas_tv import tv_op_pallas
from ics_tpu.ops.tv import tv_op
from ics_tpu.utils.filters import bilateral_filter

RNG = np.random.default_rng(31)


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("norm", [1, 2])
def test_pallas_tv_matches_xla(order, norm):
    u = RNG.standard_normal((37, 29, 3)).astype(np.float32)
    eps = 1e-2
    tv_ref, div_ref = tv_op(jnp.asarray(u), eps, order=order, norm=norm)
    tv_p, div_p = tv_op_pallas(
        jnp.asarray(u), eps, order=order, norm=norm, tile_h=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(tv_p), np.asarray(tv_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(div_p), np.asarray(div_ref), atol=1e-5)


def test_pallas_tv_uneven_tiles():
    u = RNG.standard_normal((21, 15, 3)).astype(np.float32)
    tv_ref, div_ref = tv_op(jnp.asarray(u), 1e-3)
    tv_p, div_p = tv_op_pallas(jnp.asarray(u), 1e-3, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(tv_p), np.asarray(tv_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(div_p), np.asarray(div_ref), atol=1e-5)


def test_pallas_bilateral_matches_scan():
    src = RNG.random((33, 27)).astype(np.float32)
    ref = bilateral_filter(src, 3, 0.1, 2.0)
    out = bilateral_pallas(src, 3, 0.1, 2.0, tile_h=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
