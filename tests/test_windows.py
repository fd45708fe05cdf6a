"""Window generator parity vs the reference formulas (ref lib/utils.py:134-170)."""

import numpy as np
import pytest

from ics_tpu.ops import windows


def test_uniform_kernel():
    k = windows.uniform_kernel(5)
    assert k.shape == (5, 5)
    np.testing.assert_allclose(k, np.full((5, 5), 1 / 25))


@pytest.mark.parametrize("m,std", [(5, 1.0), (9, 2.5), (4, 0.8)])
def test_gaussian_kernel_matches_scipy(m, std):
    from scipy.signal.windows import gaussian

    w = gaussian(m, std=std)
    expected = np.outer(w, w)
    expected /= expected.sum()
    np.testing.assert_allclose(windows.gaussian_kernel(m, std), expected, rtol=1e-12)


@pytest.mark.parametrize("m,beta", [(5, 8.0), (9, 14.0)])
def test_kaiser_kernel(m, beta):
    w = np.kaiser(m, beta)
    expected = np.outer(w, w)
    expected /= expected.sum()
    np.testing.assert_allclose(windows.kaiser_kernel(m, beta), expected, rtol=1e-12)


@pytest.mark.parametrize("m,tau", [(5, 1.0), (9, 3.0), (6, 2.0)])
def test_poisson_kernel_matches_scipy(m, tau):
    from scipy.signal.windows import exponential

    w = exponential(m, tau=tau)
    expected = np.outer(w, w)
    expected /= expected.sum()
    np.testing.assert_allclose(windows.poisson_kernel(m, tau), expected, rtol=1e-12)


def test_lens_blur():
    k = windows.lens_blur(8)
    assert k.shape == (4, 4)
    np.testing.assert_allclose(k.sum(), 1.0)
    # profile ratios follow 1/(pi x^2)
    prof = windows.disc_blur(8)
    np.testing.assert_allclose(prof[0] / prof[1], 4.0)


def test_all_kernels_normalized():
    for k in (
        windows.uniform_kernel(7),
        windows.gaussian_kernel(7, 2.0),
        windows.kaiser_kernel(7, 10.0),
        windows.poisson_kernel(7, 1.5),
        windows.lens_blur(10),
    ):
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-9)
        assert (k >= 0).all()


def test_motion_kernel():
    # 0 deg: exactly the center row, near-uniform along it
    k = windows.motion_kernel(7, 0.0)
    assert k.shape == (7, 7)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-9)
    assert (k[[0, 1, 2, 4, 5, 6], :] == 0).all()
    assert (k[3, :] > 0).all()
    # 90 deg = transpose of 0 deg (sampling is symmetric in x/y)
    np.testing.assert_allclose(windows.motion_kernel(7, 90.0), k.T, atol=1e-12)
    # 45 deg: symmetric about the diagonal, mass concentrated on it
    k45 = windows.motion_kernel(9, 45.0)
    np.testing.assert_allclose(k45, k45.T, atol=1e-12)
    assert np.trace(k45) > 0.5
    with pytest.raises(ValueError):
        windows.motion_kernel(6)
    with pytest.raises(ValueError):
        windows.motion_kernel(1)
