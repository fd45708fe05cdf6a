"""Generic utilities — the TPU-native counterpart of the reference's
``lib.utils`` public surface (reference lib/utils.py; README.md:52 "the
built-in generic functions are in the `lib.utils` module").

Everything the reference exposes there is re-exported here under the same
names: window generators, filters (bilateral / bessel / gaussian / USM),
blending modes, color ops, ``timeit`` and ``save``.
"""

from ics_tpu.ops.windows import (
    uniform_kernel,
    gaussian_kernel,
    kaiser_kernel,
    poisson_kernel,
    disc_blur,
    lens_blur,
    gaussian_weight,
)
from ics_tpu.utils.timing import timeit
from ics_tpu.utils.filters import (
    bilateral_filter,
    bilateral_lab,
    bessel_blur,
    gaussian_blur,
    USM,
    overlay,
    blending,
    convolve,
)
from ics_tpu.utils.color import (
    Lagrange_interpolation,
    LABImage,
    grey_point,
    auto_vibrance,
    divTV,
    gradTVEM,
    rgb_to_lab,
    lab_to_rgb,
    rgb_to_hsv,
    hsv_to_rgb,
)
from ics_tpu.utils.cache import enable_persistent_cache
from ics_tpu.utils.io import save, load_image, imread, imread_sequence, imsave

__all__ = [
    "uniform_kernel",
    "gaussian_kernel",
    "kaiser_kernel",
    "poisson_kernel",
    "disc_blur",
    "lens_blur",
    "gaussian_weight",
    "timeit",
    "bilateral_filter",
    "bilateral_lab",
    "bessel_blur",
    "gaussian_blur",
    "USM",
    "overlay",
    "blending",
    "convolve",
    "Lagrange_interpolation",
    "LABImage",
    "rgb_to_lab",
    "lab_to_rgb",
    "rgb_to_hsv",
    "hsv_to_rgb",
    "grey_point",
    "auto_vibrance",
    "divTV",
    "gradTVEM",
    "save",
    "load_image",
    "imread",
    "imsave",
    "imread_sequence",
    "enable_persistent_cache",
]
