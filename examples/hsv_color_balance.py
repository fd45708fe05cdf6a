"""HSV color-balance example, the workflow of the reference's
``notebooks/HSV color balance.ipynb``: push the global hue toward a target,
then shift hue/saturation selectively in shadows / midtones / highlights
using Gaussian luminance masks.

    python examples/hsv_color_balance.py [input.jpg] [output_dir]
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from ics_tpu.utils.color import (
    hsv_to_rgb,
    hue_shift,
    luma_masks,
    normal2rad,
    rad2normal,
    rgb_to_hsv,
    saturation_boost,
)
from ics_tpu.utils.io import load_image, save


def color_balance(
    rgb,
    main_hue=np.pi / 6,
    high_hue=np.pi / 3,
    mid_hue=4.2 - 2 * np.pi,
    low_hue=4.2 - 2 * np.pi,
    amount=1.0,
    sat_high=0.2,
    sat_mid=0.1,
    sat_low=0.0,
):
    """The notebook's full pipeline on an (H, W, 3) [0,1] image."""
    hsv = rgb_to_hsv(jnp.asarray(rgb))
    h = normal2rad(hsv[..., 0])
    s = hsv[..., 1]
    v = hsv[..., 2]

    low, mid, high = luma_masks(v)
    h = hue_shift(h, main_hue, amount)
    h = hue_shift(h, high_hue, amount) * high + hue_shift(h, mid_hue, amount) * mid \
        + hue_shift(h, low_hue, amount) * low
    s = saturation_boost(s, sat_high) * high + saturation_boost(s, sat_mid) * mid \
        + saturation_boost(s, sat_low) * low
    s = jnp.clip(s, 0.0, 1.0)

    out = hsv_to_rgb(jnp.stack([rad2normal(h), s, v], axis=-1))
    return jnp.clip(out, 0.0, 1.0)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/img/153412-crop.jpg"
    dest = sys.argv[2] if len(sys.argv) > 2 else "out"
    pic = np.asarray(load_image(src), np.float32) / 255.0
    out = np.asarray(color_balance(pic))
    os.makedirs(dest, exist_ok=True)
    name = os.path.splitext(os.path.basename(src))[0] + "-hue-shift"
    save(out * (2**16 - 1), name, dest)
    print("saved", os.path.join(dest, name + ".tif"))
