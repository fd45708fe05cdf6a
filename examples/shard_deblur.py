"""Multi-chip deblurring: row-tile the full-frame non-blind solves over a
TPU mesh.

    python examples/shard_deblur.py img/153412.jpg out/ --shard 4

The blind PSF estimation runs on a single device (it solves a few-hundred-
pixel mask window); each full-frame non-blind pyramid level is sharded by
image rows over the mesh — the GSPMD partitioner inserts the convolution
halo exchanges over ICI and turns the solver's per-channel max/amax
reductions into collectives.  With the 24 MP final level at ~33 s of
device compute on one v5e chip, the solver time bounds at roughly
33/N s + collective overhead on an N-chip slice.

Without real multi-chip hardware this example also runs on a virtual CPU
mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/shard_deblur.py img/blured.jpg out/ --shard 8
"""

from __future__ import annotations

import argparse
import os

import jax

from ics_tpu import deblur_module
from ics_tpu.parallel.mesh import make_mesh
from ics_tpu.utils.cache import enable_persistent_cache
from ics_tpu.utils.io import load_image


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("dest")
    ap.add_argument("--shard", type=int, default=0,
                    help="devices to row-tile over (default: all)")
    ap.add_argument("--blur-width", type=int, default=9)
    ap.add_argument("--mask", type=int, nargs=2, default=None)
    ap.add_argument("--mask-size", type=int, default=255)
    ap.add_argument("--iterations", type=int, default=200)
    ap.add_argument("--precision", default="exact",
                    choices=["exact", "mixed", "fast"],
                    help="exact f32 is the recommended default; 'mixed' "
                         "(bf16 convs) needs the solver's DoF guard on "
                         "long full-resolution solves — see docs/"
                         "PERFORMANCE.md precision table")
    args = ap.parse_args()

    enable_persistent_cache()
    avail = len(jax.devices())
    n = args.shard or avail
    if not 1 <= n <= avail:
        raise SystemExit(
            f"--shard {n} must be between 1 and the {avail} available devices"
        )
    mesh = make_mesh(n)
    print(f"mesh: {mesh.devices.size} x {jax.devices()[0].platform} "
          f"({[str(d) for d in mesh.devices.flat]})")

    pic = load_image(args.input)
    name = os.path.splitext(os.path.basename(args.input))[0] + "-sharded"
    deblur_module(
        pic, name, args.dest, args.blur_width,
        mask=args.mask, mask_size=args.mask_size,
        iterations=args.iterations,
        precision=args.precision, mesh=mesh, display=False,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
