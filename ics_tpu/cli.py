"""Command-line runner mirroring the reference's executable example cases
(ref deconvolve.py:370-423 — its ``__main__`` block is the de-facto
integration suite).

    python -m ics_tpu.cli deblur img/blured.jpg out/ --blur-width 7 \
        --mask 584 795 --tolerance 0.1 --iterations 200
    python -m ics_tpu.cli usm img/original.jpg out/ --radius 5 --amount 1.5
    python -m ics_tpu.cli bilateral-lab img/DSC0001.jpg out/ --radius 5
    python -m ics_tpu.cli tv-denoise img/DSC0001.jpg out/ --weight 0.1
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _cmd_deblur(args) -> int:
    from ics_tpu import deblur_module
    from ics_tpu.utils.io import load_image

    if args.blur_width is None and args.psf is None:
        raise SystemExit("deblur: either --blur-width or --psf is required")

    if args.profile == "fast":
        # one-flag speed profile (VERDICT r4 item 9): the measured opt-in
        # ladder's quality-gated rungs in one decision — each component
        # only fills in when the user left the individual flag untouched,
        # so explicit flags still win.  Quality/speed rows:
        # docs/PERFORMANCE.md "Fast profile".
        if args.blind_budget is None:
            args.blind_budget = 25
        if args.early_stop == 0.0:
            args.early_stop = 1e-3
        if args.precision == "exact":
            args.precision = "high"

    mesh = None
    if args.shard:
        import jax

        from ics_tpu.parallel.mesh import make_mesh

        if args.shard < 1 or args.shard > len(jax.devices()):
            raise SystemExit(
                f"deblur: --shard {args.shard} must be between 1 and the "
                f"{len(jax.devices())} available devices"
            )
        mesh = make_mesh(args.shard)

    pic = load_image(args.input)
    name = os.path.splitext(os.path.basename(args.input))[0] + args.suffix
    deblur_module(
        pic,
        name,
        args.dest,
        args.blur_width if args.blur_width is not None else 3,
        confidence=args.confidence,
        tolerance=args.tolerance,
        quality=args.quality,
        bits=args.bits,
        mask=args.mask,
        display=False,
        blur=args.blur,
        preview=args.preview,
        mask_size=args.mask_size,
        iterations=args.iterations,
        solver=args.solver,
        psf_path=args.psf,
        save_psf_path=args.save_psf,
        precision=args.precision,
        early_stop=args.early_stop,
        blind_budget=args.blind_budget,
        use_tv=args.use_tv,
        tv_norm=args.tv_norm,
        inner_loop=args.inner_loop,
        trace=args.trace,
        nonblind_levels=args.nonblind_levels,
        mesh=mesh,
    )
    return 0


def _cmd_deblur_batch(args) -> int:
    """Batched non-blind deconvolution of a burst of same-shaped frames
    with one stored PSF — the reference README's PSF-reuse workflow (ref
    README.md:131-133) at batch scale (BASELINE config 5): estimate the
    PSF once (``deblur --save-psf``), then deconvolve the whole burst as
    ONE vmapped on-chip solve with per-lane whiteness stopping."""
    import jax.numpy as jnp

    from ics_tpu.models.checkpoint import load_checkpoint
    from ics_tpu.parallel.batch import batched_deconvolve
    from ics_tpu.utils.io import imread_sequence, save

    ckpt = load_checkpoint(args.psf)
    psf = np.asarray(ckpt.psf, np.float32)
    k = psf.shape[0]
    # solver geometry: u is the image plus the (k-1)-wide conv halo
    pad = k // 2

    import glob as _glob

    paths = sorted(_glob.glob(args.pattern))
    if not paths:
        raise SystemExit(f"deblur-batch: no files match {args.pattern!r}")
    pics = np.asarray(imread_sequence(paths))
    if pics.ndim != 4 or pics.shape[-1] != 3:
        raise SystemExit(
            f"deblur-batch: expected a stack of RGB frames, got {pics.shape}"
        )
    b, h, w, _ = pics.shape
    if np.issubdtype(pics.dtype, np.floating) and args.bits is None:
        imgs = pics.astype(np.float32) ** (1 / 2.2)  # already [0, 1]
    else:
        bits = args.bits if args.bits is not None else (
            8 if pics.dtype == np.uint8 else 16
        )
        imgs = (pics.astype(np.float32) / float(2**bits - 1)) ** (1 / 2.2)

    mask_size = min(args.mask_size, min(h, w) - 2) | 1
    top = h // 2 - mask_size // 2
    left = w // 2 - mask_size // 2
    bottom, right = top + mask_size, left + mask_size

    us = np.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    psfs = np.broadcast_to(psf, (b, *psf.shape))

    mesh = None
    if args.shard:
        import jax

        from ics_tpu.parallel.mesh import BATCH_AXIS, make_mesh

        if args.shard < 1 or args.shard > len(jax.devices()):
            raise SystemExit(
                f"deblur-batch: --shard {args.shard} must be between 1 and "
                f"the {len(jax.devices())} available devices"
            )
        if b % args.shard != 0:
            raise SystemExit(
                f"deblur-batch: batch of {b} frames must divide by "
                f"--shard {args.shard}"
            )
        mesh = make_mesh(args.shard, axis_name=BATCH_AXIS)

    u_b, _, stats_b = batched_deconvolve(
        jnp.asarray(imgs), jnp.asarray(us), jnp.asarray(psfs),
        top, bottom, left, right,
        tau=args.tolerance / 100.0, iterations=args.iterations,
        step_factor={"normal": 1e-3, "high": 5e-4, "veryhigh": 1e-4,
                     "low": 5e-3}[args.quality],
        lambd=args.confidence * 1000.0, blind=False, mesh=mesh,
    )
    out = np.asarray(
        (jnp.clip(u_b, 0.0, 1.0) ** 2.2 * (2**16 - 1)).astype(jnp.uint16)
    )
    stats = np.asarray(stats_b)
    os.makedirs(args.dest, exist_ok=True)
    for i, path in enumerate(paths):
        name = os.path.splitext(os.path.basename(path))[0] + args.suffix
        save(out[i], name, args.dest)
        print(
            f"{name}: {int(stats[i][0])} outers, "
            f"converged={bool(stats[i][1])}"
        )
    return 0


def _load_unit(path: str, bits: int | None) -> np.ndarray:
    """Load an image scaled to [0, 1] by its bit depth.

    The reference pipeline normalizes by ``2**bits - 1`` (ref
    deconvolve.py:97); the aux commands used to hardcode ``/255`` which
    scaled 16-bit TIFF input 257x wrong.  ``bits=None`` derives the depth
    from the array dtype (uint8 -> 8, uint16 -> 16; float input is assumed
    already in [0, 1])."""
    from ics_tpu.utils.io import load_image

    pic = np.asarray(load_image(path))
    if bits is None:
        if pic.dtype == np.uint8:
            bits = 8
        elif pic.dtype == np.uint16:
            bits = 16
        elif np.issubdtype(pic.dtype, np.floating):
            return pic.astype(np.float32)
        else:
            raise SystemExit(
                f"cannot derive bit depth from dtype {pic.dtype}; pass --bits"
            )
    return pic.astype(np.float32) / float(2**bits - 1)


def _save_16bit(out: np.ndarray, input_path: str, suffix: str, dest: str) -> None:
    from ics_tpu.utils.io import save

    out = np.clip(np.asarray(out), 0.0, 1.0) * (2**16 - 1)
    name = os.path.splitext(os.path.basename(input_path))[0] + suffix
    os.makedirs(dest, exist_ok=True)
    save(out, name, dest)


def _cmd_usm(args) -> int:
    from ics_tpu.utils.filters import USM

    pic = _load_unit(args.input, args.bits)
    out = np.stack(
        [
            np.asarray(USM(pic[..., c], args.radius, args.strength, args.amount,
                           method=args.method))
            for c in range(pic.shape[-1])
        ],
        axis=-1,
    )
    _save_16bit(out, args.input, "-usm", args.dest)
    return 0


def _cmd_bilateral(args) -> int:
    from ics_tpu.utils.filters import bilateral_filter

    pic = _load_unit(args.input, args.bits)
    out = np.stack(
        [
            np.asarray(bilateral_filter(pic[..., c], args.radius, args.std_i, args.std_s))
            for c in range(pic.shape[-1])
        ],
        axis=-1,
    )
    _save_16bit(out, args.input, "-bilateral", args.dest)
    return 0


def _cmd_bilateral_lab(args) -> int:
    from ics_tpu.utils.filters import bilateral_lab

    pic = _load_unit(args.input, args.bits)
    out = np.asarray(
        bilateral_lab(pic, args.radius, args.std_i, args.std_s,
                      luminance_only=not args.all_channels)
    )
    _save_16bit(out, args.input, "-bilateral-lab", args.dest)
    return 0


def _cmd_tv_denoise(args) -> int:
    from ics_tpu.models.tv_denoise import tv_denoise

    pic = _load_unit(args.input, args.bits)
    out = np.asarray(tv_denoise(pic, weight=args.weight, iterations=args.iterations))
    _save_16bit(out, args.input, "-tv-denoise", args.dest)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="ics_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("deblur", help="blind/non-blind RL-TV deconvolution")
    p.add_argument("input")
    p.add_argument("dest")
    p.add_argument("--blur-width", type=int, default=None,
                   help="PSF size (required unless --psf is given)")
    p.add_argument("--psf", default=None, metavar="CKPT",
                   help="load a stored PSF checkpoint and skip the blind "
                        "phase (ref README.md:131-133 workflow)")
    p.add_argument("--save-psf", default=None, metavar="CKPT",
                   help="save the blind phase's estimated PSF checkpoint")
    p.add_argument("--confidence", type=float, default=10)
    p.add_argument("--tolerance", type=float, default=1)
    p.add_argument("--quality", default="normal",
                   choices=["low", "normal", "high", "veryhigh"])
    p.add_argument("--bits", type=int, default=8)
    p.add_argument("--mask", type=int, nargs=2, default=None)
    p.add_argument("--mask-size", type=int, default=255)
    p.add_argument("--blur", default="static", choices=["static", "motion"])
    p.add_argument("--preview", action="store_true")
    p.add_argument("--iterations", type=int, default=200)
    p.add_argument("--solver", default="mm", choices=["mm", "pam", "pd"])
    p.add_argument("--nonblind-levels", default="all",
                   choices=["all", "final"],
                   help="run the non-blind pass at every pyramid scale "
                        "(reference parity) or only at full resolution "
                        "(faster; the reference author's own commented-out "
                        "variant)")
    p.add_argument("--precision", default="exact",
                   choices=["exact", "high", "mixed", "fast", "hybrid",
                            "hybrid-high"],
                   help="exact=f32 reference parity (recommended); "
                        "high=f32 with bf16x3-split MXU convs (~7e-6 conv "
                        "err, 1.3x conv speed, TPU only); "
                        "mixed=bf16 convs + f32 residual (SSIM>=0.999 at "
                        "moderate sizes, but long full-resolution solves "
                        "can NaN through the epsilon-free DoF division — "
                        "the pipeline warns if so); fast=all-bf16; "
                        "hybrid=mixed on the coarse non-blind levels, "
                        "exact f32 on the final full-resolution level and "
                        "the blind phase; hybrid-high=same schedule with "
                        "bf16x3 convs (f32 math) on the coarse levels — "
                        "smaller deviation, smaller speedup (quality "
                        "numbers in docs/PERFORMANCE.md)")
    p.add_argument("--trace", action="store_true",
                   help="print a per-stage wall-clock profile at the end "
                        "(stage boundaries sync the device queue, so the "
                        "traced run is slower than the async-overlapped "
                        "untraced one)")
    p.add_argument("--use-tv", action="store_true",
                   help="enable the intended-math TV regularization (the "
                        "reference's dead TV(ut) branch, live; 'mm' solver "
                        "only)")
    p.add_argument("--tv-norm", default="channel",
                   choices=["channel", "collab", "collab_l2"],
                   help="TV channel coupling with --use-tv: 'collab' = the "
                        "collaborative L^{inf,1,1} RGB norm + Cauchy prior "
                        "(ref README contribution; best for chromatic "
                        "noise), 'collab_l2' = the softer l2-color coupling "
                        "from the same family, 'channel' = decoupled "
                        "per-channel")
    p.add_argument("--inner-loop", default="auto",
                   choices=["auto", "xla", "pallas", "pallas_unrolled"],
                   help="solver inner-loop execution ('mm' solver): "
                        "'pallas'/'pallas_unrolled' = the VMEM-resident "
                        "kernel (fori vs statically-unrolled body), 'xla' "
                        "= the general lax.scan path, 'auto' = pallas on "
                        "TPU for VMEM-fitting f32 windows")
    p.add_argument("--early-stop", type=float, default=0.0, metavar="R",
                   help="stop a NON-BLIND pyramid level once the whiteness "
                        "metric stops improving by cumulative relative R "
                        "over 10 consecutive outers (0 = off, reference-"
                        "parity stopping).  Blind levels keep the parity "
                        "rule — cutting the PSF estimation costs quality "
                        "(measured).  Quality-gated deviation; fires only "
                        "on genuinely plateaued solves")
    p.add_argument("--blind-budget", type=int, default=None, metavar="N",
                   help="cap the COARSE blind pyramid levels at N outer "
                        "iterations (the final full-scale blind level and "
                        "the non-blind pass keep the full budget).  The "
                        "blind phase routinely burns iterations x levels "
                        "without converging while the coarse estimates "
                        "only seed the next level; measured quality/speed "
                        "curve in docs/PERFORMANCE.md.  Off by default "
                        "(reference parity)")
    p.add_argument("--shard", type=int, default=0, metavar="N",
                   help="tile the full-frame non-blind solves by rows over "
                        "the first N devices (GSPMD halo exchange over ICI)")
    p.add_argument("--profile", default="quality",
                   choices=["quality", "fast"],
                   help="one-flag speed/quality trade: 'quality' (default) "
                        "= reference-parity everything; 'fast' = the "
                        "measured quality-gated ladder in one decision "
                        "(--blind-budget 25 + --early-stop 1e-3 + "
                        "--precision high).  Individual flags you pass "
                        "explicitly still override the profile; measured "
                        "rows in docs/PERFORMANCE.md 'Fast profile'")
    p.add_argument("--suffix", default="-deblurred")
    p.set_defaults(fn=_cmd_deblur)

    def _bits_arg(sp):
        sp.add_argument(
            "--bits", type=int, default=None,
            help="input bit depth for the [0,1] normalization (ref "
                 "deconvolve.py:97); default derives it from the file dtype "
                 "(uint8 -> 8, uint16 -> 16)")

    p = sub.add_parser(
        "deblur-batch",
        help="batched non-blind deconvolution of a burst with a stored PSF")
    p.add_argument("pattern", help="glob of same-shaped frames (quote it)")
    p.add_argument("dest")
    p.add_argument("--psf", required=True, metavar="CKPT",
                   help="PSF checkpoint from 'deblur --save-psf'")
    p.add_argument("--confidence", type=float, default=10)
    p.add_argument("--tolerance", type=float, default=1)
    p.add_argument("--quality", default="normal",
                   choices=["low", "normal", "high", "veryhigh"])
    p.add_argument("--mask-size", type=int, default=255)
    p.add_argument("--iterations", type=int, default=200)
    p.add_argument("--shard", type=int, default=0, metavar="N",
                   help="shard the batch axis over the first N devices")
    p.add_argument("--suffix", default="-deblurred")
    _bits_arg(p)
    p.set_defaults(fn=_cmd_deblur_batch)

    p = sub.add_parser("usm", help="unsharp mask")
    p.add_argument("input")
    p.add_argument("dest")
    p.add_argument("--radius", type=int, default=5)
    p.add_argument("--strength", type=float, default=8.0)
    p.add_argument("--amount", type=float, default=1.0)
    p.add_argument("--method", default="bessel", choices=["bessel", "gauss"])
    _bits_arg(p)
    p.set_defaults(fn=_cmd_usm)

    p = sub.add_parser("bilateral", help="bilateral denoise (RGB channels)")
    p.add_argument("input")
    p.add_argument("dest")
    p.add_argument("--radius", type=int, default=5)
    p.add_argument("--std-i", type=float, default=0.1)
    p.add_argument("--std-s", type=float, default=5.0)
    _bits_arg(p)
    p.set_defaults(fn=_cmd_bilateral)

    p = sub.add_parser("bilateral-lab", help="bilateral denoise in CIELAB")
    p.add_argument("input")
    p.add_argument("dest")
    p.add_argument("--radius", type=int, default=5)
    p.add_argument("--std-i", type=float, default=5.0)
    p.add_argument("--std-s", type=float, default=5.0)
    p.add_argument("--all-channels", action="store_true")
    _bits_arg(p)
    p.set_defaults(fn=_cmd_bilateral_lab)

    p = sub.add_parser("tv-denoise", help="Chambolle TV denoise")
    p.add_argument("input")
    p.add_argument("dest")
    p.add_argument("--weight", type=float, default=0.1)
    p.add_argument("--iterations", type=int, default=50)
    _bits_arg(p)
    p.set_defaults(fn=_cmd_tv_denoise)

    args = parser.parse_args(argv)
    # Cross-process compile reuse (the reference's "FFTW wisdom" analog,
    # ref README.md:135-136).  Must go through jax.config.update — the env
    # var is snapshotted too early when a sitecustomize imports jax first.
    from ics_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
