"""End-to-end blind-deconvolution pipeline.

Behavioral parity target: reference deconvolve.py:24-368 — ``pad_image``,
``build_pyramid`` and the ``deblur_module`` orchestrator: normalize by bit
depth, remove gamma, pad to odd dimensions, build the √2 coarse-to-fine
pyramid, run a blind pass (PSF estimation on a mask window) then a non-blind
pass (full frame), then clip / re-gamma / convert to 16-bit / save TIFF.

The host drives the pyramid (shapes change per level); each level's solve is
one jitted on-chip XLA program (``ics_tpu.models.rl_mm``).  XLA's compilation
cache plays the role of the reference's "FFTW wisdom" (ref README.md:135-136):
level shapes repeat across runs, so programs compile once.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM
from ics_tpu.ops.psf import normalize_kernel
from ics_tpu.ops.windows import uniform_kernel
from ics_tpu.utils.resize import resize as resize_scipy
from ics_tpu.utils.resize import resize_jax
from ics_tpu.utils.timing import timeit

__all__ = ["pad_image", "build_pyramid", "deblur_module"]

# precision='hybrid'/'hybrid-high': smallest coarse-level size that runs
# the reduced-precision schedule (smaller levels keep exact f32 — they
# cost almost nothing and their whiteness stop is the most chaotic)
_HYBRID_MIN_PIXELS = 2_000_000


# The pipeline glue (preprocess, postprocess) runs under explicit jit:
# the eager op-by-op dispatch pays per-op machinery and unfused
# intermediates at full frame size (the cost class measured at 2-5x on
# the batched solver — docs/PERFORMANCE.md "Batched solves").  The ops
# themselves are elementwise, so fusion changes memory traffic, not
# rounding — solver parity is untouched.
@functools.partial(jax.jit, static_argnames=("samples",))
def _preprocess_jit(raw, samples):
    """uint8/uint16 frame -> padded, normalized, de-gamma'd f32 (ref
    deconvolve.py:94-103) as ONE fused on-device program."""
    pic = raw.astype(jnp.float32)
    pic = jnp.pad(pic, ((1, 1), (1, 1), (0, 0)), mode="edge")
    return (pic / samples) ** (1 / 2.2)


@jax.jit
def _postprocess_jit(img):
    """clip -> re-gamma -> 16-bit (ref deconvolve.py:346-352) + NaN flag
    in ONE fused pass (NaN must be checked BEFORE the uint16 cast, which
    would silently map it to an arbitrary integer)."""
    clipped = jnp.clip(img, 0.0, 1.0) ** 2.2
    return (
        (clipped * (2**16 - 1)).astype(jnp.uint16),
        jnp.any(jnp.isnan(clipped)),
    )


def pad_image(image: np.ndarray, pad, mode: str = "edge") -> np.ndarray:
    """Pad a 3-channel image with a free boundary condition (ref deconvolve.py:24-37)."""
    channels = [np.pad(image[..., c], pad, mode=mode) for c in range(3)]
    return np.ascontiguousarray(np.dstack(channels), np.float32)


def build_pyramid(psf_size: int, lambd: float = 10.0):
    """Coarse-to-fine schedule: image scales shrink by √2 per level, kernel
    sizes ceil(k/√2) forced odd and >= 3 (ref deconvolve.py:40-60)."""
    images = [1.0]
    kernels = [psf_size]
    while kernels[-1] > 3:
        kernels.append(int(np.ceil(kernels[-1] / np.sqrt(2))))
        images.append(images[-1] / np.sqrt(2))
        if kernels[-1] % 2 == 0:
            kernels[-1] -= 1
        if kernels[-1] < 3:
            kernels[-1] = 3
    return images, kernels


def _write_back(deblured_image, res, temp_top, temp_bottom, temp_left,
                temp_right, pad):
    """Write a mask-window solve back into the full frame.

    The reference solver mutates the caller's array through a VIEW, so the
    whole padded window — halo ring included — is written back, not just the
    returned inner crop (ref deconvolve.py:277-288 passes a slice of
    ``deblured_image`` into the in-place pyx solver, whose u updates span
    u_M×u_N).  Solvers that expose ``u_full`` get exact parity; others fall
    back to the inner box.
    """
    if getattr(res, "u_full", None) is not None:
        return deblured_image.at[
            temp_top - pad - 1 : temp_bottom + pad + 1,
            temp_left - pad - 1 : temp_right + pad + 1,
        ].set(res.u_full)
    return deblured_image.at[
        temp_top - 1 : temp_bottom + 1, temp_left - 1 : temp_right + 1
    ].set(res.u)


@timeit
def deblur_module(
    pic,
    filename: str,
    dest_path: str | None,
    blur_width: int,
    confidence: float = 10,
    tolerance: float = 1,
    quality: str = "normal",
    bits: int = 8,
    mask=None,
    display: bool = False,
    blur: str = "static",
    preview: bool = False,
    p: float = 1,
    order: int = 2,
    norm: int = 1,
    priority: float = 0,
    mask_size: int = 255,
    iterations: int = 200,
    refocus: bool = False,
    config: RLConfig | None = None,
    verbose: bool = True,
    trace=False,
    resize_backend: str = "jax",
    solver: str = "mm",
    psf_path: str | None = None,
    save_psf_path: str | None = None,
    precision: str = "exact",
    early_stop: float = 0.0,
    blind_budget: int | None = None,
    use_tv: bool = False,
    tv_norm: str = "channel",
    inner_loop: str = "auto",
    stats_out: list | None = None,
    compute_timer: dict | None = None,
    nonblind_levels: str = "all",
    mesh=None,
    shard_axis: str = "tile",
) -> np.ndarray:
    """Blind deblurring API (parity: ref deconvolve.py:66-368).

    Same kwargs and defaults as the reference (``display`` defaults off here
    — it pops matplotlib windows).  Additionally returns the final 16-bit
    image array; saving only happens when ``dest_path`` is not None.

    ``resize_backend``: 'jax' (on-device Keys cubic, the fast path) or
    'scipy' (host B-spline matching the reference's skimage resize).

    ``trace``: per-stage wall-clock profile via ``utils.trace.Tracer`` —
    True prints the report at the end (when verbose), or pass a Tracer to
    accumulate into.  Stage boundaries sync the device queue, so the traced
    run is slower than the (async-overlapped) untraced one.

    ``solver``: 'mm' (TV-MM, the reference's checked-in solver), 'pam'
    (TV-PAM) or 'pd' (TV-PD) — the three families of ref README.md:42-44.

    ``nonblind_levels``: 'all' (parity — the reference runs the non-blind
    pass at every pyramid scale) or 'final' (full resolution only — the
    variant the reference author left commented out at deconvolve.py:206,
    ``if True:#case == "blind" or i == 1.``).  'final' skips the coarse
    levels that typically burn the whole iteration budget, for a several-x
    speedup on large frames, but it IS a quality trade: on the
    crop-blured fixture it loses ~1.6 dB PSNR vs ground truth compared to
    the parity schedule.

    ``mesh``: a ``jax.sharding.Mesh`` (1-D, axis ``shard_axis``) to tile the
    full-frame non-blind solves by image rows across chips — GSPMD inserts
    the convolution halo exchanges and turns the solver's reductions into
    collectives (see ``ics_tpu.parallel.tiling``).  The blind mask-window
    solves stay on one device (they are a few hundred pixels square); only
    the large-frame levels, where the memory and FLOPs live, shard.  Only
    the 'mm' solver supports this.

    ``early_stop``: opt-in whiteness-plateau stop (RLConfig.early_stop;
    'mm' solver only) — stop a level once M_r stops improving by the given
    relative amount for 10 consecutive outers.  A documented deviation
    from the reference's stopping rule that skips the dead iterations
    coarse levels otherwise burn; quality-gated in tests/test_golden.py.

    ``blind_budget``: opt-in outer-iteration cap for the COARSE blind
    levels (the final full-scale blind level and the whole non-blind pass
    keep the full ``iterations`` budget).  The reference's blind phase
    routinely burns the entire budget at every pyramid scale without
    converging (its own published 1.9 MP case runs 3x200 outers; the
    whiteness metric is nearly flat during PSF refinement, so the stopping
    rule never fires) — but the coarse levels only SEED the next level's
    PSF estimate, which is resized and re-refined anyway.  A documented
    deviation from reference parity, off by default; measured
    quality/speed curve in docs/PERFORMANCE.md "Blind budget".

    ``use_tv`` / ``tv_norm``: the intended-math TV regularization
    (RLConfig.use_tv; 'mm' solver only — ignored when ``config`` is
    passed).  ``tv_norm='collab'`` selects the collaborative L^{∞,1,1}
    RGB norm with the Cauchy gradient prior (ref README.md:99-103,
    113-114) — measured to dramatically improve chromatic-noise removal
    (PERFORMANCE.md "Collaborative TV"); ``tv_norm='collab_l2'`` is the
    softer ℓ²-color (RMS) coupling from the same family, sitting between
    'channel' and 'collab' on the measured chroma fixture; the default
    per-channel norm and the parity mode (``use_tv=False``) are better on
    clean achromatic content.

    ``psf_path`` / ``save_psf_path``: the PSF-reuse workflow the reference
    README *describes* but never implemented (ref README.md:131-133 "saving
    the PSF … to apply it on the other pictures").  ``save_psf_path`` writes
    the blind phase's estimated PSF as a checkpoint the moment that phase
    finishes; ``psf_path`` loads one, SKIPS the blind phase entirely and
    runs only the non-blind pass with it (``blur_width`` is then taken from
    the stored PSF and the passed value is ignored).

    The whole pyramid loop runs on device arrays — between levels nothing
    crosses host<->device except solver status scalars; the reference's
    equivalent loop shuttles full images through NumPy each level.
    """
    import jax.numpy as jnp

    # Per-stage profiling (utils/trace.py — the structured upgrade of the
    # reference's ``timeit``-only observability, SURVEY.md §5).  ``trace``
    # is False (off), True (trace and print the report when verbose), or a
    # Tracer instance to accumulate into.  Stage boundaries SYNC the async
    # dispatch queue with a scalar fetch — that serializes stages the real
    # pipeline overlaps, so leave it off when timing end-to-end.
    from ics_tpu.utils.trace import Tracer

    tracer = trace if isinstance(trace, Tracer) else (Tracer() if trace else None)

    def _sync(x):
        if tracer is not None and x is not None:
            np.asarray(jnp.sum(x))  # drains the queue through x's producers

    def _stage(name):
        if tracer is not None:
            return tracer.stage(name)
        import contextlib

        return contextlib.nullcontext()

    if resize_backend == "jax":
        resize = lambda a, s: resize_jax(a, s).astype(jnp.float32)
    else:
        resize = lambda a, s: jnp.asarray(
            resize_scipy(np.asarray(a), s), jnp.float32
        )

    def pad_edge(arr, spec):
        return jnp.pad(arr, (*spec, (0, 0)), mode="edge")

    # Upload the raw integer image once and preprocess on device — host
    # NumPy pow/pad on a 20+ MB float image costs ~1 s per call on a weak
    # host, and the raw upload is 4x smaller than float32.
    with _stage("upload + preprocess"):
        samples = 2**bits - 1
        # raw integer upload (4x smaller than f32); pad + normalize +
        # de-gamma happen on device as one fused program
        pic = _preprocess_jit(jnp.asarray(np.ascontiguousarray(pic)), samples)
        _sync(pic)

    if compute_timer is not None:
        # Compute-only end-to-end window: upload-complete -> result-ready-
        # on-device.  A scalar fetch (not block_until_ready, which does not
        # actually block over this host's TPU tunnel — docs/PERFORMANCE.md
        # "Measurement discipline") drains the queue through the
        # preprocessed frame, then the clock starts; it stops at the
        # postprocess NaN-flag fetch below, which forces the whole device
        # program WITHOUT the frame download.  This isolates device compute
        # from the ~10 MB/s tunnel transfers that dominate wall clock here.
        np.asarray(jnp.sum(pic))
        compute_timer["_t0"] = time.perf_counter()

    step = {"normal": 1e-3, "high": 5e-4, "veryhigh": 1e-4, "low": 5e-3}[quality]

    loaded_psf = None
    if psf_path is not None and save_psf_path is not None:
        # with a loaded PSF the blind phase (the only producer of a new
        # estimate) is skipped, so the save would silently never happen
        raise ValueError(
            "psf_path and save_psf_path are mutually exclusive: loading a "
            "PSF skips the blind phase, so there is no new estimate to save"
        )
    if psf_path is not None:
        from ics_tpu.models.checkpoint import load_checkpoint

        ckpt = load_checkpoint(psf_path)
        loaded_psf = np.asarray(ckpt.psf, np.float32)
        if (
            loaded_psf.ndim != 3
            or loaded_psf.shape[0] != loaded_psf.shape[1]
            or loaded_psf.shape[2] != 3
        ):
            raise ValueError(
                f"stored PSF has shape {loaded_psf.shape}; expected (k, k, 3)"
            )
        blur_width = int(loaded_psf.shape[0])

    if blur_width < 3:
        raise ValueError("The blur width should be at least 3 pixels.")
    elif blur_width % 2 == 0:
        raise ValueError(
            "The blur width should be odd. You can use %i." % (blur_width + 1)
        )
    if solver not in ("mm", "pam", "pd"):
        raise ValueError(f"unknown solver {solver!r} (use 'mm', 'pam' or 'pd')")
    if nonblind_levels not in ("all", "final"):
        raise ValueError("nonblind_levels must be 'all' or 'final'")
    if blind_budget is not None and blind_budget < 1:
        raise ValueError("blind_budget must be a positive iteration count")
    if mesh is not None and solver != "mm":
        raise ValueError("mesh sharding is only supported by the 'mm' solver")

    MK = blur_width
    M, N = pic.shape[0], pic.shape[1]

    if mask is None:
        mask = [M // 2, N // 2]
    top = mask[0] - mask_size // 2
    bottom = mask[0] + mask_size // 2
    left = mask[1] - mask_size // 2
    right = mask[1] + mask_size // 2
    if verbose:
        print("Mask size :", (bottom - top + 1), "×", (right - left + 1))
    if not (top > 0 and bottom < M and left > 0 and right < N):
        raise ValueError(
            "The mask is outside the picture boundaries. Move its center "
            "inside or reduce the blur size."
        )

    correlation = blur == "motion"  # ref :154-157
    tolerance = tolerance / 100.0

    # Odd-dimension padding (ref :163-175)
    odd_vert = odd_hor = False
    if pic.shape[0] % 2 == 0:
        pic = pad_edge(pic, ((1, 0), (0, 0)))
        odd_vert = True
    if pic.shape[1] % 2 == 0:
        pic = pad_edge(pic, ((0, 0), (1, 0)))
        odd_hor = True

    if loaded_psf is not None:
        psf = jnp.asarray(loaded_psf, jnp.float32)
    else:
        psf = jnp.asarray(
            np.dstack([uniform_kernel(blur_width)] * 3), jnp.float32
        )

    images, kernels = build_pyramid(blur_width, confidence)

    # precision: 'exact' = float32 reference parity; 'high' = f32 solve
    # with bf16x3-split MXU convs (~7e-6 conv rel err, 1.34x conv speed —
    # RLConfig.conv_precision); 'mixed' = bf16 convs + f32 incremental
    # residual on the non-blind full-frame solves (~2.3x on large frames —
    # see RLConfig.dtype); 'fast' = all-bf16; 'hybrid' = mixed on the
    # COARSE non-blind levels only, exact float32 on the final full-
    # resolution level and the whole blind phase.  The coarse non-blind
    # levels burn most of the solver time but their output only seeds the
    # next level's initialization (it is resized anyway), while the final
    # level — the one whose iterate becomes the output — and the PSF
    # estimation keep parity math.  'hybrid-high' = the same schedule with
    # the coarse levels in f32 + bf16x3-split convs (~7e-6 rel err) rather
    # than bf16 convs — a much smaller seed perturbation at a smaller
    # speedup (TPU only; elsewhere it equals 'exact').  Quality-gated like
    # every precision deviation: see docs/PERFORMANCE.md "Precision modes".
    if precision not in ("exact", "high", "mixed", "fast", "hybrid",
                         "hybrid-high"):
        raise ValueError(
            f"unknown precision {precision!r} (use 'exact', 'high', "
            "'mixed', 'fast', 'hybrid' or 'hybrid-high')"
        )
    solver_dtype = {
        "exact": "float32", "high": "float32", "mixed": "mixed",
        "fast": "bfloat16", "hybrid": "float32", "hybrid-high": "float32",
    }[precision]
    solver_conv_precision = "high" if precision == "high" else "exact"

    deblured_image = pic
    solver_cfg_coarse = None  # per-level override for precision='hybrid'
    if solver == "mm":
        solver_fn = richardson_lucy_MM
        solver_cfg = config or RLConfig(
            p=p, norm=norm, order=order, priority=priority, refocus=refocus,
            dtype=solver_dtype, early_stop=early_stop,
            conv_precision=solver_conv_precision,
            use_tv=use_tv, tv_norm=tv_norm, inner_loop=inner_loop,
            # 'high' keeps f32 dtype so RLConfig's auto-guard stays off,
            # but its ~7e-6 bf16x3 conv perturbation breaks the same
            # epsilon-free DoF assumptions bf16 does on long full-res
            # solves (measured r5: NaN on the 24 MP bench frame) — the
            # guard is bit-identical wherever f32 assumptions hold, so
            # enable it for every non-parity conv path.
            dof_guard=(True if precision == "high" else None),
        )
        if config is None and precision in ("hybrid", "hybrid-high"):
            # 'hybrid': coarse levels in mixed dtype (bf16 convs;
            # dof_guard=None auto-enables — see RLConfig); 'hybrid-high':
            # coarse levels keep f32 math but route convs through the
            # bf16x3-split MXU kernel (~7e-6 rel err — a far smaller
            # perturbation of the level seeds, TPU only).
            solver_cfg_coarse = dataclasses.replace(
                solver_cfg,
                **({"dtype": "mixed"} if precision == "hybrid"
                   else {"conv_precision": "high", "dof_guard": True}),
            )
    elif solver == "pam":
        from ics_tpu.models.rl_pam import richardson_lucy_PAM

        solver_fn = richardson_lucy_PAM
        solver_cfg = config
    elif solver == "pd":
        from ics_tpu.models.rl_pd import richardson_lucy_PD

        solver_fn = richardson_lucy_PD
        solver_cfg = config
    else:
        raise ValueError(f"unknown solver {solver!r} (use 'mm', 'pam' or 'pd')")

    cases = ["non-blind"] if loaded_psf is not None else ["blind", "non-blind"]

    try:
        for case in cases:
            if verbose:
                print("\n===== %s DECONVOLUTION =====" % case)
            deblured_image = pic
            lambd = confidence * 1000  # ref :200

            for i, k in zip(reversed(images), reversed(kernels)):
                if (
                    case == "non-blind"
                    and nonblind_levels == "final"
                    and i != 1.0
                ):
                    continue
                if verbose:
                    print("======== Pyramid step %1.3f ========" % i)

                # Rescale the mask box; force odd/square-ish.  The branch
                # structure (including the inert `>` comparison of a value
                # with itself and the `-= -1`) replicates ref :209-230.
                temp_top = int(i * top)
                temp_bottom = int(i * bottom)
                temp_left = int(i * left)
                temp_right = int(i * right)
                if (temp_bottom - temp_top) % 2 == 0:
                    if (temp_bottom - temp_top) < (temp_right - temp_left):
                        temp_bottom += 1
                    elif (temp_bottom - temp_top) > (temp_right - temp_left):
                        temp_top += 1
                    else:
                        temp_top -= 1
                if (temp_right - temp_left) % 2 == 0:
                    if (temp_bottom - temp_top) < (temp_right - temp_left):
                        temp_left += 1
                    elif (temp_bottom - temp_top) > (temp_bottom - temp_top):
                        temp_right += 1
                    else:
                        temp_right += 1

                temp_width = int(np.floor(i * N))
                temp_height = int(np.floor(i * M))
                if temp_width % 2 == 0:
                    temp_width += 1
                if temp_height % 2 == 0:
                    temp_height += 1
                shape = (temp_height, temp_width, 3)

                with _stage("resize + pad"):
                    temp_blurry_image = resize(pic, shape)
                    deblured_image = resize(deblured_image, shape)

                    if case == "blind":
                        psf_copy = normalize_kernel(resize(psf, (k, k)))
                    else:
                        psf_copy = psf
                        k = kernels[0]
                    _sync(deblured_image)

                # Extra safety padding — the gradient is not evaluated on
                # borders (ref :256-257)
                temp_blurry_image = pad_edge(temp_blurry_image, ((1, 1), (1, 1)))
                deblured_image = pad_edge(deblured_image, ((1, 1), (1, 1)))

                pad = int(np.floor(k / 2))

                if verbose:
                    print("Image size", temp_blurry_image.shape)
                    print("u size", deblured_image.shape)
                    print("Mask size", (temp_bottom - temp_top), (temp_right - temp_left))
                    print("PSF size", psf_copy.shape)

                # No tolerance at lower pyramid scales (ref :268-273)
                tolerance_temp = tolerance if i == 1.0 else 0

                if case == "blind":
                    # blind_budget: cap the coarse-level PSF refinement
                    # (its estimate is only the seed of the next level);
                    # the final full-scale level keeps the full budget.
                    level_iterations = (
                        min(iterations, blind_budget)
                        if blind_budget is not None and i != 1.0
                        else iterations
                    )
                    with _stage("solve (blind)"):
                        res = solver_fn(
                            temp_blurry_image[
                                temp_top - 1 : temp_bottom + 1,
                                temp_left - 1 : temp_right + 1,
                            ],
                            deblured_image[
                                temp_top - pad - 1 : temp_bottom + pad + 1,
                                temp_left - pad - 1 : temp_right + pad + 1,
                            ],
                            psf_copy,
                            pad + 1,
                            temp_bottom - temp_top - pad - 1,
                            pad + 1,
                            temp_bottom - temp_top - pad - 1,
                            0,
                            iterations=level_iterations,
                            step_factor=step,
                            lambd=lambd,
                            blind=True,
                            correlation=correlation,
                            config=solver_cfg,
                            **({"verbose": verbose} if solver == "mm" else {}),
                        )
                        deblured_image = _write_back(
                            deblured_image, res, temp_top, temp_bottom,
                            temp_left, temp_right, pad,
                        )
                        psf = res.psf
                        _sync(res.stats)
                elif preview:
                    res = solver_fn(
                        temp_blurry_image[
                            temp_top - 1 : temp_bottom + 1,
                            temp_left - 1 : temp_right + 1,
                        ],
                        deblured_image[
                            temp_top - pad - 1 : temp_bottom + pad + 1,
                            temp_left - pad - 1 : temp_right + pad + 1,
                        ],
                        psf_copy,
                        pad + 1,
                        temp_bottom - temp_top - pad - 1,
                        pad + 1,
                        temp_bottom - temp_top - pad - 1,
                        tolerance_temp,
                        iterations=iterations,
                        step_factor=step,
                        lambd=lambd,
                        blind=False,
                        config=solver_cfg,
                        **({"verbose": verbose} if solver == "mm" else {}),
                    )
                    deblured_image = _write_back(
                        deblured_image, res, temp_top, temp_bottom,
                        temp_left, temp_right, pad,
                    )
                else:
                    deblured_image = pad_edge(
                        deblured_image, ((pad, pad), (pad, pad))
                    )
                    if mesh is not None:
                        # Shard the full-frame solve by rows across the mesh
                        # (GSPMD halo exchange + collective reductions).
                        from ics_tpu.parallel.tiling import (
                            sharded_richardson_lucy,
                        )

                        full_solver = functools.partial(
                            sharded_richardson_lucy,
                            mesh=mesh,
                            axis=shard_axis,
                        )
                    else:
                        full_solver = solver_fn
                    # precision='hybrid'/'hybrid-high': coarse levels
                    # (whose output only seeds the next level's init) run
                    # reduced precision; the final full-resolution level
                    # keeps exact f32.  Only levels of >= ~2 MP deviate:
                    # smaller solves are sub-second (nothing to win) and
                    # the whiteness stop is most re-roll-chaotic at small
                    # scales — so small-frame runs stay at full parity.
                    level_cfg = (
                        solver_cfg_coarse
                        if (
                            solver_cfg_coarse is not None
                            and i != 1.0
                            and temp_height * temp_width >= _HYBRID_MIN_PIXELS
                        )
                        else solver_cfg
                    )
                    with _stage("solve (non-blind)"):
                        res = full_solver(
                            temp_blurry_image,
                            deblured_image,
                            psf_copy,
                            pad + 1,
                            temp_bottom - temp_top - pad - 1,
                            pad + 1,
                            temp_bottom - temp_top - pad - 1,
                            tolerance_temp,
                            iterations=iterations,
                            step_factor=step,
                            lambd=lambd,
                            blind=False,
                            config=level_cfg,
                            **(
                                {"verbose": verbose} if solver == "mm" else {}
                            ),
                        )
                        deblured_image = res.u
                        _sync(res.stats)

                if stats_out is not None:
                    # RLResult stats stay ON DEVICE (lazy) — appending does
                    # not sync the async level pipeline; fetch after timing.
                    stats_out.append({"case": case, "scale": i, "k": k,
                                      "result": res})

                # Strip the safety padding (ref :322-323)
                temp_blurry_image = temp_blurry_image[1:-1, 1:-1, ...]
                deblured_image = deblured_image[1:-1, 1:-1, ...]

            if case == "blind" and save_psf_path is not None:
                from ics_tpu.models.checkpoint import (
                    SolverCheckpoint,
                    save_checkpoint,
                )

                # Persist immediately after the blind phase so the estimate
                # survives an interrupted non-blind pass.
                save_checkpoint(
                    save_psf_path,
                    SolverCheckpoint(
                        psf=np.asarray(psf),
                        blur_width=blur_width,
                        phase="blind",
                    ),
                )
                if verbose:
                    print("Saved estimated PSF to %s" % save_psf_path)

            if display and case == "blind":  # control preview (ref :331-336)
                import matplotlib.pyplot as plt

                psf_np = np.asarray(psf)
                psf_check = (psf_np - np.amin(psf_np)) / (
                    np.amax(psf_np) - np.amin(psf_np)
                )
                plt.imshow(psf_check, interpolation="lanczos", aspect="equal",
                           vmin=0, vmax=1)
                plt.show()
                plt.imshow(
                    np.asarray(
                        deblured_image[top:bottom, left:right, ...] * 255
                    ).astype(np.uint8),
                    interpolation="lanczos", aspect="equal", vmin=0, vmax=255,
                )
                plt.show()

    except KeyboardInterrupt:
        # Salvage the current iterate on hard interrupt (ref :338-342)
        pass

    with _stage("postprocess + download"):
        # One fused pass: clip/re-gamma/NaN-flag/uint16 cast on device.
        # uint16 halves the final fetch vs f32 over the ~10 MB/s tunnel
        # and is what the 16-bit TIFF save casts to anyway (ref :346-352).
        out_dev, nan_dev = _postprocess_jit(deblured_image)
        has_nan = bool(nan_dev)  # scalar, free next to the frame download
        if compute_timer is not None and "_t0" in compute_timer:
            # The scalar fetch above forced the whole device program
            # (solve chain + postprocess) — stop the compute-only clock
            # BEFORE the frame download below.
            compute_timer["compute_s"] = (
                time.perf_counter() - compute_timer.pop("_t0")
            )
        deblured_image = np.asarray(out_dev)  # single download
    if has_nan:
        # the reference's equivalent diagnostic is the in-solver
        # "has NaN after DoF correction" print (ref lib/deconvolution.pyx:
        # 671-672); surface it at the pipeline level too
        print(
            "WARNING: result contains NaN (solver diverged) — "
            "those pixels are undefined in the 16-bit output."
        )

    if preview:
        filename = filename + "-preview"
        deblured_image = deblured_image[top:bottom, left:right, ...]
    else:
        if odd_hor:
            deblured_image = deblured_image[:, 1:, ...]
        if odd_vert:
            deblured_image = deblured_image[1:, :, ...]
        deblured_image = deblured_image[1:-1, 1:-1, ...]

    if dest_path is not None:
        from ics_tpu.utils.io import save

        with _stage("tiff save"):
            os.makedirs(dest_path, exist_ok=True)
            save(deblured_image, filename, dest_path)

    if tracer is not None and verbose and not isinstance(trace, Tracer):
        print("---- deblur_module stage profile (stages serialized) ----")
        print(tracer.report())

    return deblured_image
