"""On-hardware certification and microbenchmarks for the Pallas kernels.

Round-2 lesson (docs/STATUS.md): interpret-mode tests do NOT certify
hardware — they skip Mosaic's DMA alignment rules, the 16 MB scoped-VMEM
limit and lowering coverage, and two kernels shipped broken for a round
that way.  ``certify_kernels`` runs every Pallas kernel ON THE CURRENT
BACKEND against its portable twin and asserts tolerances; ``bench.py
--selftest`` is the one-command wrapper the verify workflow uses.

``bench_conv_backends`` is the chained-scan microbenchmark used for the
conv dispatch decisions: a ``lax.scan`` dependency chain inside ONE jit
call with a single scalar fetch at the end — per-call wall clocks over
the TPU tunnel measure only the relay round trip (see docs/PERFORMANCE.md
"Measurement discipline").
"""

from __future__ import annotations

import time

import numpy as np

__all__ = [
    "certify_kernels",
    "bench_conv_backends",
    "bench_scaling",
    "bench_success_rate",
]


def _real_image(h, w):
    """A real photographic crop (tiled if needed) — the solver's DoF blend
    is chaotic on synthetic random inputs (docs/PERFORMANCE.md), so kernel
    certification uses real image statistics."""
    import os

    path = "/root/reference/img/crop-blured.jpg"
    if os.path.exists(path):
        from PIL import Image

        with Image.open(path) as im:
            base = np.asarray(im, np.float32) / 255.0
    else:
        rng = np.random.default_rng(0)
        base = rng.random((512, 512, 3)).astype(np.float32)
    reps = (-(-h // base.shape[0]), -(-w // base.shape[1]), 1)
    return np.tile(base, reps)[:h, :w]


def certify_kernels(report=print) -> bool:
    """Run all Pallas kernels against their portable twins on the current
    JAX backend.  Returns True when every check passes."""
    import jax
    import jax.numpy as jnp

    checks = []
    ok = True

    def check(name, got_thunk, want, tol):
        nonlocal ok
        try:
            got = np.asarray(
                got_thunk() if callable(got_thunk) else got_thunk, np.float64
            )
            want = np.asarray(want, np.float64)
            scale = max(np.abs(want).max(), 1e-30)
            err = np.abs(got - want).max() / scale
            passed = bool(np.isfinite(err) and err <= tol)
        except Exception as e:  # compile/lowering failures are findings
            err, passed = float("nan"), False
            report(f"[selftest] {name:<22} ERROR: {str(e).splitlines()[0][:140]}")
        ok = ok and passed
        report(
            f"[selftest] {name:<22} rel-err {err:.2e}  tol {tol:.0e}  "
            f"{'PASS' if passed else 'FAIL'}"
        )
        checks.append((name, err, passed))

    rng = np.random.default_rng(11)
    img = jnp.asarray(_real_image(512, 640))
    kern = jnp.asarray(
        np.abs(rng.random((9, 9, 3))).astype(np.float32)
    )
    kern = kern / kern.sum(axis=(0, 1))

    # 1+2. banded conv kernels (VPU taps / MXU banded matmul) vs the fused
    # XLA stencil (scipy-exact, property-tested)
    from ics_tpu.ops.conv import convolve_rgb
    from ics_tpu.ops.pallas_conv import conv_rgb_pallas
    from ics_tpu.ops.pallas_conv_mxu import conv_rgb_pallas_mxu

    want = convolve_rgb(img, kern, mode="same", method="stencil")
    check("conv (VPU band)", lambda: conv_rgb_pallas(img, kern, mode="same"),
          want, 1e-5)
    check(
        "conv (MXU banded)",
        lambda: conv_rgb_pallas_mxu(img, kern, mode="same"),
        want,
        1e-5,
    )
    check(
        "conv (MXU banded bf16)",
        lambda: conv_rgb_pallas_mxu(
            img.astype(jnp.bfloat16), kern.astype(jnp.bfloat16), mode="same"
        ).astype(jnp.float32),
        want,
        2e-2,
    )
    check(
        "conv (MXU bf16x3 f32)",
        lambda: conv_rgb_pallas_mxu(
            img, kern, mode="same", precision="bf16x3"
        ),
        want,
        1e-4,
    )

    # 3. TV stencil
    from ics_tpu.ops.pallas_tv import tv_op_pallas
    from ics_tpu.ops.tv import tv_op

    tv_w, div_w = tv_op(img, 1e-3, order=2, norm=2)
    check("tv magnitude", lambda: tv_op_pallas(img, 1e-3, order=2, norm=2)[0],
          tv_w, 1e-6)
    check("tv divergence", lambda: tv_op_pallas(img, 1e-3, order=2, norm=2)[1],
          div_w, 1e-6)

    # 4. bilateral band kernel vs the portable scan
    from ics_tpu.ops.pallas_bilateral import bilateral_pallas
    from ics_tpu.utils.filters import _bilateral

    plane = img[:256, :384, 1]
    check(
        "bilateral",
        lambda: bilateral_pallas(plane, 4, 0.1, 3.0),
        _bilateral(plane, 4, 0.1, 3.0),
        1e-5,
    )

    # 5. PSF-gradient correlate kernel vs the generic conv formulation
    from ics_tpu.ops.pallas_correlate import psf_gradient
    from ics_tpu.ops.psf import rotate_180

    u_win = img[:263, :263]
    # valid conv of (263, 263) with 9x9 -> (255, 255); MK = 263-255+1 = 9
    err_win = img[4:259, 4:259] - convolve_rgb(u_win, kern, mode="valid")
    check(
        "psf gradient",
        lambda: psf_gradient(u_win, err_win),
        convolve_rgb(rotate_180(u_win), err_win, mode="valid"),
        1e-4,
    )

    # 6. VMEM-resident solver inner loop vs the XLA scan (one blind outer)
    from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM

    small = np.asarray(img[:255, :255])
    u0 = np.pad(small, ((3, 3), (3, 3), (0, 0)), mode="edge")
    psf0 = np.ones((7, 7, 3), np.float32) / 49.0

    def run(inner):
        cfg = RLConfig(inner_loop=inner)
        return richardson_lucy_MM(
            small, u0, psf0, 8, 247, 8, 247, 0.0, iterations=3,
            step_factor=1e-3, lambd=10000, blind=True, config=cfg,
            verbose=False,
        )

    res_x = run("xla")
    check("solver inner loop (u)", lambda: run("pallas").u, res_x.u, 1e-5)
    check("solver inner loop (psf)", lambda: run("pallas").psf, res_x.psf, 1e-4)

    # 7. the statically-unrolled kernel body
    # (pallas_solver._make_kernel_unrolled) against the same XLA reference
    check("solver inner loop unrolled (u)",
          lambda: run("pallas_unrolled").u, res_x.u, 1e-5)
    check("solver inner loop unrolled (psf)",
          lambda: run("pallas_unrolled").psf, res_x.psf, 1e-4)

    # 8. jitted pipeline glue vs eager op-by-op on THIS backend.  Under
    # --xla_allow_excess_precision, fusion may legally re-associate the
    # pow/resize math by 1-2 ulp (measured on v5e r4) — enough to re-roll
    # the solver's chaotic whiteness stop, so a SHIFT in these deltas
    # after a platform/toolchain change explains shifted iteration counts
    # (docs/STATUS.md "Session-3 results").  The tolerance is the ulp
    # class, not bit equality.
    from ics_tpu.models.pipeline import _postprocess_jit, _preprocess_jit
    from ics_tpu.utils.resize import resize_jax

    raw = jnp.asarray(
        np.clip(np.asarray(img[:256, :384]) * 255.0, 0, 255).astype(np.uint8)
    )
    with jax.disable_jit():
        pre_e = (
            jnp.pad(raw.astype(jnp.float32), ((1, 1), (1, 1), (0, 0)),
                    mode="edge") / 255
        ) ** (1 / 2.2)
        post_e = (jnp.clip(img, 0.0, 1.0) ** 2.2 * (2**16 - 1)).astype(
            jnp.uint16
        )
        rsz_e = resize_jax(img, (361, 452)).astype(jnp.float32)
    check("glue preprocess (jit/eager)",
          lambda: _preprocess_jit(raw, 255), pre_e, 1e-6)
    check("glue postprocess (jit/eager)",
          lambda: _postprocess_jit(img)[0].astype(jnp.float32),
          np.asarray(post_e, np.float32), 1e-6)
    check("glue resize (jit/eager)",
          lambda: jax.jit(
              lambda a: resize_jax(a, (361, 452)).astype(jnp.float32)
          )(img), rsz_e, 1e-6)

    report(
        f"[selftest] backend={jax.default_backend()} "
        f"{sum(p for _, _, p in checks)}/{len(checks)} passed"
    )
    return ok


def _chain_time(fn, x, n_iter=20, reps=3):
    """Median seconds per application of fn, measured as a lax.scan chain
    inside one jit with a single scalar fetch."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chained(x0):
        def body(x, _):
            return fn(x), None

        out, _ = lax.scan(body, x0, None, length=n_iter)
        return jnp.sum(out[..., -1])  # scalar dependency on the chain

    float(chained(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def bench_conv_backends(
    shapes=((2048, 3072), (4005, 6005)),
    dtypes=("float32", "bfloat16"),
    mk=9,
    methods=("pallas", "pallas_mxu", "mxu"),
    report=print,
):
    """Chained-scan ms/conv for the 'same'-mode 9x9 per-channel conv across
    backends — the numbers behind ops/conv.py's auto dispatch."""
    import jax.numpy as jnp

    from ics_tpu.ops.conv import convolve_rgb

    rng = np.random.default_rng(2)
    kern = np.abs(rng.random((mk, mk, 3))).astype(np.float32)
    kern = kern / kern.sum(axis=(0, 1))  # magnitude-preserving chain
    results = {}
    for h, w in shapes:
        base = _real_image(h, w)
        for dtype in dtypes:
            x = jnp.asarray(base, getattr(jnp, dtype))
            k = jnp.asarray(kern, getattr(jnp, dtype))
            for method in methods:
                fn = lambda a: convolve_rgb(a, k, mode="same", method=method)
                try:
                    sec = _chain_time(fn, x)
                except Exception as e:  # compile/lowering failure is data
                    report(
                        f"[conv-bench] {h}x{w} {dtype} {method}: FAILED {e!s:.120}"
                    )
                    results[(h, w, dtype, method)] = None
                    continue
                report(
                    f"[conv-bench] {h}x{w} {dtype} {method}: {sec * 1e3:.2f} ms"
                )
                results[(h, w, dtype, method)] = sec * 1e3
    return results


def bench_scaling(
    m=511, n=767, mk=9, iterations=6, ns=(1, 2, 4, 8), reps=3, report=print,
):
    """Relative GSPMD scaling of the row-sharded non-blind solve
    (``parallel.tiling.sharded_richardson_lucy``) vs device count.

    Fixed-work protocol: ``use_stopping=False`` runs exactly
    ``iterations`` outers on every mesh size, so the only variable is the
    partitioning.  Interpretation depends on the devices:

    * On N VIRTUAL CPU devices sharing one physical core (the CI mesh),
      ideal scaling is a FLAT curve: each device's shard shrinks N x while
      the core timeslices all N, so t_N/t_1 ~ 1.0 certifies the GSPMD
      partition adds no serialization, duplicated work, or blocking
      collective chains.  t_N/t_1 >> 1 would flag a partitioning bug.
    * On N real chips the same program's wall clock should DROP ~N x
      (each chip runs its shard concurrently; halo exchanges ride ICI).

    Returns {n_devices: per_outer_seconds}.
    """
    import jax
    import jax.numpy as jnp

    from ics_tpu.parallel import make_mesh, sharded_richardson_lucy

    pad = mk // 2
    img = jnp.asarray(_real_image(m, n))
    u = jnp.asarray(
        np.pad(np.asarray(img), ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    )
    psf = jnp.asarray(np.ones((mk, mk, 3), np.float32) / (mk * mk))
    jax.block_until_ready((img, u, psf))

    results = {}
    t1 = None
    for nd in ns:
        if nd > jax.device_count():
            report(f"[scaling] n={nd}: skipped (only "
                   f"{jax.device_count()} devices)")
            continue
        mesh = make_mesh(nd)

        def run():
            res = sharded_richardson_lucy(
                img, u, psf, pad + 1, m - pad - 1, pad + 1, m - pad - 1,
                0.0, mesh=mesh, iterations=iterations, step_factor=1e-3,
                lambd=10000.0, blind=False, use_stopping=False,
            )
            jax.block_until_ready(res.u)

        run()  # compile + warm
        best = min(_timed(run) for _ in range(reps))
        per_outer = best / iterations
        results[nd] = per_outer
        if t1 is None:
            t1 = per_outer
        report(
            f"[scaling] n={nd}: {per_outer * 1e3:.1f} ms/outer "
            f"(t_n/t_1 = {per_outer / t1:.2f})"
        )
    return results


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _sharp_frame(fallback_size: int = 512) -> np.ndarray:
    """The reference's SHARP fixture, full frame (uint8 HxWx3) — the sharp
    half of the blured/original pair its published benchmark is built on
    (ref img/README.md); deterministic random stand-in off-box."""
    import os

    path = "/root/reference/img/original.jpg"
    if os.path.exists(path):
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im, np.uint8)
    rng = np.random.default_rng(3)
    base = rng.random((fallback_size, fallback_size, 1)).astype(np.float32)
    return (np.repeat(base, 3, axis=-1) * 255).astype(np.uint8)


def _sharp_crop(size: int) -> np.ndarray:
    """Highest-detail size² crop of the reference's SHARP fixture (uint8).

    img/original.jpg is the sharp half of the blured/original synthetic
    pair the reference's own published benchmark is built on
    (ref img/README.md) — real photographic statistics, known ground
    truth.  The crop maximizes mean |gradient| over a coarse grid: a
    SMOOTH crop makes the success metric trivial (blur barely moves the
    display-space error — the full blured/original pair differs by only
    2% rel-L2), so the battery deliberately runs on detail, where
    restoring to < 5% requires actually deblurring."""
    arr = _sharp_frame(fallback_size=size * 2)
    h, w = arr.shape[:2]
    g = np.asarray(arr, np.float32).mean(axis=-1)
    best, top, left = -1.0, 0, 0
    for t in range(0, h - size + 1, max(1, size // 2)):
        for l in range(0, w - size + 1, max(1, size // 2)):
            win = g[t : t + size, l : l + size]
            detail = float(
                np.abs(np.diff(win, axis=0)).mean()
                + np.abs(np.diff(win, axis=1)).mean()
            )
            if detail > best:
                best, top, left = detail, t, l
    return np.ascontiguousarray(arr[top : top + size, left : left + size])


def _blob_kernel(size: int, seed: int) -> np.ndarray:
    """Soft irregular broad PSF — the class the reference's own synthetic
    pair was made with (see ``_fitted_kernel``): a mildly center-weighted
    ragged blob with mass over the full support (fitted profile: center
    ~3x the mean tap, corners ~0.5x — defocus-like, NOT a tight
    Gaussian)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:size, :size] - (size - 1) / 2.0
    radial = 0.5 + 2.6 * np.exp(-(yy**2 + xx**2) / (2 * (size / 3.5) ** 2))
    ragged = np.clip(
        1.0 + 0.5 * gaussian_filter(rng.standard_normal((size, size)), 0.8),
        0.3, 1.7,
    )
    k = radial * ragged
    return (k / k.sum()).astype(np.float32)


def _fitted_kernel() -> np.ndarray:
    """The reference's OWN blur, recovered: least-squares fit of the 7x7
    display-space kernel mapping img/original.jpg to img/blured.jpg
    (residual 0.5%), clipped to >= 0 and normalized.  Fallback: the blob
    class it belongs to."""
    import os

    o_path = "/root/reference/img/original.jpg"
    b_path = "/root/reference/img/blured.jpg"
    if not (os.path.exists(o_path) and os.path.exists(b_path)):
        return _blob_kernel(7, 5)
    from PIL import Image

    with Image.open(o_path) as im:
        og = np.asarray(im, np.float64).mean(-1) / 255.0
    with Image.open(b_path) as im:
        bg = np.asarray(im, np.float64).mean(-1) / 255.0
    ys, xs = np.mgrid[420:680:4, 420:680:4]
    ys, xs = ys.ravel(), xs.ravel()
    cols = [og[ys + dy, xs + dx]
            for dy in range(-3, 4) for dx in range(-3, 4)]
    k, *_ = np.linalg.lstsq(np.stack(cols, axis=1), bg[ys, xs], rcond=None)
    k = np.clip(k.reshape(7, 7), 0.0, None)
    return (k / k.sum()).astype(np.float32)


def make_success_battery(noise_sigma: float = 1.0):
    """The (name, psf, noise) battery behind ``bench_success_rate``.

    Composition mirrors the reference's actual use cases — defocus /
    soft-lens blurs, whose broad shape the solver's uniform PSF init
    approximates (ref README.md:103 "the initial PSF is assumed to be an
    uniform blur, and then refined") — plus tight Gaussians as the
    method's honest hard cases: under reference-parity step sizes the
    blind refinement moves the PSF too slowly to reach a strongly peaked
    shape, a property of the algorithm, not of this port.  ``noise`` is
    the display-space Gaussian sigma in 8-bit counts."""
    from ics_tpu.ops import windows

    fitted = _fitted_kernel()
    return [
        ("uniform-5", windows.uniform_kernel(5), 0.0),
        ("uniform-7", windows.uniform_kernel(7), 0.0),
        ("fitted-7", fitted, 0.0),
        ("blob-7", _blob_kernel(7, 5), 0.0),
        ("blob-9", _blob_kernel(9, 6), 0.0),
        ("lens-7", windows.lens_blur(14), 0.0),
        ("gauss-5", windows.gaussian_kernel(5, 2.0), 0.0),
        ("gauss-7", windows.gaussian_kernel(7, 2.0), 0.0),
        ("uniform-7-noise", windows.uniform_kernel(7), noise_sigma),
        ("fitted-7-noise", fitted, noise_sigma),
        # linear-motion PSFs: names prefixed "motion" make
        # bench_success_rate drive blur="motion" (the reference's
        # correlation=True mode, ref deconvolve.py:154-157 /
        # lib/deconvolution.pyx:584-585)
        ("motion-7-h", windows.motion_kernel(7, 0.0), 0.0),
        ("motion-9-45", windows.motion_kernel(9, 45.0), 0.0),
    ]


def synth_blur_case(sharp8: np.ndarray, psf: np.ndarray, noise_sigma: float,
                    seed: int = 7) -> np.ndarray:
    """Synthesize a blind-deblur input: blur the sharp frame in LINEAR
    light (the physical model the pipeline's de-gamma assumes, ref
    deconvolve.py:102-103), re-gamma, add display-space sensor noise,
    quantize to uint8."""
    from scipy.signal import convolve2d

    lin = (sharp8.astype(np.float32) / 255.0) ** 2.2
    blurred = np.dstack(
        [
            convolve2d(lin[..., c], psf, mode="same", boundary="symm")
            for c in range(3)
        ]
    )
    disp = np.clip(blurred, 0.0, 1.0) ** (1 / 2.2) * 255.0
    if noise_sigma:
        rng = np.random.default_rng(seed)
        disp = disp + rng.normal(0.0, noise_sigma, disp.shape)
    return np.clip(np.rint(disp), 0, 255).astype(np.uint8)


def rel_error(out16: np.ndarray, sharp8: np.ndarray) -> float:
    """Relative L2 error of a pipeline output (uint16, same spatial dims
    as the input frame) against the sharp uint8 original, in display
    (gamma) space — the space the reference's images live in."""
    got = np.asarray(out16, np.float64) / 65535.0
    want = np.asarray(sharp8, np.float64) / 255.0
    return float(
        np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
    )


def bench_success_rate(
    size=None, iterations=200, mask_size=255, report=print, solver="mm",
):
    """Blind-restoration success battery.

    The reference's README claims the MM solver "has found the sharp
    picture at a margin of error of 5 % in more than 50 % of the tests"
    (ref README.md:146-148) without recording the protocol.  This is the
    reproducible counterpart: blur the reference's OWN sharp frame
    (img/original.jpg — the sharp half of its published benchmark pair)
    with the ``make_success_battery`` PSFs (with and without sensor
    noise), run the full blind+non-blind pipeline given only the blur
    WIDTH as a hint and the reference's own published driving parameters
    (quality 'normal', tolerance 0.1, 200 iterations, its own PSF-mask
    window — the v29 case, ref deconvolve.py:385-387), and score the
    restored image against the sharp original in display space.

    The literal 5 %-error bar alone is nearly vacuous — a normal photo's
    blurred frame already sits at ~2-6 % relative L2 from its sharp
    original (the reference's own blured/original pair differs by 2 %,
    and its restored v29 output through this pipeline measures 1.9 %) —
    so success here requires BOTH halves of "found the sharp picture
    within 5 %":

        success := restored rel-L2 error < 5 %  AND  SSIM(restored) >
        SSIM(blurred input)   (it got closer to the sharp picture)

    ``size`` crops the canvas (highest-detail size² crop, centered mask)
    for cheap CPU runs; the measured battery runs on the full frame.
    Returns ``(success_rate, rows)``; each row is ``(name, input_err,
    output_err, input_ssim, output_ssim, success)``.  Measured result
    and interpretation: docs/PERFORMANCE.md "Blind-restoration success
    rate".
    """
    from ics_tpu.models.pipeline import deblur_module
    from ics_tpu.utils.metrics import ssim

    if size is None:
        sharp8 = _sharp_frame()
        mask_kw = {"mask": [584, 795], "mask_size": mask_size}
    else:
        sharp8 = _sharp_crop(size)
        mask_kw = {"mask_size": mask_size}
    want = np.asarray(sharp8, np.float64) / 255.0
    rows = []
    for name, psf, noise in make_success_battery():
        # motion-* cases run the reference's blur="motion" mode
        # (correlation=True: achromatic PSF refinement)
        blur = "motion" if name.startswith("motion") else "static"
        blurred = synth_blur_case(sharp8, psf, noise)
        in_err = float(
            np.linalg.norm(blurred / 255.0 - want) / np.linalg.norm(want)
        )
        in_ssim = float(ssim(blurred / 255.0, want))
        try:
            out = deblur_module(
                blurred, f"success-{name}", None,
                blur_width=psf.shape[0], blur=blur,
                tolerance=0.1, quality="normal",
                iterations=iterations, display=False, preview=False,
                verbose=False, solver=solver, **mask_kw,
            )
            err = rel_error(out, sharp8)
            out_ssim = float(ssim(np.asarray(out, np.float64) / 65535.0, want))
        except RuntimeError as e:  # a diverged solve is a failed case
            report(f"[success] {name:<16} DIVERGED: {e}")
            rows.append((name, in_err, float("inf"), in_ssim, 0.0, False))
            continue
        success = err < 0.05 and out_ssim > in_ssim
        rows.append((name, in_err, err, in_ssim, out_ssim, success))
        report(
            f"[success] {name:<16} err {in_err * 100:5.2f}% -> "
            f"{err * 100:5.2f}%  ssim {in_ssim:.4f} -> {out_ssim:.4f}  "
            f"{'SUCCESS' if success else 'fail'}"
        )
    rate = sum(r[-1] for r in rows) / len(rows)
    report(
        f"[success] rate: {sum(r[-1] for r in rows)}/{len(rows)} "
        f"= {rate * 100:.0f}%  (reference claim: >50%, ref README.md:146-148)"
    )
    return rate, rows


def bench_precision_quality(
    modes=("float32", "high", "mixed"), iterations=200, report=print,
):
    """Precision-mode quality at the REAL 24 MP bench geometry vs ground
    truth (VERDICT r4 item 2: decide the default throughput mode on data).

    Committed protocol (r5 — the r4 table's synthetic-pair numbers came
    from an ad-hoc session script; this replaces them with a reproducible
    one.  Absolute values differ from r4's because the blur differs;
    judge modes RELATIVE to the same-protocol float32 row):

    - sharp truth: the bench frame itself — ``img/153412.jpg`` upscaled
      to 6000x4000 LANCZOS (``bench.py``'s 24 MP case input).
    - degraded input: truth blurred in LINEAR light with the 9x9
      defocus-class blob PSF (``_blob_kernel(9, 6)``, the battery's
      "blob-9" case — the PSF class the reference's own synthetic pair
      was made with), re-gamma'd, quantized to uint8
      (``synth_blur_case``).
    - each mode runs the FULL blind+non-blind pipeline with the bench
      case's own driving parameters (blur_width 9, mask 511 @ [2000,
      3000], tolerance 0.1, quality 'normal', 200-iteration budget).
    - scored vs truth (SSIM / PSNR, display space) and vs the same-run
      float32 output (SSIM) — the parity-adoption bar is 0.999 vs f32;
      the promotion bar for a throughput default is "at or above f32's
      quality band vs truth" (docs/PERFORMANCE.md "Precision modes").

    Returns {mode: {"ssim": ..., "psnr": ..., "ssim_vs_f32": ...,
    "elapsed_s": ..., "outers": ...}}.
    """
    import os
    import time as _time

    from PIL import Image

    from ics_tpu.models.pipeline import deblur_module
    from ics_tpu.utils.metrics import psnr, ssim

    src = "/root/reference/img/153412.jpg"
    if os.path.exists(src):
        with Image.open(src) as im:
            sharp8 = np.asarray(
                im.resize((6000, 4000), Image.LANCZOS), np.uint8
            )
    else:  # deterministic stand-in off-box
        sharp8 = np.tile(_sharp_frame(), (8, 6, 1))[:4000, :6000]
    psf = _blob_kernel(9, 6)
    blurred = synth_blur_case(sharp8, psf, 0.0)
    want = np.asarray(sharp8, np.float64) / 255.0
    in_ssim = float(ssim(blurred / 255.0, want))
    in_psnr = float(psnr(blurred / 255.0, want))
    report(f"[prec-quality] blurred input: SSIM {in_ssim:.4f} "
           f"PSNR {in_psnr:.2f}")

    results = {}
    f32_out = None
    for mode in modes:
        stats = []
        t0 = _time.perf_counter()
        out = deblur_module(
            blurred, f"prec-{mode}", None, blur_width=9,
            mask=[2000, 3000], mask_size=511, tolerance=0.1,
            quality="normal", iterations=iterations, display=False,
            preview=False, verbose=False,
            precision=("exact" if mode == "float32" else mode),
            stats_out=stats,
        )
        elapsed = _time.perf_counter() - t0
        got = np.asarray(out, np.float64) / 65535.0
        del out  # drop the device copy before scoring — the 24 MP frame's
        # HBM footprint plus the pipeline's cached executables has OOM'd a
        # v5e when the metric also ran on-device; scoring is host-side now
        # (metrics._HOST_METRIC_ELEMS) but the hygiene stands.
        import gc
        import jax as _jax

        gc.collect()
        _jax.clear_caches()
        row = {
            "ssim": round(float(ssim(got, want)), 4),
            "psnr": round(float(psnr(got, want)), 2),
            "elapsed_s": round(elapsed, 2),
            "outers": int(sum(s["result"].iterations for s in stats)),
        }
        if mode == "float32":
            f32_out = got
        if f32_out is not None:
            row["ssim_vs_f32"] = round(float(ssim(got, f32_out)), 4)
        results[mode] = row
        report(f"[prec-quality] {mode:<8} SSIM {row['ssim']:.4f}  "
               f"PSNR {row['psnr']:.2f}  vs-f32 "
               f"{row.get('ssim_vs_f32', float('nan')):.4f}  "
               f"{row['elapsed_s']:.1f}s  {row['outers']} outers")
    results["input"] = {"ssim": round(in_ssim, 4), "psnr": round(in_psnr, 2)}
    return results
