"""Headline benchmark: blind RL-TV deconvolution throughput on one chip.

Two cases, both full blind+non-blind pipelines in exact float32 (the
reference-parity math):

1. **24 MP** (BASELINE.md's target workload): `img/153412.jpg` upscaled to
   6000x4000.  Baseline: the reference took 18 MINUTES for the non-blind
   phase alone of this image (ref README.md:157-161); we run blind +
   non-blind.  The headline is f32 (reference-parity math); two
   secondary cases ride along: precision='high' (bf16x3-split MXU
   convs, ~7e-6 rel err, DoF guard — quality-equal to f32 on the
   committed protocol at ~1.26x per-outer speed, but the guarded stop
   trajectory re-rolls the outer count) and precision='mixed' (bf16
   MXU convs + f32 residual + DoF guard).  Neither reduced mode is
   parity-certified — their stops re-roll — and end-to-end wall clock
   rides the chaotic outer count, not per-outer speed; '--profile
   fast' is the recommended throughput flag (see docs/PERFORMANCE.md
   "Precision modes").
2. **1.9 MP** (the reference's published benchmark): blind TV-MM
   deconvolution of img/blured.jpg with its own v29 parameters
   (ref deconvolve.py:382-386) — 189 s on the reference's 8-thread CPU
   (ref README.md:139-144).

Prints ONE JSON line for the 24 MP case (metric/value/unit/vs_baseline),
with the 1.9 MP case nested under "case_1_9mp".  Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_1_9MP_SECONDS = 189.0  # ref README.md:139-144
BASELINE_24MP_SECONDS = 18 * 60.0  # ref README.md:157-161 (non-blind only)

# bf16 MXU peak FLOP/s by device kind (substring match, lowercase) — the
# standard MFU denominator.  The f32 solve runs its convs on the VPU
# (bit-parity), whose peak is far lower, so its MFU-of-MXU-peak is small
# by construction; it is reported for cross-framework comparability next
# to the HBM-roofline analysis in docs/PERFORMANCE.md.
_BF16_PEAK_FLOPS = {
    "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12, "v4": 275e12,
    "v6 lite": 918e12, "v6e": 918e12,
}


def _per_outer_probe(iters=10, reps=3, conv_precision="exact"):
    """Fixed-work per-outer seconds at the 24 MP final-level geometry.

    One jit call (tau=1e9 never satisfies the stop => exactly ``iters``
    outers) with a single scalar fetch — the chained-measurement
    discipline (docs/PERFORMANCE.md): per-call wall clocks over a TPU
    tunnel would otherwise measure the relay round trip.

    ``conv_precision='high'`` probes the bf16x3-split MXU conv path (the
    per-outer throughput mode) at the same geometry.
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    from ics_tpu.models.rl_mm import RLConfig, richardson_lucy_MM
    from ics_tpu.utils.selftest import _real_image

    m, n, mk = 4001, 6001, 9
    pad = mk // 2
    img = jnp.asarray(_real_image(m, n))
    u = jnp.asarray(
        np.pad(np.asarray(img), ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    )
    psf = jnp.asarray(np.ones((mk, mk, 3), np.float32) / (mk * mk))
    jax.block_until_ready((img, u, psf))

    def run():
        res = richardson_lucy_MM(
            img, u, psf, 200, 700, 200, 700, 1e9, iterations=iters,
            step_factor=1e-3, lambd=10000.0, blind=False, verbose=False,
            config=RLConfig(conv_precision=conv_precision),
        )
        return float(jnp.sum(res.stats))

    run()  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = _time.perf_counter()
        run()
        best = min(best, _time.perf_counter() - t0)
    # conv FLOPs only (5 inner iterations x 2 convs x 2*mk^2 MACs x 3
    # channels) — the >=97% term of the solver's arithmetic
    model_flops = 5 * 2 * 2 * (mk * mk) * 3 * m * n
    return best / iters, model_flops


def _load(path, fallback_shape):
    from ics_tpu.utils.io import load_image

    if os.path.exists(path):
        return load_image(path)
    rng = np.random.default_rng(0)
    from PIL import Image

    return Image.fromarray(
        (rng.random(fallback_shape) * 255).astype(np.uint8)
    )


def _run_case(pic, kwargs, label, reps=1):
    """Warm (compile) + timed run(s).  Returns (elapsed_s, total_outer_iters).

    ``reps`` > 1 takes the best of that many timed runs: the tunnel's
    relay bandwidth varies ~6× between sessions and within them (see
    docs/PERFORMANCE.md "Measurement discipline"), so a single timed run
    can charge a relay hiccup to the compute headline.
    """
    import contextlib

    from ics_tpu import deblur_module

    # stdout must stay pure (ONE JSON line at the end) — the pipeline's
    # @timeit decorator prints its wall clock to stdout by reference
    # parity, so route it to stderr here
    t0 = time.time()
    with contextlib.redirect_stdout(sys.stderr):
        deblur_module(pic, f"{label}-warmup", None, **kwargs)
    print(f"[{label}] warmup (incl. compile): {time.time() - t0:.2f}s",
          file=sys.stderr)

    elapsed = float("inf")
    compute_s = float("inf")
    for rep in range(reps):
        stats = []
        ctimer = {}
        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):
            out = deblur_module(pic, label, None, **kwargs, stats_out=stats,
                                compute_timer=ctimer)
        rep_s = time.time() - t0
        print(f"[{label}] timed run {rep + 1}/{reps}: {rep_s:.2f}s "
              f"(compute-only {ctimer.get('compute_s', float('nan')):.2f}s)",
              file=sys.stderr)
        elapsed = min(elapsed, rep_s)
        compute_s = min(compute_s, ctimer.get("compute_s", float("inf")))
    # out is uint16 (can't carry NaN) — a diverged solve shows as NaN in
    # the per-level solver stats instead
    assert out.dtype == np.uint16
    assert all(np.isfinite(s["result"].M_r) for s in stats), "solver diverged"
    iters = sum(s["result"].iterations for s in stats)  # fetched post-timing
    for s in stats:
        r = s["result"]
        print(f"[{label}] {s['case']} scale={s['scale']:.3f} k={s['k']}: "
              f"{r.iterations} outer, converged={r.converged}",
              file=sys.stderr)
    return elapsed, iters, compute_s


def main():
    import argparse

    import jax
    from PIL import Image

    from ics_tpu.utils.cache import enable_persistent_cache

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--selftest", action="store_true",
        help="certify every Pallas kernel on the CURRENT backend against "
             "its portable twin (run on the real TPU — interpret-mode "
             "tests do not certify hardware) and exit",
    )
    ap.add_argument(
        "--kernels", action="store_true",
        help="chained-scan microbenchmark of the conv backends and exit",
    )
    ap.add_argument(
        "--success-rate", action="store_true",
        help="blind-restoration success battery (the reference README's "
             "'sharp picture within 5%% error in >50%% of tests' claim, "
             "ref README.md:146-148, made reproducible) and exit",
    )
    ap.add_argument(
        "--precision-quality", action="store_true",
        help="quality of each precision mode (float32/high/mixed) at the "
             "real 24 MP bench geometry vs a synthetic ground truth "
             "(committed protocol: utils.selftest.bench_precision_quality)"
             " and exit — run on the real TPU: 'high'/'mixed' engage the "
             "MXU conv kernels there",
    )
    ap.add_argument(
        "--scaling", action="store_true",
        help="fixed-work sharded-solve scaling curve over n=1,2,4,8 "
             "devices and exit (re-execs onto a virtual 8-device CPU mesh "
             "when fewer than 8 real devices are attached — the relative "
             "curve certifies the GSPMD partition; see "
             "utils.selftest.bench_scaling for interpretation)",
    )
    ap.add_argument(
        "--scaling-shape", default=None, metavar="MxN",
        help="frame shape for --scaling (default 511x767; pass 4001x6001 "
             "for the REAL 24 MP final-level geometry — the shape the "
             "'~14/N s' projection rides on)",
    )
    ap.add_argument(
        "--scaling-iters", type=int, default=None, metavar="K",
        help="fixed outer-iteration count per --scaling run (default 6; "
             "lower it at the 24 MP geometry — the virtual CPU mesh runs "
             "~100x slower per outer than one v5e chip)",
    )
    ap.add_argument(
        "--scaling-reps", type=int, default=None, metavar="R",
        help="timed repetitions per mesh size for --scaling (default 3)",
    )
    args = ap.parse_args()

    if args.scaling:
        # Default: a virtual 8-device CPU mesh in a re-exec'd child (the
        # relative curve certifies the GSPMD partition without touching
        # any attached accelerator — querying the device count here
        # would already claim the TPU tunnel).  Set ICS_SCALING_REAL=1
        # to run on the real attached devices instead (multi-chip slice).
        scaling_kw = {}
        if args.scaling_shape:
            m_s, n_s = args.scaling_shape.lower().split("x")
            scaling_kw.update(m=int(m_s), n=int(n_s))
        if args.scaling_iters is not None:
            scaling_kw["iterations"] = args.scaling_iters
        if args.scaling_reps is not None:
            scaling_kw["reps"] = args.scaling_reps
        if os.environ.get("ICS_SCALING_REAL") == "1":
            from ics_tpu.utils.selftest import bench_scaling

            enable_persistent_cache()
            bench_scaling(**scaling_kw)
            raise SystemExit(0)
        if os.environ.get("ICS_SCALING_CPU") == "1":
            # Child: a site-wide sitecustomize may import jax and pin the
            # ambient platform before env vars are consulted, so override
            # through the live config — legal until the first backend
            # initializes (i.e., before any device query).
            jax.config.update("jax_platforms", "cpu")
            from ics_tpu.utils.selftest import bench_scaling

            enable_persistent_cache()
            bench_scaling(**scaling_kw)
            raise SystemExit(0)
        import subprocess

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["ICS_SCALING_CPU"] = "1"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        child_argv = [sys.executable, __file__, "--scaling"]
        if args.scaling_shape:
            child_argv += ["--scaling-shape", args.scaling_shape]
        if args.scaling_iters is not None:
            child_argv += ["--scaling-iters", str(args.scaling_iters)]
        if args.scaling_reps is not None:
            child_argv += ["--scaling-reps", str(args.scaling_reps)]
        raise SystemExit(subprocess.call(child_argv, env=env))

    if args.precision_quality:
        from ics_tpu.utils.selftest import bench_precision_quality

        enable_persistent_cache()
        results = bench_precision_quality(report=lambda *a: print(*a, file=sys.stderr))
        print(json.dumps({
            "metric": "precision-mode quality, 24MP synthetic pair "
                      "(blob-9 linear-light blur of the bench frame), "
                      "full blind pipeline, SSIM/PSNR vs truth",
            "value": results.get("high", {}).get("ssim"),
            "unit": "SSIM (precision=high)",
            "vs_baseline": (
                round(results["high"]["ssim"] / results["float32"]["ssim"], 4)
                if "high" in results and "float32" in results else None
            ),
            "modes": results,
        }))
        raise SystemExit(0)

    if args.success_rate:
        from ics_tpu.utils.selftest import bench_success_rate

        enable_persistent_cache()
        rate, rows = bench_success_rate()
        print(json.dumps({
            "metric": "blind-restoration success rate (restored rel-L2 "
                      "error < 5% vs sharp original AND SSIM improved, "
                      "12-case synthetic battery incl. motion blurs)",
            "value": rate,
            "unit": "fraction",
            "vs_baseline": round(rate / 0.5, 2),  # ref claim: >50%
            "cases": {
                name: {"input_err": round(ie, 4),
                       "restored_err": round(oe, 4),
                       "input_ssim": round(is_, 4),
                       "restored_ssim": round(os_, 4),
                       "success": s}
                for name, ie, oe, is_, os_, s in rows
            },
        }))
        raise SystemExit(0 if rate > 0.5 else 1)

    if args.selftest or args.kernels:
        from ics_tpu.utils.selftest import bench_conv_backends, certify_kernels

        enable_persistent_cache()
        ok = True
        if args.selftest:
            ok = certify_kernels()
        if args.kernels:
            bench_conv_backends()
        raise SystemExit(0 if ok else 1)

    # Cross-process compile reuse (the reference's "FFTW wisdom" analog).
    # Must go through jax.config.update — the env var is snapshotted before
    # this script runs when a sitecustomize imports jax at startup.
    enable_persistent_cache()

    device = str(jax.devices()[0])

    # ---- case 1: 24 MP, mixed precision ---------------------------------
    src = _load("/root/reference/img/153412.jpg", (3233, 4872, 3))
    if not isinstance(src, Image.Image):
        src = Image.fromarray(np.asarray(src, np.uint8))
    pic24 = np.asarray(src.resize((6000, 4000), Image.LANCZOS))
    mp24 = pic24.shape[0] * pic24.shape[1] / 1e6

    kwargs24 = dict(
        blur_width=9,
        mask=[2000, 3000],
        mask_size=511,
        display=False,
        tolerance=0.1,
        quality="normal",
        preview=False,
        blur="static",
        iterations=200,
        verbose=False,
        precision="exact",
    )
    el24, iters24, comp24 = _run_case(pic24, kwargs24, "bench-24mp", reps=2)

    # Secondary: the same case in mixed precision (bf16 MXU convs + f32
    # residual + DoF guard incl. the r4 dof<=1 clamp).  ~1.4x faster
    # end-to-end than f32 warm; quality on the synthetic ground-truth
    # pair is SSIM 0.9430 vs truth (f32: 0.9564) / 0.9943 vs the f32
    # output — below the 0.999 parity-adoption bar, so it is reported,
    # not the headline.  See docs/PERFORMANCE.md "Precision modes".
    el24m, iters24m, comp24m = _run_case(
        pic24, {**kwargs24, "precision": "mixed"}, "bench-24mp-mixed"
    )

    # Secondary: precision='high' (bf16x3-split MXU convs, ~7e-6 rel err,
    # everything else exact f32, DoF guard on since r5 — the unguarded
    # mode went non-finite on this very frame).  Quality-equal to f32 on
    # the committed protocol (SSIM 1.0000 vs same-run f32) at ~1.26x the
    # per-outer speed, but the guard's dof<=1 clamp re-rolls the chaotic
    # whiteness stops, so END-TO-END time can lose to f32 on outer count
    # (633 vs 198 on this frame) — see PERFORMANCE.md "Precision modes";
    # '--profile fast' caps the burn and is the recommended throughput
    # flag.
    el24h, iters24h, comp24h = _run_case(
        pic24, {**kwargs24, "precision": "high"}, "bench-24mp-high"
    )

    # Fixed-work per-outer probe and FLOP-model MFU at the final-level
    # geometry: the per-outer number is the transfer-free measure of
    # solver compute (the end-to-end elapsed above is tunnel-dominated in
    # this environment — docs/PERFORMANCE.md "The < 2 s / 24 MP target").
    per_outer_s, model_flops = _per_outer_probe()
    per_outer_s_high, _ = _per_outer_probe(conv_precision="high")
    kind = jax.devices()[0].device_kind.lower()
    peak = next(
        (v for k, v in _BF16_PEAK_FLOPS.items() if k in kind), None
    )
    print(
        f"[probe] 24MP f32 per-outer: {per_outer_s * 1e3:.1f} ms, "
        f"model {model_flops / per_outer_s / 1e9:.0f} GFLOP/s"
        + (f", MFU {model_flops / per_outer_s / peak * 100:.2f}% of bf16 "
           f"MXU peak" if peak else ""),
        file=sys.stderr,
    )
    print(
        f"[probe] 24MP 'high' per-outer: {per_outer_s_high * 1e3:.1f} ms "
        f"({per_outer_s / per_outer_s_high:.2f}x f32)"
        + (f", MFU {model_flops / per_outer_s_high / peak * 100:.2f}% of "
           f"bf16 MXU peak" if peak else ""),
        file=sys.stderr,
    )

    # ---- case 2: 1.9 MP, exact f32 (the reference's own case) -----------
    pic19 = np.asarray(_load("/root/reference/img/blured.jpg", (1367, 1394, 3)))
    mp19 = pic19.shape[0] * pic19.shape[1] / 1e6
    kwargs19 = dict(
        blur_width=7,
        mask=[584, 795],
        display=False,
        tolerance=0.1,
        quality="normal",
        preview=False,
        blur="static",
        iterations=200,
        verbose=False,
        precision="exact",
    )
    el19, iters19, comp19 = _run_case(pic19, kwargs19, "bench-1.9mp")

    result = {
        "metric": "blind RL-TV-MM deconvolution, 24MP (6000x4000), full "
                  "pipeline, exact float32 (reference-parity math)",
        "value": round(mp24 / el24, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round((mp24 / el24) / (mp24 / BASELINE_24MP_SECONDS), 2),
        "elapsed_s": round(el24, 3),
        "compute_only_s": round(comp24, 3),
        "compute_only_mp_per_s": round(mp24 / comp24, 4),
        "baseline_s": BASELINE_24MP_SECONDS,
        "iters_per_s_24mp": round(iters24 / el24, 3),
        "total_outer_iters_24mp": iters24,
        "solver_per_outer_ms_24mp_f32": round(per_outer_s * 1e3, 2),
        "solver_per_outer_ms_24mp_high": round(per_outer_s_high * 1e3, 2),
        "solver_model_gflop_per_outer": round(model_flops / 1e9, 2),
        "solver_model_gflop_per_s": round(model_flops / per_outer_s / 1e9, 1),
        "solver_mfu_pct_of_bf16_peak": (
            round(model_flops / per_outer_s / peak * 100, 3) if peak else None
        ),
        "case_24mp_high": {
            "metric": "same case, precision=high (bf16x3-split MXU convs, "
                      "~7e-6 rel err, else exact f32, DoF guard) — "
                      "quality-equal to f32 on the committed protocol and "
                      "~1.26x per-outer, but the guarded stop trajectory "
                      "re-rolls the outer count (PERFORMANCE.md)",
            "value": round(mp24 / el24h, 4),
            "unit": "MP/s/chip",
            "elapsed_s": round(el24h, 3),
            "compute_only_s": round(comp24h, 3),
            "total_outer_iters": iters24h,
        },
        "case_24mp_mixed": {
            "metric": "same case, precision=mixed (bf16 MXU convs, f32 "
                      "residual, DoF guard) — throughput mode; whiteness "
                      "stop trajectory differs from f32 (see PERFORMANCE.md)",
            "value": round(mp24 / el24m, 4),
            "unit": "MP/s/chip",
            "elapsed_s": round(el24m, 3),
            "compute_only_s": round(comp24m, 3),
            "total_outer_iters": iters24m,
        },
        "case_1_9mp": {
            "metric": "blind RL-TV-MM of img/blured.jpg (1.9MP), full "
                      "pipeline, exact f32",
            "value": round(mp19 / el19, 4),
            "unit": "MP/s/chip",
            "vs_baseline": round(
                (mp19 / el19) / (mp19 / BASELINE_1_9MP_SECONDS), 2
            ),
            "elapsed_s": round(el19, 3),
            "compute_only_s": round(comp19, 3),
            "baseline_s": BASELINE_1_9MP_SECONDS,
            "iters_per_s": round(iters19 / el19, 3),
        },
        "device": device,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
