"""Spatial tiling of large images across chips, with halo exchange over ICI.

The reference never tiles the full-resolution solve — it scales to big inputs
only via the coarse-to-fine pyramid and the mask-window PSF estimation
(SURVEY.md §5 "long-context analog").  Here a 24 MP+ image shards by rows
over the ``tile`` mesh axis.  Two mechanisms:

* ``sharded_richardson_lucy`` — the idiomatic path: put the arrays on the
  mesh with ``NamedSharding`` row specs and run the *same* jitted solver;
  XLA's SPMD partitioner inserts the halo exchanges for every convolution
  and turns the reductions into psum/pmax collectives automatically.
* ``sharded_convolve_rgb`` — an explicit ``shard_map`` ring: each shard
  ppermutes its boundary rows to its neighbors (the ring/halo pattern,
  ICI-local for adjacent devices) and runs a valid conv on block+halo.
  Used where manual control beats GSPMD and as the building block for
  Pallas-level overlap later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ics_tpu.models.rl_mm import RLConfig, RLResult, _solve, print_solver_report
from ics_tpu.ops.conv import convolve_rgb
from ics_tpu.ops.reductions import whiteness_weights

__all__ = ["sharded_convolve_rgb", "sharded_richardson_lucy"]


def sharded_convolve_rgb(image, kernel, mesh: Mesh, axis: str = "tile"):
    """'same' per-channel convolution (zero boundary) of a row-sharded image.

    ``kernel`` must be odd-sized.  Boundary rows travel to ring neighbors via
    ``lax.ppermute``; edge shards substitute zeros (the 'same' boundary
    condition).
    """
    mk = kernel.shape[0]
    if mk % 2 == 0:
        raise ValueError("sharded convolution requires an odd kernel")
    h = mk // 2
    n = mesh.shape[axis]

    def local(img_blk, kern):
        idx = lax.axis_index(axis)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_prev = lax.ppermute(img_blk[-h:], axis, fwd)  # my top halo
        from_next = lax.ppermute(img_blk[:h], axis, bwd)  # my bottom halo
        from_prev = jnp.where(idx == 0, 0.0, from_prev)
        from_next = jnp.where(idx == n - 1, 0.0, from_next)
        blk = jnp.concatenate([from_prev, img_blk, from_next], axis=0)
        blk = jnp.pad(blk, ((0, 0), (h, h), (0, 0)))
        return convolve_rgb(blk, kern, mode="valid", method="direct")

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(None, None, None)),
        out_specs=P(axis, None, None),
    )
    return jax.jit(fn)(image, kernel)


@functools.lru_cache(maxsize=64)
def _constrained_solve(mesh, axis, solve_kwargs_items):
    """jit wrapper that row-shards the carry via with_sharding_constraint
    (supports uneven row counts, unlike explicit device_put shardings).

    lru-cached on (mesh, axis, kwargs): the pipeline calls this once per
    pyramid level per run, and a fresh ``jax.jit`` closure would re-trace
    identical shapes every time (the persistent compile cache would catch
    the XLA compile, but not the trace/lower cost)."""
    solve_kwargs = dict(solve_kwargs_items)
    row = NamedSharding(mesh, P(axis, None, None))
    rep = NamedSharding(mesh, P(None, None, None))

    @jax.jit
    def run(image, u, psf, weights):
        image = lax.with_sharding_constraint(image, row)
        u = lax.with_sharding_constraint(u, row)
        psf = lax.with_sharding_constraint(psf, rep)
        return _solve(image, u, psf, weights, **solve_kwargs)

    return run


def sharded_richardson_lucy(
    image,
    u,
    psf,
    top: int,
    bottom: int,
    left: int,
    right: int,
    tau: float,
    *,
    mesh: Mesh,
    axis: str = "tile",
    iterations: int = 200,
    step_factor: float = 1e-3,
    lambd: float = 10000.0,
    blind: bool = True,
    correlation: bool = False,
    config: RLConfig | None = None,
    verbose: bool = False,
    use_stopping: bool = True,
):
    """Run the RL-MM solver with the image tiled by rows across ``mesh``.

    The row sharding enters the program as a ``with_sharding_constraint`` on
    the carry (works for uneven row counts — odd image heights are the norm
    in this pipeline); the GSPMD partitioner then handles conv halos and
    collective reductions.  The FFT backend does not partition by rows, so
    convs are forced to the direct (halo-exchange) path under sharding.
    """
    cfg = config or RLConfig()
    image = jnp.asarray(image, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    psf = jnp.asarray(psf, jnp.float32)
    weights = jnp.asarray(whiteness_weights(bottom - top, right - left))

    run = _constrained_solve(
        mesh,
        axis,
        (
            ("top", int(top)),
            ("bottom", int(bottom)),
            ("left", int(left)),
            ("right", int(right)),
            ("tau", float(tau)),
            ("step_factor", float(step_factor)),
            ("lambd", float(lambd)),
            ("iterations", int(iterations)),
            ("blind", bool(blind)),
            ("correlation", bool(correlation)),
            ("use_tv", cfg.use_tv),
            # pallas_call does not partition under GSPMD; XLA stencil is
            # also the measured winner (ops/tv.py)
            ("tv_method", "xla"),
            ("tv_norm", cfg.tv_norm),
            ("conv_method", "direct"),
            ("conv_precision", cfg.conv_precision),
            # pallas_call does not partition under GSPMD
            ("psf_grad", "conv"),
            ("inner_loop", "xla"),
            ("dtype", cfg.dtype),
            ("dof_guard", cfg.dof_guard),
            ("early_stop", cfg.early_stop),
            ("early_stop_patience", cfg.early_stop_patience),
            # use_stopping=False runs the full fixed budget and skips the
            # whiteness metric — what fixed-work benchmarks (bench.py
            # --scaling) need
            ("use_stopping", bool(use_stopping)),
            ("record", cfg.record_metrics),
        ),
    )
    u_out, u_full, psf_out, image_out, stats, hist = run(image, u, psf, weights)
    res = RLResult(u=u_out, psf=psf_out, image=image_out, stats=stats, u_full=u_full)
    if cfg.record_metrics:
        res.trajectory = {
            k: np.asarray(v)[: res.iterations] for k, v in hist.items()
        }
    if verbose:
        print_solver_report(res, lambd, top, bottom, left, right)
    return res
