"""Multi-host (DCN) initialization and batch fan-out.

The reference is single-process (SURVEY.md §2.2 "no multi-node layer").
The TPU-native scale-out story: intra-image tiling rides ICI
(parallel/tiling.py); independent images fan out across hosts over DCN —
pure data parallelism with no cross-image traffic, so DCN bandwidth is
irrelevant to the solve itself.

``initialize()`` wraps ``jax.distributed.initialize`` with the standard
TPU-pod environment detection; after it, ``jax.devices()`` spans the pod and
the same ``make_mesh`` / ``batched_deconvolve`` calls scale across hosts
(each host feeds its addressable shard of the batch).
"""

from __future__ import annotations

import jax

__all__ = ["initialize", "local_batch_slice"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host JAX runtime.  On TPU pods all arguments
    auto-detect from the environment; pass them explicitly elsewhere."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(batch_size: int) -> slice:
    """The slice of a globally-sharded batch this host should load.

    With B images sharded over P processes, host p loads images
    [p*B/P, (p+1)*B/P) — the host-side contract for feeding
    ``batched_deconvolve`` under multi-host meshes.
    """
    p = jax.process_index()
    n = jax.process_count()
    per = batch_size // n
    if batch_size % n:
        raise ValueError(
            f"batch size {batch_size} must be divisible by process count {n}"
        )
    return slice(p * per, (p + 1) * per)
