"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on these virtual devices (the TPU analog of
"multi-node without a cluster" — SURVEY.md §4); real-chip benchmarks live in
bench.py, not the test suite.
"""

import os

# Force CPU: the ambient environment exports JAX_PLATFORMS=axon (the real
# TPU tunnel), which must never be used by the test suite — the tunnel
# serializes across processes and concurrent clients deadlock.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Installed pytest plugins (jaxtyping) import jax BEFORE this conftest runs,
# which snapshots JAX_PLATFORMS=axon into the config default — so setting
# the env var alone is not enough.  Override the live config as well (legal
# until the first backend is initialized).
import jax

jax.config.update("jax_platforms", "cpu")
