"""Persistent XLA compilation cache — the 'FFTW wisdom' role.

The reference preserved FFTW plans across runs ("saved wisdom",
ref README.md:135-136); the TPU-native equivalent is XLA's persistent
compilation cache: pyramid-level program shapes repeat across runs, so every
level compiles once per machine, not once per process.

GOTCHA this helper exists for: setting ``JAX_COMPILATION_CACHE_DIR`` inside
a script is NOT reliable — any site-wide ``sitecustomize`` that imports jax
at interpreter startup snapshots the config defaults before user code runs,
leaving the cache dir unset and the cache silently disabled.  Updating the
live config after import always works.
"""

from __future__ import annotations

__all__ = ["enable_persistent_cache"]

DEFAULT_CACHE_DIR = "/tmp/ics_tpu_jax_cache"


def enable_persistent_cache(
    path: str = DEFAULT_CACHE_DIR, min_compile_secs: float = 1.0
) -> None:
    """Enable the cross-process compilation cache at ``path``."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
