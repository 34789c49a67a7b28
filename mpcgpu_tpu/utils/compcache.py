"""Persistent XLA compilation cache for the remote-attached TPU.

Remote (axon-tunneled) compiles are slow -- the flagship closed-loop scan
program takes ~20 min cold -- but the JAX persistent compilation cache
works across processes over the tunnel (measured 12.6 s -> 0.65 s on a
probe program).  Every TPU entry point (bench.py, __graft_entry__.py,
scripts/tpu_*.py) calls :func:`enable_persistent_cache` first so repeat
runs of the same program (e.g. the driver's round-end bench after a
warm-up run, or a kernel-regression rerun) skip compilation entirely.

The reference has no analogue (nvcc compiles are offline); this is pure
TPU-operations plumbing.
"""
from __future__ import annotations

import os
from pathlib import Path

_CACHE_DIR = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_persistent_cache(cache_dir: str | os.PathLike | None = None) -> str:
    """Point JAX's persistent compilation cache at a repo-local directory.

    Safe to call multiple times and before/after jax import (the
    sitecustomize on this machine imports jax at interpreter start, so
    env vars are too late -- this uses jax.config, which is not).
    Returns the cache directory used.
    """
    import jax

    d = Path(cache_dir) if cache_dir is not None else _CACHE_DIR
    d.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(d))
    # cache everything: remote round-trips make even small compiles slow
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return str(d)
