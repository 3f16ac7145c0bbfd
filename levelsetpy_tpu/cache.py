"""Persistent XLA compilation cache wiring.

Remote-TPU links pay the full compile on every fresh process — a 31^3 x 256
batch-last sweep program costs ~6 minutes cold over the tunnel (CLAUDE.md,
2026-08-20) and even the headline 101^3 solve ~40 s.  JAX ships a persistent
on-disk compilation cache that keys executables on (HLO, compile options,
backend version); enabling it makes every process after the first start in
seconds.

The reference has no equivalent (each notebook rerun pays full torch/CUDA
warmup); this is part of the production-serving posture: replanning services
and sweep workers restart without recompiling.

Call :func:`enable_compilation_cache` once, before the first jit execution.
``bench.py`` / ``bench_all.py`` / the examples all do.
"""
from __future__ import annotations

import os
import pathlib

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.environ.get(
    "LEVELSETPY_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "levelsetpy_tpu",
                 "jax_cache"))


def enable_compilation_cache(path: str | None = None,
                             min_compile_time: float = 1.0) -> str:
    """Turn on JAX's persistent compilation cache at ``path``.

    Executables whose compile took at least ``min_compile_time`` seconds are
    written to disk and reloaded by later processes (same program + backend).
    Returns the cache directory.  Safe to call more than once; no-op if the
    user already configured ``jax_compilation_cache_dir``.
    """
    import jax

    cache_dir = str(path or _DEFAULT_DIR)
    if jax.config.jax_compilation_cache_dir:  # user already configured it
        return jax.config.jax_compilation_cache_dir
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time))
    # cache every entry regardless of how often it is hit
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
