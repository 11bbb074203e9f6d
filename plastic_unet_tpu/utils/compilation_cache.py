"""Persistent XLA compilation cache.

First compiles through the TPU stack cost tens of seconds; enabling the
on-disk cache makes every subsequent process start warm. Called by the CLI
entry points, bench.py and __graft_entry__; safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "plastic_unet_tpu_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get("PLASTIC_UNET_XLA_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the run for it
