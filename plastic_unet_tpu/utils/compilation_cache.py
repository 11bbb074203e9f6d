"""Persistent XLA compilation cache.

First compiles through the TPU stack cost tens of seconds; enabling the
on-disk cache makes every subsequent process start warm. Called by the CLI
entry points, bench.py and __graft_entry__; safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "plastic_unet_tpu_xla")


def _backend_is_cpu() -> bool:
    """Decide the platform WITHOUT initializing a backend.

    jax.default_backend() force-initializes the default backend as a side
    effect — fatal for a config-only helper: a caller that invokes this
    before setting jax_platforms would lock in the axon TPU backend and
    claim the single-client relay (CLAUDE.md). Read the config/env that the
    repo's CPU-forcing paths set; only fall back to a live query when a
    backend already exists (then querying is side-effect-free)."""
    import jax

    platforms = getattr(jax.config, "jax_platforms", None) or os.environ.get(
        "PLASTIC_UNET_PLATFORM", ""
    )
    if platforms:
        return platforms.split(",")[0].strip().lower() == "cpu"
    try:
        from jax._src import xla_bridge

        if xla_bridge._backends:  # already initialized elsewhere
            return jax.default_backend() == "cpu"
    except Exception:
        pass
    # Config silent and no backend yet: do NOT initialize one just to decide.
    # This environment's silent default is the axon TPU — treat as accelerator.
    return False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable the on-disk cache — accelerator backends only.

    On the CPU backend the cache is deliberately NOT enabled: serializing
    certain CPU executables (donated-buffer scan graphs) segfaults the
    process in this JAX build (`compilation_cache.put_executable_and_time`,
    observed twice in the test suite once cache writes actually happened —
    round 3). CPU compiles are seconds, not minutes, so the cache buys
    little there anyway. Set PLASTIC_UNET_FORCE_CPU_CACHE=1 to override.
    """
    import jax

    path = cache_dir or os.environ.get("PLASTIC_UNET_XLA_CACHE", _DEFAULT_DIR)
    try:
        if _backend_is_cpu() and not os.environ.get("PLASTIC_UNET_FORCE_CPU_CACHE"):
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # 0.0 (not the jax default 1.0): every MISS must write an entry so
        # bench.py's _CacheProbe ("no new entry file => HIT") stays sound
        # even for graphs that compile in under a second. The extra small
        # entries are harmless; the big epoch graphs dominate the dir.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # cache is an optimization; never fail the run for it
