"""Runtime configuration helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache -- compiles through the remote-TPU
    tunnel take minutes; cache them across processes/rounds."""
    import jax

    cache_dir = path or os.path.join(
        os.path.dirname(__file__), "..", "..", ".jax_cache"
    )
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_cpu() -> None:
    """Force the CPU backend (env vars are pre-empted by the host's
    sitecustomize TPU registration; config update after import wins)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
