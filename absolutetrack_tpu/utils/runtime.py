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


def cpu_device():
    """The host CPU device (exists alongside any accelerator backend)."""
    import jax

    return jax.local_devices(backend="cpu")[0]


def on_cpu():
    """Context manager pinning ops to the CPU backend.

    Host-side prep math (label FK, synthetic rendering, tiny geometry)
    must NOT dispatch op-by-op to a remote accelerator -- each op pays the
    tunnel round trip. Wrap such code in ``with on_cpu():``.
    """
    import jax

    return jax.default_device(cpu_device())
