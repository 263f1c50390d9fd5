"""JAX runtime knobs shared by the CLI and bench."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes (first-run compiles of the
    production graphs take minutes; cached reloads take seconds)."""
    import jax

    path = path or os.environ.get(
        "TORTOISE_XLA_CACHE",
        os.path.expanduser("~/.cache/tortoise_tpu_xla"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is best-effort
