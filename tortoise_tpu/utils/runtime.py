"""JAX runtime knobs shared by the CLI and bench."""

from __future__ import annotations

import os


def force_virtual_cpu(n_devices: int | None = None) -> None:
    """Pin JAX to the CPU backend, optionally with `n_devices` virtual
    host devices — the shared hardening for tests/fixture-generators/
    sharding dry runs (previously triplicated across tests/conftest.py,
    tests/gen_pseudo_golden.py, and __graft_entry__, and the copies had
    diverged: only one replaced a PRE-EXISTING device-count flag, only
    one cleared PALLAS_AXON_POOL_IPS).

    Handles the three environmental traps in one place:
    - an existing --xla_force_host_platform_device_count with a
      DIFFERENT value is replaced, not kept (a CI env pinning 1 device
      would break every 8-device mesh test);
    - jax.config is updated directly and initialized backends are
      cleared (env vars alone are captured too early when a
      sitecustomize pre-registers a plugin);
    - the axon PJRT plugin factory (which can block minutes at init) is
      deregistered, and PALLAS_AXON_POOL_IPS is cleared so child
      processes skip its sitecustomize registration too.
    """
    import re

    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        opt = f"--xla_force_host_platform_device_count={n_devices}"
        if "xla_force_host_platform_device_count" in flags:
            flags = re.sub(
                r"--xla_force_host_platform_device_count=\d+", opt, flags)
        else:
            flags = (flags + " " + opt).strip()
        os.environ["XLA_FLAGS"] = flags
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax._src.xla_bridge as _xb

        if _xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass


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
