"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require the real TPU; sharding tests use the virtual devices.

The surrounding environment may pin JAX to a tunneled TPU plugin (e.g.
JAX_PLATFORMS=axon registered by a sitecustomize at interpreter start, whose
plugin init can block for minutes). Setting the env var here is too late —
jax.config already captured it — so we update the config directly and
deregister the plugin factory before any backend initializes.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb

    if _xb.backends_are_initialized():  # a fixture already touched devices
        from jax.extend.backend import clear_backends

        clear_backends()
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
