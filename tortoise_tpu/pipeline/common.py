"""Small helpers shared by the stage drivers."""

from __future__ import annotations

import contextlib


def round_up(n: int, m: int) -> int:
    """Round n up to a multiple of the bucket size m."""
    return ((n + m - 1) // m) * m


def mesh_context(mesh):
    """`with mesh:` when a Mesh is given, else a no-op context."""
    return mesh if mesh is not None else contextlib.nullcontext()


def ensure_device(tree):
    """Move every numpy leaf of a param pytree onto the default device.

    jit re-uploads host-resident leaves on EVERY call; through the
    remote-TPU tunnel that costs seconds per stage invocation (e.g.
    ~0.6 s for the AR embedding tables, ~3 s for the diffusion weights).
    jnp.asarray on an already-committed device array is a no-op, so this
    is safe to call on each driver entry."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, tree)
