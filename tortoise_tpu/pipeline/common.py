"""Small helpers shared by the stage drivers."""

from __future__ import annotations

import contextlib


def round_up(n: int, m: int) -> int:
    """Round n up to a multiple of the bucket size m."""
    return ((n + m - 1) // m) * m


def mesh_context(mesh):
    """`with mesh:` when a Mesh is given, else a no-op context."""
    return mesh if mesh is not None else contextlib.nullcontext()
