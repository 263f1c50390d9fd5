"""Device mesh construction.

The reference is strictly single-device (SURVEY.md §2.4); this module is
the TPU-native replacement for its (empty) communication layer: a
`jax.sharding.Mesh` over ICI with a data axis (candidate sequences /
sentence batch) and a model (tensor-parallel) axis, consumed by pjit'd
stage functions via NamedSharding. Collectives are XLA's (psum /
all-gather over ICI) — no explicit communication code.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def _factor(n: int) -> Tuple[int, int]:
    """Split n into (dp, tp) with tp the largest power of two <= sqrt(n)
    dividing n."""
    best = 1
    t = 1
    while t * t <= n:
        if n % t == 0:
            best = t
        t *= 2
    return n // best, best


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp", "tp"),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first `n_devices` devices. With shape=None,
    factorize into (dp, tp)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"make_mesh: need {n_devices} devices but only {len(devices)} "
            f"are visible (platform={devices[0].platform if devices else '?'}). "
            "For a virtual CPU mesh set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
            "before JAX initializes any backend.")
    devices = devices[:n_devices]
    if shape is None:
        shape = _factor(n_devices)
    if int(np.prod(shape)) != n_devices:
        raise ValueError(
            f"make_mesh: shape {tuple(shape)} does not cover "
            f"{n_devices} devices")
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names[: arr.ndim]))
