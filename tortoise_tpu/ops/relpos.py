"""T5-style relative position buckets, as the reference computes them
host-side in get_relative_position_buckets (main.cpp:4722-4749):

bidirectional, 32 buckets total = 16 "query after key" + 16 "query before or
at key"; within each half, exact buckets for |distance| < 8, then
log-spaced up to max_distance 64, clamped to bucket 15.

The reference computes `val_if_large` with C float->int truncation; we
reproduce that (np.trunc / astype(int)) rather than floor, though they only
differ for negative arguments which cannot occur here (distance >= 8).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def relative_position_buckets(length: int, num_buckets: int = 32,
                              max_distance: int = 64) -> np.ndarray:
    """(length, length) int32 bucket ids; bucket[i, j] for query i, key j."""
    half = num_buckets // 2  # 16
    i = np.arange(length)[:, None]
    j = np.arange(length)[None, :]
    rel = np.abs(j - i)
    out = np.where(i < j, half, 0).astype(np.int64)
    rel_safe = np.maximum(rel, 8)  # rel < 8 uses the exact branch below
    val_if_large = 8 + (
        np.log(rel_safe / 8.0) / np.log(max_distance / 8.0) * (16.0 - 8.0)
    ).astype(np.float32).astype(np.int64)
    val_if_large = np.minimum(val_if_large, half - 1)
    out += np.where(rel < 8, rel, val_if_large)
    return out.astype(np.int32)


def relpos_bias(weight, buckets, scale: float = 8.0):
    """Gather the (buckets, heads) embedding table into an additive
    (heads, L, L) attention bias, scaled by the reference's x8
    (main.cpp:3265-3266)."""
    bias = jnp.take(weight, buckets, axis=0)  # (L, L, H)
    return jnp.transpose(bias, (2, 0, 1)) * scale
