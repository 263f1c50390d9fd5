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


def bucket_of_delta(delta, num_buckets: int = 32, max_distance: int = 64):
    """Bucket ids as a pure elementwise jnp function of j - i.

    Same math as relative_position_buckets (reference
    main.cpp:4722-4749) but gather-free — XLA gathers at production
    sizes cost ~40 ms per denoiser eval on v5e; this is a handful of
    VPU passes. astype(int32) truncates like the reference's C cast."""
    half = num_buckets // 2
    rel = jnp.abs(delta)
    out = jnp.where(delta > 0, half, 0).astype(jnp.int32)
    rel_safe = jnp.maximum(rel, 8).astype(jnp.float32)
    val_if_large = 8 + (
        jnp.log(rel_safe / 8.0) / float(np.log(max_distance / 8.0)) * 8.0
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, half - 1)
    return out + jnp.where(rel < 8, rel.astype(jnp.int32), val_if_large)


def relpos_bias_band(weight, block: int, scale: float = 8.0,
                     num_buckets: int = 32, max_distance: int = 64):
    """Band form of the Toeplitz bias for block sizes >= 64.

    The bucket id saturates for |j - i| >= max_distance (and in fact for
    |delta| >= ~50 with the defaults), so every tile with block diagonal
    |d| >= 2 is a CONSTANT. Returns (band (H, 3, block, block) f32 for
    d in {-1, 0, 1}, scalars (H, 2) f32 = [far-left, far-right])."""
    dgrid = jnp.asarray([-1, 0, 1])[:, None, None]
    ii = jnp.arange(block)[None, :, None]
    jj = jnp.arange(block)[None, None, :]
    delta = dgrid * block + jj - ii
    ids = bucket_of_delta(delta, num_buckets, max_distance)
    onehot = (ids[..., None] ==
              jnp.arange(num_buckets)).astype(weight.dtype)
    band = jnp.einsum("dijn,nh->hdij", onehot, weight,
                      preferred_element_type=jnp.float32) * scale
    far = bucket_of_delta(jnp.asarray([-4 * block, 4 * block]),
                          num_buckets, max_distance)
    scalars = (weight.astype(jnp.float32)[far] * scale).T  # (H, 2)
    return band, scalars


def relpos_bias_band_stacked(weights, block: int, scale: float = 8.0,
                             num_buckets: int = 32, max_distance: int = 64):
    """relpos_bias_band over a layer-stacked (L, NB, H) table: returns
    (band (L, H, 3, block, block), scalars (L, H, 2)). Precompute this
    ONCE per diffusion call and feed it to the attention layers as scan
    xs — building the band inside the step loop (where the per-layer
    table is a scan slice XLA cannot hoist) cost ~0.3 ms x 13 layers x 80
    steps (~30% of the whole denoise loop, r2 bisect)."""
    import jax

    return jax.vmap(
        lambda w: relpos_bias_band(w, block, scale, num_buckets,
                                   max_distance))(weights)


def relpos_bias_blocks(weight, nq: int, nk: int, block: int,
                       scale: float = 8.0, num_buckets: int = 32,
                       max_distance: int = 64):
    """Distinct per-block-diagonal bias tiles for the flash kernel.

    The T5 bucket bias depends only on j - i, so for square (block,
    block) tiles there are only nq+nk-1 distinct tiles. Returns
    (H, nq+nk-1, block, block) f32: tile d belongs to key-block j and
    query-block i with d = j - i + nq - 1. Gather-free: bucket ids come
    from bucket_of_delta and the table lookup is a one-hot matmul."""
    nd = nq + nk - 1
    dgrid = jnp.arange(nd)[:, None, None]
    ii = jnp.arange(block)[None, :, None]
    jj = jnp.arange(block)[None, None, :]
    delta = (dgrid - (nq - 1)) * block + jj - ii      # (ND, B, B)
    ids = bucket_of_delta(delta, num_buckets, max_distance)
    onehot = (ids[..., None] ==
              jnp.arange(num_buckets)).astype(weight.dtype)
    blocks = jnp.einsum("dijn,nh->hdij", onehot, weight,
                        preferred_element_type=jnp.float32)
    return blocks * scale
