"""Sharding specs for the model pytrees.

Data parallelism: the AR candidate batch / sentence batch and the
diffusion cond-uncond batch shard over the "dp" mesh axis. Tensor
parallelism: the transformer's fused qkv / mlp matmuls shard their wide
dimension over "tp" (Megatron-style column/row split); XLA GSPMD inserts
the all-reduces. The layer-stacked leading axis is never sharded (it is
scanned over).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

def batch_spec(mesh: Mesh, ndim: int, axis: int = 0,
               name: str = "dp") -> NamedSharding:
    """Shard dimension `axis` of an ndim-array over the data axis."""
    spec = [None] * ndim
    spec[axis] = name
    return NamedSharding(mesh, P(*spec))


def ar_param_specs(mesh: Mesh) -> dict:
    """NamedShardings for the AR param pytree: column-parallel qkv/fc,
    row-parallel proj, replicated embeddings and norms."""
    col = NamedSharding(mesh, P(None, None, "tp"))   # (L, d, wide)
    row = NamedSharding(mesh, P(None, "tp", None))   # (L, wide, d)
    vec = NamedSharding(mesh, P(None, "tp"))         # (L, wide)
    rep = replicated(mesh)
    blocks = {
        "ln1_w": rep, "ln1_b": rep, "ln2_w": rep, "ln2_b": rep,
        "attn_w": col, "attn_b": vec,
        "proj_w": row, "proj_b": rep,
        "fc_w": col, "fc_b": vec,
        "fc_proj_w": row, "fc_proj_b": rep,
    }
    return {
        "text_emb": rep, "text_pos": rep, "mel_emb": rep, "mel_pos": rep,
        "blocks": blocks,
        "ln_f_w": rep, "ln_f_b": rep, "lm_ln_w": rep, "lm_ln_b": rep,
        # lm head is (V, d): split the vocab dim
        "lm_w": NamedSharding(mesh, P("tp", None)),
        "lm_b": NamedSharding(mesh, P("tp")),
    }


def shard_tree(tree, specs):
    """Device-put a pytree according to a matching pytree of shardings."""
    return jax.tree.map(
        lambda a, s: jax.device_put(a, s), tree, specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def place_batch(arr, mesh: Optional[Mesh], batch_axis: int = 0):
    """Device-put a batched array with its batch axis sharded over "dp"
    (replicated fallback when the batch does not divide the dp size).
    mesh=None returns the array unchanged."""
    if mesh is None:
        return arr
    import numpy as np

    arr = np.asarray(arr) if not hasattr(arr, "sharding") else arr
    dp = mesh.shape.get("dp", 1)
    if arr.shape[batch_axis] % dp != 0:
        import warnings

        warnings.warn(
            f"place_batch: batch size {arr.shape[batch_axis]} does not "
            f"divide the dp axis ({dp}); falling back to REPLICATED "
            "placement — no data parallelism for this array. Use a batch "
            "that is a multiple of the dp size.",
            stacklevel=2,
        )
        return jax.device_put(arr, replicated(mesh))
    return jax.device_put(arr, batch_spec(mesh, arr.ndim, batch_axis))
