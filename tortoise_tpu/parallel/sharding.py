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


def _diffusion_attn_specs(mesh: Mesh) -> dict:
    """Shardings for one stacked attention group (leading L = layer axis,
    never sharded). The qkv rows are per-head interleaved
    (h*192 + part*64 + d, main.cpp:3229-3245), so splitting the 3*d output
    dim over "tp" splits whole heads as long as tp divides n_head; the
    rel-pos bias table (nb, h) splits over the same head axis. proj is the
    matching row-parallel matmul — GSPMD inserts the all-reduce back onto
    the replicated residual stream."""
    rep = replicated(mesh)
    return {
        "attn_norm_w": rep, "attn_norm_b": rep,
        "attn_qkv_w": NamedSharding(mesh, P(None, "tp", None)),
        "attn_qkv_b": NamedSharding(mesh, P(None, "tp")),
        "attn_proj_w": NamedSharding(mesh, P(None, None, "tp")),
        "attn_proj_b": rep,
        "attn_rel_w": NamedSharding(mesh, P(None, None, "tp")),
    }


def _diffusion_res_specs(mesh: Mesh) -> dict:
    """FiLM resblock: in_conv column-parallel, out_conv row-parallel. The
    group norm between them reduces within 32-channel groups, so a "tp"
    split of the 1024 channels (tp <= 32, group-aligned) keeps its
    statistics shard-local; its affine and the conv bias shard to match.
    The tiny emb linear stays replicated (its (B, 2C) output feeds the
    sharded FiLM as a broadcast)."""
    rep = replicated(mesh)
    return {
        "res_in_norm_w": rep, "res_in_norm_b": rep,
        "res_in_conv_w": NamedSharding(mesh, P(None, "tp", None)),
        "res_in_conv_b": NamedSharding(mesh, P(None, "tp")),
        "res_emb_w": rep, "res_emb_b": rep,
        "res_out_norm_w": NamedSharding(mesh, P(None, "tp")),
        "res_out_norm_b": NamedSharding(mesh, P(None, "tp")),
        "res_out_conv_w": NamedSharding(mesh, P(None, None, "tp", None)),
        "res_out_conv_b": rep,
    }


def diffusion_param_specs(mesh: Mesh) -> dict:
    """NamedShardings for the diffusion param pytree: Megatron-style tp
    over each layer's attention heads and resblock hidden channels; the
    small top-level convs/norms and the residual stream stay replicated.
    Requires tp | n_head (16) and tp | n_groups (32)."""
    rep = replicated(mesh)
    layer = {**_diffusion_res_specs(mesh), **_diffusion_attn_specs(mesh)}
    return {
        "cond_scale": rep, "cond_shift": rep,
        "latent_conv_w": rep, "latent_conv_b": rep,
        "latent_blocks": _diffusion_attn_specs(mesh),
        "code_norm_w": rep, "code_norm_b": rep,
        "time_w0": rep, "time_b0": rep, "time_w1": rep, "time_b1": rep,
        "integrator": layer,
        "inp_w": rep, "inp_b": rep,
        "integrating_w": rep, "integrating_b": rep,
        "layers": layer,
        "tail": _diffusion_res_specs(mesh),
        "out_norm_w": rep, "out_norm_b": rep,
        "out_w": rep, "out_b": rep,
        "uncond": rep,
    }


def vocoder_param_specs(mesh: Mesh, n_stages: int = 3) -> dict:
    """NamedShardings for the vocoder param pytree. The compute mass is
    the kernel predictor's kernel_conv (24576 output channels per stage =
    4 conv_blocks x 32 c_in x 64 c_out x 3 taps): split its output
    channels over "tp" (GSPMD reshards at the per-block reshape). The
    trunk's 32-channel convs are too narrow to split — they stay
    replicated and ride the "dp" batch axis instead."""
    rep = replicated(mesh)
    col3 = NamedSharding(mesh, P("tp", None, None))
    stage = {
        "convt_w": rep, "convt_b": rep,
        "kp_in_w": rep, "kp_in_b": rep,
        "kp_res": {"w1": rep, "b1": rep, "w3": rep, "b3": rep},
        "kp_kernel_w": col3,
        "kp_kernel_b": NamedSharding(mesh, P("tp")),
        "kp_bias_w": col3,
        "kp_bias_b": NamedSharding(mesh, P("tp")),
        "cb_w": rep, "cb_b": rep,
    }
    return {
        "pre_w": rep, "pre_b": rep,
        "stages": [stage] * n_stages,
        "post_w": rep, "post_b": rep,
    }


def shard_tree(tree, specs):
    """Device-put a pytree according to a matching pytree of shardings."""
    return jax.tree.map(
        lambda a, s: jax.device_put(a, s), tree, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
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
