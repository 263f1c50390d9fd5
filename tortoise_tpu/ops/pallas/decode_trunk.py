"""Fused AR decode trunk: all 30 GPT-2 layers in ONE Pallas kernel.

The XLA lowering of the per-token decode step (models/ar.py::decode_step,
a lax.scan over layers) bottoms out at ~15 small fusions per layer — at
(B, 1024) vector shapes each costs ~1 us of fixed op overhead, so the
scan spends ~0.3 ms/step on dispatch alone, plus 0.16 ms on the KV-slab
dynamic-update-slice, against a 0.47 ms int8 weight-streaming floor
(r3 profile of the 64-step loop; see scripts/ubench_decode.py). This
kernel runs the whole trunk as one grid-(L,) Mosaic program: the
activation vector lives in a VMEM scratch carried across grid steps,
each step streams one layer's int8 weights + its KV cache slice through
VMEM (double-buffered by the pipeline), and the only outputs are the
fresh per-layer K/V rows and the final hidden state.

Semantics mirror decode_step exactly (reference: the per-token graph
rebuild at main.cpp:5227-5247, block math at main.cpp:2718-2983):
pre-LN -> fused qkv -> per-head softmax(QK/8) over [cached | fresh]
columns -> proj -> residual -> LN -> GELU MLP -> residual. The fresh
token's score column is folded into the softmax max/denominator exactly
like the XLA path (no (C+1)-lane concat).

Weights arrive as the int8 pairs produced by
pipeline/ar_stage.cast_matmul_weights(int8=True): wq (L, in, out) int8
with per-layer per-column scales (L, 1, out); biases and LN params f32.
The matvecs dequantize the weight tile to bf16 inside the kernel (the
stream from HBM — the bound — stays int8) and accumulate f32 on the MXU.

Off-TPU the kernel runs in interpreter mode (tests drive it on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _matvec_q8(y, wq_ref, scale, bias):
    """(B, in) f32 @ int8 (in, out) -> f32 (B, out). The weight tile is
    dequantized to bf16 in VMEM; f32 MXU accumulation via
    preferred_element_type, matching ops.basic.pdot's int8 plane.
    scale/bias are the (1, out)/(out,) rows for this layer."""
    wb = wq_ref[0].astype(jnp.bfloat16)
    acc = jnp.dot(y.astype(jnp.bfloat16), wb,
                  preferred_element_type=jnp.float32)
    return acc * scale + bias


def _kernel(x_ref, bias_ref,
            ln1w_ref, ln1b_ref, attnw_ref, attns_ref, attnb_ref,
            projw_ref, projs_ref, projb_ref,
            ln2w_ref, ln2b_ref, fcw_ref, fcs_ref, fcb_ref,
            fpw_ref, fps_ref, fpb_ref,
            k_ref, v_ref,
            xout_ref, krow_ref, vrow_ref,
            x_scr,
            *, n_layer: int, n_head: int, d_head: int, eps: float):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _init():
        x_scr[:] = x_ref[:].astype(jnp.float32)

    x = x_scr[:]                                     # (B, D) f32
    b, d = x.shape
    h, dh = n_head, d_head
    scale = 1.0 / (d_head ** 0.5)

    # ---- attention ----
    # small per-layer vectors (LN params, biases, scales) are resident as
    # full (L, ...) arrays — Mosaic block shapes must keep the trailing
    # (8, 128) tiling, which a (1, D) slice would break — and are indexed
    # by the grid step here (a sublane-dim dynamic index, which is cheap)
    y = _layer_norm(x, ln1w_ref[l], ln1b_ref[l], eps)
    qkv = _matvec_q8(y, attnw_ref, attns_ref[l], attnb_ref[l])  # (B, 3D)
    q, k_new, v_new = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    krow_ref[0] = k_new.astype(krow_ref.dtype)
    vrow_ref[0] = v_new.astype(vrow_ref.dtype)

    k_l = k_ref[0]                                   # (B, C, H*Dh) bf16
    v_l = v_ref[0]
    bias = bias_ref[:]                               # (B, C) f32 additive
    ctx_cols = []
    for g in range(h):
        qh = q[:, g * dh:(g + 1) * dh] * scale       # (B, Dh) f32
        # scores over the cached slots for this head
        s_parts = []
        for bi in range(b):
            kh = k_l[bi, :, g * dh:(g + 1) * dh]     # (C, Dh)
            s_parts.append(
                jnp.dot(qh[bi:bi + 1].astype(jnp.bfloat16),
                        kh.T.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32))
        s = jnp.concatenate(s_parts, axis=0) + bias  # (B, C)
        self_s = jnp.sum(
            qh * k_new[:, g * dh:(g + 1) * dh].astype(jnp.float32),
            axis=-1, keepdims=True)                  # (B, 1)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), self_s)
        e = jnp.exp(s - m)
        e_self = jnp.exp(self_s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
        c_parts = []
        for bi in range(b):
            vh = v_l[bi, :, g * dh:(g + 1) * dh]     # (C, Dh)
            c_parts.append(
                jnp.dot(e[bi:bi + 1].astype(jnp.bfloat16),
                        vh.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32))
        ctx = (jnp.concatenate(c_parts, axis=0)
               + e_self * v_new[:, g * dh:(g + 1) * dh]) / denom
        ctx_cols.append(ctx)                         # (B, Dh) f32
    merged = jnp.concatenate(ctx_cols, axis=-1)      # (B, D)
    attn = _matvec_q8(merged, projw_ref, projs_ref[l], projb_ref[l])
    x = x + attn

    # ---- MLP ----
    y = _layer_norm(x, ln2w_ref[l], ln2b_ref[l], eps)
    hdn = _matvec_q8(y, fcw_ref, fcs_ref[l], fcb_ref[l])   # (B, F)
    hdn = jax.nn.gelu(hdn, approximate=True)
    x = x + _matvec_q8(hdn, fpw_ref, fps_ref[l], fpb_ref[l])

    x_scr[:] = x

    @pl.when(l == n_layer - 1)
    def _fin():
        xout_ref[:] = x


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "eps", "interpret", "vmem_mb"),
)
def fused_decode_trunk(
    blocks: dict,
    cache_k: jax.Array,
    cache_v: jax.Array,
    bias_row: jax.Array,
    x: jax.Array,
    n_head: int = 16,
    eps: float = 1e-5,
    interpret: bool = False,
    vmem_mb: int = 100,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the full decode trunk. blocks: the int8 stacked layer tree
    (cast_matmul_weights(int8=True)["blocks"]); cache_k/v (L, B, C, H*Dh)
    bf16; bias_row (B, C) additive 0/NEG_INF f32; x (B, D) f32 embedded
    input. Returns (hidden (B, D) f32, k_rows (L, B, H*Dh), v_rows) with
    the rows in the cache dtype — the caller writes them into slot n with
    one dynamic_update_slice (as decode_step does)."""
    l, bsz, c, hd = cache_k.shape
    d = x.shape[-1]
    f = blocks["fc_w"][0].shape[-1]
    d_head = d // n_head

    def fixed(shape):
        return pl.BlockSpec(shape, lambda li: tuple(0 for _ in shape))

    def per_layer(*shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda li: (li,) + tuple(0 for _ in range(nd)))

    # big weights: one layer per block, streamed/double-buffered by the
    # pipeline. Small vectors (LN params, scales, biases): whole (L, ...)
    # arrays resident in VMEM (~2 MB total), indexed by grid step.
    in_specs = [
        fixed((bsz, d)),                 # x
        fixed((bsz, c)),                 # bias
        fixed((l, d)), fixed((l, d)),    # ln1 w/b
        per_layer(d, 3 * d), fixed((l, 1, 3 * d)), fixed((l, 3 * d)),
        per_layer(d, d), fixed((l, 1, d)), fixed((l, d)),
        fixed((l, d)), fixed((l, d)),    # ln2 w/b
        per_layer(d, f), fixed((l, 1, f)), fixed((l, f)),
        per_layer(f, d), fixed((l, 1, d)), fixed((l, d)),
        per_layer(bsz, c, hd),           # k cache slice
        per_layer(bsz, c, hd),           # v cache slice
    ]
    aw, asc = blocks["attn_w"]
    pw, psc = blocks["proj_w"]
    fw, fsc = blocks["fc_w"]
    fpw, fpsc = blocks["fc_proj_w"]
    args = [
        x, bias_row,
        blocks["ln1_w"], blocks["ln1_b"],
        aw, asc, blocks["attn_b"],
        pw, psc, blocks["proj_b"],
        blocks["ln2_w"], blocks["ln2_b"],
        fw, fsc, blocks["fc_b"],
        fpw, fpsc, blocks["fc_proj_b"],
        cache_k, cache_v,
    ]

    kernel = functools.partial(
        _kernel, n_layer=l, n_head=n_head, d_head=d_head, eps=eps)

    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_mb * 2**20,
        )
    xout, k_rows, v_rows = pl.pallas_call(
        kernel,
        grid=(l,),
        in_specs=in_specs,
        out_specs=[
            fixed((bsz, d)),
            per_layer(bsz, hd),
            per_layer(bsz, hd),
        ],
        scratch_shapes=[pltpu.VMEM((bsz, d), jnp.float32)],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, d), jnp.float32),
            jax.ShapeDtypeStruct((l, bsz, hd), cache_k.dtype),
            jax.ShapeDtypeStruct((l, bsz, hd), cache_v.dtype),
        ],
        interpret=interpret,
        **params,
    )(*args)
    return xout, k_rows, v_rows
