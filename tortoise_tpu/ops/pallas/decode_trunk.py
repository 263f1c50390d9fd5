"""Fused AR decode trunk: all 30 GPT-2 layers in ONE Pallas kernel.

The XLA lowering of the per-token decode step (models/ar.py::decode_step,
a lax.scan over layers) bottoms out at ~15 small fusions per layer — at
(B, 1024) vector shapes each costs ~1 us of fixed op overhead, so the
scan spends ~0.3 ms/step on dispatch alone, plus 0.16 ms on the KV-slab
dynamic-update-slice, against a 0.47 ms int8 weight-streaming floor
(r3 profile of the 64-step loop; see scripts/ubench_decode.py). This
kernel runs the whole trunk as one grid-(L, B) Mosaic program (rows
iterate fastest, so all B rows share each layer's single int8 weight
fetch): the per-row activation vectors live in a (B, D) VMEM scratch
carried across grid steps, each (l, b) step streams that layer's weights
plus ONE row's KV cache slice through VMEM (double-buffered by the
pipeline), and the only outputs are the fresh per-layer K/V row blocks
(staged per row in f32 scratch, flushed once per layer) and the final
hidden state. Per-batch arrays use full-B blocks — Mosaic's trailing
(8, 128) tiling rule forbids single-row blocks over a B > 1 batch dim —
so VMEM need grows only by the small (B, ·) vectors and Mosaic compile
time is independent of B.

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


F32_LOWEST = -3.4028235e38


def _sample(logits, prev_ref, u_ref, tok_ref, sampler):
    """In-kernel sampler: repetition penalty -> temperature -> top-k
    (iterative argmax; ~50 VPU passes over the (B, Vp) rows) -> the
    reference's suffix-sum nucleus rule -> inverse-CDF draw against a
    pre-drawn uniform per row. Mirrors ops.sampling.process_logits_topk +
    sample_from_topk exactly (modulo float-identical logit ties); outside
    the kernel that chain costs ~0.19 ms/step of small-fusion overhead.
    The cumulative sums run as (B, K)x(K, K) triangular matmuls — a
    lane-axis cumsum lowers poorly in Mosaic. Every op is row-parallel:
    B rows sample together in the same passes (the sampler runs ONCE, at
    the last (layer, row) grid step)."""
    temperature, top_k, top_p_drop, penalty = sampler
    x = logits                                          # (B, Vp) f32
    bsz, vp = x.shape
    kk = 128                                            # padded k domain
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, vp), 1)
    prev = prev_ref[:]                                  # (B, 1) int32
    pen = jnp.where(x < 0, x * penalty, x / penalty)
    x = jnp.where(lanes == prev, pen, x)
    x = x * (1.0 / temperature)

    # everything stays (B, 1)-shaped (keepdims reductions, broadcasting
    # compares): Mosaic has no scalar VMEM load/store
    kl = jax.lax.broadcasted_iota(jnp.int32, (1, kk), 1)

    def pick(i, carry):
        x, vals, ids = carry
        m = jnp.max(x, axis=-1, keepdims=True)          # (B, 1)
        idx = jnp.min(jnp.where(x == m, lanes, vp),
                      axis=-1, keepdims=True)           # first on ties
        vals = jnp.where(kl == i, m, vals)
        ids = jnp.where(kl == i, idx, ids)
        x = jnp.where(lanes == idx, F32_LOWEST, x)
        return x, vals, ids

    vals0 = jnp.full((bsz, kk), F32_LOWEST, jnp.float32)
    ids0 = jnp.zeros((bsz, kk), jnp.int32)
    _, vals, ids = jax.lax.fori_loop(0, top_k, pick, (x, vals0, ids0))

    active = kl < top_k
    v = jnp.where(active, vals, F32_LOWEST)
    e = jnp.where(active,
                  jnp.exp(v - jnp.max(v, axis=-1, keepdims=True)), 0.0)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    row = jax.lax.broadcasted_iota(jnp.int32, (kk, kk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (kk, kk), 1)
    suffix = jnp.dot(p, (row >= col).astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    drop = (suffix <= top_p_drop) & (kl > 0)            # never drop #0
    v2 = jnp.where(drop, F32_LOWEST, v)
    e2 = jnp.where(active & ~drop,
                   jnp.exp(v2 - jnp.max(v2, axis=-1, keepdims=True)), 0.0)
    p2 = e2 / jnp.sum(e2, axis=-1, keepdims=True)
    cum = jnp.dot(p2, (row <= col).astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    pos = jnp.minimum(
        jnp.sum(((cum < u_ref[:]) & active).astype(jnp.int32),
                axis=-1, keepdims=True),
        top_k - 1)                                      # (1, 1)
    tok_ref[:] = jnp.sum(jnp.where(kl == pos, ids, 0),
                         axis=-1, keepdims=True)


def _kernel(x_ref, bias_ref,
            ln1w_ref, ln1b_ref, attnw_ref, attns_ref, attnb_ref,
            projw_ref, projs_ref, projb_ref,
            ln2w_ref, ln2b_ref, fcw_ref, fcs_ref, fcb_ref,
            fpw_ref, fps_ref, fpb_ref,
            k_ref, v_ref,
            *refs,
            n_layer: int, n_head: int, d_head: int, eps: float,
            with_head: bool, sampler: tuple | None):
    if with_head and sampler is not None:
        (lnfw_ref, lnfb_ref, lmlnw_ref, lmlnb_ref,
         lmw_ref, lms_ref, lmb_ref, prev_ref, u_ref,
         xout_ref, krow_ref, vrow_ref, logits_ref, tok_ref,
         x_scr, k_scr, v_scr) = refs
    elif with_head:
        (lnfw_ref, lnfb_ref, lmlnw_ref, lmlnb_ref,
         lmw_ref, lms_ref, lmb_ref,
         xout_ref, krow_ref, vrow_ref, logits_ref,
         x_scr, k_scr, v_scr) = refs
    else:
        xout_ref, krow_ref, vrow_ref, x_scr, k_scr, v_scr = refs
    # grid (L, B), rows fastest: every weight block's index map depends
    # only on l, so the pipeline fetches each layer's weights ONCE and
    # all B rows ride the same stream. Per-batch arrays (x, bias, the
    # fresh K/V rows, logits, tokens) use FULL-array blocks — Mosaic
    # requires block last-two dims divisible by (8, 128) or equal to the
    # array dims, so a (1, D) row block over a (B, D) array is illegal on
    # real TPU for B > 1 — and the kernel picks its row with the grid id.
    # Only the per-(l, row) KV-cache slice streams per step, so VMEM need
    # and Mosaic compile time stay independent of B (the earlier per-row
    # python unroll compiled O(B) bodies and streamed (B, C, HD) KV
    # blocks).
    l = pl.program_id(0)
    bi = pl.program_id(1)
    bsz = x_ref.shape[0]

    @pl.when((l == 0) & (bi == 0))
    def _init():
        x_scr[:] = x_ref[:].astype(jnp.float32)

    x = x_scr[bi][None]                              # (1, D) f32
    d = x.shape[-1]
    h, dh = n_head, d_head
    scale = 1.0 / (d_head ** 0.5)

    # ---- attention ----
    # small per-layer vectors (LN params, biases, scales) are resident as
    # full (L, ...) arrays — Mosaic block shapes must keep the trailing
    # (8, 128) tiling, which a (1, D) slice would break — and are indexed
    # by the grid step here (a sublane-dim dynamic index, which is cheap)
    y = _layer_norm(x, ln1w_ref[l], ln1b_ref[l], eps)
    qkv = _matvec_q8(y, attnw_ref, attns_ref[l], attnb_ref[l])  # (1, 3D)
    q, k_new, v_new = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    # fresh K/V rows stage through f32 scratch: a dynamic single-sublane
    # store into the bf16 output block is illegal (bf16 packs 2 sublanes
    # per word — Mosaic requires the index be provably even); the full
    # (B, HD) block is flushed in the output dtype once per layer, at the
    # last row's step
    k_scr[bi] = k_new[0]
    v_scr[bi] = v_new[0]

    @pl.when(bi == bsz - 1)
    def _flush_rows():
        krow_ref[0] = k_scr[:].astype(krow_ref.dtype)
        vrow_ref[0] = v_scr[:].astype(vrow_ref.dtype)

    k_l = k_ref[0, 0]                                # (C, H*Dh) bf16
    v_l = v_ref[0, 0]
    bias = bias_ref[bi][None]                        # (1, C) f32 additive
    # Per-head attention via a BLOCK-DIAGONAL head layout: row h of the
    # (H, H*Dh) matrix holds q's head-h slice in its own columns, zeros
    # elsewhere, so ONE (H, HD)x(HD, C) dot yields the per-head score
    # rows (the off-head terms multiply exact zeros — bit-identical to
    # per-head dots) and ONE (H, C)x(C, HD) dot yields per-head context
    # rows, from which the head-h column slice is selected by the same
    # mask. 2 MXU dots vs the 2*H tiny (1, Dh) dots of the naive form —
    # K-depth goes 64 -> 1024 and the op count stops scaling with H.
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (h, h * dh), 1) // dh
             == jax.lax.broadcasted_iota(jnp.int32, (h, h * dh), 0)
             ).astype(jnp.float32)                   # (H, HD) block-diag
    qb = (q * scale) * hmask                         # (H, HD) f32
    qbb = qb.astype(jnp.bfloat16)
    s = jnp.dot(qbb, k_l.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)          # (H, C)
    s = s + bias
    # fresh-token score in f32 elementwise (off-head terms are exact
    # zeros), matching the XLA path's f32 self term
    self_s = jnp.sum(qb * k_new, axis=-1, keepdims=True)     # (H, 1)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), self_s)
    e = jnp.exp(s - m)                               # (H, C)
    e_self = jnp.exp(self_s - m)                     # (H, 1)
    denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
    ctxf = jnp.dot(e.astype(jnp.bfloat16), v_l.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)       # (H, HD)
    ctxf = (ctxf + e_self * v_new) / denom
    merged = jnp.sum(ctxf * hmask, axis=0, keepdims=True)    # (1, HD)
    attn = _matvec_q8(merged, projw_ref, projs_ref[l], projb_ref[l])
    x = x + attn

    # ---- MLP ----
    y = _layer_norm(x, ln2w_ref[l], ln2b_ref[l], eps)
    hdn = _matvec_q8(y, fcw_ref, fcs_ref[l], fcb_ref[l])   # (1, F)
    hdn = jax.nn.gelu(hdn, approximate=True)
    x = x + _matvec_q8(hdn, fpw_ref, fps_ref[l], fpb_ref[l])

    x_scr[bi] = x[0]

    @pl.when((l == n_layer - 1) & (bi == bsz - 1))
    def _fin():
        # all rows' post-trunk hiddens are in x_scr once the LAST row of
        # the LAST layer finishes; emit them (and the head) in one shot —
        # the (B, D) x (D, Vp) head matmul beats B separate matvecs on
        # the MXU and the sampler's VPU passes run once, not B times.
        xs = x_scr[:]                                # (B, D) f32
        xout_ref[:] = xs
        if with_head:
            # lm head fused into the final grid step: the double-norm
            # chain + the (D, Vp) int8 matmul. Outside the kernel this
            # chain costs ~0.28 ms/step of small-fusion overhead on (1, D)
            # vectors (r3 probe: double-LN 0.128 ms + int8 matvec 0.158);
            # in here it is ~20 us of extra weight streaming. The lm
            # weight uses a fixed BlockSpec, so the pipeline fetches it
            # once per call, not per layer or row.
            y = _layer_norm(xs, lnfw_ref[0], lnfb_ref[0], eps)
            y = _layer_norm(y, 1.0, 0.0, eps)
            y = y * lmlnw_ref[0] + lmlnb_ref[0]
            yb = y.astype(jnp.bfloat16)
            vp = lmw_ref.shape[-1]
            # chunk the dequantized bf16 weight tile (a full (D, 8320)
            # bf16 intermediate would spike VMEM by ~17 MB)
            step_n = min(vp, 13 * 128)
            for c0 in range(0, vp, step_n):
                c1 = min(c0 + step_n, vp)
                wb = lmw_ref[:, c0:c1].astype(jnp.bfloat16)
                acc = jnp.dot(yb, wb, preferred_element_type=jnp.float32)
                logits_ref[:, c0:c1] = (
                    acc * lms_ref[0, c0:c1] + lmb_ref[0, c0:c1])
            if sampler is not None:
                _sample(logits_ref[:], prev_ref, u_ref, tok_ref, sampler)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "eps", "interpret", "vmem_mb", "sampler"),
)
def fused_decode_trunk(
    blocks: dict,
    cache_k: jax.Array,
    cache_v: jax.Array,
    bias_row: jax.Array,
    x: jax.Array,
    head: dict | None = None,
    prev_u: tuple | None = None,
    sampler: tuple | None = None,
    n_head: int = 16,
    eps: float = 1e-5,
    interpret: bool = False,
    vmem_mb: int = 100,
) -> Tuple[jax.Array, ...]:
    """Run the full decode trunk. blocks: the int8 stacked layer tree
    (cast_matmul_weights(int8=True)["blocks"]); cache_k/v (L, B, C, H*Dh)
    bf16; bias_row (B, C) additive 0/NEG_INF f32; x (B, D) f32 embedded
    input. Returns (hidden (B, D) f32, k_rows (L, B, H*Dh), v_rows) with
    the rows in the cache dtype — the caller writes them into slot n with
    one dynamic_update_slice (as decode_step does).

    head: optional lm-head pack {ln_f_w, ln_f_b, lm_ln_w, lm_ln_b
    ((1, D) f32 rows), lm_wq ((D, Vp) int8), lm_sc, lm_b ((1, Vp) f32,
    bias padded with -1e30 so padded columns never win sampling)}. When
    given, the kernel also runs the double-norm head + lm matvec at the
    final grid step and a fourth output (B, Vp) f32 logits is appended.

    prev_u + sampler: with head, additionally run the full sampler in
    the kernel. prev_u = ((B, 1) int32 previous tokens, (B, 1) f32
    per-row uniform draws); sampler = (temperature, top_k, top_p_drop,
    repetition_penalty) static floats/int. A fifth output (B, 1) int32
    sampled tokens is appended."""
    l, bsz, c, hd = cache_k.shape
    d = x.shape[-1]
    f = blocks["fc_w"][0].shape[-1]
    d_head = d // n_head

    def fixed(shape):
        return pl.BlockSpec(shape, lambda li, bi: tuple(0 for _ in shape))

    def per_layer(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape,
            lambda li, bi: (li,) + tuple(0 for _ in range(nd)))

    def per_layer_full_b(*shape):
        # one layer, ALL rows: (1, B, ...) blocks indexed only by l. The
        # B dim sits second-to-last for the (L, B, HD) row outputs, where
        # a per-row block of 1 would break Mosaic's (8, 128) trailing-dim
        # tiling rule; a full-B block always satisfies "equal to the
        # array dim" and stays resident across the B fastest-iterating
        # grid steps (flushed when l advances).
        nd = len(shape)
        return pl.BlockSpec(
            (1, bsz) + shape,
            lambda li, bi: (li, 0) + tuple(0 for _ in range(nd)))

    def per_lb(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda li, bi: (li, bi) + tuple(0 for _ in range(nd)))

    # big weights: one layer per block, streamed/double-buffered by the
    # pipeline (index maps depend only on l — with rows iterating fastest
    # each layer's weights are fetched once for all B rows). Small
    # vectors (LN params, scales, biases): whole (L, ...) arrays resident
    # in VMEM (~2 MB total), indexed by grid step. Per-batch vectors are
    # full-array blocks (see per_layer_full_b); only the (l, row) KV
    # slice streams per step, so VMEM and compile time do not grow
    # meaningfully with B.
    in_specs = [
        fixed((bsz, d)),                 # x
        fixed((bsz, c)),                 # bias
        fixed((l, d)), fixed((l, d)),    # ln1 w/b
        per_layer(d, 3 * d), fixed((l, 1, 3 * d)), fixed((l, 3 * d)),
        per_layer(d, d), fixed((l, 1, d)), fixed((l, d)),
        fixed((l, d)), fixed((l, d)),    # ln2 w/b
        per_layer(d, f), fixed((l, 1, f)), fixed((l, f)),
        per_layer(f, d), fixed((l, 1, d)), fixed((l, d)),
        per_lb(c, hd),                   # k cache slice
        per_lb(c, hd),                   # v cache slice
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

    out_specs = [
        fixed((bsz, d)),
        per_layer_full_b(hd),
        per_layer_full_b(hd),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, d), jnp.float32),
        jax.ShapeDtypeStruct((l, bsz, hd), cache_k.dtype),
        jax.ShapeDtypeStruct((l, bsz, hd), cache_v.dtype),
    ]
    if head is not None:
        vp = head["lm_wq"].shape[-1]
        in_specs += [fixed((1, d))] * 4 + [
            fixed((d, vp)),              # lm weight: fetched ONCE per call
            fixed((1, vp)), fixed((1, vp)),
        ]
        args += [head["ln_f_w"], head["ln_f_b"],
                 head["lm_ln_w"], head["lm_ln_b"],
                 head["lm_wq"], head["lm_sc"], head["lm_b"]]
        if sampler is not None:
            in_specs += [fixed((bsz, 1)), fixed((bsz, 1))]
            args += [prev_u[0], prev_u[1]]
        out_specs.append(fixed((bsz, vp)))
        out_shape.append(jax.ShapeDtypeStruct((bsz, vp), jnp.float32))
        if sampler is not None:
            out_specs.append(fixed((bsz, 1)))
            out_shape.append(jax.ShapeDtypeStruct((bsz, 1), jnp.int32))

    if sampler is not None and sampler[1] > 128:
        raise ValueError(
            f"fused sampler supports top_k <= 128 (its in-kernel top-k "
            f"domain is 128 lanes); got top_k={sampler[1]} — use the XLA "
            f"sampler plane instead")
    kernel = functools.partial(
        _kernel, n_layer=l, n_head=n_head, d_head=d_head, eps=eps,
        with_head=head is not None, sampler=sampler)

    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 2**20,
        )
    return pl.pallas_call(
        kernel,
        grid=(l, bsz),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((bsz, d), jnp.float32),
                        pltpu.VMEM((bsz, hd), jnp.float32),
                        pltpu.VMEM((bsz, hd), jnp.float32)],
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(*args)
