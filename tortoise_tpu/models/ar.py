"""Autoregressive GPT-2-style speech-token decoder, TPU-native.

Functionally equivalent to the reference's `autoregressive_graph`
(main.cpp:2545-3040) and `autoregressive_latent_graph` (main.cpp:2053-2519),
re-designed for XLA: the 30 layers are stacked into single arrays and run
under `lax.scan`; decode uses a static-shape KV cache updated with
`dynamic_update_slice` inside one jitted step (the reference rebuilds and
re-allocates a fresh ggml graph per token, main.cpp:5227-5247); text length
is padded to static buckets with attention masking so XLA compiles once per
bucket.

Architecture facts mirrored from the reference:

- sequence layout: [voice latent (1 slot) | text embeddings (T) | mel
  embeddings], with text emb = wte[token] + wpe_text[pos] and mel emb =
  wme[mel_token] + wpe_mel[pos] (main.cpp:2589-2654).
- decode mel position ids are `step + 2` — position 1 is never used
  (fixed_embedding_ids set to i+2, main.cpp:5237-5245); the start mel token
  8192 uses position 0 (main.cpp:5155-5160).
- pre-LN GPT-2 block: LN(eps 1e-5) -> fused qkv (1024->3072 affine;
  "conv1d in pytorch but actually affine", main.cpp:2767) -> 16 heads x 64
  -> causal softmax(QK/8) -> proj -> residual -> LN -> MLP 1024->4096
  gelu(tanh) -> 1024 -> residual (main.cpp:2718-2983).
- the reference round-trips the qkv activations through f16
  (main.cpp:2789-2790); pass qkv_f16=True to reproduce that rounding
  (opt-in: it injects ~5e-4 relative noise and is inside the reference's
  own 1e-2 golden tolerance either way).
- head: LN -> ln_f affine -> *second bare LN* -> lm_head.0 affine ->
  lm_head.1 linear -> 8194 logits (main.cpp:2985-3013; the double-norm is a
  real property of the exported model, don't "fix" it).
- latent extraction: same trunk, final chain LN -> ln_f affine -> bare LN
  -> lm_head.0 affine, then the 1024-d states at the 500 positions starting
  at the start-mel slot (offset 1+T; main.cpp:2486-2515).
- KV cache: the reference allocates 404 slots/layer (main.cpp:794-797) which
  silently overflows across layer regions for generations longer than
  404-T-2 tokens; we size the cache correctly (cfg.cache_len) instead.

Weight orientation: loaders deliver numpy arrays with ggml ne reversed, so
`attn.c_attn.weight` arrives (1024, 3072) = x @ W, and `lm_head.1.weight`
arrives (8194, 1024) = x @ W.T (torch Linear), matching
io/checkpoint.py's conversion.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tortoise_tpu.config import ARConfig
from tortoise_tpu.ops.basic import gelu, layer_norm, pdot

NEG_INF = -1e30


class KVCache(NamedTuple):
    # (L, B, C, H*Dh): slots on the sublane axis, heads*Dh packed on the
    # minor axis — a Dh=64 minor dim would be padded to the 128-lane tile
    # in HBM (2x the bytes of the actual cache); H*Dh=1024 tiles exactly.
    k: jax.Array  # (L, B, C, H*Dh)
    v: jax.Array  # (L, B, C, H*Dh)
    valid: jax.Array  # (B, C) bool — which slots hold real keys
    length: jax.Array  # () int32 — next write offset


def _qkv(block, x, cfg: ARConfig, compute_dtype, qkv_f16=False):
    """Fused qkv projection -> (q, k, v) each (B, H, S, Dh)."""
    b, s, d = x.shape
    h, dh = cfg.n_head, cfg.d_head
    qkv = pdot(x, block["attn_w"], compute_dtype) + block["attn_b"]
    if qkv_f16:
        # opt-in reproduction of the reference's f16 round-trip of the qkv
        # activations (main.cpp:2789-2790); adds ~5e-4 relative rounding
        qkv = qkv.astype(jnp.float16).astype(jnp.float32)
    qkv = qkv.reshape(b, s, 3, h, dh).transpose(2, 0, 3, 1, 4)
    return qkv[0], qkv[1], qkv[2]


def _attn_out(block, ctx, x_res, cfg: ARConfig, compute_dtype):
    """Merge heads, project, add residual, then MLP block."""
    b, h, s, dh = ctx.shape
    merged = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    return _attn_out_merged(block, merged, x_res, cfg, compute_dtype)


def _attn_out_merged(block, merged, x_res, cfg: ARConfig, compute_dtype):
    """Project pre-merged (B, S, H*Dh) context, residual, MLP block.

    The carry stays in x_res's dtype: prefill/latent_forward cast the
    embeddings to the compute dtype on the bf16/int8 planes, halving the
    full-sequence passes' elementwise traffic (the same design the
    denoiser trunk uses; ~30 layers x ~10 passes over a 35 MB f32 carry
    at B=16 cost ~25 ms of the latent wall). The f32 parity plane is
    untouched (compute_dtype=None keeps everything f32)."""
    od = x_res.dtype if compute_dtype is not None else None
    attn = pdot(merged, block["proj_w"], compute_dtype, out_dtype=od)
    x = x_res + (attn + block["proj_b"].astype(attn.dtype))
    y = layer_norm(x, block["ln2_w"], block["ln2_b"], cfg.ln_eps)
    y = pdot(y, block["fc_w"], compute_dtype, out_dtype=od)
    y = gelu(y + block["fc_b"].astype(y.dtype))
    y = pdot(y, block["fc_proj_w"], compute_dtype, out_dtype=od)
    return x + (y + block["fc_proj_b"].astype(y.dtype))


def flash_prefill_on(cfg: ARConfig, compute_dtype, qkv_f16: bool,
                     shape, have_valid: bool = True) -> bool:
    """True when the full-sequence passes take the packed causal flash
    kernel: bf16/int8 planes only (f32 parity and the qkv_f16
    reproduction plane keep the exact XLA softmax), the head layout
    must satisfy the kernel's lane rule on real TPU, and the (B, S)
    score block must be big enough to beat XLA's fused materialized
    form (cfg.flash_prefill_min_score; measured crossover between B=4
    and B=8 at the latent pass's S~535 — see config.py)."""
    if not (cfg.flash_prefill and not qkv_f16
            and compute_dtype == jnp.bfloat16 and have_valid):
        return False
    b, s = shape
    if b * s * s < cfg.flash_prefill_min_score:
        return False
    if cfg.n_head % 2:
        return False
    if jax.default_backend() == "tpu" and (2 * cfg.d_head) % 128:
        return False
    return True


def _block_full(block, x, bias, cfg: ARConfig, compute_dtype, qkv_f16=False,
                seq_valid=None, use_flash=False):
    """One GPT-2 block over a full sequence. bias: (B|1, 1, S, S) additive;
    seq_valid: (B, S) bool (only consumed by the flash path, which applies
    causal+validity masking in-kernel instead of streaming the bias).

    Returns (hidden, (k, v)) with k/v in the PACKED (B, S, H*Dh) cache
    layout on the flash path (sliced straight off the fused qkv — no 5D
    transposes anywhere) and (B, H, S, Dh) on the XLA path."""
    y = layer_norm(x, block["ln1_w"], block["ln1_b"], cfg.ln_eps)
    if use_flash:
        # bf16/int8 planes: one exact-softmax row-block kernel straight
        # off the fused qkv (ops/pallas/flash_attention.py) instead of
        # materializing (B, H, S, S) f32 scores
        from tortoise_tpu.ops.pallas.flash_attention import (
            flash_attention_causal_qkv,
        )

        hd = cfg.n_head * cfg.d_head
        qkv = pdot(y, block["attn_w"], compute_dtype,
                   out_dtype=compute_dtype)
        qkv = qkv + block["attn_b"].astype(qkv.dtype)
        merged = flash_attention_causal_qkv(
            qkv, cfg.n_head, seq_valid,
            interpret=jax.default_backend() != "tpu")
        kv = (qkv[:, :, hd : 2 * hd], qkv[:, :, 2 * hd :])
        return _attn_out_merged(block, merged, x, cfg, compute_dtype), kv
    q, k, v = _qkv(block, y, cfg, compute_dtype, qkv_f16)
    scores = pdot(q, k.swapaxes(-1, -2), compute_dtype) / jnp.sqrt(
        jnp.float32(cfg.d_head)
    )
    probs = jax.nn.softmax((scores + bias).astype(jnp.float32), axis=-1)
    ctx = pdot(probs.astype(q.dtype), v, compute_dtype)
    return _attn_out(block, ctx, x, cfg, compute_dtype), (k, v)


def transformer(params, x, bias, cfg: ARConfig, compute_dtype=None,
                qkv_f16: bool = False, seq_valid=None,
                ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array], bool]:
    """Run the 30-layer trunk over a full sequence via lax.scan.

    Returns (hidden states, per-layer (k, v) stacked, kv_packed) — the k/v
    stacks are (L, B, S, H*Dh) packed when the flash path ran (see
    _block_full), else (L, B, H, S, Dh); ``kv_packed`` reports which, so
    callers never re-derive the layout decision from their own copy of the
    inputs."""
    use_flash = flash_prefill_on(cfg, compute_dtype, qkv_f16,
                                 x.shape[:2], seq_valid is not None)

    def step(x, block):
        x, kv = _block_full(block, x, bias, cfg, compute_dtype, qkv_f16,
                            seq_valid, use_flash)
        return x, kv

    x, kvs = jax.lax.scan(step, x, params["blocks"])
    return x, kvs, use_flash


def _head(params, h, cfg: ARConfig, compute_dtype=None):
    """Final norm chain + lm head -> logits."""
    h = layer_norm(h, params["ln_f_w"], params["ln_f_b"], cfg.ln_eps)
    h = layer_norm(h, None, None, cfg.ln_eps)  # bare second norm (2996)
    h = h * params["lm_ln_w"] + params["lm_ln_b"]
    lm_w = params["lm_w"]
    if isinstance(lm_w, tuple):  # int8 pair, pre-transposed at cast time
        return pdot(h, lm_w, compute_dtype) + params["lm_b"]
    return pdot(h, lm_w.T, compute_dtype) + params["lm_b"]


def _latent_head(params, h, cfg: ARConfig):
    h = layer_norm(h, params["ln_f_w"], params["ln_f_b"], cfg.ln_eps)
    h = layer_norm(h, None, None, cfg.ln_eps)
    return h * params["lm_ln_w"] + params["lm_ln_b"]


def _embed_text(params, text_ids, text_pos):
    return (
        jnp.take(params["text_emb"], text_ids, axis=0)
        + jnp.take(params["text_pos"], text_pos, axis=0)
    )


def _embed_mel(params, mel_ids, mel_pos):
    return (
        jnp.take(params["mel_emb"], mel_ids, axis=0)
        + jnp.take(params["mel_pos"], mel_pos, axis=0)
    )


def _causal_bias(valid: jax.Array) -> jax.Array:
    """(B, S) validity -> (B, 1, S, S) additive causal+padding bias."""
    s = valid.shape[-1]
    i = jnp.arange(s)
    causal = i[:, None] >= i[None, :]
    ok = causal[None, :, :] & valid[:, None, :]
    return jnp.where(ok, 0.0, NEG_INF)[:, None, :, :]


def prefill(params, cfg: ARConfig, text_ids: jax.Array,
            text_valid: jax.Array, voice: jax.Array,
            compute_dtype=None, qkv_f16: bool = False,
            ) -> Tuple[jax.Array, KVCache]:
    """Prefill over [latent | text | start-mel]; returns next-token logits
    (B, V) and the primed KV cache.

    text_ids/text_valid: (B, Tpad) int32/bool (pad anywhere invalid);
    voice: (1024,) or (B, 1024).
    """
    b, t = text_ids.shape
    voice = jnp.broadcast_to(voice.astype(jnp.float32), (b, cfg.d_model))
    pos = jnp.cumsum(text_valid, axis=-1) - 1  # 0..T-1 over valid slots
    pos = jnp.where(text_valid, pos, 0)
    text = _embed_text(params, text_ids, pos)
    start = _embed_mel(
        params,
        jnp.full((b, 1), cfg.start_mel_token, jnp.int32),
        jnp.zeros((b, 1), jnp.int32),
    )
    x = jnp.concatenate([voice[:, None, :], text, start], axis=1)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)  # bf16 carry (see _attn_out_merged)
    seq_valid = jnp.concatenate(
        [jnp.ones((b, 1), bool), text_valid, jnp.ones((b, 1), bool)], axis=1
    )
    bias = _causal_bias(seq_valid)
    h, (ks, vs), kv_packed = transformer(params, x, bias, cfg,
                                         compute_dtype, qkv_f16,
                                         seq_valid=seq_valid)
    logits = _head(params, h[:, -1:, :], cfg, compute_dtype)[:, 0, :]

    s = x.shape[1]
    cache_dtype = compute_dtype or jnp.float32
    l_, b_ = ks.shape[0], ks.shape[1]
    if not kv_packed:
        # (L, B, H, S, Dh) -> (L, B, S, H*Dh) packed cache layout (the
        # flash path already emits packed rows sliced off the fused qkv)
        ks = ks.transpose(0, 1, 3, 2, 4).reshape(l_, b_, s, -1)
        vs = vs.transpose(0, 1, 3, 2, 4).reshape(l_, b_, s, -1)
    pad = [(0, 0)] * 2 + [(0, cfg.cache_len - s), (0, 0)]
    k = jnp.pad(ks.astype(cache_dtype), pad)
    v = jnp.pad(vs.astype(cache_dtype), pad)
    valid = jnp.pad(seq_valid, [(0, 0), (0, cfg.cache_len - s)])
    return logits, KVCache(k, v, valid, jnp.int32(s))


def decode_step(params, cfg: ARConfig, cache: KVCache, tokens: jax.Array,
                step: jax.Array, compute_dtype=None, qkv_f16: bool = False,
                ) -> Tuple[jax.Array, KVCache]:
    """One decode step: tokens (B,) sampled ids for this step; `step` is the
    0-based decode index (mel position id is step+2, main.cpp:5237-5245).
    Returns (logits (B, V), updated cache). Fully static shapes — jit once.

    Activations stay FLAT (B, D) / (B, H, Dh) throughout: carrying the
    singleton sequence dim through 5D transposes costs ~9 ms/step in
    Mosaic relayouts on v5e (measured: flat formulation 2.9 ms/step vs
    5D formulation 11.9, scripts/ubench_decode_bisect.py) while the
    weight-streaming floor is ~1.6 ms/step.

    On the int8 + bfloat16 production plane the whole trunk dispatches to
    the fused Pallas kernel (ops/pallas/decode_trunk.py) — the XLA scan's
    ~15 small fusions per layer cost ~0.3 ms/step of op overhead alone.
    """
    if (cfg.fused_decode and not qkv_f16
            and compute_dtype == jnp.bfloat16
            and isinstance(params["blocks"].get("attn_w"), tuple)
            and _fits_fused(tokens.shape[0])):
        # grid (L, B): rows iterate fastest and share each layer's int8
        # weight stream; per-row attention uses a block-diagonal head
        # layout (2 dots/row). Measured 1.08 vs 1.59 ms/step against the
        # XLA scan at production shapes (B=1, int8, cache 640).
        return _decode_step_fused(params, cfg, cache, tokens, step,
                                  compute_dtype)
    b = tokens.shape[0]
    h_, dh = cfg.n_head, cfg.d_head
    x = jnp.take(params["mel_emb"], tokens, axis=0) \
        + jnp.take(params["mel_pos"], step + 2, axis=0)  # (B, D)
    n = cache.length
    bias = jnp.where(cache.valid, 0.0, NEG_INF)[:, None, None, :]

    # Layer scan with a READ-ONLY cache: the current token attends over the
    # cached keys plus its own fresh k/v handled as an appended score
    # column, the per-layer new k/v rows come out as scan ys, and ONE
    # dynamic_update_slice writes the whole step's (L, B, H, 1, Dh) slab
    # afterwards. This keeps the compiled module small (the remote TPU
    # compiler choked on a 30x-unrolled body) while avoiding the
    # full-cache re-materialization that made scan-carried caches slow.
    # slot n holds stale/zero data; it stays masked — the appended fresh
    # column below stands in for the current token
    scale = jnp.sqrt(jnp.float32(cfg.d_head))
    # parity path (compute_dtype=None): the TPU default "f32" einsum is a
    # single bf16 pass (~4e-3 relative); match pdot's exact-f32 contract
    prec = None if compute_dtype is not None else jax.lax.Precision.HIGHEST

    def layer(h, xs):
        block, k_l, v_l = xs                               # (B, C, H*Dh)
        y = layer_norm(h, block["ln1_w"], block["ln1_b"], cfg.ln_eps)
        qkv = pdot(y, block["attn_w"], compute_dtype) + block["attn_b"]
        if qkv_f16:
            qkv = qkv.astype(jnp.float16).astype(jnp.float32)
        qkv = qkv.reshape(b, 3, h_, dh)
        q, k_new, v_new = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (B, H, Dh)
        k4 = k_l.reshape(b, -1, h_, dh)                    # (B, C, H, Dh)
        v4 = v_l.reshape(b, -1, h_, dh)
        qc = q.astype(compute_dtype) if compute_dtype else q
        scores = (jnp.einsum("bhd,bchd->bhc", qc,
                             k4.astype(qc.dtype),
                             preferred_element_type=jnp.float32,
                             precision=prec)
                  / scale)                                 # (B, H, C)
        scores = scores + bias[:, :, 0]                    # bias (B,1,1,C)
        self_score = (jnp.sum(
            q.astype(jnp.float32) * k_new.astype(jnp.float32), axis=-1)
            / scale)[:, :, None]                           # (B, H, 1)
        # softmax over [cache scores | fresh-token score] WITHOUT
        # concatenating to a (C+1)-lane array (mis-tiled on TPU): fold the
        # scalar self term into the max/denominator explicitly
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True),
                        self_score)                        # (B, H, 1)
        e_cache = jnp.exp(scores - m)                      # (B, H, C)
        e_self = jnp.exp(self_score - m)                   # (B, H, 1)
        denom = jnp.sum(e_cache, axis=-1, keepdims=True) + e_self
        ctx = (jnp.einsum("bhc,bchd->bhd", e_cache.astype(qc.dtype),
                          v4.astype(qc.dtype),
                          preferred_element_type=jnp.float32,
                          precision=prec)
               + e_self * v_new.astype(jnp.float32)) / denom
        merged = ctx.reshape(b, h_ * dh)
        attn = pdot(merged, block["proj_w"], compute_dtype) \
            + block["proj_b"]
        h = h + attn
        y = layer_norm(h, block["ln2_w"], block["ln2_b"], cfg.ln_eps)
        y = gelu(pdot(y, block["fc_w"], compute_dtype) + block["fc_b"])
        y = pdot(y, block["fc_proj_w"], compute_dtype) + block["fc_proj_b"]
        return h + y, (k_new, v_new)

    h, (k_rows, v_rows) = jax.lax.scan(
        layer, x, (params["blocks"], cache.k, cache.v))
    l_ = k_rows.shape[0]
    k = jax.lax.dynamic_update_slice(
        cache.k, k_rows.reshape(l_, b, 1, h_ * dh).astype(cache.k.dtype),
        (0, 0, n, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, v_rows.reshape(l_, b, 1, h_ * dh).astype(cache.v.dtype),
        (0, 0, n, 0))
    logits = _head(params, h, cfg, compute_dtype)
    valid = cache.valid.at[:, n].set(True)
    return logits, KVCache(k, v, valid, n + 1)


def _decode_step_fused(params, cfg: ARConfig, cache: KVCache,
                       tokens: jax.Array, step: jax.Array,
                       compute_dtype) -> Tuple[jax.Array, KVCache]:
    """decode_step via the fused Pallas trunk (int8 weights, bf16 cache).
    Identical semantics; the kernel carries the activation in VMEM and
    streams each layer's int8 weights + KV slice once."""
    from tortoise_tpu.ops.pallas.decode_trunk import fused_decode_trunk

    x = jnp.take(params["mel_emb"], tokens, axis=0) \
        + jnp.take(params["mel_pos"], step + 2, axis=0)  # (B, D)
    n = cache.length
    bias_row = jnp.where(cache.valid, 0.0, NEG_INF).astype(jnp.float32)
    head = params.get("head_pack")
    out = fused_decode_trunk(
        params["blocks"], cache.k, cache.v, bias_row,
        x.astype(jnp.float32), head=head, n_head=cfg.n_head,
        eps=cfg.ln_eps, interpret=jax.default_backend() != "tpu")
    if head is not None:
        # lm head fused into the kernel's final grid step (the separate
        # double-LN + matvec dispatch cost ~0.28 ms/step of small-fusion
        # overhead); slice off the lane padding
        _, k_rows, v_rows, logits_pad = out
        logits = logits_pad[:, :params["lm_b"].shape[0]]
    else:
        hidden, k_rows, v_rows = out
        logits = _head(params, hidden, cfg, compute_dtype)
    k = jax.lax.dynamic_update_slice(
        cache.k, k_rows[:, :, None, :].astype(cache.k.dtype), (0, 0, n, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, v_rows[:, :, None, :].astype(cache.v.dtype), (0, 0, n, 0))
    valid = cache.valid.at[:, n].set(True)
    return logits, KVCache(k, v, valid, n + 1)


DEFAULT_SAMPLER = (0.8, 50, 0.2, 2.0)  # temp, top_k, p_drop, penalty
# (the reference's sampling defaults, main.cpp:4791-4793)


FUSED_MAX_BATCH = 16  # grid is (L, B) with single-row KV/output blocks,
# so VMEM and compile time are B-independent; the cap only bounds the
# B*L program count (and keeps very large serving batches on the XLA
# plane, which shards under meshes)


def _fits_fused(batch: int) -> bool:
    return batch <= FUSED_MAX_BATCH


FUSED_MAX_TOPK = 128  # the in-kernel sampler's top-k domain is one
# 128-lane pass (decode_trunk._sample); larger top_k takes the XLA chain


def can_fuse_sampling(params, cfg: ARConfig, compute_dtype, batch: int,
                      sampler: tuple = None) -> bool:
    """True when decode_sample_step's fused decode+sample kernel plane is
    available: B<=16, bf16 compute, int8 weights with the padded head
    pack, and a sampler the kernel supports (top_k <= 128). B rows share
    the int8 weight stream — batched decode costs little more per step
    than B=1."""
    if sampler is None:
        sampler = DEFAULT_SAMPLER
    return (cfg.fused_decode and _fits_fused(batch)
            and sampler[1] <= FUSED_MAX_TOPK
            and compute_dtype == jnp.bfloat16
            and isinstance(params["blocks"].get("attn_w"), tuple)
            and params.get("head_pack") is not None)


def decode_sample_step(params, cfg: ARConfig, cache: KVCache,
                       tokens: jax.Array, step: jax.Array, u: jax.Array,
                       compute_dtype=None,
                       sampler: tuple = DEFAULT_SAMPLER,
                       ) -> Tuple[jax.Array, KVCache]:
    """decode_step + the full sampler in ONE kernel dispatch (B<=16 int8
    plane): the trunk, lm head, repetition penalty, top-k, nucleus rule,
    and the per-row inverse-CDF draw against the pre-drawn uniforms `u`
    ((B, 1) f32) all run inside ops/pallas/decode_trunk.py. Outside the
    kernel the head + sampler chains cost ~0.34 ms/step of small-fusion
    overhead (r3 probe) against a 0.61 ms kernel. Returns
    (sampled tokens (B,), updated cache)."""
    from tortoise_tpu.ops.pallas.decode_trunk import fused_decode_trunk

    b = tokens.shape[0]
    x = jnp.take(params["mel_emb"], tokens, axis=0) \
        + jnp.take(params["mel_pos"], step + 2, axis=0)  # (B, D)
    n = cache.length
    bias_row = jnp.where(cache.valid, 0.0, NEG_INF).astype(jnp.float32)
    _, k_rows, v_rows, _, tok = fused_decode_trunk(
        params["blocks"], cache.k, cache.v, bias_row,
        x.astype(jnp.float32), head=params["head_pack"],
        prev_u=(tokens.reshape(b, 1), u.reshape(b, 1)), sampler=sampler,
        n_head=cfg.n_head, eps=cfg.ln_eps,
        interpret=jax.default_backend() != "tpu")
    k = jax.lax.dynamic_update_slice(
        cache.k, k_rows[:, :, None, :].astype(cache.k.dtype), (0, 0, n, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, v_rows[:, :, None, :].astype(cache.v.dtype), (0, 0, n, 0))
    valid = cache.valid.at[:, n].set(True)
    return tok[:, 0], KVCache(k, v, valid, n + 1)


def latent_forward(params, cfg: ARConfig, text_ids: jax.Array,
                   text_valid: jax.Array, mel_ids: jax.Array,
                   voice: jax.Array, compute_dtype=None,
                   qkv_f16: bool = False) -> jax.Array:
    """Full-sequence pass over [latent | text | 502 mel codes]; returns the
    (B, 500, 1024) speech-conditioning latents (main.cpp:2053-2519).

    Mel position ids are 0..501 (the reference driver intends this,
    main.cpp:5325-5336, though its hardcoded /4 only fills them correctly
    for batch 4; we use the correct ids for every batch size).
    """
    b, t = text_ids.shape
    m = mel_ids.shape[1]
    voice = jnp.broadcast_to(voice.astype(jnp.float32), (b, cfg.d_model))
    pos = jnp.cumsum(text_valid, axis=-1) - 1
    pos = jnp.where(text_valid, pos, 0)
    text = _embed_text(params, text_ids, pos)
    mel_pos = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m))
    mel = _embed_mel(params, mel_ids, mel_pos)
    x = jnp.concatenate([voice[:, None, :], text, mel], axis=1)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)  # bf16 carry (see _attn_out_merged)
    seq_valid = jnp.concatenate(
        [jnp.ones((b, 1), bool), text_valid, jnp.ones((b, m), bool)], axis=1
    )
    bias = _causal_bias(seq_valid)
    h, _, _ = transformer(params, x, bias, cfg, compute_dtype, qkv_f16,
                          seq_valid=seq_valid)
    h = _latent_head(params, h, cfg)
    # latents live at the 500 positions starting at the start-mel slot
    return jax.lax.dynamic_slice_in_dim(h, 1 + t, m - 2, axis=1)
