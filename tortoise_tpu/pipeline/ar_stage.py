"""Stage 1 driver: sample speech tokens, then extract conditioning latents.

Replaces the reference's `autoregressive()` (main.cpp:5042-5367). Where the
reference rebuilds and re-allocates a ggml graph for every generated token,
this driver jits `ar.prefill` / `ar.decode_step` once per (batch, text
bucket) and either:

- runs the whole sample loop on-device inside `lax.while_loop`
  (sampler="jax": production path, jax.random keys), or
- steps from the host with the mt19937 parity sampler
  (sampler="reference": reproduces the reference's seeded decision stream).

Sequence post-processing mirrors the reference exactly:

- apply_padding (main.cpp:4510-4532): strip trailing 8139s, pad with calm
  token 83 to 500, overwrite the last 3 with 45,45,248, append stop 8193,
  prepend start 8192 -> 502 ids.
- trim_latents (main.cpp:4870-4915): drop the start/stop ids, keep latents
  until >8 consecutive calm tokens have been seen.
- the first sampling step penalizes the ids of the prefill filler vector
  ([1,...,1,8192], main.cpp:5100-5106, 5204); later steps penalize only the
  immediately previous sampled token per sequence.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tortoise_tpu.config import ARConfig
from tortoise_tpu.models import ar
from tortoise_tpu.ops import sampling as S

_MATMUL_WEIGHTS = ("attn_w", "proj_w", "fc_w", "fc_proj_w")

from tortoise_tpu.pipeline.common import device_barrier as _barrier


def cast_matmul_weights(params, dtype, int8: bool = False):
    """Device-resident AR param tree: the big matmul weights stored in the
    compute dtype (decode is weight-bandwidth bound), everything else f32.

    int8=True instead stores them as symmetric per-layer-per-column int8
    pairs (ops.basic.quantize_cols) — half the bf16 streaming bytes, the
    decode bound; ~3e-3 relative logit error, opt-in (--int8-weights).

    ALL leaves are moved to the default device. Leaving leaves as numpy
    means every jitted entry point re-uploads them per call — measured
    ~0.6 s per call through the remote-TPU tunnel just for the embedding
    tables, which dwarfed the ~2 ms/step on-device decode loop.

    Results are memoized per (tree identity, dtype, int8) — requantizing
    the ~350 MB weight stack eagerly on every synthesize() call costs
    real wall time."""
    from tortoise_tpu.pipeline.common import cached_cast

    return cached_cast(params, ("armw", str(dtype), int8),
                       lambda p: _cast_matmul_weights(p, dtype, int8))


from tortoise_tpu.ops.basic import quantize_cols_host as _quantize_cols_host


def _build_head_pack(params, lm_pair):
    """Lane-padded lm-head tensors for the fused decode kernel
    (ops/pallas/decode_trunk.py): the (D, V) int8 weight/scale padded to
    a 128-multiple Vp with zero columns, the bias padded with -1e30 so
    padded logits can never win top-k, and the norm params as (1, D)
    rows. The unpadded lm_w/lm_b stay in the tree for the XLA head used
    by prefill and the non-fused planes."""
    wq, sc = lm_pair
    d, v = wq.shape
    vp = ((v + 127) // 128) * 128
    host = isinstance(wq, np.ndarray)
    xp = np if host else jnp

    def padn(a, val=0.0):
        return xp.pad(a, ((0, 0), (0, vp - v)), constant_values=val) \
            if vp != v else a

    def row(name):
        a = params[name]
        a = np.asarray(a, np.float32) if isinstance(a, np.ndarray) \
            else jnp.asarray(a, jnp.float32)
        return a.reshape(1, d)

    b = params["lm_b"]
    b = (np.asarray(b, np.float32) if isinstance(b, np.ndarray)
         else jnp.asarray(b, jnp.float32)).reshape(1, v)
    bxp = np if isinstance(b, np.ndarray) else jnp
    return {
        "ln_f_w": row("ln_f_w"), "ln_f_b": row("ln_f_b"),
        "lm_ln_w": row("lm_ln_w"), "lm_ln_b": row("lm_ln_b"),
        "lm_wq": padn(wq),
        "lm_sc": padn(sc.reshape(1, v)),
        "lm_b": bxp.pad(b, ((0, 0), (0, vp - v)), constant_values=-1e30)
        if vp != v else b,
    }


def quantize_ar_host(params) -> dict:
    """int8-quantize the AR tree's matmul weights (host-side numpy; same
    math as the jnp plane) and attach the fused-kernel head pack.
    Idempotent: already-quantized leaves (pairs, e.g. a tree loaded from
    io.plane_cache) pass through normalized to tuples — so a quantized
    tree saved by one process feeds the same pipeline entry points in
    the next with zero re-quantization."""
    from tortoise_tpu.ops.basic import quantize_cols

    def q(w):
        if isinstance(w, (tuple, list)):
            return tuple(w)
        if isinstance(w, np.ndarray):
            return _quantize_cols_host(w)
        return quantize_cols(jnp.asarray(w))

    blocks = dict(params["blocks"])
    for k in _MATMUL_WEIGHTS:
        blocks[k] = q(blocks[k])
    out = dict(params, blocks=blocks)
    lm = params["lm_w"]
    if isinstance(lm, (tuple, list)):
        out["lm_w"] = tuple(lm)
    elif isinstance(lm, np.ndarray):
        out["lm_w"] = _quantize_cols_host(lm.T)
    else:
        out["lm_w"] = quantize_cols(jnp.asarray(lm).T)
    hp = params.get("head_pack")
    out["head_pack"] = dict(hp) if hp is not None \
        else _build_head_pack(params, out["lm_w"])
    return out


def _cast_matmul_weights(params, dtype, int8: bool = False):
    from tortoise_tpu.pipeline.common import ensure_device

    if int8:
        return ensure_device(quantize_ar_host(params))
    if isinstance(params["blocks"].get("attn_w"), (tuple, list)):
        raise ValueError(
            "AR tree is int8-quantized (plane-cache load?); the bf16/f32 "
            "planes need the original float tree")
    if dtype is None:
        return ensure_device(params)
    blocks = dict(params["blocks"])
    for k in _MATMUL_WEIGHTS:
        blocks[k] = jnp.asarray(blocks[k], dtype)
    out = dict(params, blocks=blocks)
    out["lm_w"] = jnp.asarray(params["lm_w"], dtype)
    return ensure_device(out)

TEXT_BUCKETS = (32, 64, 128, 192, 256, 320, 404)


def _check_token_range(tokens_list, cfg: ARConfig) -> None:
    """Reject out-of-vocab text ids at the stage boundary. jnp.take's
    default out-of-bounds gather mode FILLS with NaN for floats, so an
    oversized id (e.g. production id 255 fed to a tiny 32-vocab test
    model) silently NaN-poisons the embeddings and every stage after
    them — diagnosed as all-NaN mel two stages later."""
    for seq in tokens_list:
        for tok in seq:
            if not 0 <= tok < cfg.n_text_vocab:
                raise ValueError(
                    f"text token id {tok} outside vocab "
                    f"[0, {cfg.n_text_vocab})")


def pick_bucket(n: int, buckets: Sequence[int] = TEXT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"text too long: {n} > {buckets[-1]}")


def size_cache(cfg: ARConfig, bucket: int) -> ARConfig:
    """Shrink the KV cache to what this text bucket can actually reach:
    1 (voice) + bucket + 1 (start) + max_decode_steps, rounded up to 128.
    Decode attention streams the whole (L, B, H, C, Dh) cache every step,
    so a 1024-slot cache wastes ~40% of that traffic for short prompts.
    The text bucket is already a compile key, so this adds no recompiles."""
    need = bucket + 2 + cfg.max_decode_steps
    fitted = min(cfg.cache_len, (need + 127) // 128 * 128)
    if fitted == cfg.cache_len:
        return cfg
    return dataclasses.replace(cfg, cache_len=fitted)


def apply_padding(seq: List[int], cfg: ARConfig = ARConfig()) -> List[int]:
    """Reference apply_padding (main.cpp:4510-4532), non-mutating."""
    out = list(seq)
    while out and out[-1] == cfg.strip_token:
        out.pop()
    if len(out) > cfg.pad_mel_length:
        raise ValueError(f"sequence too long after strip: {len(out)}")
    out.extend([cfg.calm_token] * (cfg.pad_mel_length - len(out)))
    out[-3:] = list(cfg.tail_tokens)
    out.append(cfg.stop_mel_token)
    out.insert(0, cfg.start_mel_token)
    return out


def trim_keep_lengths(padded_sequences: Sequence[Sequence[int]],
                      cfg: ARConfig = ARConfig()) -> List[int]:
    """Per-sequence latent keep count: positions until more than 8
    consecutive calm tokens have accumulated (main.cpp:4870-4915). Pure
    token-stream math — needs no latent download."""
    out = []
    for seq in padded_sequences:
        codes = list(seq)[1:-1]  # drop start/stop
        calm = 0
        keep = 0
        for c, tok in enumerate(codes):
            calm = calm + 1 if tok == cfg.calm_token else 0
            if calm > 8:
                break
            keep = c + 1
        out.append(keep)
    return out


def trim_latents(latents: np.ndarray, padded_sequences: Sequence[Sequence[int]],
                 cfg: ARConfig = ARConfig()) -> List[np.ndarray]:
    """latents: (B, pad_mel_length, D); padded_sequences: B x 502 ids.
    Returns per-sequence (n_i, D) arrays (main.cpp:4870-4915)."""
    keeps = trim_keep_lengths(padded_sequences, cfg)
    return [np.asarray(latents[b, :keep]) for b, keep in enumerate(keeps)]


# ---------------------------------------------------------------------------
# jitted building blocks
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "qkv_f16"))
def _prefill_jit(params, cfg, text_ids, text_valid, voice, compute_dtype=None,
                 qkv_f16=False):
    return ar.prefill(params, cfg, text_ids, text_valid, voice,
                      compute_dtype, qkv_f16)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "qkv_f16"),
                   donate_argnames=("cache",))
def _decode_jit(params, cfg, cache, tokens, step, compute_dtype=None,
                qkv_f16=False):
    return ar.decode_step(params, cfg, cache, tokens, step, compute_dtype,
                          qkv_f16)


def _generate_body(params, cfg, first_logits, first_penalty_ids, cache, key,
                   max_steps: int, compute_dtype=None, qkv_f16=False,
                   axis_name=None, n_shards: int = 1,
                   sampler: tuple = ar.DEFAULT_SAMPLER):
    """Full on-device sampling loop.

    Returns (tokens (B, max_steps), n_steps, lengths (B,)): tokens beyond a
    sequence's stop are filled with the tokens actually sampled (the
    reference keeps decoding finished sequences); lengths[b] counts ids
    appended to sequence b (stop token included), mirroring the
    append-unless-finished rule (main.cpp:5205-5214).

    With `axis_name`, the body runs INSIDE a shard_map over a dp mesh
    axis: B is this shard's rows. Every shard advances the identical key
    chain, draws the GLOBAL (B*n_shards, 1) uniform matrix, and slices
    its rows — bit-identical decisions to the single-device run of the
    same global batch (jax threefry draws are shape-keyed, so a shard
    drawing only its (B, 1) rows would sample a different stream). The
    all-sequences-stopped termination rule is global: one psum per step
    rides the ICI.
    """
    b = first_logits.shape[0]
    stop = cfg.stop_mel_token

    def draw_u(k, dtype=jnp.float32):
        if axis_name is None:
            return jax.random.uniform(k, (b, 1), dtype)
        u = jax.random.uniform(k, (b * n_shards, 1), dtype)
        off = jax.lax.axis_index(axis_name) * b
        return jax.lax.dynamic_slice(u, (off, 0), (b, 1))

    def globally(all_stop):
        # the reference terminates only when every sequence samples the
        # stop token in the same iteration (main.cpp:5208-5218); under dp
        # that is an all-reduce over the shards
        if axis_name is None:
            return all_stop
        return jax.lax.psum(jnp.where(all_stop, 0, 1), axis_name) == 0

    def sample(logits, penalty_ids, key):
        probs, ids = S.process_logits_topk(logits, penalty_ids, *sampler)
        return S.sample_from_topk_u(draw_u(key, probs.dtype), probs, ids)

    key, k0 = jax.random.split(key)
    tok0 = sample(first_logits, first_penalty_ids, k0)

    tokens0 = jnp.zeros((b, max_steps), jnp.int32).at[:, 0].set(tok0)
    finished0 = tok0 == stop  # "finished" = appended stop already
    lengths0 = jnp.ones((b,), jnp.int32)

    def cond(state):
        step, all_stop, *_ = state
        return (step < max_steps) & jnp.logical_not(all_stop)

    # trace-time plane choice: on the B<=16 int8+bf16 production plane the
    # decode trunk, lm head AND sampler run as one kernel dispatch
    # (ops/pallas/decode_trunk.py); elsewhere decode_step + the XLA
    # sampler chain. Same uniform stream either way (sample_from_topk
    # draws the same-(B, 1) u from the same key), so the token sequences
    # agree up to f32 rounding between the two logit paths.
    fuse_sampling = (not qkv_f16
                     and ar.can_fuse_sampling(params, cfg, compute_dtype, b,
                                              sampler))

    def body(state):
        step, _, tokens, lengths, finished, cache, key = state
        prev = tokens[:, step - 1]
        key, k = jax.random.split(key)
        if fuse_sampling:
            u = draw_u(k)
            tok, cache = ar.decode_sample_step(params, cfg, cache, prev,
                                               step - 1, u, compute_dtype,
                                               sampler=sampler)
        else:
            logits, cache = ar.decode_step(params, cfg, cache, prev,
                                           step - 1, compute_dtype, qkv_f16)
            tok = sample(logits, prev[:, None], k)
        tokens = tokens.at[:, step].set(tok)
        lengths = jnp.where(finished, lengths, lengths + 1)
        finished = finished | (tok == stop)
        all_stop = globally(jnp.all(tok == stop))
        return step + 1, all_stop, tokens, lengths, finished, cache, key

    state = (jnp.int32(1), globally(jnp.all(tok0 == stop)), tokens0,
             lengths0, finished0, cache, key)
    step, _, tokens, lengths, finished, cache, _ = jax.lax.while_loop(
        cond, body, state
    )
    return tokens, step, lengths


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "qkv_f16", "max_steps",
                     "sampler"),
    donate_argnames=("cache",),
)
def _generate_jit(params, cfg, first_logits, first_penalty_ids, cache, key,
                  max_steps: int, compute_dtype=None, qkv_f16=False,
                  sampler: tuple = ar.DEFAULT_SAMPLER):
    """Single-device (or GSPMD-partitioned XLA plane) sampling loop; the
    cache is donated — it is dead after this call (the latent pass re-runs
    the full sequence from scratch), and without donation XLA keeps the
    prefill cache alive next to the while-loop carry copy — 2x peak KV
    HBM during decode."""
    return _generate_body(params, cfg, first_logits, first_penalty_ids,
                          cache, key, max_steps, compute_dtype, qkv_f16,
                          sampler=sampler)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "max_steps", "mesh", "sampler"),
    donate_argnames=("cache",),
)
def _generate_dp_jit(params, cfg, first_logits, first_penalty_ids, cache,
                     key, max_steps: int, compute_dtype, mesh,
                     sampler: tuple = ar.DEFAULT_SAMPLER):
    """The fused-kernel sampling loop dp-sharded with shard_map: batch
    rows split over the mesh's "dp" axis, weights replicated, each shard
    running the ONE-dispatch-per-step Pallas decode plane on its rows
    (a pallas_call cannot be auto-partitioned by pjit, so the plain jit
    plane had to fall back to the ~2x-slower XLA scan under any mesh).
    Requires a pure-dp mesh (tp=1 — the kernel's weight blocks cannot
    split) and B divisible by dp; see autoregressive_batch."""
    from jax.sharding import PartitionSpec as P

    P_rep = P()
    pspecs = jax.tree.map(lambda _: P_rep, params)
    cache_specs = ar.KVCache(
        k=P(None, "dp", None, None), v=P(None, "dp", None, None),
        valid=P("dp", None), length=P_rep)
    dp = mesh.shape["dp"]

    def body_fn(params, first_logits, first_penalty_ids, cache, key):
        return _generate_body(params, cfg, first_logits, first_penalty_ids,
                              cache, key, max_steps, compute_dtype,
                              axis_name="dp", n_shards=dp, sampler=sampler)

    fn = jax.shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(pspecs, P("dp", None), P("dp", None), cache_specs, P_rep),
        out_specs=(P("dp", None), P_rep, P("dp")),
        check_vma=False,
    )
    return fn(params, first_logits, first_penalty_ids, cache, key)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "qkv_f16"))
def _latents_jit(params, cfg, text_ids, text_valid, mel_ids, voice,
                 compute_dtype=None, qkv_f16=False):
    return ar.latent_forward(params, cfg, text_ids, text_valid, mel_ids,
                             voice, compute_dtype, qkv_f16)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _sequences_from_token_matrix(tokens, lengths):
    """Rebuild the per-sequence id lists with the reference's
    append-unless-finished rule."""
    seqs = []
    for b in range(tokens.shape[0]):
        seq = []
        for t in range(int(lengths[b])):
            seq.append(int(tokens[b, t]))
        seqs.append(seq)
    return seqs


def sampler_overrides(temperature=None, top_k=None, top_p_drop=None,
                      repetition_penalty=None):
    """Collect per-request sampler overrides into the dict form
    normalize_sampler accepts — None fields keep the reference defaults;
    returns None when nothing is overridden (shared by cli.py and
    serve.py)."""
    d = {k: v for k, v in (
        ("temperature", temperature), ("top_k", top_k),
        ("top_p_drop", top_p_drop),
        ("repetition_penalty", repetition_penalty)) if v is not None}
    return d or None


def normalize_sampler(sampler_params) -> tuple:
    """(temperature, top_k, top_p_drop, repetition_penalty) — a hashable
    jit-key tuple; None -> the reference's hardcoded defaults
    (main.cpp:4791-4793). Accepts a 4-sequence or a dict with those keys
    (missing keys keep defaults)."""
    if sampler_params is None:
        return ar.DEFAULT_SAMPLER
    if isinstance(sampler_params, dict):
        unknown = set(sampler_params) - {"temperature", "top_k",
                                         "top_p_drop", "repetition_penalty"}
        if unknown:
            raise ValueError(f"unknown sampler params: {sorted(unknown)}")
        d = dict(zip(("temperature", "top_k", "top_p_drop",
                      "repetition_penalty"), ar.DEFAULT_SAMPLER))
        d.update(sampler_params)
        sampler_params = (d["temperature"], d["top_k"], d["top_p_drop"],
                          d["repetition_penalty"])
    t, k, p, r = sampler_params
    t, k, p, r = float(t), int(k), float(p), float(r)
    if not (t > 0 and k >= 1 and 0 <= p < 1 and r > 0):
        raise ValueError(
            f"bad sampler params (temperature={t}, top_k={k}, "
            f"top_p_drop={p}, repetition_penalty={r}): need temperature>0, "
            "top_k>=1, 0<=top_p_drop<1, repetition_penalty>0")
    return (t, k, p, r)


def autoregressive_batch(
    params,
    tokens_list,
    voices: np.ndarray,
    cfg: ARConfig = ARConfig(),
    seed: int = 0,
    compute_dtype=None,
    qkv_f16: bool = False,
    mesh=None,
    int8_weights: bool = False,
    return_device_latents: bool = False,
    substage_timings: Optional[dict] = None,
    sampler_params=None,
) -> Tuple:
    """Batched serving path: different token sequences per row (list of id
    lists) with per-row voices (B, d) or one shared (d,) latent. Rows are
    padded to a common text bucket with masking; the on-device sample loop
    runs all rows together. Returns (trimmed_latents, padded_sequences) —
    or, with return_device_latents, the DEVICE (B, 500, D) latent array
    plus per-row keep lengths: (latents_dev, keep_lens, padded_sequences),
    skipping the latent round trip through the host (~0.15 s through the
    remote-TPU tunnel; the next stage consumes them on device).

    The first-step repetition penalty targets the prefill filler id set
    {1, start}, which is length-independent, so mixed text lengths share
    one penalty matrix (main.cpp:5100-5106).

    `sampler_params`: per-call (temperature, top_k, top_p_drop,
    repetition_penalty) — tuple, dict, or None for the reference's
    defaults (see normalize_sampler). top_k > 128 exceeds the fused
    kernel's in-kernel top-k domain and routes to the XLA sampler
    plane automatically."""
    sampler = normalize_sampler(sampler_params)
    tokens_list = [list(map(int, t)) for t in tokens_list]
    if not tokens_list:
        raise ValueError("tokens_list is empty")
    _check_token_range(tokens_list, cfg)
    b = len(tokens_list)
    lens = [len(t) for t in tokens_list]
    bucket = pick_bucket(max(lens))
    cfg = size_cache(cfg, bucket)
    text_ids = np.zeros((b, bucket), np.int32)
    text_valid = np.zeros((b, bucket), bool)
    for i, toks in enumerate(tokens_list):
        text_ids[i, : len(toks)] = toks
        text_valid[i, : len(toks)] = True

    voices = np.asarray(voices, np.float32)
    if voices.ndim == 1:
        voices = np.broadcast_to(voices, (b, voices.shape[0]))
    params = cast_matmul_weights(params, compute_dtype, int8_weights)
    from tortoise_tpu.pipeline.common import mesh_size, pure_dp

    use_dp_fused = False
    if mesh_size(mesh) > 1:
        if (pure_dp(mesh, b) and not qkv_f16
                and ar.can_fuse_sampling(params, cfg, compute_dtype,
                                         b // mesh.shape["dp"], sampler)):
            # pure-dp mesh: keep the fused one-dispatch-per-step decode
            # plane via shard_map (_generate_dp_jit: batch rows per
            # device, weights replicated, psum'd stop rule). Only the
            # full-sequence prefill/latent passes drop to the XLA plane
            # (their flash kernel is unsharded; scores partition cleanly).
            use_dp_fused = True
            cfg = dataclasses.replace(cfg, flash_prefill=False)
        else:
            # tp>1 (or a batch the dp axis can't split): a pallas_call
            # cannot be auto-partitioned by pjit — the fused decode /
            # flash prefill kernels would force their sharded operands to
            # gather/replicate. Take the XLA planes there (their einsums
            # partition cleanly).
            cfg = dataclasses.replace(cfg, fused_decode=False,
                                      flash_prefill=False)

    from tortoise_tpu.parallel import place_batch
    from tortoise_tpu.pipeline.common import mesh_context

    st = substage_timings
    ctx = mesh_context(mesh)
    with ctx:
        text_sh = place_batch(text_ids, mesh)
        valid_sh = place_batch(text_valid, mesh)
        voice_sh = place_batch(voices, mesh)
        t_sub = time.monotonic()
        logits, cache = _prefill_jit(params, cfg, text_sh, valid_sh,
                                     voice_sh, compute_dtype, qkv_f16)
        if st is not None:
            _barrier(logits)
            st["ar_prefill_s"] = time.monotonic() - t_sub
            t_sub = time.monotonic()
        # padded to bucket+2 (not max(lens)+2): the penalty only sees the
        # id SET {1, start} and apply_repetition_penalty is idempotent
        # over duplicates, while the array's shape keys _generate_jit's
        # jit cache — the exact length would recompile the whole decode
        # loop for every distinct text length within a bucket
        first_ids = np.full((b, bucket + 2), 1, np.int32)
        first_ids[:, -1] = cfg.start_mel_token

        key = jax.random.PRNGKey(seed)
        if use_dp_fused:
            toks, n_steps, lengths = _generate_dp_jit(
                params, cfg, logits, place_batch(first_ids, mesh), cache,
                key, cfg.max_decode_steps, compute_dtype, mesh,
                sampler=sampler)
        else:
            toks, n_steps, lengths = _generate_jit(
                params, cfg, logits, place_batch(first_ids, mesh), cache,
                key, cfg.max_decode_steps, compute_dtype, qkv_f16,
                sampler=sampler,
            )
        toks = np.asarray(toks)
        if st is not None:
            st["ar_decode_loop_s"] = time.monotonic() - t_sub
            st["ar_decode_steps"] = int(n_steps)
        sequences = _sequences_from_token_matrix(toks,
                                                 np.asarray(lengths))
        padded = [apply_padding(s, cfg) for s in sequences]
        if st is not None:
            t_sub = time.monotonic()
        mel_ids = place_batch(np.asarray(padded, np.int32), mesh)
        latents = _latents_jit(params, cfg, text_sh, valid_sh, mel_ids,
                               voice_sh, compute_dtype, qkv_f16)
        if st is not None:
            _barrier(latents)
            st["ar_latent_s"] = time.monotonic() - t_sub
    if return_device_latents:
        return latents, trim_keep_lengths(padded, cfg), padded
    trimmed = trim_latents(np.asarray(latents), padded, cfg)
    return trimmed, padded


def autoregressive(
    params,
    tokens: Sequence[int],
    voice: np.ndarray,
    batch_size: int = 1,
    cfg: ARConfig = ARConfig(),
    sampler: str = "jax",
    seed: int = 0,
    rng=None,
    compute_dtype=None,
    qkv_f16: bool = False,
    int8_weights: bool = False,
    return_device_latents: bool = False,
    substage_timings: Optional[dict] = None,
    sampler_params=None,
) -> Tuple:
    """Run stage 1. Returns (trimmed_latents, padded_sequences), the exact
    analogue of the reference's return pair (main.cpp:5365-5366) — or,
    with return_device_latents, (latents_dev (B, 500, D) on device,
    keep_lens, padded_sequences), skipping the host round trip.

    sampler="jax": on-device loop, seeded by `seed`.
    sampler="reference": host loop driven by `rng` (a ReferenceRng) with the
    mt19937 stream semantics.

    Pass a dict as `substage_timings` to decompose the stage wall into
    ar_prefill_s / ar_decode_loop_s (+ ar_decode_steps) / ar_latent_s.
    Each boundary inserts a device sync, serializing the stage — bench
    diagnostics only, off the production path.
    """
    tokens = list(map(int, tokens))
    _check_token_range([tokens], cfg)
    if sampler == "jax":
        # the batched driver with batch_size identical rows IS this path
        # (one bucketed prefill, the on-device sample loop, the latent
        # pass); keeping a second copy here bred divergence — the
        # first_ids shape bug had to be fixed twice
        return autoregressive_batch(
            params, [tokens] * batch_size, np.asarray(voice, np.float32),
            cfg, seed=seed, compute_dtype=compute_dtype, qkv_f16=qkv_f16,
            int8_weights=int8_weights,
            return_device_latents=return_device_latents,
            substage_timings=substage_timings,
            sampler_params=sampler_params,
        )
    t = len(tokens)
    bucket = pick_bucket(t)
    cfg = size_cache(cfg, bucket)
    text_ids = np.zeros((batch_size, bucket), np.int32)
    text_valid = np.zeros((batch_size, bucket), bool)
    text_ids[:, :t] = tokens
    text_valid[:, :t] = True

    voice = jnp.asarray(voice, jnp.float32)
    params = cast_matmul_weights(params, compute_dtype, int8_weights)
    st = substage_timings
    t_sub = time.monotonic()
    logits, cache = _prefill_jit(params, cfg, jnp.asarray(text_ids),
                                 jnp.asarray(text_valid), voice,
                                 compute_dtype, qkv_f16)
    if st is not None:
        _barrier(logits)
        st["ar_prefill_s"] = time.monotonic() - t_sub
        t_sub = time.monotonic()

    # first-step penalty ids: the prefill filler vector per sequence
    # ([1]*(T+1) + [8192], main.cpp:5100-5106), padded to bucket+2 with
    # more 1s — the penalty is idempotent over duplicate ids and the
    # bucket-stable shape keeps the decode jit at one compile per bucket
    first_ids = np.full((batch_size, bucket + 2), 1, np.int32)
    first_ids[:, -1] = cfg.start_mel_token

    if sampler == "reference":
        if rng is None:
            from tortoise_tpu.rng import ReferenceRng

            rng = ReferenceRng(seed)
        sequences = [[] for _ in range(batch_size)]
        prev_ids = [list(first_ids[b]) for b in range(batch_size)]
        step = 0
        sp = normalize_sampler(sampler_params)
        while True:
            samples = S.host_process_logits_and_sample(
                np.asarray(logits, np.float32), prev_ids, rng, *sp
            )
            for b in range(batch_size):
                if not (sequences[b] and sequences[b][-1] == cfg.stop_mel_token):
                    sequences[b].append(int(samples[b]))
            if all(s == cfg.stop_mel_token for s in samples):
                break
            if step >= cfg.max_decode_steps - 1:
                break
            tok = jnp.asarray(samples.astype(np.int32))
            logits, cache = _decode_jit(params, cfg, cache, tok,
                                        jnp.int32(step), compute_dtype,
                                        qkv_f16)
            prev_ids = [[int(samples[b])] for b in range(batch_size)]
            step += 1
    else:
        raise ValueError(f"unknown sampler '{sampler}'")

    if st is not None:
        # the host-parity loop interleaves device evals with host
        # sampling; its wall is the decode-loop cost on this plane
        st["ar_decode_loop_s"] = time.monotonic() - t_sub
        st["ar_decode_steps"] = step + 1

    padded = [apply_padding(s, cfg) for s in sequences]

    if st is not None:
        t_sub = time.monotonic()
    mel_ids = jnp.asarray(np.asarray(padded, np.int32))
    latents = _latents_jit(params, cfg, jnp.asarray(text_ids),
                           jnp.asarray(text_valid), mel_ids, voice,
                           compute_dtype, qkv_f16)
    if st is not None:
        _barrier(latents)
        st["ar_latent_s"] = time.monotonic() - t_sub
    if return_device_latents:
        return latents, trim_keep_lengths(padded, cfg), padded
    trimmed = trim_latents(np.asarray(latents), padded, cfg)
    return trimmed, padded
