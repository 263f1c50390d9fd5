"""Conditioned DDPM mel decoder, TPU-native.

Functional equivalent of the reference's `diffusion_graph`
(main.cpp:3066-4044), re-designed for XLA: stacked layer params under
`lax.scan`, cond/uncond evaluated as one batch-of-2, channels-first (B, C, T)
maps, static bucketed lengths with masked group norms and masked attention
(the reference builds a fresh graph per length per step, 160 builds per
utterance).

Architecture (tensor names from diffusion_model_load, main.cpp:1497-1634):

- latent conditioner (cond path only): conv1d k3 pad1 over the (1024, L)
  AR latents -> 4 x [groupnorm32+affine -> qkv conv k1 -> 16 heads x 64
  with *per-head-interleaved* qkv channels (h*192+part*64+d, matching
  upstream's QKVAttentionLegacy; views at main.cpp:3229-3245) -> softmax of
  QK/8 + 8.0*rel-pos-bucket bias -> proj -> residual]  (main.cpp:3156-3289)
- code_norm groupnorm, then FiLM by the stored conditioning latent:
  x*(1+scale)+shift, scale=latent[0:1024], shift=latent[1024:2048]
  (main.cpp:3291-3319)
- nearest upscale L -> T (main.cpp:3321); uncond path instead broadcasts
  `unconditioned_embedding` (main.cpp:3322-3329)
- timestep MLP: linear -> silu -> linear on the sinusoidal embedding of the
  ORIGINAL timestep (main.cpp:3331-3343)
- 3 conditioning_timestep_integrator layers on the code embedding, then:
  noisy mel -> inp_block conv k3 -> concat(code emb) -> integrating_conv k1
  -> 10 main layers -> 3 plain resblocks -> out groupnorm+silu+conv k3 ->
  200 ch = [100 means | 100 variance fracs] (main.cpp:3611-4044)
- resblock: gn+affine -> silu -> conv k1; emb branch silu->linear->(scale|
  shift); gn+affine -> x*(1+scale)+shift -> silu -> conv k3 -> +residual
  (main.cpp:3349-3488)
- attention blocks are NON-causal with T5 rel-pos bucket bias scaled x8.

Weight orientation: conv weights (out, in, k); linear weights (out, in)
used as x @ W.T — as delivered by io/ggml.py + io/checkpoint.py.

Internal activation layout is TIME-MAJOR (B, T, C) — every hot op is a
(B*T, C) matmul, XLA:TPU wants channels minor-most for those and for NWC
convs, and the channels-first formulation paid a measured ~7 ms/eval in
relayout fusions (r2 profile). The public entry points (`denoise`,
`code_embeddings`) keep the reference-shaped (B, C, T) views at the
boundary.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tortoise_tpu.config import DiffusionConfig
from tortoise_tpu.ops.basic import group_norm_tc, pdot, pdot_int8act, silu
from tortoise_tpu.ops.conv import conv1d_nwc
from tortoise_tpu.ops.relpos import relpos_bias

NEG_INF = -1e30


def _linear(x, w, b, compute_dtype=None, out_dtype=None):
    if isinstance(w, tuple):
        # pre-transposed int8 pair (quantize_diffusion_weights): int8 MXU
        # dot with dynamic activation quantization
        out = pdot_int8act(x, w)
        od = out_dtype or None
        if od is not None:
            return out.astype(od) + b.astype(od)
        return out + b
    if out_dtype is not None and compute_dtype is not None:
        return pdot(x, w.T, compute_dtype, out_dtype) + b.astype(out_dtype)
    return pdot(x, w.T, compute_dtype) + b


def _use_packed(cfg: DiffusionConfig) -> bool:
    return cfg.use_flash and cfg.n_head % 2 == 0 \
        and (6 * cfg.d_head) % 128 == 0


def _packed_bq(cfg: DiffusionConfig) -> int:
    """Query block size for the packed kernel — must match the rule in
    flash_attention_packed (rowblock_bq: a multiple of 128, short T pads
    up) so precomputed bands line up. Deliberately NOT a function of the
    sequence length: _band_stack precomputes bands once per denoise loop
    while _attention runs per layer, and both must agree. cfg.flash_bq=128
    measured fastest at T~2176 (2176 = 17x128 needs no padding; 256 pads
    to 2304, +6% kernel work — r2 corrected sweep 16.2 vs 16.7 ms/step)."""
    from tortoise_tpu.ops.pallas.flash_attention import rowblock_bq

    return rowblock_bq(cfg.flash_bq)


def _attention(block, x, rel_w, buckets, cfg: DiffusionConfig,
               mask=None, compute_dtype=None, band=None):
    """Rel-pos attention block over (B, T, C). mask: (B, T) bool or None.
    band: optional precomputed (band (H, 3, bq, bq), scalars (H, 2)) pair
    for the packed kernel — precompute with relpos_bias_band_stacked
    outside scanned loops (in-loop construction cost ~30% of the denoise
    loop)."""
    if cfg.diag_no_attn:  # ubench diagnostic only
        return x
    b, t, c = x.shape
    h, dh = cfg.n_head, cfg.d_head
    y = group_norm_tc(x, cfg.n_groups, block["attn_norm_w"],
                      block["attn_norm_b"], cfg.gn_eps, mask=mask,
                      fast=compute_dtype is not None)
    # bf16 path: emit the fused qkv straight in the kernel dtype (MXU
    # accumulates f32 internally either way; the f32 output + downcast
    # cost a full (B, T, 3C) round trip per layer)
    qkv = _linear(y, block["attn_qkv_w"], block["attn_qkv_b"],
                  compute_dtype, out_dtype=compute_dtype)  # (B, T, 3C)
    # channel c = head*192 + part*64 + d (per-head-interleaved qkv,
    # upstream QKVAttentionLegacy; main.cpp:3229-3245)
    if _use_packed(cfg):
        from tortoise_tpu.ops.pallas.flash_attention import (
            flash_attention_packed,
        )

        kv_valid = None
        if mask is not None:
            kv_valid = jnp.broadcast_to(mask, (b, t))
        kdt = compute_dtype or x.dtype  # halve the kernel's qkv streaming
        band_l, scal_l = band if band is not None else (None, None)
        # the packed kernel slices heads out of the fused qkv matmul output
        # via its index maps — no (B,T,H,3,D)->(B,H,T,D) transposes, which
        # doubled the custom-call time (scripts/ubench_flash_kernel.py)
        merged = flash_attention_packed(
            qkv.astype(kdt), h, kv_valid, bias_table=rel_w,
            bias_max_distance=cfg.rel_pos_max_distance,
            bq=_packed_bq(cfg),
            interpret=jax.default_backend() != "tpu",
            band=band_l, band_scalars=scal_l,
            # tuning knobs come from the config (part of the jit cache
            # key); the kernel wrapper has its own trace cache, so they
            # must be real arguments. 4 heads/program measured 15.2 vs
            # 16.1 ms/CFG-step (r2 sweep; 8 fails to compile — VMEM)
            hpp=cfg.flash_hpp,
            vmem_mb=cfg.flash_vmem_mb or None,
        )
    elif cfg.use_flash:
        from tortoise_tpu.ops.pallas.flash_attention import flash_attention

        kv_valid = None
        if mask is not None:
            kv_valid = jnp.broadcast_to(mask, (b, t))
        kdt = compute_dtype or x.dtype
        qkv5 = qkv.astype(kdt).reshape(b, t, h, 3, dh)
        ctx = flash_attention(
            qkv5[:, :, :, 0].transpose(0, 2, 1, 3),
            qkv5[:, :, :, 1].transpose(0, 2, 1, 3),
            qkv5[:, :, :, 2].transpose(0, 2, 1, 3),
            None, kv_valid, bias_table=rel_w, bias_formula=True,
            bias_max_distance=cfg.rel_pos_max_distance, bq=128, bk=128,
            group=cfg.flash_group, vmem_mb=cfg.flash_vmem_mb or None,
            interpret=jax.default_backend() != "tpu",
        )
        merged = ctx.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
    else:
        qkv = qkv.reshape(b, t, h, 3, dh)
        q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)  # (B, H, T, Dh)
        k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)
        scores = pdot(q, k.swapaxes(-1, -2), compute_dtype) / jnp.sqrt(
            jnp.float32(dh))
        scores = scores + relpos_bias(rel_w, buckets)[None]
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        ctx = pdot(probs.astype(q.dtype), v, compute_dtype)  # (B, H, T, Dh)
        merged = ctx.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
    out = _linear(merged, block["attn_proj_w"], block["attn_proj_b"],
                  compute_dtype, out_dtype=compute_dtype)
    return x + out.astype(x.dtype)


def _resblock(block, x, time_emb, cfg: DiffusionConfig, prefix="res_",
              mask=None, compute_dtype=None):
    """FiLM resblock over (B, T, C); time_emb (B, C)."""
    y = group_norm_tc(x, cfg.n_groups, block[prefix + "in_norm_w"],
                      block[prefix + "in_norm_b"], cfg.gn_eps, mask=mask,
                      fast=compute_dtype is not None)
    y = silu(y)
    # bf16 out_dtype keeps the FiLM chain off f32 traffic
    y = _linear(y, block[prefix + "in_conv_w"], block[prefix + "in_conv_b"],
                compute_dtype, out_dtype=compute_dtype)
    emb = _linear(silu(time_emb), block[prefix + "emb_w"],
                  block[prefix + "emb_b"], compute_dtype)  # (B, 2C)
    scale, shift = jnp.split(emb.astype(y.dtype), 2, axis=-1)
    y = group_norm_tc(y, cfg.n_groups, block[prefix + "out_norm_w"],
                      block[prefix + "out_norm_b"], cfg.gn_eps, mask=mask,
                      fast=compute_dtype is not None)
    y = y * (1.0 + scale)[:, None, :] + shift[:, None, :]
    y = silu(y)
    if mask is not None:
        # the FiLM shift is nonzero on padded frames; zero them before the
        # k3 conv or they leak into the last valid frame
        y = jnp.where(mask[:, :, None], y, 0.0)
    y = conv1d_nwc(y, block[prefix + "out_conv_w"],
                   block[prefix + "out_conv_b"], padding=1,
                   compute_dtype=compute_dtype, out_dtype=compute_dtype)
    if mask is not None:
        y = jnp.where(mask[:, :, None], y, jnp.zeros((), y.dtype))
    return x + y.astype(x.dtype)


def _diffusion_layer(layer, x, time_emb, buckets, cfg, mask, compute_dtype,
                     band=None):
    x = _resblock(layer, x, time_emb, cfg, "res_", mask, compute_dtype)
    return _attention(layer, x, layer["attn_rel_w"], buckets, cfg, mask,
                      compute_dtype, band)


def _band_stack(tables, cfg: DiffusionConfig):
    """Precomputed per-layer band biases for the packed kernel, or None
    when the packed path is off. tables: (L, NB, H)."""
    if not _use_packed(cfg):
        return None
    from tortoise_tpu.ops.relpos import relpos_bias_band_stacked

    return relpos_bias_band_stacked(
        tables, _packed_bq(cfg), scale=8.0,
        num_buckets=cfg.rel_pos_buckets,
        max_distance=cfg.rel_pos_max_distance)


def latent_conditioner(params, cfg: DiffusionConfig, latents: jax.Array,
                       lat_buckets: jax.Array, lat_mask=None,
                       compute_dtype=None) -> jax.Array:
    """AR latents (B, L, 1024) -> conditioned code embedding (B, L, 1024)
    time-major. lat_buckets: (L, L) rel-pos buckets; lat_mask: (B, L)."""
    x = latents
    if lat_mask is not None:
        x = jnp.where(lat_mask[:, :, None], x, 0.0)
    x = conv1d_nwc(x, params["latent_conv_w"], params["latent_conv_b"],
                   padding=1, compute_dtype=compute_dtype)

    bands = _band_stack(params["latent_blocks"]["attn_rel_w"], cfg)
    if bands is None:
        def step(x, block):
            return _attention(block, x, block["attn_rel_w"], lat_buckets,
                              cfg, lat_mask, compute_dtype), None

        x, _ = jax.lax.scan(step, x, params["latent_blocks"])
    else:
        def step_b(x, xs):
            block, band_l, scal_l = xs
            return _attention(block, x, block["attn_rel_w"], lat_buckets,
                              cfg, lat_mask, compute_dtype,
                              band=(band_l, scal_l)), None

        x, _ = jax.lax.scan(step_b, x, (params["latent_blocks"],) + bands)
    x = group_norm_tc(x, cfg.n_groups, params["code_norm_w"],
                      params["code_norm_b"], cfg.gn_eps, mask=lat_mask,
                      fast=compute_dtype is not None)
    x = x * (1.0 + params["cond_scale"]) + params["cond_shift"]
    return x


def time_mlp(params, t_emb, compute_dtype=None):
    """Sinusoidal embedding (B, C) -> FiLM time embedding (B, C)
    (main.cpp:3331-3343)."""
    h = silu(_linear(t_emb, params["time_w0"], params["time_b0"],
                     compute_dtype))
    return _linear(h, params["time_w1"], params["time_b1"], compute_dtype)


def integrate_code(params, cfg: DiffusionConfig, code_emb, time_emb,
                   out_buckets, mask=None, compute_dtype=None):
    """3 conditioning_timestep_integrator layers (main.cpp:3345-3608)."""
    bands = _band_stack(params["integrator"]["attn_rel_w"], cfg)
    if bands is None:
        def step(x, layer):
            return _diffusion_layer(layer, x, time_emb, out_buckets, cfg,
                                    mask, compute_dtype), None

        x, _ = jax.lax.scan(step, code_emb, params["integrator"])
    else:
        def step_b(x, xs):
            layer, band_l, scal_l = xs
            return _diffusion_layer(layer, x, time_emb, out_buckets, cfg,
                                    mask, compute_dtype,
                                    band=(band_l, scal_l)), None

        x, _ = jax.lax.scan(step_b, code_emb,
                            (params["integrator"],) + bands)
    return x


def trunk(params, cfg: DiffusionConfig, noisy_mel, code_emb, time_emb,
          out_buckets, mask=None, compute_dtype=None):
    """Noisy mel (B, T, 100) + integrated code emb (B, T, 1024) ->
    (B, T, 200) [means | var fracs], all time-major (main.cpp:3611-4044)."""
    x = conv1d_nwc(noisy_mel, params["inp_w"], params["inp_b"], padding=1,
                   compute_dtype=compute_dtype, out_dtype=compute_dtype)
    x = jnp.concatenate([x, code_emb.astype(x.dtype)], axis=-1)
    # the residual carry stays in the compute dtype: an f32 carry doubles
    # every elementwise pass through the 10 main layers (r2 profile)
    x = _linear(x, params["integrating_w"], params["integrating_b"],
                compute_dtype, out_dtype=compute_dtype)

    unroll = cfg.main_unroll
    bands = _band_stack(params["layers"]["attn_rel_w"], cfg)
    if bands is None:
        def main_step(x, layer):
            return _diffusion_layer(layer, x, time_emb, out_buckets, cfg,
                                    mask, compute_dtype), None

        x, _ = jax.lax.scan(main_step, x, params["layers"], unroll=unroll)
    else:
        def main_step_b(x, xs):
            layer, band_l, scal_l = xs
            return _diffusion_layer(layer, x, time_emb, out_buckets, cfg,
                                    mask, compute_dtype,
                                    band=(band_l, scal_l)), None

        x, _ = jax.lax.scan(main_step_b, x, (params["layers"],) + bands,
                            unroll=unroll)

    def tail_step(x, layer):
        return _resblock(layer, x, time_emb, cfg, "res_", mask,
                         compute_dtype), None

    x, _ = jax.lax.scan(tail_step, x, params["tail"])

    x = group_norm_tc(x, cfg.n_groups, params["out_norm_w"],
                      params["out_norm_b"], cfg.gn_eps, mask=mask,
                      fast=compute_dtype is not None)
    x = silu(x)
    x = conv1d_nwc(x, params["out_w"], params["out_b"], padding=1,
                   compute_dtype=compute_dtype)
    if mask is not None:
        x = jnp.where(mask[:, :, None], x, 0.0)
    return x


def code_embeddings(params, cfg: DiffusionConfig, latents, lat_buckets,
                    out_len_pad: int, lat_len=None, out_len=None,
                    lat_mask=None, compute_dtype=None,
                    ) -> Tuple[jax.Array, jax.Array]:
    """Loop-invariant part of the denoiser: returns the (1, 1024, Tpad)
    conditioned and unconditioned code embedding bases (before the
    timestep integrator). Hoisted out of the 80-step loop — the reference
    recomputes it every step (2x80 graph builds, main.cpp:5723-5964).

    out_len_pad is the static padded length; lat_len/out_len are the true
    (possibly traced) lengths used for the nearest-upscale indices."""
    cond = latent_conditioner(params, cfg, latents, lat_buckets, lat_mask,
                              compute_dtype)  # (B, L, C) time-major

    def onehot_upsample(idx):
        # row gather as a one-hot matmul: XLA:TPU gathers run ~200x slower
        # than the MXU for this (22.7 ms vs ~0.1 ms at production shapes).
        # HIGHEST on the f32 parity path keeps the gather exact (a one-hot
        # operand makes the multi-pass dot bit-identical to jnp.take; the
        # default single-pass form rounds the latents to bf16)
        oh = (idx[..., :, None]
              == jnp.arange(cond.shape[1])).astype(cond.dtype)
        prec = (jax.lax.Precision.HIGHEST
                if cond.dtype == jnp.float32 else None)
        return jnp.matmul(oh, cond, preferred_element_type=jnp.float32,
                          precision=prec).astype(cond.dtype)

    if lat_len is None:
        idx = (jnp.arange(out_len_pad) * cond.shape[1]) // out_len_pad
        up = onehot_upsample(idx)
    else:
        # bucketed: nearest indices computed from the true lengths
        # (scalars or per-row (B,) for batched serving)
        lat_len = jnp.asarray(lat_len)
        out_len = jnp.asarray(out_len if out_len is not None else out_len_pad)
        if lat_len.ndim == 0:
            idx = (jnp.arange(out_len_pad) * lat_len) // jnp.maximum(
                out_len, 1)
            idx = jnp.clip(idx, 0, jnp.maximum(lat_len - 1, 0))
            up = onehot_upsample(idx)
        else:
            b = cond.shape[0]
            lat_len = jnp.broadcast_to(lat_len, (b,))
            out_len = jnp.broadcast_to(out_len, (b,))
            idx = (jnp.arange(out_len_pad)[None, :] * lat_len[:, None]) \
                // jnp.maximum(out_len[:, None], 1)
            idx = jnp.clip(idx, 0, jnp.maximum(lat_len[:, None] - 1, 0))
            up = onehot_upsample(idx)
    uncond = jnp.broadcast_to(
        params["uncond"][None, None, :], up.shape
    ).astype(up.dtype)
    # reference-shaped (B, C, T) view at the public boundary
    return up.swapaxes(1, 2), uncond.swapaxes(1, 2)


def denoise(params, cfg: DiffusionConfig, x, code_emb, t_orig,
            out_buckets, mask=None, compute_dtype=None):
    """One denoiser evaluation. x: (B, 100, T) noisy mel; code_emb:
    (B, 1024, T) — pass cond/uncond stacked as batch 2 for CFG; t_orig:
    () or (B,) ORIGINAL timestep id. Returns (B, 200, T)."""
    from tortoise_tpu.pipeline.schedule import timestep_embedding

    if cfg.diag_fake_denoise:  # ubench diagnostic
        return jnp.concatenate(
            [x, jnp.zeros_like(x)], axis=1).astype(jnp.float32) \
            + code_emb[:, :1, :1].astype(jnp.float32) * 0.0
    if mask is not None and mask.shape[0] not in (1, x.shape[0]):
        # CFG stacks cond/uncond rows: tile the (B, T) mask to (2B, T)
        reps = x.shape[0] // mask.shape[0]
        mask = jnp.tile(mask, (reps, 1))
    t_emb = timestep_embedding(
        jnp.broadcast_to(jnp.asarray(t_orig), (x.shape[0],)),
        cfg.timestep_dim, cfg.timestep_max_period,
    )
    time_emb = time_mlp(params, t_emb, compute_dtype)
    if compute_dtype is not None:
        # carry activations in the compute dtype: the denoiser's elementwise
        # traffic (~500 GB f32 over the 80-step loop at T~2176) halves, and
        # diffusion is robust to bf16 activations (the model output feeds a
        # clamped x0 prediction; the posterior math stays f32)
        x = x.astype(compute_dtype)
        code_emb = code_emb.astype(compute_dtype)
        time_emb = time_emb.astype(compute_dtype)
    # time-major internals; (B, C, T) only at this boundary
    code = integrate_code(params, cfg, code_emb.swapaxes(1, 2), time_emb,
                          out_buckets, mask, compute_dtype)
    out = trunk(params, cfg, x.swapaxes(1, 2), code, time_emb, out_buckets,
                mask, compute_dtype)
    return out.swapaxes(1, 2).astype(jnp.float32)
