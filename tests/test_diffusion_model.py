"""Diffusion model tests against an independent float64 numpy oracle
written from the reference graph semantics (main.cpp:3066-4044)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.config import DiffusionConfig, tiny_diffusion_config
from tortoise_tpu.io.checkpoint import random_diffusion_params
from tortoise_tpu.models import diffusion as dm
from tortoise_tpu.ops.relpos import relative_position_buckets
from tortoise_tpu.pipeline import schedule as ds


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------

def np_group_norm(x, groups, w, b, eps=1e-5):
    c, t = x.shape
    xr = x.reshape(groups, c // groups, t)
    mean = xr.mean(axis=(1, 2), keepdims=True)
    var = ((xr - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    out = ((xr - mean) / np.sqrt(var + eps)).reshape(c, t)
    return out * w[:, None] + b[:, None]


def np_silu(x):
    return x / (1 + np.exp(-x))


def np_conv1d(x, w, b, pad=0, dilation=1):
    """x (C_in, T), w (C_out, C_in, K) -> (C_out, T')."""
    c_in, t = x.shape
    c_out, _, k = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad)))
    span = (k - 1) * dilation + 1
    t_out = xp.shape[1] - span + 1
    out = np.zeros((c_out, t_out))
    for j in range(k):
        out += np.einsum("oi,it->ot", w[:, :, j],
                         xp[:, j * dilation : j * dilation + t_out])
    return out + b[:, None]


def np_relpos_bias(weight, length, cfg):
    buckets = relative_position_buckets(length, cfg.rel_pos_buckets,
                                        cfg.rel_pos_max_distance)
    return np.transpose(weight[buckets], (2, 0, 1)) * 8.0  # (H, L, L)


def np_attention(block, i, x, cfg):
    c, t = x.shape
    h, dh = cfg.n_head, cfg.d_head
    y = np_group_norm(x, cfg.n_groups, block["attn_norm_w"][i],
                      block["attn_norm_b"][i], cfg.gn_eps)
    qkv = block["attn_qkv_w"][i] @ y + block["attn_qkv_b"][i][:, None]
    qkv = qkv.reshape(h, 3, dh, t)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (H, Dh, T)
    scores = np.einsum("hdi,hdj->hij", q, k) / np.sqrt(dh)
    scores = scores + np_relpos_bias(block["attn_rel_w"][i], t, cfg)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ctx = np.einsum("hij,hdj->hdi", p, v).reshape(h * dh, t)
    out = block["attn_proj_w"][i] @ ctx + block["attn_proj_b"][i][:, None]
    return x + out


def np_resblock(block, i, x, emb, cfg):
    y = np_group_norm(x, cfg.n_groups, block["res_in_norm_w"][i],
                      block["res_in_norm_b"][i], cfg.gn_eps)
    y = np_silu(y)
    y = block["res_in_conv_w"][i] @ y + block["res_in_conv_b"][i][:, None]
    e = block["res_emb_w"][i] @ np_silu(emb) + block["res_emb_b"][i]
    scale, shift = np.split(e, 2)
    y = np_group_norm(y, cfg.n_groups, block["res_out_norm_w"][i],
                      block["res_out_norm_b"][i], cfg.gn_eps)
    y = y * (1 + scale)[:, None] + shift[:, None]
    y = np_silu(y)
    y = np_conv1d(y, block["res_out_conv_w"][i], block["res_out_conv_b"][i],
                  pad=1)
    return x + y


def np_denoise(params, cfg, x, latents, t_orig):
    """Full conditioned+unconditioned oracle eval. x (100, T), latents
    (L, 1024). Returns (cond_out, uncond_out) each (200, T)."""
    t = x.shape[-1]
    # time embedding
    half = cfg.timestep_dim // 2
    freqs = np.exp(-np.log(cfg.timestep_max_period)
                   * np.arange(half) / half)
    args = t_orig * freqs
    t_emb = np.concatenate([np.cos(args), np.sin(args)])
    emb = params["time_w0"] @ t_emb + params["time_b0"]
    emb = params["time_w1"] @ np_silu(emb) + params["time_b1"]

    # conditioned code embedding
    c = np_conv1d(latents.T, params["latent_conv_w"],
                  params["latent_conv_b"], pad=1)
    for i in range(cfg.n_latent_cond_blocks):
        c = np_attention(params["latent_blocks"], i, c, cfg)
    c = np_group_norm(c, cfg.n_groups, params["code_norm_w"],
                      params["code_norm_b"], cfg.gn_eps)
    c = c * (1 + params["cond_scale"])[:, None] + params["cond_shift"][:, None]
    idx = (np.arange(t) * c.shape[-1]) // t
    cond_base = c[:, idx]
    uncond_base = np.broadcast_to(params["uncond"][:, None],
                                  (cfg.d_model, t))

    outs = []
    for base in (cond_base, uncond_base):
        code = base
        for i in range(cfg.n_integrator_layers):
            code = np_resblock(params["integrator"], i, code, emb, cfg)
            code = np_attention(params["integrator"], i, code, cfg)
        h = np_conv1d(x, params["inp_w"], params["inp_b"], pad=1)
        h = np.concatenate([h, code], axis=0)
        h = params["integrating_w"] @ h + params["integrating_b"][:, None]
        for i in range(cfg.n_main_layers):
            h = np_resblock(params["layers"], i, h, emb, cfg)
            h = np_attention(params["layers"], i, h, cfg)
        for i in range(cfg.n_tail_resblocks):
            h = np_resblock(params["tail"], i, h, emb, cfg)
        h = np_group_norm(h, cfg.n_groups, params["out_norm_w"],
                          params["out_norm_b"], cfg.gn_eps)
        h = np_silu(h)
        h = np_conv1d(h, params["out_w"], params["out_b"], pad=1)
        outs.append(h)
    return outs


def as_f64(tree):
    return jax.tree.map(lambda a: np.asarray(a, np.float64), tree)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=2)
    rng = np.random.default_rng(0)
    lat_len, out_len = 6, 13
    latents = rng.normal(0, 0.5, (lat_len, cfg.d_model)).astype(np.float32)
    x = rng.normal(0, 1, (cfg.n_mel, out_len)).astype(np.float32)
    return cfg, params, latents, x


def test_denoise_matches_numpy_oracle(setup):
    cfg, params, latents, x = setup
    lat_len, out_len = latents.shape[0], x.shape[-1]
    t_orig = 1234

    cond64, uncond64 = np_denoise(as_f64(params), cfg,
                                  x.astype(np.float64),
                                  latents.astype(np.float64), t_orig)

    lat_buckets = jnp.asarray(relative_position_buckets(
        lat_len, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))
    out_buckets = jnp.asarray(relative_position_buckets(
        out_len, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))
    cond, uncond = dm.code_embeddings(params, cfg, jnp.asarray(latents[None]),
                                      lat_buckets, out_len)
    code2 = jnp.concatenate([cond, uncond], axis=0)
    out = dm.denoise(params, cfg, jnp.asarray(np.stack([x, x])), code2,
                     jnp.int32(t_orig), out_buckets)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], cond64, atol=5e-4)
    np.testing.assert_allclose(out[1], uncond64, atol=5e-4)


def test_bucketed_padding_invariance(setup):
    cfg, params, latents, x = setup
    lat_len, out_len = latents.shape[0], x.shape[-1]
    lat_pad, out_pad = lat_len + 3, out_len + 7

    def run(lp, op, lmask, omask, lat_in, x_in, lat_l, out_l):
        lat_buckets = jnp.asarray(relative_position_buckets(
            lp, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))
        out_buckets = jnp.asarray(relative_position_buckets(
            op, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))
        cond, uncond = dm.code_embeddings(
            params, cfg, jnp.asarray(lat_in), lat_buckets, op, lat_l, out_l,
            None if lmask is None else jnp.asarray(lmask))
        code2 = jnp.concatenate([cond, uncond], axis=0)
        return np.asarray(dm.denoise(
            params, cfg, jnp.asarray(np.stack([x_in, x_in])), code2,
            jnp.int32(99), out_buckets,
            None if omask is None else jnp.asarray(omask)))

    exact = run(lat_len, out_len, None, None, latents[None], x,
                lat_len, out_len)

    lat_in = np.zeros((1, lat_pad, cfg.d_model), np.float32)
    lat_in[0, :lat_len] = latents
    lmask = np.zeros((2, lat_pad), bool)
    lmask[:, :lat_len] = True
    x_in = np.zeros((cfg.n_mel, out_pad), np.float32)
    x_in[:, :out_len] = x
    omask = np.zeros((2, out_pad), bool)
    omask[:, :out_len] = True
    padded = run(lat_pad, out_pad, lmask[:1], omask, lat_in, x_in,
                 lat_len, out_len)

    np.testing.assert_allclose(padded[:, :, :out_len], exact, atol=1e-4)
    assert np.abs(padded[:, :, out_len:]).max() < 1e-6


def test_qkv_head_interleaving_locality(setup):
    """Sanity-check the per-head qkv interleave: zeroing one head's 3*dh
    channel block must change only that head's contribution."""
    cfg, params, latents, x = setup
    out_len = x.shape[-1]
    blk = jax.tree.map(lambda a: np.array(a), params["layers"])
    # zero head 0's qkv rows of layer 0: channels 0..3*dh
    blk["attn_qkv_w"][0, : 3 * cfg.d_head] = 0
    blk["attn_qkv_b"][0, : 3 * cfg.d_head] = 0
    p2 = dict(params, layers=blk)
    out_buckets = jnp.asarray(relative_position_buckets(
        out_len, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))
    xb = jnp.asarray(x[None])
    base = np.broadcast_to(np.asarray(params["uncond"])[None, :, None],
                           (1, cfg.d_model, out_len))
    o1 = dm.denoise(params, cfg, xb, jnp.asarray(base), jnp.int32(5),
                    out_buckets)
    o2 = dm.denoise(p2, cfg, xb, jnp.asarray(base), jnp.int32(5),
                    out_buckets)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 0


def test_flash_attention_path_matches(setup):
    """cfg.use_flash routes attention through the Pallas kernel (interpret
    mode on CPU) and must match the XLA path."""
    import dataclasses

    cfg, params, latents, x = setup
    out_len = x.shape[-1]
    out_buckets = jnp.asarray(relative_position_buckets(
        out_len, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))
    base = np.broadcast_to(np.asarray(params["uncond"])[None, :, None],
                           (1, cfg.d_model, out_len))
    o_xla = dm.denoise(params, cfg, jnp.asarray(x[None]), jnp.asarray(base),
                       jnp.int32(7), out_buckets)
    fcfg = dataclasses.replace(cfg, use_flash=True)
    o_flash = dm.denoise(params, fcfg, jnp.asarray(x[None]),
                         jnp.asarray(base), jnp.int32(7), out_buckets)
    np.testing.assert_allclose(np.asarray(o_flash), np.asarray(o_xla),
                               atol=5e-4)


def test_bf16_flash_denoise_runs_and_is_close(setup):
    """bf16 activations + flash path must keep stable carry dtypes through
    the scans and stay near the f32 result."""
    import dataclasses

    cfg, params, latents, x = setup
    out_len = x.shape[-1]
    out_buckets = jnp.asarray(relative_position_buckets(
        out_len, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))
    base = np.broadcast_to(np.asarray(params["uncond"])[None, :, None],
                           (1, cfg.d_model, out_len)).astype(np.float32)
    o32 = dm.denoise(params, cfg, jnp.asarray(x[None]), jnp.asarray(base),
                     jnp.int32(7), out_buckets)
    fcfg = dataclasses.replace(cfg, use_flash=True)
    obf = dm.denoise(params, fcfg, jnp.asarray(x[None]), jnp.asarray(base),
                     jnp.int32(7), out_buckets,
                     compute_dtype=jnp.bfloat16)
    assert obf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(obf), np.asarray(o32), atol=0.1)


def test_group_norm_fast_matches_exact():
    """The one-pass E[x^2] group-norm (production bf16 path) must match
    the exact two-pass form, masked and unmasked, including a nonzero-mean
    input (the cancellation-sensitive case)."""
    from tortoise_tpu.ops.basic import group_norm_tc

    rng = np.random.default_rng(0)
    b, t, c, g = 2, 48, 64, 8
    x = (rng.normal(0, 1, (b, t, c)) + 3.0).astype(np.float32)
    w = rng.normal(1, 0.1, (c,)).astype(np.float32)
    bb = rng.normal(0, 0.1, (c,)).astype(np.float32)
    mask = np.ones((b, t), bool)
    mask[0, 37:] = False
    mask[1, 11:] = False
    for m in (None, mask):
        exact = group_norm_tc(jnp.asarray(x), g, jnp.asarray(w),
                              jnp.asarray(bb), mask=None if m is None
                              else jnp.asarray(m))
        fast = group_norm_tc(jnp.asarray(x), g, jnp.asarray(w),
                             jnp.asarray(bb), mask=None if m is None
                             else jnp.asarray(m), fast=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   atol=2e-4)


def test_int8_denoiser_close_and_runs(setup):
    """int8 MXU plane (quantize_diffusion_weights): per-column weight +
    dynamic per-row activation quantization keeps a single denoiser eval
    within a few percent of f32 — the accumulated 80-step divergence is
    bounded by the same ancestral-process chaos as bf16 (PARITY.md)."""
    import jax.numpy as jnp

    from tortoise_tpu.pipeline.diffusion_stage import (
        quantize_diffusion_weights,
    )

    cfg, params, _, _ = setup
    rng = np.random.default_rng(5)
    t = 12
    x = jnp.asarray(rng.normal(0, 1, (2, cfg.n_mel, t)), jnp.float32)
    code = jnp.asarray(rng.normal(0, 0.5, (2, cfg.d_model, t)), jnp.float32)
    buckets = jnp.asarray(relative_position_buckets(
        t, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))
    o32 = np.asarray(dm.denoise(params, cfg, x, code, jnp.int32(7), buckets))
    p8 = quantize_diffusion_weights(params)
    # host (numpy) and device (jnp) quantize planes must agree bit-for-bit
    # — pipelines pick one by leaf residency (host int8 ships 1 byte/weight
    # through the tunnel on cold start)
    p8_dev = quantize_diffusion_weights(
        jax.tree.map(jnp.asarray, params))
    for a, b in zip(jax.tree.leaves(p8), jax.tree.leaves(p8_dev)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o8 = np.asarray(dm.denoise(p8, cfg, x, code, jnp.int32(7), buckets))
    rel = np.max(np.abs(o8 - o32)) / max(np.max(np.abs(o32)), 1e-9)
    assert np.isfinite(o8).all()
    assert rel < 0.06, f"int8 denoiser relative error {rel:.4f}"

    # masked rows stay exactly zero through the quantized convs
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([[t], [t - 3]]),
                       bool)
    om = np.asarray(dm.denoise(p8, cfg, x, code, jnp.int32(7), buckets,
                               mask=mask))
    assert np.all(om[1, :, t - 3:] == 0.0)


def test_progress_cuts_cover_all_steps():
    """The progress-chunked loop's boundaries must end exactly at n for
    EVERY step count — a fixed `n + 8` range stop used to silently drop
    the final denoise steps (incl. the t=0 mean-only one) for counts
    like 101/111."""
    from tortoise_tpu.pipeline.diffusion_stage import _progress_cuts

    for n in list(range(1, 130)) + [160, 200, 1000]:
        cuts = _progress_cuts(n)
        assert cuts[0] == 0 and cuts[-1] == n, (n, cuts)
        assert cuts == sorted(set(cuts)), (n, cuts)
        # bounded chunk count: stride max(1, n // 10) gives at most
        # n+1 boundaries for n < 20 (per-step) and <= ~16 beyond
        assert len(cuts) <= min(n + 1, 20), (n, cuts)
