"""Pseudo-golden fixtures: fixed random weights + fixed inputs -> pinned
stage outputs.

The reference validates end-to-end numerics against committed fixtures
(/root/reference/main.cpp:6256-6510), but its GGML weight files are not
present in this environment, so the real golden tests
(tests/test_golden_parity.py) skip. This module pins the numerics anyway:
every stage is evaluated on deterministic synthetic weights
(np.random.default_rng streams are stable across numpy versions) and the
outputs are committed to tests/data/pseudo_golden.npz. Any change that
bends a stage's numerics — a masking bug, a reordered reduction outside
tolerance, a quirk "fix" — fails tests/test_pseudo_golden.py even though
the numpy oracles in the unit tests could have been edited in the same
commit.

Regenerate (only after an INTENTIONAL numerics change, and say why in the
commit message):

    python tests/gen_pseudo_golden.py
"""

from __future__ import annotations

import os

import numpy as np

DATA_PATH = os.path.join(os.path.dirname(__file__), "data",
                         "pseudo_golden.npz")

# per-key relative tolerance overrides (default 1e-3 of the fixture's
# max-abs scale; see test_pseudo_golden.py). The production fast path —
# bf16 activations, packed flash kernel, int8 weights — is pinned at
# looser committed tolerances: its rounding is deterministic on the CPU
# backend the tests run on, but leaving headroom means a legitimate
# recompile-level change (op reordering inside jit) doesn't false-alarm,
# while a real numerics bend (softmax edit, scale-math bug) still fails.
TOLERANCES = {
    "ar_decode_int8_": 5e-3,       # int8 weights, f32 activations
    "fused_decode_": 5e-3,         # bf16+int8 fused kernel, interpret mode
    # (token picks are integers: any flipped pick blows far past 5e-3)
    "diff_denoise_bf16_flash": 3e-2,   # bf16 + flash attention path
    "packed_kernel_": 1e-5,        # interpret-mode kernel: near-exact f32
}


def tolerance_for(name: str) -> float:
    for prefix, tol in TOLERANCES.items():
        if name.startswith(prefix):
            return tol
    return 1e-3


def compute_outputs() -> dict:
    """Evaluate every pinned quantity. Returns {name: np.ndarray}."""
    import jax.numpy as jnp

    from tortoise_tpu.config import (
        DiffusionConfig,
        tiny_ar_config,
        tiny_diffusion_config,
        tiny_vocoder_config,
    )
    from tortoise_tpu.io.checkpoint import (
        random_ar_params,
        random_diffusion_params,
        random_vocoder_params,
    )
    from tortoise_tpu.models import ar, diffusion as dmodel, vocoder as vmodel
    from tortoise_tpu.ops.relpos import relative_position_buckets
    from tortoise_tpu.pipeline.ar_stage import apply_padding
    from tortoise_tpu.pipeline.diffusion_stage import (
        _schedule_arrays,
        posterior_step,
    )

    out = {}

    # ---- stage 1: AR prefill / decode / latents (tiny config) ----
    cfg = tiny_ar_config()
    params = random_ar_params(cfg, seed=7)
    rng = np.random.default_rng(11)
    b, t = 2, 12
    text_ids = jnp.asarray(rng.integers(0, cfg.n_text_vocab, (b, t)),
                           jnp.int32)
    # ragged lengths so the padding mask is part of the pinned behavior
    text_valid = jnp.asarray(
        np.arange(t)[None, :] < np.array([[12], [9]]), bool)
    voice = jnp.asarray(rng.normal(0, 0.5, (cfg.d_model,)), jnp.float32)

    logits, cache = ar.prefill(params, cfg, text_ids, text_valid, voice)
    out["ar_prefill_logits"] = np.asarray(logits)
    for i, toks in enumerate([(4, 9), (1, 2), (7, 3)]):
        logits, cache = ar.decode_step(
            params, cfg, cache, jnp.asarray(toks, jnp.int32), jnp.int32(i))
        out[f"ar_decode_logits_{i}"] = np.asarray(logits)

    seqs = [[4, 9, 1, 7, cfg.calm_token, 2], [3, 3, 3]]
    mel_ids = jnp.asarray([apply_padding(s, cfg) for s in seqs], jnp.int32)
    latents = ar.latent_forward(params, cfg, text_ids, text_valid, mel_ids,
                                voice)
    out["ar_latents"] = np.asarray(latents)

    # ---- production AR weight plane: int8 matmul weights (the benched
    # default). Pins both the quantize_cols scale math and the pdot int8
    # dot path; compared against the f32 logits by
    # test_int8_stays_close_to_f32. ----
    from tortoise_tpu.pipeline.ar_stage import cast_matmul_weights

    params8 = cast_matmul_weights(params, None, int8=True)
    _, cache8 = ar.prefill(params8, cfg, text_ids, text_valid, voice)
    for i, toks in enumerate([(4, 9), (1, 2), (7, 3)]):
        logits8, cache8 = ar.decode_step(
            params8, cfg, cache8, jnp.asarray(toks, jnp.int32), jnp.int32(i))
        out[f"ar_decode_int8_logits_{i}"] = np.asarray(logits8)

    # ---- the FUSED decode+sample kernel (ops/pallas/decode_trunk.py,
    # interpret mode off-TPU), committed near-exactly: two steps on the
    # bf16+int8 plane pin the (L, B)-grid trunk math, the in-kernel
    # double-norm head, AND the in-kernel sampler's picks — a bend in
    # the block-diagonal attention, the head pack, or the nucleus rule
    # fails here without any oracle edit. B=2 exercises per-row blocks.
    import dataclasses as _dcf

    fcfg = _dcf.replace(cfg, fused_decode=True)
    p16 = cast_matmul_weights(params, jnp.bfloat16, int8=True)
    _, fcache = ar.prefill(p16, fcfg, text_ids, text_valid, voice,
                           jnp.bfloat16)
    ftoks = jnp.asarray((4, 9), jnp.int32)
    for i, uu in enumerate((0.31, 0.77)):
        u = jnp.full((2, 1), uu, jnp.float32)
        ftoks, fcache = ar.decode_sample_step(
            p16, fcfg, fcache, ftoks, jnp.int32(i), u, jnp.bfloat16)
        out[f"fused_decode_tokens_{i}"] = np.asarray(ftoks)
    out["fused_decode_krow"] = np.asarray(
        fcache.k[:, :, fcache.length - 1, :], np.float32)

    # ---- stage 2: one denoiser eval (masked) + posterior update ----
    dcfg = tiny_diffusion_config()
    dparams = random_diffusion_params(dcfg, seed=3)
    dt = 12
    x = jnp.asarray(rng.normal(0, 1, (2, dcfg.n_mel, dt)), jnp.float32)
    code = jnp.asarray(rng.normal(0, 0.5, (2, dcfg.d_model, dt)),
                       jnp.float32)
    buckets = jnp.asarray(relative_position_buckets(
        dt, dcfg.rel_pos_buckets, dcfg.rel_pos_max_distance))
    mask = jnp.asarray(np.arange(dt)[None, :] < np.array([[12], [10]]), bool)
    eps = dmodel.denoise(dparams, dcfg, x, code, jnp.int32(1234), buckets,
                         mask=mask)
    out["diff_denoise"] = np.asarray(eps)

    # ---- production diffusion fast path: bf16 activations + the PACKED
    # flash kernel (interpret mode off-TPU). Needs d_head=64 so the
    # packed head-slicing layout applies (6*64 lanes % 128 == 0); a
    # 128-aligned length exercises the no-padding block schedule. ----
    import dataclasses as _dc

    # fresh stream: the sections above/below must keep their exact draws
    prng = np.random.default_rng(21)
    pcfg = _dc.replace(tiny_diffusion_config(), d_model=256, n_head=4,
                       n_groups=8, timestep_dim=256, use_flash=True,
                       flash_bq=64, flash_hpp=2)
    pparams = random_diffusion_params(pcfg, seed=9)
    pt = 128
    px = jnp.asarray(prng.normal(0, 1, (2, pcfg.n_mel, pt)), jnp.float32)
    pcode = jnp.asarray(prng.normal(0, 0.5, (2, pcfg.d_model, pt)),
                        jnp.float32)
    pbuckets = jnp.asarray(relative_position_buckets(
        pt, pcfg.rel_pos_buckets, pcfg.rel_pos_max_distance))
    pmask = jnp.asarray(np.arange(pt)[None, :] < np.array([[128], [100]]),
                        bool)
    peps = dmodel.denoise(pparams, pcfg, px, pcode, jnp.int32(777),
                          pbuckets, mask=pmask,
                          compute_dtype=jnp.bfloat16)
    out["diff_denoise_bf16_flash"] = np.asarray(peps)

    # ---- the packed kernel in isolation, committed near-exactly: a bend
    # in its online-softmax/band-bias math cannot hide behind the looser
    # end-to-end tolerance above ----
    from tortoise_tpu.ops.pallas.flash_attention import (
        flash_attention_packed,
    )

    kh, kd, kt = 4, 64, 128
    kqkv = jnp.asarray(prng.normal(0, 1, (1, kt, 3 * kh * kd)), jnp.float32)
    ktable = jnp.asarray(prng.normal(0, 0.3, (32, kh)), jnp.float32)
    kvalid = jnp.asarray(np.arange(kt)[None, :] < 112, bool)
    out["packed_kernel_masked"] = np.asarray(flash_attention_packed(
        kqkv, kh, kvalid, bias_table=ktable, bq=64, interpret=True,
        hpp=2))
    out["packed_kernel_unmasked"] = np.asarray(flash_attention_packed(
        kqkv, kh, None, bias_table=ktable, bq=64, interpret=True, hpp=2))

    # production DDPM schedule constants (the f32-quirk betas feed every
    # posterior update; pin a stride-sampled slice of each array)
    from tortoise_tpu.pipeline.schedule import make_schedule

    s = make_schedule(DiffusionConfig().n_train_timesteps,
                      n_steps=DiffusionConfig().n_sample_timesteps)
    for name in ("timestep_map", "betas", "alphas_cumprod",
                 "posterior_log_variance_clipped", "posterior_mean_coef1",
                 "posterior_mean_coef2", "sqrt_recip_alphas_cumprod",
                 "sqrt_recipm1_alphas_cumprod"):
        arr = np.asarray(getattr(s, name))
        out[f"sched_{name}"] = arr[:: max(1, len(arr) // 16)]
    sched = _schedule_arrays(DiffusionConfig())

    # one full posterior step at a mid-loop index (fixed model outputs)
    cm = jnp.asarray(rng.normal(0, 0.3, (1, DiffusionConfig().n_mel, 4)),
                     jnp.float32)
    um = jnp.asarray(rng.normal(0, 0.3, cm.shape), jnp.float32)
    cv = jnp.asarray(rng.normal(0, 0.3, cm.shape), jnp.float32)
    xs = jnp.asarray(rng.normal(0, 1.0, cm.shape), jnp.float32)
    noise = jnp.asarray(rng.normal(0, 1.0, cm.shape), jnp.float32)
    x_next = posterior_step(sched, DiffusionConfig(), xs, cm, um, cv,
                            jnp.int32(40), noise)
    out["diff_posterior_step"] = np.asarray(x_next)

    # ---- stage 3: vocoder audio ----
    vcfg = tiny_vocoder_config()
    vparams = random_vocoder_params(vcfg, seed=5)
    m = 8
    mel = jnp.asarray(rng.normal(-5.0, 2.0, (1, vcfg.n_mel, m)), jnp.float32)
    vnoise = jnp.asarray(rng.normal(0, 1, (1, vcfg.noise_ch, m)), jnp.float32)
    audio = vmodel.vocoder_forward(vparams, vcfg, mel, vnoise)
    out["voc_audio"] = np.asarray(audio)

    return out
