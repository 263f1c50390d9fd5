"""Stage 2 driver: 80-step DDPM with classifier-free guidance.

Replaces the reference's `diffusion()` (main.cpp:5614-6042). The reference
builds + executes 160 fresh ggml graphs per utterance (cond + uncond x 80
steps) and does the posterior math on the CPU; here the loop-invariant
latent conditioner runs once, cond/uncond are one batch-of-2 eval, the
whole 80-step loop runs on-device in `lax.fori_loop`, and lengths round up
to static buckets (masked norms/attention) so XLA compiles once per bucket.

Semantics mirrored exactly (see pipeline/schedule.py for the math):
output_sequence_length = L*4*24000/22050 (main.cpp:5616-5617); the variance
channel comes from the CONDITIONED eval only (main.cpp:5970-5975); noise is
drawn every step even though the final step discards it (main.cpp:6014-6028
— matters for RNG-stream parity); loop step i handles respaced timestep
t = 79-i.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from tortoise_tpu.config import DiffusionConfig, mel_length_for_latents
from tortoise_tpu.models import diffusion as dmodel
from tortoise_tpu.ops.relpos import relative_position_buckets
from tortoise_tpu.pipeline import schedule as ds
from tortoise_tpu.pipeline.common import (
    device_barrier,
    mesh_context,
    mesh_size,
    pure_dp,
    round_up,
)

LAT_BUCKET = 32
OUT_BUCKET = 64


# backend-scoped cache token (ADVICE r2: id() of a freed client can be
# recycled; the shared helper guards with weakrefs + monotonic tokens)
from tortoise_tpu.pipeline.common import backend_token as _backend_token


def quantize_diffusion_weights(params):
    """int8 MXU plane for the denoiser's hot matmuls: the stacked
    layers/integrator/tail qkv, proj, and resblock convs, plus the
    integrating conv, become pre-transposed (w_int8, scale) pairs
    consumed by models.diffusion._linear / ops.conv.conv1d_nwc via
    pdot_int8act (measured 115 vs 96 TF/s against bf16 at the denoiser
    shapes — ~20% off the matmul-bound step). Left in bf16/f32: the
    latent conditioner (runs once per utterance, not in the 80-step
    loop), the tiny per-batch-row linears (time MLP, FiLM emb), the
    100-channel inp conv, and the 200-channel OUTPUT conv (the mel/
    variance head keeps full precision).

    Host-resident (numpy) leaves are quantized on the host so the later
    device placement ships int8 bytes instead of f32 — ~4x less through
    the remote-TPU tunnel's ~20 MB/s uplink (the quantized plane is most
    of the ~440 MB denoiser). The numpy and jnp planes share the same f32
    math and round-half-even (ops.basic.quantize_cols[_host])."""
    from tortoise_tpu.ops.basic import quantize_cols, quantize_cols_host

    def q(wm):
        if isinstance(wm, np.ndarray):
            return quantize_cols_host(wm)
        return quantize_cols(wm)

    def q_lin(w):  # (..., out, in) -> ((..., in, out) int8, scale)
        if isinstance(w, (tuple, list)):  # pre-quantized (plane cache)
            return tuple(w)
        return q(w.swapaxes(-1, -2))

    def q_conv(w):  # (..., out, in, k) -> ((..., k*in, out) int8, scale)
        if isinstance(w, (tuple, list)):  # pre-quantized (plane cache)
            return tuple(w)
        k, c_in, c_out = w.shape[-1], w.shape[-2], w.shape[-3]
        wm = w.swapaxes(-1, -3).reshape(*w.shape[:-3], k * c_in, c_out)
        return q(wm)

    out = dict(params)
    for group in ("layers", "integrator", "tail"):
        blk = dict(out[group])
        for key in ("attn_qkv_w", "attn_proj_w", "res_in_conv_w"):
            if key in blk:
                blk[key] = q_lin(blk[key])
        if "res_out_conv_w" in blk:
            blk["res_out_conv_w"] = q_conv(blk["res_out_conv_w"])
        out[group] = blk
    out["integrating_w"] = q_lin(out["integrating_w"])
    return out


def _progress_cuts(n: int):
    """Chunk boundaries [0, ..., n] (~10 chunks) for the progress-bar
    loop. The stop steps past n by the stride and n is appended
    explicitly — an earlier fixed `n + 8` stop silently dropped the
    FINAL denoise steps (including the t=0 mean-only one) for step
    counts like 101/111 where no stride multiple lands in [n, n+8)."""
    step = max(1, n // 10)
    return sorted({min(n, c) for c in range(0, n + step, step)} | {n})


def _schedule_arrays(cfg: DiffusionConfig):
    return _schedule_arrays_cached(cfg, _backend_token())


@functools.lru_cache(maxsize=8)
def _schedule_arrays_cached(cfg: DiffusionConfig, _token: int):
    """Device-resident schedule vectors, cached per config: rebuilding the
    4000-step numpy schedule and re-uploading it cost ~0.1 s per call."""
    s = ds.make_schedule(cfg.n_train_timesteps,
                         n_steps=cfg.n_sample_timesteps)
    return {
        "tmap": jnp.asarray(s.timestep_map, jnp.int32),
        "log_betas": jnp.asarray(np.log(s.betas), jnp.float32),
        "post_logvar": jnp.asarray(s.posterior_log_variance_clipped,
                                   jnp.float32),
        "sqrt_recip_acp": jnp.asarray(s.sqrt_recip_alphas_cumprod,
                                      jnp.float32),
        "sqrt_recipm1_acp": jnp.asarray(s.sqrt_recipm1_alphas_cumprod,
                                        jnp.float32),
        "coef1": jnp.asarray(s.posterior_mean_coef1, jnp.float32),
        "coef2": jnp.asarray(s.posterior_mean_coef2, jnp.float32),
    }


def _buckets_dev(length: int, num_buckets: int, max_distance: int):
    return _buckets_dev_cached(length, num_buckets, max_distance,
                               _backend_token())


@functools.lru_cache(maxsize=32)
def _buckets_dev_cached(length: int, num_buckets: int, max_distance: int,
                        _token: int):
    """Device-resident (L, L) rel-pos bucket ids, cached per shape.

    Recomputing the numpy bucket matrix (np.log over L^2 elements) and
    re-uploading ~19 MB through the remote-TPU tunnel cost ~1 s per
    diffusion call at production lengths; the matrix is deterministic."""
    return jax.device_put(jnp.asarray(
        relative_position_buckets(length, num_buckets, max_distance)))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "out_len_pad", "compute_dtype"),
)
def _code_emb_jit(params, cfg, latents, lat_buckets, lat_len, out_len,
                  out_len_pad, lat_mask, compute_dtype=None):
    cond, uncond = dmodel.code_embeddings(
        params, cfg, latents, lat_buckets, out_len_pad, lat_len, out_len,
        lat_mask, compute_dtype,
    )
    return jnp.concatenate([cond, uncond], axis=0)  # (2, C, Tpad)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "out_len_pad", "variance_swap", "compute_dtype"),
)
def _diffusion_all_jit(params, cfg, sched, lat_in, lat_buckets, lat_lens,
                       out_lens, out_len_pad, lat_mask, out_buckets,
                       out_mask, key, variance_swap=True,
                       compute_dtype=None):
    """Whole stage in ONE dispatch: conditioner + initial noise + 80-step
    loop. XLA hoists the loop-invariant code embedding out of the
    fori_loop, and the single dispatch saves two host round trips
    (~0.2 s/call through the remote-TPU tunnel)."""
    cond, uncond = dmodel.code_embeddings(
        params, cfg, lat_in, lat_buckets, out_len_pad, lat_lens, out_lens,
        lat_mask, compute_dtype,
    )
    code_emb2 = jnp.concatenate([cond, uncond], axis=0)
    b = lat_in.shape[0]
    key, sub = jax.random.split(key)
    noise = jax.random.normal(sub, (b, cfg.n_mel, out_len_pad))
    if out_mask is not None:
        noise = jnp.where(out_mask[:, None, :], noise, 0.0)
    x, _ = _diffusion_loop_jit(
        params, cfg, sched, code_emb2, noise, out_buckets, out_mask, key,
        jnp.int32(0), jnp.int32(cfg.n_sample_timesteps), variance_swap,
        compute_dtype,
    )
    return x


def posterior_step(sched, cfg: DiffusionConfig, x, cond_mean, uncond_mean,
                   var_frac, t, noise, variance_swap: bool = True):
    """One CPU-free posterior update: CFG blend, learned variance, x0
    prediction, posterior mean, ancestral sample (main.cpp:5966-6031)."""
    k = ds.cond_free_k(t, cfg.n_sample_timesteps, cfg.cond_free_k)
    eps = (1.0 + k) * cond_mean - k * uncond_mean
    logvar = ds.model_log_variance(var_frac, t, sched["log_betas"],
                                   sched["post_logvar"], variance_swap)
    x0 = ds.predict_xstart_from_eps(
        x, eps, sched["sqrt_recip_acp"][t], sched["sqrt_recipm1_acp"][t]
    )
    mean = ds.q_posterior_mean(x, x0, sched["coef1"][t], sched["coef2"][t])
    sample = mean + jnp.exp(0.5 * logvar) * noise
    return jnp.where(t > 0, sample, mean)


def _dp_draw(key, shape, dtype, axis_name, n_shards):
    """Per-shard rows of a GLOBAL normal draw: every shard advances the
    identical key chain and draws the full (B*n_shards, ...) matrix, then
    slices its rows — jax draws are shape-keyed, so a shard drawing only
    its local rows would sample a different stream than the single-device
    run (same trick as ar_stage._generate_body.draw_u)."""
    if axis_name is None:
        return jax.random.normal(key, shape, dtype)
    b = shape[0]
    g = jax.random.normal(key, (b * n_shards,) + tuple(shape[1:]), dtype)
    off = jax.lax.axis_index(axis_name) * b
    return jax.lax.dynamic_slice_in_dim(g, off, b, axis=0)


def _diffusion_loop_body(params, cfg, sched, code_emb2, x0_noise,
                         out_buckets, out_mask, key, lo, hi,
                         variance_swap=True, compute_dtype=None,
                         axis_name=None, n_shards=1):
    def body(i, carry):
        x, key = carry
        b = x.shape[0]
        t = cfg.n_sample_timesteps - 1 - i
        out = dmodel.denoise(
            params, cfg, jnp.concatenate([x, x], axis=0), code_emb2,
            sched["tmap"][t], out_buckets, out_mask, compute_dtype,
        )
        cond_mean, var_frac = jnp.split(out[:b], 2, axis=1)
        uncond_mean = jnp.split(out[b:], 2, axis=1)[0]
        key, sub = jax.random.split(key)
        noise = _dp_draw(sub, x.shape, x.dtype, axis_name, n_shards)
        x = posterior_step(sched, cfg, x, cond_mean, uncond_mean, var_frac,
                           t, noise, variance_swap)
        if out_mask is not None:
            x = jnp.where(out_mask[:, None, :], x, 0.0)
        return x, key

    return jax.lax.fori_loop(lo, hi, body, (x0_noise, key))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "variance_swap", "compute_dtype"),
)
def _diffusion_loop_jit(params, cfg, sched, code_emb2, x0_noise, out_buckets,
                        out_mask, key, lo, hi, variance_swap=True,
                        compute_dtype=None):
    """Denoise loop steps [lo, hi) on device. x0_noise: (B, 100, Tpad) the
    current sample; code_emb2: (2B, C, Tpad) = [cond rows | uncond rows];
    returns ((B, 100, Tpad), key). lo/hi are traced, so progress-chunked
    callers reuse one compilation for the whole range."""
    return _diffusion_loop_body(params, cfg, sched, code_emb2, x0_noise,
                                out_buckets, out_mask, key, lo, hi,
                                variance_swap, compute_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "out_len_pad", "variance_swap", "compute_dtype",
                     "mesh", "have_lat_mask", "have_out_mask"),
)
def _diffusion_all_dp_jit(params, cfg, sched, lat_in, lat_buckets, lat_lens,
                          out_lens, out_len_pad, lat_mask, out_buckets,
                          out_mask, key, variance_swap, compute_dtype, mesh,
                          have_lat_mask, have_out_mask):
    """_diffusion_all_jit dp-sharded with shard_map: batch rows split
    over the mesh's "dp" axis, weights replicated, each shard running
    the flash-kernel denoise loop on its rows (a pallas_call cannot be
    auto-partitioned by pjit — under plain jit a multi-device mesh would
    force the kernel's dp-sharded operands to gather/replicate). Every
    row is independent (no cross-row math anywhere in the stage), and
    the global-draw-and-slice noise discipline makes the sharded mel
    BIT-IDENTICAL to the single-device dispatch. Pure-dp meshes only;
    masks ride as explicit arrays with static presence flags (shard_map
    specs must match the arg pytree, so None can't be optional here)."""
    from jax.sharding import PartitionSpec as P

    P_rep = P()
    dp = mesh.shape["dp"]

    def body(params, sched, lat_in, lat_lens, out_lens, lat_mask,
             out_mask, key):
        lm = lat_mask if have_lat_mask else None
        om = out_mask if have_out_mask else None
        cond, uncond = dmodel.code_embeddings(
            params, cfg, lat_in, lat_buckets, out_len_pad, lat_lens,
            out_lens, lm, compute_dtype)
        code_emb2 = jnp.concatenate([cond, uncond], axis=0)
        b = lat_in.shape[0]
        key, sub = jax.random.split(key)
        noise = _dp_draw(sub, (b, cfg.n_mel, out_len_pad), jnp.float32,
                         "dp", dp)
        if om is not None:
            noise = jnp.where(om[:, None, :], noise, 0.0)
        x, _ = _diffusion_loop_body(
            params, cfg, sched, code_emb2, noise, out_buckets, om, key,
            jnp.int32(0), jnp.int32(cfg.n_sample_timesteps), variance_swap,
            compute_dtype, axis_name="dp", n_shards=dp)
        return x

    b_total = lat_in.shape[0]
    if lat_mask is None:
        lat_mask = jnp.ones((b_total, lat_in.shape[1]), bool)
    if out_mask is None:
        out_mask = jnp.ones((b_total, out_len_pad), bool)
    pspec = jax.tree.map(lambda _: P_rep, params)
    sspec = jax.tree.map(lambda _: P_rep, sched)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, sspec, P("dp", None, None), P("dp"), P("dp"),
                  P("dp", None), P("dp", None), P_rep),
        out_specs=P("dp", None, None),
        check_vma=False,
    )
    return fn(params, sched, lat_in, lat_lens, out_lens, lat_mask,
              out_mask, key)


@functools.partial(
    jax.jit, static_argnames=("cfg", "compute_dtype")
)
def _denoise_eval_jit(params, cfg, code_emb2, x, t_orig, out_buckets,
                      out_mask, compute_dtype=None):
    # no variance_swap here: the flag only affects the HOST posterior
    # math (posterior_step) — carrying it as a static jit arg would
    # recompile the identical denoiser eval per flag value
    out = dmodel.denoise(params, cfg, jnp.concatenate([x, x], axis=0),
                         code_emb2, t_orig, out_buckets, out_mask,
                         compute_dtype)
    return out


def _prepare_params(params, int8_weights: bool):
    from tortoise_tpu.pipeline.common import cached_cast, ensure_device

    if int8_weights:
        # quantize BEFORE placement: host leaves become int8 host-side and
        # the upload ships 1 byte/weight instead of 4 (synthesize() skips
        # its eager f32 diffusion upload on this path for the same reason)
        params = cached_cast(params, "int8", quantize_diffusion_weights)
        return cached_cast(params, "device", ensure_device)
    return cached_cast(params, "device", ensure_device)


def diffusion_batch(
    params,
    latents_list,
    cfg: DiffusionConfig = DiffusionConfig(),
    seed: int = 0,
    variance_swap: bool = True,
    compute_dtype=None,
    bucketed: bool = True,
    mesh=None,
    progress=None,
    int8_weights: bool = False,
):
    """Batched serving path: a list of (L_i, 1024) latents -> list of
    (100, T_i) mels, decoded together in one on-device 80-step loop with
    per-row masked lengths. Row order is preserved; the batch dimension is
    dp-shardable.

    progress: optional callable(fraction in [0,1]) — the analogue of the
    reference's live diffusion progress bar (main.cpp:5023-5035, 6032).
    When set, the on-device loop runs in chunks (one compilation, traced
    bounds) and the callback fires after each chunk completes."""
    params = _prepare_params(params, int8_weights)
    lats = [np.asarray(l, np.float32) for l in latents_list]
    if not lats:
        raise ValueError("latents_list is empty")
    b = len(lats)
    lat_lens = np.asarray([l.shape[0] for l in lats], np.int32)
    out_lens = np.asarray([mel_length_for_latents(int(n)) for n in lat_lens],
                          np.int32)
    lat_pad = round_up(int(lat_lens.max()), LAT_BUCKET) if bucketed \
        else int(lat_lens.max())
    out_pad = round_up(int(out_lens.max()), OUT_BUCKET) if bucketed \
        else int(out_lens.max())

    lat_in = np.zeros((b, lat_pad, lats[0].shape[1]), np.float32)
    lat_mask = np.zeros((b, lat_pad), bool)
    out_mask = np.zeros((b, out_pad), bool)
    for i, l in enumerate(lats):
        lat_in[i, : l.shape[0]] = l
        lat_mask[i, : l.shape[0]] = True
        out_mask[i, : out_lens[i]] = True
    # when every row exactly fills its bucket there is nothing to mask;
    # the masked group norms / attention cost ~25% of the eval (ubench)
    lat_mask_opt = None if lat_mask.all() else lat_mask
    out_mask_opt = None if out_mask.all() else out_mask

    use_dp = pure_dp(mesh, b) and progress is None
    if mesh_size(mesh) > 1 and not use_dp:
        # tp (or a batch dp can't split, or the progress-chunked path):
        # the flash pallas_call cannot be auto-partitioned by pjit —
        # take the XLA attention plane, which partitions cleanly
        cfg = dataclasses.replace(cfg, use_flash=False)
    lat_buckets = _buckets_dev(lat_pad, cfg.rel_pos_buckets,
                               cfg.rel_pos_max_distance)
    out_buckets = _buckets_dev(out_pad, cfg.rel_pos_buckets,
                               cfg.rel_pos_max_distance)
    sched = _schedule_arrays(cfg)

    from tortoise_tpu.parallel import place_batch

    ctx = mesh_context(mesh)
    with ctx:
        key = jax.random.PRNGKey(seed)
        out_mask_sh = None if out_mask_opt is None \
            else place_batch(out_mask_opt, mesh)
        n = cfg.n_sample_timesteps
        if use_dp:
            # pure-dp mesh: keep the flash kernel per shard (shard_map);
            # bit-identical to the single-device dispatch
            x = _diffusion_all_dp_jit(
                params, cfg, sched, place_batch(lat_in, mesh), lat_buckets,
                place_batch(lat_lens, mesh), place_batch(out_lens, mesh),
                out_pad,
                None if lat_mask_opt is None
                else place_batch(lat_mask_opt, mesh),
                out_buckets, out_mask_sh, key, variance_swap, compute_dtype,
                mesh, lat_mask_opt is not None, out_mask_opt is not None,
            )
        elif progress is None:
            # single dispatch: conditioner + noise + whole loop
            x = _diffusion_all_jit(
                params, cfg, sched, place_batch(lat_in, mesh), lat_buckets,
                place_batch(lat_lens, mesh), place_batch(out_lens, mesh),
                out_pad,
                None if lat_mask_opt is None
                else place_batch(lat_mask_opt, mesh),
                out_buckets, out_mask_sh, key, variance_swap, compute_dtype,
            )
        else:
            code_emb2 = _code_emb_jit(
                params, cfg, place_batch(lat_in, mesh), lat_buckets,
                place_batch(lat_lens, mesh), place_batch(out_lens, mesh),
                out_pad,
                None if lat_mask_opt is None
                else place_batch(lat_mask_opt, mesh),
                compute_dtype,
            )
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, (b, cfg.n_mel, out_pad))
            if out_mask_opt is not None:
                noise = jnp.where(jnp.asarray(out_mask)[:, None, :], noise,
                                  0.0)
            progress(0.0)
            x = noise
            cuts = _progress_cuts(n)
            for lo, hi in zip(cuts[:-1], cuts[1:]):
                x, key = _diffusion_loop_jit(
                    params, cfg, sched, code_emb2, x, out_buckets,
                    out_mask_sh, key, jnp.int32(lo), jnp.int32(hi),
                    variance_swap, compute_dtype,
                )
                # device_barrier, not block_until_ready: the latter can
                # return early over the remote-TPU tunnel (see
                # pipeline/common.py) and the progress callback would
                # race ahead of real compute
                device_barrier(x)
                progress(hi / n)
        x = np.asarray(x)
    return [x[i, :, : out_lens[i]] for i in range(b)]


def diffusion_batch_device(
    params,
    latents_dev,
    keep_lens,
    cfg: DiffusionConfig = DiffusionConfig(),
    seed: int = 0,
    variance_swap: bool = True,
    compute_dtype=None,
    mesh=None,
    int8_weights: bool = False,
):
    """Device-resident serving path: AR latents stay on device
    (autoregressive_batch(return_device_latents=True)) and the mel comes
    back as a DEVICE (B, n_mel, out_pad) array + per-row lengths — no
    host round trip at either stage boundary (~0.15 s each through the
    remote-TPU tunnel). Returns (mel_dev, out_lens np.ndarray)."""
    params = _prepare_params(params, int8_weights)
    b = latents_dev.shape[0]
    if b == 0:
        raise ValueError("latents_dev has no rows")
    lat_lens = np.asarray(keep_lens, np.int32)
    out_lens = np.asarray([mel_length_for_latents(int(n)) for n in lat_lens],
                          np.int32)
    lat_pad = round_up(int(lat_lens.max()), LAT_BUCKET)
    out_pad = round_up(int(out_lens.max()), OUT_BUCKET)

    from tortoise_tpu.parallel import place_batch

    if lat_pad <= latents_dev.shape[1]:
        lat_in = latents_dev[:, :lat_pad]
    else:
        lat_in = jnp.pad(latents_dev,
                         ((0, 0), (0, lat_pad - latents_dev.shape[1]),
                          (0, 0)))
    lat_in = place_batch(lat_in, mesh)
    lat_mask = np.zeros((b, lat_pad), bool)
    out_mask = np.zeros((b, out_pad), bool)
    for i in range(b):
        lat_mask[i, : lat_lens[i]] = True
        out_mask[i, : out_lens[i]] = True
    lat_mask_opt = None if lat_mask.all() else lat_mask
    out_mask_opt = None if out_mask.all() else out_mask

    lat_buckets = _buckets_dev(lat_pad, cfg.rel_pos_buckets,
                               cfg.rel_pos_max_distance)
    out_buckets = _buckets_dev(out_pad, cfg.rel_pos_buckets,
                               cfg.rel_pos_max_distance)
    sched = _schedule_arrays(cfg)

    use_dp = pure_dp(mesh, b)
    if mesh_size(mesh) > 1 and not use_dp:
        cfg = dataclasses.replace(cfg, use_flash=False)
    with mesh_context(mesh):
        key = jax.random.PRNGKey(seed)
        if use_dp:
            mel_dev = _diffusion_all_dp_jit(
                params, cfg, sched, lat_in, lat_buckets,
                place_batch(lat_lens, mesh), place_batch(out_lens, mesh),
                out_pad,
                None if lat_mask_opt is None
                else place_batch(lat_mask_opt, mesh),
                out_buckets,
                None if out_mask_opt is None
                else place_batch(out_mask_opt, mesh),
                key, variance_swap, compute_dtype, mesh,
                lat_mask_opt is not None, out_mask_opt is not None,
            )
        else:
            mel_dev = _diffusion_all_jit(
                params, cfg, sched, lat_in, lat_buckets,
                place_batch(lat_lens, mesh), place_batch(out_lens, mesh),
                out_pad,
                None if lat_mask_opt is None
                else place_batch(lat_mask_opt, mesh),
                out_buckets,
                None if out_mask_opt is None
                else place_batch(out_mask_opt, mesh),
                key, variance_swap, compute_dtype,
            )
    return mel_dev, out_lens


def diffusion(
    params,
    latents: np.ndarray,
    cfg: DiffusionConfig = DiffusionConfig(),
    seed: int = 0,
    rng=None,
    variance_swap: bool = True,
    compute_dtype=None,
    bucketed: bool = True,
    progress=None,
    int8_weights: bool = False,
) -> np.ndarray:
    """Latents (L, 1024) -> normalized mel (100, T).

    rng=None: fully on-device loop with jax.random noise.
    rng=ReferenceRng: host loop that consumes the mt19937 noise stream in
    the reference's exact order (initial noise, then one draw per step).
    progress: optional callable(fraction) fired as the loop advances.
    """
    if rng is None:
        return diffusion_batch(params, [latents], cfg, seed, variance_swap,
                               compute_dtype, bucketed,
                               progress=progress,
                               int8_weights=int8_weights)[0]

    # the reference-rng parity plane usually runs f32, but the flag
    # combination is the caller's choice — honor int8 here exactly like
    # the jax-rng path above (the AR stage honors it on this path too)
    params = _prepare_params(params, int8_weights)
    latents = np.asarray(latents, np.float32)
    lat_len = latents.shape[0]
    out_len = mel_length_for_latents(lat_len)
    lat_pad = round_up(lat_len, LAT_BUCKET) if bucketed else lat_len
    out_pad = round_up(out_len, OUT_BUCKET) if bucketed else out_len

    lat_in = np.zeros((1, lat_pad, latents.shape[1]), np.float32)
    lat_in[0, :lat_len] = latents
    lat_mask = np.zeros((1, lat_pad), bool)
    lat_mask[0, :lat_len] = True
    out_mask = np.zeros((1, out_pad), bool)
    out_mask[0, :out_len] = True

    lat_buckets = _buckets_dev(lat_pad, cfg.rel_pos_buckets,
                               cfg.rel_pos_max_distance)
    out_buckets = _buckets_dev(out_pad, cfg.rel_pos_buckets,
                               cfg.rel_pos_max_distance)
    sched = _schedule_arrays(cfg)

    code_emb2 = _code_emb_jit(
        params, cfg, jnp.asarray(lat_in), lat_buckets, lat_len, out_len,
        out_pad, None if lat_mask.all() else jnp.asarray(lat_mask),
        compute_dtype,
    )

    # host-parity loop: reference noise stream order (main.cpp:5638, 6014)
    x = np.zeros((1, cfg.n_mel, out_pad), np.float32)
    x[0, :, :out_len] = rng.normal_f32(cfg.n_mel * out_len).reshape(
        cfg.n_mel, out_len
    )
    x = jnp.asarray(x)
    tmap = np.asarray(sched["tmap"])
    mask_dev = None if out_mask.all() else jnp.asarray(out_mask)
    for i in range(cfg.n_sample_timesteps):
        t = cfg.n_sample_timesteps - 1 - i
        out = _denoise_eval_jit(params, cfg, code_emb2, x, tmap[t],
                                out_buckets, mask_dev, compute_dtype)
        out = np.asarray(out)
        cond_mean = out[0:1, : cfg.n_mel]
        var_frac = out[0:1, cfg.n_mel :]
        uncond_mean = out[1:2, : cfg.n_mel]
        step_noise = np.zeros((1, cfg.n_mel, out_pad), np.float32)
        step_noise[0, :, :out_len] = rng.normal_f32(
            cfg.n_mel * out_len
        ).reshape(cfg.n_mel, out_len)
        x = posterior_step(
            sched, cfg, x, jnp.asarray(cond_mean),
            jnp.asarray(uncond_mean), jnp.asarray(var_frac), t,
            jnp.asarray(step_noise), variance_swap,
        )
        if mask_dev is not None:
            x = jnp.where(mask_dev[:, None, :], x, 0.0)
        if progress is not None:
            progress((i + 1) / cfg.n_sample_timesteps)
    return np.asarray(x)[0, :, :out_len]
