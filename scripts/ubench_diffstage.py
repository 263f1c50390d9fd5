"""Instrument the bench-context diffusion stage: where do the seconds go?

Replicates bench.py's exact stage-2 call (same latents shape as a
500-step AR generation) and times each piece: place/code_emb, the 80-step
loop dispatch+execute, and the final host transfer.

    python scripts/ubench_diffstage.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from tortoise_tpu.config import DiffusionConfig, mel_length_for_latents
from tortoise_tpu.io.checkpoint import random_diffusion_params
from tortoise_tpu.pipeline import diffusion_stage as dst
from tortoise_tpu.pipeline.common import ensure_device, round_up
from tortoise_tpu.ops.relpos import relative_position_buckets

import dataclasses

cfg = DiffusionConfig()
if jax.default_backend() == "tpu":
    cfg = dataclasses.replace(cfg, use_flash=True)
# script-level knob overrides for sweeps (config stays the source of
# truth in the library; UB_* env reads live only in scripts/)
if os.environ.get("UB_HPP"):
    cfg = dataclasses.replace(cfg, flash_hpp=int(os.environ["UB_HPP"]))
if os.environ.get("UB_BQ"):
    cfg = dataclasses.replace(cfg, flash_bq=int(os.environ["UB_BQ"]))
params = ensure_device(random_diffusion_params(cfg, seed=1))
rng = np.random.default_rng(0)
L = 500
lat = rng.normal(0, 0.5, (L, 1024)).astype(np.float32)
compute_dtype = jnp.bfloat16

lat_len = L
out_len = mel_length_for_latents(L)
lat_pad = round_up(lat_len, dst.LAT_BUCKET)
out_pad = round_up(out_len, dst.OUT_BUCKET)
print(f"lat_pad={lat_pad} out_pad={out_pad}")

lat_in = np.zeros((1, lat_pad, 1024), np.float32)
lat_in[0, :lat_len] = lat
# mirror diffusion_batch's mask optimization: an all-true mask becomes
# None (the masked GN/attention plane costs ~25% more than no mask; the
# production driver never runs it when rows exactly fill their buckets)
lat_mask = np.zeros((1, lat_pad), bool)
lat_mask[0, :lat_len] = True
lat_mask_opt = None if lat_mask.all() else jnp.asarray(lat_mask)
out_mask = np.zeros((1, out_pad), bool)
out_mask[0, :out_len] = True
out_mask_opt = None if out_mask.all() else jnp.asarray(out_mask)

lat_buckets = jnp.asarray(relative_position_buckets(
    lat_pad, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))
out_buckets = jnp.asarray(relative_position_buckets(
    out_pad, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))
sched = dst._schedule_arrays(cfg)

lat_lens = np.asarray([lat_len], np.int32)
out_lens = np.asarray([out_len], np.int32)


def run(seed, verbose=False):
    ts = {}
    t0 = time.monotonic()
    code_emb2 = dst._code_emb_jit(
        params, cfg, jnp.asarray(lat_in), lat_buckets,
        jnp.asarray(lat_lens), jnp.asarray(out_lens), out_pad,
        lat_mask_opt, compute_dtype)
    code_emb2.block_until_ready()
    ts["code_emb"] = time.monotonic() - t0

    t0 = time.monotonic()
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    noise = jax.random.normal(sub, (1, cfg.n_mel, out_pad))
    if out_mask_opt is not None:
        noise = jnp.where(out_mask_opt[:, None, :], noise, 0.0)
    noise.block_until_ready()
    ts["noise"] = time.monotonic() - t0

    t0 = time.monotonic()
    x, _ = dst._diffusion_loop_jit(
        params, cfg, sched, code_emb2, noise, out_buckets,
        out_mask_opt, key, jnp.int32(0),
        jnp.int32(cfg.n_sample_timesteps), True, compute_dtype)
    x.block_until_ready()
    ts["loop"] = time.monotonic() - t0

    t0 = time.monotonic()
    xh = np.asarray(x)
    ts["to_host"] = time.monotonic() - t0
    ts["total"] = sum(ts.values())
    ts["ms_per_step"] = ts["loop"] * 1e3 / cfg.n_sample_timesteps
    print({k: round(v, 4) for k, v in ts.items()}, flush=True)
    return xh


if os.environ.get("UB_MODE") == "profile":
    # trace a short loop window and dump the aggregated per-op profile
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ubench_diffusion import profile_to_summary

    def short_loop(params):
        key = jax.random.PRNGKey(0)
        noise = jax.random.normal(key, (1, cfg.n_mel, out_pad))
        code_emb2 = dst._code_emb_jit(
            params, cfg, jnp.asarray(lat_in), lat_buckets,
            jnp.asarray(lat_lens), jnp.asarray(out_lens), out_pad,
            None, compute_dtype)
        x, _ = dst._diffusion_loop_jit(
            params, cfg, sched, code_emb2, noise, out_buckets,
            None, key, jnp.int32(0), jnp.int32(8), True, compute_dtype)
        return x

    profile_to_summary(short_loop, params, outdir="/tmp/jaxtrace_loop")
else:
    run(0)   # compile
    for i in range(4):
        run(1 + i)
