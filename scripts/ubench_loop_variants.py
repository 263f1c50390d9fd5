"""Sweep flash-kernel tuning knobs inside the REAL 80-step diffusion loop.

Each variant re-jits the loop body fresh (env knobs are trace-time), so
every variant pays one compile; the persistent cache keeps repeats cheap.

    python scripts/ubench_loop_variants.py
"""

import functools
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

import dataclasses

cfg = dataclasses.replace(DiffusionConfig(), use_flash=True)
params = ensure_device(random_diffusion_params(cfg, seed=1))
rng = np.random.default_rng(0)
L = 500
compute_dtype = jnp.bfloat16

lat_len = L
out_len = mel_length_for_latents(L)
lat_pad = round_up(lat_len, dst.LAT_BUCKET)
out_pad = round_up(out_len, dst.OUT_BUCKET)

lat_in = np.zeros((1, lat_pad, 1024), np.float32)
lat_in[0, :lat_len] = rng.normal(0, 0.5, (L, 1024))
lat_buckets = dst._buckets_dev(lat_pad, cfg.rel_pos_buckets,
                               cfg.rel_pos_max_distance)
out_buckets = dst._buckets_dev(out_pad, cfg.rel_pos_buckets,
                               cfg.rel_pos_max_distance)
sched = dst._schedule_arrays(cfg)

code_emb2 = dst._code_emb_jit(
    params, cfg, jnp.asarray(lat_in), lat_buckets,
    jnp.asarray(np.asarray([lat_len], np.int32)),
    jnp.asarray(np.asarray([out_len], np.int32)), out_pad, None,
    compute_dtype)
code_emb2.block_until_ready()

key = jax.random.PRNGKey(0)
noise = jax.random.normal(key, (1, cfg.n_mel, out_pad))

VARIANTS = [
    ("hpp4", {}),
    ("hpp4vmem100", {"FLASH_VMEM_MB": "100"}),
    ("hpp4bq256", {"FLASH_BQ": "256"}),
]

raw = dst._diffusion_loop_jit.__wrapped__

for name, env in VARIANTS:
    os.environ.update(env)
    try:
        # fresh def per variant: pjit caches traces on the callable's
        # identity, so re-jitting the same function object silently reuses
        # the previous trace and env knobs never apply
        def fresh(params, cfg, sched, code_emb2, x0_noise, out_buckets,
                  out_mask, key, lo, hi, variance_swap=True,
                  compute_dtype=None):
            return raw(params, cfg, sched, code_emb2, x0_noise,
                       out_buckets, out_mask, key, lo, hi, variance_swap,
                       compute_dtype)

        f = jax.jit(fresh, static_argnames=("cfg", "variance_swap",
                                            "compute_dtype"))

        def run():
            x, _ = f(params, cfg, sched, code_emb2, noise, out_buckets,
                     None, key, jnp.int32(0), jnp.int32(80), True,
                     compute_dtype)
            # block_until_ready returns early over the axon tunnel; a tiny
            # device->host transfer is the only reliable barrier
            np.asarray(jnp.ravel(x)[:1])
            return x

        t0 = time.monotonic()
        run()  # compile
        print(f"{name:10s}: first run {time.monotonic() - t0:6.1f} s",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            run()
            ts.append(time.monotonic() - t0)
        dt = min(ts)
        print(f"{name:10s}: {dt:6.3f} s  ({dt/80*1e3:6.2f} ms/step)",
              flush=True)
    except Exception as e:
        print(f"{name:10s}: FAIL {type(e).__name__} {str(e)[:100]}",
              flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)
