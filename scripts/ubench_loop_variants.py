"""Sweep flash-kernel tuning knobs inside the REAL 80-step diffusion loop.

Knobs are DiffusionConfig fields (flash_bq / flash_hpp / flash_group /
flash_vmem_mb / main_unroll) and the config is a jit static argument, so
each variant is just dataclasses.replace — a different config compiles a
fresh loop; the persistent cache keeps repeats cheap.

    python scripts/ubench_loop_variants.py
"""

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

base = dataclasses.replace(DiffusionConfig(), use_flash=True)
params = ensure_device(random_diffusion_params(base, seed=1))
rng = np.random.default_rng(0)
L = 500
compute_dtype = jnp.bfloat16

lat_len = L
out_len = mel_length_for_latents(L)
lat_pad = round_up(lat_len, dst.LAT_BUCKET)
out_pad = round_up(out_len, dst.OUT_BUCKET)

lat_in = np.zeros((1, lat_pad, 1024), np.float32)
lat_in[0, :lat_len] = rng.normal(0, 0.5, (L, 1024))
lat_buckets = dst._buckets_dev(lat_pad, base.rel_pos_buckets,
                               base.rel_pos_max_distance)
out_buckets = dst._buckets_dev(out_pad, base.rel_pos_buckets,
                               base.rel_pos_max_distance)
sched = dst._schedule_arrays(base)

key = jax.random.PRNGKey(0)
noise = jax.random.normal(key, (1, base.n_mel, out_pad))

VARIANTS = [
    ("hpp4", {}),
    ("hpp4vmem100", {"flash_vmem_mb": 100}),
    ("hpp4bq256", {"flash_bq": 256}),
    ("hpp2", {"flash_hpp": 2}),
    ("unroll2", {"main_unroll": 2}),
]

for name, fields in VARIANTS:
    cfg = dataclasses.replace(base, **fields)
    try:
        code_emb2 = dst._code_emb_jit(
            params, cfg, jnp.asarray(lat_in), lat_buckets,
            jnp.asarray(np.asarray([lat_len], np.int32)),
            jnp.asarray(np.asarray([out_len], np.int32)), out_pad, None,
            compute_dtype)
        code_emb2.block_until_ready()

        def run():
            x, _ = dst._diffusion_loop_jit(
                params, cfg, sched, code_emb2, noise, out_buckets,
                None, key, jnp.int32(0), jnp.int32(80), True,
                compute_dtype)
            # block_until_ready returns early over the axon tunnel; a tiny
            # device->host transfer is the only reliable barrier
            np.asarray(jnp.ravel(x)[:1])
            return x

        t0 = time.monotonic()
        run()  # compile
        print(f"{name:12s}: first run {time.monotonic() - t0:6.1f} s",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            run()
            ts.append(time.monotonic() - t0)
        dt = min(ts)
        print(f"{name:12s}: {dt:6.3f} s  ({dt/80*1e3:6.2f} ms/step)",
              flush=True)
    except Exception as e:
        print(f"{name:12s}: FAIL {type(e).__name__} {str(e)[:100]}",
              flush=True)
