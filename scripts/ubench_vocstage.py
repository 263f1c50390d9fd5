"""Instrument the bench-context vocoder stage: where do the 0.34 s go?

    python scripts/ubench_vocstage.py
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from tortoise_tpu.config import VocoderConfig
from tortoise_tpu.io.checkpoint import random_vocoder_params
from tortoise_tpu.pipeline import vocoder_stage as vst
from tortoise_tpu.pipeline.common import ensure_device, round_up

cfg = dataclasses.replace(VocoderConfig(), use_pallas_lvc=False)
params = ensure_device(random_vocoder_params(cfg, seed=0))
rng = np.random.default_rng(0)
M = 2176
mel = rng.normal(-0.3, 0.4, (cfg.n_mel, M)).astype(np.float32)


def run(seed):
    ts = {}
    t0 = time.monotonic()
    p = ensure_device(params)
    ts["ensure_device"] = time.monotonic() - t0

    t0 = time.monotonic()
    total = M + cfg.mel_pad_frames
    pad_total = round_up(total, vst.MEL_BUCKET)
    mel_in = np.zeros((1, cfg.n_mel, pad_total), np.float32)
    mel_in[0, :, :M] = vst.denormalize_tacotron_mel(mel)
    mel_in[0, :, M:total] = -11.5129
    ts["host_prep"] = time.monotonic() - t0

    t0 = time.monotonic()
    key = jax.random.PRNGKey(seed)
    noise = jax.random.normal(key, (1, cfg.noise_ch, pad_total))
    mel_dev = jnp.asarray(mel_in)
    mel_dev.block_until_ready()
    ts["upload"] = time.monotonic() - t0

    t0 = time.monotonic()
    audio = vst._vocoder_jit(p, cfg, mel_dev, noise, jnp.int32(total),
                             jnp.bfloat16)
    np.asarray(jnp.ravel(audio)[:1])
    ts["compute"] = time.monotonic() - t0

    t0 = time.monotonic()
    a = np.asarray(audio)
    ts["download"] = time.monotonic() - t0
    ts["total"] = sum(ts.values())
    print({k: round(v, 4) for k, v in ts.items()}, flush=True)
    return a


run(0)
for i in range(4):
    run(1 + i)
