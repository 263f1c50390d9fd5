"""Microbenchmark + per-op profile of the production-shape vocoder pass.

    python scripts/ubench_vocoder.py           # timing
    UB_MODE=profile python scripts/ubench_vocoder.py
"""

import dataclasses
import os
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
from tortoise_tpu.models import vocoder as vmodel
from tortoise_tpu.pipeline.common import ensure_device

T = int(os.environ.get("UB_T", "2208"))  # mel frames + 10 pad, bucketed


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, reps=5):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        _force(fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    cfg0 = VocoderConfig()
    params = ensure_device(random_vocoder_params(cfg0, seed=0))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(-6, 2, (1, cfg0.n_mel, T)), jnp.float32)
    noise = jnp.asarray(rng.normal(0, 1, (1, cfg0.noise_ch, T)), jnp.float32)

    fns = {}
    for pallas in (False, True):
        cfg = dataclasses.replace(cfg0, use_pallas_lvc=pallas)

        @jax.jit
        def f(params, mel, noise, cfg=cfg):
            return vmodel.vocoder_forward(params, cfg, mel, noise,
                                          jnp.int32(T), jnp.bfloat16)

        fns[pallas] = f

    if os.environ.get("UB_MODE") == "profile":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from ubench_diffusion import profile_to_summary

        profile_to_summary(fns[True], params, mel, noise,
                           outdir="/tmp/jaxtrace_voc")
    else:
        for pallas, f in fns.items():
            dt = timeit(f, params, mel, noise)
            print(f"pallas_lvc={pallas}: {dt*1e3:8.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
