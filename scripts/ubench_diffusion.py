"""Microbenchmark + profile of one production-shape denoiser eval.

Times the CFG (batch-2) denoise at T~2176 with flash on/off, then dumps
an aggregated per-op profile of the chosen variant.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ubench_diffusion.py
"""

import collections
import dataclasses
import glob
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from tortoise_tpu.config import DiffusionConfig
from tortoise_tpu.io.checkpoint import random_diffusion_params
from tortoise_tpu.models import diffusion as dmodel
from tortoise_tpu.ops.relpos import relative_position_buckets
from tortoise_tpu.pipeline.common import ensure_device

T = int(os.environ.get("UB_T", "2176"))
REPS = 5


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args):
    _force(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.monotonic()
        _force(fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts)


def profile_to_summary(fn, *args, outdir="/tmp/jaxtrace_diff"):
    os.system(f"rm -rf {outdir}")
    _force(fn(*args))
    with jax.profiler.trace(outdir):
        _force(fn(*args))
    path = glob.glob(outdir + "/plugins/profile/*/*.xplane.pb")[0]
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        tot = collections.Counter()
        cnt = collections.Counter()
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps
                cnt[name] += 1
        print(f"== {plane.name}")
        for name, d in tot.most_common(24):
            print(f"  {d/1e9:9.3f} ms x{cnt[name]:<5d} {name[:100]}",
                  flush=True)


def main():
    mode = os.environ.get("UB_MODE", "time")  # time | profile
    cfg0 = DiffusionConfig()
    params = ensure_device(random_diffusion_params(cfg0, seed=0))
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.normal(0, 1, (2, cfg0.n_mel, T)), jnp.float32)
    code2 = jnp.asarray(rng.normal(0, 0.5, (2, cfg0.d_model, T)),
                        jnp.float32)
    buckets = jnp.asarray(relative_position_buckets(
        T, cfg0.rel_pos_buckets, cfg0.rel_pos_max_distance))
    mask = jnp.ones((2, T), bool)

    fns = {}
    for flash in (False, True):
        cfg = dataclasses.replace(cfg0, use_flash=flash)

        @jax.jit
        def eval_fn(params, x2, code2, mask, cfg=cfg):
            return dmodel.denoise(params, cfg, x2, code2, jnp.int32(1234),
                                  buckets, mask, jnp.bfloat16)

        fns[flash] = eval_fn

    if mode == "time":
        for flash, fn in fns.items():
            dt = timeit(fn, params, x2, code2, mask)
            # per full CFG step (cond+uncond in the batch-2 eval)
            print(f"flash={flash}: {dt*1e3:8.2f} ms/CFG-step "
                  f"(x80 = {dt*80:6.2f} s)", flush=True)
        # no-mask variant: how much do the masked norms cost?
        cfg = dataclasses.replace(cfg0, use_flash=True)

        @jax.jit
        def eval_nomask(params, x2, code2):
            return dmodel.denoise(params, cfg, x2, code2, jnp.int32(1234),
                                  buckets, None, jnp.bfloat16)

        dt = timeit(eval_nomask, params, x2, code2)
        print(f"flash, no mask: {dt*1e3:8.2f} ms/CFG-step", flush=True)
    else:
        flash = os.environ.get("UB_FLASH", "1") == "1"
        profile_to_summary(fns[flash], params, x2, code2, mask)


if __name__ == "__main__":
    main()
