"""Bound the group-norm-chain cost in the denoiser: how much of a CFG
eval would a fused groupnorm(+FiLM+SiLU) Pallas kernel recover?

Measures one denoise eval (production shapes, bf16 + int8 + flash) in
three variants, interleaved best-of-N against slice drift:

  base      : the real eval
  gn-affine : group_norm_tc patched to affine-only (x*w+b, no statistics
              reductions) — removes the stat pass + its materialization
  gn-skip   : group_norm_tc patched to identity — also removes the
              affine elementwise

base - gn-affine bounds what a one-pass fused GN could save (it still
must read x once and write once); base - gn-skip is the absolute upper
bound for ALL groupnorm work. If base - gn-affine lands under ~0.5 ms a
dedicated kernel is not worth its complexity (decision note:
models/diffusion.py group_norm_tc already uses one-pass stats).

MEASURED (r3, real v5e, T=2304, bf16+flash, device-resident params):
base 40.30 ms/eval, gn-affine 40.93, gn-skip 40.02 — deltas are under
1 ms and inside the run-to-run noise of the ~27 ms per-dispatch tunnel
overhead (single-eval dispatch + 1-element readback; the staged
80-step loop amortizes this to ~13.6 ms/step compute). DECISION: no
fused GN Pallas kernel — XLA already fuses the one-pass-stats chain
into neighboring elementwise work; total GN cost is noise-level.

Usage: python scripts/ubench_gn.py [T] [reps]   (BENCH_SMALL=1 smoke)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    import tortoise_tpu.models.diffusion as dmodel
    from tortoise_tpu.config import DiffusionConfig, tiny_diffusion_config
    from tortoise_tpu.io.checkpoint import random_diffusion_params
    from tortoise_tpu.ops import basic
    from tortoise_tpu.ops.relpos import relative_position_buckets
    from tortoise_tpu.pipeline.diffusion_stage import (
        quantize_diffusion_weights,
    )

    small = os.environ.get("BENCH_SMALL") == "1"
    t = int(sys.argv[1]) if len(sys.argv) > 1 else (64 if small else 2304)
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    if small:
        cfg = tiny_diffusion_config()
    else:
        cfg = DiffusionConfig()
    on_tpu = jax.default_backend() == "tpu"
    import dataclasses

    cfg = dataclasses.replace(cfg, use_flash=on_tpu)
    # device_put ONCE: the quantizer returns host numpy trees, and a jit
    # call with host operands re-uploads the whole tree every dispatch —
    # over the shared tunnel that is ~5 s/eval of pure transfer, burying
    # the ~14 ms compute signal this script exists to split
    params = jax.device_put(quantize_diffusion_weights(
        random_diffusion_params(cfg, seed=0, fast=True)))

    rng = np.random.default_rng(0)
    b = 2  # CFG batch
    x = jnp.asarray(rng.normal(0, 1, (b, cfg.n_mel, t)), jnp.float32)
    code = jnp.asarray(rng.normal(0, 0.5, (b, cfg.d_model, t)), jnp.float32)
    buckets = jnp.asarray(relative_position_buckets(
        t, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))

    real_gn = dmodel.group_norm_tc

    def gn_affine(xx, n_groups, w=None, bb=None, eps=1e-5, mask=None,
                  fast=False):
        out = xx
        if w is not None:
            out = out * w
        if bb is not None:
            out = out + bb
        return out

    def gn_skip(xx, n_groups, w=None, bb=None, eps=1e-5, mask=None,
                fast=False):
        return xx

    def make_eval(gn):
        dmodel.group_norm_tc = gn

        @jax.jit
        def ev(params, x, code):
            return dmodel.denoise(params, cfg, x, code, jnp.int32(1234),
                                  buckets, compute_dtype=jnp.bfloat16)

        out = ev(params, x, code)  # trace+compile NOW with this gn
        np.asarray(jnp.ravel(out)[:1])
        dmodel.group_norm_tc = real_gn
        return ev

    evals = {name: make_eval(gn) for name, gn in
             (("base     ", real_gn), ("gn-affine", gn_affine),
              ("gn-skip  ", gn_skip))}
    times = {n: [] for n in evals}
    for _ in range(reps):
        for name, ev in evals.items():
            t0 = time.monotonic()
            out = ev(params, x, code)
            np.asarray(jnp.ravel(out)[:1])
            times[name].append(time.monotonic() - t0)
    base = min(times["base     "])
    for name in evals:
        dt = min(times[name])
        print(f"{name}: {dt * 1e3:8.2f} ms/eval   "
              f"delta vs base {((base - dt) * 1e3):+7.2f} ms")


if __name__ == "__main__":
    main()
