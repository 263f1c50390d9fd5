"""A/B microbenchmark for the fused decode head + in-kernel sampler.

The shared dev slice swings +-50% between processes, so this interleaves
all variants in ONE process and reports per-variant minima:

  head-xla    : decode loop, trunk kernel + XLA double-LN/lm-head chain
  head-fused  : decode loop, head folded into the kernel's last grid step
  samp-xla    : full sampling loop (_generate_jit body) with the XLA
                penalty/top-k/nucleus chain
  samp-fused  : the same loop with the whole sampler inside the kernel

Usage: python scripts/ubench_fused_step.py [steps] [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from tortoise_tpu.config import ARConfig
    from tortoise_tpu.io.checkpoint import random_ar_params
    from tortoise_tpu.models import ar
    from tortoise_tpu.ops import sampling as S
    from tortoise_tpu.pipeline.ar_stage import cast_matmul_weights

    from tortoise_tpu.pipeline.ar_stage import size_cache

    cfg = size_cache(ARConfig(), 32)  # cache 640, as the driver sizes it
    params = cast_matmul_weights(random_ar_params(cfg, seed=0, fast=True),
                                 jnp.bfloat16, int8=True)
    # a twin tree WITHOUT the head pack: decode_step/_generate_jit fall
    # back to the XLA head + sampler planes
    params_xla = {k: v for k, v in params.items() if k != "head_pack"}

    rng = np.random.default_rng(0)
    text_ids = jnp.asarray(rng.integers(0, 255, (batch, 32)), jnp.int32)
    text_valid = jnp.ones((batch, 32), bool)
    voice = jnp.asarray(
        np.broadcast_to(rng.normal(0, .5, (1024,)), (batch, 1024)),
        jnp.float32)
    logits0, cache = jax.jit(
        lambda p, ti, tv, v: ar.prefill(p, cfg, ti, tv, v, jnp.bfloat16)
    )(params, text_ids, text_valid, voice)

    @jax.jit
    def decode_loop(params, cache):
        def body(i, carry):
            tok, cache = carry
            logits, cache = ar.decode_step(params, cfg, cache, tok, i,
                                           jnp.bfloat16)
            return jnp.argmax(logits, -1).astype(jnp.int32), cache

        tok0 = jnp.full((batch,), 5, jnp.int32)
        return jax.lax.fori_loop(0, steps, body, (tok0, cache))[0]

    @jax.jit
    def sample_loop(params, cache, key):
        fused = ar.can_fuse_sampling(params, cfg, jnp.bfloat16, batch)

        def body(i, carry):
            tok, cache, key = carry
            key, k = jax.random.split(key)
            if fused:
                u = jax.random.uniform(k, (batch, 1), jnp.float32)
                tok, cache = ar.decode_sample_step(params, cfg, cache, tok,
                                                   i, u, jnp.bfloat16)
            else:
                logits, cache = ar.decode_step(params, cfg, cache, tok, i,
                                               jnp.bfloat16)
                probs, ids = S.process_logits_topk(logits, tok[:, None])
                tok = S.sample_from_topk(k, probs, ids)
            return tok, cache, key

        tok0 = jnp.full((batch,), 5, jnp.int32)
        return jax.lax.fori_loop(0, steps, body,
                                 (tok0, cache, key))[0]

    key = jax.random.PRNGKey(0)
    variants = {
        "head-xla  ": lambda: decode_loop(params_xla, cache),
        "head-fused": lambda: decode_loop(params, cache),
        "samp-xla  ": lambda: sample_loop(params_xla, cache, key),
        "samp-fused": lambda: sample_loop(params, cache, key),
    }
    for name, fn in variants.items():  # compile
        _force(fn())
    times = {name: [] for name in variants}
    for _ in range(5):  # interleave reps against slice drift
        for name, fn in variants.items():
            t0 = time.monotonic()
            _force(fn())
            times[name].append(time.monotonic() - t0)
    for name in variants:
        dt = min(times[name])
        print(f"{name}: {dt/steps*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
