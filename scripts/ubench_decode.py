"""Microbenchmark: where does an AR decode step spend its time?

Times fully on-device fori_loops (per-dispatch RPC over the tunnel is
~150 ms, so host-stepped timing is meaningless here):

- decode:   the production ar.decode_step loop (B=1, bf16 weights)
- wstream:  chained matvecs over the same stacked weights only — the
            weight-streaming floor for the current XLA lowering
- cacheatt: attention over the (L, 1, H, C, Dh) cache only
- all three at a second batch size to see amortization

Usage: python scripts/ubench_decode.py [steps]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()


def _force(out):
    # block_until_ready can return early over the axon tunnel; a tiny
    # device->host transfer is the only reliable completion barrier
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, reps=3):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        _force(fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from tortoise_tpu.config import ARConfig
    from tortoise_tpu.io.checkpoint import random_ar_params
    from tortoise_tpu.models import ar
    from tortoise_tpu.pipeline.ar_stage import cast_matmul_weights

    cfg = ARConfig()
    int8 = os.environ.get("AR_INT8") == "1"
    params = cast_matmul_weights(random_ar_params(cfg, seed=0),
                                 jnp.bfloat16, int8=int8)
    blocks = params["blocks"]
    nbytes = sum(np.prod(v.shape) * v.dtype.itemsize
                 for v in jax.tree.leaves(params))
    print(f"param bytes: {nbytes/1e6:.0f} MB (int8={int8})", flush=True)

    for b in (1, 4):
        rng = np.random.default_rng(0)

        # --- full decode loop ---
        text_ids = jnp.asarray(rng.integers(0, 255, (b, 32)), jnp.int32)
        text_valid = jnp.ones((b, 32), bool)
        voice = jnp.asarray(rng.normal(0, .5, (1024,)), jnp.float32)
        _, cache = jax.jit(
            lambda p, ti, tv, v: ar.prefill(p, cfg, ti, tv, v, jnp.bfloat16)
        )(params, text_ids, text_valid, voice)

        @jax.jit
        def decode_loop(params, cache):
            def body(i, carry):
                tok, cache = carry
                logits, cache = ar.decode_step(params, cfg, cache, tok, i,
                                               jnp.bfloat16)
                return jnp.argmax(logits, -1).astype(jnp.int32), cache

            tok0 = jnp.full((cache.k.shape[1],), 5, jnp.int32)
            tok, cache = jax.lax.fori_loop(0, steps, body, (tok0, cache))
            return tok

        dt = timeit(decode_loop, params, cache)
        print(f"B={b} decode   : {dt/steps*1e3:7.2f} ms/step "
              f"({nbytes/ (dt/steps) / 1e9:6.1f} GB/s if weight-bound)",
              flush=True)

        # --- weight streaming only: chained matvecs through the same
        #     stacked block weights (no attention, no cache) ---
        from tortoise_tpu.ops.basic import pdot

        @jax.jit
        def wstream(blocks, x):
            def body(i, x):
                def layer(h, blk):
                    a = pdot(h, blk["attn_w"], jnp.bfloat16)
                    h1 = a[:, :1024].astype(jnp.bfloat16)
                    p = pdot(h1, blk["proj_w"], jnp.bfloat16)
                    f = pdot(p.astype(jnp.bfloat16), blk["fc_w"],
                             jnp.bfloat16)
                    o = pdot(f.astype(jnp.bfloat16), blk["fc_proj_w"],
                             jnp.bfloat16)
                    return o.astype(jnp.bfloat16), None

                x, _ = jax.lax.scan(layer, x, blocks)
                return x * (1.0 / (1.0 + i)).astype(x.dtype)

            return jax.lax.fori_loop(0, steps, body, x)

        wb = sum(
            sum(np.prod(l.shape) * l.dtype.itemsize
                for l in jax.tree.leaves(blocks[k]))
            for k in ("attn_w", "proj_w", "fc_w", "fc_proj_w"))

        x0 = jnp.asarray(rng.normal(0, 1, (b, 1024)), jnp.bfloat16)
        dt = timeit(wstream, blocks, x0)
        print(f"B={b} wstream  : {dt/steps*1e3:7.2f} ms/step "
              f"({wb/(dt/steps)/1e9:6.1f} GB/s)", flush=True)

        # --- cache attention only ---
        k_c = cache.k
        v_c = cache.v

        @jax.jit
        def cacheatt(k_c, v_c, q0):
            h_, dh = 16, 64

            def body(i, q):
                def layer(q, kv):
                    k_l, v_l = kv                      # (B, C, H*Dh)
                    k4 = k_l.reshape(k_l.shape[0], -1, h_, dh)
                    v4 = v_l.reshape(v_l.shape[0], -1, h_, dh)
                    s = jnp.einsum("bhd,bchd->bhc", q, k4,
                                   preferred_element_type=jnp.float32)
                    p = jax.nn.softmax(s, axis=-1)
                    o = jnp.einsum("bhc,bchd->bhd", p.astype(v4.dtype), v4,
                                   preferred_element_type=jnp.float32)
                    return o.astype(q.dtype), None

                q, _ = jax.lax.scan(layer, q, (k_c, v_c))
                return q

            return jax.lax.fori_loop(0, steps, body, q0)

        q0 = jnp.asarray(rng.normal(0, 1, (b, 16, 64)), jnp.bfloat16)
        cb = (np.prod(k_c.shape) + np.prod(v_c.shape)) * 2
        dt = timeit(cacheatt, k_c, v_c, q0)
        print(f"B={b} cacheatt : {dt/steps*1e3:7.2f} ms/step "
              f"({cb/(dt/steps)/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()


def bench_sampler_paths():
    """Isolate the sampling cost: the bench loop (_generate_jit) runs at
    ~55 ms/step while bare decode is ~12 — find the difference."""
    import jax
    import jax.numpy as jnp

    from tortoise_tpu.config import ARConfig
    from tortoise_tpu.io.checkpoint import random_ar_params
    from tortoise_tpu.models import ar
    from tortoise_tpu.ops import sampling as S
    from tortoise_tpu.pipeline.ar_stage import (
        _generate_jit,
        _prefill_jit,
        cast_matmul_weights,
    )

    steps = 64
    cfg = ARConfig(max_decode_steps=steps)
    params = cast_matmul_weights(random_ar_params(cfg, seed=0), jnp.bfloat16)
    b = 1
    rng = np.random.default_rng(0)
    text_ids = jnp.asarray(rng.integers(0, 255, (b, 32)), jnp.int32)
    text_valid = jnp.ones((b, 32), bool)
    voice = jnp.asarray(rng.normal(0, .5, (1024,)), jnp.float32)
    logits, cache = _prefill_jit(params, cfg, text_ids, text_valid, voice,
                                 jnp.bfloat16)
    first_ids = jnp.full((b, 34), 1, jnp.int32)

    def gen(params, logits, first_ids, cache, key):
        # _generate_jit donates the cache; hand it a fresh copy per call
        cache = type(cache)(cache.k + 0, cache.v + 0, cache.valid,
                            cache.length)
        return _generate_jit(params, cfg, logits, first_ids, cache, key,
                             steps, jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    dt = timeit(gen, params, logits, first_ids, cache, key)
    print(f"generate_jit : {dt/steps*1e3:7.2f} ms/step", flush=True)

    # sampler alone, chained through penalty ids
    @jax.jit
    def sample_loop(logits, key):
        def body(i, carry):
            tok, key = carry
            key, k = jax.random.split(key)
            probs, ids = S.process_logits_topk(logits, tok[:, None])
            tok = S.sample_from_topk(k, probs, ids)
            return tok, key

        tok = jnp.full((logits.shape[0],), 5, jnp.int32)
        return jax.lax.fori_loop(0, steps, body, (tok, key))[0]

    dt = timeit(sample_loop, logits, key)
    print(f"sampler only : {dt/steps*1e3:7.2f} ms/step", flush=True)


if __name__ == "__main__" and os.environ.get("UBENCH_SAMPLER") == "1":
    bench_sampler_paths()
