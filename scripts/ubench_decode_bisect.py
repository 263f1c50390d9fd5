"""Bisect the AR decode step: add components to the bare matvec chain one
at a time and report ms/step. Run on the TPU:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ubench_decode_bisect.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tortoise_tpu.config import ARConfig
from tortoise_tpu.io.checkpoint import random_ar_params
from tortoise_tpu.models import ar
from tortoise_tpu.ops.basic import gelu, layer_norm
from tortoise_tpu.pipeline.ar_stage import cast_matmul_weights

STEPS = 64
CFG = ARConfig()


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, reps=3):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        _force(fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts) / STEPS * 1e3


def main():
    cfg = CFG
    params = cast_matmul_weights(random_ar_params(cfg, seed=0), jnp.bfloat16)
    blocks = params["blocks"]
    rng = np.random.default_rng(0)
    b = 1
    text_ids = jnp.asarray(rng.integers(0, 255, (b, 32)), jnp.int32)
    text_valid = jnp.ones((b, 32), bool)
    voice = jnp.asarray(rng.normal(0, .5, (1024,)), jnp.float32)
    _, cache = jax.jit(
        lambda p, ti, tv, v: ar.prefill(p, cfg, ti, tv, v, jnp.bfloat16)
    )(params, text_ids, text_valid, voice)
    h, dh = cfg.n_head, cfg.d_head
    cd = jnp.bfloat16

    def v1_body(x, blk):
        """matvecs + norms + residuals + gelu + biases, no attention."""
        y = layer_norm(x, blk["ln1_w"], blk["ln1_b"], cfg.ln_eps)
        qkv = jnp.matmul(y.astype(cd), blk["attn_w"],
                         preferred_element_type=jnp.float32) + blk["attn_b"]
        a = qkv[:, :1024]
        attn = jnp.matmul(a.astype(cd), blk["proj_w"],
                          preferred_element_type=jnp.float32) + blk["proj_b"]
        x = x + attn
        y = layer_norm(x, blk["ln2_w"], blk["ln2_b"], cfg.ln_eps)
        f = gelu(jnp.matmul(y.astype(cd), blk["fc_w"],
                            preferred_element_type=jnp.float32) + blk["fc_b"])
        o = jnp.matmul(f.astype(cd), blk["fc_proj_w"],
                       preferred_element_type=jnp.float32) + blk["fc_proj_b"]
        return x + o

    @jax.jit
    def v1(blocks, x0):
        def outer(i, x):
            x, _ = jax.lax.scan(lambda c, blk: (v1_body(c, blk), None),
                                x, blocks)
            return x * (1.0 / (1.0 + i))
        return jax.lax.fori_loop(0, STEPS, outer, x0)

    x0 = jnp.asarray(rng.normal(0, 1, (b, 1024)), jnp.float32)
    print(f"v1 +norms/res/gelu     : {timeit(v1, blocks, x0):7.2f} ms/step",
          flush=True)

    def v2_body(x, blk):
        """v1 + head reshape and merge, self-attention only (no cache)."""
        y = layer_norm(x, blk["ln1_w"], blk["ln1_b"], cfg.ln_eps)
        qkv = jnp.matmul(y.astype(cd), blk["attn_w"],
                         preferred_element_type=jnp.float32) + blk["attn_b"]
        qkv = qkv.reshape(b, 3, h, dh).transpose(1, 0, 2, 3)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jnp.sum(q * k, -1, keepdims=True) / 8.0     # (B, H, 1)
        ctx = jax.nn.sigmoid(s) * v                      # stand-in softmax
        merged = ctx.reshape(b, h * dh)
        attn = jnp.matmul(merged.astype(cd), blk["proj_w"],
                          preferred_element_type=jnp.float32) + blk["proj_b"]
        x = x + attn
        y = layer_norm(x, blk["ln2_w"], blk["ln2_b"], cfg.ln_eps)
        f = gelu(jnp.matmul(y.astype(cd), blk["fc_w"],
                            preferred_element_type=jnp.float32) + blk["fc_b"])
        o = jnp.matmul(f.astype(cd), blk["fc_proj_w"],
                       preferred_element_type=jnp.float32) + blk["fc_proj_b"]
        return x + o

    @jax.jit
    def v2(blocks, x0):
        def outer(i, x):
            x, _ = jax.lax.scan(lambda c, blk: (v2_body(c, blk), None),
                                x, blocks)
            return x * (1.0 / (1.0 + i))
        return jax.lax.fori_loop(0, STEPS, outer, x0)

    print(f"v2 +head reshape       : {timeit(v2, blocks, x0):7.2f} ms/step",
          flush=True)

    bias0 = jnp.where(cache.valid, 0.0, -1e30)[:, None, None, :]

    def v3_body(carry, xs):
        """v2 + full cache attention (read-only cache)."""
        x, bias = carry
        blk, k_l, v_l = xs
        y = layer_norm(x, blk["ln1_w"], blk["ln1_b"], cfg.ln_eps)
        qkv = jnp.matmul(y.astype(cd), blk["attn_w"],
                         preferred_element_type=jnp.float32) + blk["attn_b"]
        qkv = qkv.reshape(b, 3, h, dh).transpose(1, 0, 2, 3)
        q, k_new, v_new = qkv[0], qkv[1], qkv[2]
        q1 = q[:, :, None, :]                             # (B, H, 1, Dh)
        scores = jnp.matmul(q1.astype(cd), k_l.swapaxes(-1, -2),
                            preferred_element_type=jnp.float32) / 8.0
        self_s = jnp.sum(q * k_new, -1)[:, :, None, None] / 8.0
        scores = jnp.concatenate([scores + bias, self_s], -1)
        p = jax.nn.softmax(scores, -1)
        ctx = jnp.matmul(p[..., :-1].astype(cd), v_l,
                         preferred_element_type=jnp.float32) \
            + p[..., -1:] * v_new[:, :, None, :]
        merged = ctx[:, :, 0].reshape(b, h * dh)
        attn = jnp.matmul(merged.astype(cd), blk["proj_w"],
                          preferred_element_type=jnp.float32) + blk["proj_b"]
        x = x + attn
        y = layer_norm(x, blk["ln2_w"], blk["ln2_b"], cfg.ln_eps)
        f = gelu(jnp.matmul(y.astype(cd), blk["fc_w"],
                            preferred_element_type=jnp.float32) + blk["fc_b"])
        o = jnp.matmul(f.astype(cd), blk["fc_proj_w"],
                       preferred_element_type=jnp.float32) + blk["fc_proj_b"]
        return (x + o, bias), (k_new, v_new)

    @jax.jit
    def v3(blocks, k_c, v_c, x0):
        def outer(i, x):
            (x, _), _ = jax.lax.scan(v3_body, (x, bias0),
                                     (blocks, k_c, v_c))
            return x * (1.0 / (1.0 + i))
        return jax.lax.fori_loop(0, STEPS, outer, x0)

    print(f"v3 +cache attention    : "
          f"{timeit(v3, blocks, cache.k, cache.v, x0):7.2f} ms/step",
          flush=True)

    @jax.jit
    def v4(blocks, cache, x0):
        def outer(i, carry):
            x, cache = carry
            bias = jnp.where(cache.valid, 0.0, -1e30)[:, None, None, :]
            (x, _), (k_rows, v_rows) = jax.lax.scan(
                v3_body, (x, bias), (blocks, cache.k, cache.v))
            n = cache.length
            k = jax.lax.dynamic_update_slice(
                cache.k, k_rows[:, :, :, None, :].astype(cache.k.dtype),
                (0, 0, 0, n, 0))
            v = jax.lax.dynamic_update_slice(
                cache.v, v_rows[:, :, :, None, :].astype(cache.v.dtype),
                (0, 0, 0, n, 0))
            valid = cache.valid.at[:, n].set(True)
            return x * (1.0 / (1.0 + i)), type(cache)(k, v, valid, n + 1)
        x, _ = jax.lax.fori_loop(0, STEPS, outer, (x0, cache))
        return x

    print(f"v4 +cache DUS update   : "
          f"{timeit(v4, blocks, cache, x0):7.2f} ms/step", flush=True)

    @jax.jit
    def v5(params, cache, x0):
        blocks = params["blocks"]

        def outer(i, carry):
            x, cache = carry
            bias = jnp.where(cache.valid, 0.0, -1e30)[:, None, None, :]
            (x, _), (k_rows, v_rows) = jax.lax.scan(
                v3_body, (x, bias), (blocks, cache.k, cache.v))
            n = cache.length
            k = jax.lax.dynamic_update_slice(
                cache.k, k_rows[:, :, :, None, :].astype(cache.k.dtype),
                (0, 0, 0, n, 0))
            v = jax.lax.dynamic_update_slice(
                cache.v, v_rows[:, :, :, None, :].astype(cache.v.dtype),
                (0, 0, 0, n, 0))
            valid = cache.valid.at[:, n].set(True)
            hloc = layer_norm(x, params["ln_f_w"], params["ln_f_b"],
                              cfg.ln_eps)
            hloc = layer_norm(hloc, None, None, cfg.ln_eps)
            hloc = hloc * params["lm_ln_w"] + params["lm_ln_b"]
            logits = jnp.matmul(hloc.astype(cd), params["lm_w"].T,
                                preferred_element_type=jnp.float32) \
                + params["lm_b"]
            tokf = jnp.argmax(logits, -1).astype(jnp.float32)
            return x + 0.0 * tokf[:, None], type(cache)(k, v, valid, n + 1)
        x, _ = jax.lax.fori_loop(0, STEPS, outer, (x0, cache))
        return x

    print(f"v5 +lm head            : "
          f"{timeit(v5, params, cache, x0):7.2f} ms/step", flush=True)

    # the real decode_step for reference
    @jax.jit
    def real(params, cache):
        def body(i, carry):
            tok, cache = carry
            logits, cache = ar.decode_step(params, cfg, cache, tok, i, cd)
            return jnp.argmax(logits, -1).astype(jnp.int32), cache
        tok0 = jnp.full((b,), 5, jnp.int32)
        tok, _ = jax.lax.fori_loop(0, STEPS, body, (tok0, cache))
        return tok

    print(f"v6 real decode_step    : "
          f"{timeit(real, params, cache):7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
