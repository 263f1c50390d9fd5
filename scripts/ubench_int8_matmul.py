"""Is int8 x int8 -> int32 actually ~2x bf16 on the v5e MXU, at the
denoiser's matmul shapes — and does dynamic per-row activation
quantization eat the win?

Shapes: M = 2*2176 rows (CFG batch-2 at the bench's T), the three hot
K/N combos (qkv 1024->3072, proj/k1 1024->1024, k3-as-concat 3072->1024).

    python scripts/ubench_int8_matmul.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

M = 4352
SHAPES = [(1024, 3072), (1024, 1024), (3072, 1024)]
REPS = 30


def timeit(f, *args):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else None
    out = f(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    t0 = time.monotonic()
    for _ in range(REPS):
        out = f(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    return (time.monotonic() - t0) / REPS


@jax.jit
def mm_bf16(x, w):
    return jnp.matmul(x, w, preferred_element_type=jnp.float32
                      ).astype(jnp.bfloat16)


@jax.jit
def mm_int8w(x, wq, scale):
    # current pdot int8 path: weight streams int8, converts to bf16
    return (jnp.matmul(x, wq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
            * scale).astype(jnp.bfloat16)


@jax.jit
def mm_int8_full(x, wq, scale):
    # dynamic per-row activation quantization + int8 MXU matmul
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s_row = (jnp.maximum(absmax, 1e-12) / 127.0).astype(jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_row), -127,
                  127).astype(jnp.int8)
    acc = jnp.matmul(xq, wq, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * s_row * scale).astype(jnp.bfloat16)


@jax.jit
def mm_int8_preq(xq, s_row, wq, scale):
    # int8 matmul alone (activation already quantized)
    acc = jnp.matmul(xq, wq, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * s_row * scale).astype(jnp.bfloat16)


rng = np.random.default_rng(0)
for k, n in SHAPES:
    x = jnp.asarray(rng.normal(0, 1, (M, k)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.02, (k, n)), jnp.bfloat16)
    wf = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(wf).max(0, keepdims=True), 1e-12) / 127.0
    wq = jnp.asarray(np.clip(np.round(wf / scale), -127, 127), jnp.int8)
    scale = jnp.asarray(scale)

    flops = 2 * M * k * n
    t_bf16 = timeit(mm_bf16, x, w)
    t_int8w = timeit(mm_int8w, x, wq, scale)
    t_full = timeit(mm_int8_full, x, wq, scale)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s_row = (jnp.maximum(absmax, 1e-12) / 127.0).astype(jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_row), -127,
                  127).astype(jnp.int8)
    t_preq = timeit(mm_int8_preq, xq, s_row, wq, scale)

    def rep(name, t):
        print(f"  {name:10s} {t*1e6:8.1f} us  "
              f"{flops/t/1e12:6.1f} TFLOP/s", flush=True)

    print(f"(M={M}, K={k}, N={n})")
    rep("bf16", t_bf16)
    rep("int8w", t_int8w)
    rep("int8 full", t_full)
    rep("int8 preq", t_preq)
