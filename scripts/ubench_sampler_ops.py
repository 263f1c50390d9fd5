"""Time sampler building blocks on-device: lax.top_k vs alternatives.

    python scripts/ubench_sampler_ops.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

V = 8194
K = 50
N = 256


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
    return min(ts)


def loop(stepfn):
    @jax.jit
    def run(x):
        def body(i, c):
            return c * 0.5 + stepfn(x + c) * 0.5

        return jax.lax.fori_loop(0, N, body, jnp.zeros_like(x[..., 0]))

    return run


rngn = np.random.default_rng(0)
x = jnp.asarray(rngn.normal(0, 3, (1, V)), jnp.float32)

# 1) full lax.top_k threshold
f_topk = loop(lambda x: jax.lax.top_k(x, K)[0][..., -1])
print(f"lax.top_k(8194,50) : {timeit(f_topk, x)/N*1e3:7.3f} ms", flush=True)

# 2) sort-based (what top_k may lower to)
f_sort = loop(lambda x: jnp.sort(x, axis=-1)[..., V - K])
print(f"full sort          : {timeit(f_sort, x)/N*1e3:7.3f} ms", flush=True)

# 3) iterative bisection on values: threshold t s.t. count(x >= t) >= K
#    and count(x > t) <= K-ish; 24 fixed iterations


def bisect_thresh(x):
    lo = jnp.min(x, axis=-1)
    hi = jnp.max(x, axis=-1)

    def body(i, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((x >= mid[..., None]).astype(jnp.int32), axis=-1)
        hi = jnp.where(cnt >= K, mid, hi)
        lo = jnp.where(cnt >= K, lo, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 24, body, (lo, hi))
    return hi


f_bis = loop(bisect_thresh)
print(f"bisect threshold   : {timeit(f_bis, x)/N*1e3:7.3f} ms", flush=True)

# 4) two-stage: per-block max prune then top_k on survivors? just measure
#    the full production filter for context
from tortoise_tpu.ops import sampling as S


def full_filter(x):
    probs, ids = S.process_logits_topk(x, jnp.zeros((1, 1), jnp.int32))
    return probs[..., 0]


f_full = loop(full_filter)
print(f"full topk filter   : {timeit(f_full, x)/N*1e3:7.3f} ms", flush=True)
