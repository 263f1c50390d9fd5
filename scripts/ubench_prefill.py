"""Wall-time A/B of the AR prefill + latent passes: flash vs XLA scores.

The latent pass re-runs the full [latent | text | 502 mel] sequence
(S ~= 535 at the bench's 26-token prompt; up to ~908 at max text) through
the 30-layer trunk; the XLA form materializes (B, H, S, S) f32 score
blocks per scanned layer. This ubench times both planes at serving batch
sizes on the real chip.

    python scripts/ubench_prefill.py
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from tortoise_tpu.config import ARConfig
from tortoise_tpu.io.checkpoint import random_ar_params
from tortoise_tpu.pipeline.ar_stage import (
    _latents_jit,
    _prefill_jit,
    cast_matmul_weights,
    pick_bucket,
    size_cache,
)


from tortoise_tpu.pipeline.common import device_barrier


def _sync(out):
    # block_until_ready can return early over the remote-TPU tunnel
    # (project gotcha); a 1-element device->host read is the barrier
    device_barrier(jax.tree.leaves(out)[0])


def timed(fn, *args, reps=10, **kw):
    """Enqueue `reps` dispatches and barrier once: a per-call barrier
    measures the ~25 ms tunnel RTT, not the device."""
    _sync(fn(*args, **kw))
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        for _ in range(reps):
            out = fn(*args, **kw)
        _sync(out)
        best = min(best, (time.monotonic() - t0) / reps)
    return best


def main():
    cfg0 = ARConfig()
    params = cast_matmul_weights(
        random_ar_params(cfg0, seed=0, fast=True), jnp.bfloat16, int8=True)
    rng = np.random.default_rng(0)
    n_text = int(sys.argv[2]) if len(sys.argv) > 2 else 26
    bucket = pick_bucket(n_text)
    cfg0 = size_cache(cfg0, bucket)
    cd = jnp.bfloat16

    bs = tuple(int(s) for s in sys.argv[1].split(",")) \
        if len(sys.argv) > 1 else (1, 4, 16)
    for b in bs:
        text = np.zeros((b, bucket), np.int32)
        text[:, :n_text] = rng.integers(3, 255, (b, n_text))
        valid = np.zeros((b, bucket), bool)
        valid[:, :n_text] = True
        voice = rng.normal(0, 0.5, (b, 1024)).astype(np.float32)
        mel = rng.integers(0, 8192, (b, 502)).astype(np.int32)
        targs = (jnp.asarray(text), jnp.asarray(valid))
        va = jnp.asarray(voice)
        ma = jnp.asarray(mel)
        for flash in (False, True):
            # min_score=0 forces the flash rows onto the flash plane at
            # every (B, S); the default gate (flash_prefill_min_score)
            # would silently run the XLA plane for small B*S^2 and the
            # A/B would compare identical programs
            cfg = dataclasses.replace(cfg0, flash_prefill=flash,
                                      flash_prefill_min_score=0)
            tag = "flash" if flash else "xla  "
            try:
                tp = timed(_prefill_jit, params, cfg, *targs, va, cd)
                tl = timed(_latents_jit, params, cfg, *targs, ma, va, cd)
                print(f"B={b:2d} {tag}: prefill {tp*1e3:8.2f} ms   "
                      f"latent {tl*1e3:8.2f} ms", flush=True)
            except Exception as e:
                print(f"B={b:2d} {tag}: FAIL {type(e).__name__} "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
