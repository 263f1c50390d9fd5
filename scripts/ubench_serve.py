"""Load test for the dynamic-batching server (tortoise_tpu/serve.py).

Submits N requests with Poisson arrivals to a SynthesisServer running
production-size random weights on the available accelerator and reports
end-to-end latency percentiles, batch-size distribution, and aggregate
RTF (total audio seconds / wall seconds).

Usage:
    python scripts/ubench_serve.py [n_requests] [arrival_rate_per_s]
                                   [max_batch] [max_wait_ms]

A warmup pass per B-bucket absorbs compiles before the timed window (the
first request of an unseen bucket otherwise pays a multi-minute remote
Mosaic compile and poisons the percentiles).
"""

import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()


def main():
    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    max_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    max_wait_ms = float(sys.argv[4]) if len(sys.argv) > 4 else 100.0

    import os

    import jax.numpy as jnp

    from tortoise_tpu import serve
    from tortoise_tpu.pipeline.synthesize import TortoiseModels

    small = os.environ.get("BENCH_SMALL") == "1"
    models = TortoiseModels.random(
        seed=0, tiny=small,
        cache_dir=None if small else "/tmp/tortoise_bench_weights")
    if small:
        import dataclasses

        models.ar_cfg = dataclasses.replace(
            models.ar_cfg, max_decode_steps=8, pad_mel_length=8)
        models.diffusion_cfg = dataclasses.replace(
            models.diffusion_cfg, n_sample_timesteps=4)
    rng = np.random.default_rng(0)
    voice = rng.normal(0, 0.5, (models.ar_cfg.d_model,)).astype(np.float32)

    server = serve.SynthesisServer(
        models, compute_dtype=jnp.bfloat16, int8_weights=True,
        max_batch=max_batch, max_wait_ms=max_wait_ms, default_voice=voice)
    server.start()

    start_tok = min(255, models.ar_cfg.n_text_vocab - 1)

    def toks():
        return [start_tok] + rng.integers(
            3, models.ar_cfg.n_text_vocab,
            size=int(rng.integers(16, 30))).tolist() + [0]

    # warmup: one compile per bucket size <= max_batch so the timed
    # window sees no compiles
    server.warmup(text_len=28)
    print("warmup done; starting timed window", flush=True)
    base = dict(server.stats())

    lat = []
    lat_lock = threading.Lock()
    audio_s = [0.0]
    # pre-generate per-request tokens on the main thread (np.random
    # Generators are not thread-safe; concurrent draws would corrupt the
    # request mix and break seed reproducibility)
    request_tokens = [toks() for _ in range(n_requests)]

    def client(i, delay):
        time.sleep(delay)
        t0 = time.monotonic()
        r = server.submit(tokens=request_tokens[i], seed=i).result()
        dt = time.monotonic() - t0
        with lat_lock:
            lat.append(dt)
            audio_s[0] += len(r.audio) / r.sample_rate

    delays = np.cumsum(rng.exponential(1.0 / rate, n_requests))
    t0 = time.monotonic()
    threads = [threading.Thread(target=client, args=(i, d))
               for i, d in enumerate(delays)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    server.stop()

    st = server.stats()
    batches = st["batches"] - base["batches"]
    rows = st["rows"] - base["rows"]
    padded = st["padded_rows"] - base["padded_rows"]
    lat = np.sort(lat)
    print(f"requests={n_requests} arrival={rate}/s wall={wall:.1f}s "
          f"audio={audio_s[0]:.1f}s")
    print(f"aggregate_rtf={wall / max(audio_s[0], 1e-9):.4f}")
    print(f"latency p50={np.percentile(lat, 50):.2f}s "
          f"p90={np.percentile(lat, 90):.2f}s "
          f"p99={np.percentile(lat, 99):.2f}s max={lat[-1]:.2f}s")
    print(f"batches={batches} mean_rows={rows / max(batches, 1):.2f} "
          f"padded_rows={padded}")


if __name__ == "__main__":
    main()
