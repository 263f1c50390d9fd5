"""Device-time sweep of the packed flash kernel (production diffusion path).

Wraps N calls in one jitted scan (dispatch-free), reads custom-call device
time from the profiler trace.

    python scripts/ubench_packed_kernel.py
"""

import collections
import glob
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from tortoise_tpu.ops.pallas.flash_attention import flash_attention_packed

B, H, T, D = 2, 16, 2176, 64
N = 10


def make_loop(bq, use_mask, hpp=2):
    @jax.jit
    def loop(qkv, mask, table):
        def body(c, _):
            out = flash_attention_packed(c, H, mask, bias_table=table,
                                         bq=bq, hpp=hpp)
            # feed back so the scan can't hoist the call
            nxt = jnp.concatenate([out, out, out], axis=-1) * 0.5 + c * 0.5
            return nxt, None

        c, _ = jax.lax.scan(body, qkv, None, length=N)
        return c

    return loop


def device_profile(fn, *args, outdir):
    os.system(f"rm -rf {outdir}")
    out = fn(*args)
    np.asarray(jnp.ravel(out)[:1])
    with jax.profiler.trace(outdir):
        out = fn(*args)
        np.asarray(jnp.ravel(out)[:1])
    path = glob.glob(outdir + "/plugins/profile/*/*.xplane.pb")[0]
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    tot = collections.Counter()
    cnt = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps
                cnt[name] += 1
    flash = [(n, d, cnt[n]) for n, d in tot.items() if "flash" in n]
    return sum(d for _, d, _ in flash) / 1e9, sum(c for _, _, c in flash)


def make_producer_loop(bq):
    """Mimic the in-context call: qkv comes from the fused matmul + bias
    each iteration, the output feeds the next layer's matmul — the exact
    dataflow of the denoiser's attention site."""
    @jax.jit
    def loop(x, w3, bias, table):
        def body(c, _):
            qkv = jnp.matmul(c, w3, preferred_element_type=jnp.float32)
            qkv = (qkv + bias).astype(c.dtype)
            out = flash_attention_packed(qkv, H, None, bias_table=table,
                                         bq=bq)
            return c * 0.5 + out * 0.5, None

        c, _ = jax.lax.scan(body, x, None, length=N)
        return c

    return loop


def make_scanned_producer_loop(bq):
    """Like the producer loop, but the qkv weights are a scanned (N, C, 3C)
    stack streamed from HBM per iteration — the real denoiser's weight
    prefetch pattern. Isolates DMA contention with the kernel."""
    @jax.jit
    def loop(x, w3s, bias, table):
        def body(c, w3):
            qkv = jnp.matmul(c, w3, preferred_element_type=jnp.bfloat16)
            qkv = qkv + bias.astype(qkv.dtype)
            out = flash_attention_packed(qkv, H, None, bias_table=table,
                                         bq=bq)
            return c * 0.5 + out * 0.5, None

        c, _ = jax.lax.scan(body, x, w3s)
        return c

    return loop


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(0, 1, (B, T, 3 * H * D)), jnp.bfloat16)
    table = jnp.asarray(rng.normal(0, 0.1, (32, H)), jnp.float32)
    mask = jnp.ones((B, T), bool)

    x = jnp.asarray(rng.normal(0, 1, (B, T, H * D)), jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(0, 0.03, (H * D, 3 * H * D)), jnp.bfloat16)
    bias3 = jnp.asarray(rng.normal(0, 0.1, (3 * H * D,)), jnp.float32)
    w3s = jnp.asarray(
        rng.normal(0, 0.03, (N, H * D, 3 * H * D)), jnp.bfloat16)
    for bq in (128, 256):
        fn = make_scanned_producer_loop(bq)
        try:
            ms, calls = device_profile(fn, x, w3s, bias3, table,
                                       outdir=f"/tmp/jt_packed_sp_{bq}")
            print(f"scanned-w producer bq={bq}: {ms/max(calls,1):7.3f} "
                  f"ms/call ({calls} calls)", flush=True)
        except Exception as e:
            print(f"scanned-w producer bq={bq}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)
    for bq in (128, 256):
        fn = make_producer_loop(bq)
        try:
            ms, calls = device_profile(fn, x, w3, bias3, table,
                                       outdir=f"/tmp/jt_packed_prod_{bq}")
            print(f"producer bq={bq}: {ms/max(calls,1):7.3f} ms/call "
                  f"({calls} calls)", flush=True)
        except Exception as e:
            print(f"producer bq={bq}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)

    for bq in (128, 256, 512):
        # the double-buffered score scratch alone is 2*bq*(Tp+2*bq)*4 B;
        # skip configs where it can't fit the 16 MB VMEM ceiling so a
        # FAIL row always means a regression, not a known-impossible size
        tp = -(-T // bq) * bq
        scratch_mb = 2 * bq * (tp + 2 * bq) * 4 / 2**20
        if scratch_mb > 15:
            print(f"packed bq={bq}: SKIP (score scratch {scratch_mb:.1f} "
                  f"MB alone exceeds VMEM)", flush=True)
            continue
        for use_mask in (True, False):
            for hpp in (2, 4):
                fn = make_loop(bq, use_mask, hpp)
                try:
                    ms, calls = device_profile(
                        fn, qkv, mask if use_mask else None, table,
                        outdir=f"/tmp/jt_packed_{bq}_{use_mask}_{hpp}")
                    print(f"packed bq={bq} mask={use_mask} hpp={hpp}: "
                          f"{ms/max(calls,1):7.3f} ms/call ({calls} calls)",
                          flush=True)
                except Exception as e:
                    print(f"packed bq={bq} mask={use_mask} hpp={hpp}: FAIL "
                          f"{type(e).__name__} {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
