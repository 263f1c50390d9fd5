"""Device-time comparison of flash-attention kernel configs.

Wraps N calls of each config in one jitted scan so dispatch overhead
doesn't pollute the numbers, then reads the custom-call durations from a
profiler trace.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ubench_flash_kernel.py
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

from tortoise_tpu.ops.pallas.flash_attention import flash_attention

B, H, T, D = 2, 16, 2176, 64
N = 10


def make_loop(**kw):
    @jax.jit
    def loop(q, k, v, mask, table):
        def body(c, _):
            out = flash_attention(c, k, v, None, mask,
                                  bias_table=table,
                                  bias_formula=table is not None, **kw)
            return out.astype(c.dtype) * 0.5 + c * 0.5, None

        c, _ = jax.lax.scan(body, q, None, length=N)
        return c

    return loop


def make_loop_producer(fresh="qkv", **kw):
    """Mimic the in-context call: q/k/v come from a fused qkv matmul +
    reshape/transpose each iteration, like models/diffusion._attention.
    fresh="q": only q is produced in-loop, k/v are loop-invariant."""
    @jax.jit
    def loop(x, w, k0, v0, mask, table):
        b, t, c = x.shape
        h, dh = H, D

        def body(x, _):
            qkv = jnp.matmul(x, w, preferred_element_type=jnp.float32)
            qkv = qkv.astype(x.dtype).reshape(b, t, h, 3, dh)
            q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)
            if fresh == "qkv":
                k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
                v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)
            else:
                k, v = k0, v0
            out = flash_attention(q, k, v, None, mask, bias_table=table,
                                  bias_formula=True, **kw)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
            return x * 0.5 + out.astype(x.dtype) * 0.5, None

        x, _ = jax.lax.scan(body, x, None, length=N)
        return x

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


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, H, T, D)), jnp.bfloat16)
    table = jnp.asarray(rng.normal(0, 0.1, (32, H)), jnp.float32)
    mask = jnp.ones((B, T), bool)

    xw = jnp.asarray(rng.normal(0, 1, (B, T, H * D)), jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(0, 0.03, (H * D, 3 * H * D)), jnp.bfloat16)
    for fresh in ("qkv", "q"):
        fnp = make_loop_producer(fresh=fresh, bq=128, bk=128)
        ms, calls = device_profile(fnp, xw, w3, k, v, mask, table,
                                   outdir=f"/tmp/jt_producer_{fresh}")
        print(f"producer fresh={fresh}: {ms/max(calls,1):7.3f} ms/call "
              f"({calls} calls)", flush=True)

    for label, kw, use_table, use_mask in (
        ("bias+mask bq128", dict(bq=128, bk=128), True, True),
        ("bias+mask bq256", dict(bq=256, bk=256), True, True),
        ("mask only bq128", dict(bq=128, bk=128), False, True),
        ("plain     bq128", dict(bq=128, bk=128), False, False),
        ("plain     bq256", dict(bq=256, bk=256), False, False),
    ):
        fn = make_loop(**kw)
        try:
            ms, calls = device_profile(
                fn, q, k, v, mask if use_mask else None,
                table if use_table else None,
                outdir=f"/tmp/jt_{label.replace(' ', '_')}")
            print(f"{label}: {ms/max(calls,1)*1e0:7.3f} ms/call "
                  f"({calls} calls)", flush=True)
        except Exception as e:
            print(f"{label}: FAIL {type(e).__name__} {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
