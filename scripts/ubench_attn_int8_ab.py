"""A/B: int8-MXU attention scores in the packed flash kernel — the r4
negative result recorded in ARCHITECTURE.md.

Self-contained: carries the int8 variant of _attn_kernel_packed that was
built and reverted in r4 (q/k per-head absmax int8, k/v cached in int8
VMEM scratch across query blocks, probabilities requantized to 1/127
fixed-point for P@V), and profiles custom-call device time against the
production bf16 kernel at the denoiser shape.

r4 numbers (B=2, H=16, T=2176, D=64): bf16 hpp=4 0.329 ms/call (~59
TMAC/s = 60% of bf16 peak), bf16 hpp=2 0.360, int8 hpp=2 0.345 (+4%),
int8 hpp=4 FAILED Mosaic compile. Accuracy of the int8 variant 2-6%
relative depending on data scale (interpret-mode check below).

    python scripts/ubench_attn_int8_ab.py
"""

import collections
import functools
import glob
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tortoise_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tortoise_tpu.ops.pallas.flash_attention import (
    LOG2E,
    NEG_INF,
    _pad_to,
    flash_attention_packed,
)
from tortoise_tpu.ops.relpos import relpos_bias_band

B, H, T, D, N = 2, 16, 2176, 64, 10


def _kernel_packed_i8(qrow_ref, kv_ref, band_ref, scal_ref, mask_ref,
                      out_ref, s_ref, ki_ref, vi_ref, qsc_ref, *, bq, t_kv,
                      d, scale, hpp):
    """int8 variant of flash_attention._attn_kernel_packed (see module
    docstring; mask always on here)."""
    qi = pl.program_id(2)
    hg = pl.program_id(1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, t_kv), 1)
    maskrow = mask_ref[0, 0][None, :]

    @pl.when(qi == 0)
    def _quantize_kv():
        for g in range(hpp):
            kf = kv_ref[0][:, 3 * d * g + d : 3 * d * g + 2 * d] \
                .astype(jnp.float32)
            vf = kv_ref[0][:, 3 * d * g + 2 * d : 3 * d * g + 3 * d] \
                .astype(jnp.float32)
            sk = jnp.maximum(jnp.max(jnp.abs(kf)) / 127.0, 1e-20)
            sv = jnp.maximum(jnp.max(jnp.abs(vf)) / 127.0, 1e-20)
            ki_ref[g] = jnp.round(kf / sk).astype(jnp.int8)
            vi_ref[g] = jnp.round(vf / sv).astype(jnp.int8)
            qsc_ref[g, 0] = sk
            qsc_ref[g, 1] = sv

    for g in range(hpp):
        sb = g & 1
        c_l = scal_ref[hg * hpp + g, 0]
        c_r = scal_ref[hg * hpp + g, 1]
        fill = jnp.where(
            cols < (qi - 1) * bq, c_l,
            jnp.where(cols >= (qi + 2) * bq, c_r, 0.0)) + maskrow
        qf = qrow_ref[0][:, 3 * d * g : 3 * d * g + d].astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(qf)) / 127.0, 1e-20)
        q8 = jnp.round(qf / sq).astype(jnp.int8)
        s32 = jnp.dot(q8, ki_ref[g].T, preferred_element_type=jnp.int32)
        s_ref[sb, :, bq : bq + t_kv] = (
            s32.astype(jnp.float32)
            * (sq * qsc_ref[g, 0] * jnp.float32(scale)) + fill)
        s_ref[sb, :, pl.ds(qi * bq, 3 * bq)] += band_ref[g]
        s = s_ref[sb, :, bq : bq + t_kv]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p8 = jnp.round(p * 127.0).astype(jnp.int8)
        c32 = jnp.dot(p8, vi_ref[g], preferred_element_type=jnp.int32)
        ctx = c32.astype(jnp.float32) * (qsc_ref[g, 1] / 127.0)
        out_ref[0, :, d * g : d * (g + 1)] = (
            ctx / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_head", "bq", "hpp", "interpret"))
def flash_packed_i8(qkv, n_head, kv_valid, bias_table, bq=128, hpp=4,
                    interpret=False):
    b, t, c3 = qkv.shape
    d = c3 // (3 * n_head)
    scale = 1.0 / (d ** 0.5)
    qkvp = _pad_to(qkv, 1, bq)
    tp = qkvp.shape[1]
    maskp = jnp.where(_pad_to(kv_valid, 1, bq), 0.0,
                      NEG_INF).astype(jnp.float32)[:, None, :]
    band, band_scalars = relpos_bias_band(
        bias_table, bq, scale=8.0, num_buckets=bias_table.shape[0],
        max_distance=64)
    scalars = (band_scalars.astype(jnp.float32) * LOG2E).astype(
        band_scalars.dtype)
    band_cat = (band * LOG2E).swapaxes(1, 2).reshape(n_head, bq, 3 * bq)
    grid = (b, n_head // hpp, tp // bq)
    kern = functools.partial(_kernel_packed_i8, bq=bq, t_kv=tp, d=d,
                             scale=scale * LOG2E, hpp=hpp)
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 3 * hpp * d),
                         lambda bi, hg, qi: (bi, qi, hg)),
            pl.BlockSpec((1, tp, 3 * hpp * d),
                         lambda bi, hg, qi: (bi, 0, hg)),
            pl.BlockSpec((hpp, bq, 3 * bq), lambda bi, hg, qi: (hg, 0, 0)),
            pl.BlockSpec((n_head, 2), lambda bi, hg, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tp), lambda bi, hg, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hpp * d),
                               lambda bi, hg, qi: (bi, qi, hg)),
        out_shape=jax.ShapeDtypeStruct((b, tp, n_head * d), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bq, tp + 2 * bq), jnp.float32),
            pltpu.VMEM((hpp, tp, d), jnp.int8),
            pltpu.VMEM((hpp, tp, d), jnp.int8),
            pltpu.SMEM((hpp, 2), jnp.float32),
        ],
        interpret=interpret,
        **params,
    )(qkvp, qkvp, band_cat, scalars, maskp)
    return out[:, :t, :]


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
    calls = [(n, dr, cnt[n]) for n, dr in tot.items()
             if "flash" in n or "packed_i8" in n]
    return (sum(dr for _, dr, _ in calls) / 1e9,
            sum(c for _, _, c in calls))


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(0, 1, (B, T, 3 * H * D)), jnp.bfloat16)
    table = jnp.asarray(rng.normal(0, 0.1, (32, H)), jnp.float32)
    mask = jnp.ones((B, T), bool)
    interp = jax.default_backend() != "tpu"

    # accuracy: int8 variant vs the production bf16 kernel
    o_bf = flash_attention_packed(qkv, H, mask, bias_table=table, hpp=2,
                                  interpret=interp)
    o_i8 = flash_packed_i8(qkv, H, mask, table, hpp=2, interpret=interp)
    err = np.abs(np.asarray(o_bf, np.float32) - np.asarray(o_i8, np.float32))
    print(f"int8 vs bf16 kernel: max abs err {err.max():.4f} "
          f"(rel {err.max()/max(np.abs(np.asarray(o_bf, np.float32)).max(), 1e-9):.4f})",
          flush=True)
    if interp:
        print("CPU backend: skipping device timing")
        return

    def make_loop(variant, hpp):
        @jax.jit
        def loop(qkv, mask, table):
            def body(c, _):
                if variant == "i8":
                    out = flash_packed_i8(c, H, mask, table, hpp=hpp)
                else:
                    out = flash_attention_packed(c, H, mask,
                                                 bias_table=table,
                                                 bq=128, hpp=hpp)
                nxt = jnp.concatenate([out] * 3, axis=-1) * 0.5 + c * 0.5
                return nxt, None
            c, _ = jax.lax.scan(body, qkv, None, length=N)
            return c
        return loop

    for hpp in (4, 2):
        for variant in ("bf16", "i8"):
            fn = make_loop(variant, hpp)
            try:
                ms, calls = device_profile(
                    fn, qkv, mask, table, outdir=f"/tmp/jt_i8ab_{variant}_{hpp}")
                print(f"hpp={hpp} {variant}: {ms/max(calls,1):7.3f} ms/call "
                      f"({calls} calls)", flush=True)
            except Exception as e:
                print(f"hpp={hpp} {variant}: FAIL {type(e).__name__} "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
