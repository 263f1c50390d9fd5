"""Flash attention (forward-only) Pallas TPU kernel with additive bias.

Built for the hot attention sites of this engine (inference only, so no
backward pass):

- diffusion / latent-conditioner attention: NON-causal, T5 rel-pos bucket
  bias (shared across batch), padded-length key masking. The XLA fallback
  materializes (B, H, T, T) scores — ~1.2 GB f32 at T=2176 — per layer;
  this kernel streams KV tiles through VMEM with online softmax instead.
- AR prefill/latent trunk attention: causal + key-validity masking.

Layout: q, k, v (B, H, T, D); bias (H, T, T) or None; kv_valid (B, T) bool
or None; causal flag. Returns (B, H, T, D) in float32.

The kernel grid is (B, H, T/BQ); each program streams the KV axis in BK
tiles with a fori_loop carrying the running max / normalizer / accumulator
(the standard online-softmax recurrence). Matmuls accumulate in f32 via
``preferred_element_type``. In causal mode the fori_loop bound excludes
tiles strictly after the query tile (~half the work); fully-masked padded
tiles are still streamed and scored (their NEG_INF scores contribute 0).

Falls back to interpreter mode off-TPU (tests run it on CPU), and the
pure-XLA reference implementation lives in ``xla_attention`` for A/B
checks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # softmax via exp2: exp(x) = exp2(x*log2(e));
# folding log2(e) into the q scale and the (precomputed) bias/mask terms
# removes one full-width VPU multiply pass per score tile — the kernels
# are ~40% VPU-bound at production shapes (r3 profile)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                 bq: int, bk: int, t_kv: int, causal: bool, scale: float,
                 have_bias: bool, have_mask: bool, block_bias: bool = False,
                 n_q_blocks: int = 1):
    qi = pl.program_id(2)
    q = q_ref[0, 0]  # (BQ, D) native dtype — MXU runs bf16 single-pass
    n_kv = t_kv // bk

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(j * bk, bk), :]
        v = v_ref[0, 0, pl.ds(j * bk, bk), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if have_bias and block_bias:
            # Toeplitz rel-pos bias: the (BQ, BK) tile depends only on the
            # block diagonal j - qi, so the caller pre-gathers the
            # ND = nq+nk-1 distinct tiles per head and the kernel just
            # indexes — no per-element bucket reconstruction.
            s = s + bias_ref[0, j - qi + (n_q_blocks - 1)]
        elif have_bias:
            s = s + bias_ref[0, :, pl.ds(j * bk, bk)]
        if have_mask:
            # additive 0/NEG_INF f32 row: a bool `where` costs ~3x the
            # whole kernel in VPU mask-expansion (ubench_packed_kernel)
            s = s + mask_ref[0, 0, pl.ds(j * bk, bk)][None, :]
        if causal:
            qpos = qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0)
            kpos = j * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1)
            s = jnp.where(kpos <= qpos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)
        return m_new, l, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, q_ref.shape[-1]), jnp.float32)

    if causal:
        # skip KV tiles strictly after this query tile
        n_run = jnp.minimum((qi + 1) * bq + bk - 1, t_kv) // bk
        m, l, acc = jax.lax.fori_loop(0, n_run, body, (m0, l0, acc0))
    else:
        m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))

    out_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _attn_kernel_rowblock(q_ref, k_ref, v_ref, band_ref, scal_ref, mask_ref,
                          out_ref, s_ref, *, bq: int, t_kv: int,
                          n_heads: int, have_mask: bool):
    """Production diffusion attention: non-causal, T5 band bias.

    The whole KV axis for a head fits VMEM at these shapes (~0.6 MB), so
    instead of the classic online-softmax recurrence over (BQ, BK) tiles —
    which is VPU/loop-overhead bound at ~6% MFU (profiled r2) — each
    program computes the FULL (BQ, T_kv) score row-block with one MXU call,
    one exact softmax pass, and one P@V matmul. The T5 bias is Toeplitz and
    saturates for |j-i| >= max_distance, so it collapses to a per-head
    (BQ, 3*BQ) band patch around the diagonal plus two far constants.

    s_ref: (2, BQ, T_kv + 2*BQ) f32 scratch — two buffers, heads
    alternating between them (sb = g & 1) so head g's softmax (VPU) can
    overlap head g+1's score matmul (MXU) instead of serializing through
    one shared buffer. The band patch always lands at columns
    [qi*BQ, qi*BQ + 3BQ) of the padded scratch (key j lives at column
    j + BQ), so edge query blocks write their out-of-range band thirds
    into the never-read pad margins instead of branching."""
    qi = pl.program_id(2)
    hg = pl.program_id(1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, t_kv), 1)
    # additive 0/NEG_INF mask row (f32): fused into the scratch write — a
    # bool `where` on the (BQ, T) scores costs ~3x the whole kernel
    maskrow = mask_ref[0, 0][None, :] if have_mask else None

    for g in range(n_heads):
        # alternate scratch buffers per head — breaks the false
        # dependency serializing head g's softmax (VPU) against head
        # g+1's score matmul (MXU); see _attn_kernel_packed
        sb = g & 1
        q = q_ref[0, g]                       # (BQ, D) native dtype
        k = k_ref[0, g]                       # (T_kv, D)
        v = v_ref[0, g]
        c_l = scal_ref[hg * n_heads + g, 0]   # full (H, 2) array in SMEM
        c_r = scal_ref[hg * n_heads + g, 1]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        # far-field bias: constant left/right of the 3-block band
        fill = jnp.where(
            cols < (qi - 1) * bq, c_l,
            jnp.where(cols >= (qi + 2) * bq, c_r, 0.0))
        if have_mask:
            fill = fill + maskrow
        s_ref[sb, :, bq : bq + t_kv] = s + fill
        s_ref[sb, :, pl.ds(qi * bq, 3 * bq)] += band_ref[g]
        s = s_ref[sb, :, bq : bq + t_kv]
        m = jnp.max(s, axis=-1, keepdims=True)
        # scores are in the log2 domain (caller folded log2(e) into the q
        # scale and the bias terms): exp2 saves a VPU multiply pass
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jnp.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        out_ref[0, g] = (ctx / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _grouped_flash(qp, kp, vp, band, scalars, maskp, *, bq, bk, tq, tkv,
                   group, interpret, vmem_mb=None):
    """pallas_call wrapper for the grouped band-bias kernel. The scale is
    already folded into q by the caller."""
    b, h = qp.shape[0], qp.shape[1]
    d = qp.shape[-1]
    grid = (b, h // group, tq // bq)
    # band arrives (H, 3, bq, bq) for diagonals d in {-1, 0, 1}; the kernel
    # wants the row-block patch (H, bq, 3*bq)
    band_cat = band.swapaxes(1, 2).reshape(h, bq, 3 * bq)
    in_specs = [
        pl.BlockSpec((1, group, bq, d), lambda bi, hg, qi: (bi, hg, qi, 0)),
        pl.BlockSpec((1, group, tkv, d), lambda bi, hg, qi: (bi, hg, 0, 0)),
        pl.BlockSpec((1, group, tkv, d), lambda bi, hg, qi: (bi, hg, 0, 0)),
        pl.BlockSpec((group, bq, 3 * bq), lambda bi, hg, qi: (hg, 0, 0)),
        # full (H, 2) array: SMEM blocks must cover whole dims
        pl.BlockSpec((h, 2), lambda bi, hg, qi: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [qp, kp, vp, band_cat, scalars]
    have_mask = maskp is not None
    if have_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, tkv), lambda bi, hg, qi: (bi, 0, 0)))
        args.append(maskp)

        def kern(q_ref, k_ref, v_ref, band_ref, scal_ref, mask_ref,
                 out_ref, s_ref):
            _attn_kernel_rowblock(q_ref, k_ref, v_ref, band_ref, scal_ref,
                                  mask_ref, out_ref, s_ref, bq=bq,
                                  t_kv=tkv, n_heads=group, have_mask=True)
    else:
        def kern(q_ref, k_ref, v_ref, band_ref, scal_ref, out_ref, s_ref):
            _attn_kernel_rowblock(q_ref, k_ref, v_ref, band_ref, scal_ref,
                                  None, out_ref, s_ref, bq=bq, t_kv=tkv,
                                  n_heads=group, have_mask=False)

    params = {}
    if not interpret:
        # (b, head-group) grid steps are independent, same as the packed
        # kernel: declaring it lets Mosaic overlap prologue DMAs across
        # steps (the per-head scratch double-buffering is intra-program)
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 2**20 if vmem_mb else None,
        )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, group, bq, d),
                               lambda bi, hg, qi: (bi, hg, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(qp.shape, qp.dtype),
        scratch_shapes=[pltpu.VMEM((2, bq, tkv + 2 * bq), jnp.float32)],
        interpret=interpret,
        **params,
    )(*args)


def _attn_kernel_packed(qrow_ref, kv_ref, band_ref, scal_ref, mask_ref,
                        out_ref, s_ref, *, bq: int, t_kv: int, d: int,
                        scale: float, have_mask: bool, hpp: int = 2):
    """Row-block kernel over head-sliced views of the packed (B, T, 3HD)
    qkv tensor, `hpp` interleaved heads per program (Mosaic wants the
    last block dim % 128 == 0; one head's 3D-wide strip is 192, so hpp
    must be even).

    qrow_ref: (1, BQ, 3*hpp*D) — this query block's [q0 k0 v0 q1 ...];
    kv_ref:   (1, T_kv, 3*hpp*D) — the same columns over the full KV
    axis. Same band-bias scheme as _attn_kernel_rowblock."""
    qi = pl.program_id(2)
    hg = pl.program_id(1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, t_kv), 1)
    # additive 0/NEG_INF mask row (f32), fused into the scratch write
    # (bool `where` on the scores costs ~3x the whole kernel)
    maskrow = mask_ref[0, 0][None, :] if have_mask else None
    for g in range(hpp):
        # double-buffered score scratch: alternating buffers break the
        # false write-after-read dependency between consecutive heads'
        # softmax (VPU) and QK/PV matmuls (MXU), letting Mosaic overlap
        # head g's softmax with head g+1's score matmul — the two units
        # otherwise serialize through the single shared buffer
        sb = g & 1
        # scale carries a folded log2(e): scores live in the log2 domain
        # so the softmax uses exp2 directly (one fewer VPU pass than exp);
        # the bias band/scalars/mask arrive pre-scaled by the caller
        q = qrow_ref[0][:, 3 * d * g : 3 * d * g + d] \
            * jnp.asarray(scale, qrow_ref.dtype)
        k = kv_ref[0][:, 3 * d * g + d : 3 * d * g + 2 * d]
        v = kv_ref[0][:, 3 * d * g + 2 * d : 3 * d * g + 3 * d]
        c_l = scal_ref[hg * hpp + g, 0]
        c_r = scal_ref[hg * hpp + g, 1]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        fill = jnp.where(
            cols < (qi - 1) * bq, c_l,
            jnp.where(cols >= (qi + 2) * bq, c_r, 0.0))
        if have_mask:
            fill = fill + maskrow
        s_ref[sb, :, bq : bq + t_kv] = s + fill
        s_ref[sb, :, pl.ds(qi * bq, 3 * bq)] += band_ref[g]
        s = s_ref[sb, :, bq : bq + t_kv]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jnp.dot(p.astype(kv_ref.dtype), v,
                      preferred_element_type=jnp.float32)
        out_ref[0, :, d * g : d * (g + 1)] = (
            ctx / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "scale", "bq", "interpret", "bias_scale",
                     "bias_max_distance", "hpp", "vmem_mb"),
)
def flash_attention_packed(
    qkv: jax.Array,
    n_head: int,
    kv_valid: Optional[jax.Array] = None,
    bias_table: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    bq: int = 128,
    interpret: bool = False,
    bias_scale: float = 8.0,
    bias_max_distance: int = 64,
    band: Optional[jax.Array] = None,
    band_scalars: Optional[jax.Array] = None,
    hpp: int = 2,
    vmem_mb: Optional[int] = None,
) -> jax.Array:
    """Non-causal T5-band-bias attention STRAIGHT off the fused qkv matmul.

    qkv: (B, T, 3*H*D) with the per-head-interleaved channel layout
    c = h*(3D) + part*D + d (upstream QKVAttentionLegacy). Returns the
    merged context (B, T, H*D), ready for the output projection.

    Head slicing happens in the BlockSpec index maps (two heads per
    program: the 6D-wide column block [q k v | q k v], 384 lanes for D=64,
    satisfying Mosaic's %128 block constraint), so XLA never materializes
    the (B, T, H, 3, D) -> (B, H, T, D) transposes — measured 2x on the
    custom-call time when the kernel consumed transposed operands
    (scripts/ubench_flash_kernel.py 'producer' case). n_head must be even.
    """
    b, t, c3 = qkv.shape
    d = c3 // (3 * n_head)
    if n_head % 2 or (3 * 2 * d) % 128:
        raise ValueError(f"packed path needs even heads and 6*D % 128 == 0,"
                         f" got H={n_head} D={d}")
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    # bq is caller-controlled (models/diffusion._packed_bq) so precomputed
    # band biases always match the block size; it must stay 128-aligned
    # (rowblock_bq) — short T pads up to one block
    bq = rowblock_bq(bq)
    qkvp = _pad_to(qkv, 1, bq)
    tp = qkvp.shape[1]
    if kv_valid is None and tp != t:
        kv_valid = jnp.ones((b, t), bool)
    have_mask = kv_valid is not None
    if have_mask:
        # additive 0/NEG_INF f32 row; _pad_to pads with 0=False -> NEG_INF
        maskp = jnp.where(_pad_to(kv_valid, 1, bq), 0.0,
                          NEG_INF).astype(jnp.float32)[:, None, :]

    if band is None:
        # NOTE: when the table varies per scan layer, precompute the band
        # stack OUTSIDE the step loop (relpos_bias_band_stacked) and pass
        # it in — built here it re-materializes per call (~0.3 ms)
        from tortoise_tpu.ops.relpos import relpos_bias_band

        band, band_scalars = relpos_bias_band(
            bias_table, bq, scale=bias_scale,
            num_buckets=bias_table.shape[0],
            max_distance=bias_max_distance)
    # log2-domain softmax: pre-scale every additive score term by log2(e)
    # (the q scale carries it too); the kernel then uses exp2 directly
    scalars = (band_scalars.astype(jnp.float32) * LOG2E).astype(
        band_scalars.dtype)
    band_cat = (band * LOG2E).swapaxes(1, 2).reshape(n_head, bq, 3 * bq)

    # clamp to a valid even divisor of n_head; floor at 2 (hpp=1 would
    # decrement to 0 and ZeroDivisionError on the modulo)
    while hpp > 2 and (n_head % hpp or hpp % 2):
        hpp -= 1
    hpp = max(hpp, 2)
    if n_head % hpp:
        raise ValueError(
            f"flash_attention_packed needs an even head count to pack "
            f"{hpp} heads/program; got n_head={n_head}")
    grid = (b, n_head // hpp, tp // bq)
    in_specs = [
        pl.BlockSpec((1, bq, 3 * hpp * d), lambda bi, hg, qi: (bi, qi, hg)),
        pl.BlockSpec((1, tp, 3 * hpp * d), lambda bi, hg, qi: (bi, 0, hg)),
        pl.BlockSpec((hpp, bq, 3 * bq), lambda bi, hg, qi: (hg, 0, 0)),
        pl.BlockSpec((n_head, 2), lambda bi, hg, qi: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [qkvp, qkvp, band_cat, scalars]
    if have_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, tp), lambda bi, hg, qi: (bi, 0, 0)))
        args.append(maskp)

        def kern(qrow_ref, kv_ref, band_ref, scal_ref, mask_ref,
                 out_ref, s_ref):
            _attn_kernel_packed(qrow_ref, kv_ref, band_ref, scal_ref,
                                mask_ref, out_ref, s_ref, bq=bq, t_kv=tp,
                                d=d, scale=scale * LOG2E, have_mask=True,
                                hpp=hpp)
    else:
        def kern(qrow_ref, kv_ref, band_ref, scal_ref, out_ref, s_ref):
            _attn_kernel_packed(qrow_ref, kv_ref, band_ref, scal_ref,
                                None, out_ref, s_ref, bq=bq, t_kv=tp,
                                d=d, scale=scale * LOG2E,
                                have_mask=False, hpp=hpp)

    params = {}
    if not interpret:
        # (b, head-group) grid steps are independent; telling Mosaic lets
        # it overlap their prologue DMAs across steps
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 2**20 if vmem_mb else None,
        )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, hpp * d),
                               lambda bi, hg, qi: (bi, qi, hg)),
        out_shape=jax.ShapeDtypeStruct((b, tp, n_head * d), qkv.dtype),
        # 2 buffers: heads alternate so MXU/VPU phases of consecutive
        # heads can overlap (see _attn_kernel_packed)
        scratch_shapes=[pltpu.VMEM((2, bq, tp + 2 * bq), jnp.float32)],
        interpret=interpret,
        **params,
    )(*args)
    return out[:, :t, :]


def _attn_kernel_causal_packed(qrow_ref, krow_ref, vrow_ref, mask_ref,
                               out_ref, s_ref, *, bq: int, t_kv: int,
                               d: int, scale: float, have_mask: bool,
                               hpp: int):
    """Causal row-block attention over head-sliced views of a PART-MAJOR
    packed (B, T, 3*H*D) qkv tensor (c = part*H*D + h*D + d — the AR
    trunk's fused qkv layout, unlike the diffusion kernel's per-head
    interleave). One full (BQ, T) score block per head per program: one
    MXU call, one exact softmax, one P@V matmul — the online-softmax
    variant is fori_loop-overhead bound at these shapes (measured +31%
    vs the XLA scores at B=16, S=535; this kernel is the win).

    qrow/krow/vrow are three views of the SAME qkv array selected by
    block index maps (q at block column hg, k at nhg+hg, v at 2*nhg+hg),
    so XLA never materializes (B, T, H, 3, D) -> (B, H, T, D) transposes.
    s_ref: (2, BQ, T) f32 double-buffered score scratch (heads alternate,
    overlapping head g's softmax with g+1's matmul). Scores live in the
    log2 domain (scale folds log2(e)); causal+validity masking is one
    shared additive f32 fill."""
    qi = pl.program_id(2)
    rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, t_kv), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, t_kv), 1)
    fill = jnp.where(cols <= rows, 0.0, NEG_INF)
    if have_mask:
        fill = fill + mask_ref[0, 0][None, :]
    for g in range(hpp):
        sb = g & 1
        q = qrow_ref[0][:, d * g : d * (g + 1)] \
            * jnp.asarray(scale, qrow_ref.dtype)
        k = krow_ref[0][:, d * g : d * (g + 1)]
        v = vrow_ref[0][:, d * g : d * (g + 1)]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s_ref[sb] = s + fill
        s = s_ref[sb]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jnp.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        out_ref[0, :, d * g : d * (g + 1)] = (
            ctx / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "scale", "bq", "hpp", "interpret"),
)
def flash_attention_causal_qkv(
    qkv: jax.Array,
    n_head: int,
    kv_valid: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    bq: int = 128,
    hpp: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """Causal masked attention STRAIGHT off the AR trunk's fused qkv
    matmul. qkv: (B, T, 3*H*D) part-major ([all q | all k | all v], each
    part h*D + d). kv_valid: (B, T) bool. Returns the merged context
    (B, T, H*D) in qkv's dtype, ready for the output projection.

    Replaces the (B, H, S, S) f32 score materialization of the XLA form
    in models/ar.py prefill/latent (main.cpp:2053-2519's graphs) on the
    bf16/int8 planes. hpp heads/program must keep hpp*D a lane multiple
    (%128) on real TPU."""
    b, t, c3 = qkv.shape
    d = c3 // (3 * n_head)
    if n_head % hpp:
        raise ValueError(f"hpp={hpp} must divide n_head={n_head}")
    if not interpret and (hpp * d) % 128:
        raise ValueError(f"hpp*D = {hpp * d} must be a lane multiple")
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    bq = rowblock_bq(bq)
    qkvp = _pad_to(qkv, 1, bq)
    tp = qkvp.shape[1]
    if kv_valid is None and tp != t:
        kv_valid = jnp.ones((b, t), bool)
    have_mask = kv_valid is not None
    nhg = n_head // hpp
    grid = (b, nhg, tp // bq)
    in_specs = [
        pl.BlockSpec((1, bq, hpp * d), lambda bi, hg, qi: (bi, qi, hg)),
        pl.BlockSpec((1, tp, hpp * d),
                     lambda bi, hg, qi: (bi, 0, nhg + hg)),
        pl.BlockSpec((1, tp, hpp * d),
                     lambda bi, hg, qi: (bi, 0, 2 * nhg + hg)),
    ]
    args = [qkvp, qkvp, qkvp]
    if have_mask:
        # additive 0/NEG_INF f32 row, pre-scaled to the log2 domain pads
        # with False -> NEG_INF
        maskp = jnp.where(_pad_to(kv_valid, 1, bq), 0.0,
                          NEG_INF).astype(jnp.float32)[:, None, :]
        in_specs.append(
            pl.BlockSpec((1, 1, tp), lambda bi, hg, qi: (bi, 0, 0)))
        args.append(maskp)

        def kern(qrow_ref, krow_ref, vrow_ref, mask_ref, out_ref, s_ref):
            _attn_kernel_causal_packed(
                qrow_ref, krow_ref, vrow_ref, mask_ref, out_ref, s_ref,
                bq=bq, t_kv=tp, d=d, scale=scale * LOG2E, have_mask=True,
                hpp=hpp)
    else:
        def kern(qrow_ref, krow_ref, vrow_ref, out_ref, s_ref):
            _attn_kernel_causal_packed(
                qrow_ref, krow_ref, vrow_ref, None, out_ref, s_ref,
                bq=bq, t_kv=tp, d=d, scale=scale * LOG2E, have_mask=False,
                hpp=hpp)

    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, hpp * d),
                               lambda bi, hg, qi: (bi, qi, hg)),
        out_shape=jax.ShapeDtypeStruct((b, tp, n_head * d), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((2, bq, tp), jnp.float32)],
        interpret=interpret,
        **params,
    )(*args)
    return out[:, :t, :]


def rowblock_bq(bq: int) -> int:
    """Legal query block size for the row-block kernels.

    They dynamic-slice the score scratch at column qi*bq (lane dim), and
    Mosaic requires that start to be provably 128-aligned — so bq must be
    a multiple of 128 regardless of T; short sequences pad T up to bq
    rather than clamping bq down (which compiled fine only in interpret
    mode and failed Mosaic on real TPU for T < 128)."""
    return bq if bq > 0 and bq % 128 == 0 else 128


def _pad_to(x, axis, mult):
    t = x.shape[axis]
    pad = (-t) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "bq", "bk", "interpret",
                     "bias_scale", "bias_formula", "bias_max_distance",
                     "group", "vmem_mb"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    kv_valid: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    bq: int = 128,
    bk: int = 128,
    interpret: bool = False,
    bias_buckets: Optional[jax.Array] = None,
    bias_table: Optional[jax.Array] = None,
    bias_scale: float = 8.0,
    bias_formula: bool = False,
    bias_max_distance: int = 64,
    group: int = 2,
    vmem_mb: Optional[int] = None,
) -> jax.Array:
    """q,k,v: (B, H, T, D); kv_valid: (B, T) bool. Bias either as a
    materialized (H, T, T) `bias`, or compactly as `bias_buckets` (T, T)
    int32 + `bias_table` (NB, H) with `bias_scale`. The bucket bias is a
    function of j - i only (T5 buckets are Toeplitz), so the wrapper
    pre-gathers the nq+nk-1 distinct (BQ, BK) bias tiles per head and the
    kernel indexes them by block diagonal — streaming a materialized
    (H, T, T) bias costs more HBM traffic than the attention itself, and
    per-element bucket reconstruction in-kernel costs ~30x the matmul VPU
    work. Returns (B, H, T, D): f32, except the grouped band-bias fast
    path (bias_formula, non-causal, square blocks >= 64) which returns
    q's dtype to halve the output write traffic."""
    b, h, t, d = q.shape
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    block_bias = bias_buckets is not None or bias_formula
    if bias_formula and not causal:
        # grouped row-block path: its scratch slicing needs bq to stay a
        # multiple of 128 (rowblock_bq); pad short T up instead of
        # clamping bq down
        bq = bk = rowblock_bq(min(bq, bk))
    else:
        # the kernel's in-loop mask/bias slices are LANE-dim dynamic
        # slices (pl.ds(j*bk, ...)), which Mosaic requires to be provably
        # 128-aligned — sub-128 blocks compiled only in interpret mode
        # and failed Mosaic on real TPU (e.g. the 35-token AR prefill).
        # Keep blocks at 128 multiples and pad short T up instead.
        bq = rowblock_bq(bq)
        bk = rowblock_bq(bk)
        if block_bias:
            bq = bk = min(bq, bk)  # the Toeplitz trick needs square tiles

    qp = _pad_to(q, 2, bq)
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    tq, tkv = qp.shape[2], kp.shape[2]

    if kv_valid is None and tkv != t:
        kv_valid = jnp.ones((b, t), bool)
    have_mask = kv_valid is not None
    if have_mask:
        # (B, 1, T) so the trailing two block dims satisfy TPU tiling;
        # additive 0/NEG_INF f32 (pads with False -> NEG_INF)
        maskp = jnp.where(_pad_to(kv_valid, 1, bk), 0.0,
                          NEG_INF).astype(jnp.float32)[:, None, :]
    have_bias = bias is not None or block_bias
    nq, nk = tq // bq, tkv // bk

    if (bias_formula and not causal and bq == bk and bq >= 64
            and tq == tkv):
        # production diffusion shape: grouped-heads band-bias kernel —
        # k/v stream once per batch row instead of once per head, and the
        # off-band bias tiles collapse to per-head constants
        from tortoise_tpu.ops.relpos import relpos_bias_band

        # VMEM budget at T~2300, bq=128, bf16 kv (with the (2, BQ, T+2BQ)
        # double score scratch = 2.6 MB): group=2 needs ~2.4 MB of
        # double-buffered k/v blocks + 0.8 MB band + scratch ~= 6 MB;
        # group=4 doubles k/v+band to ~6.3 MB -> ~9 MB total. Larger bq
        # scales the scratch linearly (bq=512 alone is ~14.7 MB — over
        # the 16 MB ceiling; ubench_packed_kernel caps its sweep there)
        while h % group:
            group //= 2
        band, scalars = relpos_bias_band(
            bias_table, bq, scale=bias_scale,
            num_buckets=bias_table.shape[0],
            max_distance=bias_max_distance)
        # log2-domain softmax (see LOG2E): scale q and the bias terms
        band = band * LOG2E
        scalars = (scalars.astype(jnp.float32) * LOG2E).astype(scalars.dtype)
        qs = qp * jnp.asarray(scale * LOG2E, qp.dtype)
        out = _grouped_flash(qs, kp, vp, band, scalars,
                             maskp if have_mask else None,
                             bq=bq, bk=bk, tq=tq, tkv=tkv, group=group,
                             interpret=interpret, vmem_mb=vmem_mb)
        return out[:, :, :t, :]

    if bias_formula:
        # gather-free construction: bucket ids straight from the T5
        # formula + one-hot matmul table lookup (XLA gathers at these
        # sizes cost ~40 ms per denoiser eval)
        from tortoise_tpu.ops.relpos import relpos_bias_blocks

        blocks = relpos_bias_blocks(
            bias_table, nq, nk, bq, scale=bias_scale,
            num_buckets=bias_table.shape[0],
            max_distance=bias_max_distance)
    elif block_bias:
        # bucket ids along the j - i diagonal strip (buckets are Toeplitz)
        strip = jnp.concatenate(
            [bias_buckets[::-1, 0], bias_buckets[0, 1:]])  # (tq0+tkv0-1,)
        nd = nq + nk - 1
        dgrid = jnp.arange(nd)[:, None, None]
        ii = jnp.arange(bq)[None, :, None]
        jj = jnp.arange(bk)[None, None, :]
        delta = (dgrid - (nq - 1)) * bk + jj - ii      # (ND, BQ, BK)
        sid = jnp.clip(delta + (t - 1), 0, strip.shape[0] - 1)
        ids = strip[sid]                               # bucket ids
        blocks = bias_scale * jnp.moveaxis(
            bias_table.astype(jnp.float32)[ids], -1, 0)  # (H, ND, BQ, BK)
    elif have_bias:
        biasp = _pad_to(_pad_to(bias.astype(jnp.float32), 1, bq), 2, bk)

    grid = (b, h, tq // bq)
    in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, tkv, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, tkv, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
    ]
    args = [qp, kp, vp]
    if block_bias:
        in_specs.append(
            pl.BlockSpec((1, blocks.shape[1], bq, bk),
                         lambda bi, hi, qi: (hi, 0, 0, 0)))
        args.append(blocks)
    elif have_bias:
        in_specs.append(
            pl.BlockSpec((1, bq, tkv), lambda bi, hi, qi: (hi, qi, 0)))
        args.append(biasp)
    if have_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, tkv), lambda bi, hi, qi: (bi, 0, 0)))
        args.append(maskp)

    kernel = functools.partial(
        _kernel_variant(have_bias, have_mask, block_bias),
        bq=bq, bk=bk, t_kv=tkv, causal=causal, scale=scale,
        have_bias=have_bias, have_mask=have_mask, block_bias=block_bias,
        n_q_blocks=nq,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, d), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:, :, :t, :]


def _kernel_variant(have_bias: bool, have_mask: bool, block_bias: bool):
    """Adapt the kernel signature to the optional operands."""
    if have_bias and have_mask:
        return _attn_kernel
    if have_bias:
        def k_b(q_ref, k_ref, v_ref, bias_ref, out_ref, **kw):
            return _attn_kernel(q_ref, k_ref, v_ref, bias_ref, None,
                                out_ref, **kw)
        return k_b
    if have_mask:
        def k_m(q_ref, k_ref, v_ref, mask_ref, out_ref, **kw):
            return _attn_kernel(q_ref, k_ref, v_ref, None, mask_ref,
                                out_ref, **kw)
        return k_m

    def k_0(q_ref, k_ref, v_ref, out_ref, **kw):
        return _attn_kernel(q_ref, k_ref, v_ref, None, None, out_ref, **kw)
    return k_0


def xla_attention(q, k, v, bias=None, kv_valid=None, causal=False,
                  scale=None):
    """Readable XLA reference for A/B tests."""
    b, h, t, d = q.shape
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    if kv_valid is not None:
        s = jnp.where(kv_valid[:, None, None, :], s, NEG_INF)
    if causal:
        i = jnp.arange(t)
        s = jnp.where(i[None, None, :, None] >= i[None, None, None, :], s,
                      NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
