"""Elementwise / normalization primitives.

Numerics follow the reference's ggml semantics so parity tests hold:

- ``layer_norm``: ggml_norm (main.cpp usages at eps=1e-5) normalizes over the
  channel axis with the *population* variance and no affine; the affine
  multiply/add is applied by the caller's weights. We fuse the affine here
  (pass w=None/b=None for the reference's bare second norm, main.cpp:2486,
  2996).
- ``group_norm``: ggml_group_norm(.., 32) over (channels/groups, length)
  blocks; affine applied by callers in the reference, fused here.
- ``gelu``: ggml_gelu is the tanh approximation (evaluated through an f16
  lookup table in ggml; we use the analytic form — differences are ~1e-3,
  inside the reference's own 1e-2 test tolerance).

All norms compute in float32 regardless of input dtype (TPU-safe), then cast
back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pdot(x: jax.Array, w, compute_dtype=None, out_dtype=None) -> jax.Array:
    """Matmul with explicit MXU-friendly dtype control.

    Casts operands to ``compute_dtype`` (e.g. bfloat16) and accumulates in
    float32 via ``preferred_element_type``. With compute_dtype=None the
    matmul is true float32: on TPU that requires Precision.HIGHEST, because
    the MXU's default "f32" matmul is a single bf16 pass (~4e-3 relative
    error) — parity mode needs the multi-pass exact form.

    ``out_dtype`` (only meaningful with a compute_dtype) emits the result
    in that dtype straight from the dot: the MXU accumulates f32
    internally either way, so this equals `.astype(out_dtype)` on the f32
    result while halving the output write traffic (f32 dot outputs that
    are immediately downcast cost ~2 ms/CFG-step in the denoiser loop).

    ``w`` may be a ``(w_int8, scale)`` pair (see ``quantize_cols``): the
    int8 weight streams from HBM at half the bf16 bytes — the AR decode
    bound — the convert fuses into the dot's operand read, and the
    per-output-column scale is applied to the f32 accumulator.
    """
    if isinstance(w, tuple):
        wq, scale = w
        cd = compute_dtype or jnp.float32
        # compute_dtype=None keeps the exact-f32 contract below: the int8
        # values are exact in any dtype, but f32 activations would be
        # silently rounded to bf16 by the MXU's default single-pass mode
        prec = None if compute_dtype is not None else (
            jax.lax.Precision.HIGHEST)
        out = jnp.matmul(x.astype(cd), wq.astype(cd),
                         preferred_element_type=jnp.float32, precision=prec)
        out = out * scale
        if compute_dtype is None:
            return out  # parity path always returns f32 (as below)
        return out.astype(out_dtype) if out_dtype is not None else out
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
        out_dtype = None  # parity path always returns f32
    return jnp.matmul(
        x, w, preferred_element_type=out_dtype or jnp.float32,
        precision=precision
    )


def pdot_int8act(x: jax.Array, w) -> jax.Array:
    """int8 x int8 -> int32 matmul with dynamic per-row activation
    quantization. ``w`` is a ``(w_int8, scale)`` pair from
    ``quantize_cols`` in the (..., in, out) matmul orientation.

    Unlike ``pdot``'s weight-only int8 path (which converts the weight to
    bf16 inside the dot and only saves HBM bytes), this feeds the MXU's
    int8 mode: measured 115 vs 96 TF/s against bf16 at the denoiser's
    (4352, 1024, 3072) chain shapes on v5e (scripts/ubench_int8_matmul.py,
    r3) — the activation quantize/dequantize VPU passes included. Error:
    per-row symmetric activation quantization adds ~0.4% relative on top
    of the weight quantization's ~0.4%. Returns float32."""
    wq, scale = w
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s_row = jnp.maximum(absmax.astype(jnp.float32), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_row), -127,
                  127).astype(jnp.int8)
    acc = jnp.matmul(xq, wq, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s_row * scale


def quantize_cols(w: jax.Array):
    """Symmetric per-output-column int8 quantization of a weight oriented
    for ``x @ w`` ((..., in, out); the reduction is over the `in` axis, so
    stacked (L, in, out) layer weights get per-layer per-column scales).
    Returns (w_int8, scale_f32 (..., 1, out)) with w ~= w_int8 * scale."""
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def quantize_cols_host(w):
    """numpy twin of quantize_cols for host-resident leaves: quantizing
    before upload ships int8 bytes instead of f32 through the host->device
    link (~4x less; through the remote-TPU tunnel at ~20 MB/s that is tens
    of seconds per GB). Same f32 math and round-half-even as the jnp
    version, so the two planes are bit-identical.

    Stacked (L, in, out) trees are processed one leading slice at a time
    into preallocated outputs: whole-array ops on the ~360 MB stacks
    allocate equally large temporaries per step, which the sandboxed
    host's page-fault path makes pathologically slow (measured 21 s for
    a (30, 1024, 3072) stack vs 0.5 s slice-wise — most of the
    previously documented ~75 s cold-start quantize cost)."""
    import numpy as np

    wf = np.asarray(w, np.float32)
    if wf.ndim <= 2:
        absmax = np.max(np.abs(wf), axis=-2, keepdims=True)
        scale = np.maximum(absmax, np.float32(1e-12)) / np.float32(127.0)
        wq = np.clip(np.rint(wf / scale), -127, 127).astype(np.int8)
        return wq, scale.astype(np.float32)
    lead = wf.shape[:-2]
    wq = np.empty(wf.shape, np.int8)
    scale = np.empty(lead + (1, wf.shape[-1]), np.float32)
    for idx in np.ndindex(*lead):
        wq[idx], scale[idx] = quantize_cols_host(wf[idx])
    return wq, scale


def layer_norm(x, w=None, b=None, eps: float = 1e-5, axis: int = -1):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axis, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if w is not None:
        out = out * w
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def group_norm(x, n_groups: int, w=None, b=None, eps: float = 1e-5,
               mask=None):
    """GroupNorm over (C, T) feature maps; x shape (..., C, T).

    With ``mask`` (broadcastable to (..., 1, T), bool) statistics are
    computed over valid frames only — needed because our sequence lengths
    are padded to static buckets.
    """
    *lead, c, t = x.shape
    xf = x.astype(jnp.float32).reshape(*lead, n_groups, c // n_groups, t)
    if mask is None:
        mean = jnp.mean(xf, axis=(-2, -1), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(-2, -1), keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + eps)
    else:
        m = jnp.broadcast_to(mask, (*lead, 1, t)).reshape(*lead, 1, 1, t)
        xf = jnp.where(m, xf, 0.0)
        n = jnp.maximum(jnp.sum(m, axis=(-2, -1), keepdims=True), 1) * (
            c // n_groups
        )
        mean = jnp.sum(xf, axis=(-2, -1), keepdims=True) / n
        d = jnp.where(m, xf - mean, 0.0)
        var = jnp.sum(d * d, axis=(-2, -1), keepdims=True) / n
        out = d * jax.lax.rsqrt(var + eps)
    out = out.reshape(*lead, c, t)
    if w is not None:
        out = out * w[..., :, None]
    if b is not None:
        out = out + b[..., :, None]
    if mask is not None:
        out = jnp.where(jnp.broadcast_to(mask, (*lead, 1, t)), out, 0.0)
    return out.astype(x.dtype)


def group_norm_tc(x, n_groups: int, w=None, b=None, eps: float = 1e-5,
                  mask=None, fast: bool = False):
    """GroupNorm over time-major (..., T, C) feature maps — the layout the
    TPU denoiser carries activations in (matmuls want (B*T, C); keeping C
    minor-most avoids a relayout per matmul). Statistics are identical to
    ``group_norm`` on the transposed input: per group of C/n_groups
    channels, reduced over (T, group channels). ``mask``: (..., T) bool.

    ``fast``: one-pass E[x^2]-mean^2 statistics (reduce over T first, then
    the tiny group axis) instead of the exact centered two-pass form — no
    full (B, T, C) centered intermediate, which XLA materializes in a
    transposed layout (~0.5 ms per call at production shapes, r2 profile).
    f32 cancellation error is ~1e-6 relative for unit-scale activations;
    the f32 parity path keeps the exact form.
    """
    *lead, t, c = x.shape
    if fast:
        return _group_norm_tc_fast(x, n_groups, w, b, eps, mask)
    xf = x.astype(jnp.float32).reshape(*lead, t, n_groups, c // n_groups)
    if mask is None:
        mean = jnp.mean(xf, axis=(-3, -1), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(-3, -1), keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + eps)
    else:
        m = jnp.broadcast_to(mask, (*lead, t)).reshape(*lead, t, 1, 1)
        xf = jnp.where(m, xf, 0.0)
        n = jnp.maximum(jnp.sum(m, axis=(-3, -1), keepdims=True), 1) * (
            c // n_groups
        )
        mean = jnp.sum(xf, axis=(-3, -1), keepdims=True) / n
        d = jnp.where(m, xf - mean, 0.0)
        var = jnp.sum(d * d, axis=(-3, -1), keepdims=True) / n
        out = d * jax.lax.rsqrt(var + eps)
    out = out.reshape(*lead, t, c)
    if w is not None:
        out = out * w
    if b is not None:
        out = out + b
    if mask is not None:
        out = jnp.where(
            jnp.broadcast_to(mask, (*lead, t))[..., None], out, 0.0)
    return out.astype(x.dtype)


def _group_norm_tc_fast(x, n_groups: int, w=None, b=None,
                        eps: float = 1e-5, mask=None):
    """One-pass group norm over (..., T, C): per-channel sums reduced over
    T (a layout-friendly column reduction), group-summed on the tiny
    (G, C/G) result, variance via E[x^2] - mean^2 (clamped at 0)."""
    *lead, t, c = x.shape
    cg = c // n_groups
    xf = x.astype(jnp.float32)
    if mask is not None:
        m = jnp.broadcast_to(mask, (*lead, t))
        xf = jnp.where(m[..., None], xf, 0.0)
        n = jnp.maximum(jnp.sum(m, axis=-1), 1).astype(jnp.float32) * cg
        n = n[..., None]                                   # (..., 1)
    else:
        n = jnp.float32(t * cg)
    s1 = jnp.sum(xf, axis=-2)                              # (..., C)
    s2 = jnp.sum(jnp.square(xf), axis=-2)
    g1 = jnp.sum(s1.reshape(*lead, n_groups, cg), axis=-1)  # (..., G)
    g2 = jnp.sum(s2.reshape(*lead, n_groups, cg), axis=-1)
    mean = g1 / n
    var = jnp.maximum(g2 / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    # per-channel scale/shift: fold the group stats (and affine) into one
    # elementwise pass over x
    inv_c = jnp.repeat(inv, cg, axis=-1)                   # (..., C)
    mean_c = jnp.repeat(mean, cg, axis=-1)
    scale = inv_c if w is None else inv_c * w
    shift = -mean_c * scale
    if b is not None:
        shift = shift + b
    out = xf * scale[..., None, :] + shift[..., None, :]
    if mask is not None:
        out = jnp.where(jnp.broadcast_to(mask, (*lead, t))[..., None],
                        out, 0.0)
    return out.astype(x.dtype)


def gelu(x):
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return jax.nn.silu(x)


def leaky_relu(x, negative_slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope)
