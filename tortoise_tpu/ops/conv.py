"""1-D convolution wrappers over lax.conv_general_dilated, channels-first.

All weights use the torch Conv1d orientation (out_ch, in_ch, kernel) — the
layout the GGML reader delivers (io/ggml.py). The reference casts conv
weights to f16 before ggml_conv_1d (e.g. main.cpp:3165-3172); we stay in
f32/bf16 — differences are inside its 1e-2 tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DN = ("NCH", "OIH", "NCH")


def conv1d(x, w, b=None, stride: int = 1, padding: int = 0,
           dilation: int = 1, groups: int = 1, compute_dtype=None):
    """x: (N, C_in, T); w: (C_out, C_in/groups, K); returns (N, C_out, T')."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b[..., :, None]
    return out


def conv1d_nwc(x, w, b=None, stride: int = 1, padding: int = 0,
               dilation: int = 1, groups: int = 1, compute_dtype=None,
               out_dtype=None):
    """Time-major conv: x (N, T, C_in); w (C_out, C_in/groups, K) — same
    torch-oriented weights as ``conv1d`` — returns (N, T', C_out). NWC is
    the layout XLA:TPU prefers; the channels-first wrapper forces a
    relayout per call.

    The dense k<=3 stride-1 'same' case lowers to shifted-view concat +
    ONE (N*T, K*C_in) x (K*C_in, C_out) matmul instead of lax.conv:
    XLA:TPU's conv lowering wants a (T, N, C) physical layout, which
    forced a transposed relayout of every producer in the denoiser
    (~5 ms/CFG-step of the r2 loop profile); the matmul form keeps the
    whole chain in the C-minor layout every other hot op uses.

    ``w`` may be an int8 pair ``(wmat_int8, scale)`` with wmat already in
    the (K*C_in, C_out) matmul orientation (see
    quantize_diffusion_weights): the dense-case matmul then runs on the
    int8 MXU path with dynamic activation quantization. The kernel size
    is implied by ``padding`` (the dense case requires k = 2*padding+1),
    keeping the pair a clean two-leaf pytree for lax.scan stacking."""
    if compute_dtype is None:
        # parity path stays f32 in EVERY branch: honoring out_dtype only
        # for some kernel sizes would make parity-plane precision depend
        # silently on k/stride/groups
        out_dtype = None
    if isinstance(w, tuple):
        from tortoise_tpu.ops.basic import pdot_int8act

        wq, scale = w
        k = 2 * padding + 1
        assert stride == 1 and dilation == 1 and groups == 1
        if k == 1:
            out = pdot_int8act(x, (wq, scale))
        else:
            # per-tap accumulation: quantize x ONCE per row, then K
            # shifted int8 matmuls against the (C_in, C_out) weight
            # slices, accumulated in f32. vs quantizing the (N, T, K*C_in)
            # window concat: 1/K the absmax/round/clip VPU work and no
            # bf16 window materialization; each row also gets its own
            # scale (slightly MORE accurate than one scale per window).
            pad = (k - 1) // 2
            t = x.shape[1]
            absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            s_row = jnp.maximum(absmax.astype(jnp.float32), 1e-12) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_row),
                          -127, 127).astype(jnp.int8)
            # zero pad rows contribute zero regardless of their scale
            xqp = jnp.pad(xq, ((0, 0), (pad, pad), (0, 0)))
            srp = jnp.pad(s_row, ((0, 0), (pad, pad), (0, 0)))
            cin = wq.shape[0] // k
            wq3 = wq.reshape(k, cin, wq.shape[-1])
            out = None
            for j in range(k):
                acc = jnp.matmul(xqp[:, j : j + t], wq3[j],
                                 preferred_element_type=jnp.int32)
                part = acc.astype(jnp.float32) * srp[:, j : j + t]
                out = part if out is None else out + part
            out = out * scale
        if out_dtype is not None:
            out = out.astype(out_dtype)
        if b is not None:
            out = out + (b.astype(out_dtype) if out_dtype else b)
        return out
    k = w.shape[-1]
    if (k <= 3 and stride == 1 and dilation == 1 and groups == 1
            and padding == (k - 1) // 2 and k % 2 == 1):
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
            precision = None
        else:
            precision = jax.lax.Precision.HIGHEST
        if k == 1:
            xk = x
        else:
            xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
            t = x.shape[1]
            xk = jnp.concatenate([xp[:, j : j + t] for j in range(k)],
                                 axis=-1)                  # (N, T, K*C_in)
        wmat = w.transpose(2, 1, 0).reshape(k * w.shape[1], w.shape[0])
        out = jnp.matmul(xk, wmat,
                         preferred_element_type=out_dtype or jnp.float32,
                         precision=precision)
        if b is not None:
            out = out + (b.astype(out_dtype) if out_dtype else b)
        return out
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "OIW", "NWC"),
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    if out_dtype is not None:
        out = out.astype(out_dtype)
    if b is not None:
        out = out + (b.astype(out_dtype) if out_dtype else b)
    return out


def conv_transpose1d(x, w, b=None, stride: int = 1, compute_dtype=None):
    """Transposed conv matching torch ConvTranspose1d (and the reference's
    ggml_conv_transpose_1d, main.cpp:4155): w (C_in, C_out, K),
    out_len = (T-1)*stride + K."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
    k = w.shape[-1]
    # gradient-style transposed conv: lhs-dilate by stride, full padding,
    # flipped kernel with in/out swapped
    w_flip = jnp.flip(w, axis=-1).swapaxes(0, 1)  # (C_out, C_in, K)
    out = jax.lax.conv_general_dilated(
        x, w_flip,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b[..., :, None]
    return out


def reflect_pad1d(x, pad: int):
    """Reflection padding on the last axis (ggml_pad_reflect_1d,
    main.cpp:4114)."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def nearest_upscale_time(x, out_len: int):
    """Nearest-neighbor upscale along the last (time) axis with
    floor(i*in/out) index semantics — matching torch F.interpolate
     'nearest' and the reference's ggml_upscale_ext (main.cpp:3321)."""
    in_len = x.shape[-1]
    idx = (jnp.arange(out_len) * in_len) // out_len
    return jnp.take(x, idx, axis=-1)
