"""UnivNet-style kernel-predictor / location-variable-convolution vocoder.

Functional equivalent of the reference's `vocoder_graph`
(main.cpp:4068-4483), TPU-native: the LVC's unfold/einsum chain
(main.cpp:4378-4428) becomes one batched per-chunk matmul (MXU-shaped
(L, hop, 3*C_in) x (L, 3*C_in, C_out)), lengths round to static buckets
with explicit masking, and the whole mel->audio pass is a single jitted
call.

Structure (loader names at main.cpp:1780-1990):

- input: 64-ch Gaussian noise of length M (= mel frames + 10); reflect pad
  3 -> conv_pre k7 64->32 (main.cpp:4097-4121)
- 3 upsample stages (strides 8,8,4; post-trim paddings 4,4,2; LVC hop
  sizes 8,64,256 — main.cpp:4132-4134):
    leaky(0.2) -> conv_transpose k=2*stride -> trim `padding` both sides
    kernel predictor on the padded mel: conv k5 pad2 100->64, leaky, 3 x
    [conv k3 -> leaky -> conv k3 -> leaky] residual blocks, then
    kernel_conv k3 -> 24576 ch and bias_conv k3 -> 256 ch
    (main.cpp:4169-4324)
    4 conv_blocks (dilations 1,3,9,27): leaky -> conv k3 dil d -> leaky ->
    LVC(kernel[c], bias[c], hop) -> gated sigmoid(0:32)*tanh(32:64) ->
    residual add (main.cpp:4326-4455)
- leaky -> conv_post k7 32->1 with NO padding: the reference omits the
  upstream reflect-pad here, so audio length = M*256 - 6
  (main.cpp:4459-4478; target_audio.bin is 50,426 = 197*256-6 samples)

Kernel tensor layout: the 24576-ch kernel-conv output splits as
[conv_block c][c_in 32][c_out 64][tap 3] and the 256-ch bias output as
[conv_block c][c_out 64] (reshapes at main.cpp:4325-4383).

LVC semantics (dilation 1): with x zero-padded by 1,
out[o, l*hop + s] = sum_{i,k} x_pad[i, l*hop + s + k] * kernel[i, o, k, l],
then + bias[o, l] — each hop-chunk uses the kernel predicted at its mel
frame l.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tortoise_tpu.config import VocoderConfig
from tortoise_tpu.ops.basic import leaky_relu
from tortoise_tpu.ops.conv import conv1d, conv_transpose1d, reflect_pad1d


def _mask_time(x, valid_len):
    """Zero (B, C, T) beyond the traced valid length (scalar or (B,))."""
    if valid_len is None:
        return x
    t = x.shape[-1]
    valid_len = jnp.asarray(valid_len)
    if valid_len.ndim == 0:
        ok = jnp.arange(t)[None, None, :] < valid_len
    else:
        ok = jnp.arange(t)[None, None, :] < valid_len[:, None, None]
    return jnp.where(ok, x, 0.0)


def reflect_extend(x, true_len, pad: int):
    """Write the right-edge reflection of a length-`true_len` signal into
    the `pad` slots following it (for bucketed buffers whose array edge is
    not the signal edge). x: (B, C, T); true_len traced scalar or (B,)."""
    if true_len is None:
        return x
    t = x.shape[-1]
    true_len = jnp.asarray(true_len)
    if true_len.ndim == 0:
        true_len = jnp.broadcast_to(true_len, (x.shape[0],))
    tl = true_len[:, None]  # (B, 1)
    idx_out = jnp.arange(t)[None, :]
    # positions true_len + j (j in 0..pad-1) take value at true_len - 2 - j
    j = idx_out - tl
    src = jnp.clip(tl - 2 - j, 0, t - 1)
    reflected = jnp.take_along_axis(
        x, jnp.broadcast_to(src[:, None, :], x.shape[:-1] + (t,)), axis=-1
    )
    use = (j >= 0) & (j < pad)
    return jnp.where(use[:, None, :], reflected, x)


def kernel_predictor(stage, mel, cfg: VocoderConfig, valid_len=None,
                     compute_dtype=None):
    """Padded mel (B, n_mel, L) -> (kernels (B, nblk, C_in, C_out, K, L),
    biases (B, nblk, C_out, L)) (main.cpp:4169-4324)."""
    b, _, l = mel.shape
    nblk = len(cfg.dilations)
    c = _mask_time(mel, valid_len)
    c = conv1d(c, stage["kp_in_w"], stage["kp_in_b"], padding=2,
               compute_dtype=compute_dtype)
    c = leaky_relu(c, cfg.leaky_slope)

    def res(c, blk):
        y = _mask_time(c, valid_len)
        y = conv1d(y, blk["w1"], blk["b1"], padding=1,
                   compute_dtype=compute_dtype)
        y = leaky_relu(y, cfg.leaky_slope)
        y = _mask_time(y, valid_len)
        y = conv1d(y, blk["w3"], blk["b3"], padding=1,
                   compute_dtype=compute_dtype)
        y = leaky_relu(y, cfg.leaky_slope)
        return c + y, None

    c, _ = jax.lax.scan(res, c, stage["kp_res"])
    c = _mask_time(c, valid_len)
    kernels = conv1d(c, stage["kp_kernel_w"], stage["kp_kernel_b"],
                     padding=1, compute_dtype=compute_dtype)
    biases = conv1d(c, stage["kp_bias_w"], stage["kp_bias_b"], padding=1,
                    compute_dtype=compute_dtype)
    kernels = kernels.reshape(b, nblk, cfg.ch, cfg.lvc_out_ch,
                              cfg.lvc_kernel, l)
    biases = biases.reshape(b, nblk, cfg.lvc_out_ch, l)
    return kernels, biases


def location_variable_conv(x, kernel, bias, hop: int, compute_dtype=None):
    """x (B, C_in, T); kernel (B, C_in, C_out, K, L); bias (B, C_out, L);
    T = L*hop. One batched matmul per hop-chunk (main.cpp:4378-4428)."""
    b, c_in, t = x.shape
    _, _, c_out, k, l = kernel.shape
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    # windows[b, l, s, k*C_in + i] = xp[b, i, l*hop + s + k] — tap-MAJOR
    # column order via a channel-axis concat: stacking the K shifted views
    # on their own axis makes a (B, C_in, K, T) intermediate whose K=3
    # sublane dim pads 8/3 ≈ 4x in HBM (6.5 GB at the B=16 serving point)
    shifted = jnp.concatenate([xp[:, :, j : j + t] for j in range(k)],
                              axis=1)                # (B, K*C_in, T)
    win = shifted.transpose(0, 2, 1)
    win = win.reshape(b, l, hop, c_in * k)
    # kern[b, l, k*C_in + i, o] — matching tap-major order
    kern = kernel.transpose(0, 4, 3, 1, 2).reshape(b, l, c_in * k, c_out)
    if compute_dtype is not None:
        win = win.astype(compute_dtype)
        kern = kern.astype(compute_dtype)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
    out = jnp.matmul(win, kern, preferred_element_type=jnp.float32,
                     precision=precision)  # (B, L, hop, C_out)
    out = out + bias.transpose(0, 2, 1)[:, :, None, :]
    return out.transpose(0, 3, 1, 2).reshape(b, c_out, l * hop)


def vocoder_forward(params, cfg: VocoderConfig, mel, noise, mel_len=None,
                    compute_dtype=None):
    """mel (B, n_mel, M): denormalized + 10 pad frames (+ optional zero
    bucket padding with `mel_len` the true M); noise (B, noise_ch, M).
    Returns audio (B, M * prod(strides) - 6)."""
    if mel_len is None:
        x = reflect_pad1d(noise, 3)
    else:
        # bucketed: reflect at the TRUE signal edges, not the bucket edges.
        # Surround with 3 explicit zero slots so the right-edge reflection
        # always has room even when the bucket slack is < 3, then write
        # the reflections: left pad is static (signal starts at offset 3),
        # right pad lands at the traced true length.
        x = _mask_time(noise, mel_len)
        x = jnp.pad(x, ((0, 0), (0, 0), (3, 3)))
        x = x.at[:, :, 0:3].set(x[:, :, 6:3:-1])
        x = reflect_extend(x, jnp.asarray(mel_len) + 3, 3)
    x = conv1d(x, params["pre_w"], params["pre_b"], padding=0,
               compute_dtype=compute_dtype)

    up = 1
    # stages are a python list (convt kernel sizes differ per stage:
    # 2*stride), so no cross-stage stacking
    for i, stride in enumerate(cfg.strides):
        stage = params["stages"][i]
        valid = None if mel_len is None else mel_len * up
        x = _mask_time(leaky_relu(x, cfg.leaky_slope), valid)
        x = conv_transpose1d(x, stage["convt_w"], stage["convt_b"],
                             stride=stride, compute_dtype=compute_dtype)
        trim = cfg.trim_paddings[i]
        x = x[:, :, trim : x.shape[-1] - trim]
        up *= stride
        valid = None if mel_len is None else mel_len * up
        x = _mask_time(x, valid)

        kernels, biases = kernel_predictor(stage, mel, cfg, mel_len,
                                           compute_dtype)
        hop = cfg.hop_sizes[i]
        for c, dil in enumerate(cfg.dilations):
            y = leaky_relu(x, cfg.leaky_slope)
            y = _mask_time(y, valid)
            y = conv1d(y, stage["cb_w"][c], stage["cb_b"][c], padding=dil,
                       dilation=dil, compute_dtype=compute_dtype)
            y = leaky_relu(y, cfg.leaky_slope)
            y = _mask_time(y, valid)
            if cfg.use_pallas_lvc:
                from tortoise_tpu.ops.pallas.lvc import lvc_gated_residual

                x = lvc_gated_residual(
                    y, kernels[:, c], biases[:, c], x, hop,
                    interpret=jax.default_backend() != "tpu")
            else:
                y = location_variable_conv(y, kernels[:, c], biases[:, c],
                                           hop, compute_dtype)
                gate = jax.nn.sigmoid(y[:, : cfg.ch])
                filt = jnp.tanh(y[:, cfg.ch :])
                x = x + gate * filt
            x = _mask_time(x, valid)

    x = leaky_relu(x, cfg.leaky_slope)
    x = _mask_time(x, None if mel_len is None else mel_len * up)
    audio = conv1d(x, params["post_w"], params["post_b"], padding=0,
                   compute_dtype=compute_dtype)
    return audio[:, 0, :]
