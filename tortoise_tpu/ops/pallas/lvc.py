"""Location-variable convolution as a Pallas TPU kernel.

The vocoder's LVC (main.cpp:4378-4428) applies a per-hop-chunk predicted
kernel:

    out[o, l*hop + s] = sum_{i,k} x_pad[i, l*hop + s + k] * K[i, o, k, l]
    (+ bias[o, l]), followed by the gated sigmoid(0:C)·tanh(C:2C) and the
    residual add (main.cpp:4437-4455).

This kernel fuses the whole conv_block tail — window matmul, bias, gate,
residual — into one pass: the grid is (B, L/BL) chunk blocks; each program
loops over its BL chunks doing an MXU (hop, K*C_in) x (K*C_in, 2C) matmul
with the chunk's predicted kernel. The K-tap windows arrive as K
pre-shifted copies of x (built once outside, so blocks need no overlap).

The XLA path (models/vocoder.location_variable_conv) remains the default
and the A/B oracle; enable with VocoderConfig.use_pallas_lvc.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _lvc_kernel(xs_ref, kern_ref, bias_ref, res_ref, out_ref, *,
                bl: int, hop: int, c_res: int):
    # chunk-major layouts: all dynamic indexing happens on a leading dim
    # (Mosaic rejects dynamic non-128 slices of the lane dimension)
    def chunk(l, _):
        xs = xs_ref[0, l]                                # (K*C_in, hop)
        kk = kern_ref[0, l]                              # (K*C_in, 2C)
        o = jnp.dot(kk.T.astype(jnp.float32), xs.astype(jnp.float32),
                    preferred_element_type=jnp.float32)  # (2C, hop)
        o = o + bias_ref[0, l].T                         # (2C, 1) bcast
        gate = jax.nn.sigmoid(o[:c_res])
        filt = jnp.tanh(o[c_res:])
        out_ref[0, l] = (
            res_ref[0, l].astype(jnp.float32) + gate * filt
        ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bl, chunk, 0)


@functools.partial(jax.jit, static_argnames=("hop", "interpret"))
def lvc_gated_residual(x, kernel, bias, residual, hop: int,
                       interpret: bool = False):
    """x (B, C_in, T); kernel (B, C_in, 2C, K, L); bias (B, 2C, L);
    residual (B, C, T); T = L*hop. Returns residual + gated LVC, f32."""
    b, c_in, t = x.shape
    _, _, c2, k, l = kernel.shape
    c_res = c2 // 2
    # K pre-shifted copies so chunk blocks need no halo: rows (k, i)
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    shifted = jnp.stack([xp[:, :, j : j + t] for j in range(k)], axis=1)
    shifted = shifted.reshape(b, k * c_in, t)
    # kern rows must match: (B, L, K*C_in, 2C)
    kern = kernel.transpose(0, 4, 3, 1, 2).reshape(b, l, k * c_in, c2)
    bias_r = bias.transpose(0, 2, 1)[:, :, None, :]  # (B, L, 1, 2C)

    # block BL chunks per program (amortizes grid overhead at small hops)
    bl = max(1, 128 // hop) if hop < 128 else 1
    pad_l = (-l) % bl
    if pad_l:
        widths = [(0, 0), (0, pad_l)]
        kern = jnp.pad(kern, widths + [(0, 0), (0, 0)])
        bias_r = jnp.pad(bias_r, widths + [(0, 0), (0, 0)])
        shifted = jnp.pad(shifted, [(0, 0), (0, 0), (0, pad_l * hop)])
        residual = jnp.pad(residual, [(0, 0), (0, 0), (0, pad_l * hop)])
    lp = l + pad_l
    tp = lp * hop

    # chunk-major: (B, L, rows, hop) so each chunk's window is a leading-
    # indexed tile
    shifted_c = shifted.reshape(b, k * c_in, lp, hop).transpose(0, 2, 1, 3)
    res_c = residual.reshape(b, c_res, lp, hop).transpose(0, 2, 1, 3)

    out = pl.pallas_call(
        functools.partial(_lvc_kernel, bl=bl, hop=hop, c_res=c_res),
        grid=(b, lp // bl),
        in_specs=[
            pl.BlockSpec((1, bl, k * c_in, hop),
                         lambda bi, li: (bi, li, 0, 0)),
            pl.BlockSpec((1, bl, k * c_in, c2),
                         lambda bi, li: (bi, li, 0, 0)),
            pl.BlockSpec((1, bl, 1, c2), lambda bi, li: (bi, li, 0, 0)),
            pl.BlockSpec((1, bl, c_res, hop),
                         lambda bi, li: (bi, li, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bl, c_res, hop),
                               lambda bi, li: (bi, li, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lp, c_res, hop), jnp.float32),
        interpret=interpret,
    )(shifted_c, kern, bias_r, res_c)
    out = out.transpose(0, 2, 1, 3).reshape(b, c_res, tp)
    return out[:, :, :t]
