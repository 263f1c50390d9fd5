"""Contract tests for ops/basic.py numerics primitives.

The matmul-precision contract matters only on real TPU (CPU f32 matmuls
are exact regardless of the precision flag), so the parity-plane checks
here pin the *emitted jaxpr* rather than output values: the MXU's default
"f32" matmul is a single bf16 pass, and the compute_dtype=None plane
promises true float32 (see pdot's docstring).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tortoise_tpu.ops.basic import pdot, quantize_cols


def _jaxpr_str(fn, *args):
    return str(jax.make_jaxpr(fn)(*args))


def test_pdot_parity_plane_uses_highest_precision():
    x = jnp.ones((4, 8), jnp.float32)
    w = jnp.ones((8, 16), jnp.float32)
    s = _jaxpr_str(lambda a, b: pdot(a, b, None), x, w)
    assert "HIGHEST" in s


def test_pdot_int8_parity_plane_uses_highest_precision():
    # int8 weights + compute_dtype=None (the --int8-weights-without---bf16
    # plane) must also run the multi-pass exact-f32 matmul: the int8
    # values survive any cast, but f32 *activations* would be silently
    # rounded to bf16 by the default single-pass mode.
    x = jnp.ones((4, 8), jnp.float32)
    wq, scale = quantize_cols(jnp.ones((8, 16), jnp.float32))
    s = _jaxpr_str(lambda a, q, sc: pdot(a, (q, sc), None), x, wq, scale)
    assert "HIGHEST" in s


def test_pdot_bf16_plane_does_not_force_precision():
    # the bf16 production plane casts operands and takes the fast path
    x = jnp.ones((4, 8), jnp.float32)
    w = jnp.ones((8, 16), jnp.float32)
    s = _jaxpr_str(lambda a, b: pdot(a, b, jnp.bfloat16), x, w)
    assert "HIGHEST" not in s


def test_pdot_int8_matches_dequantized_matmul():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 24)), jnp.float32)
    wq, scale = quantize_cols(w)
    got = pdot(x, (wq, scale), None)
    want = x @ (wq.astype(jnp.float32) * scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert got.dtype == jnp.float32
