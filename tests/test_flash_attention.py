"""Pallas flash-attention kernel vs the XLA reference (interpret mode on
CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.ops.pallas.flash_attention import (
    flash_attention,
    xla_attention,
)


def rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(0, scale, shape).astype(np.float32)
    )


@pytest.mark.parametrize("t", [16, 40, 128])
def test_plain_attention_matches(t):
    b, h, d = 2, 3, 32
    q, k, v = (rand((b, h, t, d), s) for s in (1, 2, 3))
    got = flash_attention(q, k, v, bq=16, bk=16, interpret=True)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bias_and_mask():
    b, h, t, d = 2, 2, 48, 16
    q, k, v = (rand((b, h, t, d), s) for s in (1, 2, 3))
    bias = rand((h, t, t), 4, 2.0)
    valid = np.ones((b, t), bool)
    valid[0, 40:] = False
    valid[1, 13:] = False
    got = flash_attention(q, k, v, bias, jnp.asarray(valid), bq=16, bk=16,
                          interpret=True)
    want = xla_attention(q, k, v, bias, jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got)[:, :, :40],
                               np.asarray(want)[:, :, :40], atol=2e-5)


def test_causal():
    b, h, t, d = 1, 2, 64, 32
    q, k, v = (rand((b, h, t, d), s) for s in (5, 6, 7))
    got = flash_attention(q, k, v, causal=True, bq=16, bk=16,
                          interpret=True)
    want = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_causal_with_key_mask():
    b, h, t, d = 2, 1, 32, 16
    q, k, v = (rand((b, h, t, d), s) for s in (8, 9, 10))
    valid = np.ones((b, t), bool)
    valid[:, 5:9] = False  # padded text region mid-sequence
    got = flash_attention(q, k, v, kv_valid=jnp.asarray(valid), causal=True,
                          bq=8, bk=8, interpret=True)
    want = xla_attention(q, k, v, kv_valid=jnp.asarray(valid), causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_unaligned_length_pads():
    b, h, t, d = 1, 1, 37, 16
    q, k, v = (rand((b, h, t, d), s) for s in (11, 12, 13))
    got = flash_attention(q, k, v, bq=16, bk=16, interpret=True)
    want = xla_attention(q, k, v)
    assert got.shape == (b, h, t, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bf16_inputs():
    b, h, t, d = 1, 2, 32, 32
    q, k, v = (rand((b, h, t, d), s).astype(jnp.bfloat16)
               for s in (1, 2, 3))
    got = flash_attention(q, k, v, bq=16, bk=16, interpret=True)
    want = xla_attention(q, k, v)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.02)


def test_table_bias_mode_matches_materialized():
    from tortoise_tpu.ops.relpos import relative_position_buckets, relpos_bias

    b, h, t, d = 1, 4, 48, 16
    q, k, v = (rand((b, h, t, d), s) for s in (1, 2, 3))
    table = rand((32, h), 9, 0.5)
    buckets = jnp.asarray(relative_position_buckets(t))
    bias = relpos_bias(table, buckets)  # (H, T, T), x8 scale
    valid = np.ones((b, t), bool)
    valid[0, 41:] = False
    got = flash_attention(q, k, v, bias_buckets=buckets, bias_table=table,
                          kv_valid=jnp.asarray(valid), bq=16, bk=16,
                          interpret=True)
    want = xla_attention(q, k, v, bias, jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got)[:, :, :41],
                               np.asarray(want)[:, :, :41], atol=2e-5)


def test_grouped_band_bias_path():
    """The grouped band-bias fast path (bias_formula, square blocks >= 64)
    must match XLA attention with the materialized rel-pos bias."""
    from tortoise_tpu.ops.relpos import relative_position_buckets, relpos_bias

    b, h, t, d = 2, 4, 200, 16
    q, k, v = (rand((b, h, t, d), s) for s in (1, 2, 3))
    table = rand((32, h), 4, 0.2)
    valid = np.ones((b, t), bool)
    valid[1, 190:] = False
    got = flash_attention(q, k, v, None, jnp.asarray(valid),
                          bias_table=table, bias_formula=True,
                          interpret=True)
    buckets = jnp.asarray(relative_position_buckets(t))
    bias = relpos_bias(table, buckets)
    want = xla_attention(q, k, v, bias, jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got, np.float32)[:, :, :190],
                               np.asarray(want)[:, :, :190], atol=2e-4)


def test_packed_qkv_path():
    """flash_attention_packed consumes the fused (B, T, 3HD) qkv tensor
    with per-head-interleaved channels and must match XLA attention with
    the materialized rel-pos bias."""
    from tortoise_tpu.ops.pallas.flash_attention import flash_attention_packed
    from tortoise_tpu.ops.relpos import relative_position_buckets, relpos_bias

    b, h, t, d = 2, 2, 200, 64  # 6*D % 128 == 0: the packed-path contract
    q, k, v = (rand((b, h, t, d), s) for s in (11, 12, 13))
    table = rand((32, h), 14, 0.2)
    valid = np.ones((b, t), bool)
    valid[1, 170:] = False
    qkv = jnp.concatenate(
        [jnp.concatenate([q[:, hh], k[:, hh], v[:, hh]], axis=-1)
         for hh in range(h)], axis=-1)  # (B, T, 3HD) interleaved
    got = flash_attention_packed(qkv, h, jnp.asarray(valid),
                                 bias_table=table, interpret=True)
    buckets = jnp.asarray(relative_position_buckets(t))
    bias = relpos_bias(table, buckets)
    want = xla_attention(q, k, v, bias, jnp.asarray(valid))
    want = jnp.swapaxes(want, 1, 2).reshape(b, t, h * d)
    np.testing.assert_allclose(np.asarray(got, np.float32)[:, :170],
                               np.asarray(want)[:, :170], atol=2e-4)


def test_formula_blocks_path_small():
    """Small-T inputs take the generic precomputed-blocks path; it must
    agree with the materialized bias too."""
    from tortoise_tpu.ops.relpos import relative_position_buckets, relpos_bias

    b, h, t, d = 1, 2, 40, 16
    q, k, v = (rand((b, h, t, d), s) for s in (5, 6, 7))
    table = rand((32, h), 8, 0.2)
    got = flash_attention(q, k, v, None, None, bias_table=table,
                          bias_formula=True, interpret=True)
    buckets = jnp.asarray(relative_position_buckets(t))
    bias = relpos_bias(table, buckets)
    want = xla_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=2e-4)


def test_packed_hpp_one_clamps_to_two():
    """hpp=1 (a plausible tuning value) must clamp to 2, not
    ZeroDivisionError at trace time."""
    import numpy as np

    import jax.numpy as jnp

    from tortoise_tpu.ops.pallas.flash_attention import (
        flash_attention_packed,
    )

    rng = np.random.default_rng(0)
    h, d, t = 4, 64, 128
    qkv = jnp.asarray(rng.normal(0, 1, (1, t, 3 * h * d)), jnp.float32)
    table = jnp.asarray(rng.normal(0, 0.3, (32, h)), jnp.float32)
    out1 = flash_attention_packed(qkv, h, None, bias_table=table, bq=64,
                                  interpret=True, hpp=1)
    out2 = flash_attention_packed(qkv, h, None, bias_table=table, bq=64,
                                  interpret=True, hpp=2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5)
