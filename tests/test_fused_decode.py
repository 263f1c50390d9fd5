"""Fused Pallas decode trunk (ops/pallas/decode_trunk.py) vs the XLA
scan path: identical semantics on the int8 + bf16 production plane.

Runs in interpreter mode on CPU (tests/conftest.py forces the CPU
backend); the TPU timing claims live in the kernel docstring."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from tortoise_tpu.config import tiny_ar_config
from tortoise_tpu.io.checkpoint import random_ar_params
from tortoise_tpu.models import ar
from tortoise_tpu.pipeline.ar_stage import cast_matmul_weights


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_ar_config(), fused_decode=True)
    params = cast_matmul_weights(random_ar_params(cfg, seed=3),
                                 jnp.bfloat16, int8=True)
    rng = np.random.default_rng(0)
    t = 10
    text_ids = jnp.asarray(rng.integers(0, cfg.n_text_vocab, (1, t)),
                           jnp.int32)
    text_valid = jnp.ones((1, t), bool)
    voice = jnp.asarray(rng.normal(0, .5, (cfg.d_model,)), jnp.float32)
    logits, cache = ar.prefill(params, cfg, text_ids, text_valid, voice,
                               jnp.bfloat16)
    return cfg, params, cache


def test_fused_matches_xla_scan(setup):
    cfg, params, cache = setup
    cfg_off = dataclasses.replace(cfg, fused_decode=False)
    c1 = c2 = cache
    for i, tok in enumerate([4, 1, 7, 2]):
        toks = jnp.asarray([tok], jnp.int32)
        l1, c1 = ar.decode_step(params, cfg_off, c1, toks, jnp.int32(i),
                                jnp.bfloat16)
        l2, c2 = ar.decode_step(params, cfg, c2, toks, jnp.int32(i),
                                jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(c2.k, np.float32), np.asarray(c1.k, np.float32),
            atol=1e-4)
        assert int(c2.length) == int(c1.length)
        assert bool(np.all(np.asarray(c2.valid) == np.asarray(c1.valid)))


def test_fused_sampler_matches_xla_chain(setup):
    """decode_sample_step's in-kernel sampler (penalty -> top-k ->
    nucleus -> inverse-CDF) must pick the same token as the XLA chain
    (process_logits_topk + sample_from_topk_u) given the same uniform,
    and advance the cache identically."""
    import jax

    from tortoise_tpu.ops import sampling as S

    cfg, params, cache = setup
    c1 = c2 = cache
    key = jax.random.PRNGKey(7)
    prev = jnp.asarray([4], jnp.int32)
    for i in range(4):
        key, k = jax.random.split(key)
        u = jax.random.uniform(k, (1, 1), jnp.float32)
        logits, c1 = ar.decode_step(params, cfg, c1, prev, jnp.int32(i),
                                    jnp.bfloat16)
        probs, ids = S.process_logits_topk(
            logits, prev[:, None], *_xla_sampler_args(cfg))
        want = S.sample_from_topk_u(u, probs, ids)
        got, c2 = ar.decode_sample_step(params, cfg, c2, prev, jnp.int32(i),
                                        u, jnp.bfloat16)
        assert int(got[0]) == int(want[0]), f"step {i}"
        np.testing.assert_allclose(
            np.asarray(c2.k, np.float32), np.asarray(c1.k, np.float32),
            atol=1e-4)
        prev = got


def _xla_sampler_args(cfg):
    t, k, p, r = ar.DEFAULT_SAMPLER
    return t, min(k, cfg.n_mel_vocab), p, r


def _tile_cache(cache, b):
    return ar.KVCache(jnp.concatenate([cache.k] * b, axis=1),
                      jnp.concatenate([cache.v] * b, axis=1),
                      jnp.concatenate([cache.valid] * b, axis=0),
                      cache.length)


def test_fused_batched_matches_xla_scan(setup):
    """B=4 rides the fused plane (block-diagonal head layout, per-row
    unroll): logits for every row must match the XLA scan path run at
    the same batch."""
    cfg, params, cache = setup
    cfg_off = dataclasses.replace(cfg, fused_decode=False)
    c1 = c2 = _tile_cache(cache, 4)
    for i, tok in enumerate([(4, 1, 7, 2), (3, 9, 0, 5)]):
        toks = jnp.asarray(tok, jnp.int32)
        l1, c1 = ar.decode_step(params, cfg_off, c1, toks, jnp.int32(i),
                                jnp.bfloat16)
        l2, c2 = ar.decode_step(params, cfg, c2, toks, jnp.int32(i),
                                jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(c2.k, np.float32), np.asarray(c1.k, np.float32),
            atol=1e-4)


def test_fused_batched_sampler(setup):
    """decode_sample_step at B=4: per-row tokens match the XLA sampler
    chain fed the same per-row uniforms."""
    import jax

    from tortoise_tpu.ops import sampling as S

    cfg, params, cache = setup
    c1 = c2 = _tile_cache(cache, 4)
    key = jax.random.PRNGKey(11)
    prev = jnp.asarray([4, 1, 9, 2], jnp.int32)
    for i in range(3):
        key, k = jax.random.split(key)
        u = jax.random.uniform(k, (4, 1), jnp.float32)
        logits, c1 = ar.decode_step(params, cfg, c1, prev, jnp.int32(i),
                                    jnp.bfloat16)
        probs, ids = S.process_logits_topk(
            logits, prev[:, None], *_xla_sampler_args(cfg))
        want = S.sample_from_topk_u(u, probs, ids)
        got, c2 = ar.decode_sample_step(params, cfg, c2, prev, jnp.int32(i),
                                        u, jnp.bfloat16)
        assert [int(t) for t in got] == [int(t) for t in want], f"step {i}"
        prev = got


def test_fused_at_max_batch(setup):
    """One step at B=FUSED_MAX_BATCH (the grid's largest row count):
    per-row logits and the KV slab write must match the XLA scan. Guards
    the (L, B) grid layout — a row-indexing slip in the per-(l, row)
    BlockSpecs would corrupt exactly the rows the smaller-B tests never
    touch."""
    cfg, params, cache = setup
    b = ar.FUSED_MAX_BATCH
    cfg_off = dataclasses.replace(cfg, fused_decode=False)
    c1 = c2 = _tile_cache(cache, b)
    # two steps: step 1 reads step 0's K/V slab rows back through the
    # cache, so a v-row written to the wrong bi (invisible in step-0
    # logits — the fresh v enters attention in-kernel) surfaces here
    for i in range(2):
        toks = jnp.asarray((np.arange(b) + 3 * i) % cfg.n_mel_vocab,
                           jnp.int32)
        l1, c1 = ar.decode_step(params, cfg_off, c1, toks, jnp.int32(i),
                                jnp.bfloat16)
        l2, c2 = ar.decode_step(params, cfg, c2, toks, jnp.int32(i),
                                jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(c2.k, np.float32), np.asarray(c1.k, np.float32),
            atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(c2.v, np.float32), np.asarray(c1.v, np.float32),
            atol=1e-4)


def test_fused_gates_correctly(setup):
    """The fused path must not engage off its plane: f32 weights, f32
    compute, or batch > FUSED_MAX_BATCH all take the XLA scan; on-plane
    batched rows must be row-independent (identical rows stay
    identical)."""
    cfg, params, cache = setup
    assert not ar.can_fuse_sampling(params, cfg, jnp.float32, 1)
    assert not ar.can_fuse_sampling(params, cfg, jnp.bfloat16,
                                    ar.FUSED_MAX_BATCH + 1)
    assert ar.can_fuse_sampling(params, cfg, jnp.bfloat16, 1)
    assert ar.can_fuse_sampling(params, cfg, jnp.bfloat16,
                                ar.FUSED_MAX_BATCH)
    pf32 = {k: v for k, v in params.items() if k != "head_pack"}
    assert not ar.can_fuse_sampling(pf32, cfg, jnp.bfloat16, 1)
    c2 = _tile_cache(cache, 2)
    l2, _ = ar.decode_step(params, cfg, c2, jnp.asarray([4, 4], jnp.int32),
                           jnp.int32(0), jnp.bfloat16)
    l1, _ = ar.decode_step(params, cfg, cache, jnp.asarray([4], jnp.int32),
                           jnp.int32(0), jnp.bfloat16)
    # both rows of the B=2 run equal the B=1 run
    np.testing.assert_allclose(np.asarray(l2[0]), np.asarray(l1[0]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(l2[1]), np.asarray(l2[0]),
                               atol=0, rtol=0)


def test_fused_sampler_rejects_oversized_top_k(setup):
    """The in-kernel top-k domain is 128 lanes; a larger top_k must fail
    loudly instead of silently sampling from a truncated candidate set
    (the XLA plane has no such cap, so silence would diverge planes)."""
    cfg, params, cache = setup
    u = jnp.zeros((1, 1), jnp.float32) + 0.5
    with pytest.raises(ValueError, match="top_k <= 128"):
        ar.decode_sample_step(params, cfg, cache,
                              jnp.asarray([4], jnp.int32), jnp.int32(0), u,
                              jnp.bfloat16, sampler=(0.8, 200, 0.2, 2.0))
