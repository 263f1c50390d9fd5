"""Sampler pipeline tests: the jit plane vs the host parity plane, plus the
reference's documented quirks (main.cpp:4562-4806)."""

import numpy as np

import jax
import jax.numpy as jnp

from tortoise_tpu.ops import sampling as S
from tortoise_tpu.rng import ReferenceRng


def test_repetition_penalty_signs():
    logits = jnp.asarray([[1.0, -1.0, 4.0, 0.5]])
    ids = jnp.asarray([[0, 1]])
    out = np.asarray(S.apply_repetition_penalty(logits, ids, 2.0))
    np.testing.assert_allclose(out[0], [0.5, -2.0, 4.0, 0.5])


def test_top_k_keeps_threshold_ties():
    logits = jnp.asarray([[5.0, 3.0, 3.0, 1.0, 0.0]])
    out = np.asarray(S.top_k_filter(logits, 2))
    # kth largest (k=2) is 3.0; both 3.0s survive (strictly-below rule)
    assert out[0, 0] == 5.0 and out[0, 1] == 3.0 and out[0, 2] == 3.0
    assert out[0, 3] == S.F32_LOWEST and out[0, 4] == S.F32_LOWEST


def test_top_p_drops_low_tail_only():
    # softmax of [0, 0, 8] puts ~99.9% on the last element; the two small
    # ones have cumulative mass <= 0.2 and must be dropped
    logits = jnp.asarray([[0.0, 0.0, 8.0]])
    out = np.asarray(S.top_p_filter(logits, 0.2))
    assert out[0, 2] == 8.0
    assert out[0, 0] == S.F32_LOWEST and out[0, 1] == S.F32_LOWEST


def test_top_p_never_drops_largest():
    # a single dominant token is exempt even when its own cumsum <= p_drop
    # cannot happen; craft uniform logits where every ascending cumsum
    # element <= 0.2 except the top region
    logits = jnp.zeros((1, 4))
    out = np.asarray(S.top_p_filter(logits, 0.2))
    # uniform: ascending cumsum = .25,.5,.75,1 -> nothing <= 0.2, all kept
    np.testing.assert_array_equal(out, np.zeros((1, 4)))


def test_jit_and_host_planes_agree_on_decisions():
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 3, (4, 257)).astype(np.float32)
    prev = rng.integers(0, 257, (4, 3))
    probs_jit = np.asarray(
        S.process_logits(jnp.asarray(logits), jnp.asarray(prev))
    )
    # host plane with the same filters
    r = ReferenceRng(1, force_python=True)
    for b in range(4):
        x = logits[b].copy()
        ids = prev[b]
        g = x[ids]
        x[ids] = np.where(g < 0, g * 2.0, g / 2.0)
        x /= np.float32(0.8)
        kth = np.sort(x)[-50]
        x[x < kth] = S.F32_LOWEST
        order = np.argsort(x, kind="stable")
        p = S._host_softmax_unshifted(x[order])
        cum = np.cumsum(p, dtype=np.float32)
        drop = cum <= 0.2
        drop[-1] = False
        x[order[drop]] = S.F32_LOWEST
        want = S._host_softmax_unshifted(x)
        np.testing.assert_allclose(probs_jit[b], want, atol=2e-6)


def test_host_sampler_consumes_reference_stream():
    """The host sampler must draw exactly two uniforms per sequence per step
    (main.cpp:4708-4709), keeping the stream aligned."""
    logits = np.random.default_rng(3).normal(0, 2, (2, 64)).astype(np.float32)
    a = ReferenceRng(7, force_python=True)
    b = ReferenceRng(7, force_python=True)
    S.host_process_logits_and_sample(logits, [[1], [2]], a)
    b.uniform(4)  # 2 sequences x 2 draws
    np.testing.assert_array_equal(a.uniform(8), b.uniform(8))


def test_sample_from_probs_inverse_cdf():
    probs = jnp.asarray([[0.1, 0.2, 0.7], [1.0, 0.0, 0.0]])
    key = jax.random.PRNGKey(0)
    # second row must always return 0
    for i in range(5):
        s = S.sample_from_probs(jax.random.fold_in(key, i), probs)
        assert int(s[1]) == 0
        assert 0 <= int(s[0]) <= 2


def test_sample_distribution_roughly_matches():
    probs = jnp.broadcast_to(jnp.asarray([0.5, 0.3, 0.2]), (2000, 3))
    s = np.asarray(S.sample_from_probs(jax.random.PRNGKey(1), probs))
    freq = np.bincount(s, minlength=3) / len(s)
    np.testing.assert_allclose(freq, [0.5, 0.3, 0.2], atol=0.05)


def test_topk_domain_pipeline_matches_full():
    rng = np.random.default_rng(5)
    logits = rng.normal(0, 3, (3, 500)).astype(np.float32)
    prev = rng.integers(0, 500, (3, 2))
    full = np.asarray(S.process_logits(jnp.asarray(logits),
                                       jnp.asarray(prev)))
    probs, ids = S.process_logits_topk(jnp.asarray(logits),
                                       jnp.asarray(prev))
    probs, ids = np.asarray(probs), np.asarray(ids)
    compact = np.zeros_like(full)
    for b in range(3):
        compact[b, ids[b]] = probs[b]
    np.testing.assert_allclose(compact, full, atol=1e-6)


def test_sample_from_topk_maps_ids():
    probs = jnp.asarray([[0.0, 1.0, 0.0]])
    ids = jnp.asarray([[7, 42, 3]])
    for i in range(4):
        s = S.sample_from_topk(jax.random.PRNGKey(i), probs, ids)
        assert int(s[0]) == 42
