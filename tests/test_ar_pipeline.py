"""Stage-1 driver tests: padding/trim rules and the end-to-end decode loop
on the tiny config."""

import numpy as np
import pytest

import jax.numpy as jnp

from tortoise_tpu.config import ARConfig, tiny_ar_config
from tortoise_tpu.io.checkpoint import random_ar_params
from tortoise_tpu.pipeline import ar_stage as ap
from tortoise_tpu.models import ar
from tortoise_tpu.rng import ReferenceRng


def test_apply_padding_reference_rules():
    cfg = ARConfig()
    seq = [10, 20, 30, 8139, 8139]
    out = ap.apply_padding(seq, cfg)
    assert len(out) == 502
    assert out[0] == 8192 and out[-1] == 8193
    assert out[1:4] == [10, 20, 30]
    assert all(t == 83 for t in out[4:498])
    assert out[498:501] == [45, 45, 248]
    # input not mutated
    assert seq == [10, 20, 30, 8139, 8139]


def test_apply_padding_overwrites_tail_even_when_long():
    cfg = ARConfig()
    seq = list(range(1, 501))  # exactly 500
    out = ap.apply_padding(seq, cfg)
    assert out[1:498] == list(range(1, 498))
    assert out[498:501] == [45, 45, 248]


def test_apply_padding_rejects_too_long():
    with pytest.raises(ValueError):
        ap.apply_padding(list(range(501)), ARConfig())


def test_trim_latents_calm_rule():
    cfg = ARConfig()
    d = 4
    lat = np.arange(500 * d, dtype=np.float32).reshape(1, 500, d)
    seq = [8192] + [7] * 10 + [83] * 490 + [8193]
    # positions: 10 real + first 8 calm kept, the 9th calm breaks
    out = ap.trim_latents(lat, [seq], cfg)
    assert out[0].shape == (18, d)
    np.testing.assert_array_equal(out[0], lat[0, :18])


def test_trim_latents_interrupted_calm_runs():
    cfg = ARConfig()
    lat = np.zeros((1, 500, 2), np.float32)
    codes = [83] * 8 + [7] + [83] * 8 + [7] + [83] * 491
    seq = [8192] + codes[:500] + [8193]
    out = ap.trim_latents(lat, [seq], cfg)
    # calm counter resets at each 7; final run breaks at its 9th calm
    assert out[0].shape[0] == 8 + 1 + 8 + 1 + 8


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_ar_config()
    params = random_ar_params(cfg, seed=3)
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, cfg.n_text_vocab, 9).tolist()
    voice = rng.normal(0, 0.5, (cfg.d_model,)).astype(np.float32)
    return cfg, params, tokens, voice


def test_autoregressive_jax_sampler(tiny):
    cfg, params, tokens, voice = tiny
    latents, seqs = ap.autoregressive(
        params, tokens, voice, batch_size=2, cfg=cfg, sampler="jax", seed=0
    )
    assert len(latents) == 2 and len(seqs) == 2
    for s in seqs:
        assert len(s) == cfg.pad_mel_length + 2
        assert s[0] == cfg.start_mel_token and s[-1] == cfg.stop_mel_token
    for l in latents:
        assert l.ndim == 2 and l.shape[1] == cfg.d_model
        assert 0 < l.shape[0] <= cfg.pad_mel_length


def test_autoregressive_jax_sampler_deterministic(tiny):
    cfg, params, tokens, voice = tiny
    a = ap.autoregressive(params, tokens, voice, 1, cfg, "jax", seed=5)
    b = ap.autoregressive(params, tokens, voice, 1, cfg, "jax", seed=5)
    assert a[1] == b[1]
    np.testing.assert_array_equal(a[0][0], b[0][0])


def test_autoregressive_reference_sampler(tiny):
    cfg, params, tokens, voice = tiny
    latents, seqs = ap.autoregressive(
        params, tokens, voice, batch_size=1, cfg=cfg, sampler="reference",
        rng=ReferenceRng(9, force_python=True),
    )
    assert seqs[0][0] == cfg.start_mel_token
    assert len(seqs[0]) == cfg.pad_mel_length + 2
    # deterministic given the same engine state
    latents2, seqs2 = ap.autoregressive(
        params, tokens, voice, batch_size=1, cfg=cfg, sampler="reference",
        rng=ReferenceRng(9, force_python=True),
    )
    assert seqs == seqs2


def test_bucket_selection():
    assert ap.pick_bucket(1) == 32
    assert ap.pick_bucket(32) == 32
    assert ap.pick_bucket(33) == 64
    assert ap.pick_bucket(404) == 404
    with pytest.raises(ValueError):
        ap.pick_bucket(405)


def test_int8_weights_close_and_runs(tiny):
    """Opt-in int8 AR weights: per-column quantization keeps prefill
    logits within ~1% relative, and the full stage runs end to end."""
    import jax.numpy as jnp

    from tortoise_tpu.models import ar

    cfg, params, tokens, voice = tiny
    b = 1
    t = len(tokens)
    text_ids = np.zeros((b, 16), np.int32)
    text_valid = np.zeros((b, 16), bool)
    text_ids[:, :t] = tokens
    text_valid[:, :t] = True

    pf32 = ap.cast_matmul_weights(params, None)
    pint8 = ap.cast_matmul_weights(params, None, int8=True)
    lf, _ = ar.prefill(pf32, cfg, jnp.asarray(text_ids),
                       jnp.asarray(text_valid), jnp.asarray(voice))
    lq, _ = ar.prefill(pint8, cfg, jnp.asarray(text_ids),
                       jnp.asarray(text_valid), jnp.asarray(voice))
    scale = float(np.max(np.abs(np.asarray(lf)))) + 1e-9
    err = float(np.max(np.abs(np.asarray(lq) - np.asarray(lf)))) / scale
    assert err < 0.02, f"int8 relative logit error {err:.4f}"

    latents, seqs = ap.autoregressive(
        params, tokens, voice, batch_size=1, cfg=cfg, sampler="jax",
        seed=0, int8_weights=True
    )
    assert len(seqs) == 1 and seqs[0][0] == cfg.start_mel_token
    assert np.isfinite(latents[0]).all()


def test_quantize_cols_roundtrip_error():
    """Per-column int8 quantization: worst-case roundtrip error is half a
    quantization step per element, scales per (layer, column)."""
    import jax.numpy as jnp

    from tortoise_tpu.ops.basic import quantize_cols

    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.04, (3, 32, 48)).astype(np.float32)
    wq, scale = quantize_cols(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and scale.shape == (3, 1, 48)
    recon = np.asarray(wq, np.float32) * np.asarray(scale)
    step = np.asarray(scale)
    assert (np.abs(recon - w) <= 0.5 * step + 1e-9).all()


def test_quantize_cols_host_matches_device():
    """The host (numpy) quantize twin must be bit-identical to the jnp
    plane: pipelines pick one or the other by leaf residency (host int8
    upload ships 1 byte/weight through the tunnel), so any divergence
    would make cold-start runs differ from warm ones."""
    import jax.numpy as jnp

    from tortoise_tpu.ops.basic import quantize_cols, quantize_cols_host

    rng = np.random.default_rng(5)
    w = rng.normal(0, 0.04, (2, 40, 56)).astype(np.float32)
    w[0, 3, :] = 0.0  # exercise the zero-column epsilon guard
    wq_d, sc_d = quantize_cols(jnp.asarray(w))
    wq_h, sc_h = quantize_cols_host(w)
    np.testing.assert_array_equal(np.asarray(wq_d), wq_h)
    np.testing.assert_array_equal(np.asarray(sc_d), sc_h)


def test_trim_keep_lengths_matches_trim_latents(tiny):
    cfg, *_ = tiny
    seqs = [
        ap.apply_padding([7, 9, cfg.calm_token, 11], cfg),
        ap.apply_padding([cfg.calm_token] * 3, cfg),
    ]
    lat = np.arange(2 * cfg.pad_mel_length * 4, dtype=np.float32).reshape(
        2, cfg.pad_mel_length, 4)
    keeps = ap.trim_keep_lengths(seqs, cfg)
    trimmed = ap.trim_latents(lat, seqs, cfg)
    for k, t in zip(keeps, trimmed):
        assert t.shape[0] == k


def test_sampler_params_reach_the_math(tiny):
    """Per-call sampler settings must change the sampled stream (same
    seed), accept dicts with partial overrides, reject bad values, and a
    top_k over the fused kernel's 128-lane domain must route to the XLA
    sampler plane (still producing valid sequences)."""
    cfg, params, tokens, voice = tiny
    base = ap.autoregressive(params, tokens, voice, 1, cfg, "jax", seed=5)
    hot = ap.autoregressive(params, tokens, voice, 1, cfg, "jax", seed=5,
                            sampler_params=(9.0, 30, 0.0, 1.0))
    assert base[1] != hot[1]
    # dict form with partial override == tuple form with the rest default
    d = ap.autoregressive(params, tokens, voice, 1, cfg, "jax", seed=5,
                          sampler_params={"temperature": 9.0, "top_k": 30,
                                          "top_p_drop": 0.0,
                                          "repetition_penalty": 1.0})
    assert d[1] == hot[1]
    # defaults explicit == defaults implicit
    expl = ap.autoregressive(params, tokens, voice, 1, cfg, "jax", seed=5,
                             sampler_params=ar.DEFAULT_SAMPLER)
    assert expl[1] == base[1]

    with pytest.raises(ValueError):
        ap.normalize_sampler((0.0, 50, 0.2, 2.0))
    with pytest.raises(ValueError):
        ap.normalize_sampler({"nope": 1})

    # oversized top_k: fused plane must gate off, XLA plane must run
    import jax.numpy as jnp

    from tortoise_tpu.models import ar as armod

    qp = ap.cast_matmul_weights(params, jnp.bfloat16, int8=True)
    assert armod.can_fuse_sampling(qp, cfg, jnp.bfloat16, 1)
    assert not armod.can_fuse_sampling(qp, cfg, jnp.bfloat16, 1,
                                       (0.8, 200, 0.2, 2.0))
    wide = ap.autoregressive(params, tokens, voice, 1, cfg, "jax", seed=5,
                             compute_dtype=jnp.bfloat16, int8_weights=True,
                             sampler_params=(0.8, 200, 0.2, 2.0))
    s = wide[1][0]
    assert s[0] == cfg.start_mel_token and s[-1] == cfg.stop_mel_token
