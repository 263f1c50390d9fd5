"""AR transformer unit tests.

The golden oracle is an independent numpy implementation of the exact
architecture (written directly from the reference graph semantics,
main.cpp:2545-3040), evaluated in float64 — not a port of the JAX code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.config import ARConfig, tiny_ar_config
from tortoise_tpu.io.checkpoint import (
    ar_params_from_tensors,
    ar_tensor_inventory,
    random_ar_params,
    random_ggml_tensors,
    load_npz,
    save_npz,
)
from tortoise_tpu.models import ar


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------

def np_layer_norm(x, w=None, b=None, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    out = (x - mean) / np.sqrt(var + eps)
    if w is not None:
        out = out * w
    if b is not None:
        out = out + b
    return out


def np_gelu(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def np_gpt2_forward(params, cfg, x):
    """Full-sequence causal transformer trunk in float64."""
    b, s, d = x.shape
    h_, dh = cfg.n_head, cfg.d_head
    blocks = params["blocks"]
    mask = np.tril(np.ones((s, s), bool))
    for i in range(cfg.n_layer):
        y = np_layer_norm(x, blocks["ln1_w"][i], blocks["ln1_b"][i])
        qkv = y @ blocks["attn_w"][i] + blocks["attn_b"][i]
        q, k, v = np.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, h_, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h_, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h_, dh).transpose(0, 2, 1, 3)
        scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)
        scores = np.where(mask, scores, -np.inf)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ctx = (p @ v).transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + ctx @ blocks["proj_w"][i] + blocks["proj_b"][i]
        y = np_layer_norm(x, blocks["ln2_w"][i], blocks["ln2_b"][i])
        y = np_gelu(y @ blocks["fc_w"][i] + blocks["fc_b"][i])
        x = x + y @ blocks["fc_proj_w"][i] + blocks["fc_proj_b"][i]
    return x


def np_embed_sequence(params, cfg, text_ids, mel_ids, mel_pos, voice):
    b = text_ids.shape[0]
    text = params["text_emb"][text_ids] + params["text_pos"][
        np.arange(text_ids.shape[1])
    ]
    mel = params["mel_emb"][mel_ids] + params["mel_pos"][mel_pos]
    lat = np.broadcast_to(voice, (b, 1, cfg.d_model))
    return np.concatenate([lat, text, mel], axis=1)


def np_head(params, h, cfg):
    h = np_layer_norm(h, params["ln_f_w"], params["ln_f_b"])
    h = np_layer_norm(h)
    h = h * params["lm_ln_w"] + params["lm_ln_b"]
    return h @ params["lm_w"].T + params["lm_b"]


def as_f64(tree):
    return jax.tree.map(lambda a: np.asarray(a, np.float64), tree)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_ar_config()
    params = random_ar_params(cfg, seed=3)
    rng = np.random.default_rng(0)
    b, t = 2, 7
    text_ids = rng.integers(0, cfg.n_text_vocab, (b, t)).astype(np.int32)
    voice = rng.normal(0, 0.5, (cfg.d_model,)).astype(np.float32)
    return cfg, params, text_ids, voice


def test_prefill_matches_numpy_oracle(setup):
    cfg, params, text_ids, voice = setup
    b, t = text_ids.shape
    p64 = as_f64(params)
    mel_ids = np.full((b, 1), cfg.start_mel_token)
    x = np_embed_sequence(p64, cfg, text_ids, mel_ids, np.zeros((b, 1), int),
                          voice.astype(np.float64))
    h = np_gpt2_forward(p64, cfg, x)
    want = np_head(p64, h[:, -1], cfg)

    logits, cache = ar.prefill(
        params, cfg, jnp.asarray(text_ids),
        jnp.ones((b, t), bool), jnp.asarray(voice),
    )
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-3)
    assert int(cache.length) == t + 2
    assert bool(cache.valid[:, : t + 2].all())
    assert not bool(cache.valid[:, t + 2 :].any())


def test_decode_matches_full_forward(setup):
    """KV-cached decode must equal running the whole sequence at once."""
    cfg, params, text_ids, voice = setup
    b, t = text_ids.shape
    rng = np.random.default_rng(7)
    n_steps = 5
    sampled = rng.integers(0, cfg.n_mel_vocab - 4, (n_steps, b)).astype(np.int32)

    logits, cache = ar.prefill(
        params, cfg, jnp.asarray(text_ids), jnp.ones((b, t), bool),
        jnp.asarray(voice),
    )
    step_fn = jax.jit(
        lambda c, tok, s: ar.decode_step(params, cfg, c, tok, s)
    )
    got = [np.asarray(logits)]
    for s in range(n_steps):
        logits, cache = step_fn(cache, jnp.asarray(sampled[s]), jnp.int32(s))
        got.append(np.asarray(logits))

    # oracle: full forward over [latent | text | start + sampled tokens],
    # mel positions 0,2,3,4,... (the reference skips position 1)
    p64 = as_f64(params)
    mel_ids = np.concatenate(
        [np.full((b, 1), cfg.start_mel_token), sampled.T], axis=1
    )
    mel_pos = np.array([0] + [i + 2 for i in range(n_steps)])
    x = np_embed_sequence(p64, cfg, text_ids, mel_ids,
                          np.broadcast_to(mel_pos, (b, n_steps + 1)),
                          voice.astype(np.float64))
    h = np_gpt2_forward(p64, cfg, x)
    for s in range(n_steps + 1):
        want = np_head(p64, h[:, t + 1 + s], cfg)
        np.testing.assert_allclose(got[s], want, atol=2e-3,
                                   err_msg=f"step {s}")


def test_text_padding_invariance(setup):
    """Padding text to a bucket with masking must not change the logits."""
    cfg, params, text_ids, voice = setup
    b, t = text_ids.shape
    pad = 4
    padded = np.concatenate(
        [text_ids, np.zeros((b, pad), np.int32)], axis=1
    )
    valid = np.concatenate(
        [np.ones((b, t), bool), np.zeros((b, pad), bool)], axis=1
    )
    l1, c1 = ar.prefill(params, cfg, jnp.asarray(text_ids),
                        jnp.ones((b, t), bool), jnp.asarray(voice))
    l2, c2 = ar.prefill(params, cfg, jnp.asarray(padded),
                        jnp.asarray(valid), jnp.asarray(voice))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)
    # decode after padded prefill also matches
    tok = jnp.asarray(np.full((b,), 3, np.int32))
    d1, _ = ar.decode_step(params, cfg, c1, tok, jnp.int32(0))
    d2, _ = ar.decode_step(params, cfg, c2, tok, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)


def test_latent_forward_matches_numpy(setup):
    cfg, params, text_ids, voice = setup
    b, t = text_ids.shape
    rng = np.random.default_rng(11)
    m = cfg.pad_mel_length + 2
    mel_ids = rng.integers(0, cfg.n_mel_vocab, (b, m)).astype(np.int32)

    got = ar.latent_forward(params, cfg, jnp.asarray(text_ids),
                            jnp.ones((b, t), bool), jnp.asarray(mel_ids),
                            jnp.asarray(voice))
    p64 = as_f64(params)
    x = np_embed_sequence(p64, cfg, text_ids, mel_ids,
                          np.broadcast_to(np.arange(m), (b, m)),
                          voice.astype(np.float64))
    h = np_gpt2_forward(p64, cfg, x)
    h = np_layer_norm(h, p64["ln_f_w"], p64["ln_f_b"])
    h = np_layer_norm(h)
    h = h * p64["lm_ln_w"] + p64["lm_ln_b"]
    want = h[:, 1 + t : 1 + t + m - 2]
    assert got.shape == (b, m - 2, cfg.d_model)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_qkv_f16_quirk_close_to_clean(setup):
    # the reference's f16 round-trip (main.cpp:2789) shifts logits by well
    # under its own 1e-2 golden tolerance
    cfg, params, text_ids, voice = setup
    b, t = text_ids.shape
    l0, _ = ar.prefill(params, cfg, jnp.asarray(text_ids),
                       jnp.ones((b, t), bool), jnp.asarray(voice))
    l1, _ = ar.prefill(params, cfg, jnp.asarray(text_ids),
                       jnp.ones((b, t), bool), jnp.asarray(voice),
                       qkv_f16=True)
    d = np.abs(np.asarray(l1) - np.asarray(l0))
    assert 0 < d.max() < 5e-3


def test_bf16_mode_close_to_f32(setup):
    cfg, params, text_ids, voice = setup
    b, t = text_ids.shape
    l32, _ = ar.prefill(params, cfg, jnp.asarray(text_ids),
                        jnp.ones((b, t), bool), jnp.asarray(voice))
    lbf, _ = ar.prefill(params, cfg, jnp.asarray(text_ids),
                        jnp.ones((b, t), bool), jnp.asarray(voice),
                        compute_dtype=jnp.bfloat16)
    # tiny-config logits are O(1); bf16 matmuls keep them within ~1e-1
    np.testing.assert_allclose(np.asarray(lbf), np.asarray(l32), atol=0.15)


def test_flash_prefill_matches_xla(setup):
    """The causal flash kernel (interpret mode off-TPU) must reproduce the
    XLA materialized-score attention on the bf16 plane, including masked
    text padding and the primed KV cache + latent pass."""
    import dataclasses

    cfg, params, text_ids, voice = setup
    b, t = text_ids.shape
    pad = 4
    padded = np.concatenate([text_ids, np.zeros((b, pad), np.int32)], axis=1)
    valid = np.concatenate(
        [np.ones((b, t), bool), np.zeros((b, pad), bool)], axis=1)
    assert cfg.flash_prefill  # default-allowed
    # the production gate is size-based (B*S*S >= flash_prefill_min_score,
    # measured crossover scripts/ubench_prefill.py); force it for the
    # tiny test shapes and check the default gate stays off here
    assert not ar.flash_prefill_on(cfg, jnp.bfloat16, False,
                                   text_ids.shape)
    cfg = dataclasses.replace(cfg, flash_prefill_min_score=0)
    cfg_off = dataclasses.replace(cfg, flash_prefill=False)

    lf, cf = ar.prefill(params, cfg, jnp.asarray(padded), jnp.asarray(valid),
                        jnp.asarray(voice), compute_dtype=jnp.bfloat16)
    lx, cx = ar.prefill(params, cfg_off, jnp.asarray(padded),
                        jnp.asarray(valid), jnp.asarray(voice),
                        compute_dtype=jnp.bfloat16)
    # both planes run bf16 matmuls; they differ only in softmax evaluation
    # order (online vs materialized, both f32)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), atol=5e-2)
    np.testing.assert_allclose(np.asarray(cf.k, np.float32),
                               np.asarray(cx.k, np.float32), atol=5e-2)
    np.testing.assert_allclose(np.asarray(cf.v, np.float32),
                               np.asarray(cx.v, np.float32), atol=5e-2)
    assert bool((cf.valid == cx.valid).all())

    m = 8
    mel_ids = np.random.default_rng(5).integers(
        0, cfg.n_mel_vocab, (b, m)).astype(np.int32)
    gf = ar.latent_forward(params, cfg, jnp.asarray(padded),
                           jnp.asarray(valid), jnp.asarray(mel_ids),
                           jnp.asarray(voice), compute_dtype=jnp.bfloat16)
    gx = ar.latent_forward(params, cfg_off, jnp.asarray(padded),
                           jnp.asarray(valid), jnp.asarray(mel_ids),
                           jnp.asarray(voice), compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=5e-2)

    # the f32 parity plane must be bit-identical regardless of the knob
    # (flash only engages at bf16)
    p32f, _ = ar.prefill(params, cfg, jnp.asarray(padded),
                         jnp.asarray(valid), jnp.asarray(voice))
    p32x, _ = ar.prefill(params, cfg_off, jnp.asarray(padded),
                         jnp.asarray(valid), jnp.asarray(voice))
    np.testing.assert_array_equal(np.asarray(p32f), np.asarray(p32x))


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_ar_config()
    tensors = random_ggml_tensors(ar_tensor_inventory(cfg), seed=5)
    params = ar_params_from_tensors(tensors, cfg)
    path = str(tmp_path / "ar.npz")
    save_npz(path, params)
    loaded = load_npz(path)
    jax.tree.map(np.testing.assert_array_equal, params, loaded)
