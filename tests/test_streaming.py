"""Streaming synthesis (pipeline/streaming.py): exact vocoder chunking,
single-window mel equivalence to the global loop, and the end-to-end
chunk stream on tiny CPU models."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.config import (
    DiffusionConfig,
    VocoderConfig,
    mel_length_for_latents,
    tiny_diffusion_config,
    tiny_vocoder_config,
)
from tortoise_tpu.io.checkpoint import (
    random_diffusion_params,
    random_vocoder_params,
)
from tortoise_tpu.pipeline import diffusion_stage as dst
from tortoise_tpu.pipeline import streaming as st
from tortoise_tpu.pipeline.common import round_up


def _chunked_audio(vparams, vcfg, mel, spans, margin):
    """Run stream_audio_chunks over the given span boundaries."""
    out_len = mel.shape[1]

    def gen():
        for s, e in spans:
            yield (s, e, mel[:, s:e])

    chunks = list(st.stream_audio_chunks(vparams, vcfg, gen(), out_len,
                                         seed=7, margin=margin))
    assert chunks[-1].final
    return st.collect_stream(chunks)


@pytest.mark.parametrize("cfg,out_len,span,margin", [
    (tiny_vocoder_config(), 80, 24, 16),
    # production config at a short length: validates the real receptive
    # field fits the default margin
    (VocoderConfig(), 96, 32, 32),
])
def test_vocoder_chunking_exact(cfg, out_len, span, margin):
    """Chunked vocoding must be bit-near-exact vs one pass over the same
    mel and the same global noise: the conv/LVC stack is local and
    shift-equivariant at the upsample stride, and every emitted sample
    carries >= margin frames of true context."""
    params = random_vocoder_params(cfg, seed=1)
    rng = np.random.default_rng(0)
    mel = rng.uniform(-1, 1, (cfg.n_mel, out_len)).astype(np.float32)

    full = _chunked_audio(params, cfg, mel, [(0, out_len)], margin)
    spans = [(s, min(s + span, out_len))
             for s in range(0, out_len, span)]
    chunked = _chunked_audio(params, cfg, mel, spans, margin)

    assert full.shape == chunked.shape
    np.testing.assert_allclose(chunked, full, atol=2e-5)


def test_vocoder_insufficient_margin_differs():
    """Sanity that the exactness test has teeth: with margin 0 the chunk
    edges see fake boundaries and the audio must differ."""
    cfg = tiny_vocoder_config()
    params = random_vocoder_params(cfg, seed=1)
    rng = np.random.default_rng(0)
    mel = rng.uniform(-1, 1, (cfg.n_mel, 80)).astype(np.float32)
    full = _chunked_audio(params, cfg, mel, [(0, 80)], 16)
    spans = [(s, s + 20) for s in range(0, 80, 20)]
    rough = _chunked_audio(params, cfg, mel, spans, 0)
    assert np.abs(rough - full).max() > 1e-3


def test_mel_single_window_equals_global_loop():
    """A window covering the whole padded timeline must reproduce the
    global denoise loop bit-for-bit (same conditioner, same noise draw,
    same loop key)."""
    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=2)
    rng = np.random.default_rng(3)
    keep = 14
    out_len = mel_length_for_latents(keep)
    lat = jnp.asarray(rng.normal(0, 0.5, (1, 32, cfg.d_model)), jnp.float32)

    out_pad = round_up(out_len, dst.OUT_BUCKET)
    spans = list(st.stream_mel_windows(
        params, cfg, lat, keep, seed=9, window_frames=out_pad,
        overlap_frames=8))
    got = np.concatenate([b for (_, _, b) in spans], axis=1)
    assert got.shape == (cfg.n_mel, out_len)

    # expected: the same primitives, global width
    qparams = dst._prepare_params(params, False)
    lat_pad = round_up(keep, dst.LAT_BUCKET)
    lat_in = lat[:, :lat_pad]
    lat_mask = np.zeros((1, lat_pad), bool)
    lat_mask[0, :keep] = True
    lat_buckets = dst._buckets_dev(lat_pad, cfg.rel_pos_buckets,
                                   cfg.rel_pos_max_distance)
    code2 = dst._code_emb_jit(
        qparams, cfg, lat_in, lat_buckets, jnp.asarray(keep, jnp.int32),
        jnp.asarray(out_len, jnp.int32), out_pad,
        None if lat_mask.all() else jnp.asarray(lat_mask), None)
    key = jax.random.PRNGKey(9)
    key, sub = jax.random.split(key)
    noise = jax.random.normal(sub, (1, cfg.n_mel, out_pad))
    noise = jnp.where(
        jnp.asarray(np.arange(out_pad) < out_len)[None, None, :], noise, 0.0)
    mask_np = np.arange(out_pad) < out_len
    x, _ = dst._diffusion_loop_jit(
        qparams, cfg, dst._schedule_arrays(cfg), code2, noise,
        dst._buckets_dev(out_pad, cfg.rel_pos_buckets,
                         cfg.rel_pos_max_distance),
        None if mask_np.all() else jnp.asarray(mask_np[None, :]), key,
        jnp.int32(0), jnp.int32(cfg.n_sample_timesteps), True, None)
    want = np.asarray(x)[0][:, :out_len]
    np.testing.assert_array_equal(got, want)


def test_mel_windows_cover_and_blend():
    """Multi-window decode covers [0, out_len) exactly once, in order,
    with finite values (the windowed attention is an approximation, so
    only structure is asserted)."""
    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=2)
    rng = np.random.default_rng(4)
    keep = 15
    out_len = mel_length_for_latents(keep)
    lat = jnp.asarray(rng.normal(0, 0.5, (1, 16, cfg.d_model)), jnp.float32)
    spans = list(st.stream_mel_windows(
        params, cfg, lat, keep, seed=9, window_frames=24,
        overlap_frames=8))
    assert len(spans) >= 2
    pos = 0
    for (s, e, block) in spans:
        assert s == pos and e > s
        assert block.shape == (cfg.n_mel, e - s)
        assert np.isfinite(block).all()
        pos = e
    assert pos == out_len


def test_mel_window_geometry_fuzz(monkeypatch):
    """Window-arithmetic fuzz: across many (window, overlap,
    first-window, utterance-length) combinations, the emitted spans must
    tile [0, out_len) exactly once in order. The denoise dispatch is
    stubbed out (identity on the sliced noise) so this sweeps dozens of
    geometries in seconds — it guards the starts/emit-edge/crossfade
    index logic (final window, short utterances, clamped first windows),
    where an off-by-one silently drops or doubles frames."""
    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=2)
    rng = np.random.default_rng(4)

    def fake_denoise(params, cfg_, sched, code_emb2, noise_w, buckets_w,
                     mask_w, key, variance_swap, compute_dtype):
        return noise_w  # (1, n_mel, wp) — correct shape, no compute

    monkeypatch.setattr(st, "_denoise_window", fake_denoise)

    cases = []
    for keep in (2, 5, 15, 33):
        out_len = mel_length_for_latents(keep)
        for w in (4, 8, 24, 64):
            for ov in (0, 2, w // 2 - 1):
                if ov < 0 or ov >= w:
                    continue
                for fw in (None, ov + 1, w + 9):
                    cases.append((keep, out_len, w, ov, fw))
    assert len(cases) > 50
    for keep, out_len, w, ov, fw in cases:
        lat = jnp.asarray(rng.normal(0, 0.5, (1, max(keep, 4), cfg.d_model)),
                          jnp.float32)
        spans = list(st.stream_mel_windows(
            params, cfg, lat, keep, seed=9, window_frames=w,
            overlap_frames=ov, first_window_frames=fw))
        pos = 0
        for (s, e, block) in spans:
            assert s == pos and e > s, \
                (keep, w, ov, fw, [(a, b) for a, b, _ in spans])
            assert block.shape == (cfg.n_mel, e - s)
            pos = e
        assert pos == out_len, (keep, out_len, w, ov, fw, pos)


def test_stream_synthesize_end_to_end():
    """Tiny models end-to-end: contiguous chunks, correct total length,
    first-audio latency recorded, multiple chunks before the end."""
    from tortoise_tpu.pipeline.synthesize import TortoiseModels

    models = TortoiseModels.random(seed=0, tiny=True)
    models.ar_cfg = dataclasses.replace(models.ar_cfg, max_decode_steps=8)
    models.diffusion_cfg = dataclasses.replace(models.diffusion_cfg,
                                               n_sample_timesteps=4)
    rng = np.random.default_rng(5)
    voice = rng.normal(0, 0.5, (models.ar_cfg.d_model,)).astype(np.float32)
    tokens = [1] + rng.integers(3, 30, size=6).tolist() + [0]

    chunks = list(st.stream_synthesize(
        models, tokens=tokens, voice=voice, seed=11,
        window_frames=24, overlap_frames=8, vocoder_margin=8))
    assert chunks and chunks[-1].final
    assert all(not c.final for c in chunks[:-1])
    assert chunks[0].latency_s > 0
    audio = st.collect_stream(iter(chunks))
    # total = (out_len + pad_frames) * upsample - 6, like the one-shot path
    vcfg = models.vocoder_cfg
    seen = sum(len(c.audio) for c in chunks)
    assert seen == len(audio)
    assert len(audio) % 2 == 0 and len(audio) > 0
    assert np.isfinite(audio).all()
    assert (len(audio) + 6) % vcfg.total_upsample == 0


def test_mel_first_window_variant():
    """A smaller first window still covers [0, out_len) exactly once and
    respects validation."""
    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=2)
    rng = np.random.default_rng(6)
    keep = 15
    out_len = mel_length_for_latents(keep)
    lat = jnp.asarray(rng.normal(0, 0.5, (1, 16, cfg.d_model)), jnp.float32)
    spans = list(st.stream_mel_windows(
        params, cfg, lat, keep, seed=9, window_frames=24, overlap_frames=8,
        first_window_frames=12))
    pos = 0
    for (s, e, block) in spans:
        assert s == pos and block.shape == (cfg.n_mel, e - s)
        assert np.isfinite(block).all()
        pos = e
    assert pos == out_len
    with pytest.raises(ValueError):
        list(st.stream_mel_windows(params, cfg, lat, keep, seed=9,
                                   window_frames=24, overlap_frames=8,
                                   first_window_frames=8))
    # 0 must be rejected like any other <= ov value, not silently
    # coerced to window_frames by a falsy-or
    with pytest.raises(ValueError):
        list(st.stream_mel_windows(params, cfg, lat, keep, seed=9,
                                   window_frames=24, overlap_frames=8,
                                   first_window_frames=0))


def test_mel_first_window_clamped_short_utterance():
    """first_window_frames larger than the whole (padded) timeline is
    clamped to a single global window — NOT a spurious ValueError from
    comparing the clamped width against overlap_frames (the crossfade is
    never used when only one window exists)."""
    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=2)
    rng = np.random.default_rng(7)
    keep = 14
    out_len = mel_length_for_latents(keep)
    out_pad = round_up(out_len, dst.OUT_BUCKET)
    lat = jnp.asarray(rng.normal(0, 0.5, (1, 16, cfg.d_model)), jnp.float32)
    # raw first (out_pad + 64) passes the raw-vs-ov check, clamps to
    # out_pad <= ov + ... — regression for the old post-clamp check
    spans = list(st.stream_mel_windows(
        params, cfg, lat, keep, seed=9, window_frames=out_pad + 128,
        overlap_frames=out_pad - 1, first_window_frames=out_pad + 64))
    assert len(spans) == 1
    s, e, block = spans[0]
    assert (s, e) == (0, out_len)
    assert block.shape == (cfg.n_mel, out_len)
    assert np.isfinite(block).all()


def test_stream_synthesize_validates_eagerly():
    """stream_synthesize is a plain function returning a generator:
    bad geometry (including a negative vocoder_margin, which would
    silently emit corrupt audio) fails at CALL time, before any AR
    work — the CLI --stream path depends on this."""
    from tortoise_tpu.pipeline.synthesize import TortoiseModels

    models = TortoiseModels.random(seed=0, tiny=True)
    voice = np.zeros((models.ar_cfg.d_model,), np.float32)
    with pytest.raises(ValueError, match="vocoder_margin"):
        st.stream_synthesize(models, tokens=[1, 4, 0], voice=voice,
                             vocoder_margin=-4)
    with pytest.raises(ValueError, match="window_frames"):
        st.stream_synthesize(models, tokens=[1, 4, 0], voice=voice,
                             window_frames=16, overlap_frames=16)
    with pytest.raises(ValueError, match="first_window_frames"):
        st.stream_synthesize(models, tokens=[1, 4, 0], voice=voice,
                             window_frames=24, overlap_frames=8,
                             first_window_frames=8)
    with pytest.raises(ValueError, match="voice"):
        st.stream_synthesize(models, tokens=[1, 4, 0], voice=None)


def test_stream_audio_chunks_rejects_negative_margin():
    cfg = tiny_vocoder_config()
    params = random_vocoder_params(cfg, seed=0)
    with pytest.raises(ValueError, match="margin"):
        list(st.stream_audio_chunks(params, cfg, iter(()), 8, seed=0,
                                    margin=-1))
