"""End-to-end pipeline + CLI tests on tiny random models."""

import json
import subprocess
import sys

import numpy as np
import pytest

from tortoise_tpu.io.wav import read_wav
from tortoise_tpu.pipeline.synthesize import TortoiseModels, synthesize
from tortoise_tpu.rng import ReferenceRng


@pytest.fixture(scope="module")
def models():
    return TortoiseModels.random(seed=0, tiny=True)


def _tokens(models, n=7, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(1, models.ar_cfg.n_text_vocab, n).tolist()


def test_synthesize_jax(models):
    voice = np.random.default_rng(1).normal(
        0, 0.5, (models.ar_cfg.d_model,)).astype(np.float32)
    res = synthesize(models, tokens=_tokens(models), voice=voice, seed=3)
    assert res.audio.ndim == 1 and len(res.audio) > 0
    assert np.isfinite(res.audio).all()
    assert res.sample_rate == models.vocoder_cfg.sample_rate
    assert res.mel.shape[0] == models.diffusion_cfg.n_mel
    assert set(res.timings) == {"autoregressive_s", "diffusion_s",
                                "vocoder_s"}
    # deterministic
    res2 = synthesize(models, tokens=_tokens(models), voice=voice, seed=3)
    np.testing.assert_array_equal(res.audio, res2.audio)


def test_synthesize_reference_rng(models):
    voice = np.zeros((models.ar_cfg.d_model,), np.float32)
    res = synthesize(models, tokens=_tokens(models), voice=voice,
                     sampler="reference", rng=ReferenceRng(11))
    res2 = synthesize(models, tokens=_tokens(models), voice=voice,
                      sampler="reference", rng=ReferenceRng(11))
    np.testing.assert_array_equal(res.audio, res2.audio)


def test_synthesize_save_roundtrip(models, tmp_path):
    voice = np.zeros((models.ar_cfg.d_model,), np.float32)
    res = synthesize(models, tokens=_tokens(models), voice=voice, seed=0)
    path = str(tmp_path / "out.wav")
    res.save(path)
    audio, rate = read_wav(path)
    assert rate == models.vocoder_cfg.sample_rate
    np.testing.assert_array_equal(audio, res.audio.astype(np.float32))


def test_synthesize_requires_voice(models):
    with pytest.raises(ValueError):
        synthesize(models, tokens=[1, 2, 3], voice=None)


def test_cli_random_tiny(tmp_path):
    out = str(tmp_path / "cli.wav")
    proc = subprocess.run(
        [sys.executable, "-m", "tortoise_tpu.cli", "--random-weights",
         "--tiny", "--seed", "1", "--output", out,
         "--models", "/root/reference/models"],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ,
             "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": "",
             "PYTHONPATH": "/root/repo"},
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    audio, rate = read_wav(out)
    assert rate == 24000 and len(audio) > 0
    assert "RTF" in proc.stdout


def test_cli_messages_file(tmp_path):
    """--messages-file drives the batched pipeline and writes one WAV per
    line (stand-in tokens with tiny random models)."""
    mfile = tmp_path / "msgs.txt"
    mfile.write_text("first line\nsecond one\n\n")
    out = str(tmp_path / "batch.wav")
    proc = subprocess.run(
        [sys.executable, "-m", "tortoise_tpu.cli", "--random-weights",
         "--tiny", "--seed", "1", "--output", out,
         "--messages-file", str(mfile),
         "--models", "/root/reference/models"],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ,
             "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": "",
             "PYTHONPATH": "/root/repo"},
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for i in range(2):
        audio, rate = read_wav(str(tmp_path / f"batch-{i}.wav"))
        assert rate == 24000 and len(audio) > 0
    assert "batch of 2" in proc.stdout


def test_synthesize_batch(models):
    from tortoise_tpu.pipeline.synthesize import synthesize_batch

    rng = np.random.default_rng(2)
    tokens_list = [
        rng.integers(1, models.ar_cfg.n_text_vocab, 5).tolist(),
        rng.integers(1, models.ar_cfg.n_text_vocab, 9).tolist(),
        rng.integers(1, models.ar_cfg.n_text_vocab, 7).tolist(),
    ]
    voices = rng.normal(0, 0.5, (3, models.ar_cfg.d_model)).astype(np.float32)
    results = synthesize_batch(models, tokens_list=tokens_list,
                               voices=voices, seed=4)
    assert len(results) == 3
    for r in results:
        assert r.audio.ndim == 1 and len(r.audio) > 0
        assert np.isfinite(r.audio).all()
        assert r.mel.shape[0] == models.diffusion_cfg.n_mel
    # rows with different text lengths produce independent outputs
    assert not np.array_equal(
        results[0].audio[: min(len(results[0].audio),
                               len(results[1].audio))],
        results[1].audio[: min(len(results[0].audio),
                               len(results[1].audio))],
    )


def test_reduced_diffusion_steps(models):
    import dataclasses

    fast = dataclasses.replace(models.diffusion_cfg, n_sample_timesteps=10)
    fast_models = TortoiseModels(
        ar_params=models.ar_params,
        diffusion_params=models.diffusion_params,
        vocoder_params=models.vocoder_params,
        ar_cfg=models.ar_cfg, diffusion_cfg=fast,
        vocoder_cfg=models.vocoder_cfg,
    )
    voice = np.zeros((models.ar_cfg.d_model,), np.float32)
    res = synthesize(fast_models, tokens=_tokens(models), voice=voice, seed=0)
    assert np.isfinite(res.audio).all() and len(res.audio) > 0


def test_diffusion_progress_matches_unchunked(models):
    """The progress-chunked loop must produce the same mel as one jit call,
    and the callback must reach 1.0."""
    from tortoise_tpu.pipeline.diffusion_stage import diffusion

    rng = np.random.default_rng(4)
    lats = rng.normal(0, 0.5, (9, models.diffusion_cfg.d_model)).astype(
        np.float32)
    seen = []
    mel_a = diffusion(models.diffusion_params, lats, models.diffusion_cfg,
                      seed=5)
    mel_b = diffusion(models.diffusion_params, lats, models.diffusion_cfg,
                      seed=5, progress=seen.append)
    np.testing.assert_allclose(mel_a, mel_b, atol=1e-5)
    assert seen and seen[0] == 0.0 and seen[-1] == 1.0
    assert seen == sorted(seen)


def test_cli_seed_defaults_to_wall_clock(monkeypatch, tmp_path):
    """Two unseeded runs must not produce identical audio (the reference
    seeds from the wall clock when --seed is omitted, main.cpp:6545-6547)."""
    from tortoise_tpu import cli

    seeds = []
    real_synth = synthesize

    def spy(models, **kw):
        seeds.append(kw["seed"])
        return real_synth(models, **kw)

    monkeypatch.setattr("tortoise_tpu.pipeline.synthesize.synthesize", spy)
    import itertools
    import time as _time

    # strictly-increasing fake clock (time.time has other callers too)
    counter = itertools.count(5000, 1000)
    monkeypatch.setattr(_time, "time", lambda: float(next(counter)))
    out = str(tmp_path / "o.wav")
    for _ in range(2):
        cli.main(["--random-weights", "--tiny", "--no-progress",
                  "--diffusion-steps", "2", "--output", out])
    assert len(seeds) == 2 and seeds[0] != seeds[1]
    assert all(isinstance(s, int) for s in seeds)


def test_cli_raw_tokens(monkeypatch, tmp_path):
    """--tokens bypasses the tokenizer and passes the ids verbatim (the
    reference's parse_tokens_from_string path, common.cpp:341-351)."""
    from tortoise_tpu import cli

    seen = []
    real_synth = synthesize

    def spy(models, **kw):
        seen.append(kw["tokens"])
        return real_synth(models, **kw)

    monkeypatch.setattr("tortoise_tpu.pipeline.synthesize.synthesize", spy)
    out = str(tmp_path / "t.wav")
    cli.main(["--random-weights", "--tiny", "--no-progress", "--seed", "4",
              "--diffusion-steps", "2", "--tokens", "4, 5,6,7,0",
              "--output", out])
    assert seen == [[4, 5, 6, 7, 0]]
    audio, rate = read_wav(out)
    assert rate == 24000 and len(audio) > 0

    with pytest.raises(SystemExit):
        cli.main(["--random-weights", "--tiny", "--tokens", "4,x,0"])
    with pytest.raises(SystemExit):
        cli.main(["--random-weights", "--tiny", "--tokens", " , "])


def test_cli_conflicting_mode_flags(tmp_path):
    """--messages-file rejects --stream and --tokens loudly (it would
    otherwise silently run the one-shot batched path and ignore them),
    and --stream rejects the batched-path-only flags."""
    from tortoise_tpu import cli

    mfile = tmp_path / "m.txt"
    mfile.write_text("hello\n")
    with pytest.raises(SystemExit):
        cli.main(["--random-weights", "--tiny",
                  "--messages-file", str(mfile), "--stream"])
    with pytest.raises(SystemExit):
        cli.main(["--random-weights", "--tiny",
                  "--messages-file", str(mfile), "--tokens", "4,5,0"])
    with pytest.raises(SystemExit):
        cli.main(["--random-weights", "--tiny", "--message", "hi",
                  "--stream", "--sampler", "reference"])
    with pytest.raises(SystemExit):
        cli.main(["--random-weights", "--tiny", "--message", "hi",
                  "--stream", "--batch-size", "2"])


def test_cli_stream_with_geometry_flags(tmp_path):
    """--stream drives the streaming pipeline end-to-end with the window
    geometry flags (small windows + margin so the tiny mel spans several
    chunks) and writes a playable WAV."""
    from tortoise_tpu import cli

    out = str(tmp_path / "s.wav")
    rc = cli.main(["--random-weights", "--tiny", "--seed", "3",
                   "--diffusion-steps", "2", "--stream",
                   "--stream-window", "8", "--stream-overlap", "2",
                   "--stream-first-window", "4", "--vocoder-margin", "2",
                   "--output", out])
    assert rc == 0
    audio, rate = read_wav(out)
    assert rate == 24000 and len(audio) > 0
    # --stream-first-window 0 disables the override (uniform windows)
    rc = cli.main(["--random-weights", "--tiny", "--seed", "3",
                   "--diffusion-steps", "2", "--stream",
                   "--stream-first-window", "0", "--output", out])
    assert rc == 0


def test_device_path_matches_legacy(models):
    """The device-resident stage handoff (progress=None) must produce the
    same audio/mel as the legacy host-boundary path (forced via a progress
    callback) for the same seed."""
    voice = np.random.default_rng(2).normal(
        0, 0.5, (models.ar_cfg.d_model,)).astype(np.float32)
    fast = synthesize(models, tokens=_tokens(models), voice=voice, seed=9)
    legacy = synthesize(models, tokens=_tokens(models), voice=voice, seed=9,
                        progress=lambda f: None)
    assert fast.sequences == legacy.sequences
    np.testing.assert_allclose(fast.mel, legacy.mel, atol=2e-5)
    np.testing.assert_allclose(fast.audio, legacy.audio, atol=2e-4)
    for a, b in zip(fast.latents, legacy.latents):
        np.testing.assert_allclose(a, b, atol=1e-5)
