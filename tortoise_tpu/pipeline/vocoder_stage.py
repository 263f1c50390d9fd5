"""Stage 3 driver: mel -> 24 kHz audio.

Replaces the reference's `vocoder()` (main.cpp:6044-6127): denormalize the
[-1,1] mel to the Tacotron dB range, append 10 frames of -11.5129
(main.cpp:6051-6054), draw 64-channel Gaussian noise, run the single
vocoder pass, return the (M*256 - 6)-sample float audio. Lengths round up
to a static bucket (masked, with the right-edge reflect pad emulated at
the true boundary) so XLA compiles once per bucket.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from tortoise_tpu.config import (
    MEL_PAD_VALUE,
    TACOTRON_MEL_MAX,
    TACOTRON_MEL_MIN,
    VocoderConfig,
)
from tortoise_tpu.models import vocoder as vmodel
from tortoise_tpu.pipeline.common import mesh_context, round_up

MEL_BUCKET = 32


def denormalize_tacotron_mel(mel):
    """[-1,1] -> [TACOTRON_MEL_MIN, TACOTRON_MEL_MAX] (main.cpp:5575-5584)."""
    return ((mel + 1.0) / 2.0) * (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN) \
        + TACOTRON_MEL_MIN


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def _vocoder_jit(params, cfg, mel, noise, mel_len, compute_dtype=None):
    return vmodel.vocoder_forward(params, cfg, mel, noise, mel_len,
                                  compute_dtype)


@functools.partial(
    jax.jit, static_argnames=("cfg", "pad_total", "compute_dtype"))
def _vocoder_dev_jit(params, cfg, mel_norm, mel_lens, pad_total, key,
                     compute_dtype=None):
    """Device-resident entry: mel_norm (B, n_mel, T) still NORMALIZED and
    zero-padded past per-row `mel_lens` — denormalize, write the 10
    MEL_PAD_VALUE frames at the traced row boundaries, draw noise, and
    vocode, all in one dispatch."""
    b, n_mel, t = mel_norm.shape
    mel_can = jnp.pad(mel_norm, ((0, 0), (0, 0), (0, pad_total - t))) \
        if pad_total > t else mel_norm[:, :, :pad_total]
    idx = jnp.arange(pad_total)[None, None, :]
    lens = jnp.asarray(mel_lens)[:, None, None]
    mel_v = jnp.where(
        idx < lens, denormalize_tacotron_mel(mel_can),
        jnp.where(idx < lens + cfg.mel_pad_frames, MEL_PAD_VALUE, 0.0))
    noise = jax.random.normal(key, (b, cfg.noise_ch, pad_total))
    totals = jnp.asarray(mel_lens) + cfg.mel_pad_frames
    audio = vmodel.vocoder_forward(params, cfg, mel_v, noise, totals,
                                   compute_dtype)
    # ship the audio as 16-bit PCM samples: halves the download through
    # the ~25 MB/s tunnel; round-to-nearest keeps the worst-case
    # quantization error at ~1.5e-5 (astype alone truncates toward zero,
    # doubling it with a bias), far inside the reference's own 1e-2 test
    # tolerance; the symmetric clip bound divides back by 32767 exactly
    return jnp.clip(jnp.round(audio * 32767.0), -32767.0,
                    32767.0).astype(jnp.int16)


def vocoder_batch_device(
    params,
    mel_dev,
    mel_lens,
    cfg: VocoderConfig = VocoderConfig(),
    seed: int = 0,
    compute_dtype=None,
    mesh=None,
):
    """Device-resident serving path: consumes the diffusion stage's
    (B, n_mel, T) normalized device mel directly (no host round trip).
    Returns a list of per-row audio arrays."""
    from tortoise_tpu.pipeline.common import ensure_device

    params = ensure_device(params)
    lens = np.asarray(mel_lens, np.int32)
    totals = lens + cfg.mel_pad_frames
    pad_total = round_up(int(totals.max()), MEL_BUCKET)
    key = jax.random.PRNGKey(seed)
    b = len(lens)
    # the ~256x upsample makes LVC intermediates huge (~0.5 GB/row at
    # production lengths); rows beyond 8 vocode in chunks — the stage is
    # ~3% of wall, so the extra dispatch is noise, and the chunked jit
    # reuses the 8-row compilation
    chunk = 8 if mesh is None else max(b, 1)
    starts = list(range(0, b, chunk))
    # single chunk keeps the original key so the noise stream (and audio)
    # matches the unchunked/legacy paths bit for bit
    keys = [key] if len(starts) == 1 else list(
        jax.random.split(key, len(starts)))
    parts = []
    with mesh_context(mesh):
        for lo, sub in zip(starts, keys):
            hi = min(b, lo + chunk)
            parts.append(np.asarray(_vocoder_dev_jit(
                params, cfg, mel_dev[lo:hi], jnp.asarray(lens[lo:hi]),
                pad_total, sub, compute_dtype,
            )).astype(np.float32) / 32767.0)
    audio = np.concatenate(parts, axis=0)
    return [audio[i, : totals[i] * cfg.total_upsample - 6]
            for i in range(len(lens))]


def vocoder_batch(
    params,
    mel_list,
    cfg: VocoderConfig = VocoderConfig(),
    seed: int = 0,
    compute_dtype=None,
    bucketed: bool = True,
    mesh=None,
):
    """Batched serving path: list of (n_mel, M_i) normalized mels -> list
    of audio arrays, vocoded together with per-row masked lengths."""
    from tortoise_tpu.pipeline.common import ensure_device

    params = ensure_device(params)
    mels = [np.asarray(m, np.float32) for m in mel_list]
    b = len(mels)
    totals = np.asarray([m.shape[1] + cfg.mel_pad_frames for m in mels],
                        np.int32)
    pad_total = round_up(int(totals.max()), MEL_BUCKET) if bucketed \
        else int(totals.max())

    mel_in = np.zeros((b, cfg.n_mel, pad_total), np.float32)
    for i, m in enumerate(mels):
        mel_in[i, :, : m.shape[1]] = denormalize_tacotron_mel(m)
        mel_in[i, :, m.shape[1] : totals[i]] = MEL_PAD_VALUE

    from tortoise_tpu.parallel import place_batch

    key = jax.random.PRNGKey(seed)
    ctx = mesh_context(mesh)
    with ctx:
        noise = jax.random.normal(key, (b, cfg.noise_ch, pad_total))
        audio = np.asarray(_vocoder_jit(
            params, cfg, place_batch(mel_in, mesh), noise,
            place_batch(totals, mesh), compute_dtype,
        ))
    return [audio[i, : totals[i] * cfg.total_upsample - 6] for i in range(b)]


def vocoder(
    params,
    mel: np.ndarray,
    cfg: VocoderConfig = VocoderConfig(),
    seed: int = 0,
    rng=None,
    compute_dtype=None,
    bucketed: bool = True,
) -> np.ndarray:
    """Normalized mel (n_mel, M) -> audio float32 (M_total*up - 6,) where
    M_total = M + mel_pad_frames.

    rng=None: jax.random noise; rng=ReferenceRng: the reference's mt19937
    noise stream (drawn before the model pass, main.cpp:6056-6060)."""
    from tortoise_tpu.pipeline.common import ensure_device

    params = ensure_device(params)
    mel = np.asarray(mel, np.float32)
    n_mel, m = mel.shape
    total = m + cfg.mel_pad_frames
    pad_total = round_up(total, MEL_BUCKET) if bucketed else total

    mel_in = np.zeros((1, n_mel, pad_total), np.float32)
    mel_in[0, :, :m] = denormalize_tacotron_mel(mel)
    mel_in[0, :, m:total] = MEL_PAD_VALUE

    if rng is None:
        # draw on device — no host round trip for the noise buffer
        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(key, (1, cfg.noise_ch, pad_total))
    else:
        noise = np.zeros((1, cfg.noise_ch, pad_total), np.float32)
        noise[0, :, :total] = rng.normal_f32(cfg.noise_ch * total).reshape(
            cfg.noise_ch, total
        )

    audio = _vocoder_jit(params, cfg, jnp.asarray(mel_in),
                         jnp.asarray(noise), jnp.int32(total),
                         compute_dtype)
    n_out = total * cfg.total_upsample - 6
    return np.asarray(audio)[0, :n_out]
