"""Streaming synthesis: first audio before the utterance finishes.

A beyond-reference serving axis (the reference C++ CLI is strictly
one-shot, main.cpp:6528-6583): after the AR stage, the DDPM mel decode
runs over overlapping WINDOWS of the output timeline instead of the
whole utterance, and the vocoder (local by construction — conv/LVC
receptive field only) turns each finalized mel span into PCM
immediately. Audio streams out while later frames are still denoising.

Exactness contract:

- The AR stage and the diffusion CONDITIONER (latent conditioner +
  nearest-upsample code embedding) are computed globally — identical to
  the batch path.
- The 80-step denoise loop sees only a window of the timeline per
  dispatch, so window-crossing attention is truncated: the mel is an
  APPROXIMATION of the global decode (the T5 rel-pos bias saturates at
  64 frames, so the content term is the only nonlocal part). Adjacent
  windows overlap by `overlap_frames` and crossfade linearly.
- The vocoder chunking is EXACT for interior samples: each chunk is
  vocoded with `vocoder_margin` context frames on both sides and the
  margin-contaminated edges are discarded (tests/test_streaming.py pins
  chunked == full-pass audio bit-for-bit given the same noise).
- Randomness: the initial mel noise and the vocoder noise are drawn
  ONCE over the full timeline with the same seed discipline as the
  batch path and sliced per window/chunk, so window boundaries never
  change the noise a frame sees; only the per-step ancestral noise is
  per-window (folded keys).

Window width trades first-audio latency against window compute
efficiency; the defaults (352+32 = 384 = 3x128 query blocks) keep the
packed flash kernel pad-free. Total FLOPs are LOWER than the global
decode (attention cost is T*W instead of T^2).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterator, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tortoise_tpu.config import (
    MEL_PAD_VALUE,
    DiffusionConfig,
    VocoderConfig,
    mel_length_for_latents,
)
from tortoise_tpu.pipeline import ar_stage
from tortoise_tpu.pipeline import diffusion_stage as dst
from tortoise_tpu.pipeline import vocoder_stage as vst
from tortoise_tpu.pipeline.common import round_up


@dataclasses.dataclass
class StreamChunk:
    """One contiguous span of finalized audio."""

    audio: np.ndarray        # float32 samples in [-1, 1]
    start_sample: int        # absolute offset in the utterance
    final: bool              # True on the last chunk
    # wall seconds from stream start to this chunk being ready
    latency_s: float = 0.0


def _denoise_window(params, cfg, sched, code_emb2, noise_w, buckets_w,
                    mask_w, key, variance_swap, compute_dtype):
    x, _ = dst._diffusion_loop_jit(
        params, cfg, sched, code_emb2, noise_w, buckets_w, mask_w, key,
        jnp.int32(0), jnp.int32(cfg.n_sample_timesteps), variance_swap,
        compute_dtype)
    return x


def stream_mel_windows(params, cfg: DiffusionConfig, latents_dev, keep_len,
                       seed: int, window_frames: int, overlap_frames: int,
                       compute_dtype=None, int8_weights: bool = False,
                       variance_swap: bool = True,
                       first_window_frames: Optional[int] = None):
    """Yield (start, end, mel_block (100, end-start) np.f32) spans of
    FINALIZED normalized mel, in order, covering [0, out_len).

    latents_dev: (1, Lcap, 1024) device latents (candidate row already
    selected); keep_len: true latent count. Window i denoises
    [a_i, a_i + Wp) and finalizes frames up to its emit edge minus the
    crossfade span; the crossfade region of two adjacent windows blends
    linearly (both windows computed it).

    first_window_frames: optional smaller FIRST window — first-audio
    latency is ~ the first window's 80-step loop, which scales with its
    width (the two widths compile two loop programs; both cache)."""
    params = dst._prepare_params(params, int8_weights)
    w, ov = int(window_frames), int(overlap_frames)
    if w <= 0 or ov < 0 or ov >= w:
        raise ValueError(f"need window_frames > overlap_frames >= 0, got "
                         f"{window_frames}/{overlap_frames}")
    lat_len = int(keep_len)
    out_len = mel_length_for_latents(lat_len)
    # out_pad matches the global (batch) path exactly, so the one global
    # noise draw is the same array the one-shot decode would draw
    # (jax draws are shape-keyed); windows never need to exceed it
    out_pad = round_up(out_len, dst.OUT_BUCKET)
    wp = min(w + ov, out_pad)

    lat_pad = round_up(lat_len, dst.LAT_BUCKET)
    if lat_pad <= latents_dev.shape[1]:
        lat_in = latents_dev[:, :lat_pad]
    else:
        lat_in = jnp.pad(latents_dev,
                         ((0, 0), (0, lat_pad - latents_dev.shape[1]),
                          (0, 0)))
    lat_mask = np.zeros((1, lat_pad), bool)
    lat_mask[0, :lat_len] = True
    lat_buckets = dst._buckets_dev(lat_pad, cfg.rel_pos_buckets,
                                   cfg.rel_pos_max_distance)
    sched = dst._schedule_arrays(cfg)

    # global conditioner — identical to the batch path (the hoisted
    # code_embeddings of _diffusion_all_jit)
    code_emb2 = dst._code_emb_jit(
        params, cfg, lat_in, lat_buckets,
        jnp.asarray(lat_len, jnp.int32), jnp.asarray(out_len, jnp.int32),
        out_pad, None if lat_mask.all() else jnp.asarray(lat_mask),
        compute_dtype)                                  # (2, C, out_pad)

    # one global initial-noise draw, sliced per window: the batch path's
    # key discipline (key -> split -> noise, loop keys from the parent)
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    noise_full = jax.random.normal(sub, (1, cfg.n_mel, out_pad))
    frame_idx = np.arange(out_pad)
    noise_full = jnp.where(jnp.asarray(frame_idx < out_len)[None, None, :],
                           noise_full, 0.0)

    mel_buf = np.zeros((cfg.n_mel, out_len), np.float32)
    ramp = (np.arange(1, ov + 1, dtype=np.float32) / (ov + 1))[None, :] \
        if ov else None

    # validate the RAW value (so first_window_frames=0 is rejected, not
    # silently coerced to w) BEFORE clamping to out_pad: a short
    # utterance may clamp w0 below ov, but then w0 >= out_len — a single
    # window, where the crossfade (and hence ov) is never used
    if first_window_frames is None:
        w0 = min(w, out_pad)
    else:
        f0 = int(first_window_frames)
        if f0 <= ov:
            raise ValueError(f"first_window_frames={first_window_frames} "
                             f"must exceed overlap_frames={ov}")
        w0 = min(f0, out_pad)
    starts = [0] + list(range(w0, out_len, w))
    done_upto = 0
    for i, s in enumerate(starts):
        e = min((w0 if i == 0 else s + w), out_len)
        wp_i = w0 if i == 0 else wp
        a = max(0, min(s - ov, out_pad - wp_i)) if i else 0
        mask_np = (np.arange(a, a + wp_i) < out_len)
        mask_w = None if mask_np.all() else jnp.asarray(mask_np[None, :])
        buckets_w = dst._buckets_dev(wp_i, cfg.rel_pos_buckets,
                                     cfg.rel_pos_max_distance)
        wkey = key if len(starts) == 1 else jax.random.fold_in(key, i)
        x = _denoise_window(
            params, cfg, sched,
            jax.lax.dynamic_slice_in_dim(code_emb2, a, wp_i, axis=2),
            jax.lax.dynamic_slice_in_dim(noise_full, a, wp_i, axis=2),
            buckets_w, mask_w, wkey, variance_swap, compute_dtype)
        mel_w = np.asarray(x)[0]                        # (100, wp)
        lo = s - a                                      # emit offset
        new = mel_w[:, lo : lo + (e - s)]
        if i > 0 and ov:
            # the full crossfade span always exists: s >= w0 > ov for
            # every non-first window (validated at entry), and the
            # window start a <= s - ov so mel_w covers [s-ov, s)
            prev = mel_buf[:, s - ov : s]
            cur = mel_w[:, lo - ov : lo]
            mel_buf[:, s - ov : s] = (1.0 - ramp) * prev + ramp * cur
        mel_buf[:, s:e] = new
        last = e >= out_len
        # frames still subject to the NEXT window's crossfade stay held
        final_upto = out_len if last else max(done_upto, e - ov)
        if final_upto > done_upto:
            yield (done_upto, final_upto,
                   mel_buf[:, done_upto:final_upto].copy())
            done_upto = final_upto


def stream_audio_chunks(vparams, vcfg: VocoderConfig, mel_spans,
                        out_len: int, seed: int, margin: int = 32,
                        compute_dtype=None) -> Iterator[StreamChunk]:
    """Consume (start, end, mel_block) spans and yield audio chunks.

    Each chunk vocodes its mel span plus `margin` finalized context
    frames on both sides and keeps only the interior samples — exact vs
    the full pass for every emitted sample (the conv/LVC stack is
    shift-equivariant at the 256x upsample stride; boundary effects live
    inside the discarded margins). The right margin delays emission by
    `margin` frames relative to mel finalization. Vocoder noise is one
    global draw sliced per chunk, so chunk boundaries never change the
    noise a frame sees (jax draws are shape-keyed, so the stream itself
    necessarily differs from the one-shot path's differently-shaped
    draw — like that path's own bucket-dependence)."""
    from tortoise_tpu.pipeline.common import ensure_device

    vparams = ensure_device(vparams)
    u = vcfg.total_upsample
    m = int(margin)
    if m < 0:
        # a negative margin would slice past the finalized mel span and
        # emit garbage for frames the next window then skips
        raise ValueError(f"margin must be >= 0, got {margin}")
    total = out_len + vcfg.mel_pad_frames
    # slack past the bucket roundup: the last chunk's context slice
    # starts at ctxa > 0 and spans a rounded-up width, which can reach
    # past round_up(total) by up to one bucket
    pad_total = round_up(total, vst.MEL_BUCKET) + vst.MEL_BUCKET
    key = jax.random.PRNGKey(seed)
    noise_full = jax.random.normal(key, (1, vcfg.noise_ch, pad_total))

    mel_buf = np.zeros((vcfg.n_mel, out_len), np.float32)
    have = 0          # finalized mel frames
    emitted = 0       # mel frames whose audio has been yielded
    t0 = time.monotonic()
    for (s, e, block) in mel_spans:
        mel_buf[:, s:e] = block
        have = e
        last = have >= out_len
        q = out_len if last else have - m   # emit audio for [emitted, q)
        if q <= emitted:
            continue
        p = emitted
        ctxa = max(0, p - m)
        ctxb = out_len if last else min(out_len, q + m)
        # static-width vocoder program: one compile per (width bucket)
        span = ctxb - ctxa + (vcfg.mel_pad_frames if last else 0)
        vw = round_up(span, vst.MEL_BUCKET)
        mel_in = np.zeros((1, vcfg.n_mel, vw), np.float32)
        mel_in[0, :, : ctxb - ctxa] = vst.denormalize_tacotron_mel(
            mel_buf[:, ctxa:ctxb])
        if last:
            mel_in[0, :, ctxb - ctxa : span] = MEL_PAD_VALUE
        noise = jax.lax.dynamic_slice_in_dim(noise_full, ctxa, vw, axis=2)
        audio = np.asarray(vst._vocoder_jit(
            vparams, vcfg, jnp.asarray(mel_in), noise,
            jnp.int32(span), compute_dtype))[0]
        if last:
            chunk = audio[(p - ctxa) * u : span * u - 6]
        else:
            chunk = audio[(p - ctxa) * u : (q - ctxa) * u]
        yield StreamChunk(audio=chunk.astype(np.float32),
                          start_sample=p * u, final=last,
                          latency_s=time.monotonic() - t0)
        emitted = q
        if last:
            return


def stream_synthesize(
    models,
    message: Optional[str] = None,
    tokens: Optional[List[int]] = None,
    voice=None,
    seed: int = 0,
    compute_dtype=None,
    int8_weights: bool = False,
    window_frames: int = 352,
    overlap_frames: int = 32,
    vocoder_margin: int = 32,
    first_window_frames: Optional[int] = None,
    sampler_params=None,
    tokenizer_method: str = "greedy",
) -> Iterator[StreamChunk]:
    """Full streaming pipeline: yields StreamChunk objects in order.

    Chunks concatenate (in start_sample order, no gaps/overlaps) to the
    utterance; `latency_s` on the first chunk is the first-audio
    latency. Seeds follow synthesize(): stage seeds are seed/seed+1/
    seed+2.

    This is a plain function returning a generator (not itself a
    generator), so input/geometry validation fails at CALL time — before
    any device work — rather than at the first next()."""
    from tortoise_tpu.io.voice import load_voice_latent

    w, ov = int(window_frames), int(overlap_frames)
    if w <= 0 or ov < 0 or ov >= w:
        raise ValueError(f"need window_frames > overlap_frames >= 0, "
                         f"got {window_frames}/{overlap_frames}")
    if first_window_frames is not None and int(first_window_frames) <= ov:
        raise ValueError(
            f"first_window_frames={first_window_frames} must exceed "
            f"overlap_frames={ov}")
    if int(vocoder_margin) < 0:
        raise ValueError(
            f"vocoder_margin must be >= 0, got {vocoder_margin}")
    if tokens is None:
        if models.tokenizer is None:
            raise ValueError("no tokenizer available; pass tokens directly")
        tokens = models.tokenizer.encode_pipeline(message, tokenizer_method)
    if isinstance(voice, str):
        voice = load_voice_latent(voice, models.ar_cfg.d_model)
    if voice is None:
        raise ValueError("a voice latent (array or path) is required")
    return _stream_synthesize_gen(
        models, tokens, voice, seed, compute_dtype, int8_weights,
        window_frames, overlap_frames, vocoder_margin,
        first_window_frames, sampler_params)


def _stream_synthesize_gen(models, tokens, voice, seed, compute_dtype,
                           int8_weights, window_frames, overlap_frames,
                           vocoder_margin, first_window_frames,
                           sampler_params) -> Iterator[StreamChunk]:
    models.to_device(include_ar=False, include_diffusion=not int8_weights)

    t0 = time.monotonic()
    lat_dev, keeps, _sequences = ar_stage.autoregressive(
        models.ar_params, tokens, voice, 1, models.ar_cfg,
        sampler="jax", seed=seed, compute_dtype=compute_dtype,
        int8_weights=int8_weights, return_device_latents=True,
        sampler_params=sampler_params)
    out_len = mel_length_for_latents(int(keeps[0]))

    spans = stream_mel_windows(
        models.diffusion_params, models.diffusion_cfg, lat_dev[0:1],
        keeps[0], seed + 1, window_frames, overlap_frames,
        compute_dtype=compute_dtype, int8_weights=int8_weights,
        first_window_frames=first_window_frames)
    for chunk in stream_audio_chunks(
            models.vocoder_params, models.vocoder_cfg, spans, out_len,
            seed + 2, margin=vocoder_margin, compute_dtype=compute_dtype):
        chunk.latency_s = time.monotonic() - t0
        yield chunk


def collect_stream(chunks) -> np.ndarray:
    """Concatenate a chunk iterator into the full utterance (tests)."""
    parts = []
    n = 0
    for c in chunks:
        assert c.start_sample == n, (c.start_sample, n)
        parts.append(c.audio)
        n += len(c.audio)
    return np.concatenate(parts) if parts else np.zeros((0,), np.float32)
