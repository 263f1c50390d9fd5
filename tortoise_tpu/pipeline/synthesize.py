"""Full three-stage synthesis: text -> speech tokens -> mel -> audio.

The analogue of the reference's `main()` flow (main.cpp:6528-6583):
tokenize (space -> [SPACE], wrap with 255/0), run the AR stage for
candidate sequences + conditioning latents, decode latents to a mel with
the 80-step CFG DDPM, vocode to 24 kHz float audio.

Seeding: sampler="jax" derives independent jax.random streams per stage
from `seed`; sampler="reference" threads ONE mt19937 ReferenceRng through
all stages in the reference's global-generator draw order (AR multinomials,
diffusion initial noise, 80 step noises, vocoder noise —
main.cpp:39-50, 5638, 6014, 6056).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import numpy as np

from tortoise_tpu.config import ARConfig, DiffusionConfig, VocoderConfig
from tortoise_tpu.io.voice import load_voice_latent
from tortoise_tpu.io.wav import write_wav
from tortoise_tpu.pipeline import ar_stage, diffusion_stage, vocoder_stage
from tortoise_tpu.text.tokenizer import Tokenizer


@dataclasses.dataclass
class TortoiseModels:
    ar_params: dict
    diffusion_params: dict
    vocoder_params: dict
    ar_cfg: ARConfig = ARConfig()
    diffusion_cfg: DiffusionConfig = DiffusionConfig()
    vocoder_cfg: VocoderConfig = VocoderConfig()
    tokenizer: Optional[Tokenizer] = None

    def to_device(self, include_ar: bool = True,
                  include_diffusion: bool = True) -> "TortoiseModels":
        """Move param trees onto the default device, in place.

        Host-resident (numpy) params are re-uploaded by jit on EVERY
        call — seconds per stage through a remote-TPU tunnel. Idempotent:
        already-committed arrays are left untouched. synthesize() /
        synthesize_batch() call this automatically with include_ar=False:
        the AR stage always goes through cast_matmul_weights, which
        places (or quantizes) the tree itself — uploading the f32 blocks
        first would just park ~1.2 GB of dead weights in HBM next to the
        bf16/int8 cast actually used (an OOM source on shared slices).
        include_diffusion=False likewise defers the denoiser to the
        diffusion stage's own _prepare_params, which on the int8 plane
        quantizes host-side and uploads 1 byte/weight instead of 4."""
        from tortoise_tpu.pipeline.common import ensure_device

        if include_ar:
            self.ar_params = ensure_device(self.ar_params)
        if include_diffusion:
            self.diffusion_params = ensure_device(self.diffusion_params)
        self.vocoder_params = ensure_device(self.vocoder_params)
        return self

    @classmethod
    def from_ggml_dir(cls, model_dir: str, cache_dir: Optional[str] = None,
                      **cfgs) -> "TortoiseModels":
        """Load the reference's model files from a directory laid out like
        its `models/` (README.md:31-38)."""
        import os

        from tortoise_tpu.io.checkpoint import (
            convert_ar_checkpoint,
            convert_diffusion_checkpoint,
            convert_vocoder_checkpoint,
        )

        def cache(name):
            return os.path.join(cache_dir, name) if cache_dir else None

        tok_path = os.path.join(model_dir, "tokenizer.json")
        return cls(
            ar_params=convert_ar_checkpoint(
                os.path.join(model_dir, "ggml-model.bin"), cache("ar.npz")),
            diffusion_params=convert_diffusion_checkpoint(
                os.path.join(model_dir, "ggml-diffusion-model.bin"),
                cache("diffusion.npz")),
            vocoder_params=convert_vocoder_checkpoint(
                os.path.join(model_dir, "ggml-vocoder-model.bin"),
                cache("vocoder.npz")),
            tokenizer=(Tokenizer.from_file(tok_path)
                       if os.path.exists(tok_path) else None),
            **cfgs,
        )

    @classmethod
    def random(cls, seed: int = 0, tiny: bool = False,
               cache_dir: Optional[str] = None) -> "TortoiseModels":
        """Synthetic weights with the production (or tiny) tensor
        inventory — for benchmarking and flow tests (the published weights
        are not redistributable with this repo). Draws float32 directly
        (the committed pseudo-golden fixtures pin the slower f64 stream of
        random_*_params(fast=False); nothing pins THESE values). Pass
        cache_dir to memoize the host trees as .npz — regeneration costs
        tens of seconds at production scale, so the bench's second-process
        cold-start probe loads instead."""
        import os

        from tortoise_tpu.config import (
            tiny_ar_config,
            tiny_diffusion_config,
            tiny_vocoder_config,
        )
        from tortoise_tpu.io.checkpoint import (
            load_npz,
            random_ar_params,
            random_diffusion_params,
            random_vocoder_params,
            save_npz,
        )

        acfg = tiny_ar_config() if tiny else ARConfig()
        dcfg = tiny_diffusion_config() if tiny else DiffusionConfig()
        vcfg = tiny_vocoder_config() if tiny else VocoderConfig()

        def build(name, fn, cfg, s):
            if cache_dir:
                path = os.path.join(
                    cache_dir,
                    f"{name}_{'tiny' if tiny else 'full'}_{s}.npz")
                if os.path.exists(path):
                    return load_npz(path)
                params = fn(cfg, s, fast=True)
                save_npz(path, params)  # internally atomic (tmp+replace)
                return params
            return fn(cfg, s, fast=True)

        return cls(
            ar_params=build("ar", random_ar_params, acfg, seed),
            diffusion_params=build(
                "diffusion", random_diffusion_params, dcfg, seed + 1),
            vocoder_params=build(
                "vocoder", random_vocoder_params, vcfg, seed + 2),
            ar_cfg=acfg, diffusion_cfg=dcfg, vocoder_cfg=vcfg,
        )


from tortoise_tpu.pipeline.common import device_barrier as _sync


@dataclasses.dataclass
class SynthesisResult:
    audio: np.ndarray
    sample_rate: int
    mel: np.ndarray
    sequences: List[List[int]]
    latents: List[np.ndarray]
    tokens: List[int]
    timings: dict

    def save(self, path: str) -> None:
        write_wav(path, self.audio, self.sample_rate)


def synthesize_batch(
    models: TortoiseModels,
    messages: Optional[List[str]] = None,
    tokens_list: Optional[List[List[int]]] = None,
    voices=None,
    seed: int = 0,
    compute_dtype=None,
    tokenizer_method: str = "greedy",
    mesh=None,
    progress=None,
    int8_weights: bool = False,
    stage_sync: bool = False,
    materialize: bool = True,
    sampler_params=None,
) -> List[SynthesisResult]:
    """Batched serving path: synthesize several utterances together. Each
    stage runs one batched on-device computation with per-row masked
    lengths. Pass `mesh` (e.g. parallel.make_mesh(...)) to shard the batch
    dimension over its "dp" axis — batch size should divide the dp size
    (otherwise inputs fall back to replicated placement). `voices`: one
    (d,) latent shared by all rows, a (B, d) array, or a list of
    paths/arrays per row. `sampler_params`: (temperature, top_k,
    top_p_drop, repetition_penalty) tuple or dict for the whole batch
    (ar_stage.normalize_sampler); None keeps the reference defaults."""
    from tortoise_tpu.pipeline.ar_stage import autoregressive_batch
    from tortoise_tpu.pipeline.diffusion_stage import diffusion_batch
    from tortoise_tpu.pipeline.vocoder_stage import vocoder_batch

    if tokens_list is None:
        if messages is None:
            raise ValueError("pass messages or tokens_list")
        if models.tokenizer is None:
            raise ValueError("no tokenizer available; pass tokens_list")
        tokens_list = [
            models.tokenizer.encode_pipeline(m, tokenizer_method)
            for m in messages
        ]
    b = len(tokens_list)
    if isinstance(voices, (list, tuple)):
        voices = np.stack([
            load_voice_latent(v, models.ar_cfg.d_model)
            if isinstance(v, str) else np.asarray(v, np.float32)
            for v in voices
        ])
    elif isinstance(voices, str):
        voices = load_voice_latent(voices, models.ar_cfg.d_model)
    if voices is None:
        raise ValueError("voice latents are required")

    models.to_device(include_ar=False, include_diffusion=not int8_weights)
    timings = {}
    if progress is None:
        # device-resident stage handoff: latents and mel never round-trip
        # through the host between stages; place_batch reshards the device
        # arrays over the dp axis when a mesh is given
        from tortoise_tpu.pipeline.diffusion_stage import (
            diffusion_batch_device,
        )
        from tortoise_tpu.pipeline.vocoder_stage import vocoder_batch_device

        t0 = time.monotonic()
        lat_dev, keeps, sequences = autoregressive_batch(
            models.ar_params, tokens_list, voices, models.ar_cfg,
            seed=seed, compute_dtype=compute_dtype, mesh=mesh,
            int8_weights=int8_weights, return_device_latents=True,
            substage_timings=timings if stage_sync else None,
            sampler_params=sampler_params,
        )
        if stage_sync:
            _sync(lat_dev)
        timings["autoregressive_s"] = time.monotonic() - t0

        t0 = time.monotonic()
        mel_dev, out_lens = diffusion_batch_device(
            models.diffusion_params, lat_dev, keeps, models.diffusion_cfg,
            seed=seed + 1, compute_dtype=compute_dtype, mesh=mesh,
            int8_weights=int8_weights,
        )
        if stage_sync:
            _sync(mel_dev)
        timings["diffusion_s"] = time.monotonic() - t0

        t0 = time.monotonic()
        audios = vocoder_batch_device(
            models.vocoder_params, mel_dev, out_lens, models.vocoder_cfg,
            seed=seed + 2, compute_dtype=compute_dtype, mesh=mesh,
        )
        timings["vocoder_s"] = time.monotonic() - t0

        if materialize:
            mel_h = np.asarray(mel_dev)
            lat_h = np.asarray(lat_dev)
            mels = [mel_h[i, :, : out_lens[i]] for i in range(b)]
            latents = [lat_h[i, : keeps[i]] for i in range(b)]
        else:
            # serving mode: skip the mel/latent downloads (~0.12 s through
            # the remote-TPU tunnel); fields stay None
            mels = [None] * b
            latents = [None] * b
    else:
        t0 = time.monotonic()
        latents, sequences = autoregressive_batch(
            models.ar_params, tokens_list, voices, models.ar_cfg,
            seed=seed, compute_dtype=compute_dtype, mesh=mesh,
            int8_weights=int8_weights, sampler_params=sampler_params,
        )
        timings["autoregressive_s"] = time.monotonic() - t0

        t0 = time.monotonic()
        mels = diffusion_batch(models.diffusion_params, latents,
                               models.diffusion_cfg, seed=seed + 1,
                               compute_dtype=compute_dtype, mesh=mesh,
                               progress=progress,
                               int8_weights=int8_weights)
        timings["diffusion_s"] = time.monotonic() - t0

        t0 = time.monotonic()
        audios = vocoder_batch(models.vocoder_params, mels,
                               models.vocoder_cfg, seed=seed + 2,
                               compute_dtype=compute_dtype, mesh=mesh)
        timings["vocoder_s"] = time.monotonic() - t0

    return [
        SynthesisResult(
            audio=audios[i],
            sample_rate=models.vocoder_cfg.sample_rate,
            mel=mels[i],
            sequences=[sequences[i]],
            latents=[latents[i]],
            tokens=list(tokens_list[i]),
            # per-row copy: rows report the same whole-batch stage walls,
            # but a caller mutating one row's dict must not edit them all
            timings=dict(timings),
        )
        for i in range(b)
    ]


def synthesize(
    models: TortoiseModels,
    message: Optional[str] = None,
    tokens: Optional[List[int]] = None,
    voice: "np.ndarray | str" = None,
    seed: int = 0,
    batch_size: int = 1,
    sampler: str = "jax",
    rng=None,
    compute_dtype=None,
    tokenizer_method: str = "greedy",
    progress=None,
    int8_weights: bool = False,
    stage_sync: bool = False,
    materialize: bool = True,
    sampler_params=None,
) -> SynthesisResult:
    """Run the full pipeline. Provide `message` (tokenized via the models'
    tokenizer) or raw wrapped `tokens`. `voice` is a 1024-f32 latent array
    or a path to a voice .bin."""
    if tokens is None:
        if models.tokenizer is None:
            raise ValueError("no tokenizer available; pass tokens directly")
        tokens = models.tokenizer.encode_pipeline(message, tokenizer_method)
    if isinstance(voice, str):
        voice = load_voice_latent(voice, models.ar_cfg.d_model)
    if voice is None:
        raise ValueError("a voice latent (array or path) is required")

    if sampler == "reference" and rng is None:
        from tortoise_tpu.rng import ReferenceRng

        rng = ReferenceRng(seed)

    models.to_device(include_ar=False, include_diffusion=not int8_weights)
    timings = {}
    if sampler == "jax" and rng is None and progress is None:
        # device-resident fast path: latents and mel never round-trip
        # through the host between stages (~0.3 s of tunnel transfers)
        t0 = time.monotonic()
        lat_dev, keeps, sequences = ar_stage.autoregressive(
            models.ar_params, tokens, voice, batch_size, models.ar_cfg,
            sampler=sampler, seed=seed, compute_dtype=compute_dtype,
            int8_weights=int8_weights, return_device_latents=True,
            substage_timings=timings if stage_sync else None,
            sampler_params=sampler_params,
        )
        if stage_sync:
            _sync(lat_dev)
        timings["autoregressive_s"] = time.monotonic() - t0

        # like the reference CLI, synthesize from the first candidate
        # (main.cpp:6577-6579)
        t0 = time.monotonic()
        mel_dev, out_lens = diffusion_stage.diffusion_batch_device(
            models.diffusion_params, lat_dev[0:1], [keeps[0]],
            models.diffusion_cfg, seed=seed + 1,
            compute_dtype=compute_dtype, int8_weights=int8_weights,
        )
        if stage_sync:
            _sync(mel_dev)
        timings["diffusion_s"] = time.monotonic() - t0

        t0 = time.monotonic()
        audio = vocoder_stage.vocoder_batch_device(
            models.vocoder_params, mel_dev, out_lens, models.vocoder_cfg,
            seed=seed + 2, compute_dtype=compute_dtype,
        )[0]
        timings["vocoder_s"] = time.monotonic() - t0

        if materialize:
            mel = np.asarray(mel_dev)[0, :, : out_lens[0]]
            latents = [np.asarray(lat_dev[b, : keeps[b]])
                       for b in range(lat_dev.shape[0])]
        else:
            # serving mode: skip the mel/latent downloads. latents stays
            # a per-candidate LIST (of Nones) so result.latents[i] is
            # shape-stable with the materialized form and with
            # synthesize_batch's rows
            mel = None
            latents = [None] * lat_dev.shape[0]
    else:
        t0 = time.monotonic()
        latents, sequences = ar_stage.autoregressive(
            models.ar_params, tokens, voice, batch_size, models.ar_cfg,
            sampler=sampler, seed=seed, rng=rng,
            compute_dtype=compute_dtype, int8_weights=int8_weights,
            sampler_params=sampler_params,
            substage_timings=timings if stage_sync else None,
        )
        timings["autoregressive_s"] = time.monotonic() - t0

        t0 = time.monotonic()
        mel = diffusion_stage.diffusion(
            models.diffusion_params, latents[0], models.diffusion_cfg,
            seed=seed + 1, rng=rng, compute_dtype=compute_dtype,
            progress=progress, int8_weights=int8_weights,
        )
        timings["diffusion_s"] = time.monotonic() - t0

        t0 = time.monotonic()
        audio = vocoder_stage.vocoder(
            models.vocoder_params, mel, models.vocoder_cfg, seed=seed + 2,
            rng=rng, compute_dtype=compute_dtype,
        )
        timings["vocoder_s"] = time.monotonic() - t0

    return SynthesisResult(
        audio=audio,
        sample_rate=models.vocoder_cfg.sample_rate,
        mel=mel,
        sequences=sequences,
        latents=latents,
        tokens=list(tokens),
        timings=timings,
    )
