"""Command-line entry point.

Mirrors the reference CLI (main.cpp:6528-6583):

    python -m tortoise_tpu.cli --message "hello world" \
        --voice ../models/mol.bin --seed 0 --output out.wav

plus flags the reference hardcodes: --models (weight dir), --batch-size
(candidate sequences), --sampler jax|reference, --random-weights (synthetic
checkpoint for flow testing when the GGML weights are absent).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tortoise_tpu",
        description="TPU-native Tortoise-TTS inference",
    )
    p.add_argument("--message", default="this is a test message.",
                   help="text to synthesize")
    p.add_argument("--tokens", default=None,
                   help="raw comma-separated text token ids, bypassing the "
                        "tokenizer — the full wrapped sequence including "
                        "the 255 prefix and 0 suffix, exactly what the "
                        "reference's parse_tokens_from_string consumes "
                        "(common.cpp:341-351, main.cpp:5049-5063); "
                        "overrides --message")
    p.add_argument("--messages-file", default=None,
                   help="file with one message per line: synthesize all of "
                        "them as one batched computation; outputs get a "
                        "-<i> suffix")
    p.add_argument("--voice", default=None,
                   help="path to a 1024-f32 voice latent .bin")
    p.add_argument("--output", default="output.wav", help="output WAV path")
    p.add_argument("--seed", type=int, default=None,
                   help="RNG seed (default: wall clock, like the reference "
                        "when --seed is omitted, main.cpp:6545-6547)")
    p.add_argument("--no-progress", action="store_true",
                   help="disable the live diffusion progress bar")
    p.add_argument("--models", default="models",
                   help="directory with ggml-*.bin + tokenizer.json")
    p.add_argument("--cache-dir", default=None,
                   help="directory for converted .npz checkpoint cache")
    p.add_argument("--batch-size", type=int, default=1,
                   help="AR candidate sequences")
    p.add_argument("--sampler", choices=("jax", "reference"), default="jax",
                   help="jax: on-device sampling; reference: mt19937 parity")
    p.add_argument("--tokenizer-method", choices=("greedy", "bpe"),
                   default="greedy",
                   help="greedy matches the reference runtime; bpe matches "
                        "upstream tortoise-tts")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 matmuls (faster on TPU)")
    p.add_argument("--int8-weights", action="store_true",
                   help="int8 matmul weights (per-column scales): halves "
                        "the AR decode weight-streaming bytes (~3e-3 "
                        "relative logit error, fused Pallas decode trunk) "
                        "and runs the denoiser's hot matmuls on the int8 "
                        "MXU (~10%% off the diffusion step)")
    p.add_argument("--temperature", type=float, default=None,
                   help="AR sampling temperature (default 0.8, the "
                        "reference's hardcoded constant, main.cpp:4791)")
    p.add_argument("--top-k", type=int, default=None,
                   help="AR top-k candidates (default 50; >128 takes the "
                        "XLA sampler plane instead of the fused kernel)")
    p.add_argument("--top-p-drop", type=float, default=None,
                   help="drop candidates whose ascending-inclusive "
                        "cumulative mass is <= this (default 0.2, the "
                        "reference's quirked nucleus rule)")
    p.add_argument("--repetition-penalty", type=float, default=None,
                   help="penalty on the previous token's logit "
                        "(default 2.0)")
    p.add_argument("--diffusion-steps", type=int, default=80,
                   help="respaced DDPM steps (80 matches the reference; "
                        "fewer is faster at some quality cost)")
    p.add_argument("--no-flash", action="store_true",
                   help="disable the Pallas flash-attention kernel "
                        "(auto-enabled on TPU)")
    p.add_argument("--stream", action="store_true",
                   help="streaming synthesis: windowed diffusion + chunked "
                        "vocoding emit audio while later frames still "
                        "denoise; prints first-audio latency "
                        "(pipeline/streaming.py — beyond-reference axis)")
    p.add_argument("--stream-window", type=int, default=352,
                   help="streaming: mel frames denoised per window "
                        "(default 352; 352+32 overlap = 3 pad-free "
                        "128-query flash blocks)")
    p.add_argument("--stream-overlap", type=int, default=32,
                   help="streaming: crossfaded frames between adjacent "
                        "windows (default 32)")
    p.add_argument("--stream-first-window", type=int, default=96,
                   help="streaming: smaller FIRST window — first-audio "
                        "latency scales with its width (default 96, the "
                        "measured on-chip optimum; 0 disables the "
                        "override)")
    p.add_argument("--vocoder-margin", type=int, default=32,
                   help="streaming: context frames vocoded on each side "
                        "of a chunk and discarded — emission lags mel "
                        "finalization by this many frames (default 32, "
                        "sufficient for exact chunking)")
    p.add_argument("--random-weights", action="store_true",
                   help="use a synthetic random checkpoint (flow testing "
                        "without the published weights)")
    p.add_argument("--tiny", action="store_true",
                   help="with --random-weights: tiny test-size models")
    return p


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.diffusion_steps < 2:
        # fail at parse time — the schedule only rejects this after the
        # full AR stage has already run (pipeline/schedule.py)
        parser.error(f"--diffusion-steps must be >= 2, "
                     f"got {args.diffusion_steps}")
    if args.seed is None:
        # unseeded runs vary, like the reference's wall-clock default
        # (main.cpp:39-50, 6545-6547)
        import time

        args.seed = int(time.time()) & 0x7FFFFFFF

    import numpy as np

    from tortoise_tpu.pipeline.synthesize import TortoiseModels, synthesize
    from tortoise_tpu.utils.progress import progress_bar
    from tortoise_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    progress = None if args.no_progress else progress_bar
    from tortoise_tpu.pipeline.ar_stage import sampler_overrides

    sampler_params = sampler_overrides(
        args.temperature, args.top_k, args.top_p_drop,
        args.repetition_penalty)

    if args.random_weights:
        models = TortoiseModels.random(args.seed, tiny=args.tiny)
        if models.tokenizer is None and not args.tiny:
            # tiny models have a toy vocab the real tokenizer would overflow
            import os

            tok_path = os.path.join(args.models, "tokenizer.json")
            if os.path.exists(tok_path):
                from tortoise_tpu.text.tokenizer import Tokenizer

                models.tokenizer = Tokenizer.from_file(tok_path)
    else:
        models = TortoiseModels.from_ggml_dir(args.models, args.cache_dir)

    import os

    if args.voice is not None:
        voice = args.voice
        if not os.path.exists(voice):
            # bare voice name: resolve against the models dir (the shipped
            # voices are models/{mol,mouse,notactuallymyself,random}.bin);
            # try the raw name too so '--voice mol.bin' works from any cwd
            for candidate in (os.path.join(args.models, voice + ".bin"),
                              os.path.join(args.models, voice)):
                if os.path.exists(candidate):
                    voice = candidate
                    break
            else:
                raise SystemExit(f"voice not found: {args.voice}")
    else:
        # the reference defaults to ../models/mol.bin (README.md:49);
        # synthetic checkpoints have no matching latent file
        default_voice = os.path.join(args.models, "mol.bin")
        if os.path.exists(default_voice) and not args.random_weights:
            voice = default_voice
        else:
            voice = np.zeros((models.ar_cfg.d_model,), np.float32)
            print("warning: no --voice given; using a zero conditioning "
                  "latent", file=sys.stderr)

    compute_dtype = None
    if args.bf16:
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16

    import dataclasses

    import jax

    on_tpu = jax.default_backend() == "tpu"
    models.diffusion_cfg = dataclasses.replace(
        models.diffusion_cfg,
        n_sample_timesteps=args.diffusion_steps,
        use_flash=(on_tpu and not args.no_flash),
    )

    def standin_tokens(rng, n):
        return rng.integers(1, models.ar_cfg.n_text_vocab, size=n).tolist()

    if args.messages_file:
        if args.sampler != "jax" or args.batch_size != 1:
            raise SystemExit(
                "--messages-file is the batched jax-sampler path; "
                "--sampler reference and --batch-size apply to --message")
        if args.stream or args.tokens is not None:
            # reject rather than silently run the one-shot batched path
            # (--stream would never stream; --tokens would be ignored)
            raise SystemExit(
                "--messages-file conflicts with --stream and --tokens; "
                "they apply to the single-utterance path")
        from tortoise_tpu.pipeline.synthesize import synthesize_batch

        with open(args.messages_file) as f:
            messages = [line.strip() for line in f if line.strip()]
        if not messages:
            raise SystemExit(f"{args.messages_file}: no messages found")
        tokens_list = None
        if models.tokenizer is None:
            # stand-in ids per line (tiny random models have a toy vocab)
            rng = np.random.default_rng(args.seed)
            tokens_list = [
                standin_tokens(rng, max(2, min(len(m), 12)))
                for m in messages
            ]
            print("warning: no tokenizer.json; using stand-in tokens",
                  file=sys.stderr)
        results = synthesize_batch(
            models, messages=messages, tokens_list=tokens_list,
            voices=voice, seed=args.seed, compute_dtype=compute_dtype,
            tokenizer_method=args.tokenizer_method, progress=progress,
            int8_weights=args.int8_weights, sampler_params=sampler_params,
        )
        root, ext = os.path.splitext(args.output)
        for i, r in enumerate(results):
            path = f"{root}-{i}{ext or '.wav'}"
            r.save(path)
            print(f"wrote {path}: {len(r.audio)} samples "
                  f"({len(r.audio) / r.sample_rate:.2f}s)")
        total = sum(results[0].timings.values())
        dur = sum(len(r.audio) for r in results) / results[0].sample_rate
        print(f"batch of {len(results)}: {total:.2f}s "
              f"(RTF {total / max(dur, 1e-9):.3f})")
        return 0

    tokens = None
    if args.tokens is not None:
        # raw-id path (reference parse_tokens_from_string semantics): the
        # ids are used verbatim — no [SPACE] replacement, no 255/0 wrap
        try:
            tokens = [int(t) for t in args.tokens.split(",") if t.strip()]
        except ValueError:
            raise SystemExit(f"--tokens must be comma-separated integers, "
                             f"got {args.tokens!r}")
        if not tokens:
            raise SystemExit("--tokens parsed to an empty id list")
    elif models.tokenizer is None:
        # tiny random models have no meaningful vocab; make stand-in tokens
        tokens = standin_tokens(np.random.default_rng(args.seed), 8)
        print("warning: no tokenizer.json; using stand-in tokens",
              file=sys.stderr)

    if args.stream:
        if args.sampler != "jax" or args.batch_size != 1:
            # mirror the --messages-file guard: rejecting beats silently
            # sampling differently from what the user asked for
            raise SystemExit(
                "--stream is the single-candidate jax-sampler path; "
                "--sampler reference and --batch-size apply to the "
                "one-shot --message path")
        import time as _time

        from tortoise_tpu.io.wav import write_wav
        from tortoise_tpu.pipeline.streaming import stream_synthesize

        t0 = _time.monotonic()
        parts = []
        first = None
        for chunk in stream_synthesize(
                models, message=args.message, tokens=tokens, voice=voice,
                seed=args.seed, compute_dtype=compute_dtype,
                int8_weights=args.int8_weights,
                window_frames=args.stream_window,
                overlap_frames=args.stream_overlap,
                vocoder_margin=args.vocoder_margin,
                first_window_frames=args.stream_first_window or None,
                sampler_params=sampler_params,
                tokenizer_method=args.tokenizer_method):
            if first is None:
                first = chunk.latency_s
                print(f"first audio after {first:.2f}s "
                      f"({len(chunk.audio)} samples)", flush=True)
            parts.append(chunk.audio)
        wall = _time.monotonic() - t0
        audio = np.concatenate(parts)
        sr = models.vocoder_cfg.sample_rate
        write_wav(args.output, audio, sr)
        dur = len(audio) / sr
        print(f"wrote {args.output}: {len(audio)} samples ({dur:.2f}s @ "
              f"{sr} Hz); first_audio {first:.2f}s, wall {wall:.2f}s "
              f"(RTF {wall / max(dur, 1e-9):.3f})")
        return 0

    result = synthesize(
        models,
        message=args.message,
        tokens=tokens,
        voice=voice,
        seed=args.seed,
        batch_size=args.batch_size,
        sampler=args.sampler,
        compute_dtype=compute_dtype,
        tokenizer_method=args.tokenizer_method,
        progress=progress,
        int8_weights=args.int8_weights,
        sampler_params=sampler_params,
    )
    result.save(args.output)
    total = sum(result.timings.values())
    dur = len(result.audio) / result.sample_rate
    print(
        f"wrote {args.output}: {len(result.audio)} samples "
        f"({dur:.2f}s @ {result.sample_rate} Hz); "
        f"stages: " + ", ".join(
            f"{k}={v:.2f}s" for k, v in result.timings.items())
        + f"; total {total:.2f}s (RTF {total / max(dur, 1e-9):.3f})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
