"""End-to-end synthesis benchmark.

Runs the full three-stage pipeline (production model shapes, synthetic
random weights — the published GGML weights are not redistributable) on
the available accelerator and reports the real-time factor:

    RTF = wall seconds / audio seconds   (lower is better)

One warmup pass absorbs jit compilation; the timed pass measures steady
state. Prints the headline JSON line as soon as the core numbers exist
and RE-EMITS it, enriched, after each optional section — consumers must
parse the LAST JSON line on stdout (it is always a complete artifact,
even if the process is killed mid-section):
    {"metric": "rtf", "value": ..., "unit": "wall_s_per_audio_s",
     "vs_baseline": ...}

vs_baseline compares against the repo north-star target RTF 0.1
(BASELINE.md; the reference publishes no numbers, BASELINE.json
`published` is empty).

The headline path is bf16 activations + int8 matmul weights for the AR
decoder (decode is weight-streaming bound; logit error pinned by
tests/test_pseudo_golden.py); the JSON also reports the bf16-weights
decode path side by side. Env knobs: BENCH_SMALL=1 reduced-size smoke
run; BENCH_F32=1 full float32; BENCH_INT8=0 to bench bf16 weights as the
headline; BENCH_BATCH_SIZES=4,8,16 serving sweep (BENCH_BATCH=0 skips);
BENCH_WARMSTART=0 skips the second-process cold-start probe;
BENCH_WEIGHTS_CACHE overrides (empty disables) the host-tree npz cache
the warm-start child loads instead of regenerating weights.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

TARGET_RTF = 0.1


def build_models(small, use_bf16, int8=False):
    """Returns (models, models_f32). With the int8 plane on and a cache
    dir set, the quantized host trees are disk-cached (io/plane_cache):
    a later process memory-maps int8 bytes straight into the device
    upload — no f32 read (2.8x the bytes), no re-quantization (was ~75 s of host
    work before the slice-wise quantizer; ~4 s now). models_f32 keeps the float
    source for the side-by-side bf16-weights path; it is None when the
    plane cache made loading f32 unnecessary."""
    import jax

    from tortoise_tpu.pipeline.synthesize import TortoiseModels

    # host-tree npz cache: the warm-start child process loads the ~2.4 GB
    # synthetic weights from disk instead of regenerating them (tens of
    # seconds); BENCH_WEIGHTS_CACHE= (empty) disables
    cache_dir = os.environ.get("BENCH_WEIGHTS_CACHE",
                               "/tmp/tortoise_bench_weights")
    plane_dir = None
    if cache_dir and int8:
        plane_dir = os.path.join(
            cache_dir, f"plane_int8_{'tiny' if small else 'full'}_0")
    models_f32 = None
    models = None
    if plane_dir:
        from tortoise_tpu.io import plane_cache

        tree = plane_cache.load_plane(plane_dir)
        if tree is not None:
            models = TortoiseModels(
                ar_params=tree["ar"], diffusion_params=tree["diffusion"],
                vocoder_params=tree["vocoder"])
            if small:
                from tortoise_tpu.config import (
                    tiny_ar_config, tiny_diffusion_config,
                    tiny_vocoder_config)

                models.ar_cfg = tiny_ar_config()
                models.diffusion_cfg = tiny_diffusion_config()
                models.vocoder_cfg = tiny_vocoder_config()
    if models is None:
        models_f32 = TortoiseModels.random(seed=0, tiny=small,
                                           cache_dir=cache_dir or None)
        models = models_f32
        if plane_dir:
            import dataclasses as dc

            from tortoise_tpu.io import plane_cache
            from tortoise_tpu.pipeline.ar_stage import quantize_ar_host
            from tortoise_tpu.pipeline.diffusion_stage import (
                quantize_diffusion_weights,
            )

            ar_q = quantize_ar_host(models_f32.ar_params)
            diff_q = quantize_diffusion_weights(models_f32.diffusion_params)
            plane_cache.save_plane(
                {"ar": ar_q, "diffusion": diff_q,
                 "vocoder": models_f32.vocoder_params}, plane_dir)
            # run on the quantized trees (the pipeline's idempotent casts
            # pass them through); keep models_f32 for the alt-weights path
            models = dc.replace(models_f32, ar_params=ar_q,
                                diffusion_params=diff_q)
    if small:
        models.ar_cfg = dataclasses.replace(models.ar_cfg,
                                            max_decode_steps=8,
                                            pad_mel_length=8)
    if jax.default_backend() == "tpu" and os.environ.get(
            "BENCH_NO_FLASH") != "1":
        models.diffusion_cfg = dataclasses.replace(models.diffusion_cfg,
                                                   use_flash=True)
    # flash-kernel knob overrides for sweeps (config fields, trace-time)
    for env, field in (("BENCH_FLASH_BQ", "flash_bq"),
                       ("BENCH_FLASH_HPP", "flash_hpp"),
                       ("BENCH_FLASH_GROUP", "flash_group"),
                       ("BENCH_FLASH_VMEM_MB", "flash_vmem_mb"),
                       ("BENCH_DIFF_UNROLL", "main_unroll")):
        if os.environ.get(env):
            models.diffusion_cfg = dataclasses.replace(
                models.diffusion_cfg, **{field: int(os.environ[env])})
    return models, models_f32


def checked_sync(run_sync, max_tries: int = 3, ref_wall=None):
    """Run a stage-synced pass and verify the decomposition is
    trustworthy, two ways:

    1. self-consistent: the top-level stage walls (autoregressive_s +
       diffusion_s + vocoder_s) must sum to within 25% of the pass's own
       wall (BENCH_r03's batched B=8 entry summed to 21.1 s against a
       10.8 s wall);
    2. representative: with ``ref_wall`` (the async steady-state wall the
       decomposition is meant to explain), the sync pass's wall must be
       within 2x of it — a recompile or tunnel stall inflating one stage
       passes check 1 with a garbage decomposition (an r5 probe recorded
       a self-consistent sync pass at 14.2 s against a 1.57 s steady
       wall, with 11.1 s "prefill").

    Retries up to max_tries, keeps the best pass (consistent first, then
    smallest wall), and reports the retry count + final verdict so the
    artifact discloses what happened.

    run_sync() -> (timings_dict, wall_s, payload). Returns
    (payload, timings, wall, {"sync_retries": n, "sync_consistent": ok}).
    """
    top = ("autoregressive_s", "diffusion_s", "vocoder_s")
    best = None
    attempts = []
    for attempt in range(max_tries):
        timings, wall, payload = run_sync()
        attempts.append((timings, wall, payload))
        ssum = sum(timings.get(k, 0.0) for k in top)
        err = abs(ssum - wall) / max(wall, 1e-9)
        ok = err <= 0.25 and (ref_wall is None or wall <= 2.0 * ref_wall)
        # fallback preference: a SELF-CONSISTENT slow pass beats a fast
        # pass whose stages don't sum (the r03 garbage class) — if the
        # composed-minimum route below is also rejected, the most
        # self-consistent decomposition is the honest one to ship
        key = (not ok, err, wall)
        if best is None or key < best[0]:
            best = (key, timings, wall, payload)
        if ok:
            return payload, timings, wall, {
                "sync_retries": attempt, "sync_consistent": True}
        print(f"stage-sync decomposition untrustworthy (sum {ssum:.2f}s, "
              f"wall {wall:.2f}s, async ref "
              f"{ref_wall if ref_wall is None else round(ref_wall, 2)}s), "
              f"retrying", file=sys.stderr, flush=True)
    # no single pass was clean (on the tunneled dev slice a stall can
    # recur every pass, e.g. executable reloads landing on one stage's
    # barrier): compose the least-contaminated decomposition from the
    # per-substage MINIMUM across attempts and validate THAT against the
    # async wall. Disclosed via sync_composed so the artifact says the
    # split is a per-stage best, not one execution.
    _, timings, wall, payload = best
    keys = set().union(*(t.keys() for t, _, _ in attempts))
    composed = {k: min(t[k] for t, _, _ in attempts if k in t)
                for k in keys}
    csum = sum(composed.get(k, 0.0) for k in top)
    if ref_wall is not None and csum <= 2.0 * ref_wall:
        return payload, composed, csum, {
            "sync_retries": max_tries - 1, "sync_consistent": True,
            "sync_composed": True}
    return payload, timings, wall, {
        "sync_retries": max_tries - 1, "sync_consistent": False}


def kernel_selfcheck() -> dict:
    """On-TPU correctness check of every Mosaic kernel the bench relies
    on, against its XLA reference, at production head/lane dims but
    small layer/sequence counts (seconds, not minutes, of compile).

    CPU tests drive these kernels in interpret mode only; without this,
    a Mosaic miscompile on the real chip would surface as silently wrong
    audio (or as a bench fallback), not as a visible artifact field. The
    result dict lands in the bench JSON: per-kernel max |diff| plus an
    `ok` verdict against thresholds ~10x the observed-good values."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tortoise_tpu.config import ARConfig
    from tortoise_tpu.io.checkpoint import random_ar_params
    from tortoise_tpu.models import ar
    from tortoise_tpu.ops.pallas.flash_attention import (
        flash_attention_causal_qkv,
        flash_attention_packed,
        xla_attention,
    )
    from tortoise_tpu.pipeline.ar_stage import cast_matmul_weights

    out = {}
    rng = np.random.default_rng(0)
    interp = False  # this check is only meaningful on the real backend

    # 1) packed band-bias flash kernel (diffusion attention) vs XLA
    b, h, t, d = 2, 16, 512, 64
    qkv = jnp.asarray(rng.normal(0, 1, (b, t, 3 * h * d)), jnp.bfloat16)
    table = jnp.asarray(rng.normal(0, 0.1, (32, h)), jnp.float32)
    valid = jnp.asarray(np.arange(t)[None, :] < np.array([t - 40, t])[:, None])
    got = np.asarray(flash_attention_packed(
        qkv, h, valid, bias_table=table, hpp=4, interpret=interp),
        np.float32)
    q5 = np.asarray(qkv, np.float32).reshape(b, t, h, 3, d)
    from tortoise_tpu.ops.relpos import relative_position_buckets, relpos_bias

    buckets = jnp.asarray(relative_position_buckets(t, 32, 64))
    bias = relpos_bias(table, buckets)  # (h, t, t) incl. the x8 scale
    want = np.asarray(xla_attention(
        jnp.asarray(q5[:, :, :, 0].transpose(0, 2, 1, 3)),
        jnp.asarray(q5[:, :, :, 1].transpose(0, 2, 1, 3)),
        jnp.asarray(q5[:, :, :, 2].transpose(0, 2, 1, 3)),
        bias=bias, kv_valid=valid))
    want = want.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    out["packed_flash_maxdiff"] = float(np.abs(got - want).max())

    # 2) causal packed kernel (AR prefill/latent) vs XLA — NOTE this
    # kernel's qkv layout is PART-MAJOR ([all q | all k | all v], each
    # part h*D + d), unlike the diffusion kernel's per-head interleave
    got = np.asarray(flash_attention_causal_qkv(
        qkv, h, valid, interpret=interp), np.float32)
    qc = np.asarray(qkv, np.float32)
    hd = h * d
    parts = [qc[:, :, i * hd : (i + 1) * hd]
             .reshape(b, t, h, d).transpose(0, 2, 1, 3) for i in range(3)]
    want = np.asarray(xla_attention(
        jnp.asarray(parts[0]), jnp.asarray(parts[1]), jnp.asarray(parts[2]),
        kv_valid=valid, causal=True))
    want = want.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    out["causal_flash_maxdiff"] = float(np.abs(got - want).max())

    # 3) fused int8 decode trunk (+ lm head) vs the XLA scan plane:
    # production width/heads, 2 layers, small cache/vocab
    cfg = ARConfig(n_layer=2, cache_len=256, n_mel_vocab=1024,
                   n_text_vocab=64, n_text_pos=32, fused_decode=True,
                   start_mel_token=1022, stop_mel_token=1023)
    params = cast_matmul_weights(random_ar_params(cfg, seed=1, fast=True),
                                 jnp.bfloat16, int8=True)
    text = jnp.asarray(rng.integers(0, 64, (2, 12)), jnp.int32)
    tvalid = jnp.ones((2, 12), bool)
    vc = jnp.asarray(rng.normal(0, 0.5, (cfg.d_model,)), jnp.float32)
    _, cache = ar.prefill(params, cfg, text, tvalid, vc, jnp.bfloat16)
    toks = jnp.asarray([3, 5], jnp.int32)
    cfg_off = dataclasses.replace(cfg, fused_decode=False)
    l_fused, c_fused = ar.decode_step(params, cfg, cache, toks,
                                      jnp.int32(0), jnp.bfloat16)
    l_xla, c_xla = ar.decode_step(params, cfg_off, cache, toks,
                                  jnp.int32(0), jnp.bfloat16)
    out["decode_trunk_logits_maxdiff"] = float(
        np.abs(np.asarray(l_fused) - np.asarray(l_xla)).max())
    out["decode_trunk_kv_maxdiff"] = float(np.abs(
        np.asarray(c_fused.k, np.float32)
        - np.asarray(c_xla.k, np.float32)).max())

    # thresholds ~10x observed-good (bf16 accumulation-order spread)
    limits = {"packed_flash_maxdiff": 0.2, "causal_flash_maxdiff": 0.2,
              "decode_trunk_logits_maxdiff": 0.5,
              "decode_trunk_kv_maxdiff": 0.2}
    out["ok"] = all(out[k] <= v for k, v in limits.items())
    return out


def main() -> int:
    small = os.environ.get("BENCH_SMALL") == "1"
    use_bf16 = os.environ.get("BENCH_F32") != "1"
    child = os.environ.get("BENCH_CHILD") == "1"

    # Wall-clock budget. The driver runs this under an external `timeout`
    # (round 4's end-of-round run hit it: rc 124, no metric line shipped).
    # Two defenses: (a) the headline JSON line is emitted as soon as the
    # core single-utterance numbers exist and RE-emitted, enriched, after
    # each optional section — a kill mid-section still leaves a complete
    # parsable artifact as the last JSON line; (b) optional sections
    # (streaming, batch sweep, alt weight plane, warm-start probe) are
    # skipped once the budget runs low, with the skips disclosed.
    bench_t0 = time.monotonic()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))

    def remaining_s() -> float:
        return budget_s - (time.monotonic() - bench_t0)

    import jax

    from tortoise_tpu.pipeline.synthesize import synthesize
    from tortoise_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    compute_dtype = None
    if use_bf16:
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16

    # int8 AR + denoiser matmul weights are the production default (decode
    # is weight-streaming bound: 1.45 vs 1.86 ms/step measured r2; logit
    # error pinned by tests/test_pseudo_golden.py)
    int8 = os.environ.get("BENCH_INT8", "1") == "1" and use_bf16

    t_build0 = time.monotonic()
    models, models_f32 = build_models(small, use_bf16, int8)
    build_s = time.monotonic() - t_build0
    if child:
        # split the warm-start cost: host weight load above (mmap'd plane
        # cache when present — no f32 read, no re-quantization); the
        # device upload through the tunnel here, int8 bytes for both big
        # trees. What's left for first_run_s is cached-compile loads +
        # dispatch.
        import jax.numpy as jnp_

        from tortoise_tpu.pipeline.ar_stage import cast_matmul_weights

        from tortoise_tpu.pipeline.common import device_barrier

        def barrier_tree(tree):
            # barrier the FIRST and LAST enqueued leaves: transfers to
            # one device land in enqueue order, so the last completing
            # bounds the whole tree (a 1-element read per leaf would add
            # hundreds of tunnel round trips to the thing being timed)
            leaves = [x for x in jax.tree.leaves(tree)
                      if hasattr(x, "devices")]
            for leaf in (leaves[:1] + leaves[-1:]):
                device_barrier(leaf)

        t_up = time.monotonic()
        models.to_device(include_ar=False, include_diffusion=not int8)
        dtree = models.diffusion_params
        if int8:
            from tortoise_tpu.pipeline.diffusion_stage import _prepare_params

            dtree = _prepare_params(models.diffusion_params, True)
            atree = cast_matmul_weights(models.ar_params, compute_dtype,
                                        int8=True)
            barrier_tree(atree)
        barrier_tree(dtree)
        barrier_tree(models.vocoder_params)
        upload_s = time.monotonic() - t_up
    rng = np.random.default_rng(0)
    # production wrapping prepends id 255; clamp into the vocab for the
    # BENCH_SMALL tiny models (32-entry vocab) — OOV ids are rejected at
    # the stage boundary
    start_tok = min(255, models.ar_cfg.n_text_vocab - 1)
    tokens = [start_tok] + rng.integers(
        3, models.ar_cfg.n_text_vocab, size=24
    ).tolist() + [0]
    voice = rng.normal(0, 0.5, (models.ar_cfg.d_model,)).astype(np.float32)

    def run(seed, stage_sync=False, int8_weights=int8):
        t0 = time.monotonic()
        result = synthesize(models, tokens=tokens, voice=voice, seed=seed,
                            batch_size=1, sampler="jax",
                            compute_dtype=compute_dtype,
                            int8_weights=int8_weights,
                            stage_sync=stage_sync, materialize=False)
        wall = time.monotonic() - t0
        return result, wall

    # warmup: compile everything (AR prefill/loop/latents, diffusion,
    # vocoder) for this shape set. If the fused decode kernel fails to
    # compile on this backend (Mosaic regressions have version-skewed on
    # the tunneled dev slice before), fall back to the XLA decode plane
    # rather than losing the whole benchmark; the JSON discloses it.
    if (not child and jax.default_backend() == "tpu"
            and os.environ.get("BENCH_KERNEL_CHECK", "1") == "1"):
        # explicit on-chip kernel-vs-XLA correctness gate: a Mosaic
        # regression shows up as a red `kernel_check.ok` in the artifact
        # instead of silently wrong audio (CPU tests only exercise the
        # kernels in interpret mode)
        try:
            kc = kernel_selfcheck()
        except Exception as e:
            kc = {"ok": False, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({"kernel_check": kc}), file=sys.stderr, flush=True)
    else:
        kc = None

    fused_fallback = None
    try:
        _, compile_wall = run(0)
    except Exception as e:
        if not models.ar_cfg.fused_decode:
            raise
        fused_fallback = f"{type(e).__name__}: {e}"[:300]
        print(f"fused decode plane failed, retrying on the XLA plane: "
              f"{fused_fallback}", file=sys.stderr, flush=True)
        models.ar_cfg = dataclasses.replace(models.ar_cfg,
                                            fused_decode=False)
        _, compile_wall = run(0)

    if child:
        # second-process probe: report this process's first-run wall (the
        # persistent-cache warm-start cost: weight upload + cached-compile
        # loads) plus one steady-state pass, and exit. Emitted
        # progressively (first-run line before the steady pass) so a
        # parent-side timeout mid-steady still salvages the warm-start
        # numbers from partial stdout.
        probe = {"first_run_s": round(compile_wall, 3),
                 "steady_run_s": None,
                 "weights_build_s": round(build_s, 3),
                 "upload_s": round(upload_s, 3),
                 "plane_cache_hit": models_f32 is None and int8}
        print(json.dumps(probe), flush=True)
        _, steady = run(1)
        probe["steady_run_s"] = round(steady, 3)
        print(json.dumps(probe), flush=True)
        return 0

    # the shared dev TPU slice shows +-50% run-to-run variance; report the
    # best of N timed passes
    n_timed = 1 if small else int(os.environ.get("BENCH_REPS", "3"))
    runs = [run(1 + i) for i in range(n_timed)]
    result, wall = min(runs, key=lambda rw: rw[1])
    # the async device-handoff path defers stage completion to the next
    # stage's first use; the per-stage split comes from stage-synced
    # passes, reported with its own wall (sync_wall_s) so the
    # decomposition adds up within one execution — verified by
    # checked_sync (retries on recompile/tunnel-stall contamination)
    def run_sync():
        res, wall = run(1, stage_sync=True)
        return res.timings, wall, res

    _, sync_tim, sync_wall, sync_meta = checked_sync(run_sync,
                                                     ref_wall=wall)
    result = dataclasses.replace(result, timings=sync_tim)

    audio_s = len(result.audio) / result.sample_rate
    rtf = wall / max(audio_s, 1e-9)
    device = str(jax.devices()[0])
    line = {
        "metric": "rtf",
        "value": round(rtf, 5),
        "unit": "wall_s_per_audio_s",
        "vs_baseline": round(rtf / TARGET_RTF, 4),
        "audio_s": round(audio_s, 3),
        "wall_s": round(wall, 3),
        "first_run_s": round(compile_wall, 3),
        # seconds-valued entries only (the substage split also records the
        # integer ar_decode_steps count, reported separately)
        "stages_s": {k: round(v, 3) for k, v in result.timings.items()
                     if k.endswith("_s")},
        "ar_decode_steps": int(result.timings.get("ar_decode_steps", 0)),
        "sync_wall_s": round(sync_wall, 3),
        "device": device,
        "bf16": use_bf16,
    }
    line.update(sync_meta)
    line["int8_weights"] = int8
    if kc is not None:
        line["kernel_check"] = kc
    if fused_fallback:
        line["fused_fallback"] = fused_fallback
    line.update(roofline_stats(models, result, use_bf16, int8))

    skipped_sections = []

    def emit():
        # progressive artifact: the last JSON line wins, so each section
        # completion re-ships the (now richer) headline line
        if skipped_sections:
            line["bench_sections_skipped"] = skipped_sections
        line["bench_elapsed_s"] = round(time.monotonic() - bench_t0, 1)
        print(json.dumps(line), flush=True)

    def section_fits(name: str, est_s: float) -> bool:
        if remaining_s() >= est_s:
            return True
        skipped_sections.append(name)
        print(f"bench budget low ({remaining_s():.0f}s left), skipping "
              f"{name} (~{est_s:.0f}s)", file=sys.stderr, flush=True)
        return False

    emit()  # core numbers are safe from here on

    # streaming synthesis: time-to-first-audio at steady state (windowed
    # diffusion + chunked vocoding, pipeline/streaming.py) — a
    # beyond-reference serving axis; the second run is the steady-state
    # number (the first pays the window-program compiles)
    if os.environ.get("BENCH_STREAM", "1") == "1" and section_fits(
            "streaming", 180):
        from tortoise_tpu.pipeline.streaming import stream_synthesize

        def run_stream(seed):
            t0 = time.monotonic()
            first = None
            n_samples = 0
            n_chunks = 0
            # small first window: first-audio latency scales with the
            # first window's 80-step loop width
            for chunk in stream_synthesize(
                    models, tokens=tokens, voice=voice, seed=seed,
                    compute_dtype=compute_dtype, int8_weights=int8,
                    first_window_frames=None if small else 96):
                if first is None:
                    first = chunk.latency_s
                n_samples += len(chunk.audio)
                n_chunks += 1
            return first, time.monotonic() - t0, n_samples, n_chunks

        try:
            run_stream(1)  # compile pass
            sfirst, swall, s_samples, s_chunks = run_stream(1)
            s_audio = s_samples / result.sample_rate
            line["streaming"] = {
                "first_audio_s": round(sfirst, 3),
                "wall_s": round(swall, 3),
                "audio_s": round(s_audio, 3),
                "rtf": round(swall / max(s_audio, 1e-9), 5),
                "chunks": s_chunks,
            }
        except Exception as e:
            line["streaming"] = {"error": f"{type(e).__name__}: {e}"}
        emit()

    # batched serving sweep: aggregate RTF per chip for B utterances
    # decoded together (the repo's headline TPU feature)
    if not small and os.environ.get("BENCH_BATCH", "1") == "1":
        from tortoise_tpu.pipeline.synthesize import synthesize_batch

        sizes = [int(b) for b in os.environ.get(
            "BENCH_BATCH_SIZES", "4,8,16").split(",") if b.strip()]
        line["batched"] = {}
        for bsz in sizes:
            # per-size budget gate: each size pays its own compile
            # (~60-120s cold) plus ~4 measured passes (~3-25s each)
            if not section_fits(f"batched.{bsz}", 150 + 6 * bsz):
                continue
            tlists = [
                [start_tok] + rng.integers(
                    3, models.ar_cfg.n_text_vocab, size=18 + 3 * (i % 6)
                ).tolist() + [0]
                for i in range(bsz)
            ]

            def run_batch(seed, stage_sync=False):
                t0 = time.monotonic()
                rs = synthesize_batch(
                    models, tokens_list=tlists, voices=voice, seed=seed,
                    compute_dtype=compute_dtype, int8_weights=int8,
                    stage_sync=stage_sync, materialize=False)
                return rs, time.monotonic() - t0

            # the batched fused plane compiles per (B-bucket) — guard it
            # like the single-utterance warmup so a Mosaic failure at one
            # B degrades that entry to the XLA plane instead of losing
            # the whole benchmark
            batch_fallback = None
            saved_cfg = models.ar_cfg
            try:
                _, bcompile = run_batch(0)  # warmup/compile
            except Exception as e:
                if not models.ar_cfg.fused_decode:
                    raise
                batch_fallback = f"{type(e).__name__}: {e}"[:300]
                print(f"fused decode plane failed at B={bsz}, retrying "
                      f"on the XLA plane: {batch_fallback}",
                      file=sys.stderr, flush=True)
                models.ar_cfg = dataclasses.replace(models.ar_cfg,
                                                    fused_decode=False)
                _, bcompile = run_batch(0)
            # best of two timed passes: one bad moment in a drifting
            # window otherwise ships as that B's number (an r5 interim
            # recorded B=8/16 ~22% slow while B=4, minutes earlier, was
            # at its usual level)
            rs, bwall = run_batch(1)
            if remaining_s() > 2.5 * bwall:
                # same seed: identical work, pure re-measure
                rs2, bwall2 = run_batch(1)
                if bwall2 < bwall:
                    rs, bwall = rs2, bwall2

            def run_batch_sync():
                bres, w = run_batch(1, stage_sync=True)
                return bres[0].timings, w, bres

            _, btim, bsync_wall, bsync_meta = checked_sync(
                run_batch_sync, ref_wall=bwall)
            btotal = sum(len(r.audio) / r.sample_rate for r in rs)
            line["batched"][str(bsz)] = {
                "batch": bsz,
                "wall_s": round(bwall, 3),
                "audio_s_total": round(btotal, 3),
                "aggregate_rtf": round(bwall / max(btotal, 1e-9), 5),
                "first_run_s": round(bcompile, 3),
                "stages_s": {k: round(v, 3) for k, v in btim.items()
                             if k.endswith("_s")},
                "sync_wall_s": round(bsync_wall, 3),
                **bsync_meta,
            }
            if batch_fallback:
                line["batched"][str(bsz)]["fused_fallback"] = batch_fallback
                # the fallback is per-B: restore the fused plane so later
                # batch sizes and the alt path still try it
                models.ar_cfg = saved_cfg
            emit()

    # the non-headline AR weight plane, side by side (decode is the only
    # stage the weight dtype changes). Runs AFTER the batch sweep, with
    # the headline plane's cast trees evicted first: three AR weight
    # planes resident at once (f32 source + int8 + bf16) OOM'd the batch
    # warmup on the shared dev slice.
    if (not small and use_bf16
            and os.environ.get("BENCH_ALT_PATH", "1") == "1"
            and section_fits("alt_weight_plane", 240)):
        from tortoise_tpu.pipeline.common import clear_cast_cache
        from tortoise_tpu.pipeline.synthesize import synthesize as _synth

        clear_cast_cache()
        # the alt plane needs the float tree; when the plane cache served
        # the headline run, load it now (alt is a parent-only side path)
        if models_f32 is None:
            os.environ["BENCH_WEIGHTS_CACHE"] = os.environ.get(
                "BENCH_WEIGHTS_CACHE", "/tmp/tortoise_bench_weights")
            from tortoise_tpu.pipeline.synthesize import TortoiseModels

            models_f32 = TortoiseModels.random(
                seed=0, tiny=small,
                cache_dir=os.environ["BENCH_WEIGHTS_CACHE"] or None)
        alt_models = models_f32
        # the ALT run must execute the same configs as the headline
        # (flash kernel, knob overrides, vocoder path, small-mode
        # shrinks) — models_f32 otherwise keeps construction defaults
        # and the side-by-side numbers compare different programs
        alt_models.ar_cfg = models.ar_cfg
        alt_models.diffusion_cfg = models.diffusion_cfg
        alt_models.vocoder_cfg = models.vocoder_cfg

        def run_alt(seed, stage_sync=False):
            t0 = time.monotonic()
            result = _synth(alt_models, tokens=tokens, voice=voice,
                            seed=seed, batch_size=1, sampler="jax",
                            compute_dtype=compute_dtype,
                            int8_weights=not int8,
                            stage_sync=stage_sync, materialize=False)
            return result, time.monotonic() - t0

        alt_runs = [run_alt(1 + i) for i in range(2)]
        alt, alt_wall = min(alt_runs, key=lambda rw: rw[1])
        alt_sync, _ = run_alt(1, stage_sync=True)
        alt = dataclasses.replace(alt, timings=alt_sync.timings)
        alt_audio = len(alt.audio) / alt.sample_rate
        stats = roofline_stats(models, alt, use_bf16, not int8)
        line["bf16_weights_path" if int8 else "int8_weights_path"] = {
            "rtf": round(alt_wall / max(alt_audio, 1e-9), 5),
            "wall_s": round(alt_wall, 3),
            "ar_ms_per_step": stats["ar_ms_per_step"],
            "ar_hbm_roofline_pct": stats["ar_hbm_roofline_pct"],
        }
        emit()

    # second-process cold start: with the persistent compilation cache now
    # populated, a fresh process should start in seconds, not minutes
    # (r4 interim measured ~160s of it: tunnel upload 120s + first run
    # 42s — the costliest optional section, so it runs last and is the
    # first to be budget-skipped)
    if (not small and os.environ.get("BENCH_WARMSTART", "1") == "1"
            and section_fits("warmstart", 420)):
        env = dict(os.environ, BENCH_CHILD="1", BENCH_BATCH="0",
                   BENCH_WARMSTART="0", BENCH_ALT_PATH="0")
        try:
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)], env=env,
                    capture_output=True, text=True,
                    timeout=max(60.0, min(900.0, remaining_s())))
                stdout = out.stdout
            except subprocess.TimeoutExpired as te:
                # the child emits progressively — salvage what it got to
                # (first-run line before the steady pass) and disclose
                stdout = (te.stdout or b"")
                if isinstance(stdout, bytes):
                    stdout = stdout.decode("utf-8", "replace")
                line["second_process_probe_timeout"] = True
            probe = json.loads(stdout.strip().splitlines()[-1])
            line["second_process_first_run_s"] = probe["first_run_s"]
            line["second_process_steady_run_s"] = probe.get("steady_run_s")
            # the restart tax decomposed: host weight load (plane cache),
            # tunnel upload (~20 MB/s here; PCIe on a real TPU VM), and
            # first_run_s = cached-compile loads + dispatch
            line["second_process_weights_load_s"] = probe.get(
                "weights_build_s")
            line["second_process_upload_s"] = probe.get("upload_s")
            line["second_process_plane_cache_hit"] = probe.get(
                "plane_cache_hit")
        except Exception as e:  # never fail the bench on the probe
            line["second_process_first_run_s"] = f"probe failed: {e}"

    emit()
    return 0


# v5e per-chip peaks (jax-ml.github.io/scaling-book numbers)
HBM_GBPS = 819e9
BF16_FLOPS = 197e12
F32_FLOPS = 49e12


def roofline_stats(models, result, use_bf16: bool,
                   int8: bool = False) -> dict:
    """ms/step + roofline shares for the two hot stages.

    AR decode is weight-streaming (HBM) bound: one step must read every
    matmul weight once; % of roofline = streaming-time / measured-time.
    Diffusion is MXU bound: analytic matmul FLOPs per CFG eval / peak.
    """
    import numpy as np

    acfg, dcfg = models.ar_cfg, models.diffusion_cfg
    wbytes = 1 if int8 else (2 if use_bf16 else 4)
    d = acfg.d_model
    per_layer = d * 3 * d + d * d + d * 4 * d + 4 * d * d
    ar_bytes = (acfg.n_layer * per_layer + acfg.n_mel_vocab * d) * wbytes
    # each step also streams the whole KV cache (bf16, 2 tensors), sized
    # to the text bucket like the driver does
    from tortoise_tpu.pipeline.ar_stage import pick_bucket, size_cache

    c = size_cache(acfg, pick_bucket(len(result.tokens))).cache_len
    cache_bytes = acfg.n_layer * c * d * 2 * (2 if use_bf16 else 4)
    # the stage-synced pass decomposes the AR wall (ar_stage
    # substage_timings): the roofline denominator is the DECODE LOOP
    # wall — prefill and the latent graph are MXU-bound batch passes,
    # not weight streaming, so averaging them in understated the decode
    # kernel's roofline share (49% reported vs 91% measured in r3).
    # Falls back to the whole-stage average when the split is absent.
    if "ar_decode_loop_s" in result.timings:
        n_steps = max(int(result.timings["ar_decode_steps"]), 1)
        ar_ms = result.timings["ar_decode_loop_s"] * 1e3 / n_steps
    else:
        # no substage split: the executed step count is unknown
        # (sequences are PADDED to 502 regardless of where sampling
        # stopped, so dividing by their length understates ms/step);
        # report null rather than a fabricated number
        ar_ms = None
    ar_floor_ms = (ar_bytes + cache_bytes) / HBM_GBPS * 1e3

    if result.mel is not None:
        t = result.mel.shape[-1]
    else:
        # audio = (t + pad_frames) * upsample - 6 samples
        vcfg = models.vocoder_cfg
        t = ((len(result.audio) + 6) // vcfg.total_upsample
             - vcfg.mel_pad_frames)
    dd, hh = dcfg.d_model, dcfg.n_head
    res_flops = 2 * t * (dd * dd + 3 * dd * dd)        # k1 + k3 convs
    attn_flops = 2 * t * (dd * 3 * dd + dd * dd) + 4 * t * t * dd
    n_attn = dcfg.n_main_layers + dcfg.n_integrator_layers
    n_res = n_attn + dcfg.n_tail_resblocks
    eval_flops = 2 * (n_res * res_flops + n_attn * attn_flops)  # CFG batch 2
    diff_s = result.timings["diffusion_s"] / dcfg.n_sample_timesteps
    peak = BF16_FLOPS if use_bf16 else F32_FLOPS
    return {
        "ar_ms_per_step": None if ar_ms is None else round(ar_ms, 3),
        "ar_hbm_roofline_pct": None if ar_ms is None else round(
            100 * ar_floor_ms / max(ar_ms, 1e-9), 1),
        "diffusion_ms_per_cfg_step": round(diff_s * 1e3, 2),
        "diffusion_mfu_pct": round(
            100 * eval_flops / max(diff_s, 1e-9) / peak, 1),
    }


if __name__ == "__main__":
    sys.exit(main())
