"""Sharding tests on the virtual 8-device CPU mesh: dp+tp execution must
reproduce single-device results bit-for-... well, within f32 collective
reassociation tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.config import ARConfig
from tortoise_tpu.io.checkpoint import random_ar_params
from tortoise_tpu.models import ar
from tortoise_tpu.parallel import (
    ar_param_specs,
    batch_spec,
    make_mesh,
    replicated,
    shard_tree,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ARConfig(n_layer=2, cache_len=32, n_text_pos=16)
    params = random_ar_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    b, t = 4, 6
    text_ids = rng.integers(0, cfg.n_text_vocab, (b, t)).astype(np.int32)
    voice = rng.normal(0, 0.5, (cfg.d_model,)).astype(np.float32)
    return cfg, params, text_ids, voice


def test_mesh_factorization():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert set(mesh.axis_names) == {"dp", "tp"}
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8


def test_mesh_explicit_shape():
    mesh = make_mesh(8, shape=(4, 2))
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2


def test_sharded_prefill_matches_single_device(setup):
    cfg, params, text_ids, voice = setup
    b, t = text_ids.shape

    ref_logits, ref_cache = ar.prefill(
        params, cfg, jnp.asarray(text_ids), jnp.ones((b, t), bool),
        jnp.asarray(voice))

    mesh = make_mesh(8, shape=(4, 2))
    sp = shard_tree(params, ar_param_specs(mesh))
    tx = jax.device_put(text_ids, batch_spec(mesh, 2))
    tv = jax.device_put(np.ones((b, t), bool), batch_spec(mesh, 2))
    vc = jax.device_put(voice, replicated(mesh))

    @jax.jit
    def fn(p, x, v, w):
        return ar.prefill(p, cfg, x, v, w)

    with mesh:
        logits, cache = fn(sp, tx, tv, vc)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4)

    # decode step under the mesh matches too
    tok = np.full((b,), 7, np.int32)

    @jax.jit
    def dfn(p, c, tk):
        return ar.decode_step(p, cfg, c, tk, jnp.int32(0))

    ref_d, _ = ar.decode_step(params, cfg, ref_cache, jnp.asarray(tok),
                              jnp.int32(0))
    with mesh:
        d, _ = dfn(sp, cache, jax.device_put(tok, batch_spec(mesh, 1)))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=2e-4)


def test_graft_entry_hooks():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[-1] == 8194
    g.dryrun_multichip(8)


def test_sharded_diffusion_batch_matches():
    """diffusion_batch's batch axis shards over dp; results must match the
    single-device run."""
    from tortoise_tpu.config import tiny_diffusion_config
    from tortoise_tpu.io.checkpoint import random_diffusion_params
    from tortoise_tpu.models import diffusion as dm
    from tortoise_tpu.ops.relpos import relative_position_buckets

    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=1)
    rng = np.random.default_rng(0)
    b, t = 4, 16
    x = rng.normal(0, 1, (b, cfg.n_mel, t)).astype(np.float32)
    code = rng.normal(0, 0.5, (b, cfg.d_model, t)).astype(np.float32)
    buckets = jnp.asarray(relative_position_buckets(
        t, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))

    ref = np.asarray(dm.denoise(params, cfg, jnp.asarray(x),
                                jnp.asarray(code), jnp.int32(100), buckets))

    mesh = make_mesh(8, shape=(4, 2))

    @jax.jit
    def fn(p, x, c):
        return dm.denoise(p, cfg, x, c, jnp.int32(100), buckets)

    with mesh:
        sp = jax.tree.map(
            lambda a: jax.device_put(a, replicated(mesh)), params)
        out = fn(sp, jax.device_put(x, batch_spec(mesh, 3)),
                 jax.device_put(code, batch_spec(mesh, 3)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_synthesize_batch_under_mesh():
    """The public batch API shards its batch over dp when given a mesh and
    matches the unsharded result."""
    from tortoise_tpu.pipeline.synthesize import TortoiseModels, \
        synthesize_batch

    models = TortoiseModels.random(seed=0, tiny=True)
    rng = np.random.default_rng(3)
    tokens_list = [
        rng.integers(1, models.ar_cfg.n_text_vocab, 5 + i).tolist()
        for i in range(4)
    ]
    voices = rng.normal(0, 0.5, (4, models.ar_cfg.d_model)).astype(np.float32)
    plain = synthesize_batch(models, tokens_list=tokens_list, voices=voices,
                             seed=7)
    mesh = make_mesh(8, shape=(4, 2))
    sharded = synthesize_batch(models, tokens_list=tokens_list,
                               voices=voices, seed=7, mesh=mesh)
    for a, b in zip(plain, sharded):
        assert a.sequences == b.sequences
        np.testing.assert_allclose(a.audio, b.audio, atol=1e-4)


def test_place_batch_warns_on_replicated_fallback():
    from tortoise_tpu.parallel import place_batch

    mesh = make_mesh(8, shape=(4, 2))
    arr = np.zeros((6, 3), np.float32)  # 6 % dp(4) != 0
    with pytest.warns(UserWarning, match="REPLICATED"):
        out = place_batch(arr, mesh)
    assert out.sharding.is_fully_replicated

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # divisible batch: no warning
        out = place_batch(np.zeros((8, 3), np.float32), mesh)
    assert not out.sharding.is_fully_replicated


def test_make_mesh_insufficient_devices_message():
    with pytest.raises(ValueError, match="need 64 devices"):
        make_mesh(64)


def test_tp_sharded_diffusion_denoise_matches():
    """Megatron-style tp over the denoiser's attention heads / resblock
    channels (diffusion_param_specs) must reproduce the replicated run."""
    from tortoise_tpu.config import tiny_diffusion_config
    from tortoise_tpu.io.checkpoint import random_diffusion_params
    from tortoise_tpu.models import diffusion as dm
    from tortoise_tpu.ops.relpos import relative_position_buckets
    from tortoise_tpu.parallel import diffusion_param_specs

    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=2)
    rng = np.random.default_rng(5)
    b, t = 4, 16
    x = rng.normal(0, 1, (b, cfg.n_mel, t)).astype(np.float32)
    code = rng.normal(0, 0.5, (b, cfg.d_model, t)).astype(np.float32)
    buckets = jnp.asarray(relative_position_buckets(
        t, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))

    ref = np.asarray(dm.denoise(params, cfg, jnp.asarray(x),
                                jnp.asarray(code), jnp.int32(100), buckets))

    mesh = make_mesh(8, shape=(4, 2))
    sp = shard_tree(params, diffusion_param_specs(mesh))
    # the heavy per-layer weights must actually be distributed, not
    # replicated
    assert not sp["layers"]["attn_qkv_w"].sharding.is_fully_replicated
    assert not sp["layers"]["res_in_conv_w"].sharding.is_fully_replicated

    @jax.jit
    def fn(p, x, c):
        return dm.denoise(p, cfg, x, c, jnp.int32(100), buckets)

    with mesh:
        out = fn(sp, jax.device_put(x, batch_spec(mesh, 3)),
                 jax.device_put(code, batch_spec(mesh, 3)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_tp_sharded_latent_conditioner_matches():
    from tortoise_tpu.config import tiny_diffusion_config
    from tortoise_tpu.io.checkpoint import random_diffusion_params
    from tortoise_tpu.models import diffusion as dm
    from tortoise_tpu.ops.relpos import relative_position_buckets
    from tortoise_tpu.parallel import diffusion_param_specs

    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=3)
    rng = np.random.default_rng(6)
    b, l = 4, 8
    lat = rng.normal(0, 0.5, (b, l, cfg.d_model)).astype(np.float32)
    buckets = jnp.asarray(relative_position_buckets(
        l, cfg.rel_pos_buckets, cfg.rel_pos_max_distance))

    ref = np.asarray(dm.latent_conditioner(params, cfg, jnp.asarray(lat),
                                           buckets))
    mesh = make_mesh(8, shape=(4, 2))
    sp = shard_tree(params, diffusion_param_specs(mesh))

    @jax.jit
    def fn(p, lat):
        return dm.latent_conditioner(p, cfg, lat, buckets)

    with mesh:
        out = fn(sp, jax.device_put(lat, batch_spec(mesh, 3)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_tp_sharded_vocoder_matches():
    from tortoise_tpu.config import tiny_vocoder_config
    from tortoise_tpu.io.checkpoint import random_vocoder_params
    from tortoise_tpu.models import vocoder as vm
    from tortoise_tpu.parallel import vocoder_param_specs

    cfg = tiny_vocoder_config()
    params = random_vocoder_params(cfg, seed=4)
    rng = np.random.default_rng(7)
    b, m = 4, 12
    mel = rng.normal(0, 1, (b, cfg.n_mel, m)).astype(np.float32)
    noise = rng.normal(0, 1, (b, cfg.noise_ch, m)).astype(np.float32)

    ref = np.asarray(vm.vocoder_forward(params, cfg, jnp.asarray(mel),
                                        jnp.asarray(noise)))
    mesh = make_mesh(8, shape=(4, 2))
    sp = shard_tree(params, vocoder_param_specs(mesh,
                                                n_stages=len(cfg.strides)))
    assert not sp["stages"][0]["kp_kernel_w"].sharding.is_fully_replicated

    @jax.jit
    def fn(p, mel, noise):
        return vm.vocoder_forward(p, cfg, mel, noise)

    with mesh:
        out = fn(sp, jax.device_put(mel, batch_spec(mesh, 3)),
                 jax.device_put(noise, batch_spec(mesh, 3)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_fused_decode_dp_sharded_token_parity(monkeypatch):
    """A pure-dp mesh keeps the fused one-dispatch decode plane: the
    shard_map wrapper (_generate_dp_jit) splits batch rows over "dp",
    replicates the int8 weights, and must sample EXACTLY the tokens the
    single-device fused plane samples (each shard replays the global
    uniform stream and slices its rows; the stop rule is psum'd)."""
    import dataclasses

    from tortoise_tpu.config import tiny_ar_config
    from tortoise_tpu.pipeline import ar_stage

    cfg = dataclasses.replace(tiny_ar_config(), fused_decode=True)
    params = random_ar_params(cfg, seed=3)
    rng = np.random.default_rng(2)
    b = 8
    tokens_list = [list(rng.integers(0, cfg.n_text_vocab, (6,)))
                   for _ in range(b)]
    voices = rng.normal(0, .5, (b, cfg.d_model)).astype(np.float32)

    ref_lat, ref_seqs = ar_stage.autoregressive_batch(
        params, tokens_list, voices, cfg, seed=11,
        compute_dtype=jnp.bfloat16, int8_weights=True)

    calls = []
    orig = ar_stage._generate_dp_jit

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(ar_stage, "_generate_dp_jit", spy)
    mesh = make_mesh(8, shape=(8, 1))
    lat, seqs = ar_stage.autoregressive_batch(
        params, tokens_list, voices, cfg, seed=11,
        compute_dtype=jnp.bfloat16, int8_weights=True, mesh=mesh)

    assert calls, "pure-dp mesh must take the fused shard_map plane"
    assert seqs == ref_seqs
    for a, r in zip(lat, ref_lat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-2, rtol=2e-2)


def test_fused_decode_dp_gates(monkeypatch):
    """tp>1 or a batch the dp axis can't split must fall back to the XLA
    plane (fused_decode stripped), never the shard_map wrapper."""
    import dataclasses

    from tortoise_tpu.config import tiny_ar_config
    from tortoise_tpu.pipeline import ar_stage

    cfg = dataclasses.replace(tiny_ar_config(), fused_decode=True)
    params = random_ar_params(cfg, seed=3)
    rng = np.random.default_rng(4)
    voices = rng.normal(0, .5, (4, cfg.d_model)).astype(np.float32)
    tokens_list = [list(rng.integers(0, cfg.n_text_vocab, (5,)))
                   for _ in range(4)]

    def boom(*a, **k):
        raise AssertionError("shard_map plane must not engage")

    monkeypatch.setattr(ar_stage, "_generate_dp_jit", boom)
    # tp=2: Megatron plane, pallas off
    mesh = make_mesh(8, shape=(4, 2))
    ar_stage.autoregressive_batch(
        params, tokens_list, voices, cfg, seed=1,
        compute_dtype=jnp.bfloat16, int8_weights=True, mesh=mesh)
    # pure dp but 3 rows over 8 devices: falls back
    mesh = make_mesh(8, shape=(8, 1))
    ar_stage.autoregressive_batch(
        params, tokens_list[:3], voices[:3], cfg, seed=1,
        compute_dtype=jnp.bfloat16, int8_weights=True, mesh=mesh)


def test_diffusion_dp_sharded_bit_identical():
    """The pure-dp shard_map diffusion plane must produce EXACTLY the
    single-device mel: rows are independent and the global-draw-slice
    noise discipline replays the same stream per row."""
    from tortoise_tpu.config import tiny_diffusion_config
    from tortoise_tpu.io.checkpoint import random_diffusion_params
    from tortoise_tpu.pipeline import diffusion_stage as dst

    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=1)
    rng = np.random.default_rng(0)
    lats = [rng.normal(0, 0.5, (10 + i % 3, cfg.d_model)).astype(np.float32)
            for i in range(8)]

    ref = dst.diffusion_batch(params, lats, cfg, seed=5)
    mesh = make_mesh(8, shape=(8, 1))
    got = dst.diffusion_batch(params, lats, cfg, seed=5, mesh=mesh)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_diffusion_tp_mesh_still_runs():
    """tp>1 (or non-dividing batch) falls back to the partitionable XLA
    plane — no shard_map, no error."""
    from tortoise_tpu.config import tiny_diffusion_config
    from tortoise_tpu.io.checkpoint import random_diffusion_params
    from tortoise_tpu.pipeline import diffusion_stage as dst

    cfg = tiny_diffusion_config()
    params = random_diffusion_params(cfg, seed=1)
    rng = np.random.default_rng(2)
    lats = [rng.normal(0, 0.5, (9, cfg.d_model)).astype(np.float32)
            for _ in range(4)]
    mesh = make_mesh(8, shape=(4, 2))
    out = dst.diffusion_batch(params, lats, cfg, seed=5, mesh=mesh)
    assert all(np.isfinite(np.asarray(m)).all() for m in out)
