"""io/plane_cache: quantized host trees round-trip through disk and feed
the same pipeline entry points without re-quantization (the warm-restart
path bench.py's second-process probe exercises)."""

import numpy as np

import jax.numpy as jnp

from tortoise_tpu.config import tiny_ar_config, tiny_diffusion_config
from tortoise_tpu.io import plane_cache
from tortoise_tpu.io.checkpoint import (
    random_ar_params,
    random_diffusion_params,
)
from tortoise_tpu.pipeline.ar_stage import (
    cast_matmul_weights,
    quantize_ar_host,
)
from tortoise_tpu.pipeline.diffusion_stage import quantize_diffusion_weights


def _assert_tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert sorted(a) == sorted(b), path
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (tuple, list)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_tree_equal(x, y, f"{path}#{i}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)


def test_roundtrip_and_idempotent_casts(tmp_path):
    acfg = tiny_ar_config()
    dcfg = tiny_diffusion_config()
    ar_q = quantize_ar_host(random_ar_params(acfg, seed=0, fast=True))
    diff_q = quantize_diffusion_weights(
        random_diffusion_params(dcfg, seed=1, fast=True))

    path = str(tmp_path / "plane")
    plane_cache.save_plane({"ar": ar_q, "diffusion": diff_q}, path)
    assert plane_cache.plane_exists(path)
    loaded = plane_cache.load_plane(path)
    _assert_tree_equal(loaded["ar"], ar_q)
    _assert_tree_equal(loaded["diffusion"], diff_q)

    # int8 pairs come back as tuples so the plane checks keep working
    assert isinstance(loaded["ar"]["blocks"]["attn_w"], tuple)

    # idempotency: the loaded quantized trees pass through the pipeline
    # casts byte-identically (no double quantization)
    recast = cast_matmul_weights(loaded["ar"], jnp.bfloat16, int8=True)
    wq0, sc0 = ar_q["blocks"]["attn_w"]
    wq1, sc1 = recast["blocks"]["attn_w"]
    np.testing.assert_array_equal(np.asarray(wq1), np.asarray(wq0))
    np.testing.assert_array_equal(np.asarray(sc1), np.asarray(sc0))
    rediff = quantize_diffusion_weights(loaded["diffusion"])
    _assert_tree_equal(rediff["integrating_w"], diff_q["integrating_w"])


def test_missing_plane_returns_none(tmp_path):
    assert plane_cache.load_plane(str(tmp_path / "nope")) is None
    assert not plane_cache.plane_exists(str(tmp_path / "nope"))


def test_float_cast_rejects_quantized_tree():
    import pytest

    acfg = tiny_ar_config()
    ar_q = quantize_ar_host(random_ar_params(acfg, seed=0, fast=True))
    with pytest.raises(ValueError, match="int8-quantized"):
        cast_matmul_weights(ar_q, jnp.bfloat16, int8=False)


def test_list_nodes_round_trip_as_lists(tmp_path):
    """Structural lists (vocoder stages) must come back as LISTS while
    quantized pairs come back as tuples — a tuple-folded stages node
    breaks jax.tree.map against the list-typed sharding spec trees."""
    import numpy as np

    from tortoise_tpu.io import plane_cache

    tree = {
        "stages": [{"w": np.ones((2, 2), np.float32)},
                   {"w": np.zeros((2, 2), np.float32)}],
        "pair": (np.ones((2, 2), np.int8), np.ones((1, 2), np.float32)),
    }
    p = str(tmp_path / "plane")
    plane_cache.save_plane(tree, p)
    got = plane_cache.load_plane(p)
    assert isinstance(got["stages"], list) and len(got["stages"]) == 2
    assert isinstance(got["pair"], tuple)
    np.testing.assert_array_equal(got["stages"][0]["w"],
                                  tree["stages"][0]["w"])
