"""DDPM schedule math tests against the reference's formulas
(main.cpp:5369-5612, 5641-5716)."""

import numpy as np

import jax.numpy as jnp

from tortoise_tpu.config import DiffusionConfig
from tortoise_tpu.ops.relpos import relative_position_buckets
from tortoise_tpu.pipeline import schedule as ds


# the table hardcoded at main.cpp:5641-5648
REFERENCE_TIMESTEP_MAP = [
    0, 51, 101, 152, 202, 253, 304, 354, 405, 456, 506, 557,
    607, 658, 709, 759, 810, 861, 911, 962, 1012, 1063, 1114, 1164,
    1215, 1266, 1316, 1367, 1417, 1468, 1519, 1569, 1620, 1670, 1721, 1772,
    1822, 1873, 1924, 1974, 2025, 2075, 2126, 2177, 2227, 2278, 2329, 2379,
    2430, 2480, 2531, 2582, 2632, 2683, 2733, 2784, 2835, 2885, 2936, 2987,
    3037, 3088, 3138, 3189, 3240, 3290, 3341, 3392, 3442, 3493, 3543, 3594,
    3645, 3695, 3746, 3797, 3847, 3898, 3948, 3999,
]


def test_timestep_map_matches_reference_table():
    assert list(ds.TIMESTEP_MAP_80) == REFERENCE_TIMESTEP_MAP


def test_linear_betas_endpoints():
    b = ds.linear_betas(4000)
    # scale = 1000/4000 = 0.25
    np.testing.assert_allclose(b[0], 0.25 * 1e-4, rtol=1e-6)
    np.testing.assert_allclose(b[-1], 0.25 * 0.02, rtol=1e-6)
    assert len(b) == 4000


def test_schedule_against_straightforward_recompute():
    """Recompute every derived array with independent formulas."""
    s = ds.make_schedule()
    betas_full = np.linspace(0.25e-4, 0.25 * 0.02, 4000)
    acp_full = np.cumprod(1 - betas_full)
    # respaced betas
    prev = 1.0
    betas = []
    for t in REFERENCE_TIMESTEP_MAP:
        betas.append(1 - acp_full[t] / prev)
        prev = acp_full[t]
    betas = np.array(betas)
    np.testing.assert_allclose(s.betas, betas, rtol=1e-5)
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(s.alphas_cumprod, acp, rtol=1e-5)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    np.testing.assert_allclose(
        s.posterior_variance, betas * (1 - acp_prev) / (1 - acp), rtol=1e-5
    )
    # element 0 of clipped log variance uses element 1's variance
    np.testing.assert_allclose(
        s.posterior_log_variance_clipped[0],
        np.log(s.posterior_variance[1]),
    )
    np.testing.assert_allclose(
        s.posterior_mean_coef1, betas * np.sqrt(acp_prev) / (1 - acp),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        s.posterior_mean_coef2,
        (1 - acp_prev) * np.sqrt(1 - betas) / (1 - acp), rtol=1e-5,
    )


def test_timestep_embedding_structure():
    emb = np.asarray(ds.timestep_embedding(np.array([0.0]), 8, 10000))[0]
    # t=0: cos half = 1, sin half = 0 (cos first, main.cpp:5496-5521)
    np.testing.assert_allclose(emb[:4], 1.0)
    np.testing.assert_allclose(emb[4:], 0.0)
    emb2 = np.asarray(ds.timestep_embedding(np.array([7.0]), 6, 100))[0]
    freqs = np.exp(-np.log(100) * np.arange(3) / 3)
    np.testing.assert_allclose(emb2[:3], np.cos(7 * freqs), rtol=1e-5)
    np.testing.assert_allclose(emb2[3:], np.sin(7 * freqs), rtol=1e-5)


def test_cond_free_k():
    # k = 2*(1 - t/80) (main.cpp:5537-5544)
    np.testing.assert_allclose(np.asarray(ds.cond_free_k(79, 80)), 0.025,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ds.cond_free_k(0, 80)), 2.0,
                               rtol=1e-6)


def test_model_log_variance_swap_quirk():
    betas_log = jnp.asarray(np.log([0.1, 0.2]))
    post = jnp.asarray(np.log([0.01, 0.02]))
    v = jnp.asarray(0.5)  # frac = 0.75
    swapped = np.asarray(ds.model_log_variance(v, 1, betas_log, post, True))
    upstream = np.asarray(ds.model_log_variance(v, 1, betas_log, post, False))
    np.testing.assert_allclose(
        swapped, 0.75 * np.log(0.02) + 0.25 * np.log(0.2), rtol=1e-6
    )
    np.testing.assert_allclose(
        upstream, 0.75 * np.log(0.2) + 0.25 * np.log(0.02), rtol=1e-6
    )


def test_predict_xstart_clamps():
    x = jnp.asarray([0.5, -0.5])
    eps = jnp.asarray([-10.0, 10.0])
    x0 = np.asarray(ds.predict_xstart_from_eps(x, eps, 1.0, 1.0))
    np.testing.assert_array_equal(x0, [1.0, -1.0])


def test_relative_position_buckets_match_reference_loop():
    """Direct re-execution of get_relative_position_buckets
    (main.cpp:4722-4749) as the oracle."""
    import math

    def ref(latent_length):
        mask = np.zeros((latent_length, latent_length), np.int64)
        for i in range(latent_length):
            for c in range(latent_length):
                rel = abs(c - i)
                m = 16 if i < c else 0
                if rel < 8:
                    # (the C code still computes val_if_large here, but the
                    # rel < 8 branch discards it, main.cpp:4740-4745)
                    m += rel
                else:
                    val_if_large = 8 + int(
                        math.log(rel / 8) / math.log(64.0 / 8.0) * 8.0
                    )
                    m += min(val_if_large, 15)
                mask[i, c] = m
        return mask

    for n in (1, 2, 7, 9, 65, 130):
        np.testing.assert_array_equal(
            relative_position_buckets(n), ref(n), err_msg=f"length {n}"
        )


def test_make_timestep_map_scales():
    assert list(ds.make_timestep_map(80)) == REFERENCE_TIMESTEP_MAP
    m30 = ds.make_timestep_map(30)
    assert len(m30) == 30 and m30[0] == 0 and m30[-1] == 3999
    s = ds.make_schedule(n_steps=30)
    assert s.num_steps == 30
    import pytest

    with pytest.raises(ValueError):
        ds.make_timestep_map(1)
