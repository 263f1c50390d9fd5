"""DDPM schedule arrays and sampler math.

Mirrors the reference's respaced linear schedule exactly
(main.cpp:5369-5612, 5641-5716):

- base: linear betas over 4000 train steps, scale 1000/4000, start 1e-4*s,
  end 0.02*s (get_beta_schedule, main.cpp:5390-5400).
- respacing: the hardcoded 80-entry timestep_map (main.cpp:5641-5648) —
  equivalently `round(i * 3999 / 79)`; betas_respaced[i] =
  1 - acp[map[i]]/acp[map[i-1]].
- derived arrays in float64, exactly as the reference computes them.
- the learned-variance interpolation REVERSES upstream's min/max logs: the
  reference passes (min_log, max_log) into parameters named
  (max_log, min_log) (call at main.cpp:5996-5998 into main.cpp:5524-5534),
  computing frac*min_log + (1-frac)*max_log. We reproduce that behavior
  (it is what produced the published fixtures); `variance_swap=False`
  restores the upstream formula.
- CFG blend: (1+k)*cond - k*uncond with k = 2.0 * (1 - t/80)
  (main.cpp:5537-5544, 5988-6004).
- timestep embeddings are sinusoidal of the ORIGINAL (0..3999) timesteps,
  cos-half first (generate_timestep_embedding, main.cpp:5496-5521), queried
  at map[t].
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

def make_timestep_map(n_steps: int, n_train: int = 4000):
    """Evenly respaced original-timestep ids; at n_steps=80 this reproduces
    the table hardcoded at main.cpp:5641-5648."""
    if n_steps < 2:
        raise ValueError("need at least 2 sampling steps")
    return tuple(
        int(round(i * (n_train - 1) / (n_steps - 1))) for i in range(n_steps)
    )


TIMESTEP_MAP_80 = make_timestep_map(80)


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Respaced schedule arrays, indexed by respaced step t (0 = clean)."""

    timestep_map: np.ndarray          # (S,) original timesteps
    betas: np.ndarray                 # (S,)
    alphas_cumprod: np.ndarray        # (S,)
    alphas_cumprod_prev: np.ndarray   # (S,)
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray

    @property
    def num_steps(self) -> int:
        return len(self.betas)


def linear_betas(n: int = 4000) -> np.ndarray:
    scale = 1000.0 / n
    start, end = scale * 0.0001, scale * 0.02
    # the reference computes i * (float)(end-start) / (n-1) with the
    # multiply AND divide in float32 (ints promote to float), then adds the
    # double start (main.cpp:5394-5399)
    frac = (np.arange(n, dtype=np.float32) * np.float32(end - start)
            / np.float32(n - 1)).astype(np.float64)
    return start + frac


def make_schedule(n_train: int = 4000, timestep_map=None,
                  n_steps: int = 80) -> Schedule:
    if timestep_map is None:
        timestep_map = (TIMESTEP_MAP_80 if n_steps == 80
                        else make_timestep_map(n_steps, n_train))
    tmap = np.asarray(timestep_map, np.int64)
    if tmap.size < 2:
        # the guard in make_timestep_map must also cover caller-supplied
        # maps: post_logvar below indexes post_var[1]
        raise ValueError("need at least 2 sampling timesteps, got "
                         f"{tmap.size}")
    acp_full = np.cumprod(1.0 - linear_betas(n_train))
    acp_at = acp_full[tmap]
    # the reference's respacing accumulator is a FLOAT
    # (`float last_alpha_cumulative_product = 1.0`, main.cpp:5654,
    # 5662-5666): each respaced beta divides the double cumprod by the
    # f32-rounded previous one (caught by tests/test_ddpm_oracle.py —
    # ~9e-6 relative without the cast)
    prev_full = np.concatenate(
        [[1.0], acp_at[:-1].astype(np.float32).astype(np.float64)])
    betas = 1.0 - acp_at / prev_full
    acp = np.cumprod(1.0 - betas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
    post_logvar = np.log(
        np.concatenate([[post_var[1]], post_var[1:]])
    )
    return Schedule(
        timestep_map=tmap,
        betas=betas,
        alphas_cumprod=acp,
        alphas_cumprod_prev=acp_prev,
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / acp),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / acp - 1.0),
        posterior_variance=post_var,
        posterior_log_variance_clipped=post_logvar,
        posterior_mean_coef1=betas * np.sqrt(acp_prev) / (1.0 - acp),
        posterior_mean_coef2=(1.0 - acp_prev) * np.sqrt(1.0 - betas)
        / (1.0 - acp),
    )


def timestep_embedding(timesteps, dim: int = 1024,
                       max_period: int = 10000):
    """Sinusoidal embedding, cos half first (main.cpp:5496-5521).
    timesteps: (...,) -> (..., dim)."""
    half = dim // 2
    # the reference computes each frequency in DOUBLE and rounds once on
    # the float assignment (`float freq = exp(-log(max_period) * i /
    # half)`, main.cpp:5506); an all-f32 chain drifts the large
    # arguments, and cos amplifies that by |t| (caught by
    # tests/test_ddpm_oracle.py at t=3999: ~1e-4)
    freqs = jnp.asarray(
        np.exp(-np.log(float(max_period))
               * np.arange(half, dtype=np.float64) / half),
        jnp.float32)
    args = jnp.asarray(timesteps, jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


def cond_free_k(t, num_steps: int, base: float = 2.0):
    """k = base * (1 - t/num_steps) with t the respaced step
    (main.cpp:5537-5544)."""
    return base * (1.0 - jnp.asarray(t, jnp.float32) / num_steps)


def model_log_variance(var_frac_raw, t, sched_betas_log, sched_post_logvar,
                       variance_swap: bool = True):
    """Interpolate the learned variance channel. var_frac_raw: raw model
    output in [-1, 1]. Returns log variance.

    variance_swap=True reproduces the reference's swapped argument order
    (frac*min_log + (1-frac)*max_log); False is the upstream formula."""
    frac = (var_frac_raw + 1.0) / 2.0
    max_log = sched_betas_log[t]
    min_log = sched_post_logvar[t]
    if variance_swap:
        return frac * min_log + (1.0 - frac) * max_log
    return frac * max_log + (1.0 - frac) * min_log


def predict_xstart_from_eps(x, eps, sqrt_recip_acp_t, sqrt_recipm1_acp_t):
    """x0 = sr*x - srm1*eps, clamped to [-1, 1] (main.cpp:5547-5572)."""
    x0 = sqrt_recip_acp_t * x - sqrt_recipm1_acp_t * eps
    return jnp.clip(x0, -1.0, 1.0)


def q_posterior_mean(x, x0, coef1_t, coef2_t):
    return coef1_t * x0 + coef2_t * x
