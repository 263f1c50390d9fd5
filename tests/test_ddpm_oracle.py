"""Live g++ oracle for the DDPM math: compile the REFERENCE'S OWN
schedule/posterior functions (sliced from /root/reference/main.cpp at
test time — std-only: get_beta_schedule + respacing, the derived
schedule vectors, sinusoidal timestep embeddings, the swapped-argument
learned-variance interpolation, CFG blend, x0 prediction + clamp,
posterior mean, ancestral sample, main.cpp:5369-5612 and the setup block
at 5640-5716) and compare against pipeline/schedule.py +
pipeline/diffusion_stage.posterior_step.

The oracle mirrors the loop body of diffusion() (main.cpp:5966-6031)
verbatim, including the swapped (min_log, max_log) call into
calculate_model_variance — so variance_swap=True is pinned against the
real binary, not our own reading of it. Noise comes from the sliced
sample_normal_noise consuming the real mt19937; the Python side mirrors
the stream with rng.ReferenceRng. Nothing here is committed reference
code: the harness is generated into the pytest tmp dir each run."""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF_MAIN = "/root/reference/main.cpp"

HARNESS_TMPL = r"""
#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <numeric>
#include <random>
#include <stdexcept>
#include <vector>

std::mt19937 generator(0);
std::uniform_real_distribution<float> distribution(0.0, 1.0);
std::normal_distribution<double> normal_distribution(0.0, 1.0);

%(noise_fn)s

%(sliced)s

static void write_doubles(const std::vector<double> &v) {
  fwrite(v.data(), sizeof(double), v.size(), stdout);
}

int main(int argc, char **argv) {
  // the schedule setup block sliced from diffusion() (main.cpp:5640-5716)
%(setup)s

  std::string mode = argv[1];
  if (mode == "schedule") {
    write_doubles(beta_schedule);
    write_doubles(alpha_cumulative_products);
    write_doubles(alpha_cumulative_products_prev);
    write_doubles(sqrt_reciprocal_alphas_cumprod);
    write_doubles(sqrt_reciprocal_minus_one_alphas_cumprod);
    write_doubles(posterior_variance);
    write_doubles(posterior_log_variance_clipped);
    write_doubles(posterior_mean_coef1);
    write_doubles(posterior_mean_coef2);
    return 0;
  }
  if (mode == "embed") {
    int t = atoi(argv[2]);
    std::vector<float> e =
        generate_timestep_embedding(std::vector<int>{t}, 1024, 10000);
    fwrite(e.data(), sizeof(float), e.size(), stdout);
    return 0;
  }
  if (mode == "step") {
    // argv: step t n seed; stdin: x, cond_means, model_vars, uncond_means
    // (each n f32); stdout: x_next (n f32)
    int t = atoi(argv[2]);
    int n = atoi(argv[3]);
    generator.seed((unsigned)strtoul(argv[4], nullptr, 10));
    int diffusion_index = 79 - t;
    std::vector<float> x(n), model_output_means(n), model_output_vars(n),
        model_output_no_conditioning_means(n);
    if (fread(x.data(), 4, n, stdin) != (size_t)n) return 2;
    if (fread(model_output_means.data(), 4, n, stdin) != (size_t)n) return 2;
    if (fread(model_output_vars.data(), 4, n, stdin) != (size_t)n) return 2;
    if (fread(model_output_no_conditioning_means.data(), 4, n, stdin) !=
        (size_t)n)
      return 2;
    // loop body, mirrored from main.cpp:5988-6031 (including the swapped
    // min/max argument order into calculate_model_variance)
    float max_log = log(beta_schedule[79 - diffusion_index]);
    float min_log = posterior_log_variance_clipped[79 - diffusion_index];
    float conditioning_free_k =
        base_conditioning_free_k *
        (1 - (float)(79 - diffusion_index) / float(diffusion_timesteps));
    std::vector<float> model_log_variance;
    calculate_model_variance(model_output_vars, model_log_variance, min_log,
                             max_log);
    blend_output_with_unconditioned_output(
        model_output_means, model_output_no_conditioning_means,
        conditioning_free_k);
    std::vector<float> x_start_pred = predict_xstart_from_eps(
        sqrt_reciprocal_alphas_cumprod[79 - diffusion_index],
        sqrt_reciprocal_minus_one_alphas_cumprod[79 - diffusion_index], x,
        model_output_means);
    std::vector<float> final_model_mean = q_posterior_mean(
        posterior_mean_coef1[79 - diffusion_index],
        posterior_mean_coef2[79 - diffusion_index], x, x_start_pred);
    std::vector<float> sample_noise = sample_normal_noise(n);
    std::vector<float> model_sample;
    if (79 - diffusion_index != 0) {
      model_sample =
          sample_function(final_model_mean, model_log_variance, sample_noise);
    } else {
      model_sample = final_model_mean;
    }
    fwrite(model_sample.data(), 4, n, stdout);
    return 0;
  }
  return 3;
}
"""


def _slice(src: str, start: str, end: str) -> str:
    i = src.index(start)
    j = src.index(end, i)
    return src[i:j]


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    if not os.path.exists(REF_MAIN):
        pytest.skip("reference source not available")
    src = open(REF_MAIN, encoding="utf-8", errors="replace").read()
    try:
        sliced = _slice(src, "std::vector<double>\nget_alphas_cumulative_product",
                        "std::vector<float> diffusion(")
        noise_fn = _slice(src, "std::vector<float> sample_normal_noise",
                          "int multinomial(")
        setup = _slice(src, "  std::vector<int> timestep_map = {",
                       "  // ggml_backend_t temp_backend")
    except ValueError:
        pytest.skip("reference schedule markers moved; update the slicer")
    tmp = tmp_path_factory.mktemp("ddpm_oracle")
    cpp = tmp / "harness.cpp"
    cpp.write_text(HARNESS_TMPL % {"sliced": sliced, "setup": setup,
                                   "noise_fn": noise_fn})
    exe = tmp / "harness"
    r = subprocess.run(["g++", "-O2", "-std=c++17", str(cpp), "-o", str(exe)],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[-800:]}")
    return str(exe)


def _run(exe, *args, stdin=b""):
    r = subprocess.run([exe] + [str(a) for a in args], input=stdin,
                       capture_output=True)
    assert r.returncode == 0, r.stderr[-500:]
    return r.stdout


def test_schedule_matches_reference_binary(oracle):
    from tortoise_tpu.pipeline.schedule import make_schedule

    out = np.frombuffer(_run(oracle, "schedule"), "<f8").reshape(9, 80)
    s = make_schedule(4000, n_steps=80)
    for got, name in zip(out, (
            "betas", "alphas_cumprod", "alphas_cumprod_prev",
            "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
            "posterior_variance", "posterior_log_variance_clipped",
            "posterior_mean_coef1", "posterior_mean_coef2")):
        np.testing.assert_allclose(getattr(s, name), got, rtol=1e-9,
                                   atol=1e-12, err_msg=name)


def test_timestep_embedding_matches_reference_binary(oracle):
    from tortoise_tpu.pipeline.schedule import timestep_embedding

    for t in (0, 51, 1215, 3999):
        want = np.frombuffer(_run(oracle, "embed", t), "<f4")
        got = np.asarray(timestep_embedding(np.asarray([t]))).ravel()
        # C float transcendentals vs f32 numpy/XLA: allow last-ulp slack
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_posterior_step_matches_reference_binary(oracle):
    """Full posterior updates at early / mid / late / final step against
    the reference loop body, with the mt19937 noise stream mirrored on
    the Python side."""
    import jax.numpy as jnp

    from tortoise_tpu.config import DiffusionConfig
    from tortoise_tpu.pipeline.diffusion_stage import (
        _schedule_arrays,
        posterior_step,
    )
    from tortoise_tpu.rng import ReferenceRng

    cfg = DiffusionConfig()
    sched = _schedule_arrays(cfg)
    rng_np = np.random.default_rng(5)
    n_mel, tlen = cfg.n_mel, 4
    n = n_mel * tlen
    for t, seed in ((79, 11), (40, 12), (1, 13), (0, 14)):
        x = rng_np.normal(0, 1, n).astype(np.float32)
        cm = rng_np.normal(0, 0.3, n).astype(np.float32)
        cv = rng_np.normal(0, 0.3, n).astype(np.float32)
        um = rng_np.normal(0, 0.3, n).astype(np.float32)
        blob = b"".join(a.tobytes() for a in (x, cm, cv, um))
        want = np.frombuffer(_run(oracle, "step", t, n, seed, stdin=blob),
                             "<f4")
        noise = ReferenceRng(seed).normal_f32(n)
        got = posterior_step(
            sched, cfg,
            jnp.asarray(x.reshape(1, n_mel, tlen)),
            jnp.asarray(cm.reshape(1, n_mel, tlen)),
            jnp.asarray(um.reshape(1, n_mel, tlen)),
            jnp.asarray(cv.reshape(1, n_mel, tlen)),
            jnp.int32(t),
            jnp.asarray(noise.reshape(1, n_mel, tlen)),
        )
        np.testing.assert_allclose(
            np.asarray(got).ravel(), want, rtol=2e-5, atol=2e-6,
            err_msg=f"t={t}")
