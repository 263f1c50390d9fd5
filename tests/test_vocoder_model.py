"""Vocoder tests against an independent float64 numpy oracle written from
the reference graph semantics (main.cpp:4068-4483)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.config import VocoderConfig, tiny_vocoder_config
from tortoise_tpu.io.checkpoint import random_vocoder_params
from tortoise_tpu.models import vocoder as vm
from tortoise_tpu.pipeline import vocoder_stage


def np_leaky(x, slope=0.2):
    return np.where(x >= 0, x, slope * x)


def np_conv1d(x, w, b, pad=0, dilation=1):
    c_in, t = x.shape
    c_out, _, k = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad)))
    span = (k - 1) * dilation + 1
    t_out = xp.shape[1] - span + 1
    out = np.zeros((c_out, t_out))
    for j in range(k):
        out += np.einsum("oi,it->ot", w[:, :, j],
                         xp[:, j * dilation : j * dilation + t_out])
    return out + b[:, None]


def np_conv_transpose1d(x, w, b, stride):
    """torch ConvTranspose1d semantics: w (C_in, C_out, K),
    out[o, s*stride + k] += x[i, s] * w[i, o, k]."""
    c_in, t = x.shape
    _, c_out, k = w.shape
    out = np.zeros((c_out, (t - 1) * stride + k))
    for s in range(t):
        for kk in range(k):
            out[:, s * stride + kk] += w[:, :, kk].T @ x[:, s]
    return out + b[:, None]


def np_lvc(x, kernel, bias, hop):
    """out[o, l*hop+s] = sum_{i,k} x_pad[i, l*hop+s+k]*kernel[i,o,k,l]
    + bias[o,l] (main.cpp:4378-4428)."""
    c_in, t = x.shape
    _, c_out, k, l = kernel.shape
    xp = np.pad(x, ((0, 0), (1, 1)))
    out = np.zeros((c_out, t))
    for tt in range(t):
        ll = tt // hop
        for kk in range(k):
            out[:, tt] += kernel[:, :, kk, ll].T @ xp[:, tt + kk]
        out[:, tt] += bias[:, ll]
    return out


def np_vocoder(params, cfg, mel, noise):
    """Full oracle pass; mel/noise (C, M)."""
    x = np.pad(noise, ((0, 0), (3, 3)), mode="reflect")
    x = np_conv1d(x, params["pre_w"], params["pre_b"])
    for i, stride in enumerate(cfg.strides):
        st = params["stages"][i]
        x = np_leaky(x)
        x = np_conv_transpose1d(x, st["convt_w"], st["convt_b"], stride)
        trim = cfg.trim_paddings[i]
        x = x[:, trim : x.shape[1] - trim]
        # kernel predictor
        c = np_conv1d(mel, st["kp_in_w"], st["kp_in_b"], pad=2)
        c = np_leaky(c)
        for r in range(3):
            y = np_conv1d(c, st["kp_res"]["w1"][r], st["kp_res"]["b1"][r],
                          pad=1)
            y = np_leaky(y)
            y = np_conv1d(y, st["kp_res"]["w3"][r], st["kp_res"]["b3"][r],
                          pad=1)
            y = np_leaky(y)
            c = c + y
        kernels = np_conv1d(c, st["kp_kernel_w"], st["kp_kernel_b"], pad=1)
        biases = np_conv1d(c, st["kp_bias_w"], st["kp_bias_b"], pad=1)
        l = mel.shape[1]
        nblk = len(cfg.dilations)
        kernels = kernels.reshape(nblk, cfg.ch, cfg.lvc_out_ch,
                                  cfg.lvc_kernel, l)
        biases = biases.reshape(nblk, cfg.lvc_out_ch, l)
        for cidx, dil in enumerate(cfg.dilations):
            y = np_leaky(x)
            y = np_conv1d(y, st["cb_w"][cidx], st["cb_b"][cidx], pad=dil,
                          dilation=dil)
            y = np_leaky(y)
            y = np_lvc(y, kernels[cidx], biases[cidx], cfg.hop_sizes[i])
            gate = 1 / (1 + np.exp(-y[: cfg.ch]))
            filt = np.tanh(y[cfg.ch :])
            x = x + gate * filt
    x = np_leaky(x)
    return np_conv1d(x, params["post_w"], params["post_b"])[0]


def as_f64(tree):
    return jax.tree.map(lambda a: np.asarray(a, np.float64), tree)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vocoder_config()
    params = random_vocoder_params(cfg, seed=4)
    rng = np.random.default_rng(0)
    m = 6  # frames incl. the 2 tiny pad frames
    mel = rng.normal(-3, 2, (cfg.n_mel, m)).astype(np.float32)
    noise = rng.normal(0, 1, (cfg.noise_ch, m)).astype(np.float32)
    return cfg, params, mel, noise


def test_vocoder_matches_numpy_oracle(setup):
    cfg, params, mel, noise = setup
    want = np_vocoder(as_f64(params), cfg, mel.astype(np.float64),
                      noise.astype(np.float64))
    got = vm.vocoder_forward(params, cfg, jnp.asarray(mel[None]),
                             jnp.asarray(noise[None]))
    got = np.asarray(got)[0]
    assert got.shape == want.shape == (mel.shape[1] * 4 - 6,)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_vocoder_bucket_invariance(setup):
    cfg, params, mel, noise = setup
    m = mel.shape[1]
    pad = 5
    mel_p = np.zeros((cfg.n_mel, m + pad), np.float32)
    mel_p[:, :m] = mel
    noise_p = np.zeros((cfg.noise_ch, m + pad), np.float32)
    noise_p[:, :m] = noise
    exact = np.asarray(vm.vocoder_forward(
        params, cfg, jnp.asarray(mel[None]), jnp.asarray(noise[None])))[0]
    padded = np.asarray(vm.vocoder_forward(
        params, cfg, jnp.asarray(mel_p[None]), jnp.asarray(noise_p[None]),
        mel_len=jnp.int32(m)))[0]
    n_valid = m * 4 - 6
    np.testing.assert_allclose(padded[:n_valid], exact, atol=1e-4)


def test_lvc_against_loop_oracle():
    cfg = tiny_vocoder_config()
    rng = np.random.default_rng(5)
    c_in, c_out, k, l, hop = 3, 6, 3, 4, 2
    x = rng.normal(0, 1, (c_in, l * hop))
    kernel = rng.normal(0, 1, (c_in, c_out, k, l))
    bias = rng.normal(0, 1, (c_out, l))
    want = np_lvc(x, kernel, bias, hop)
    got = np.asarray(vm.location_variable_conv(
        jnp.asarray(x[None]), jnp.asarray(kernel[None]),
        jnp.asarray(bias[None]), hop))[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vocoder_stage_driver(setup):
    cfg, params, mel, _ = setup
    m_raw = mel.shape[1] - cfg.mel_pad_frames
    norm_mel = np.clip(mel[:, :m_raw] / 10.0, -1, 1)
    audio = vocoder_stage.vocoder(params, norm_mel, cfg, seed=0)
    n = (m_raw + cfg.mel_pad_frames) * cfg.total_upsample - 6
    assert audio.shape == (n,)
    assert np.isfinite(audio).all()
    audio2 = vocoder_stage.vocoder(params, norm_mel, cfg, seed=0)
    np.testing.assert_array_equal(audio, audio2)


def test_denormalize_tacotron_mel():
    from tortoise_tpu.config import TACOTRON_MEL_MAX, TACOTRON_MEL_MIN

    out = vocoder_stage.denormalize_tacotron_mel(np.asarray([-1.0, 1.0, 0.0]))
    np.testing.assert_allclose(
        out, [TACOTRON_MEL_MIN, TACOTRON_MEL_MAX,
              (TACOTRON_MEL_MIN + TACOTRON_MEL_MAX) / 2], rtol=1e-6
    )


def test_reflect_extend():
    x = jnp.asarray(np.arange(10, dtype=np.float32)[None, None, :])
    out = np.asarray(vm.reflect_extend(x, jnp.int32(6), 3))[0, 0]
    # signal 0..5; reflection of the right edge: x[4], x[3], x[2]
    np.testing.assert_array_equal(out[:6], [0, 1, 2, 3, 4, 5])
    np.testing.assert_array_equal(out[6:9], [4, 3, 2])
    np.testing.assert_array_equal(out[9:], [9])


@pytest.mark.parametrize("gap", [0, 1, 2, 3, 5])
def test_vocoder_bucket_invariance_small_gaps(setup, gap):
    """The right-edge noise reflection must come from the true signal edge
    even when the bucket slack is smaller than the reflect width (3)."""
    cfg, params, mel, noise = setup
    m = mel.shape[1]
    mel_p = np.zeros((cfg.n_mel, m + gap), np.float32)
    mel_p[:, :m] = mel
    noise_p = np.zeros((cfg.noise_ch, m + gap), np.float32)
    noise_p[:, :m] = noise
    exact = np.asarray(vm.vocoder_forward(
        params, cfg, jnp.asarray(mel[None]), jnp.asarray(noise[None])))[0]
    padded = np.asarray(vm.vocoder_forward(
        params, cfg, jnp.asarray(mel_p[None]), jnp.asarray(noise_p[None]),
        mel_len=jnp.int32(m)))[0]
    np.testing.assert_allclose(padded[: m * 4 - 6], exact, atol=1e-4,
                               err_msg=f"gap {gap}")


def test_pallas_lvc_matches_xla_path(setup):
    import dataclasses

    cfg, params, mel, noise = setup
    plain = np.asarray(vm.vocoder_forward(
        params, cfg, jnp.asarray(mel[None]), jnp.asarray(noise[None])))
    pcfg = dataclasses.replace(cfg, use_pallas_lvc=True)
    fused = np.asarray(vm.vocoder_forward(
        params, pcfg, jnp.asarray(mel[None]), jnp.asarray(noise[None])))
    np.testing.assert_allclose(fused, plain, atol=1e-4)


def test_pallas_lvc_kernel_against_loop_oracle():
    from tortoise_tpu.ops.pallas.lvc import lvc_gated_residual

    rng = np.random.default_rng(7)
    for c_in, c_res, k, l, hop in [(3, 4, 3, 4, 2), (8, 8, 3, 5, 16),
                                   (4, 4, 3, 2, 128)]:
        x = rng.normal(0, 1, (2, c_in, l * hop)).astype(np.float32)
        kernel = rng.normal(0, 1, (2, c_in, 2 * c_res, k, l)).astype(
            np.float32)
        bias = rng.normal(0, 1, (2, 2 * c_res, l)).astype(np.float32)
        res = rng.normal(0, 1, (2, c_res, l * hop)).astype(np.float32)
        lv = np.stack([np_lvc(x[b], kernel[b], bias[b], hop)
                       for b in range(2)])
        want = res + (1 / (1 + np.exp(-lv[:, :c_res]))) * np.tanh(
            lv[:, c_res:])
        got = np.asarray(lvc_gated_residual(
            jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias),
            jnp.asarray(res), hop, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4,
                                   err_msg=f"hop {hop}")
