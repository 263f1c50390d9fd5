"""Conv wrapper semantics vs torch (CPU) — the orientation ground truth,
since the GGML weights were exported from torch modules."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tortoise_tpu.ops.conv import (  # noqa: E402
    conv1d,
    conv_transpose1d,
    nearest_upscale_time,
    reflect_pad1d,
)


@pytest.mark.parametrize("k,pad,dil", [(1, 0, 1), (3, 1, 1), (3, 3, 3),
                                       (5, 2, 1), (7, 0, 1), (3, 9, 9)])
def test_conv1d_matches_torch(k, pad, dil):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 5, 20)).astype(np.float32)
    w = rng.normal(0, 1, (7, 5, k)).astype(np.float32)
    b = rng.normal(0, 1, (7,)).astype(np.float32)
    want = F.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), padding=pad, dilation=dil).numpy()
    got = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                            padding=pad, dilation=dil))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("k,stride", [(16, 8), (8, 4), (4, 2), (3, 1)])
def test_conv_transpose1d_matches_torch(k, stride):
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (1, 6, 9)).astype(np.float32)
    w = rng.normal(0, 1, (6, 4, k)).astype(np.float32)  # (C_in, C_out, K)
    b = rng.normal(0, 1, (4,)).astype(np.float32)
    want = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(b), stride=stride).numpy()
    got = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b), stride=stride))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_reflect_pad_matches_torch():
    x = np.random.default_rng(2).normal(0, 1, (1, 3, 12)).astype(np.float32)
    want = F.pad(torch.from_numpy(x), (3, 3), mode="reflect").numpy()
    got = np.asarray(reflect_pad1d(jnp.asarray(x), 3))
    np.testing.assert_allclose(got, want)


def test_nearest_upscale_matches_torch_interpolate():
    x = np.random.default_rng(3).normal(0, 1, (1, 4, 7)).astype(np.float32)
    for out_len in (7, 13, 21, 30):
        want = F.interpolate(torch.from_numpy(x), size=out_len,
                             mode="nearest").numpy()
        got = np.asarray(nearest_upscale_time(jnp.asarray(x), out_len))
        np.testing.assert_allclose(got, want)
