import numpy as np
import pytest

from tortoise_tpu.io import read_ggml, write_ggml
from tortoise_tpu.io.ggml import _read_ggml_py
from tortoise_tpu.io.wav import read_wav, wav_bytes, write_wav
from tortoise_tpu.io.voice import load_voice_latent


def _sample_tensors(rng):
    return {
        "a.weight": rng.standard_normal((1024, 3072)).astype(np.float32),
        "a.bias": rng.standard_normal((3072,)).astype(np.float32),
        "conv.weight": rng.standard_normal((64, 100, 5)).astype(np.float32),
        "scalarish": rng.standard_normal((1,)).astype(np.float32),
    }


def test_ggml_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = _sample_tensors(rng)
    path = str(tmp_path / "model.bin")
    write_ggml(path, tensors)
    out = read_ggml(path)
    assert set(out) == set(tensors)
    for name, arr in tensors.items():
        assert out[name].shape == arr.shape, name
        np.testing.assert_array_equal(out[name], arr)


def test_ggml_python_and_native_agree(tmp_path):
    rng = np.random.default_rng(1)
    tensors = _sample_tensors(rng)
    path = str(tmp_path / "model.bin")
    write_ggml(path, tensors)
    py = _read_ggml_py(path, mmap=False)
    anypath = read_ggml(path)  # native if available
    for name in tensors:
        np.testing.assert_array_equal(py[name], anypath[name])


def test_ggml_bad_magic(tmp_path):
    path = tmp_path / "bad.bin"
    path.write_bytes(b"\x00\x01\x02\x03 garbage")
    with pytest.raises(ValueError):
        _read_ggml_py(str(path), mmap=False)


def test_wav_roundtrip(tmp_path):
    data = np.sin(np.linspace(0, 40, 2400)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, data, 24000)
    back, rate = read_wav(path)
    assert rate == 24000
    np.testing.assert_array_equal(back, data)


def test_wav_header_layout():
    data = np.zeros(7, dtype=np.float32)
    raw = wav_bytes(data, 24000)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    assert len(raw) == 44 + 7 * 4
    # format tag 3 = IEEE float, mono, 32-bit
    import struct

    fmt, ch, rate, brate, align, bits = struct.unpack_from("<HHIIHH", raw, 20)
    assert (fmt, ch, rate, brate, align, bits) == (3, 1, 24000, 96000, 4, 32)


def test_load_shipped_voice_latents():
    for name in ("mol", "mouse", "notactuallymyself", "random"):
        lat = load_voice_latent(f"/root/reference/models/{name}.bin")
        assert lat.shape == (1024,)
        assert np.isfinite(lat).all()


def test_convert_cli_vocoder_roundtrip(tmp_path):
    """End-to-end converter: synthesize a production-inventory vocoder GGML
    file, convert via the CLI, reload, and match the direct conversion."""
    import subprocess
    import sys

    import numpy as np

    from tortoise_tpu.config import VocoderConfig
    from tortoise_tpu.io.checkpoint import (
        load_npz,
        random_ggml_tensors,
        vocoder_params_from_tensors,
        vocoder_tensor_inventory,
    )
    from tortoise_tpu.io.ggml import write_ggml

    cfg = VocoderConfig()
    tensors = random_ggml_tensors(vocoder_tensor_inventory(cfg), seed=3)
    tensors["conv_post.1.weight"] = tensors["conv_post.1.weight"].reshape(
        cfg.ch, 7)  # stored 2-D like the real file (main.cpp:1786)
    mdir = tmp_path / "models"
    mdir.mkdir()
    write_ggml(str(mdir / "ggml-vocoder-model.bin"), tensors)

    import os

    proc = subprocess.run(
        [sys.executable, "-m", "tortoise_tpu.convert", "--models",
         str(mdir), "--out", str(tmp_path / "cache")],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
             "PYTHONPATH": "/root/repo"},
        cwd="/root/repo",
    )
    # rc 1: the AR/diffusion files are absent (reported + skipped)
    assert proc.returncode == 1, proc.stderr[-500:]
    assert "ggml-vocoder-model.bin -> vocoder.npz" in proc.stdout
    loaded = load_npz(str(tmp_path / "cache" / "vocoder.npz"))
    direct = vocoder_params_from_tensors(tensors, cfg)
    import jax

    jax.tree.map(np.testing.assert_array_equal, loaded, direct)
