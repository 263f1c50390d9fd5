"""Validate the Python std::mt19937/distribution twin against the real
libstdc++ (the native module compiled with g++), and the fixture-state
loading path against the reference's serialized RNG states."""

import numpy as np
import pytest

from tortoise_tpu.rng import PyStdRng, ReferenceRng
from tortoise_tpu.rng.mt19937 import MT19937

try:
    from tortoise_tpu.native import StdRng, available

    HAVE_NATIVE = available()
except Exception:
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib not built")

AR_SEED_FIXTURE = "/root/reference/assets/test_autoregressive_seed.bin"
DIFF_SEED_FIXTURE = "/root/reference/assets/test_diffusion_seed.bin"
DIFF_NORMAL_FIXTURE = "/root/reference/assets/test_diffusion_normal_distribution.bin"

# First outputs of std::mt19937 seeded with 5489 (the C++ default seed) —
# published constants of the algorithm.
MT_DEFAULT_FIRST = [3499211612, 581869302, 3890346734, 3586334585, 545404204]


def test_mt19937_default_seed_vector():
    eng = MT19937(5489)
    np.testing.assert_array_equal(eng.raw(5), MT_DEFAULT_FIRST)


def test_mt19937_state_roundtrip():
    eng = MT19937(42)
    eng.raw(1000)
    text = eng.state_text()
    eng2 = MT19937(0)
    eng2.load_state_text(text)
    np.testing.assert_array_equal(eng.raw(100), eng2.raw(100))


@needs_native
def test_raw_stream_matches_libstdcxx():
    for seed in (0, 1, 12345):
        py = PyStdRng(seed)
        nat = StdRng(seed)
        np.testing.assert_array_equal(py.raw_u32(2000), nat.raw_u32(2000))


@needs_native
def test_uniform_float_matches_libstdcxx():
    py, nat = PyStdRng(7), StdRng(7)
    np.testing.assert_array_equal(py.uniform_float(5000), nat.uniform_float(5000))


@needs_native
def test_normal_double_matches_libstdcxx():
    py, nat = PyStdRng(3), StdRng(3)
    np.testing.assert_array_equal(py.normal_double(4097), nat.normal_double(4097))
    # continue drawing: saved-value state must carry across calls
    np.testing.assert_array_equal(py.normal_double(3), nat.normal_double(3))
    np.testing.assert_array_equal(py.normal_double(2), nat.normal_double(2))


@needs_native
def test_interleaved_streams_match():
    py, nat = PyStdRng(99), StdRng(99)
    for n in (3, 1, 8, 2, 5):
        np.testing.assert_array_equal(py.uniform_float(n), nat.uniform_float(n))
        np.testing.assert_array_equal(py.normal_double(n), nat.normal_double(n))


@needs_native
def test_fixture_state_loading_matches():
    for fixture in (AR_SEED_FIXTURE, DIFF_SEED_FIXTURE):
        with open(fixture) as f:
            text = f.read()
        py, nat = PyStdRng(0), StdRng(0)
        py.load_state(text)
        nat.load_state(text)
        np.testing.assert_array_equal(py.raw_u32(1500), nat.raw_u32(1500))


def test_fixture_normal_state_parses():
    rng = PyStdRng(0)
    with open(DIFF_NORMAL_FIXTURE) as f:
        rng.load_normal_state(f.read())
    assert rng._normal_saved is None  # fixture stores avail=0


@needs_native
def test_non_unit_normal_state_matches_libstdcxx():
    """A restored state with non-(0,1) parameters must scale like
    libstdc++ (ret = raw*stddev + mean, saved value raw) — the Python
    twin used to discard mean/stddev while the native plane applied
    them, so the two backends drew different streams."""
    py, nat = PyStdRng(5), StdRng(5)
    for r in (py, nat):
        r.load_normal_state("2.5 0.5 0")
    np.testing.assert_array_equal(py.normal_double(7), nat.normal_double(7))
    np.testing.assert_array_equal(py.normal_double(4), nat.normal_double(4))


def test_truncated_normal_state_raises():
    rng = PyStdRng(0)
    import pytest

    with pytest.raises(ValueError):
        rng.load_normal_state("0 1 1")  # avail flag set, saved missing


def test_reference_rng_multinomial_consumes_two_uniforms():
    a = ReferenceRng(seed=11, force_python=True)
    b = ReferenceRng(seed=11, force_python=True)
    u = b.uniform(2)  # the sampler draws twice, keeps the second
    probs = np.array([0.1, 0.2, 0.7], dtype=np.float32)
    idx = a.multinomial(probs)
    cum = np.cumsum(probs)
    expected = int(np.argmax(cum >= u[1]))
    assert idx == expected
    # streams stay aligned afterwards
    np.testing.assert_array_equal(a.uniform(4), b.uniform(4))
