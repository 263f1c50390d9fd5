"""Live g++ oracle for the sampler: compile the REFERENCE'S OWN sampler
functions (sliced from /root/reference/main.cpp at test time — they are
std-only: gather/apply_penalty/scatter, temp/top-k/top-p quirk chain,
softmax, double-draw multinomial, main.cpp:4562-4720) into a harness and
compare its sampled ids against our host parity plane
(ops/sampling.host_process_logits_and_sample + rng.ReferenceRng) on the
same mt19937 stream.

Unlike the committed pseudo-goldens this cannot drift with the repo: the
oracle is rebuilt from the reference source on every run, so any bend in
the penalty order, the ascending-cumsum top-p rule, or the double uniform
draw fails here even if our own fixtures were regenerated. The harness
lives in the pytest tmp dir and is never committed (no reference code
enters the repo)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF_MAIN = "/root/reference/main.cpp"

VOCAB = 8194  # the reference sampler hardcodes 8194 in its asserts

HARNESS_TMPL = r"""
#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <limits>
#include <random>
#include <vector>

std::mt19937 generator(0);
std::uniform_real_distribution<float> distribution(0.0, 1.0);

%(sliced)s

int main(int argc, char **argv) {
  // argv: seed batch prev_len n_rounds; stdin: per round, batch*8194 f32
  // logits then batch*prev_len i32 ids; stdout: batch i32 samples/round
  unsigned seed = (unsigned)strtoul(argv[1], nullptr, 10);
  int batch = atoi(argv[2]);
  int prev_len = atoi(argv[3]);
  int rounds = atoi(argv[4]);
  generator.seed(seed);
  for (int r = 0; r < rounds; r++) {
    std::vector<float> logits((size_t)batch * 8194);
    std::vector<int> ids((size_t)batch * prev_len);
    if (fread(logits.data(), sizeof(float), logits.size(), stdin) !=
        logits.size())
      return 2;
    if (fread(ids.data(), sizeof(int), ids.size(), stdin) != ids.size())
      return 2;
    // the body of process_logits_and_sample after the tensor extraction
    // (main.cpp:4753-4806): batchwide gather -> penalty 2.0 -> scatter,
    // then per row temp 0.8 / top-k 50 / top-p / softmax / multinomial
    std::vector<float> g = gather(logits, ids, batch);
    g = apply_penalty(g, 2.0);
    std::vector<float> scat = scatter(logits, g, ids, batch);
    for (int i = 0; i < batch; i++) {
      std::vector<float> row(scat.begin() + (size_t)i * 8194,
                             scat.begin() + (size_t)(i + 1) * 8194);
      temp_inplace(row, 0.8);
      top_k_inplace(row, 50);
      top_p_inplace(row);
      softmax_inplace(row);
      int s = multinomial(row);
      fwrite(&s, sizeof(int), 1, stdout);
    }
  }
  return 0;
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
        sliced = _slice(src, "std::vector<float> apply_penalty",
                        "std::vector<float> sample_normal_noise")
        sliced += _slice(src, "int multinomial(",
                         "std::vector<int> get_relative_position_buckets")
    except ValueError:
        pytest.skip("reference sampler markers moved; update the slicer")
    tmp = tmp_path_factory.mktemp("sampler_oracle")
    cpp = tmp / "harness.cpp"
    cpp.write_text(HARNESS_TMPL % {"sliced": sliced})
    exe = tmp / "harness"
    r = subprocess.run(["g++", "-O2", "-std=c++17", str(cpp), "-o", str(exe)],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[-500:]}")
    return str(exe)


def _run_oracle(exe, seed, logits_rounds, ids_rounds):
    batch, prev_len = ids_rounds[0].shape
    blob = b"".join(
        l.astype("<f4").tobytes() + i.astype("<i4").tobytes()
        for l, i in zip(logits_rounds, ids_rounds))
    r = subprocess.run(
        [exe, str(seed), str(batch), str(prev_len),
         str(len(logits_rounds))],
        input=blob, capture_output=True)
    assert r.returncode == 0, r.stderr[-500:]
    out = np.frombuffer(r.stdout, "<i4")
    return out.reshape(len(logits_rounds), batch)


def test_host_sampler_matches_reference_binary(oracle):
    """Multi-round stream: the mt19937 state advances 2 uniform draws per
    multinomial, so round k's samples check both the filter chain and the
    exact draw order accumulated over rounds 0..k-1."""
    from tortoise_tpu.ops.sampling import host_process_logits_and_sample
    from tortoise_tpu.rng import ReferenceRng

    rng_np = np.random.default_rng(0)
    batch, prev_len, rounds, seed = 4, 6, 5, 1234
    logits_rounds = [
        rng_np.normal(0, 4, (batch, VOCAB)).astype(np.float32)
        for _ in range(rounds)
    ]
    ids_rounds = [
        rng_np.integers(0, VOCAB, (batch, prev_len)).astype(np.int32)
        for _ in range(rounds)
    ]
    want = _run_oracle(oracle, seed, logits_rounds, ids_rounds)

    rng = ReferenceRng(seed)
    got = np.stack([
        host_process_logits_and_sample(
            logits_rounds[r], [row for row in ids_rounds[r]], rng)
        for r in range(rounds)
    ])
    np.testing.assert_array_equal(got, want)


def test_oracle_catches_quirk_edits(oracle):
    """Sanity-check the oracle has teeth: an edited top-p threshold (0.3
    instead of the reference's 0.2) must diverge on logits crafted to put
    mass in the 0.2-0.3 cumulative band."""
    from tortoise_tpu.ops.sampling import host_process_logits_and_sample
    from tortoise_tpu.rng import ReferenceRng

    rng_np = np.random.default_rng(7)
    batch, prev_len, rounds, seed = 4, 4, 8, 99
    # near-flat logits over a small active set -> many tokens sit in the
    # ascending-cumsum band where the 0.2 rule decides survival
    logits_rounds, ids_rounds = [], []
    for _ in range(rounds):
        l = np.full((batch, VOCAB), -30.0, np.float32)
        active = rng_np.integers(0, VOCAB, (batch, 40))
        for b in range(batch):
            l[b, active[b]] = rng_np.normal(0, 0.3, 40)
        logits_rounds.append(l)
        ids_rounds.append(
            rng_np.integers(0, VOCAB, (batch, prev_len)).astype(np.int32))
    want = _run_oracle(oracle, seed, logits_rounds, ids_rounds)

    rng = ReferenceRng(seed)
    tampered = np.stack([
        host_process_logits_and_sample(
            logits_rounds[r], [row for row in ids_rounds[r]], rng,
            top_p_drop=0.3)
        for r in range(rounds)
    ])
    assert (tampered != want).any(), (
        "oracle failed to distinguish a tampered top-p threshold; "
        "strengthen the crafted logits")
