"""checked_sync: the bench's defense against contaminated stage-synced
decompositions (recompiles / tunnel stalls / executable reloads landing on
one stage's barrier — BENCH_r03's batched B=8 entry, and an r5 probe's
14.2s sync pass against a 1.57s async wall)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def _mk(ar=0.5, diff=1.0, voc=0.2, extra=None):
    t = {"autoregressive_s": ar, "diffusion_s": diff, "vocoder_s": voc}
    if extra:
        t.update(extra)
    return t


def test_clean_first_pass_returns_immediately():
    calls = {"n": 0}

    def run():
        calls["n"] += 1
        t = _mk()
        return t, 1.7, "payload"

    payload, tim, wall, meta = bench.checked_sync(run, ref_wall=1.6)
    assert calls["n"] == 1
    assert meta == {"sync_retries": 0, "sync_consistent": True}
    assert payload == "payload" and wall == 1.7


def test_ref_wall_gate_rejects_inflated_but_self_consistent_pass():
    """A pass whose stages sum to its own wall but whose wall is many x
    the async wall (the r5 probe's 11.1s 'prefill') must not pass."""
    seq = [(_mk(ar=11.1), 12.8), (_mk(), 1.7)]
    calls = {"n": 0}

    def run():
        t, w = seq[min(calls["n"], len(seq) - 1)]
        calls["n"] += 1
        return t, w, "p"

    payload, tim, wall, meta = bench.checked_sync(run, ref_wall=1.6)
    assert meta["sync_consistent"] and meta["sync_retries"] == 1
    assert wall == 1.7 and tim["autoregressive_s"] == 0.5


def test_composed_minimum_when_every_pass_is_contaminated():
    """Rotating one-stage contamination: no single pass is clean, but the
    per-stage minimum across attempts is — shipped with sync_composed."""
    calls = {"n": 0}
    keys = ["autoregressive_s", "diffusion_s", "vocoder_s"]

    def run():
        i = calls["n"]
        calls["n"] += 1
        t = _mk(extra={"ar_decode_steps": 500})
        t[keys[i % 3]] += 10.0
        w = sum(v for k, v in t.items() if k.endswith("_s"))
        return t, w, f"p{i}"

    payload, tim, wall, meta = bench.checked_sync(run, ref_wall=1.7)
    assert meta["sync_composed"] and meta["sync_consistent"]
    assert abs(tim["autoregressive_s"] - 0.5) < 1e-9
    assert abs(tim["diffusion_s"] - 1.0) < 1e-9
    assert tim["ar_decode_steps"] == 500
    assert abs(wall - 1.7) < 1e-9


def test_hopeless_contamination_is_disclosed_not_hidden():
    def run():
        return _mk(ar=11.0), 12.2, "p"

    payload, tim, wall, meta = bench.checked_sync(run, ref_wall=1.6)
    assert meta["sync_consistent"] is False
    assert "sync_composed" not in meta
    # the least-bad pass still ships (with the red flag), not nothing
    assert tim["autoregressive_s"] == 11.0
