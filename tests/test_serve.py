"""Dynamic-batching serving layer (tortoise_tpu/serve.py): request
grouping, B-bucket padding, error isolation, and the stdlib HTTP
front-end, all on tiny CPU models."""

import dataclasses
import http.client
import json
import threading

import numpy as np
import pytest

from tortoise_tpu import serve
from tortoise_tpu.pipeline.synthesize import TortoiseModels


@pytest.fixture(scope="module")
def models():
    m = TortoiseModels.random(seed=0, tiny=True)
    m.ar_cfg = dataclasses.replace(m.ar_cfg, max_decode_steps=6,
                                   pad_mel_length=8)
    m.diffusion_cfg = dataclasses.replace(m.diffusion_cfg,
                                          n_sample_timesteps=4)
    return m


@pytest.fixture(scope="module")
def voice(models):
    return np.random.default_rng(3).normal(
        0, 0.5, (models.ar_cfg.d_model,)).astype(np.float32)


def _tokens(rng, n):
    # in-vocab for the tiny 32-entry text vocab (oversized ids now fail
    # validation at the stage boundary)
    return [1] + rng.integers(3, 30, size=n).tolist() + [0]


def test_bucketing():
    m = TortoiseModels.random(seed=0, tiny=True)
    s = serve.SynthesisServer(m, max_batch=16)
    assert [s._bucket(n) for n in (1, 2, 3, 5, 8, 9, 16, 99)] == \
        [1, 2, 4, 8, 8, 16, 16, 16]
    with pytest.raises(ValueError):
        serve.SynthesisServer(m, max_batch=32)  # above largest bucket


def test_batched_requests(models, voice):
    """Concurrent submits land in one padded batch; every future resolves
    with audio; dummy pad rows never surface."""
    rng = np.random.default_rng(0)
    # a generous admission window so all three submits join one batch
    server = serve.SynthesisServer(models, max_batch=4, max_wait_ms=3000,
                                   default_voice=voice)
    with server:
        futs = [server.submit(tokens=_tokens(rng, 4 + i), seed=7)
                for i in range(3)]
        results = [f.result(timeout=600) for f in futs]
    assert all(len(r.audio) > 0 for r in results)
    assert all(r.sample_rate == models.vocoder_cfg.sample_rate
               for r in results)
    st = server.stats()
    assert st["rows"] == 3
    assert st["batches"] == 1
    assert st["padded_rows"] == 1  # 3 rows -> bucket 4
    assert st["failed_batches"] == 0


def test_submit_validation(models, voice):
    """Malformed input fails its own submit() call — it never reaches the
    queue, so it cannot poison requests batched alongside it."""
    from tortoise_tpu.pipeline.ar_stage import TEXT_BUCKETS

    server = serve.SynthesisServer(models, default_voice=voice)
    with server:
        with pytest.raises(ValueError, match="voice latent"):
            server.submit(tokens=[1, 5, 0],
                          voice=np.zeros((3,), np.float32))
        with pytest.raises(ValueError, match="text too long"):
            server.submit(tokens=[3] * (max(TEXT_BUCKETS) + 1))
        with pytest.raises(ValueError, match="empty"):
            server.submit(tokens=[])
        with pytest.raises(ValueError, match="outside vocab"):
            server.submit(tokens=[255, 5, 0])  # tiny vocab is 32
    assert server.stats()["rows"] == 0


def test_error_isolation(models, voice, monkeypatch):
    """A failing batch resolves its futures with the exception and the
    worker keeps serving later requests."""
    rng = np.random.default_rng(1)
    real = serve.synthesize_batch
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected batch failure")
        return real(*args, **kwargs)

    monkeypatch.setattr(serve, "synthesize_batch", flaky)
    server = serve.SynthesisServer(models, max_batch=2, max_wait_ms=10,
                                   default_voice=voice)
    with server:
        bad = server.submit(tokens=_tokens(rng, 4))
        with pytest.raises(RuntimeError, match="injected"):
            bad.result(timeout=600)
        good = server.submit(tokens=_tokens(rng, 4))
        assert len(good.result(timeout=600).audio) > 0
    assert server.stats()["failed_batches"] == 1


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_worker_death_fails_futures_not_hangs(models, voice, monkeypatch):
    """A defect OUTSIDE the per-batch error isolation (an r4 snapshot
    shipped a misnamed Future method there) must fail the outstanding
    futures and close the server — not strand clients in result() forever
    and stop() on queue.join()."""
    rng = np.random.default_rng(5)

    def boom(self, batch, sampler):
        raise AttributeError("injected worker defect")

    monkeypatch.setattr(serve.SynthesisServer, "_run_batch", boom)
    # a generous admission window: all three submits must land in ONE
    # batch, or the crash after batch 1 closes the server while the
    # test is still submitting (a scheduling-dependent flake)
    server = serve.SynthesisServer(models, max_batch=4, max_wait_ms=2000,
                                   default_voice=voice)
    with server:
        futs = [server.submit(tokens=_tokens(rng, 4 + i)) for i in range(3)]
        for f in futs:
            # bounded wait: the whole point is that this resolves
            with pytest.raises(AttributeError, match="injected"):
                f.result(timeout=30)
        # the server closed itself to new submits
        with pytest.raises(RuntimeError):
            server.submit(tokens=_tokens(rng, 4))
    # and the with-block's stop(drain=True) returned (no queue.join hang)


def test_warmup_compiles_buckets(models, voice):
    """warmup() runs one batch per B bucket directly (queue bypassed) and
    needs a default voice."""
    server = serve.SynthesisServer(models, max_batch=2, max_wait_ms=10,
                                   default_voice=voice)
    with server:
        server.warmup(text_len=4)
    # queue untouched: direct calls don't count in the batch stats
    st = server.stats()
    assert st["rows"] == 0 and st["queued"] == 0
    no_voice = serve.SynthesisServer(models, max_batch=2)
    with no_voice:
        with pytest.raises(ValueError, match="default_voice"):
            no_voice.warmup()


def test_submit_requires_start(models, voice):
    server = serve.SynthesisServer(models, default_voice=voice)
    with pytest.raises(RuntimeError):
        server.submit(tokens=[255, 5, 0])


def test_serve_on_mesh(models, voice):
    """The server shards its batches over a mesh's dp axis: 4 requests on
    a (4, 2) virtual mesh resolve through the dp-sharded batched
    pipeline."""
    from tortoise_tpu.parallel import make_mesh

    rng = np.random.default_rng(4)
    mesh = make_mesh(8, shape=(4, 2))
    server = serve.SynthesisServer(models, max_batch=4, max_wait_ms=3000,
                                   default_voice=voice, mesh=mesh)
    with server:
        futs = [server.submit(tokens=_tokens(rng, 5), seed=3)
                for _ in range(4)]
        results = [f.result(timeout=600) for f in futs]
    assert all(len(r.audio) > 0 for r in results)
    st = server.stats()
    assert st["batches"] == 1 and st["rows"] == 4


def test_http_front_end(models, voice):
    rng = np.random.default_rng(2)
    server = serve.SynthesisServer(models, max_batch=2, max_wait_ms=10,
                                   default_voice=voice)
    server.start()
    httpd = serve.make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/synthesize",
                     json.dumps({"tokens": _tokens(rng, 4), "seed": 1}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "audio/wav"
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"

        conn.request("GET", "/healthz")
        h = conn.getresponse()
        health = json.loads(h.read())
        assert h.status == 200 and health["ok"]
        assert health["stats"]["rows"] >= 1

        conn.request("POST", "/synthesize", json.dumps({}),
                     {"Content-Type": "application/json"})
        bad = conn.getresponse()
        assert bad.status == 400
        assert "error" in json.loads(bad.read())
    finally:
        httpd.shutdown()
        httpd.server_close()
        server.stop()


def test_http_batch_failure_is_500(models, voice, monkeypatch):
    """A synthesis-side failure surfaces as 500 (retryable), not the 400
    reserved for the client's own bad input."""
    def boom(*a, **k):
        raise RuntimeError("injected synthesis failure")

    monkeypatch.setattr(serve, "synthesize_batch", boom)
    rng = np.random.default_rng(5)
    server = serve.SynthesisServer(models, max_batch=2, max_wait_ms=10,
                                   default_voice=voice).start()
    httpd = serve.make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/synthesize",
                     json.dumps({"tokens": _tokens(rng, 4)}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        body = json.loads(r.read())
        assert r.status == 500 and "injected" in body["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()
        server.stop(drain=False)


def test_mixed_sampler_settings_split_batches(models, voice):
    """Requests with different sampler settings in ONE admission window
    must split into one synthesis batch per distinct setting (the
    sampler is a whole-batch compile key), and per-request overrides
    must reach the sampling math (different settings -> generally
    different token streams for the same seed)."""
    rng = np.random.default_rng(1)
    toks = _tokens(rng, 5)
    server = serve.SynthesisServer(models, max_batch=4, max_wait_ms=3000,
                                   default_voice=voice)
    with server:
        f_default = server.submit(tokens=toks, seed=9)
        f_hot = server.submit(tokens=toks, seed=9, temperature=5.0,
                              top_k=200, repetition_penalty=1.0)
        f_default2 = server.submit(tokens=toks, seed=9)
        results = [f.result(timeout=600)
                   for f in (f_default, f_hot, f_default2)]
    assert all(len(r.audio) > 0 for r in results)
    st = server.stats()
    assert st["rows"] == 3
    assert st["batches"] == 2  # default pair + the override row
    assert st["failed_batches"] == 0
    # (rows of one batch draw row-indexed streams, so equal-setting
    # requests in different rows still differ; sampler-to-math plumbing
    # is asserted at the driver level in test_ar_pipeline.py)


def test_submit_rejects_bad_sampler(models, voice):
    server = serve.SynthesisServer(models, default_voice=voice)
    with server:
        with pytest.raises(ValueError):
            server.submit(tokens=[1, 4, 0], temperature=0.0)
        with pytest.raises(ValueError):
            server.submit(tokens=[1, 4, 0], top_k=0)
        with pytest.raises(ValueError):
            server.submit(tokens=[1, 4, 0], top_p_drop=1.5)


def test_stream_endpoint(models, voice):
    """server.stream() yields ordered finalized chunks whose
    concatenation is a whole utterance; streams are counted separately
    from batches and coexist with queued batch traffic (the device lock
    serializes them rather than interleaving dispatch)."""
    rng = np.random.default_rng(5)
    toks = _tokens(rng, 5)
    server = serve.SynthesisServer(models, max_batch=2, max_wait_ms=50,
                                   default_voice=voice)
    with server:
        # a batched request in flight while the stream runs
        fut = server.submit(tokens=_tokens(rng, 4), seed=3)
        chunks = list(server.stream(tokens=toks, seed=7,
                                    window_frames=24, overlap_frames=8,
                                    first_window_frames=16))
        batch_result = fut.result(timeout=600)
    assert chunks and chunks[-1].final
    assert all(not c.final for c in chunks[:-1])
    starts = [c.start_sample for c in chunks]
    assert starts[0] == 0 and starts == sorted(starts)
    total = np.concatenate([c.audio for c in chunks])
    assert len(total) > 0 and total.dtype == np.float32
    assert len(batch_result.audio) > 0
    st = server.stats()
    assert st.get("streams") == 1
    assert st["rows"] == 1  # the stream is NOT a batch row


def test_http_stream_endpoint(models, voice):
    """POST /stream returns a chunked streaming-WAV body: the
    unknown-length RIFF header followed by float32 frames, decodable as
    one utterance; bad input still gets a clean 400 (validation runs
    before the 200 goes out)."""
    rng = np.random.default_rng(8)
    server = serve.SynthesisServer(models, max_batch=2, max_wait_ms=10,
                                   default_voice=voice)
    server.start()
    httpd = serve.make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/stream",
                     json.dumps({"tokens": _tokens(rng, 5), "seed": 2,
                                 "window_frames": 24,
                                 "overlap_frames": 8,
                                 "first_window_frames": 16}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "audio/wav"
        assert resp.getheader("Transfer-Encoding") == "chunked"
        body = resp.read()  # http.client reassembles the chunks
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        assert body[12:16] == b"fmt " and body[36:40] == b"data"
        # unknown-length streaming sizes
        assert body[4:8] == b"\xff\xff\xff\xff"
        samples = np.frombuffer(body[44:], dtype=np.float32)
        assert len(samples) > 0 and np.all(np.isfinite(samples))

        conn.request("POST", "/stream", json.dumps({"temperature": 0.0}),
                     {"Content-Type": "application/json"})
        bad = conn.getresponse()
        assert bad.status == 400
        assert "error" in json.loads(bad.read())
    finally:
        httpd.shutdown()
        httpd.server_close()
        server.stop()
    assert server.stats().get("streams") == 1


def test_stream_validation(models, voice):
    server = serve.SynthesisServer(models)  # no default voice
    with pytest.raises(RuntimeError):
        server.stream(tokens=[1, 4, 0])  # not started
    with server:
        with pytest.raises(ValueError):
            server.stream()  # neither message nor tokens
        with pytest.raises(ValueError):
            server.stream(tokens=[1, 4, 0])  # no voice
        with pytest.raises(ValueError):
            server.stream(tokens=[1, 4, 0], voice=voice, temperature=0.0)
        # stream() validates EAGERLY (same contract as submit()): each of
        # these must raise at call time, before any generator is
        # consumed and before any device work — the HTTP 400 path
        # depends on it (the 200 + chunked header goes out on first
        # yield).
        with pytest.raises(ValueError):
            server.stream(tokens=[], voice=voice)  # empty
        with pytest.raises(ValueError):
            server.stream(tokens=[999_999], voice=voice)  # out of vocab
        with pytest.raises(ValueError):
            server.stream(tokens=[1, 4, 0], voice=voice,
                          window_frames=16, overlap_frames=16)  # ov >= w
        with pytest.raises(ValueError):
            server.stream(tokens=[1, 4, 0], voice=voice,
                          window_frames=24, overlap_frames=8,
                          first_window_frames=8)  # first <= ov
        with pytest.raises(ValueError):
            server.stream(tokens=[1, 4, 0], voice=voice,
                          vocoder_margin=-1)  # negative margin


def test_stream_does_not_starve_batches(models, voice):
    """The device lock is released while a chunk is with the consumer: a
    stream paused mid-consumption (a slow client) must not block queued
    batch traffic (serve.py holds _device_lock only inside next())."""
    rng = np.random.default_rng(11)
    server = serve.SynthesisServer(models, max_batch=2, max_wait_ms=10,
                                   default_voice=voice)
    with server:
        # windows + vocoder margin far smaller than the tiny model's mel
        # length so the utterance spans SEVERAL chunks (the default
        # 32-frame margin exceeds the whole tiny mel, which would
        # collapse the stream to one final chunk and trivially pass:
        # the generator would finish before the pause)
        gen = server.stream(tokens=_tokens(rng, 5), seed=1,
                            window_frames=8, overlap_frames=2,
                            first_window_frames=4, vocoder_margin=2)
        first = next(gen)  # stream started; consumer now stalls
        assert len(first.audio) > 0
        # with the generator suspended at yield, a batched request must
        # still complete — before the stream is consumed any further
        fut = server.submit(tokens=_tokens(rng, 4), seed=2)
        res = fut.result(timeout=600)
        assert len(res.audio) > 0
        rest = list(gen)  # now drain the stream
    assert rest and rest[-1].final
    st = server.stats()
    assert st.get("streams") == 1
    assert st.get("streams_completed") == 1
    assert st["rows"] == 1


def test_two_streams_interleave(models, voice):
    """Two concurrent streams make progress alternately (each chunk
    re-acquires the device lock, so neither holds the device for its
    whole utterance) and both complete with distinct audio."""
    rng = np.random.default_rng(19)
    server = serve.SynthesisServer(models, default_voice=voice)
    kw = dict(window_frames=8, overlap_frames=2, first_window_frames=4,
              vocoder_margin=2)
    with server:
        g1 = server.stream(tokens=_tokens(rng, 5), seed=1, **kw)
        g2 = server.stream(tokens=_tokens(rng, 5), seed=2, **kw)
        c1, c2 = [], []
        done1 = done2 = False
        while not (done1 and done2):
            if not done1:
                try:
                    c1.append(next(g1))
                except StopIteration:
                    done1 = True
            if not done2:
                try:
                    c2.append(next(g2))
                except StopIteration:
                    done2 = True
    assert c1 and c1[-1].final and c2 and c2[-1].final
    a1 = np.concatenate([c.audio for c in c1])
    a2 = np.concatenate([c.audio for c in c2])
    assert len(a1) > 0 and len(a2) > 0
    # different seeds -> different utterances
    assert len(a1) != len(a2) or not np.array_equal(a1, a2)
    st = server.stats()
    assert st.get("streams") == 2 and st.get("streams_completed") == 2


def test_serving_chaos_mix(models, voice):
    """Load mix: concurrent submits with two different sampler settings,
    a live multi-chunk stream, and a malformed request, all at once.
    Every well-formed future resolves with audio, the bad one fails
    alone, the stream completes, and the stats stay coherent."""
    rng = np.random.default_rng(23)
    server = serve.SynthesisServer(models, max_batch=4, max_wait_ms=50,
                                   default_voice=voice)
    with server:
        gen = server.stream(tokens=_tokens(rng, 5), seed=9,
                            window_frames=8, overlap_frames=2,
                            first_window_frames=4, vocoder_margin=2)
        chunks = [next(gen)]
        futs = []
        for i in range(6):
            kw = {} if i % 2 else {"temperature": 1.1, "top_k": 9}
            futs.append(server.submit(tokens=_tokens(rng, 4 + i),
                                      seed=i, **kw))
        with pytest.raises(ValueError):
            server.submit(tokens=[10**9])  # out of vocab, fails alone
        results = [f.result(timeout=600) for f in futs]
        chunks += list(gen)
    assert all(len(r.audio) > 0 for r in results)
    assert chunks[-1].final
    st = server.stats()
    assert st["rows"] == 6 and st["failed_batches"] == 0
    assert st.get("streams_completed") == 1
    # two sampler settings can never share a synthesis batch
    assert st["batches"] >= 2


def test_stream_aborts_after_stop(models, voice):
    """A stream in flight when stop() lands aborts with RuntimeError at
    its next chunk instead of running device work (potentially minutes)
    against a stopped server; a stream admitted after stop() is rejected
    at call time."""
    rng = np.random.default_rng(13)
    server = serve.SynthesisServer(models, default_voice=voice)
    server.start()
    gen = server.stream(tokens=_tokens(rng, 5), seed=1,
                        window_frames=8, overlap_frames=2,
                        first_window_frames=4, vocoder_margin=2)
    first = next(gen)  # stream mid-flight
    assert len(first.audio) > 0
    server.stop()
    with pytest.raises(RuntimeError):
        next(gen)
    with pytest.raises(RuntimeError):
        server.stream(tokens=_tokens(rng, 4), seed=2)  # post-stop admit
    assert server.stats().get("streams_completed") is None


def test_http_stream_null_first_window(models, voice):
    """JSON null on first_window_frames selects the library's uniform
    window behavior (None) — a 200, not an int(None) 400; null on any
    other geometry key is a clean 400 naming the field."""
    server = serve.SynthesisServer(models, default_voice=voice)
    server.start()
    httpd = serve.make_http_server(server, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    rng = np.random.default_rng(17)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/stream",
                     json.dumps({"tokens": _tokens(rng, 4), "seed": 3,
                                 "window_frames": 24, "overlap_frames": 8,
                                 "first_window_frames": None}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200 and body[:4] == b"RIFF"

        conn.request("POST", "/stream",
                     json.dumps({"tokens": _tokens(rng, 4),
                                 "window_frames": None}),
                     {"Content-Type": "application/json"})
        bad = conn.getresponse()
        err = json.loads(bad.read())
        assert bad.status == 400
        assert "window_frames" in err["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()
        server.stop()


def test_out_of_range_seed_rejected_at_submit(models, voice):
    """A seed jax.random.PRNGKey cannot hold fails its own caller at
    submit()/stream() time — with validation only in the worker, the
    PRNGKey OverflowError would poison every co-batched request."""
    server = serve.SynthesisServer(models, default_voice=voice)
    with server:
        with pytest.raises(ValueError, match="seed"):
            server.submit(tokens=[1, 4, 0], seed=2 ** 64)
        with pytest.raises(ValueError, match="seed"):
            server.stream(tokens=[1, 4, 0], seed=-(2 ** 70))
        ok = server.submit(tokens=[1, 4, 0], seed=2 ** 62)
        assert len(ok.result(timeout=600).audio) > 0
    assert server.stats()["failed_batches"] == 0


def test_cancelled_future_skipped_not_fatal(models, voice, monkeypatch):
    """A client that times out and cancel()s its future must not kill the
    worker: set_result on a cancelled future raises InvalidStateError,
    which would leave the queue unserved and hang stop(drain=True)."""
    import time as _time

    gate = threading.Event()
    entered = threading.Event()
    real = serve.synthesize_batch
    calls = {"n": 0}

    def gated(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            entered.set()
            assert gate.wait(timeout=600)
        return real(*args, **kwargs)

    monkeypatch.setattr(serve, "synthesize_batch", gated)
    rng = np.random.default_rng(9)
    server = serve.SynthesisServer(models, max_batch=2, max_wait_ms=10,
                                   default_voice=voice)
    with server:
        blocker = server.submit(tokens=_tokens(rng, 4))
        assert entered.wait(timeout=600)  # worker is inside batch 1
        doomed = server.submit(tokens=_tokens(rng, 4))
        assert doomed.cancel()  # still queued -> cancellable
        survivor = server.submit(tokens=_tokens(rng, 4))
        gate.set()
        assert len(blocker.result(timeout=600).audio) > 0
        assert len(survivor.result(timeout=600).audio) > 0
        with pytest.raises(Exception):
            doomed.result(timeout=0)  # CancelledError
    # reaching here proves stop(drain=True) completed (no hang) and the
    # worker survived the cancelled row
    assert server.stats()["failed_batches"] == 0


def test_voice_filename_resolves_against_voice_dir(models, tmp_path):
    """'mol.bin' (a models-dir filename, not a bare name) must resolve to
    voice_dir/mol.bin — not voice_dir/mol.bin.bin."""
    d = models.ar_cfg.d_model
    lat = np.random.default_rng(4).normal(0, 0.5, (d,)).astype(np.float32)
    lat.tofile(tmp_path / "mol.bin")
    server = serve.SynthesisServer(models, voice_dir=str(tmp_path))
    for name in ("mol", "mol.bin"):
        got = server._load_voice(name)
        np.testing.assert_array_equal(got, lat)
