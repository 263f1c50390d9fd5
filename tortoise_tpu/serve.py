"""Dynamic-batching synthesis server: the production serving front-end.

The reference is a one-shot CLI (main.cpp:6528-6583) — one utterance per
process. On TPU the economics invert: weights stay resident, programs stay
compiled, and the batched pipeline (pipeline/synthesize.synthesize_batch)
amortizes the 80-step diffusion loop and the AR weight stream over many
utterances (aggregate RTF/chip improves through B=16, BASELINE.md). This
module turns that batched plane into a server:

- `SynthesisServer` owns a request queue and a single worker thread. The
  worker takes the first waiting request, then holds the batch open for
  up to `max_wait_ms` to admit more, up to `max_batch` rows.
- Batch sizes are rounded UP to a fixed bucket (1, 2, 4, 8, 16 by
  default) by repeating the last row, and text lengths ride the existing
  ar_stage text buckets — so XLA sees one static (text-bucket, B-bucket)
  shape pair per program, never a fresh compile mid-serving. Dummy rows
  are dropped before the futures resolve. Bucketed-B padding wastes some
  rows (tracked in `stats()["padded_rows"]`); an unpadded batch would
  recompile every program for every new B, which on the remote-TPU
  compile path costs minutes (utils/runtime.enable_compilation_cache
  notes), not the ~6% aggregate-RTF gap between adjacent buckets.
- Each request carries its own voice latent; per-row voices are first
  class in the batched pipeline.

Determinism: the batch is seeded by the FIRST request's seed. Row b of a
batch draws row b of the batch's jax.random streams, so a request's exact
output depends on the batch it lands in (composition and order) — the
same trade every dynamically-batched sampler makes. For bit-reproducible
output, synthesize alone (batch of 1) with a fixed seed.

The HTTP front-end (`python -m tortoise_tpu.serve`) is a thin stdlib
wrapper: POST /synthesize {"message": ..., "voice": ..., "seed": ...}
returns audio/wav; GET /healthz returns queue/batch stats. It exists so
the server is drivable end-to-end without extra dependencies; production
deployments would put their own RPC layer in front of SynthesisServer.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from tortoise_tpu.io.voice import load_voice_latent
from tortoise_tpu.io.wav import wav_bytes
from tortoise_tpu.models.ar import FUSED_MAX_BATCH
from tortoise_tpu.pipeline.synthesize import (
    SynthesisResult,
    TortoiseModels,
    synthesize_batch,
)

DEFAULT_B_BUCKETS = (1, 2, 4, 8, FUSED_MAX_BATCH)


def _check_seed(seed) -> int:
    """Validate a request seed at submit time. jax.random.PRNGKey folds
    the seed to int64 (OverflowError beyond), and synthesize derives
    stage seeds up to seed+2 — an out-of-range seed must fail its own
    caller, never the batch it would have joined."""
    s = int(seed)
    if not -(2 ** 63) <= s <= 2 ** 63 - 3:
        raise ValueError(f"seed outside the int64 range: {seed}")
    return s


def _fail_future(fut: "Future", exc: BaseException) -> None:
    """Set `exc` on a future in any client-visible state: claim it if
    still pending, tolerate already-RUNNING (claimed by a batch that died
    before resolving it), and ignore client-cancelled/raced ones."""
    try:
        if fut.cancelled() or fut.done():
            return
        # claim a PENDING future; skip the claim call when it is already
        # RUNNING (set_running_or_notify_cancel on a RUNNING future logs
        # a CRITICAL record inside concurrent.futures before raising)
        if not fut.running():
            try:
                if not fut.set_running_or_notify_cancel():
                    return  # client cancelled
            except RuntimeError:
                pass  # raced to RUNNING: set_exception below is legal
        fut.set_exception(exc)
    except Exception:
        pass  # racing completion/cancellation; nothing left to report


@dataclass
class _Request:
    tokens: List[int]
    voice: np.ndarray
    seed: int
    sampler: tuple = None  # normalized (temp, top_k, p_drop, penalty)
    future: "Future[SynthesisResult]" = field(default_factory=Future)


class SynthesisServer:
    """Queue + worker around the batched synthesis pipeline.

    Usage:
        server = SynthesisServer(models, compute_dtype=jnp.bfloat16,
                                 int8_weights=True)
        server.start()
        fut = server.submit(message="hello", voice="/path/mol.bin")
        result = fut.result()          # SynthesisResult
        server.stop()
    """

    def __init__(
        self,
        models: TortoiseModels,
        compute_dtype=None,
        int8_weights: bool = False,
        max_batch: int = 8,
        max_wait_ms: float = 50.0,
        batch_buckets: Sequence[int] = DEFAULT_B_BUCKETS,
        mesh=None,
        default_voice=None,
        voice_dir: Optional[str] = None,
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.models = models
        self.voice_dir = voice_dir
        self.compute_dtype = compute_dtype
        self.int8_weights = int8_weights
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.batch_buckets = tuple(sorted(set(batch_buckets)))
        if self.batch_buckets[-1] < max_batch:
            raise ValueError("largest batch bucket is below max_batch")
        self.mesh = mesh
        self.default_voice = (
            self._load_voice(default_voice) if default_voice is not None
            else None)
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._lock = threading.Lock()
        # serializes device work between the batch worker and streaming
        # requests: interleaved dispatch is correct but doubles both
        # paths' latency. A stream re-acquires this per chunk (released
        # while the chunk is with the client), so batches and stream
        # windows interleave rather than one starving the other.
        self._device_lock = threading.Lock()
        # serializes stop() against concurrent stop() callers (e.g. a
        # signal handler plus a finally:). NOT self._lock: the worker's
        # death handler takes _lock while stop() joins the worker —
        # holding _lock across the join would deadlock
        self._stop_lock = threading.Lock()
        self._closed = True  # flipped by start()/stop() under _lock
        self._stats = {"batches": 0, "rows": 0, "padded_rows": 0,
                       "failed_batches": 0}

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "SynthesisServer":
        if self._worker is not None:
            raise RuntimeError("server already started")
        self._stop.clear()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="tortoise-serve-worker")
        self._worker.start()
        return self

    def stop(self, drain: bool = True) -> None:
        """Stop the worker. With drain=True (default) queued requests are
        served first; otherwise they fail with RuntimeError. Safe to call
        from multiple threads and repeatedly (later calls no-op)."""
        with self._stop_lock:
            worker = self._worker
            if worker is None:
                return
            with self._lock:
                # no new submits land after this point (submit checks
                # _closed under the same lock before enqueueing, so a
                # concurrent request can't slip in between the drain and
                # worker exit and hang its future forever)
                self._closed = True
            if drain:
                self._queue.join()
            self._stop.set()
            worker.join()
            self._worker = None
            while True:  # fail anything left (drain=False path)
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                _fail_future(req.future, RuntimeError("server stopped"))
                self._queue.task_done()

    def __enter__(self) -> "SynthesisServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- client API --------------------------------------------------------

    def submit(self, message: Optional[str] = None,
               tokens: Optional[Sequence[int]] = None,
               voice=None, seed: int = 0,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p_drop: Optional[float] = None,
               repetition_penalty: Optional[float] = None,
               ) -> "Future[SynthesisResult]":
        """Enqueue one utterance; returns a Future resolving to its
        SynthesisResult. `voice` is a (d,) latent, a path to a voice .bin,
        a bare name resolved against voice_dir, or None for the server's
        default_voice.

        `seed` seeds the whole batch this request lands in (the first
        request's seed wins) — under dynamic batching the exact output
        depends on batch composition; see the module docstring.

        temperature / top_k / top_p_drop / repetition_penalty override
        the reference's hardcoded sampler constants (main.cpp:4791-4793)
        per request; None keeps each default. Only requests with the
        SAME effective sampler settings batch together (the sampler is a
        whole-batch compile key) — the worker splits a mixed admission
        window into one synthesis batch per distinct setting. top_k >
        128 routes the batch to the XLA sampler plane automatically.

        Inputs are validated HERE, before enqueueing, so a malformed
        request fails its own caller instead of poisoning the batch it
        would have joined."""
        if self._worker is None:
            raise RuntimeError("server not started")
        tokens, voice_arr, sampler = self._normalize_request(
            message, tokens, voice, temperature, top_k, top_p_drop,
            repetition_penalty)
        req = _Request(tokens, voice_arr, _check_seed(seed), sampler)
        with self._lock:
            if self._closed or self._worker is None:
                raise RuntimeError("server not started")
            self._queue.put(req)
        return req.future

    def stream(self, message: Optional[str] = None,
               tokens: Optional[Sequence[int]] = None,
               voice=None, seed: int = 0,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p_drop: Optional[float] = None,
               repetition_penalty: Optional[float] = None,
               window_frames: int = 352, overlap_frames: int = 32,
               first_window_frames: Optional[int] = 96,
               vocoder_margin: int = 32):
        """Streaming synthesis: yields pipeline.streaming.StreamChunk
        objects as audio finalizes (first chunk ~= time-to-first-audio).
        Bypasses dynamic batching (a stream cannot batch). The server's
        device lock is held only while a chunk is being COMPUTED and is
        released while the chunk is in the caller's hands — a slow or
        stalled consumer cannot starve queued batches, though batches
        and stream windows interleave on the device. Validation mirrors
        submit(): all inputs (including the window geometry) are checked
        eagerly, before any device work, so the HTTP layer's 400 path
        fires before the response status is committed. A stream races
        stop() like a submit does: admission is checked under the same
        lock stop() closes under, and an in-flight stream aborts with
        RuntimeError at its next chunk once the server stops (stop()
        cannot drain a consumer-driven generator, so truncation beats
        running device work for minutes after shutdown)."""
        with self._lock:
            if self._closed or self._worker is None:
                raise RuntimeError("server not started")
        from tortoise_tpu.pipeline.streaming import stream_synthesize

        tokens, voice_arr, sampler = self._normalize_request(
            message, tokens, voice, temperature, top_k, top_p_drop,
            repetition_penalty)
        seed = _check_seed(seed)
        # stream_synthesize is a plain function returning a generator: it
        # validates window geometry at CALL time without device work, so
        # bad geometry fails HERE (before any HTTP 200 commits) and the
        # rules live in exactly one place (pipeline/streaming.py)
        it = stream_synthesize(
            self.models, tokens=tokens, voice=voice_arr,
            seed=int(seed), compute_dtype=self.compute_dtype,
            int8_weights=self.int8_weights,
            window_frames=int(window_frames),
            overlap_frames=int(overlap_frames),
            vocoder_margin=int(vocoder_margin),
            first_window_frames=first_window_frames,
            sampler_params=sampler)

        def gen():
            with self._lock:
                self._stats["streams"] = self._stats.get("streams", 0) + 1
            while True:
                # device work happens inside next(); the yield below runs
                # with the lock RELEASED, so client backpressure never
                # holds the device hostage.
                with self._device_lock:
                    with self._lock:
                        if self._closed:
                            raise RuntimeError("server stopped")
                    try:
                        chunk = next(it)
                    except StopIteration:
                        break
                yield chunk
            with self._lock:
                self._stats["streams_completed"] = (
                    self._stats.get("streams_completed", 0) + 1)

        return gen()

    def _normalize_request(self, message, tokens, voice, temperature,
                           top_k, top_p_drop, repetition_penalty):
        """Shared submit()/stream() request normalization: resolve and
        validate tokens, voice, and per-request sampler overrides.
        Returns (tokens, voice_arr, sampler)."""
        from tortoise_tpu.pipeline.ar_stage import (
            TEXT_BUCKETS,
            normalize_sampler,
            sampler_overrides,
        )

        sampler = normalize_sampler(sampler_overrides(
            temperature, top_k, top_p_drop, repetition_penalty))
        if tokens is None:
            if message is None:
                raise ValueError("pass message or tokens")
            if self.models.tokenizer is None:
                raise ValueError("models have no tokenizer; pass tokens")
            tokens = self.models.tokenizer.encode_pipeline(message)
        tokens = list(map(int, tokens))
        if not tokens:
            raise ValueError("empty token sequence")
        if len(tokens) > max(TEXT_BUCKETS):
            raise ValueError(
                f"text too long: {len(tokens)} tokens > bucket max "
                f"{max(TEXT_BUCKETS)}")
        v = self.models.ar_cfg.n_text_vocab
        bad = [t for t in tokens if not 0 <= t < v]
        if bad:
            raise ValueError(
                f"text token ids outside vocab [0, {v}): {bad[:5]}")
        voice_arr = (self._load_voice(voice) if voice is not None
                     else self.default_voice)
        if voice_arr is None:
            raise ValueError("no voice given and no default_voice set")
        d = self.models.ar_cfg.d_model
        if voice_arr.shape != (d,):
            raise ValueError(
                f"voice latent must have shape ({d},), got "
                f"{voice_arr.shape}")
        return tokens, voice_arr, sampler

    def stats(self) -> dict:
        with self._lock:
            s = dict(self._stats)
        s["queued"] = self._queue.qsize()
        return s

    def warmup(self, text_len: int = 24, buckets: Optional[Sequence[int]]
               = None, text_lens: Optional[Sequence[int]] = None) -> None:
        """Compile the serving programs before taking traffic: one dummy
        batch per reachable B bucket, for each text length in
        `text_lens` (default: just `text_len`). Reachable = every bucket
        a real batch can pad to, including _bucket(max_batch) when
        max_batch falls between bucket values. Blocks until each batch
        resolves. With the persistent compilation cache on
        (utils/runtime.enable_compilation_cache) later processes load
        the compiled programs instead; without a warmup the first
        request of an unseen (text-bucket, B-bucket) pair pays the full
        remote compile (minutes on a tunneled TPU) inside its latency.
        NOTE: this warms only the text bucket(s) containing the given
        lengths — pass several `text_lens` (one per ar_stage text bucket
        you expect traffic in) for full coverage. Dummy tokens are id 1
        wrapped 255/0, run with the default voice."""
        if self.default_voice is None:
            raise ValueError("warmup needs a default_voice")
        cap = self._bucket(self.max_batch)
        todo = self.batch_buckets if buckets is None else buckets
        for n in (text_lens if text_lens is not None else [text_len]):
            # id 1 / terminal 0 are in-vocab for any model incl. tiny test
            # configs (production wrapping prepends 255, but only the
            # LENGTH matters for the compiled bucket)
            tokens = [1] * (int(n) + 1) + [0]
            for b in todo:
                if b > cap:
                    continue
                # bypass the queue: a direct call compiles exactly the
                # bucket-b program (queued submits could split across
                # admission windows and skip a bucket). The device lock
                # serializes against the worker and live streams, so a
                # warmup issued alongside traffic is safe (just slow).
                with self._device_lock:
                    synthesize_batch(
                        self.models, tokens_list=[list(tokens)] * b,
                        voices=[self.default_voice] * b, seed=0,
                        compute_dtype=self.compute_dtype,
                        int8_weights=self.int8_weights, mesh=self.mesh,
                        materialize=False)

    # -- worker ------------------------------------------------------------

    def _load_voice(self, voice) -> np.ndarray:
        if isinstance(voice, str):
            import os

            path = voice
            if not os.path.exists(path) and self.voice_dir:
                # like the CLI: bare name models/<name>.bin, or a
                # models-relative filename models/<name>
                for cand in (os.path.join(self.voice_dir, voice + ".bin"),
                             os.path.join(self.voice_dir, voice)):
                    if os.path.exists(cand):
                        path = cand
                        break
            return load_voice_latent(path, self.models.ar_cfg.d_model)
        return np.asarray(voice, np.float32)

    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return self.batch_buckets[-1]

    def _collect(self) -> List[_Request]:
        """Block for the first request, then hold the batch open for up to
        max_wait_ms (or until max_batch rows)."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_ms / 1e3
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self) -> None:
        admitted: List[_Request] = []
        try:
            while not self._stop.is_set():
                admitted = self._collect()
                if not admitted:
                    continue
                # the sampler settings are a whole-batch compile/sampling
                # key: split the admission window into one synthesis batch
                # per distinct setting (arrival order preserved within
                # each)
                groups: dict = {}
                for r in admitted:
                    groups.setdefault(r.sampler, []).append(r)
                for sampler, batch in groups.items():
                    self._run_batch(batch, sampler)
                for _ in range(len(admitted)):
                    self._queue.task_done()
                admitted = []
        except BaseException as e:  # worker must never die silently
            # a defect between _collect and the per-batch error isolation
            # (an r4 snapshot shipped exactly that: a misnamed Future
            # method) would otherwise strand every outstanding future in
            # a wait-forever state AND hang stop(drain=True) on
            # _queue.join(). Close the server to new submits FIRST — a
            # client woken by its future failing must not be able to
            # slip a new request into the dead server — then fail the
            # admitted-but-unserved requests and everything still
            # queued, keeping the queue's task accounting balanced.
            with self._lock:
                self._closed = True
            for r in admitted:
                _fail_future(r.future, e)
                self._queue.task_done()
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                _fail_future(req.future, e)
                self._queue.task_done()
            raise

    def _run_batch(self, batch: List[_Request], sampler: tuple) -> None:
        # claim each future before doing device work: a client that
        # timed out and cancel()ed drops out here (set_result on a
        # cancelled future raises InvalidStateError, which would kill
        # the worker thread and hang stop(drain=True) forever)
        batch = [r for r in batch
                 if r.future.set_running_or_notify_cancel()]
        if not batch:
            return
        n = len(batch)
        bucket = self._bucket(n)
        rows = batch + [batch[-1]] * (bucket - n)  # repeat-pad rows
        try:
            with self._device_lock:
                results = synthesize_batch(
                    self.models,
                    tokens_list=[r.tokens for r in rows],
                    voices=[r.voice for r in rows],
                    seed=batch[0].seed,
                    compute_dtype=self.compute_dtype,
                    int8_weights=self.int8_weights,
                    mesh=self.mesh,
                    materialize=False,
                    sampler_params=sampler,
                )
        except Exception as e:  # resolve, don't kill the worker
            for r in batch:
                r.future.set_exception(e)
            with self._lock:
                self._stats["failed_batches"] += 1
        else:
            for r, res in zip(batch, results):  # dummy rows dropped
                r.future.set_result(res)
            with self._lock:
                self._stats["batches"] += 1
                self._stats["rows"] += n
                self._stats["padded_rows"] += bucket - n



# -- HTTP front-end (stdlib only) -----------------------------------------


def make_http_server(server: SynthesisServer, host: str = "127.0.0.1",
                     port: int = 8757):
    """ThreadingHTTPServer wrapping a started SynthesisServer.

    POST /synthesize  {"message": str | "tokens": [int],
                       "voice": path or bare name (needs voice_dir),
                       "seed": int,
                       "temperature"/"top_k"/"top_p_drop"/
                       "repetition_penalty": optional sampler overrides}
                                               -> 200 audio/wav
    POST /stream      same body, plus optional "window_frames" /
                      "overlap_frames" / "first_window_frames" /
                      "vocoder_margin"
                                               -> 200 audio/wav,
                      Transfer-Encoding: chunked — a streaming-WAV
                      header (unknown-length sizes) followed by float32
                      frames as each audio span finalizes; the first
                      chunk arrives at time-to-first-audio, long before
                      the utterance completes
    GET  /healthz                              -> 200 application/json

    Invalid input fails at submit time with 400 (only the offending
    request); a synthesis-side failure surfaces as 500 (or, mid-stream,
    as a truncated chunked body — the only option once the 200 is out).
    `seed` seeds the batch the request lands in (see
    SynthesisServer.submit).
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (the /stream endpoint) requires HTTP/1.1;
        # every non-chunked response already sends Content-Length
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):  # quiet by default
            pass

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if self.close_connection:
                # advertise the close (set for oversized/undrained
                # bodies) so keep-alive clients don't try to reuse a
                # connection the server is about to drop
                self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._json(404, {"error": "not found"})
            self._json(200, {"ok": True, "stats": server.stats()})

        @staticmethod
        def _request_kwargs(req: dict) -> dict:
            """Request fields shared by /synthesize and /stream."""
            return dict(
                message=req.get("message"), tokens=req.get("tokens"),
                voice=req.get("voice"), seed=int(req.get("seed", 0)),
                temperature=req.get("temperature"),
                top_k=req.get("top_k"),
                top_p_drop=req.get("top_p_drop"),
                repetition_penalty=req.get("repetition_penalty"))

        def _chunk(self, payload: bytes) -> None:
            self.wfile.write(f"{len(payload):x}\r\n".encode())
            self.wfile.write(payload)
            self.wfile.write(b"\r\n")

        def _do_stream(self, req: dict) -> None:
            from tortoise_tpu.io.wav import streaming_wav_header

            try:
                # JSON null on first_window_frames maps to the library's
                # None (uniform windows, no small first window); null
                # anywhere else is a clean 400, not an int(None) trace
                def geom(k):
                    v = req[k]
                    if v is None and k == "first_window_frames":
                        return None
                    if not isinstance(v, int) or isinstance(v, bool):
                        raise ValueError(f"{k} must be an integer, "
                                         f"got {v!r}")
                    return v
                kw = {k: geom(k)
                      for k in ("window_frames", "overlap_frames",
                                "first_window_frames", "vocoder_margin")
                      if k in req}
                # validation (tokens/voice/sampler/geometry) runs
                # eagerly, before any device work, so bad input still
                # gets a clean 400
                chunks = server.stream(**self._request_kwargs(req), **kw)
            except RuntimeError as e:  # server stopping: retryable
                return self._json(503, {"error": str(e)})
            except Exception as e:
                return self._json(400, {"error": str(e)})
            # run the AR stage + first diffusion window BEFORE committing
            # the 200: that span is the longest and most failure-prone
            # (compile/OOM), and once the 200 is out a failure can only
            # surface as a truncated body
            it = iter(chunks)
            try:
                first = next(it, None)
            except RuntimeError as e:
                return self._json(503, {"error": str(e)})
            except Exception as e:
                return self._json(500, {"error": str(e)})
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            sr = server.models.vocoder_cfg.sample_rate
            try:
                self._chunk(streaming_wav_header(sr))
                if first is not None:
                    self._chunk(
                        np.asarray(first.audio, np.float32).tobytes())
                    for c in it:
                        self._chunk(
                            np.asarray(c.audio, np.float32).tobytes())
                self._chunk(b"")  # terminating 0-length chunk
            except Exception:
                # the 200 is already on the wire; drop the connection so
                # the client sees a truncated chunked body, not silence
                self.close_connection = True
                raise

        def do_POST(self):
            # read the body FIRST: replying without draining it desyncs
            # HTTP/1.1 keep-alive (the unread bytes would be parsed as
            # the connection's next request line). Bound what we will
            # buffer: requests are small JSON — an adversarial multi-GB
            # Content-Length must not be slurped into RAM just to 404;
            # oversized requests get their reply on a CLOSING connection
            # (no drain needed when keep-alive is abandoned).
            max_body = 16 << 20
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except Exception as e:
                self.close_connection = True
                return self._json(400, {"error": str(e)})
            if length < 0 or length > max_body:
                self.close_connection = True
                return self._json(413, {"error": "request body too large"})
            raw = self.rfile.read(length)
            if self.path not in ("/synthesize", "/stream"):
                return self._json(404, {"error": "not found"})
            try:
                req = json.loads(raw or b"{}")
            except Exception as e:
                return self._json(400, {"error": str(e)})
            if self.path == "/stream":
                return self._do_stream(req)
            try:
                fut = server.submit(**self._request_kwargs(req))
            except RuntimeError as e:  # server stopping: retryable
                return self._json(503, {"error": str(e)})
            except Exception as e:  # this request's input was bad
                return self._json(400, {"error": str(e)})
            try:
                result = fut.result()
            except Exception as e:  # synthesis-side failure: retryable
                return self._json(500, {"error": str(e)})
            body = wav_bytes(result.audio, result.sample_rate)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        description="tortoise_tpu dynamic-batching synthesis server")
    p.add_argument("--models", default="models",
                   help="directory with the GGML model files + tokenizer")
    p.add_argument("--voice", default="mol",
                   help="default voice (name in models dir, or path)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8757)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=50.0)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--f32", dest="bf16", action="store_false")
    p.add_argument("--int8-weights", action="store_true", default=True)
    p.add_argument("--no-int8-weights", dest="int8_weights",
                   action="store_false")
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--warmup", action="store_true",
                   help="compile the batch-bucket programs (for the "
                        "default text bucket) before accepting traffic")
    p.add_argument("--random-weights", action="store_true",
                   help="synthetic weights (the GGML files are not "
                        "redistributable); random default voice")
    p.add_argument("--tiny", action="store_true",
                   help="with --random-weights: tiny test-size models")
    args = p.parse_args(argv)

    import os

    from tortoise_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    if args.random_weights:
        models = TortoiseModels.random(0, tiny=args.tiny)
        voice = np.random.default_rng(0).normal(
            0, 0.5, (models.ar_cfg.d_model,)).astype(np.float32)
    else:
        models = TortoiseModels.from_ggml_dir(args.models, args.cache_dir)
        # bare names / models-relative filenames resolve inside the
        # server's _load_voice (voice_dir=args.models below)
        voice = args.voice
    compute_dtype = None
    if args.bf16:
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
    server = SynthesisServer(
        models, compute_dtype=compute_dtype,
        int8_weights=args.int8_weights and args.bf16,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        default_voice=voice,
        voice_dir=None if args.random_weights else args.models)
    server.start()
    if args.warmup:
        print("warming up (one compile per batch bucket)...", flush=True)
        server.warmup()
    httpd = make_http_server(server, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms)",
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        server.stop()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
