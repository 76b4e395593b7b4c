"""HTTP serving endpoint with transparent micro-batching.

The reference has no serving story — one transcript per Python process
(ref: inference_text2embedding.py:837-951). On a TPU chip the lever for
short-request throughput is fusing concurrent requests into ONE device
program: single-stream 60 s transcripts measure ~7.2k frames/s while a
16-transcript batch reaches ~19.8k aggregate on the same chip
(benchmarks/README.md "Batched serving"). This module provides that as
a server: requests queue for up to `batch_window_ms`, the collector
drains up to `max_batch` of them, and one GestureGenerator.generate /
generate_batch call serves the whole group.

Endpoints (stdlib http.server, thread-per-connection):
  GET  /healthz   -> JSON {ok, requests, batches, batched_requests}
  POST /generate  -> request JSON:
                       {"words": [[word, start_s, end_s], ...],
                        "duration_s": <float, optional>,
                        "format": "bvh" | "json"}
                     response: BVH text (format=bvh, default when an
                     exporter is configured) or JSON with the motion
                     array and gesture tokens.
  POST /stream    -> same request JSON (format is always json);
                     chunked NDJSON response: one line per completed
                     ~6 s window as soon as its motion is ready
                     ({"window", "t0_s", "t1_s", "frames_shape",
                     "frames_b64", "dtype", "tokens"}), then a final
                     {"done": true, "windows": N} line. Streaming
                     requests bypass the transcript micro-batcher; all
                     sessions share ONE compiled per-window program
                     (infer/streaming.py) and JAX async dispatch
                     pipelines their B=1 steps (measured: 160-190
                     windows/s aggregate from 16-64 concurrent
                     streams, benchmarks/streaming_concurrency.py).
                     --stream-batch N > 1 opts into continuous
                     batching (StreamStepBatcher) for deployments
                     where the chip is compute-saturated; at this
                     model scale it measured slower, so the default
                     is per-session dispatch.
"""
from __future__ import annotations

import base64
import json
import logging
import queue
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np


def nearest_rank(values: List[float], q: float) -> float:
    """Nearest-rank percentile over a list (q in [0, 1]). The single
    definition used by both the server's /healthz latency stats and
    benchmarks/serve_bench.py, so server- and client-side p50/p99 in
    one report are always computed identically."""
    s = sorted(values)
    return s[min(int(q * (len(s) - 1) + 0.5), len(s) - 1)]


@dataclass
class _Pending:
    words: List[List]
    duration_s: float
    done: threading.Event = field(default_factory=threading.Event)
    cancelled: threading.Event = field(default_factory=threading.Event)
    result: Optional[Tuple[np.ndarray, np.ndarray]] = None
    error: Optional[str] = None


class QueueFullError(Exception):
    """Backpressure: the pending queue is at capacity (HTTP 429)."""


class BatchingWorker:
    """Collects concurrent generation requests into one device program.

    The collector thread blocks for the first request, then waits up to
    batch_window_s for more (bounded by max_batch) before dispatching.
    A single waiting request skips generate_batch and runs the
    single-stream path (identical output, one less vmap).

    Backpressure: the queue is bounded at 4*max_batch — submit raises
    QueueFullError immediately when full (the caller maps it to 429)
    instead of growing memory under overload. A submit that times out
    marks its request cancelled so the collector drops it instead of
    spending a device program on a client that already gave up.
    """

    LATENCY_WINDOW = 1024   # last-N reservoir for p50/p99

    # Default fused-batch cap, set from measurement
    # (benchmarks/serve_falloff.py, interleaved on the v5e): aggregate
    # frames/s peaks at B=16-32 (35.1k/35.8k) and FALLS at B=64
    # (30.1k), while the same 64 requests as 4 sequential 16-batches
    # reach 34.1k - the falloff is single-program scaling, so the
    # collector should cap fusion near the peak and let bigger loads
    # drain as successive batches.
    DEFAULT_MAX_BATCH = 32

    def __init__(self, generator, max_batch: int = DEFAULT_MAX_BATCH,
                 batch_window_s: float = 0.05, mesh=None,
                 queue_depth: Optional[int] = None):
        self.generator = generator
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        self.mesh = mesh
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0,
                      "cancelled": 0, "rejected": 0, "streams": 0,
                      "stream_windows": 0}
        from collections import deque
        self._latencies: "deque[float]" = deque(maxlen=self.LATENCY_WINDOW)
        self._lat_lock = threading.Lock()
        self._q: "queue.Queue[_Pending]" = queue.Queue(
            maxsize=queue_depth or 4 * max_batch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def latency_stats(self) -> Dict[str, float]:
        """p50/p99 end-to-end request latency (enqueue -> result ready,
        seconds) over the last LATENCY_WINDOW completed requests — the
        micro-batching tradeoff surface (batch window vs tail latency)."""
        with self._lat_lock:
            lats = list(self._latencies)
        if not lats:
            return {"latency_n": 0}
        return {"latency_n": len(lats),
                "latency_p50_s": round(nearest_rank(lats, 0.50), 4),
                "latency_p99_s": round(nearest_rank(lats, 0.99), 4)}

    def submit(self, words: List[List], duration_s: float,
               timeout_s: float = 120.0) -> Tuple[np.ndarray, np.ndarray]:
        import time
        if self._stop.is_set():
            raise RuntimeError("server shutting down")
        req = _Pending(words=words, duration_s=duration_s)
        t0 = time.monotonic()
        try:
            self._q.put_nowait(req)
        except queue.Full:
            self.stats["rejected"] += 1
            raise QueueFullError("pending queue full") from None
        if self._stop.is_set() and not req.done.is_set():
            # shutdown raced our enqueue past close()'s queue drain; the
            # collector is gone, so fail fast instead of blocking out
            # the full timeout (idempotent with the drain/collector -
            # worst case a completed result is reported as shutdown)
            req.error = req.error or "server shutting down"
            req.done.set()
        if not req.done.wait(timeout_s):
            req.cancelled.set()
            self.stats["cancelled"] += 1
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        with self._lat_lock:
            self._latencies.append(time.monotonic() - t0)
        return req.result

    def close(self) -> None:
        """Stop the collector and fail any still-queued requests fast
        (their submitters would otherwise block out their full
        timeout)."""
        self._stop.set()
        self._thread.join(timeout=5)
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            req.error = "server shutting down"
            req.done.set()
        sp = getattr(self, "stream_programs", None)
        if sp is not None:
            sp.close()

    # ------------------------------------------------------------ internal
    def _drain(self, first: _Pending) -> List[_Pending]:
        batch = [first]
        deadline = self.batch_window_s
        import time
        t0 = time.monotonic()
        while len(batch) < self.max_batch:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return [r for r in batch if not r.cancelled.is_set()]

    @staticmethod
    def _bucket(n: int, cap: int) -> int:
        """Pad the batch axis to a power of two (capped): generate_batch
        is jitted per batch size, so raw drained sizes 2,3,5,7... would
        each trigger a fresh XLA compile — slow over the tunnel. Window
        counts are already bucketed inside generate_batch; this closes
        the batch axis the same way."""
        return min(1 << (n - 1).bit_length(), cap)

    def _batchable(self, req: _Pending) -> bool:
        """Fused and single-stream decode are bit-identical for the
        default generator (generate_batch vmaps the same window-carry
        program; pinned by tests/test_serve.py), so a request's output
        never depends on concurrent server load. The only divergent
        configs are the single-path-only decoder variants — with those
        enabled every request runs single-stream to keep outputs
        load-independent. (Exemplar mode's retrieval is random by
        reference semantics — inference_text2embedding.py:606-612 uses
        random.randint — so exemplar choice varies run to run in any
        serving configuration; token sequences remain deterministic.)"""
        g = self.generator
        return not (getattr(g, "chunk_continuity", False)
                    or getattr(g, "use_fused_decoder", False))

    def _dispatch(self, batch: List[_Pending]) -> None:
        self.stats["batches"] += 1
        try:
            if len(batch) == 1:
                batch[0].result = self.generator.generate(
                    batch[0].words, batch[0].duration_s)
            else:
                self.stats["batched_requests"] += len(batch)
                n_pad = self._bucket(len(batch), self.max_batch)
                reqs = list(batch) + [batch[-1]] * (n_pad - len(batch))
                results = self.generator.generate_batch(
                    [r.words for r in reqs],
                    [r.duration_s for r in reqs], mesh=self.mesh)
                for r, res in zip(batch, results):
                    r.result = res
        except Exception as e:  # surface per-request, keep serving
            logging.exception("generation batch failed")
            for r in batch:
                r.error = f"{type(e).__name__}: {e}"
        for r in batch:
            r.done.set()

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            batch = self._drain(first)
            if not batch:
                continue
            self.stats["requests"] += len(batch)
            fuse, solo = [], []
            for r in batch:
                (fuse if self._batchable(r) else solo).append(r)
            if len(fuse) > 1:
                self._dispatch(fuse)
            else:
                solo = fuse + solo
            for r in solo:
                self._dispatch([r])


class _StreamPrograms:
    """Lazy, locked holder for the shared streaming step: built once on
    the first /stream request (jax.jit caches by function identity, so
    per-request builds would recompile every stream).

    batch_max > 1 opts decode-mode generators into a StreamStepBatcher
    (continuous batching): due window steps from concurrent streams
    fuse into one vmapped device program. Measured on this chip to be
    SLOWER than letting async dispatch pipeline the B=1 steps
    (benchmarks/streaming_concurrency.py), so the server default is 1;
    exemplar mode (host retrieval mid-step) always uses the plain
    shared step."""

    def __init__(self, generator, batch_max: int = 16,
                 batch_window_s: float = 0.01):
        self._generator = generator
        self._batch_max = batch_max
        self._batch_window_s = batch_window_s
        self._lock = threading.Lock()
        self._step = None
        self.batcher = None

    def get(self):
        with self._lock:
            if self._step is None:
                from gesture2vec_tpu.infer.streaming import (
                    StreamStepBatcher, build_streaming_step)
                if (self._generator.mode == "decode"
                        and self._batch_max > 1):
                    self.batcher = StreamStepBatcher(
                        self._generator, max_batch=self._batch_max,
                        window_s=self._batch_window_s)
                    self._step = self.batcher.step
                else:
                    self._step = build_streaming_step(self._generator)
            return self._step

    def close(self) -> None:
        with self._lock:
            if self.batcher is not None:
                self.batcher.close()


def make_handler(worker: BatchingWorker,
                 export_bvh: Optional[Callable[[np.ndarray], str]] = None,
                 request_timeout_s: float = 120.0,
                 stream_batch: int = 1,
                 stream_batch_window_s: float = 0.01):
    """export_bvh: frames -> BVH text (None disables format=bvh).
    request_timeout_s bounds the wait for generation (incl. the first
    requests' XLA compile, which can dominate on a cold server).
    stream_batch/stream_batch_window_s configure continuous batching of
    concurrent /stream sessions (decode mode; stream_batch<=1 = the
    measured default: per-session dispatch, see _StreamPrograms)."""

    stream_programs = _StreamPrograms(
        worker.generator, batch_max=stream_batch,
        batch_window_s=stream_batch_window_s)
    worker.stream_programs = stream_programs  # stats + close

    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (used by /stream) requires HTTP/1.1; every
        # non-chunked response already sends Content-Length
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through logging
            logging.debug("serve: " + fmt, *args)

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj: Dict[str, Any]) -> None:
            self._send(code, json.dumps(obj).encode(),
                       "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                sb = stream_programs.batcher
                extra = ({"stream_batches": sb.stats["batches"],
                          "stream_batched_calls":
                              sb.stats["batched_calls"]}
                         if sb is not None else {})
                self._send_json(200, {"ok": True, **worker.stats,
                                      **worker.latency_stats(), **extra})
            else:
                self._send_json(404, {"error": "not found"})

        def _write_chunk(self, data: bytes) -> None:
            self.wfile.write(f"{len(data):X}\r\n".encode() + data
                             + b"\r\n")

        def _parse_words(self):
            """Shared request parsing for /generate and /stream;
            sends the 400 itself and returns None on bad input."""
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                words = payload["words"]
                if not isinstance(words, list) or not all(
                        isinstance(w, (list, tuple)) and len(w) >= 3
                        for w in words):
                    raise ValueError(
                        "words must be a list of [word, start_s, end_s]")
                words = [[str(w[0]), float(w[1]), float(w[2])]
                         for w in words]
                duration = float(payload.get(
                    "duration_s", words[-1][2] if words else 6.0))
                return words, duration, payload
            except (KeyError, ValueError, TypeError, IndexError,
                    json.JSONDecodeError) as e:
                self._send_json(400, {"error": f"bad request: {e}"})
                return None

        def _post_stream(self):
            parsed = self._parse_words()
            if parsed is None:
                return
            words, duration, _ = parsed
            from gesture2vec_tpu.infer.streaming import \
                StreamingGestureSession
            sess = StreamingGestureSession(worker.generator,
                                           step=stream_programs.get())
            worker.stats["streams"] += 1
            unit = sess.unit
            n_windows = max(int(np.ceil(duration / unit)), 1)
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            sess.push(words, now_s=0.0)       # register the transcript
            try:
                for w in range(n_windows):
                    frames, tokens = sess.finish((w + 1) * unit)[0]
                    line = json.dumps({
                        "window": w, "t0_s": w * unit,
                        "t1_s": (w + 1) * unit,
                        "frames_shape": list(frames.shape),
                        "frames_b64": base64.b64encode(
                            np.asarray(frames, np.float32)
                            .tobytes()).decode(),
                        "dtype": "float32",
                        "tokens": np.asarray(tokens).reshape(-1)
                        .tolist()})
                    self._write_chunk(line.encode() + b"\n")
                    worker.stats["stream_windows"] += 1
                self._write_chunk(json.dumps(
                    {"done": True, "windows": n_windows}).encode()
                    + b"\n")
            except Exception as e:  # mid-stream failure: emit an error
                logging.exception("stream failed")  # line, then close
                self._write_chunk(json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode()
                    + b"\n")
            self.wfile.write(b"0\r\n\r\n")

        def do_POST(self):
            if self.path == "/stream":
                self._post_stream()
                return
            if self.path != "/generate":
                self._send_json(404, {"error": "not found"})
                return
            # every malformed-input shape maps to a 400, not a dropped
            # socket (_parse_words); format checks follow the same rule
            parsed = self._parse_words()
            if parsed is None:
                return
            words, duration, payload = parsed
            fmt = payload.get("format", "bvh" if export_bvh else "json")
            if fmt not in ("bvh", "json"):
                self._send_json(400,
                                {"error": f"bad request: unknown format "
                                          f"{fmt!r}"})
                return
            # reject before spending a device program on a request
            # that cannot be answered
            if fmt == "bvh" and export_bvh is None:
                self._send_json(400, {"error": "no exporter configured"})
                return
            try:
                frames, tokens = worker.submit(
                    words, duration, timeout_s=request_timeout_s)
            except QueueFullError:
                self._send_json(429, {"error": "server overloaded"})
                return
            except TimeoutError:
                self._send_json(503, {"error": "generation timed out"})
                return
            except RuntimeError as e:
                self._send_json(500, {"error": str(e)})
                return
            if fmt == "bvh":
                try:
                    body = export_bvh(frames).encode()
                except Exception as e:  # exporter failure -> 500, not a
                    logging.exception("BVH export failed")  # closed socket
                    self._send_json(500, {"error": f"export failed: {e}"})
                    return
                self._send(200, body, "text/plain")
            else:
                self._send_json(200, {
                    "frames_shape": list(frames.shape),
                    "frames_b64": base64.b64encode(
                        np.asarray(frames, np.float32).tobytes()).decode(),
                    "dtype": "float32",
                    "tokens": np.asarray(tokens).reshape(-1).tolist(),
                })

    return Handler


def serve(generator, host: str = "127.0.0.1", port: int = 8008,
          export_bvh: Optional[Callable[[np.ndarray], str]] = None,
          max_batch: int = BatchingWorker.DEFAULT_MAX_BATCH,
          batch_window_s: float = 0.05,
          mesh=None,
          request_timeout_s: float = 120.0,
          stream_batch: int = 1,
          stream_batch_window_s: float = 0.01) -> ThreadingHTTPServer:
    """Build and return the server (caller runs serve_forever())."""
    # bind first: an EADDRINUSE must not leak a running collector thread
    httpd = ThreadingHTTPServer((host, port), BaseHTTPRequestHandler)
    worker = BatchingWorker(generator, max_batch=max_batch,
                            batch_window_s=batch_window_s, mesh=mesh)
    httpd.RequestHandlerClass = make_handler(
        worker, export_bvh, request_timeout_s,
        stream_batch=stream_batch,
        stream_batch_window_s=stream_batch_window_s)
    httpd.worker = worker  # for stats/close
    return httpd
