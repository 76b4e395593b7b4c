"""Serving layer: micro-batching worker + HTTP endpoint.

The reference has no serving path; serve/server.py adds one whose
core claim is that concurrent requests fuse into ONE device program
(GestureGenerator.generate_batch). These tests pin that behavior with
tiny untrained models (output quality is irrelevant; shapes/tokens and
the batching accounting are what matter).
"""
import base64
import json
import threading
import urllib.request

import numpy as np
import pytest


HID, REP, K, DIM, NF, SENT = 32, 16, 16, 27, 10, 40


@pytest.fixture(scope="module")
def tiny_gen():
    from bench import build_generator  # repo-root bench.py model builder
    return build_generator(hid=HID, rep=REP, k=K, dim=DIM, n_frames=NF,
                           sent_len=SENT, n_words=50, max_words=8,
                           wordembed=16, vocab_words=20)


def _words(n=4):
    return [[f"word{i}", 0.2 * i, 0.2 * i + 0.15] for i in range(n)]


def test_worker_fuses_concurrent_requests(tiny_gen):
    from gesture2vec_tpu.serve.server import BatchingWorker

    w = BatchingWorker(tiny_gen, max_batch=8, batch_window_s=1.0)
    try:
        results = [None] * 3
        def call(i):
            results[i] = w.submit(_words(), duration_s=2.0)
        ts = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        for frames, tokens in results:
            assert frames.shape == (SENT, DIM)
            assert tokens.shape[-1] >= 1
        # 3 concurrent requests -> one fused device program
        assert w.stats["requests"] == 3
        assert w.stats["batches"] == 1
        assert w.stats["batched_requests"] == 3
        # batched output == single-stream output for the same request
        single, _ = tiny_gen.generate(_words(), 2.0)
        np.testing.assert_allclose(results[0][0], single, atol=1e-5)
    finally:
        w.close()


def test_batched_equals_single_multi_window(tiny_gen):
    """The load-independence guarantee the worker's _batchable relies
    on: generate_batch vmaps the same window-carry program as
    generate(), so a MULTI-window request produces identical tokens and
    frames through both paths."""
    words = [[f"word{i}", 0.3 * i, 0.3 * i + 0.2] for i in range(12)]
    single, stoks = tiny_gen.generate(words, 4.0)     # 2 windows
    (bframes, btoks), = tiny_gen.generate_batch([words], [4.0])
    np.testing.assert_array_equal(stoks, btoks)
    np.testing.assert_allclose(single, bframes, atol=1e-6)


def test_http_generate_json_and_healthz(tiny_gen):
    from gesture2vec_tpu.serve.server import serve

    httpd = serve(tiny_gen, port=0, batch_window_s=0.02)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"words": _words(), "duration_s": 2.0,
                           "format": "json"}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            out = json.loads(r.read())
        frames = np.frombuffer(base64.b64decode(out["frames_b64"]),
                               np.float32).reshape(out["frames_shape"])
        assert frames.shape == (SENT, DIM)
        assert len(out["tokens"]) >= 1

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["requests"] >= 1
        # latency percentiles over completed requests
        assert health["latency_n"] >= 1
        assert 0.0 < health["latency_p50_s"] <= health["latency_p99_s"]

        # bvh without an exporter -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"words": _words(),
                             "format": "bvh"}).encode())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400

        # malformed body -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"{not json")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.worker.close()


class _SlowGen:
    """Deterministic stand-in for overload/cancellation tests."""

    def __init__(self, delay_s=1.0):
        self.delay_s = delay_s

    def _one(self):
        return np.zeros((4, 3), np.float32), np.zeros(2, np.int64)

    def generate(self, words, duration_s):
        import time
        time.sleep(self.delay_s)
        return self._one()

    def generate_batch(self, transcripts, durations_s, mesh=None):
        import time
        time.sleep(self.delay_s)
        return [self._one() for _ in transcripts]


class _GatedGen:
    """Generator whose calls signal entry and block on an explicit
    release event - the backpressure test synchronizes on these instead
    of wall-clock sleeps (this 1-core box has +-50% scheduling drift)."""

    def __init__(self):
        self.entered = threading.Event()
        self.release = threading.Event()

    def _one(self):
        return np.zeros((4, 3), np.float32), np.zeros(2, np.int64)

    def _gate(self):
        self.entered.set()
        assert self.release.wait(30)
        self.release.clear()
        self.entered.clear()

    def generate(self, words, duration_s):
        self._gate()
        return self._one()

    def generate_batch(self, transcripts, durations_s, mesh=None):
        self._gate()
        return [self._one() for _ in transcripts]


def _wait(cond, timeout_s=10.0):
    import time
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return False


def test_worker_backpressure_and_cancellation():
    from gesture2vec_tpu.serve.server import (BatchingWorker,
                                              QueueFullError)

    gen = _GatedGen()
    w = BatchingWorker(gen, max_batch=1, batch_window_s=0.01,
                       queue_depth=1)
    try:
        # occupy the device with one request (worker is inside generate)
        t = threading.Thread(target=lambda: w.submit([], 1.0),
                             daemon=True)
        t.start()
        assert gen.entered.wait(10)
        # ...fill the single queue slot...
        t2 = threading.Thread(target=lambda: w.submit([], 1.0),
                              daemon=True)
        t2.start()
        assert _wait(w._q.full)
        # ...now the queue is full: immediate 429-class rejection
        with pytest.raises(QueueFullError):
            w.submit([], 1.0)
        assert w.stats["rejected"] == 1

        # release request 1; the worker drains request 2 and blocks in
        # generate again (entered set) with the queue empty
        gen.release.set()
        t.join(timeout=10)
        assert gen.entered.wait(10)
        assert _wait(w._q.empty)
        # a submit that times out is marked cancelled and the collector
        # drops it without spending a device program
        with pytest.raises(TimeoutError):
            w.submit([], 1.0, timeout_s=0.05)
        assert w.stats["cancelled"] == 1
        gen.release.set()
        t2.join(timeout=10)
        # the collector's next drain sees only the cancelled entry and
        # skips it: requests stays 2
        assert _wait(lambda: w._q.empty() and w.stats["requests"] == 2)
        assert w.stats["requests"] == 2
    finally:
        gen.release.set()
        w.close()


def test_worker_close_fails_queued_fast():
    from gesture2vec_tpu.serve.server import BatchingWorker

    w = BatchingWorker(_SlowGen(1.0), max_batch=1, batch_window_s=0.01)
    errors = []

    def call():
        try:
            w.submit([], 1.0, timeout_s=30.0)
        except RuntimeError as e:
            errors.append(str(e))

    ts = [threading.Thread(target=call, daemon=True) for _ in range(3)]
    for t in ts:
        t.start()
    import time
    time.sleep(0.3)
    t0 = time.monotonic()
    w.close()
    for t in ts:
        t.join(timeout=10)
    # queued (not-yet-dispatched) submitters failed fast, well under
    # their 30 s timeouts
    assert time.monotonic() - t0 < 10
    assert any("shutting down" in e for e in errors)


def test_batch_bucket():
    from gesture2vec_tpu.serve.server import BatchingWorker
    b = BatchingWorker._bucket
    assert b(2, 16) == 2
    assert b(3, 16) == 4
    assert b(5, 16) == 8
    assert b(9, 16) == 16
    assert b(16, 16) == 16


def test_http_malformed_word_triples(tiny_gen):
    from gesture2vec_tpu.serve.server import serve

    httpd = serve(tiny_gen, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        for bad in ({"words": [["hi", 0.1]]},          # short triple
                    {"words": "abc"},                  # not a list
                    {"words": _words(), "duration_s": None},
                    {"words": _words(), "format": "exr"}):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(bad).encode())
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400, bad
    finally:
        httpd.shutdown()
        httpd.worker.close()


def test_http_bvh_export(tiny_gen):
    from gesture2vec_tpu.serve.server import serve

    httpd = serve(tiny_gen, port=0,
                  export_bvh=lambda frames: f"HIERARCHY\n# {frames.shape}")
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"words": _words(),
                             "duration_s": 2.0}).encode())
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            text = r.read().decode()
        assert text.startswith("HIERARCHY")
    finally:
        httpd.shutdown()
        httpd.worker.close()


def test_decode_mode_rejects_attention_seq_model(tiny_gen):
    """decode mode has no encoder sequence for a Part-b attention
    decoder to read; construction must fail clearly instead of crashing
    inside the first generate()."""
    import dataclasses

    import jax as _jax

    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (
        init_state as sq_init, make_seq_ae)

    cfg = load_config(dict(name="a", model="seq2seq", hidden_size=HID,
                           n_layers=2, dropout_prob=0.1, epochs=1,
                           batch_size=8, rep_learning_dim=REP,
                           n_poses=NF, n_pre_poses=1,
                           autoencoder_vq=True,
                           autoencoder_vq_components=K,
                           autoencoder_att=True, random_seed=0))
    att = make_seq_ae(cfg)
    ast = sq_init(cfg, att, _jax.random.PRNGKey(9), make_optimizer(1e-3))
    with pytest.raises(ValueError, match="attention"):
        dataclasses.replace(
            tiny_gen, seq_model=att,
            seq_variables={"params": ast.params,
                           "batch_stats": ast.batch_stats})


def test_http_stream_endpoint(tiny_gen):
    """POST /stream returns chunked NDJSON: one line per window with
    the motion payload, then a done line; tokens match the non-streamed
    /generate for the same greedy request; healthz counts streams."""
    import base64
    import json
    import threading
    import urllib.request

    from gesture2vec_tpu.serve.server import serve

    httpd = serve(tiny_gen, port=0, batch_window_s=0.02)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"words": _words(8),
                           "duration_s": 4.0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/stream", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            lines = [json.loads(l) for l in r.read().splitlines() if l]
        assert lines[-1] == {"done": True, "windows": 2}  # 4s / 2s unit
        windows = lines[:-1]
        assert [w["window"] for w in windows] == [0, 1]
        frames = [np.frombuffer(base64.b64decode(w["frames_b64"]),
                                np.float32).reshape(w["frames_shape"])
                  for w in windows]
        toks_stream = np.concatenate(
            [np.asarray(w["tokens"]) for w in windows])
        assert all(f.shape == (SENT, DIM) for f in frames)
        assert all(np.isfinite(f).all() for f in frames)

        # greedy /generate on the same transcript gives the same tokens
        gen_req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"words": _words(8), "duration_s": 4.0,
                             "format": "json"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(gen_req, timeout=300) as r:
            out = json.loads(r.read())
        np.testing.assert_array_equal(toks_stream,
                                      np.asarray(out["tokens"]))
        gen_frames = np.frombuffer(
            base64.b64decode(out["frames_b64"]),
            np.float32).reshape(out["frames_shape"])
        np.testing.assert_allclose(np.concatenate(frames, axis=0),
                                   gen_frames, atol=1e-5)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["streams"] == 1
        assert health["stream_windows"] == 2
    finally:
        httpd.shutdown()
        httpd.worker.close()


def test_http_stream_bad_request(tiny_gen):
    import json
    import threading
    import urllib.error
    import urllib.request

    from gesture2vec_tpu.serve.server import serve

    httpd = serve(tiny_gen, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/stream",
            data=json.dumps({"words": "nope"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        httpd.worker.close()


@pytest.fixture(scope="module")
def recipe_gen():
    """Recommended-recipe model shape (4-stage rvq Part b +
    stage-conditional transformer Part d) through the shared bench
    builder — the serving layer must fuse and match on it exactly like
    on the single-stage GRU chain (round-5, VERDICT r4 item 5)."""
    from bench import build_generator
    return build_generator(hid=HID, rep=REP, k=K, dim=DIM, n_frames=NF,
                           sent_len=SENT, n_words=50, max_words=8,
                           wordembed=16, vocab_words=20,
                           token_stages=4, stage_conditional=True,
                           t2t_arch="transformer")


def test_worker_recipe_batched_equals_single(recipe_gen):
    """Concurrent recipe-chain requests fuse into one device program
    and the batched output equals the single-stream output."""
    from gesture2vec_tpu.serve.server import BatchingWorker

    w = BatchingWorker(recipe_gen, max_batch=8, batch_window_s=1.0)
    try:
        results = [None] * 3
        def call(i):
            results[i] = w.submit(_words(), duration_s=2.0)
        ts = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        for frames, tokens in results:
            assert frames.shape == (SENT, DIM)
            assert np.isfinite(frames).all()
        assert w.stats["requests"] == 3
        assert w.stats["batches"] == 1
        single, single_toks = recipe_gen.generate(_words(), 2.0)
        np.testing.assert_allclose(results[0][0], single, atol=1e-5)
        np.testing.assert_array_equal(results[0][1], single_toks)
    finally:
        w.close()


def test_http_recipe_generate(recipe_gen):
    """g2v-serve HTTP surface on the recipe chain: /generate returns
    valid frames; /healthz reports the worker alive."""
    import urllib.error

    from gesture2vec_tpu.serve.server import serve

    httpd = serve(recipe_gen, port=0, max_batch=4, batch_window_s=0.05)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"words": _words(), "duration_s": 2.0,
                           "format": "json"}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body)
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
        assert payload["frames_shape"] == [SENT, DIM]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"]
    finally:
        httpd.shutdown()
        httpd.worker.close()
