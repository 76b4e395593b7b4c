"""Benchmark: the HTTP serving layer under concurrent load (TPU).

Measures aggregate frames/s through the FULL serving stack (HTTP +
micro-batching queue + generate_batch) for N concurrent 60 s-transcript
requests, vs the same requests issued sequentially. The point is to
show the batching collector actually delivers the generate_batch
aggregate numbers (benchmarks/README.md "Batched serving") once HTTP
and queueing overhead are included.

    python benchmarks/serve_bench.py [--clients 16] [--duration 60]
"""
from __future__ import annotations

import argparse
import base64
import json
import threading
import time
import urllib.request

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import build_generator  # noqa: E402  (shared model builder)


from bench import _words as words_for  # noqa: E402  (shared workload)


def fire(port, words, duration_s, out, lats=None):
    """Appends the frame count on success, or raises - callers assert
    len(out) afterwards so a failed/timed-out request cannot silently
    deflate the reported frames/s. lats (optional list) collects the
    client-observed request latency in seconds."""
    body = json.dumps({"words": words, "duration_s": duration_s,
                       "format": "json"}).encode()
    req = urllib.request.Request(f"http://127.0.0.1:{port}/generate",
                                 data=body)
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=600) as r:
        payload = json.loads(r.read())
    if lats is not None:
        lats.append(time.perf_counter() - t0)
    out.append(int(payload["frames_shape"][0]))


from gesture2vec_tpu.serve.server import nearest_rank as pctl


def run_concurrent(port, all_words, duration):
    out, lats = [], []
    threads = [threading.Thread(target=fire,
                                args=(port, w, duration, out, lats))
               for w in all_words]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    assert len(out) == len(all_words)
    return sum(out), dt, lats


def window_sweep(gen, all_words, duration, windows_ms):
    """Latency/throughput curve over the batch window - the
    micro-batching tradeoff surface. One generator (compiled programs
    shared), a fresh worker+server per window setting."""
    from gesture2vec_tpu.serve.server import serve

    print(f"\nbatch-window sweep ({len(all_words)} clients, "
          f"{duration:.0f}s transcripts):")
    print(f"{'window':>8} {'frames/s':>10} {'p50 s':>7} {'p99 s':>7}")
    for w_ms in windows_ms:
        httpd = serve(gen, port=0, max_batch=len(all_words),
                      batch_window_s=w_ms / 1000.0,
                      request_timeout_s=560.0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        frames, dt, lats = run_concurrent(port, all_words, duration)
        print(f"{w_ms:>6.0f}ms {frames / dt:>10,.0f} "
              f"{pctl(lats, 0.5):>7.3f} {pctl(lats, 0.99):>7.3f}")
        httpd.shutdown()
        httpd.worker.close()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--window-ms", type=float, default=100.0)
    ap.add_argument("--sweep", action="store_true",
                    help="also sweep the batch window (10/50/100/200 ms)"
                         " for the latency/throughput curve")
    ap.add_argument("--recipe", action="store_true",
                    help="serve the recommended-recipe model shape "
                         "(4-stage rvq Part b + stage-conditional "
                         "transformer Part d, configs/"
                         "seq2seqtxt_recommended.yml) instead of the "
                         "single-stage GRU chain")
    args = ap.parse_args()

    from gesture2vec_tpu.serve.server import serve

    gen = build_generator(**(dict(token_stages=4,
                                  stage_conditional=True,
                                  t2t_arch="transformer")
                             if args.recipe else {}))
    httpd = serve(gen, port=0, max_batch=args.clients,
                  batch_window_s=args.window_ms / 1000.0,
                  request_timeout_s=560.0)  # covers cold-start compiles
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    all_words = [words_for(args.duration, seed=i)
                 for i in range(args.clients)]

    # warmup: compile the single-stream program and the full-bucket
    # batched program (the measured concurrent run reuses both)
    out = []
    fire(port, all_words[0], args.duration, out)
    ts = [threading.Thread(target=fire,
                           args=(port, all_words[i], args.duration, out))
          for i in range(args.clients)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()

    # sequential reference
    out = []
    t0 = time.perf_counter()
    for i in range(args.clients):
        fire(port, all_words[i], args.duration, out)
    seq_dt = time.perf_counter() - t0
    assert len(out) == args.clients, \
        f"sequential phase lost requests ({len(out)}/{args.clients})"
    seq_frames = sum(out)

    # concurrent: one fused device program per collected batch
    out, lats = [], []
    threads = [threading.Thread(target=fire, args=(port, all_words[i],
                                                   args.duration, out,
                                                   lats))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc_dt = time.perf_counter() - t0
    assert len(out) == args.clients, \
        f"concurrent phase lost requests ({len(out)}/{args.clients})"
    conc_frames = sum(out)

    stats = httpd.worker.stats
    srv_lat = httpd.worker.latency_stats()
    shape = "recipe (rvq4 + stage-conditional transformer)" \
        if args.recipe else "single-stage GRU"
    print(f"serving bench ({args.clients} clients, "
          f"{args.duration:.0f}s transcripts, decode mode, {shape}):")
    print(f"  sequential: {seq_frames} frames in {seq_dt:.2f}s = "
          f"{seq_frames / seq_dt:,.0f} frames/s")
    print(f"  concurrent: {conc_frames} frames in {conc_dt:.2f}s = "
          f"{conc_frames / conc_dt:,.0f} frames/s "
          f"({seq_dt / conc_dt:.2f}x)")
    print(f"  concurrent request latency (client-observed): "
          f"p50 {pctl(lats, 0.5):.3f}s  p99 {pctl(lats, 0.99):.3f}s  "
          f"min {min(lats):.3f}s  max {max(lats):.3f}s")
    print(f"  worker stats: {stats}  server-side latency: {srv_lat}")
    httpd.shutdown()
    httpd.worker.close()

    if args.sweep:
        window_sweep(gen, all_words, args.duration,
                     (10.0, 50.0, 100.0, 200.0))


if __name__ == "__main__":
    main()
