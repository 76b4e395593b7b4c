"""Concurrent streaming capacity: continuous batching vs per-session
dispatch.

One live stream costs ~2 device round-trips per ~6 s window
(benchmarks/streaming_infer.py: 67 ms p50 = ~90x real-time), i.e. a
single session leaves the chip ~99% idle. The question for serving is
capacity: how many concurrent streams can one chip sustain, and what
does fusing their due window steps into ONE vmapped program
(infer/streaming.StreamStepBatcher — the /generate micro-batching lever
applied to live sessions) buy over dispatching each session's B=1 step
separately?

Methodology (CLAUDE.md): both configurations measured in ONE process,
interleaved per concurrency level; warm-up rounds compile every bucket
before timing; per-window sync by fetching the frames (block_until_
ready returns early on this platform); free-running sessions (no
real-time pacing), so the aggregate number is capacity, and the
per-window latency under saturation includes queueing.

    python benchmarks/streaming_concurrency.py [--sessions 1 4 8 16]
        [--steps 12] [--platform cpu]
"""
from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def drive_sessions(gen, step, n_sessions, n_steps, words, unit):
    """Run n_sessions free-running streams of n_steps windows each
    through `step`; returns (wall_s, per-window latencies)."""
    from gesture2vec_tpu.infer.streaming import StreamingGestureSession

    lats = []
    lock = threading.Lock()
    barrier = threading.Barrier(n_sessions)

    def run_one():
        sess = StreamingGestureSession(gen, step=step)
        sess.push(words, now_s=0.0)
        barrier.wait()
        mine = []
        for w in range(1, n_steps + 1):
            t0 = time.perf_counter()
            out = sess.push(words, now_s=w * unit)
            for frames, _ in out:
                np.asarray(frames)            # hard sync
            mine.append(time.perf_counter() - t0)
        with lock:
            lats.extend(mine)

    threads = [threading.Thread(target=run_one)
               for _ in range(n_sessions)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0, np.asarray(lats)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sessions", type=int, nargs="+",
                    default=[1, 4, 8, 16])
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch-window-ms", type=float, default=10.0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _words, build_generator

    from gesture2vec_tpu.infer.streaming import (StreamStepBatcher,
                                                 build_streaming_step)

    print("backend:", jax.devices()[0].platform)
    gen = build_generator(mode="decode")
    unit = gen.sentence_frame_length / gen.fps
    words = _words((args.steps + 2) * unit)
    frames_per_window = gen.sentence_frame_length

    n_max = max(args.sessions)
    plain_step = build_streaming_step(gen)
    batcher = StreamStepBatcher(gen, max_batch=n_max,
                                window_s=args.batch_window_ms / 1000.0)

    # warm-up: compile the plain step and EVERY bucket the sweep can
    # hit. Driving sessions is not enough - fused batch sizes drift as
    # sessions desynchronize, so a bucket can first form mid-
    # measurement and pollute that row with its compile. Compile each
    # bucket program directly on synthetic rows instead.
    print("warm-up (compiles)...")
    drive_sessions(gen, plain_step, 1, 2, words, unit)
    row = (jnp.zeros((gen.max_words,), jnp.int32),
           jnp.asarray(np.int32(1)),
           jnp.zeros((gen.n_steps,), jnp.int32),
           jnp.zeros((gen.seq_model.rep_dim,), jnp.float32),
           jax.random.PRNGKey(0))
    b = 1
    buckets = set()
    while b <= n_max:
        buckets.add(b)
        b *= 2
    buckets.add(n_max)
    for b in sorted(buckets):
        if b == 1:
            continue
        outs = batcher._vstep(b)(tuple([row] * b))
        np.asarray(outs[0])                      # sync the compile
        print(f"  bucket {b} compiled")

    rows = []
    for n in args.sessions:
        # interleaved A/B at each concurrency level
        wall_p, lat_p = drive_sessions(gen, plain_step, n, args.steps,
                                       words, unit)
        wall_b, lat_b = drive_sessions(gen, batcher.step, n, args.steps,
                                       words, unit)
        total_windows = n * args.steps
        row = {
            "sessions": n,
            "per_session_dispatch": {
                "windows_per_s": round(total_windows / wall_p, 1),
                "frames_per_s": round(total_windows
                                      * frames_per_window / wall_p),
                "latency_p50_ms": round(
                    float(np.percentile(lat_p, 50)) * 1e3, 1)},
            "continuous_batching": {
                "windows_per_s": round(total_windows / wall_b, 1),
                "frames_per_s": round(total_windows
                                      * frames_per_window / wall_b),
                "latency_p50_ms": round(
                    float(np.percentile(lat_b, 50)) * 1e3, 1)},
        }
        row["speedup"] = round(
            row["continuous_batching"]["windows_per_s"]
            / row["per_session_dispatch"]["windows_per_s"], 2)
        rows.append(row)
        print(json.dumps(row))

    print(json.dumps({"batcher_stats": batcher.stats,
                      "window_s": unit, "steps": args.steps,
                      "batch_window_ms": args.batch_window_ms}))
    batcher.close()


if __name__ == "__main__":
    main()
