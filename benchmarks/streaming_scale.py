"""Streaming-vs-materialized data path at ~10x the synthetic scale.

VERDICT r2 #8: the array path (data/datasets.py) assumes the corpus
fits in RAM. This benchmark builds a ClipStore ~10x the quality-run
corpus (configurable), then measures:
  - window throughput of the streaming iterator (StreamingWindows,
    bounded RAM) vs the materialized pose_windows path,
  - peak RSS delta of each path (the point: streaming stays flat).

CPU-only host work - safe to run anywhere:
    python benchmarks/streaming_scale.py [--clips 100] [--frames 6000]
"""
from __future__ import annotations

import argparse
import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from gesture2vec_tpu.data.datasets import pose_windows  # noqa: E402
from gesture2vec_tpu.data.store import (ClipStore,  # noqa: E402
                                        ClipStoreWriter)
from gesture2vec_tpu.data.streaming import StreamingWindows  # noqa: E402


def rss_mib() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clips", type=int, default=100)
    ap.add_argument("--frames", type=int, default=6000)
    ap.add_argument("--dim", type=int, default=135)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="g2v_stream_")
    rng = np.random.default_rng(0)
    w = ClipStoreWriter(tmp)
    t0 = time.perf_counter()
    for i in range(args.clips):
        w.add_clip(f"c{i}", rng.normal(
            size=(args.frames, args.dim)).astype(np.float32))
    w.set_stats(np.zeros(args.dim), np.ones(args.dim))
    w.finish()
    build_dt = time.perf_counter() - t0
    total = args.clips * args.frames
    gib = total * args.dim * 2 / 2**30
    print(f"store: {args.clips} clips x {args.frames} frames x "
          f"{args.dim}d = {total:,} frames ({gib:.2f} GiB f16 on disk), "
          f"built in {build_dt:.1f}s")

    store = ClipStore(tmp)
    rss0 = rss_mib()

    # streaming epoch
    src = StreamingWindows(store, 20, 10, shuffle_rows=4096, seed=0)
    t0 = time.perf_counter()
    n_wins = sum(b.shape[0] for b in src.batches(0, args.batch))
    stream_dt = time.perf_counter() - t0
    rss_stream = rss_mib()
    print(f"streaming:    {n_wins:,} windows in {stream_dt:.1f}s = "
          f"{n_wins / stream_dt:,.0f} windows/s  "
          f"(peak RSS +{rss_stream - rss0:.0f} MiB)")

    # materialized epoch (the array path)
    t0 = time.perf_counter()
    arr = pose_windows(store, 20, 10)
    n_batches = arr.shape[0] // args.batch
    perm = np.random.default_rng(0).permutation(arr.shape[0])
    n_mat = sum(arr[perm[b * args.batch:(b + 1) * args.batch]].shape[0]
                for b in range(n_batches))
    mat_dt = time.perf_counter() - t0
    rss_mat = rss_mib()
    print(f"materialized: {n_mat:,} windows in {mat_dt:.1f}s = "
          f"{n_mat / mat_dt:,.0f} windows/s  "
          f"(peak RSS +{rss_mat - rss_stream:.0f} MiB over streaming; "
          f"array alone = {arr.nbytes / 2**20:.0f} MiB)")

    import shutil
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
