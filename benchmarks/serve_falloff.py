"""Profile the large-batch serving falloff (one process, interleaved).

Round 2 measured batched serving at 16 transcripts -> ~19.8k frames/s
but 64 -> ~13.2k and left the cause unexplained (VERDICT r2 weak #2).
This script measures the generate_batch program directly (no HTTP) for
several batch sizes IN ONE PROCESS with interleaved rounds (the only
trustworthy A/B on this box, see CLAUDE.md measurement discipline), and
reports:
  - aggregate frames/s per batch size,
  - per-request effective latency (batch wall time - every request in a
    fused batch waits for the whole program),
  - whether splitting 64 into 4 sequential 16-batches beats one fused
    64-batch (if yes, the falloff is program-scaling, not dispatch),
  - device memory in use after each program (VMEM/HBM spill check).

Run on TPU:  python benchmarks/serve_falloff.py [--duration 60]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import _words as words_for  # noqa: E402
from bench import build_generator  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--sizes", default="8,16,32,64")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import jax
    dev = jax.devices()[0]
    print("backend:", dev.platform)

    gen = build_generator()
    transcripts = {B: [words_for(args.duration, seed=i) for i in range(B)]
                   for B in sizes}

    def run(B):
        res = gen.generate_batch(transcripts[B],
                                 [args.duration] * len(transcripts[B]))
        return sum(r[0].shape[0] for r in res)

    # compile every size first so measured rounds are all warm
    frames = {B: run(B) for B in sizes}
    mem = {}
    for B in sizes:
        run(B)
        try:
            st = dev.memory_stats()
            mem[B] = st.get("bytes_in_use", 0) / 2**20
        except Exception:
            mem[B] = float("nan")

    # interleaved rounds: each round touches every size, best-of kept
    best = {B: float("inf") for B in sizes}
    split_best = float("inf")
    for _ in range(args.rounds):
        for B in sizes:
            t0 = time.perf_counter()
            run(B)
            best[B] = min(best[B], time.perf_counter() - t0)
        if 64 in sizes and 16 in sizes:
            # 64 requests as 4 sequential fused 16-batches
            t0 = time.perf_counter()
            for k in range(4):
                gen.generate_batch(transcripts[64][k * 16:(k + 1) * 16],
                                   [args.duration] * 16)
            split_best = min(split_best, time.perf_counter() - t0)

    print(f"\n{'B':>4} {'frames/s':>12} {'ms/request':>12} "
          f"{'frames':>9} {'mem MiB':>9}")
    for B in sizes:
        fps = frames[B] / best[B]
        print(f"{B:>4} {fps:>12,.0f} {best[B] / B * 1e3:>12.1f} "
              f"{frames[B]:>9} {mem[B]:>9.0f}")
    if split_best < float("inf"):
        fps = frames[64] / split_best
        print(f"4x16 {fps:>12,.0f} {split_best / 64 * 1e3:>12.1f} "
              f"{frames[64]:>9}   (64 requests, 4 sequential "
              f"16-batches)")


if __name__ == "__main__":
    main()
