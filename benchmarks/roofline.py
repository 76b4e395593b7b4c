"""Inference-path roofline: judge bench.py's frames/s headline against
chip capability (round-4, VERDICT item 7).

Decomposes the production decode path (bench.py shapes: H=200, K=512,
L=2, 20-frame chunks, 120-frame windows, 30-min transcript) into:

  1. analytic model FLOPs (utils/flops: text2token_forward_flops per
     window + e2e_decode_flops per token) -> MFU vs the v5e bf16 peak;
  2. the measured per-call tunnel dispatch floor (p50 round-trip of a
     trivial jitted program) and its share of the generation wall;
  3. a fixed-vs-scalable split from two transcript lengths (the
     marginal cost of extra frames vs the per-generation fixed cost);
  4. the window_carry=False batched-window variant — all windows in
     one device call with zero seeds — as the throughput-ceiling row.

XLA's cost_analysis is NOT used as the denominator: it counts a scan
body once regardless of trip count (tests/test_flops.py pins the
analytic counts instead — CLAUDE.md measurement discipline).

Run on the TPU (numbers drift +-50% with ambient load; every row here
is measured in ONE process, interleaved by best-of-rounds):
    python benchmarks/roofline.py
Writes benchmarks README rows + roofline.json next to this file.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import (DURATION_S, FPS, HID, K, L, MAXW, N_FRAMES,  # noqa: E402
                   SENT_LEN, build_generator, _words, best_of_rounds)

ITERS = 3


def measure_dispatch_floor():
    """p50 round-trip of a trivial jitted program through the tunnel:
    the per-device-call floor no model change can beat.

    Synced by VALUE FETCH, not block_until_ready: measured on this
    tunnel, block_until_ready on a fresh trivial program returns in
    ~0.0 ms (completion is signaled without a host round-trip), while
    the np.asarray fetch — which is how the generation path actually
    consumes frames — pays the documented ~30 ms. CLAUDE.md sync
    lesson, now pinned here."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def generation_flops(duration_s: float) -> float:
    """Analytic FLOPs for one generation of `duration_s` seconds at
    bench.py production shapes."""
    from gesture2vec_tpu.utils import flops as F

    n_windows = int(np.ceil(duration_s / (SENT_LEN / FPS)))
    n_steps = SENT_LEN // N_FRAMES
    n_tokens = n_windows * n_steps
    f = n_windows * F.text2token_forward_flops(
        1, max_words=MAXW, embed=300, hidden=HID, n_layers=L,
        n_steps=n_steps, codes=K)
    f += F.e2e_decode_flops(n_tokens, n_frames=N_FRAMES, rep=40,
                            hidden=HID, n_layers=L, motion_dim=135)
    return f


def bench_variant(gen, words, duration_s):
    frames = gen.generate(words, duration_s)[0]
    n_frames = np.asarray(frames).shape[0]
    best, rounds = best_of_rounds(
        lambda: np.asarray(gen.generate(words, duration_s)[0]),
        iters=ITERS)
    return n_frames, best, rounds


def main():
    import jax

    from gesture2vec_tpu.utils.flops import V5E_PEAK_BF16, mfu

    print("backend:", jax.devices()[0].platform)
    out = {"shapes": {"hidden": HID, "codes": K, "layers": L,
                      "n_frames": N_FRAMES, "sent_len": SENT_LEN,
                      "duration_s": DURATION_S}}

    rtt = measure_dispatch_floor()
    out["dispatch_rtt_p50_ms"] = rtt * 1e3
    print(f"tunnel dispatch floor: {rtt*1e3:.1f} ms p50/call")

    words1 = _words(DURATION_S)
    words2 = _words(2 * DURATION_S)

    # reference-semantics single stream (window carry = sequential scan)
    gen = build_generator()
    n1, t1, r1 = bench_variant(gen, words1, DURATION_S)
    fl1 = generation_flops(DURATION_S)
    out["carry_true"] = {
        "frames": int(n1), "wall_s": t1, "rounds": r1,
        "frames_per_s": n1 / t1, "analytic_flops": fl1,
        "mfu_vs_bf16_peak": mfu(fl1, t1),
        "flops_per_s": fl1 / t1,
    }
    print(f"carry=True: {n1/t1:,.0f} frames/s, "
          f"{fl1/t1/1e9:.1f} GFLOP/s = "
          f"{mfu(fl1, t1)*100:.4f}% of v5e bf16 peak")

    # fixed-vs-scalable split: double the transcript in the same process
    n2, t2, r2 = bench_variant(gen, words2, 2 * DURATION_S)
    marginal = (t2 - t1)  # cost of the second 30 minutes
    fixed = max(t1 - marginal, 0.0)
    out["fixed_vs_scalable"] = {
        "wall_1x_s": t1, "wall_2x_s": t2,
        "marginal_per_duration_s": marginal,
        "fixed_per_generation_s": fixed,
        "fixed_share_of_1x": fixed / t1 if t1 else 0.0,
        "scalable_frames_per_s": (n2 - n1) / marginal
        if marginal > 0 else float("inf"),
    }
    print(f"fixed-vs-scalable: fixed {fixed*1e3:.0f} ms/generation "
          f"({100*fixed/t1:.1f}% of 1x wall), marginal throughput "
          f"{(n2-n1)/marginal:,.0f} frames/s")

    # throughput ceiling: all windows in one batched device call
    gen_b = build_generator(window_carry=False)
    nb, tb, rb = bench_variant(gen_b, words1, DURATION_S)
    out["carry_false_batched"] = {
        "frames": int(nb), "wall_s": tb, "rounds": rb,
        "frames_per_s": nb / tb, "analytic_flops": fl1,
        "mfu_vs_bf16_peak": mfu(fl1, tb),
    }
    print(f"carry=False batched windows: {nb/tb:,.0f} frames/s "
          f"({nb/tb/(n1/t1):.2f}x), "
          f"{mfu(fl1, tb)*100:.4f}% of bf16 peak")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
