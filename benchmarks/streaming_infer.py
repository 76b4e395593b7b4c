"""Streaming inference latency: per-window step time and real-time
factor of infer/streaming.StreamingGestureSession.

The metric that matters for a live avatar is not aggregate frames/s but
the latency from "window's words are complete" to "window's motion is
ready" — one fused device program per ~6 s window. Real-time factor =
window duration / step latency.

Methodology per CLAUDE.md: warm-up step excluded (compile), per-step
sync by consuming the output (np.asarray fetch — block_until_ready on
the axon platform returns early), fresh key per step, p50/p99 over
N steps in ONE process.

    python benchmarks/streaming_infer.py [--steps 50] [--platform cpu]

Prints one JSON line with p50/p99 step latency and the real-time
factor at production shapes (H=200, K=512, 120-frame windows @ 20 fps).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--mode", choices=["decode", "exemplar"],
                    default="decode")
    ap.add_argument("--recipe", action="store_true",
                    help="stream the recommended-recipe model shape "
                         "(4-stage rvq Part b + stage-conditional "
                         "transformer Part d) instead of the "
                         "single-stage GRU chain")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _words, build_generator
    from gesture2vec_tpu.infer.streaming import StreamingGestureSession

    print("backend:", jax.devices()[0].platform)
    gen = build_generator(mode=args.mode,
                          **(dict(token_stages=4, stage_conditional=True,
                                  t2t_arch="transformer")
                             if args.recipe else {}))
    unit = gen.sentence_frame_length / gen.fps
    total_s = (args.steps + 2) * unit
    words = _words(total_s)

    sess = StreamingGestureSession(gen)
    # warm-up: first window pays the compile
    t0 = time.perf_counter()
    out = sess.push(words, now_s=unit)
    _ = np.asarray(out[0][0])
    compile_s = time.perf_counter() - t0

    lats = []
    for i in range(1, args.steps + 1):
        t0 = time.perf_counter()
        out = sess.push(words, now_s=(i + 1) * unit)
        assert len(out) == 1
        _ = np.asarray(out[0][0])          # hard sync: fetch the frames
        lats.append(time.perf_counter() - t0)
    lats = np.asarray(lats)
    p50, p99 = float(np.percentile(lats, 50)), float(np.percentile(lats,
                                                                   99))
    result = {
        "metric": "streaming_step_latency_p50", "value": p50,
        "unit": "s/window", "p99": p99, "compile_s": compile_s,
        "window_s": unit, "realtime_factor_p50": unit / p50,
        "mode": args.mode, "steps": int(args.steps),
        "recipe": bool(args.recipe),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
