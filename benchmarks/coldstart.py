"""Serving cold-start vs warm-restart: the persistent compilation cache.

The reference pays full model-load cost per process but compiles
nothing (torch eager); this framework's fused generation program costs
~17 s of XLA compilation on first use (benchmarks/streaming_infer.py).
utils/jaxcache wires the JAX persistent compilation cache into every
CLI (--jax-cache, default on), so a RESTARTED server/CLI reloads the
compiled executable from disk instead of recompiling.

This benchmark measures exactly that, end to end: a child process
builds a GestureGenerator from a completed quality_run's checkpoints
and times process-start -> first generated frames (checkpoint load +
trace + compile/cache-load + execute). The parent runs the child three
ways in fresh processes: cache off, cold cache (empty dir), warm cache
(second run on the same dir).

    python benchmarks/coldstart.py /tmp/quality_out [--platform cpu]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORDS = [["hello", 0.2, 0.5], ["world", 0.7, 1.0], ["gesture", 1.3, 1.9],
         ["test", 2.2, 2.8], ["again", 3.1, 3.6], ["now", 4.0, 4.5]]


def child(out_dir: str, cache_spec: str, platform: str | None) -> None:
    t_start = time.perf_counter()
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    from gesture2vec_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache(cache_spec)

    import numpy as np

    from gesture2vec_tpu.cli._common import build_generator
    from gesture2vec_tpu.data.store import ClipStore

    def latest(pattern):
        return sorted(glob.glob(os.path.join(out_dir, pattern)))[-1]

    store = ClipStore(os.path.join(out_dir, "corpus/store/train"))
    gen, _ = build_generator(latest("t2t/*.bin"), latest("dae/*.bin"),
                             latest("vqvae/*.bin"), store, mode="decode")
    t_built = time.perf_counter()
    frames, _ = gen.generate(WORDS, duration_s=30.0)
    assert np.isfinite(frames).all()
    t_first = time.perf_counter()
    print(json.dumps({"build_s": round(t_built - t_start, 3),
                      "first_generation_s": round(t_first - t_built, 3),
                      "total_s": round(t_first - t_start, 3)}))


def run_child(out_dir, cache_spec, platform):
    env = dict(os.environ)
    args = [sys.executable, os.path.abspath(__file__), out_dir,
            "--_child", "--cache", cache_spec]
    if platform:
        args += ["--platform", platform]
    t0 = time.perf_counter()
    r = subprocess.run(args, capture_output=True, text=True, cwd=REPO,
                       env=env, timeout=900)
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        raise RuntimeError(f"child failed:\n{r.stdout}\n{r.stderr}")
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    rec["process_wall_s"] = round(wall, 3)
    return rec


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--cache", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_child", action="store_true",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args._child:
        child(args.out, args.cache, args.platform)
        return

    cache_dir = tempfile.mkdtemp(prefix="g2v_xla_cache_")
    results = {"no_cache": run_child(args.out, "off", args.platform),
               "cold_cache": run_child(args.out, cache_dir,
                                       args.platform),
               "warm_cache": run_child(args.out, cache_dir,
                                       args.platform)}
    n_entries = len(os.listdir(cache_dir))
    cold = results["cold_cache"]["first_generation_s"]
    warm = results["warm_cache"]["first_generation_s"]
    results["summary"] = {
        "cache_entries": n_entries,
        "first_generation_cold_s": cold,
        "first_generation_warm_s": warm,
        "compile_time_saved_s": round(cold - warm, 3),
        "speedup_first_generation": round(cold / warm, 2)
        if warm else None}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
