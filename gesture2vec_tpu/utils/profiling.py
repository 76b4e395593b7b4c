"""Profiling and tracing utilities.

The reference has no profiling beyond wall-clock samples/s prints
(SURVEY.md section 5). TPU-native additions:
  trace(dir)     - context manager around jax.profiler.trace; the dump
                   opens in TensorBoard/XProf for per-op TPU timelines.
  StageTimer     - named wall-clock stages with device sync, for
                   pipeline-level breakdowns (ingest/teacher/train/infer).
  annotate(name) - TraceAnnotation wrapper so custom stages show up
                   inside the device profile.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield
    logging.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating named stage timer with device synchronization.

    To time device compute, hand the stage its OUTPUT arrays via the
    yielded sink:

        with timer.stage("encode") as done:
            z = encode_fn(x)
            done(z)

    The stage exit then blocks until those arrays are ready.
    `jax.effects_barrier()` alone does NOT wait for pure computations
    (measured here: 0 ms while a dispatched matmul chain still had
    seconds of work in flight), so a stage without a sink call is timed
    as dispatch latency only and its compute lands on whichever later
    stage first consumes the result.
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        outs: list = []
        if self.sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        yield outs.append
        if self.sync:
            if outs:
                jax.block_until_ready(outs)
            else:
                jax.effects_barrier()
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {n} calls, "
                         f"{total / n * 1e3:.1f}ms avg")
        return "\n".join(lines)
