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
    """Accumulating named stage timer with device synchronization."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        if self.sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        yield
        if self.sync:
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
