"""Persistent XLA compilation cache for the production CLIs.

The reference has no serving story and pays full startup cost per
process; our CLIs compile 1-20 s of XLA programs on first use (the
fused generation program alone is ~17 s cold on the TPU,
benchmarks/streaming_infer.py). The JAX persistent compilation cache
makes every restart after the first warm: compiled executables are
keyed by (HLO, compile options, backend) and reloaded from disk
instead of recompiled.

Environment note (CLAUDE.md): this must be configured via
``jax.config.update`` AFTER importing jax — on hosts whose site hook
imports jax at interpreter startup, setting ``JAX_COMPILATION_CACHE_DIR``
in ``os.environ`` from Python is ignored for the main process.

Used by every jax-facing CLI (g2v-serve, g2v-infer, g2v-infer-audio,
g2v-reconstruct, g2v-train, g2v-cluster, g2v-tools) through the shared
``--jax-cache`` flag; tests use their own repo-local cache
(tests/conftest.py).
"""
from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = os.path.join("~", ".cache", "gesture2vec_tpu", "xla")


def enable_compilation_cache(spec: str = "auto") -> Optional[str]:
    """Enable the persistent compilation cache.

    spec: "auto" (default location, override with $G2V_JAX_CACHE_DIR),
    "off" (leave jax untouched, return None), or an explicit directory.
    Returns the cache directory in use (created if missing)."""
    if spec == "off":
        return None
    if spec in ("auto", "", None):
        cache_dir = os.environ.get("G2V_JAX_CACHE_DIR") \
            or os.path.expanduser(DEFAULT_DIR)
    else:
        cache_dir = os.path.expanduser(spec)
    os.makedirs(cache_dir, exist_ok=True)

    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache small programs too: on a tunnel-attached TPU even trivial
    # dispatch-level jits (convert_element_type, threefry_seed, ...)
    # take ~0.35 s each to compile, and a CLI startup runs dozens of
    # them — measured to dominate first-generation time (benchmarks/
    # coldstart.py). The default 1 s threshold would never cache them.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    try:
        # cache per-backend autotuning etc. where the jax version
        # supports it (best effort; name varies across versions)
        jax.config.update("jax_persistent_cache_enable_xla_caches",
                          "all")
    except Exception:
        pass
    return cache_dir


def add_jax_cache_flag(parser) -> None:
    """Attach the shared --jax-cache flag to an argparse parser."""
    parser.add_argument(
        "--jax-cache", default="auto", metavar="DIR|auto|off",
        help="persistent XLA compilation cache: 'auto' (default, "
             "~/.cache/gesture2vec_tpu/xla or $G2V_JAX_CACHE_DIR), "
             "'off', or a directory; warm restarts skip recompiles")
