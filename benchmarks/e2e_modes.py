"""E2E throughput across the optional inference modes.

Measures the decode-mode generator with:
  default      - reference-faithful window carry, scan decoder
  no-carry     - window_carry=False (all windows batched)
  fused        - + the Pallas fused chunk decoder

Run on TPU: python benchmarks/e2e_modes.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench as B  # noqa: E402


def run_mode(**gen_kwargs) -> float:
    import gesture2vec_tpu.infer.text2gesture as t2g

    holder = {}
    orig = t2g.GestureGenerator.__post_init__

    def patched(self):
        for k, v in gen_kwargs.items():
            setattr(self, k, v)
        orig(self)
        holder["gen"] = self

    t2g.GestureGenerator.__post_init__ = patched
    try:
        fps = B.bench_jax()
    finally:
        t2g.GestureGenerator.__post_init__ = orig
    return fps


if __name__ == "__main__":
    import jax
    print("backend:", jax.devices()[0].platform)
    for label, kw in (("default (carry, scan)", {}),
                      ("no window carry", {"window_carry": False}),
                      ("no carry + fused decoder",
                       {"window_carry": False,
                        "use_fused_decoder": True})):
        fps = run_mode(**kw)
        print(f"{label}: {fps:.0f} frames/s")
