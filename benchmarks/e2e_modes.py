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

    orig = t2g.GestureGenerator.__post_init__

    def patched(self):
        for k, v in gen_kwargs.items():
            setattr(self, k, v)
        orig(self)

    t2g.GestureGenerator.__post_init__ = patched
    try:
        fps, _ = B.bench_jax()
    finally:
        t2g.GestureGenerator.__post_init__ = orig
    return fps


def e2e_flops_per_frame() -> float:
    """Analytic FLOPs per generated frame for the decode-mode path:
    token prediction + chunk rollout + DAE decode at bench.py shapes."""
    from gesture2vec_tpu.utils import flops as F
    n_steps = B.SENT_LEN // B.N_FRAMES
    n_windows = int(__import__("numpy").ceil(
        B.DURATION_S / (B.SENT_LEN / B.FPS)))
    n_tokens = n_windows * n_steps
    total = n_windows * F.text2token_forward_flops(
        1, max_words=B.MAXW, hidden=B.HID, n_layers=B.L,
        n_steps=n_steps, codes=B.K, encoder="tcn")
    total += F.e2e_decode_flops(n_tokens, n_frames=B.N_FRAMES, rep=B.REP,
                                hidden=B.HID, n_layers=B.L,
                                motion_dim=B.DIM)
    return total / (n_tokens * B.N_FRAMES)


if __name__ == "__main__":
    import jax

    from gesture2vec_tpu.utils.flops import V5E_PEAK_BF16
    print("backend:", jax.devices()[0].platform)
    fpf = e2e_flops_per_frame()
    print(f"analytic decode-path cost: {fpf/1e6:.3f} MFLOP/frame")
    for label, kw in (("default (carry, scan)", {}),
                      ("no window carry", {"window_carry": False}),
                      ("no carry + fused decoder",
                       {"window_carry": False,
                        "use_fused_decoder": True})):
        fps = run_mode(**kw)
        eff = fps * fpf
        print(f"{label}: {fps:.0f} frames/s  "
              f"({eff/1e9:.2f} GFLOP/s = "
              f"{eff/V5E_PEAK_BF16*100:.4f}% of v5e bf16 peak)")
