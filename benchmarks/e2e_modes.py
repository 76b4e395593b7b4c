"""E2E throughput across the inference modes.

Measures:
  default      - decode mode, reference-faithful window carry, scan
  no-carry     - window_carry=False (all windows batched)
  fused        - + the Pallas fused chunk decoder
  exemplar     - the reference's DEFAULT shipping mode (token -> random
                 training-window retrieval, ref:
                 inference_text2embedding.py:520, 572-624): tokens
                 predicted on device, exemplar lookup host-side, one
                 batched DAE decode

Run on TPU: python benchmarks/e2e_modes.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench as B  # noqa: E402


def run_mode(mode: str = "decode", **gen_kwargs) -> float:
    import gesture2vec_tpu.infer.text2gesture as t2g

    orig_init = t2g.GestureGenerator.__post_init__
    orig_build = B.build_generator

    def patched(self):
        for k, v in gen_kwargs.items():
            setattr(self, k, v)
        orig_init(self)

    t2g.GestureGenerator.__post_init__ = patched
    B.build_generator = lambda **kw: orig_build(**{**kw, "mode": mode})
    try:
        fps, _ = B.bench_jax()
    finally:
        t2g.GestureGenerator.__post_init__ = orig_init
        B.build_generator = orig_build
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
    for label, mode, kw in (
            ("default (carry, scan)", "decode", {}),
            ("no window carry", "decode", {"window_carry": False}),
            ("no carry + fused decoder", "decode",
             {"window_carry": False, "use_fused_decoder": True}),
            ("exemplar (reference default mode)", "exemplar", {})):
        fps = run_mode(mode, **kw)
        eff = fps * fpf
        note = ("" if mode == "decode" else
                "  [host-side retrieval; FLOP/frame figure is the "
                "decode path's, shown for scale only]")
        print(f"{label}: {fps:.0f} frames/s  "
              f"({eff/1e9:.2f} GFLOP/s = "
              f"{eff/V5E_PEAK_BF16*100:.4f}% of v5e bf16 peak){note}")
