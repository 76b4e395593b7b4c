"""Part-d train-step MFU vs hidden size: GRU vs transformer at
H=200 and H=400, interleaved in ONE process (round-5, VERDICT r4
item 8).

Round 4 measured the transformer Part d LOSING wall-clock to the GRU
at H=200 in every regime (attention+FFN ~73% more FLOPs while the
batch already feeds the MXU; docs/quality/metrics_transformer.json);
the transformer docstring argues its parallel teacher-forced pass wins
once per-step matmuls are MXU-bound (H >= ~1024). The capacity probe
(quality_combined tf_cond_h400) asks whether 2x hidden buys QUALITY;
this harness asks what it costs in TRAIN throughput, at the combined-
study shapes (bs=32, 40 words, 6 steps, 64 codes, 4 token stages,
stage-conditional).

Methodology per CLAUDE.md: one process, configs interleaved
round-robin (ambient TPU drift hits all configs equally), donated
train state re-initialized per leg, chained steps with one final host
sync (benchmarks/train_step.bench_steps). MFU denominator is the
ANALYTIC forward x3 (utils/flops.py; XLA's cost model undercounts
scanned recurrent bodies — tests/test_flops.py).

    python benchmarks/partd_mfu_h.py [--iters 30] [--rounds 3]
Writes benchmarks/partd_mfu_h.json when --write is passed.

Reference context: the reference Part d is a GRU trained on CPU/GPU
(scripts/train_text2embedding.py); it has no transformer variant and
no H-scaling study.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3,
                    help="interleaved measurement rounds per config")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--write", action="store_true",
                    help="write benchmarks/partd_mfu_h.json")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from train_step import bench_steps

    from gesture2vec_tpu.train import text2token_trainer as T
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.utils import flops as F

    print("backend:", jax.devices()[0].platform)
    B, W, STEPS, K, S = args.batch, 40, 6, 64, 4
    EMB, NW = 100, 4000

    rng = np.random.default_rng(0)
    word_ids = jnp.asarray(rng.integers(4, NW, size=(B, W), dtype=np.int32))
    lengths = jnp.asarray(rng.integers(10, W, size=(B,), dtype=np.int32))
    targets = jnp.asarray(rng.integers(0, K, size=(B, STEPS),
                                       dtype=np.int32))
    stage = jnp.asarray(rng.integers(0, K, size=(B, STEPS, S),
                                     dtype=np.int32))

    configs = {}
    for arch in ("gru", "transformer"):
        for H in (200, 400):
            cfg = load_config(dict(
                name=f"mfu_{arch}_h{H}", model="seq2seq", hidden_size=H,
                n_layers=2, dropout_prob=0.1, epochs=1, batch_size=B,
                learning_rate=1e-3, sentence_frame_length=120,
                n_poses=20, n_pre_poses=1, autoencoder_vq=True,
                autoencoder_vq_components=K, autoencoder_att=True,
                wordembed_dim=EMB, random_seed=0, token_stages=S,
                stage_conditional=True,
                extras=({"t2t_arch": arch} if arch != "gru" else {})))
            model = T.make_text2token(cfg, NW)
            opt = make_optimizer(cfg.learning_rate)
            step = T.make_train_step(model, opt)
            if arch == "gru":
                fwd = F.text2token_forward_flops(
                    B, max_words=W, embed=EMB, hidden=H, n_layers=2,
                    n_steps=STEPS, codes=K, encoder="tcn")
            else:
                fwd = F.transformer_t2t_forward_flops(
                    B, max_words=W, embed=EMB, hidden=H, n_layers=2,
                    n_steps=STEPS, codes=K)
            # stage-conditional residual heads: (S-1) x Dense(H -> K)
            # per supervised position (embedding adds are lookup+add)
            fwd += (S - 1) * F.dense_flops(B * (STEPS - 1), H, K)
            configs[f"{arch}_h{H}"] = dict(
                model=model, opt=opt, step=step, fwd=fwd,
                init=(lambda m=model, o=opt: T.init_state(
                    m, jax.random.PRNGKey(0), o, max_words=W)))

    results = {k: [] for k in configs}
    order = list(configs)
    for r in range(args.rounds):
        for key in order:
            c = configs[key]
            t = bench_steps(c["step"], c["init"](),
                            (word_ids, lengths, targets, stage,
                             jax.random.PRNGKey(1)),
                            args.iters)
            row = {"ms_per_step": t * 1e3,
                   "sentences_per_s": B / t,
                   "mfu_pct": 100 * F.mfu(3.0 * c["fwd"], t)}
            results[key].append(row)
            print(f"round {r} {key:18s} {row['ms_per_step']:8.2f} ms "
                  f"{row['sentences_per_s']:8.0f} sent/s "
                  f"mfu {row['mfu_pct']:.2f}%")

    summary = {}
    for key, rows in results.items():
        best = min(r["ms_per_step"] for r in rows)
        summary[key] = {
            "best_ms_per_step": best,
            "best_sentences_per_s": args.batch / (best / 1e3),
            "best_mfu_pct": max(r["mfu_pct"] for r in rows),
            "fwd_gflops": configs[key]["fwd"] / 1e9,
            "rounds": rows}
    for h in (200, 400):
        g, t = summary[f"gru_h{h}"], summary[f"transformer_h{h}"]
        summary[f"speed_ratio_h{h}_tf_over_gru"] = (
            g["best_ms_per_step"] / t["best_ms_per_step"])
    print("\nsummary:", json.dumps(
        {k: (v if not isinstance(v, dict)
             else {kk: vv for kk, vv in v.items() if kk != "rounds"})
         for k, v in summary.items()}, indent=1))
    if args.write:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "partd_mfu_h.json")
        with open(out, "w") as f:
            json.dump({"batch": args.batch, "iters": args.iters,
                       "shapes": {"max_words": W, "n_steps": STEPS,
                                  "codes": K, "token_stages": S},
                       "results": summary}, f, indent=1)
        print("wrote", out)


if __name__ == "__main__":
    main()
