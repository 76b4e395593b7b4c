"""Part-b encoder A/B at corpus scale: biGRU (reference parity) vs the
TPU-first transformer chunk encoder (`seq_arch: transformer`,
models/seq_encoder) — VERDICT round-3 item 3.

One session, same cached corpus, same frozen Part-a teacher, identical
schedules. Three panels:

  1. Tokenizer quality in the SHARED frozen DAE frame space (the
     cross-config discipline from quality_vq_ablation): recon FGD,
     perfect-token decode FGD, codebook perplexity / codes used.
  2. Downstream Part d trained against each tokenizer's tokens with the
     identical schedule: val CE / teacher-forced token accuracy — the
     chain-level regression check.
  3. Train-step MFU at benchmark shapes (B=1024 bf16 and the fp32
     production batch), both archs compiled and interleaved in THIS
     process (A/B/A — this box's timings drift across processes,
     CLAUDE.md measurement discipline).

Run AFTER benchmarks/quality_run.py (reuses its corpus + DAE):
    python benchmarks/quality_partb_encoder.py /tmp/quality_out
Writes <out>/metrics_partb_encoder.json and prints the tables.
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-mfu", action="store_true",
                    help="quality panels only (e.g. on CPU)")
    ap.add_argument("--mfu-only", action="store_true",
                    help="reuse quality rows from an existing "
                         "metrics_partb_encoder.json and run just the "
                         "train-step MFU A/B/A")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from gesture2vec_tpu.cluster.metrics import (frechet_distance,
                                                 token_perplexity)
    from gesture2vec_tpu.data.datasets import pose_windows
    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.data.teacher import encode_windows_with_dae
    from gesture2vec_tpu.models.seq_ae import _unflatten_hidden
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train import checkpoints
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.seq_ae_trainer import (make_seq_ae,
                                                      train_seq_ae)
    from gesture2vec_tpu.train.text2token_trainer import train_text2token

    logging.basicConfig(level=logging.INFO)
    print("backend:", jax.devices()[0].platform)

    fast = args.fast
    n_frames, rep, fps = 20, 40, 20
    hid = 64 if fast else 200
    bs = 32 if fast else 128
    codes = 32 if fast else 64
    epochs = 6 if fast else 80
    d_epochs = 6 if fast else 60

    store = ClipStore(os.path.join(args.out, "corpus", "store", "train"))
    val_store = ClipStore(os.path.join(args.out, "corpus", "store",
                                       "val"))
    dae_ckpts = sorted(glob.glob(os.path.join(args.out, "dae",
                                              "dae_*_checkpoint_*.bin")))
    assert dae_ckpts, "run benchmarks/quality_run.py first"
    dae, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        dae_ckpts[-1], "DAE")

    lat_train = encode_windows_with_dae(
        dae, dae_vars, pose_windows(store, n_frames, n_frames // 2))
    lat_val = encode_windows_with_dae(
        dae, dae_vars, pose_windows(val_store, n_frames, n_frames // 2,
                                    store.pose_mean, store.pose_std))
    print(f"windows: {lat_train.shape[0]} train, {lat_val.shape[0]} val")
    val_frames = lat_val.reshape(-1, rep)
    rng = np.random.default_rng(0)
    tr_frames = lat_train.reshape(-1, rep)
    tr_frames = tr_frames[rng.choice(tr_frames.shape[0],
                                     min(20000, tr_frames.shape[0]),
                                     replace=False)]
    floor = frechet_distance(tr_frames, val_frames)
    print(f"floor FGD: {floor:.2f}")

    vocab = build_vocab("partb_ab", [[w[0] for w in c["words"]]
                                     for c in store], embedding_dim=300)

    out_path = os.path.join(args.out, "metrics_partb_encoder.json")
    results = {}
    if args.mfu_only:
        with open(out_path) as f:
            results = json.load(f)["results"]
        print(f"quality rows reused from {out_path}")
    for arch in () if args.mfu_only else ("bigru", "transformer"):
        cfg = load_config(dict(
            name=f"pb_{arch}", model="seq2seq", hidden_size=hid,
            n_layers=2, dropout_prob=0.1, epochs=epochs, batch_size=bs,
            learning_rate=0.002, rep_learning_dim=rep, n_poses=n_frames,
            n_pre_poses=1, autoencoder_vq=True,
            autoencoder_vq_components=codes, random_seed=0,
            seq_arch=arch))
        t0 = time.perf_counter()
        state, hist = train_seq_ae(cfg, lat_train, lat_val)
        train_s = time.perf_counter() - t0
        model = make_seq_ae(cfg)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

        @jax.jit
        def forward(x):
            return model.apply(variables, x, x, train=False)["outputs"]

        @jax.jit
        def hidden_of(x):
            _, dec_hidden = model.apply(variables, x,
                                        method=model.encode)
            vq_out, _ = model.apply(variables, dec_hidden,
                                    method=model.quantize)
            return dec_hidden, jnp.argmax(vq_out.encodings, axis=-1)

        @jax.jit
        def rollout_from(hid_lbh, seed):
            return model.apply(variables, hid_lbh, seed,
                               method=model.rollout)

        x = jnp.asarray(lat_val)
        recon = np.asarray(forward(x))
        dec_hidden, tok_dev = hidden_of(x)
        tokens = np.asarray(tok_dev)
        cb0 = np.asarray(state.params["vq_layer"]["codebook"])
        hid_tok = _unflatten_hidden(jnp.asarray(cb0[tokens]),
                                    dec_hidden.shape, model.vq_flatten)
        roll = np.asarray(rollout_from(hid_tok, x[:, 0]))
        row = {
            "train_wall_s": train_s,
            "val_loss": float(hist["val_loss"][-1]),
            "recon_mse": float(np.mean((recon - lat_val) ** 2)),
            "fgd_recon": frechet_distance(recon.reshape(-1, rep),
                                          val_frames),
            "fgd_token_decode": frechet_distance(roll.reshape(-1, rep),
                                                 val_frames),
            "codebook_perplexity": float(hist["perplexity"][-1]),
            "val_token_perplexity": token_perplexity(tokens, codes),
            "codes_used": int(np.unique(tokens).size),
        }

        # downstream Part d against this tokenizer (identical schedule)
        sent = build_sentence_dataset(
            store, vocab, dae_model=dae, dae_variables=dae_vars,
            seq_model=model, seq_variables=variables,
            sentence_frame_length=120, stride=30, n_frames=n_frames,
            fps=fps, max_words=24)
        sent_val = build_sentence_dataset(
            val_store, vocab, dae_model=dae, dae_variables=dae_vars,
            seq_model=model, seq_variables=variables,
            sentence_frame_length=120, stride=120, n_frames=n_frames,
            fps=fps, max_words=24, mean=store.pose_mean,
            std=store.pose_std)
        d_cfg = load_config(dict(
            name=f"pd_{arch}", model="seq2seq", hidden_size=hid,
            n_layers=2, dropout_prob=0.2, epochs=d_epochs,
            # fast corpora yield < one full val batch at Part-b sizes —
            # quality_run's bs_d split, same reason
            batch_size=4 if fast else 32,
            learning_rate=0.0005, wordembed_dim=300,
            sentence_frame_length=120, n_poses=n_frames, n_pre_poses=2,
            autoencoder_vq=True, autoencoder_vq_components=codes,
            autoencoder_att=True, random_seed=0))
        _, d_hist = train_text2token(
            d_cfg, sent, sent_val, vocab.n_words,
            embedding_weights=vocab.word_embedding_weights)
        row["t2t_val_ce_best"] = float(np.min(d_hist["val_loss"]))
        row["t2t_val_acc_best"] = float(np.max(d_hist["val_acc"]))
        results[arch] = row
        print(f"\n=== {arch} ===")
        print(json.dumps(row, indent=2))

    # persist the quality panels before the MFU pass so a bench crash
    # never loses the (expensive) trained-chain rows
    payload = {"floor_fgd": floor,
               "space": f"frozen DAE latent frames (dim {rep})",
               "epochs": epochs, "d_epochs": d_epochs, "hidden": hid,
               "codes": codes, "results": results, "mfu": {}}
    if not args.mfu_only:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)

    # ---- MFU A/B (same process, interleaved A/B/A) -----------------
    mfu = {}
    if not args.skip_mfu:
        from gesture2vec_tpu.train import seq_ae_trainer
        from gesture2vec_tpu.train.optim import make_optimizer
        from gesture2vec_tpu.utils import flops as F
        from train_step import bench_steps

        for label, mbs, dtype in (("b1024_bf16", 1024, "bfloat16"),
                                  ("b128_fp32", 128, "float32")):
            steps, inits, argss = {}, {}, {}
            for arch in ("bigru", "transformer"):
                cfg = load_config(dict(
                    name=f"mfu_{arch}", model="seq2seq",
                    hidden_size=200, n_layers=2, dropout_prob=0.2,
                    rep_learning_dim=40, n_poses=20, n_pre_poses=1,
                    autoencoder_vq=True, autoencoder_vq_components=512,
                    learning_rate=5e-4, epochs=1, batch_size=mbs,
                    random_seed=0, compute_dtype=dtype, seq_arch=arch))
                model = seq_ae_trainer.make_seq_ae(cfg)
                opt = make_optimizer(cfg.learning_rate)
                # bench_steps DONATES the state arg (CLAUDE.md gotcha):
                # a fresh init per A/B/A leg, never a reused state
                inits[arch] = (lambda c=cfg, m=model, o=opt:
                               seq_ae_trainer.init_state(
                                   c, m, jax.random.PRNGKey(0), o))
                steps[arch] = seq_ae_trainer.make_train_step(
                    cfg, model, opt, total_epochs=1)
                xb = jnp.asarray(np.random.default_rng(0).normal(
                    size=(mbs, 20, 40)).astype(np.float32))
                argss[arch] = (xb, jax.random.PRNGKey(1),
                               jnp.asarray(0.0))
            rows = {}
            order = ["bigru", "transformer", "bigru"]
            iters = 5 if fast else 30
            for i, arch in enumerate(order):
                t = bench_steps(steps[arch], inits[arch](), argss[arch],
                                iters)
                fwd = F.seq_ae_forward_flops(
                    mbs, encoder=("transformer"
                                  if arch == "transformer" else "bigru"))
                rows.setdefault(arch, []).append(
                    {"ms_per_step": t * 1e3,
                     "windows_per_s": mbs / t,
                     "mfu_pct": 100 * F.mfu(3.0 * fwd, t)})
            mfu[label] = rows
            print(f"\nMFU {label}: " + json.dumps(rows, indent=1))

    payload["mfu"] = mfu
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
