"""Transformer-vs-GRU Part d at corpus scale, same teachers, same
metric battery.

Loads the frozen Part-a/b teachers AND the trained GRU Part d from a
completed quality_run out dir, trains the transformer Part-d variant
(models/transformer, `t2t_arch: transformer`) on the IDENTICAL
sentence dataset with the identical schedule, then evaluates both
translators through the shared generated-vs-ground-truth battery
(quality_run.eval_generated_vs_gt) in one process. Writes
metrics_transformer.json next to the checkpoints.

    python benchmarks/quality_run.py /tmp/quality_out      # once
    python benchmarks/quality_transformer.py /tmp/quality_out

Cross-config comparisons share the frozen teacher metric space
(CLAUDE.md round-3 lesson): both archs translate into the SAME Part-b
token vocabulary, so every row is apples-to-apples.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from quality_run import eval_generated_vs_gt  # noqa: E402


def _latest(pattern):
    paths = sorted(glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(pattern)
    return paths[-1]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--epochs", type=int, default=0,
                    help="override (default: the GRU run's schedule)")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse an existing out/t2t_tf checkpoint")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    from gesture2vec_tpu.cluster.latent_dataset import build_latent_dataset
    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train import checkpoints
    from gesture2vec_tpu.train.text2token_trainer import (
        make_text2token, train_text2token)

    print("backend:", jax.devices()[0].platform)
    store = ClipStore(os.path.join(args.out, "corpus/store/train"))
    val_store = ClipStore(os.path.join(args.out, "corpus/store/val"))

    dae, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        _latest(os.path.join(args.out, "dae/*.bin")), "DAE")
    seq, seq_vars, seq_payload = checkpoints.load_checkpoint_and_model(
        _latest(os.path.join(args.out, "vqvae/*.bin")), "autoencoder_vq")
    gru_t2t, gru_vars, gru_payload = checkpoints.load_checkpoint_and_model(
        _latest(os.path.join(args.out, "t2t/*.bin")), "text2embedding")
    cfg = seq_payload["config"]
    t2t_cfg = gru_payload["config"]
    codes = cfg.autoencoder_vq_components
    n_frames_chunk, fps = cfg.n_poses, 20
    sent_len = t2t_cfg.sentence_frame_length

    vocab = build_vocab("quality", [[w[0] for w in c["words"]]
                                    for c in store],
                        embedding_dim=t2t_cfg.wordembed_dim)
    assert vocab.n_words == gru_t2t.n_words

    # identical sentence dataset to quality_run's Part-d section
    sent = build_sentence_dataset(
        store, vocab, dae_model=dae, dae_variables=dae_vars,
        seq_model=seq, seq_variables=seq_vars,
        sentence_frame_length=sent_len, stride=30,
        n_frames=n_frames_chunk, fps=fps, max_words=24)
    sent_val = build_sentence_dataset(
        val_store, vocab, dae_model=dae, dae_variables=dae_vars,
        seq_model=seq, seq_variables=seq_vars,
        sentence_frame_length=sent_len, stride=sent_len,
        n_frames=n_frames_chunk, fps=fps, max_words=24,
        mean=store.pose_mean, std=store.pose_std)
    print(f"sentences: {len(sent['word_ids'])} train, "
          f"{len(sent_val['word_ids'])} val")

    tf_cfg = t2t_cfg.replace(
        name="t2t_tf",
        epochs=args.epochs or t2t_cfg.epochs,
        model_save_path=os.path.join(args.out, "t2t_tf"),
        extras={**t2t_cfg.extras, "t2t_arch": "transformer"})
    results = {"schedule": {"epochs": tf_cfg.epochs,
                            "batch_size": tf_cfg.batch_size,
                            "hidden": tf_cfg.hidden_size}}

    if args.skip_train:
        tf_t2t, tf_vars, tf_payload = \
            checkpoints.load_checkpoint_and_model(
                _latest(os.path.join(args.out, "t2t_tf/*.bin")),
                "text2embedding")
        results["transformer_train"] = {"reused_checkpoint": True}
    else:
        t0 = time.perf_counter()
        tf_state, tf_hist = train_text2token(
            tf_cfg, sent, sent_val, vocab.n_words,
            embedding_weights=vocab.word_embedding_weights,
            save_dir=os.path.join(args.out, "t2t_tf"), save_every=1000)
        train_s = time.perf_counter() - t0
        tf_t2t = make_text2token(tf_cfg, vocab.n_words)
        tf_vars = {"params": tf_state.params,
                   "batch_stats": tf_state.batch_stats}
        results["transformer_train"] = {
            "wall_s": train_s,
            "val_ce_first": tf_hist["val_loss"][0],
            "val_ce_last": tf_hist["val_loss"][-1],
            "val_ce_best": float(np.min(tf_hist["val_loss"])),
            "val_acc_last": tf_hist["val_acc"][-1],
            "val_acc_best": float(np.max(tf_hist["val_acc"]))}
        print(f"transformer part d: {train_s/60:.1f} min, "
              f"val CE {tf_hist['val_loss'][-1]:.3f}, "
              f"val acc {tf_hist['val_acc'][-1]:.3f} "
              f"(best {np.max(tf_hist['val_acc']):.3f})")

    bank = build_latent_dataset(store, dae_model=dae,
                                dae_variables=dae_vars, seq_model=seq,
                                seq_variables=seq_vars,
                                n_poses=n_frames_chunk,
                                stride=n_frames_chunk)
    bank_val = build_latent_dataset(val_store, dae_model=dae,
                                    dae_variables=dae_vars,
                                    seq_model=seq, seq_variables=seq_vars,
                                    n_poses=n_frames_chunk,
                                    stride=n_frames_chunk,
                                    mean=store.pose_mean,
                                    std=store.pose_std)

    for arch, t2t, t2t_vars in (("gru", gru_t2t, gru_vars),
                                ("transformer", tf_t2t, tf_vars)):
        for label, mode, extra in (
                ("decode", "decode", {}),
                ("decode_soft_t1.0", "decode", {"soft_decode": 1.0}),
                ("decode_soft_sample_t1.0", "decode",
                 {"soft_decode": 1.0, "temperature": 1.0}),
                ("exemplar", "exemplar", {})):
            gen = GestureGenerator(
                t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq,
                seq_variables=seq_vars, dae_model=dae,
                dae_variables=dae_vars, vocab=vocab,
                pose_mean=store.pose_mean, pose_std=store.pose_std,
                n_frames=n_frames_chunk, sentence_frame_length=sent_len,
                fps=fps, max_words=24, mode=mode, latent_bank=bank,
                seed=0, **extra)
            m, _ = eval_generated_vs_gt(
                gen, store, val_store, dae, dae_vars, seq, seq_vars,
                n_frames_chunk, codes, bank_val, bank, fps)
            m.pop("_hist_gen")
            m.pop("_hist_gt")
            results[f"{arch}_{label}"] = m
            print(f"\n=== {arch} / {label} ===")
            print(json.dumps(m, indent=2))

    path = os.path.join(args.out, "metrics_transformer.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print("\nwrote", path)


if __name__ == "__main__":
    main()
