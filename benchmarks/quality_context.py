"""Does cross-window text context fix Part-d's prediction error?

The rvq study pinned the generative chain's remaining gap on Part-d
text->token prediction (QUALITY.md: perfect-token ceiling 1.48 vs
predicted 10-12). One structural candidate: the reference's word
lookup is window-local (data_preprocessor.get_words_in_time_range),
but motion at a window's START can depend on a word spoken just
before it (motif crossfades straddle window boundaries) — the model
literally cannot see the word that explains its first chunks.

`text_context_s` (config, beyond reference) extends the word range
backwards at BOTH dataset build and inference. This harness trains a
context Part d on the cached quality corpus against the same frozen
a/b teachers and runs the same generated-vs-ground-truth battery; the
baseline comparison rows are the committed no-context numbers
(docs/quality/metrics.json + metrics_modes.json), which this corpus
reproduces bit-for-bit across sessions.

Run AFTER benchmarks/quality_run.py:
    python benchmarks/quality_context.py /tmp/quality_out \
        [--context 6.0] [--fast --platform cpu]
Writes <out>/metrics_context.json.
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from quality_run import eval_generated_vs_gt  # noqa: E402 (sibling)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--context", type=float, default=6.0,
                    help="seconds of backwards word context (6 = one "
                         "window at production shapes)")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--platform", default=None)
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
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.text2token_trainer import (
        make_text2token, train_text2token)

    print("backend:", jax.devices()[0].platform)
    fast = args.fast
    n_frames, fps, sent_len = 20, 20, 120

    store = ClipStore(os.path.join(args.out, "corpus", "store", "train"))
    val_store = ClipStore(os.path.join(args.out, "corpus", "store",
                                       "val"))
    dae, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        sorted(glob.glob(os.path.join(args.out, "dae", "*.bin")))[-1],
        "DAE")
    seq, seq_vars, seq_payload = checkpoints.load_checkpoint_and_model(
        sorted(glob.glob(os.path.join(args.out, "vqvae", "*.bin")))[-1],
        "autoencoder_vq")
    codes = seq_payload["config"].autoencoder_vq_components

    vocab = build_vocab("quality", [[w[0] for w in c["words"]]
                                    for c in store], embedding_dim=100)
    # one extra window of words roughly doubles the ids per sample, so
    # raise the pad width (the committed no-context run used 24)
    max_words = 40
    kw = dict(dae_model=dae, dae_variables=dae_vars, seq_model=seq,
              seq_variables=seq_vars, sentence_frame_length=sent_len,
              n_frames=n_frames, fps=fps, max_words=max_words,
              text_context_s=args.context)
    sent = build_sentence_dataset(store, vocab, stride=30, **kw)
    sent_val = build_sentence_dataset(val_store, vocab, stride=sent_len,
                                      mean=store.pose_mean,
                                      std=store.pose_std, **kw)
    print(f"context={args.context}s: mean words/sample "
          f"{float(sent['lengths'].mean()):.1f} "
          f"(max_words={max_words})")

    t2t_cfg = load_config(dict(
        name="t2t_ctx", model="seq2seq", hidden_size=200, n_layers=2,
        dropout_prob=0.1, epochs=(10 if fast else 120),
        batch_size=(4 if fast else 32), learning_rate=0.001,
        sentence_frame_length=sent_len, n_poses=n_frames, n_pre_poses=1,
        autoencoder_vq=True, autoencoder_vq_components=codes,
        autoencoder_att=True, wordembed_dim=100, random_seed=0,
        text_context_s=args.context,
        model_save_path=os.path.join(args.out, "t2t_ctx")))
    t2t_state, t2t_hist = train_text2token(
        t2t_cfg, sent, sent_val, vocab.n_words,
        embedding_weights=vocab.word_embedding_weights,
        save_dir=os.path.join(args.out, "t2t_ctx"), save_every=1000)
    t2t = make_text2token(t2t_cfg, vocab.n_words)
    t2t_vars = {"params": t2t_state.params,
                "batch_stats": t2t_state.batch_stats}
    print(f"context part d: val CE {t2t_hist['val_loss'][-1]:.4f}, "
          f"val acc {t2t_hist['val_acc'][-1]:.3f}")

    bank = build_latent_dataset(store, dae_model=dae,
                                dae_variables=dae_vars, seq_model=seq,
                                seq_variables=seq_vars,
                                n_poses=n_frames, stride=n_frames)
    bank_val = build_latent_dataset(val_store, dae_model=dae,
                                    dae_variables=dae_vars,
                                    seq_model=seq, seq_variables=seq_vars,
                                    n_poses=n_frames, stride=n_frames,
                                    mean=store.pose_mean,
                                    std=store.pose_std)

    results = {"context_s": args.context,
               "train": {"val_ce": t2t_hist["val_loss"][-1],
                         "val_acc": t2t_hist["val_acc"][-1]}}
    for label, extra in (("greedy", {}),
                         ("sampled_t1", {"temperature": 1.0})):
        gen = GestureGenerator(
            t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq,
            seq_variables=seq_vars, dae_model=dae,
            dae_variables=dae_vars, vocab=vocab,
            pose_mean=store.pose_mean, pose_std=store.pose_std,
            n_frames=n_frames, sentence_frame_length=sent_len, fps=fps,
            max_words=max_words, mode="decode", latent_bank=bank,
            seed=0, text_context_s=args.context, **extra)
        m, _ = eval_generated_vs_gt(gen, store, val_store, dae,
                                    dae_vars, seq, seq_vars, n_frames,
                                    codes, bank_val, bank, fps)
        m.pop("_hist_gen"), m.pop("_hist_gt")
        results[label] = m
        print(f"\n=== context {label} ===")
        print(json.dumps(m, indent=2))

    out_path = os.path.join(args.out, "metrics_context.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
