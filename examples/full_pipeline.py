"""Worked example: the complete pipeline as a Python script.

Builds a synthetic Trinity-style corpus, trains Parts a/b/d, builds the
exemplar bank, and generates BVH motion from a transcript - the same
flow as the CLI, but with every artifact visible as a Python object.

Run:  python examples/full_pipeline.py [out_dir]
(CPU by default; pass --tpu to run on the accelerator.)
"""
from __future__ import annotations

import logging
import os
import sys


def main(out_dir: str = "example_out", use_tpu: bool = False) -> None:
    if not use_tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.corpus import make_corpus

    from gesture2vec_tpu.cluster.latent_dataset import build_latent_dataset
    from gesture2vec_tpu.data.datasets import all_frames, pose_windows
    from gesture2vec_tpu.data.ingest import ingest_trinity
    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.data.teacher import encode_windows_with_dae
    from gesture2vec_tpu.infer.exporter import frames_to_bvh
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.mocap.features import FeatureExtractor
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.dae_trainer import (make_frame_model,
                                                   train_dae)
    from gesture2vec_tpu.train.seq_ae_trainer import (make_seq_ae,
                                                      train_seq_ae)
    from gesture2vec_tpu.train.text2token_trainer import (make_text2token,
                                                          train_text2token)

    logging.basicConfig(level=logging.INFO)
    os.makedirs(out_dir, exist_ok=True)

    # 1. corpus -> clip stores
    corpus = os.path.join(out_dir, "corpus")
    make_corpus(corpus, n_files=3, n_frames=600, fps=60)
    train_dir, val_dir = ingest_trinity(corpus)
    store, val_store = ClipStore(train_dir), ClipStore(val_dir)

    # 2. Part a: frame DAE
    dae_cfg = load_config(dict(name="dae", model="DAE", hidden_size=40,
                               epochs=8, batch_size=64,
                               learning_rate=0.005, input_motion_dim=135,
                               random_seed=0))
    dae_state, _ = train_dae(dae_cfg, all_frames(store),
                             all_frames(val_store, store.pose_mean,
                                        store.pose_std))
    dae = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_state.params}

    # 3. Part b: gesture tokenizer over frozen-DAE latents
    latents = encode_windows_with_dae(dae, dae_vars,
                                      pose_windows(store, 20, 5))
    sq_cfg = load_config(dict(name="vqvae", model="seq2seq",
                              hidden_size=64, n_layers=2,
                              dropout_prob=0.1, epochs=6, batch_size=32,
                              learning_rate=0.002, rep_learning_dim=40,
                              n_poses=20, n_pre_poses=1,
                              autoencoder_vq=True,
                              autoencoder_vq_components=64,
                              random_seed=0))
    sq_state, _ = train_seq_ae(sq_cfg, latents, latents[:32])
    seq = make_seq_ae(sq_cfg)
    seq_vars = {"params": sq_state.params,
                "batch_stats": sq_state.batch_stats}

    # 4. Part c: exemplar bank
    bank = build_latent_dataset(store, dae_model=dae,
                                dae_variables=dae_vars, seq_model=seq,
                                seq_variables=seq_vars, n_poses=20,
                                stride=5)

    # 5. Part d: text -> gesture tokens
    vocab = build_vocab("corpus", [[w[0] for w in c["words"]]
                                   for c in store], embedding_dim=64)
    sent = build_sentence_dataset(store, vocab, dae_model=dae,
                                  dae_variables=dae_vars, seq_model=seq,
                                  seq_variables=seq_vars,
                                  sentence_frame_length=60, stride=20,
                                  n_frames=20, fps=20, max_words=24)
    t2t_cfg = load_config(dict(name="t2t", model="seq2seq",
                               hidden_size=64, n_layers=2,
                               dropout_prob=0.1, epochs=8, batch_size=8,
                               learning_rate=0.003,
                               sentence_frame_length=60, n_poses=20,
                               n_pre_poses=1, autoencoder_vq=True,
                               autoencoder_vq_components=64,
                               autoencoder_att=True, wordembed_dim=64,
                               random_seed=0))
    t2t_state, _ = train_text2token(
        t2t_cfg, sent, sent, vocab.n_words,
        embedding_weights=vocab.word_embedding_weights)
    t2t = make_text2token(t2t_cfg, vocab.n_words)
    t2t_vars = {"params": t2t_state.params,
                "batch_stats": t2t_state.batch_stats}

    # 6. transcript -> motion -> BVH (both synthesis modes)
    words = [["hello", 0.2, 0.5], ["world", 0.8, 1.1],
             ["these", 1.4, 1.7], ["are", 1.9, 2.1],
             ["gestures", 2.4, 2.9], ["made", 3.2, 3.5],
             ["from", 3.8, 4.0], ["speech", 4.4, 4.9]]
    fe = FeatureExtractor.load(os.path.join(corpus, "store",
                                            "data_pipe.json"))
    for mode in ("exemplar", "decode"):
        gen = GestureGenerator(
            t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq,
            seq_variables=seq_vars, dae_model=dae, dae_variables=dae_vars,
            vocab=vocab, pose_mean=store.pose_mean,
            pose_std=store.pose_std, n_frames=20,
            sentence_frame_length=60, fps=20, max_words=24, mode=mode,
            latent_bank=bank, seed=0)
        frames, tokens = gen.generate(words, duration_s=6.0)
        out = os.path.join(out_dir, f"generated_{mode}.bvh")
        frames_to_bvh(frames, fe, path=out)
        print(f"{mode}: {frames.shape[0]} frames, tokens={tokens.tolist()}"
              f" -> {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 and not
         sys.argv[1].startswith("-") else "example_out",
         use_tpu="--tpu" in sys.argv)
