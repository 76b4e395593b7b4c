"""Worked example: live streaming — words arrive with the speech,
motion leaves window by window.

Trains the same tiny chain as examples/full_pipeline.py, then drives a
StreamingGestureSession with a SIMULATED live caption feed (words
appear at their spoken time), printing each ~3 s window's motion the
moment its time range completes — the live-avatar integration pattern
(infer/streaming.py; served over HTTP by `g2v-serve` POST /stream).

Run:  python examples/live_stream.py [out_dir]     (~2 min on CPU)
      python examples/live_stream.py [out_dir] --recipe   # stream the
      recommended-recipe chain (4-stage rvq Part b + stage-conditional
      transformer Part d, configs/seq2seqtxt_recommended.yml shape)
"""
from __future__ import annotations

import os
import sys


def main(out_dir: str = "example_stream_out",
         use_tpu: bool = False, recipe: bool = False) -> None:
    if not use_tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.corpus import make_corpus

    from gesture2vec_tpu.data.datasets import all_frames, pose_windows
    from gesture2vec_tpu.data.ingest import ingest_trinity
    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.data.teacher import encode_windows_with_dae
    from gesture2vec_tpu.infer.streaming import StreamingGestureSession
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.dae_trainer import (make_frame_model,
                                                   train_dae)
    from gesture2vec_tpu.train.seq_ae_trainer import (make_seq_ae,
                                                      train_seq_ae)
    from gesture2vec_tpu.train.text2token_trainer import (
        make_text2token, train_text2token)

    os.makedirs(out_dir, exist_ok=True)
    corpus = os.path.join(out_dir, "corpus")
    make_corpus(corpus, n_files=3, n_frames=360, with_audio=False)
    train_dir, _ = ingest_trinity(corpus)
    store = ClipStore(train_dir)

    print("training the tiny chain (a/b/d)...")
    dae_cfg = load_config(dict(name="dae", model="DAE", hidden_size=16,
                               dropout_prob=0.2, input_motion_dim=135,
                               epochs=2, batch_size=64,
                               learning_rate=0.005, random_seed=0))
    dae_state, _ = train_dae(dae_cfg, all_frames(store),
                             all_frames(store)[:64])
    dae = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_state.params}

    wins = pose_windows(store, 20, 10)
    lat = encode_windows_with_dae(dae, dae_vars, wins)
    sq_cfg = load_config(dict(name="vq", model="seq2seq", hidden_size=24,
                              n_layers=2, dropout_prob=0.1, epochs=2,
                              batch_size=16, learning_rate=0.002,
                              rep_learning_dim=16, n_poses=20,
                              n_pre_poses=1, autoencoder_vq=True,
                              autoencoder_vq_components=16,
                              autoencoder_att=False,
                              autoencoder_conditioned=True,
                              random_seed=0,
                              **({"autoencoder_vq_variant": "rvq",
                                  "rvq_stages": 4} if recipe else {})))
    sq_state, _ = train_seq_ae(sq_cfg, lat, lat[:16])
    seq = make_seq_ae(sq_cfg)
    seq_vars = {"params": sq_state.params,
                "batch_stats": sq_state.batch_stats}

    vocab = build_vocab("ex", [[w[0] for w in c["words"]]
                               for c in store], embedding_dim=32)
    sent = build_sentence_dataset(store, vocab, dae_model=dae,
                                  dae_variables=dae_vars, seq_model=seq,
                                  seq_variables=seq_vars,
                                  sentence_frame_length=60, stride=30,
                                  n_frames=20, fps=20, max_words=16,
                                  emit_stage_tokens=recipe)
    t2t_cfg = load_config(dict(name="t2t", model="seq2seq",
                               hidden_size=24, n_layers=2,
                               dropout_prob=0.1, epochs=2, batch_size=8,
                               learning_rate=0.003,
                               sentence_frame_length=60, n_poses=20,
                               n_pre_poses=1, autoencoder_vq=True,
                               autoencoder_vq_components=16,
                               autoencoder_att=True, wordembed_dim=32,
                               random_seed=0,
                               **({"token_stages": 4,
                                   "stage_conditional": True,
                                   "extras": {"t2t_arch": "transformer"}}
                                  if recipe else {})))
    t2t_state, _ = train_text2token(
        t2t_cfg, sent, sent, vocab.n_words,
        embedding_weights=vocab.word_embedding_weights)
    t2t = make_text2token(t2t_cfg, vocab.n_words)
    t2t_vars = {"params": t2t_state.params,
                "batch_stats": t2t_state.batch_stats}

    gen = GestureGenerator(
        t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq,
        seq_variables=seq_vars, dae_model=dae, dae_variables=dae_vars,
        vocab=vocab, pose_mean=store.pose_mean, pose_std=store.pose_std,
        n_frames=20, sentence_frame_length=60, fps=20, max_words=16,
        mode="decode", seed=0)

    # ---- the live part: captions arrive AT their spoken time --------
    transcript = [["hello", 0.2, 0.5], ["world", 0.8, 1.1],
                  ["these", 2.4, 2.7], ["are", 3.0, 3.2],
                  ["live", 4.1, 4.5], ["gestures", 5.0, 5.6],
                  ["from", 6.4, 6.7], ["speech", 7.2, 7.8],
                  ["goodbye", 8.3, 8.9]]
    duration = 9.0

    sess = StreamingGestureSession(gen)
    emitted = []
    print("\nsimulated live feed (window = "
          f"{sess.unit:.0f} s of speech):")
    for now in np.arange(0.5, duration + 0.5, 0.5):
        seen = [w for w in transcript if w[1] <= now]   # words so far
        for frames, tokens in sess.push(seen, now_s=float(now)):
            emitted.append(frames)
            print(f"  t={now:4.1f}s -> window {len(emitted) - 1} ready: "
                  f"{frames.shape[0]} frames, "
                  f"tokens {np.asarray(tokens).tolist()}")
    for frames, tokens in sess.finish(duration):
        emitted.append(frames)
        print(f"  finish  -> window {len(emitted) - 1} ready: "
              f"{frames.shape[0]} frames")

    live = np.concatenate(emitted, axis=0)

    # the streamed result is bit-identical to the offline batch path
    batch_frames, _ = gen.generate(transcript, duration_s=duration)
    np.testing.assert_allclose(live, batch_frames, atol=1e-5)
    print(f"\nstreamed {live.shape[0]} frames across {len(emitted)} "
          "windows == offline generate() output (verified)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 and not
         sys.argv[1].startswith("-") else "example_stream_out",
         use_tpu="--tpu" in sys.argv, recipe="--recipe" in sys.argv)
