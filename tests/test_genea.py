"""TWH/GENEA dataset variant end-to-end: ingest -> Part a -> Part b."""
import json
import os

import numpy as np
import pytest

from gesture2vec_tpu.data.datasets import all_frames, pose_windows
from gesture2vec_tpu.data.ingest import ingest_twh
from gesture2vec_tpu.data.store import ClipStore
from gesture2vec_tpu.data.teacher import (encode_windows_with_dae,
                                          tokenize_windows)
from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.dae_trainer import make_frame_model, train_dae
from gesture2vec_tpu.train.seq_ae_trainer import make_seq_ae, train_seq_ae
from tests.fixtures import make_synthetic_twh_bvh


@pytest.fixture(scope="module")
def twh_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("twh"))
    os.makedirs(os.path.join(root, "bvh"))
    os.makedirs(os.path.join(root, "tsv"))
    for i in range(3):
        with open(os.path.join(root, "bvh", f"val_{i:03d}.bvh"), "w") as f:
            f.write(make_synthetic_twh_bvh(n_frames=300, fps=30, seed=i))
        with open(os.path.join(root, "tsv", f"val_{i:03d}.tsv"), "w") as f:
            for k in range(40):
                f.write(f"{k * 0.24:.2f}\t{k * 0.24 + 0.2:.2f}\tword{k}\n")
    return ingest_twh(root, variant="test1", with_audio=False)


def test_twh_ingest(twh_corpus):
    train_dir, val_dir = twh_corpus
    tr, va = ClipStore(train_dir), ClipStore(val_dir)
    assert len(tr) == 2 and len(va) == 1   # first file -> val (<100 files)
    assert tr.pose_mean.shape == (162,)    # 18 joints x 9
    assert tr.meta["variant"] == "test1"
    assert len(tr[0]["words"]) == 40


def test_genea_parts_a_b(twh_corpus):
    train_dir, _ = twh_corpus
    store = ClipStore(train_dir)
    frames = all_frames(store)
    assert frames.shape[1] == 162

    dae_cfg = load_config(dict(name="dae_genea", model="DAE",
                               hidden_size=16, epochs=2, batch_size=32,
                               learning_rate=0.005, input_motion_dim=162,
                               random_seed=0))
    dae_state, hist = train_dae(dae_cfg, frames, frames[:32])
    assert np.isfinite(hist["train_loss"]).all()
    dae_model = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_state.params}

    windows = pose_windows(store, 10, stride=5)
    latents = encode_windows_with_dae(dae_model, dae_vars, windows)
    cfg = load_config(dict(name="vqvae_genea", model="seq2seq",
                           hidden_size=24, n_layers=2, dropout_prob=0.1,
                           epochs=2, batch_size=16, learning_rate=0.002,
                           rep_learning_dim=16, n_poses=10, n_pre_poses=1,
                           autoencoder_vq=True,
                           autoencoder_vq_components=20,
                           autoencoder_att=False,
                           autoencoder_conditioned=True, random_seed=0))
    state, hist = train_seq_ae(cfg, latents, latents[:16])
    assert np.isfinite(hist["train_loss"]).all()

    seq_model = make_seq_ae(cfg)
    seq_vars = {"params": state.params, "batch_stats": state.batch_stats}
    tokens, seq_latents = tokenize_windows(seq_model, seq_vars, latents)
    assert tokens.shape[0] == latents.shape[0]
    assert tokens.max() < 20


def test_genea_full_chain(twh_corpus, tmp_path):
    """GENEA parts a+b+d -> text -> motion -> TWH BVH export."""
    import jax

    from gesture2vec_tpu.cluster.latent_dataset import build_latent_dataset
    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.infer.exporter import frames_to_bvh_twh
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.io.bvh import parse_bvh
    from gesture2vec_tpu.mocap.features import TWHFeatureExtractor
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train.text2token_trainer import (make_text2token,
                                                          train_text2token)

    train_dir, _ = twh_corpus
    store = ClipStore(train_dir)

    dae_cfg = load_config(dict(name="dg", model="DAE", hidden_size=16,
                               epochs=2, batch_size=32,
                               learning_rate=0.005, input_motion_dim=162,
                               random_seed=0))
    dae_state, _ = train_dae(dae_cfg, all_frames(store),
                             all_frames(store)[:32])
    dae = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_state.params}

    latents = encode_windows_with_dae(dae, dae_vars,
                                      pose_windows(store, 10, stride=5))
    sq_cfg = load_config(dict(name="vg", model="seq2seq", hidden_size=24,
                              n_layers=2, dropout_prob=0.1, epochs=2,
                              batch_size=16, learning_rate=0.002,
                              rep_learning_dim=16, n_poses=10,
                              n_pre_poses=1, autoencoder_vq=True,
                              autoencoder_vq_components=20,
                              random_seed=0))
    sq_state, _ = train_seq_ae(sq_cfg, latents, latents[:16])
    seq = make_seq_ae(sq_cfg)
    seq_vars = {"params": sq_state.params,
                "batch_stats": sq_state.batch_stats}

    # TWH corpus is 10 fps (test1): 2-second windows = 20 frames
    vocab = build_vocab("g", [[w[0] for w in c["words"]] for c in store],
                        embedding_dim=16)
    sent = build_sentence_dataset(
        store, vocab, dae_model=dae, dae_variables=dae_vars,
        seq_model=seq, seq_variables=seq_vars,
        sentence_frame_length=20, stride=10, n_frames=10, fps=10,
        max_words=12)
    t2t_cfg = load_config(dict(name="tg", model="seq2seq", hidden_size=24,
                               n_layers=2, dropout_prob=0.1, epochs=2,
                               batch_size=8, learning_rate=0.003,
                               sentence_frame_length=20, n_poses=10,
                               n_pre_poses=1, autoencoder_vq=True,
                               autoencoder_vq_components=20,
                               autoencoder_att=True, wordembed_dim=16,
                               random_seed=0))
    t2t_state, _ = train_text2token(
        t2t_cfg, sent, sent, vocab.n_words,
        embedding_weights=vocab.word_embedding_weights)
    t2t = make_text2token(t2t_cfg, vocab.n_words)
    t2t_vars = {"params": t2t_state.params,
                "batch_stats": t2t_state.batch_stats}

    bank = build_latent_dataset(store, dae_model=dae,
                                dae_variables=dae_vars, seq_model=seq,
                                seq_variables=seq_vars, n_poses=10,
                                stride=5)
    gen = GestureGenerator(
        t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq,
        seq_variables=seq_vars, dae_model=dae, dae_variables=dae_vars,
        vocab=vocab, pose_mean=store.pose_mean, pose_std=store.pose_std,
        n_frames=10, sentence_frame_length=20, fps=10, max_words=12,
        mode="exemplar", latent_bank=bank, seed=0)
    words = [[f"word{k}", k * 0.8, k * 0.8 + 0.3] for k in range(10)]
    frames, tokens = gen.generate(words, duration_s=4.0)
    assert frames.shape[1] == 162

    fe = TWHFeatureExtractor("test1")
    from tests.fixtures import make_synthetic_twh_bvh
    fe.process(parse_bvh(make_synthetic_twh_bvh(), from_text=True))
    out = str(tmp_path / "genea_generated.bvh")
    frames_to_bvh_twh(frames, fe, path=out)
    d = parse_bvh(out)
    assert d.n_frames == frames.shape[0]
    assert d.root_name == "body_world"
