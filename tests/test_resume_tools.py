"""Checkpoint resume + export tool utilities."""
import json
import os

import jax
import numpy as np

from gesture2vec_tpu.cli.tools import human_study_clips, unityfy
from gesture2vec_tpu.io.bvh import parse_bvh
from gesture2vec_tpu.train import checkpoints
from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.dae_trainer import train_dae
from tests.fixtures import make_synthetic_bvh


def test_dae_resume(rng, tmp_path):
    frames = rng.normal(size=(256, 30)).astype(np.float32)
    cfg = load_config(dict(name="r", model="DAE", hidden_size=12,
                           epochs=2, batch_size=32, learning_rate=0.003,
                           input_motion_dim=30, random_seed=0))
    state1, hist1 = train_dae(cfg, frames, frames[:32],
                              save_dir=str(tmp_path), save_every=100)
    ckpt = checkpoints.checkpoint_filename(str(tmp_path), "r_H12", 2)
    assert os.path.exists(ckpt)

    cfg2 = cfg.replace(epochs=4)
    state2, hist2 = train_dae(cfg2, frames, frames[:32],
                              save_dir=str(tmp_path), save_every=100,
                              resume_from=ckpt)
    # resumed run trains only the remaining epochs and keeps improving
    assert len(hist2["train_loss"]) == 2
    assert hist2["train_loss"][-1] < hist1["train_loss"][-1]


def test_unityfy(tmp_path):
    jdir = tmp_path / "transcripts"
    jdir.mkdir()
    (jdir / "a.json").write_text(json.dumps([
        {"word": "hello", "start_time": "0.10s", "end_time": "0.40s"},
        {"word": "world", "start_time": "0.50s", "end_time": "0.90s"},
    ]))
    out = unityfy(str(jdir))
    assert len(out) == 1
    text = open(out[0]).read()
    assert "0.1,0.4,hello" in text
    assert "0.5,0.9,world" in text


def test_human_study_clips(tmp_path):
    bvh_path = tmp_path / "clip.bvh"
    bvh_path.write_text(make_synthetic_bvh(n_frames=720, fps=60))
    tpath = tmp_path / "clip.json"
    tpath.write_text(json.dumps([
        {"word": f"w{i}", "start_time": f"{i}.0s",
         "end_time": f"{i}.4s"} for i in range(10)
    ]))
    out = human_study_clips(str(bvh_path), str(tpath),
                            str(tmp_path / "study"), clip_seconds=6.0)
    assert len(out) == 2  # 12 s / 6 s
    d = parse_bvh(out[0])
    assert d.n_frames == 360
    words0 = open(out[0].replace(".bvh", ".txt")).read().split()
    assert len(words0) > 0


def test_seq_ae_bit_exact_resume(rng, tmp_path):
    """With save_optimizer (default on), resume continues the exact run:
    a 2+2-epoch resumed training must equal a straight 4-epoch one
    (same Adam moments, same dropout stream, same final params)."""
    from gesture2vec_tpu.train.seq_ae_trainer import train_seq_ae

    win = rng.normal(size=(64, 10, 16)).astype(np.float32)
    base = dict(name="rex", model="seq2seq", hidden_size=16, n_layers=2,
                dropout_prob=0.2, batch_size=16, learning_rate=0.002,
                rep_learning_dim=16, n_poses=10, n_pre_poses=1,
                autoencoder_vq=True, autoencoder_vq_components=8,
                random_seed=3)

    straight, _ = train_seq_ae(load_config(dict(base, epochs=4)),
                               win, win[:16],
                               save_dir=str(tmp_path / "a"), save_every=4)

    train_seq_ae(load_config(dict(base, epochs=2)), win, win[:16],
                 save_dir=str(tmp_path / "b"), save_every=2)
    ckpt = checkpoints.checkpoint_filename(str(tmp_path / "b"), "rex", 2)
    payload = checkpoints.load_checkpoint(ckpt)
    assert payload["extra"].get("opt_state") is not None
    assert payload["extra"].get("rng") is not None
    resumed, _ = train_seq_ae(load_config(dict(base, epochs=4)),
                              win, win[:16],
                              save_dir=str(tmp_path / "b"), save_every=4,
                              resume_from=ckpt)

    flat_s = jax.tree_util.tree_leaves(straight.params)
    flat_r = jax.tree_util.tree_leaves(resumed.params)
    assert len(flat_s) == len(flat_r)  # zip must not truncate silently
    for a, b in zip(flat_s, flat_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_without_optimizer_state_still_works(rng, tmp_path):
    """save_optimizer=false checkpoints resume with a fresh optimizer -
    the reference's own warm-restart semantics."""
    from gesture2vec_tpu.train.seq_ae_trainer import train_seq_ae

    win = rng.normal(size=(32, 10, 16)).astype(np.float32)
    base = dict(name="rwo", model="seq2seq", hidden_size=16, n_layers=1,
                dropout_prob=0.0, batch_size=16, learning_rate=0.002,
                rep_learning_dim=16, n_poses=10, n_pre_poses=1,
                autoencoder_vq=True, autoencoder_vq_components=8,
                random_seed=0, save_optimizer=False)
    train_seq_ae(load_config(dict(base, epochs=1)), win, win[:16],
                 save_dir=str(tmp_path), save_every=1)
    ckpt = checkpoints.checkpoint_filename(str(tmp_path), "rwo", 1)
    payload = checkpoints.load_checkpoint(ckpt)
    assert payload["extra"].get("opt_state") is None
    state, hist = train_seq_ae(load_config(dict(base, epochs=2)),
                               win, win[:16], resume_from=ckpt)
    assert len(hist["train_loss"]) == 1
