"""Checkpoint resume + export tool utilities."""
import json
import os

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
