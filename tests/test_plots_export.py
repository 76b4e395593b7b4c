"""Plots, codebook decode, and cluster sample export."""
import os

import numpy as np
import pytest

from gesture2vec_tpu.cluster.plots import (plot_attention,
                                           plot_codebook_tsne,
                                           plot_latent_space)


def test_plots(tmp_path, rng):
    cb = rng.normal(size=(40, 16)).astype(np.float32)
    p1 = str(tmp_path / "cb.png")
    plot_codebook_tsne(cb, p1, usage=rng.integers(0, 50, 40))
    assert os.path.getsize(p1) > 1000

    p2 = str(tmp_path / "lat.png")
    plot_latent_space(rng.normal(size=(100, 8)), p2,
                      labels=rng.integers(0, 5, 100))
    assert os.path.getsize(p2) > 1000

    p3 = str(tmp_path / "attn.png")
    plot_attention(rng.uniform(size=(6, 12)), p3,
                   words=[f"w{i}" for i in range(12)])
    assert os.path.getsize(p3) > 1000


def test_decode_codebook_and_export(tmp_path, rng):
    import jax

    from gesture2vec_tpu.cluster.latent_dataset import (decode_codebook,
                                                        export_cluster_samples)
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.dae_trainer import (init_state as dae_init,
                                                   make_frame_model)
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state as sq_init,
                                                      make_seq_ae)
    from gesture2vec_tpu.mocap.features import FeatureExtractor
    from gesture2vec_tpu.io.bvh import parse_bvh
    from tests.fixtures import make_synthetic_bvh

    opt = make_optimizer(1e-3)
    dae_cfg = load_config(dict(name="d", model="DAE", hidden_size=12,
                               epochs=1, batch_size=8,
                               input_motion_dim=135, random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_init(dae_cfg, dae, jax.random.PRNGKey(0),
                                   opt).params}
    sq_cfg = load_config(dict(name="s", model="seq2seq", hidden_size=16,
                              n_layers=2, dropout_prob=0.1, epochs=1,
                              batch_size=8, rep_learning_dim=12,
                              n_poses=10, n_pre_poses=1,
                              autoencoder_vq=True,
                              autoencoder_vq_components=8, random_seed=0))
    seq = make_seq_ae(sq_cfg)
    sst = sq_init(sq_cfg, seq, jax.random.PRNGKey(1), opt)
    seq_vars = {"params": sst.params, "batch_stats": sst.batch_stats}

    motions = decode_codebook(seq, seq_vars, dae, dae_vars)
    assert motions.shape == (8, 10, 135)
    assert np.isfinite(motions).all()

    # export: use a fitted trinity extractor + fake latent dataset
    fe = FeatureExtractor()
    fe.process(parse_bvh(make_synthetic_bvh(n_frames=120), from_text=True))
    data = {"tokens": np.array([0, 0, 1, 2, 0]),
            "dae_latents": rng.normal(size=(5, 10, 12)).astype(np.float32)}
    n = export_cluster_samples(data, str(tmp_path / "clusters"), fe,
                               np.zeros(135, np.float32),
                               np.ones(135, np.float32), dae, dae_vars,
                               max_per_token=2)
    assert n == 4  # 2 of token 0, 1 of token 1, 1 of token 2
    assert os.path.exists(str(tmp_path / "clusters" / "0" /
                              "sample_1.bvh"))


def test_silhouette_sweep(rng):
    from gesture2vec_tpu.cluster.analysis import silhouette_sweep

    blobs = np.concatenate([
        np.array([0, 0]) + rng.normal(0, 0.3, (40, 2)),
        np.array([8, 8]) + rng.normal(0, 0.3, (40, 2)),
        np.array([-8, 8]) + rng.normal(0, 0.3, (40, 2))]).astype(np.float32)
    scores = silhouette_sweep(blobs, k_range=range(2, 6))
    assert max(scores, key=scores.get) == 3  # 3 blobs -> best k is 3


def test_encoder_kernel_poses_and_unity(tmp_path, rng):
    from gesture2vec_tpu.cluster.analysis import (encoder_kernel_poses,
                                                  save_for_unity)
    from gesture2vec_tpu.mocap.fk import forward_kinematics
    from gesture2vec_tpu.io.bvh import parse_bvh
    from tests.fixtures import make_synthetic_bvh

    kernel = rng.normal(size=(135, 10))
    mean = np.zeros(135)
    std = np.ones(135)
    poses = encoder_kernel_poses(kernel, mean, std)
    assert poses.shape == (10, 135)

    d = parse_bvh(make_synthetic_bvh(n_frames=10), from_text=True)
    pos = forward_kinematics(d)
    out = str(tmp_path / "unity.txt")
    save_for_unity(pos, out)
    lines = open(out).read().splitlines()
    assert len(lines) == 10
    assert "Hips:" in lines[0]


def test_html_player(tmp_path):
    from gesture2vec_tpu.io.bvh import parse_bvh
    from gesture2vec_tpu.mocap.viz import save_html_player
    from tests.fixtures import make_synthetic_bvh

    d = parse_bvh(make_synthetic_bvh(n_frames=12), from_text=True)
    out = str(tmp_path / "player.html")
    save_html_player(d, out, title="test clip")
    html = open(out).read()
    assert "<canvas" in html and "bones" in html and "test clip" in html
    # frames embedded: 12 frames x joints x 2 coords
    import json
    import re
    payload = json.loads(re.search(r"const D = (\{.*?\});", html,
                                   re.S).group(1))
    assert len(payload["frames"]) == 12
    assert payload["fps"] == d.framerate
    assert all(len(b) == 2 for b in payload["bones"])


def test_plot_kernel_stickfigures(tmp_path, rng):
    """Plot_Kernel equivalent (ref: inference_DAE.py:358-407): kernel
    matrix heatmap + per-unit pose stickfigure + (J,9) heatmap PNGs."""
    from gesture2vec_tpu.cluster.analysis import plot_kernel_stickfigures
    from gesture2vec_tpu.io.bvh import parse_bvh
    from gesture2vec_tpu.mocap.features import FeatureExtractor
    from tests.fixtures import make_synthetic_bvh

    fe = FeatureExtractor()
    data = parse_bvh(make_synthetic_bvh(n_frames=40), from_text=True)
    feats, _ = fe.process(data)
    dim = feats.shape[1]
    kernel = rng.normal(size=(dim, 4)) * 0.05
    mean, std = feats.mean(0), feats.std(0) + 1e-3
    written = plot_kernel_stickfigures(kernel, fe, mean, std,
                                       str(tmp_path / "kernels"),
                                       max_units=2)
    # 1 matrix + 2 x (pose + heat)
    assert len(written) == 5
    assert all(os.path.getsize(p) > 1000 for p in written)


def test_plot_kernel_stickfigures_non_rotmat_width(tmp_path, rng):
    """A DAE over 12-feats-per-joint (TWH posrot) features whose width
    is not a multiple of 9 must not crash the heatmap reshape: the
    per-joint width is auto-detected (9/12/3)."""
    from gesture2vec_tpu.cluster.analysis import plot_kernel_stickfigures
    from gesture2vec_tpu.io.bvh import parse_bvh
    from tests.fixtures import make_synthetic_bvh

    data = parse_bvh(make_synthetic_bvh(n_frames=4), from_text=True)

    class _StubFE:  # to_bvh independent of the feature layout under test
        def to_bvh(self, feats):
            return data

    dim = 12 * 16  # 192: divisible by 12 and 3, NOT by 9
    kernel = rng.normal(size=(dim, 3)) * 0.05
    mean, std = np.zeros(dim), np.ones(dim)
    written = plot_kernel_stickfigures(kernel, _StubFE(), mean, std,
                                       str(tmp_path / "kernels12"),
                                       max_units=2)
    assert len(written) == 5
    heat = [p for p in written if p.endswith("_heat.png")]
    assert len(heat) == 2


def test_save_unity_latents(tmp_path, rng):
    """Save4Unity latents.txt format (ref: inference_DAE.py:218-264)."""
    from gesture2vec_tpu.cluster.analysis import save_unity_latents

    kernels = rng.normal(size=(6, 16))
    latents = rng.normal(size=(25, 16))
    indices = rng.integers(0, 4, size=25)
    out = str(tmp_path / "latents.txt")
    save_unity_latents(kernels, latents, indices, components=6, path=out)
    lines = open(out).read().splitlines()
    assert lines[0] == "6"
    assert len(lines) == 1 + 6 + 25
    assert len(lines[1].split(",")) == 2          # kernel: x,y
    last = lines[-1].split(",")
    assert len(last) == 4                          # i,x,y,index
    assert int(last[0]) == 24
