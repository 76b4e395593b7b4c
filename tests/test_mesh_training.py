"""Data/tensor-parallel training over the 8-device virtual mesh."""
import jax
import numpy as np

from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.seq_ae_trainer import train_seq_ae


def _windows(rng, n=64, t=8, d=12):
    base = rng.normal(size=(n, 1, d)).astype(np.float32)
    ts = np.linspace(0, 1, t)[None, :, None].astype(np.float32)
    return (base + np.sin(2 * np.pi * ts + base)).astype(np.float32)


def test_seq_ae_trains_on_mesh(rng):
    assert len(jax.devices()) == 8
    cfg = load_config(dict(name="mesh", model="seq2seq", hidden_size=16,
                           n_layers=2, dropout_prob=0.1, epochs=2,
                           batch_size=16, learning_rate=0.002,
                           rep_learning_dim=12, n_poses=8, n_pre_poses=1,
                           autoencoder_vq=True,
                           autoencoder_vq_components=16,
                           autoencoder_att=False,
                           autoencoder_conditioned=True, random_seed=0,
                           mesh_shape={"dp": 4, "tp": 2}))
    w = _windows(rng)
    state, hist = train_seq_ae(cfg, w, w[:16])
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_dryrun_multichip_self_provisions():
    """Driver contract: dryrun_multichip must succeed even when the
    live backend has fewer devices than requested (round-1 failure,
    MULTICHIP_r01.json). Asking for 16 devices from this 8-device
    pytest environment forces the subprocess re-exec branch."""
    import os
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    try:
        import __graft_entry__ as g
        g.dryrun_multichip(16)
    finally:
        sys.path.remove(root)


def test_mesh_matches_single_device(rng):
    """Same data, same seed: dp-sharded training must match the
    single-device run (the partitioner only changes layout)."""
    w = _windows(rng, n=32)
    base = dict(name="m", model="seq2seq", hidden_size=12, n_layers=2,
                dropout_prob=0.0, epochs=1, batch_size=16,
                learning_rate=0.002, rep_learning_dim=12, n_poses=8,
                n_pre_poses=1, autoencoder_vq=True,
                autoencoder_vq_components=8, autoencoder_att=False,
                autoencoder_conditioned=True, random_seed=0)
    _, h1 = train_seq_ae(load_config(base), w, w[:16])
    _, h2 = train_seq_ae(load_config({**base,
                                      "mesh_shape": {"dp": 8}}), w, w[:16])
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"],
                               rtol=1e-4)
