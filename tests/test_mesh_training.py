"""Data/tensor-parallel training over the 8-device virtual mesh."""
import jax
import numpy as np

from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.seq_ae_trainer import train_seq_ae


def _windows(rng, n=64, t=8, d=12):
    from tests.fixtures import make_smooth_windows
    return make_smooth_windows(rng, n=n, t=t, d=d)


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


def test_dae_mesh_matches_single_device(rng):
    """Part a: dp-sharded DAE training must match the single-device
    run step for step."""
    from gesture2vec_tpu.train.dae_trainer import train_dae
    frames = rng.normal(size=(256, 24)).astype(np.float32)
    base = dict(name="dae_m", model="DAE", hidden_size=10, epochs=2,
                batch_size=32, learning_rate=0.002, dropout_prob=0.2,
                input_motion_dim=24, random_seed=0)
    _, h1 = train_dae(load_config(base), frames, frames[:32])
    _, h2 = train_dae(load_config({**base, "mesh_shape": {"dp": 8}}),
                      frames, frames[:32])
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(h1["val_loss"], h2["val_loss"], rtol=1e-4)


def test_text2token_mesh_matches_single_device(rng):
    """Part d: dp-sharded (+tp row-sharded embedding) token training
    must match the single-device run."""
    from gesture2vec_tpu.train.text2token_trainer import train_text2token
    n, s, steps = 64, 12, 4
    data = {"word_ids": rng.integers(4, 40, size=(n, s)).astype(np.int32),
            "lengths": np.full((n,), s, np.int32),
            "tokens": rng.integers(0, 16, size=(n, steps)).astype(np.int32)}
    val = {k: v[:16] for k, v in data.items()}
    base = dict(name="t2t_m", model="seq2seq", hidden_size=16, n_layers=1,
                dropout_prob=0.0, epochs=2, batch_size=16,
                learning_rate=0.002, n_poses=8, n_pre_poses=1,
                sentence_frame_length=32, autoencoder_vq_components=16,
                autoencoder_att=True, wordembed_dim=8, random_seed=0)
    _, h1 = train_text2token(load_config(base), data, val, n_words=40)
    _, h2 = train_text2token(load_config({**base,
                                          "mesh_shape": {"dp": 4, "tp": 2}}),
                             data, val, n_words=40)
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"],
                               rtol=1e-4)
    # val_acc is an argmax metric over 48 predictions: the mesh psum's
    # different reduction order can legitimately flip a borderline
    # prediction after training, so allow up to 2 flips rather than
    # demanding bit-equality of a discrete statistic
    np.testing.assert_allclose(h1["val_acc"], h2["val_acc"],
                               atol=2.0 / 48 + 1e-9)


def test_baseline_c2g_gan_train_on_mesh(rng):
    """Every remaining trainer honors cfg.mesh_shape (smoke: finite,
    decreasing losses on the 8-device mesh)."""
    from gesture2vec_tpu.train.gan_trainer import train_gan
    from gesture2vec_tpu.train.misc_trainers import train_baseline, train_c2g
    n, s, t, d = 64, 10, 8, 12
    data = {"word_ids": rng.integers(4, 30, size=(n, s)).astype(np.int32),
            "lengths": np.full((n,), s, np.int32),
            "poses": rng.normal(size=(n, t, d)).astype(np.float32)}
    cfg = load_config(dict(name="m3", model="seq2seq", hidden_size=16,
                           n_layers=1, dropout_prob=0.1, epochs=2,
                           batch_size=16, learning_rate=0.002, n_poses=t,
                           n_pre_poses=1, wordembed_dim=8, noise_dim=8,
                           autoencoder_vq_components=16, random_seed=0,
                           mesh_shape={"dp": 8}))
    _, hb = train_baseline(cfg, data, {k: v[:16] for k, v in data.items()},
                           n_words=30)
    assert np.isfinite(hb["train_loss"]).all()
    assert hb["train_loss"][-1] < hb["train_loss"][0]

    ids = rng.integers(0, 16, size=(n,)).astype(np.int32)
    lat = rng.normal(size=(n, t, d)).astype(np.float32)
    _, hc = train_c2g(cfg, ids, lat, ids[:16], lat[:16])
    assert np.isfinite(hc["train_loss"]).all()

    _, hg = train_gan(cfg.replace(epochs=1), data, n_words=30)
    assert np.isfinite(hg["g_loss"]).all()


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


def test_rvq_mesh_matches_single_device(rng):
    """The RVQ variant's residual codebooks ride the same tp row-shard
    rule (substring "codebook"); dp identity must hold for it too."""
    w = _windows(rng, n=32)
    base = dict(name="mrvq", model="seq2seq", hidden_size=12, n_layers=2,
                dropout_prob=0.0, epochs=1, batch_size=16,
                learning_rate=0.002, rep_learning_dim=12, n_poses=8,
                n_pre_poses=1, autoencoder_vq=True,
                autoencoder_vq_components=8,
                autoencoder_vq_variant="rvq", rvq_stages=2,
                random_seed=0)
    _, h1 = train_seq_ae(load_config(base), w, w[:16])
    _, h2 = train_seq_ae(load_config({**base,
                                      "mesh_shape": {"dp": 4, "tp": 2}}),
                         w, w[:16])
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"],
                               rtol=1e-4)


def test_teacher_sweeps_on_mesh_match_single_device(rng):
    """Corpus-axis ("sp") sharded teacher sweeps: encode_windows_with_dae
    and tokenize_windows under a mesh must reproduce the single-device
    sweep — latents to float tolerance, token ids exactly (the sweep is
    row-wise; sharding only changes placement, data/teacher._sweep_setup)."""
    import jax.numpy as jnp
    from gesture2vec_tpu.data.teacher import (encode_windows_with_dae,
                                              tokenize_windows)
    from gesture2vec_tpu.parallel.mesh import make_mesh
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.dae_trainer import make_frame_model
    from gesture2vec_tpu.train.seq_ae_trainer import make_seq_ae

    dae_cfg = load_config(dict(name="sp_dae", model="DAE", hidden_size=6,
                               epochs=1, batch_size=8, learning_rate=1e-3,
                               input_motion_dim=12, random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = dae.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, 12), jnp.float32))

    sq_cfg = load_config(dict(name="sp_sq", model="seq2seq", hidden_size=10,
                              n_layers=2, dropout_prob=0.0, epochs=1,
                              batch_size=8, learning_rate=1e-3,
                              rep_learning_dim=6, n_poses=4, n_pre_poses=1,
                              autoencoder_vq=True,
                              autoencoder_vq_components=12,
                              autoencoder_att=False,
                              autoencoder_conditioned=True, random_seed=0))
    seq = make_seq_ae(sq_cfg)
    seq_vars = seq.init({"params": jax.random.PRNGKey(1),
                         "dropout": jax.random.PRNGKey(2)},
                        jnp.zeros((2, 4, 6), jnp.float32),
                        jnp.zeros((2, 4, 6), jnp.float32), train=False)
    seq_vars = {"params": seq_vars["params"],
                "batch_stats": seq_vars.get("batch_stats", {})}

    # 37 windows: deliberately NOT a multiple of the device count so the
    # pad-and-trim path is exercised
    windows = rng.normal(size=(37, 4, 12)).astype(np.float32)
    mesh = make_mesh({"sp": 8})

    lat0 = encode_windows_with_dae(dae, dae_vars, windows, batch=16)
    lat1 = encode_windows_with_dae(dae, dae_vars, windows, batch=16,
                                   mesh=mesh)
    np.testing.assert_allclose(lat0, lat1, rtol=1e-6, atol=1e-6)

    tok0, sl0 = tokenize_windows(seq, seq_vars, lat0, batch=16)
    tok1, sl1 = tokenize_windows(seq, seq_vars, lat0, batch=16, mesh=mesh)
    np.testing.assert_array_equal(tok0, tok1)
    np.testing.assert_allclose(sl0, sl1, rtol=1e-5, atol=1e-6)
