"""Baseline Seq2SeqNet, cluster2gesture, and GAN variants."""
import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.gan_trainer import (build_gan, init_gan,
                                               make_gan_step)
from gesture2vec_tpu.train.misc_trainers import (train_baseline, train_c2g)
from gesture2vec_tpu.train.optim import make_optimizer
from gesture2vec_tpu.train import checkpoints

N_WORDS, MAXW, T, D = 30, 8, 10, 16


def _cfg(**kw):
    base = dict(name="test_misc", model="seq2seq", hidden_size=24,
                n_layers=2, dropout_prob=0.1, epochs=3, batch_size=16,
                learning_rate=0.003, n_poses=T, n_pre_poses=2,
                wordembed_dim=24, noise_dim=8,
                autoencoder_vq_components=12, random_seed=0,
                loss_l1_weight=5, loss_cont_weight=0.1,
                loss_var_weight=0.5)
    base.update(kw)
    return load_config(base)


def _text_pose_data(rng, n=64):
    lengths = rng.integers(3, MAXW, size=n).astype(np.int32)
    word_ids = np.zeros((n, MAXW), np.int32)
    for i, L in enumerate(lengths):
        word_ids[i, :L] = rng.integers(4, N_WORDS, size=L)
    ts = np.linspace(0, 1, T)[None, :, None]
    base = rng.normal(size=(n, 1, D))
    poses = (base + 0.5 * np.sin(2 * np.pi * ts + base)).astype(np.float32)
    return {"word_ids": word_ids, "lengths": lengths, "poses": poses}


def test_baseline_trains(rng, tmp_path):
    cfg = _cfg()
    data = _text_pose_data(rng)
    state, hist = train_baseline(cfg, data, data, N_WORDS,
                                 save_dir=str(tmp_path))
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    model, variables, _ = checkpoints.load_checkpoint_and_model(
        checkpoints.checkpoint_filename(str(tmp_path), "test_misc",
                                        cfg.epochs), "baseline")
    res = model.apply(variables, jnp.asarray(data["word_ids"][:4]),
                      jnp.asarray(data["lengths"][:4]),
                      jnp.asarray(data["poses"][:4]), train=False)
    assert res["outputs"].shape == (4, T, D)


def test_c2g_trains(rng, tmp_path):
    cfg = _cfg(epochs=4)
    n = 96
    ids = rng.integers(0, 12, size=n).astype(np.int32)
    # target latents correlated with cluster id -> learnable
    ts = np.linspace(0, 1, T)[None, :, None]
    latents = (ids[:, None, None] / 6.0 - 1.0 +
               0.1 * np.sin(2 * np.pi * ts)).astype(np.float32)
    latents = np.tile(latents, (1, 1, D))
    state, hist = train_c2g(cfg, ids, latents, ids[:16], latents[:16],
                            save_dir=str(tmp_path))
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    model, variables, _ = checkpoints.load_checkpoint_and_model(
        checkpoints.checkpoint_filename(str(tmp_path), "test_misc",
                                        cfg.epochs), "c2g")
    out = model.apply(variables, jnp.asarray(ids[:4]), train=False)
    assert out.shape == (4, T, D)
    # frame 0 is zeros per the reference contract
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0, atol=1e-6)


def test_gan_step_runs(rng):
    cfg = _cfg(epochs=1)
    data = _text_pose_data(rng, n=16)
    g, d = build_gan(cfg, N_WORDS, D)
    g_opt = make_optimizer(1e-3)
    d_opt = make_optimizer(1e-3)
    state = init_gan(g, d, jax.random.PRNGKey(0), g_opt, d_opt,
                     max_words=MAXW)
    step = make_gan_step(g, d, g_opt, d_opt, unroll_steps=2)
    for i in range(2):
        state, metrics = step(state,
                              jnp.asarray(data["word_ids"]),
                              jnp.asarray(data["lengths"]),
                              jnp.asarray(data["poses"]),
                              jax.random.PRNGKey(i + 1))
    assert np.isfinite(float(metrics["g_loss"]))
    assert np.isfinite(float(metrics["d_real"]))
    # generator produces motion of the right shape
    gen = g.apply({"params": state.g_params,
                   "batch_stats": state.g_batch_stats},
                  jnp.asarray(data["word_ids"][:4]),
                  jnp.asarray(data["lengths"][:4]),
                  jnp.zeros((4, cfg.noise_dim)),
                  jnp.asarray(data["poses"][:4, 0]), train=False)
    assert gen.shape == (4, T, D)


def test_gan_keep_unrolled_parity_switch(rng):
    """gan_keep_unrolled=True keeps the unrolled D updates (the
    reference's literal aliased-state_dict behavior); the default
    restores D to its post-first-update state. Same inputs/rng: the
    generator update is identical in both modes (G always steps against
    the unrolled D), only the surviving D params differ."""
    cfg = _cfg(epochs=1)
    data = _text_pose_data(rng, n=8)
    g, d = build_gan(cfg, N_WORDS, D)
    g_opt = make_optimizer(1e-3, clip_norm=None)
    d_opt = make_optimizer(1e-3, clip_norm=None)
    state0 = init_gan(g, d, jax.random.PRNGKey(0), g_opt, d_opt,
                      max_words=MAXW)
    args = (jnp.asarray(data["word_ids"]), jnp.asarray(data["lengths"]),
            jnp.asarray(data["poses"]), jax.random.PRNGKey(5))
    restore = make_gan_step(g, d, g_opt, d_opt, unroll_steps=2,
                            keep_unrolled=False)
    keep = make_gan_step(g, d, g_opt, d_opt, unroll_steps=2,
                         keep_unrolled=True)
    # fresh states (donated): re-init identically
    s_r, _ = restore(state0, *args)
    state0b = init_gan(g, d, jax.random.PRNGKey(0), g_opt, d_opt,
                       max_words=MAXW)
    s_k, _ = keep(state0b, *args)
    g_leaves_r = jax.tree_util.tree_leaves(s_r.g_params)
    g_leaves_k = jax.tree_util.tree_leaves(s_k.g_params)
    for a, b in zip(g_leaves_r, g_leaves_k):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    d_diff = max(float(jnp.max(jnp.abs(a - b))) for a, b in
                 zip(jax.tree_util.tree_leaves(s_r.d_params),
                     jax.tree_util.tree_leaves(s_k.d_params)))
    assert d_diff > 0.0, "unrolled D updates were not kept"


def test_require_full_batch_guard():
    """Datasets smaller than batch_size fail fast instead of silently
    training zero batches and checkpointing untrained params."""
    import pytest

    from gesture2vec_tpu.train.token_loop import require_full_batch
    require_full_batch(8, 8, "x")
    with pytest.raises(ValueError, match="at least one full batch"):
        require_full_batch(7, 8, "x")


def test_baseline_inference(rng):
    """Sliding-window baseline generation with seed carry + blending
    (ref: inference.py:53-96)."""
    from gesture2vec_tpu.infer.baseline_infer import generate_baseline
    from gesture2vec_tpu.text.vocab import Vocab
    from gesture2vec_tpu.train.misc_trainers import make_baseline
    from gesture2vec_tpu.train.optim import make_optimizer

    cfg = _cfg()
    vocab = Vocab("t")
    for i in range(20):
        vocab.index_word(f"w{i}")
    model = make_baseline(cfg, vocab.n_words, D)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   jnp.zeros((1, 8), jnp.int32),
                   jnp.ones((1,), jnp.int32),
                   jnp.zeros((1, T, D)), train=False)
    words = [[f"w{k}", k * 0.4, k * 0.4 + 0.2] for k in range(12)]
    out = generate_baseline(model, v, vocab, words, duration_s=3.0,
                            pose_mean=np.zeros(D, np.float32),
                            pose_std=np.ones(D, np.float32), fps=20,
                            max_words=8, overlap=4)
    assert out.shape == (60, D)
    assert np.isfinite(out).all()


def test_c2g_samples_cli_surface(rng, tmp_path):
    """cli.tools.c2g_samples end-to-end: trained c2g + DAE checkpoints
    -> per-cluster BVH samples via TWO batched device programs (the
    per-cluster eager loop it replaces was tunnel-pathological)."""
    import os

    from gesture2vec_tpu.cli.tools import c2g_samples
    from gesture2vec_tpu.data.datasets import all_frames, normalize
    from gesture2vec_tpu.data.ingest import ingest_trinity
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.train.dae_trainer import train_dae
    from tests.corpus import make_corpus

    root = make_corpus(str(tmp_path / "corpus"), n_files=2, n_frames=160,
                       with_audio=False)
    store_dir, _ = ingest_trinity(root)
    store = ClipStore(store_dir)
    frames = normalize(all_frames(store), store.pose_mean,
                       store.pose_std)

    lat = 12
    dae_cfg = _cfg(name="c2gs_dae", model="DAE", hidden_size=lat,
                   input_motion_dim=frames.shape[1], epochs=1)
    train_dae(dae_cfg, frames, frames[:32], save_dir=str(tmp_path),
              save_every=100)
    dae_ckpt = checkpoints.checkpoint_filename(str(tmp_path),
                                               "c2gs_dae_H12", 1)

    ids = rng.integers(0, 4, size=48).astype(np.int32)
    latents = np.tile(ids[:, None, None] / 2.0 - 1.0,
                      (1, T, lat)).astype(np.float32)
    c2g_cfg = _cfg(name="c2gs", epochs=1, hidden_size=24)
    train_c2g(c2g_cfg, ids, latents, ids[:8], latents[:8],
              save_dir=str(tmp_path))
    c2g_ckpt = checkpoints.checkpoint_filename(str(tmp_path), "c2gs", 1)

    out_dir = str(tmp_path / "samples")
    n = c2g_samples(c2g_ckpt, dae_ckpt, store_dir,
                    os.path.join(root, "store", "data_pipe.json"),
                    out_dir, n_clusters=4, samples_per_cluster=2)
    assert n == 8
    for cid in range(4):
        for k in range(2):
            p = os.path.join(out_dir, str(cid), f"sample_{k}.bvh")
            assert os.path.getsize(p) > 1000, p
