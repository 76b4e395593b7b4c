"""End-to-end Part-a slice: synthetic corpus -> ingest -> train DAE ->
loss decreases -> checkpoint round-trips -> reconstruct -> export BVH."""
import numpy as np
import pytest

from gesture2vec_tpu.data.datasets import all_frames, unnormalize
from gesture2vec_tpu.data.ingest import ingest_trinity
from gesture2vec_tpu.data.store import ClipStore
from gesture2vec_tpu.train import checkpoints
from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.dae_trainer import (make_frame_model, train_dae)
from tests.corpus import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    make_corpus(root, n_files=3, with_audio=False)
    train_dir, val_dir = ingest_trinity(root)
    return train_dir, val_dir


def _config(**kw):
    base = dict(name="test_dae", model="DAE", hidden_size=40, epochs=3,
                batch_size=32, learning_rate=0.005, input_motion_dim=135,
                autoencoder_vq=False, autoencoder_vae=False, random_seed=0)
    base.update(kw)
    return load_config(base)


def test_ingest_stores(corpus):
    train_dir, val_dir = corpus
    tr, va = ClipStore(train_dir), ClipStore(val_dir)
    assert len(tr) == 4   # 2 files x (orig + mirror)
    assert len(va) == 2   # first file -> val
    assert tr.pose_mean.shape == (135,)
    assert tr[0]["poses"].shape[1] == 135
    assert len(tr[0]["words"]) > 0


def test_dae_trains_and_reconstructs(corpus, tmp_path):
    train_dir, val_dir = corpus
    tr, va = ClipStore(train_dir), ClipStore(val_dir)
    train_frames = all_frames(tr)
    val_frames = all_frames(va, tr.pose_mean, tr.pose_std)

    cfg = _config()
    state, hist = train_dae(cfg, train_frames, val_frames,
                            save_dir=str(tmp_path), save_every=100)
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert np.isfinite(hist["val_loss"][-1])

    # checkpoint round-trip through the registry
    ckpt = checkpoints.checkpoint_filename(str(tmp_path), "test_dae_H40",
                                           cfg.epochs)
    model, variables, payload = checkpoints.load_checkpoint_and_model(
        ckpt, "DAE")
    assert payload["epoch"] == cfg.epochs
    assert payload["config"].hidden_size == 40

    # reconstruct in-distribution frames with the loaded model: must beat
    # the predict-the-mean baseline (MSE ~= 1 on normalized data)
    recon = model.apply(variables, train_frames[:64], train=False)
    err = np.mean((np.asarray(recon) - train_frames[:64]) ** 2)
    assert err < np.mean(train_frames[:64] ** 2)

    # and export reconstructed motion back to BVH
    from gesture2vec_tpu.io.bvh import parse_bvh, write_bvh
    from gesture2vec_tpu.mocap.features import FeatureExtractor
    import os
    fe = FeatureExtractor.load(os.path.join(os.path.dirname(train_dir),
                                            "data_pipe.json"))
    frames = unnormalize(np.asarray(recon), tr.pose_mean, tr.pose_std)
    bvh = fe.to_bvh(frames)
    text = write_bvh(bvh)
    assert parse_bvh(text, from_text=True).n_frames == 64


def test_vq_frame_trains(corpus, tmp_path):
    train_dir, val_dir = corpus
    tr = ClipStore(train_dir)
    frames = all_frames(tr)
    cfg = _config(name="test_vqdae", autoencoder_vq=True,
                  autoencoder_vq_components=32, epochs=2)
    state, hist = train_dae(cfg, frames, frames[:64],
                            save_dir=str(tmp_path), save_every=100)
    assert np.isfinite(hist["train_loss"][-1])
    assert state.vq_state is not None
    # EMA state must have moved
    assert float(np.abs(np.asarray(state.vq_state.cluster_size)).sum()) > 0

    # a VQ Part-a checkpoint must serve the same encode/decode contract
    # as the plain DAE through the registry (the frozen-teacher
    # semantics: raw encoder latent, like lmdb_data_loader.py:653) and
    # expose vq_state for the full quantized forward
    import glob

    import jax
    import jax.numpy as jnp

    from gesture2vec_tpu.train import checkpoints

    path = glob.glob(str(tmp_path / "*.bin"))[0]
    model, variables, payload = checkpoints.load_checkpoint_and_model(
        path, "DAE")
    z = model.apply(variables, jnp.asarray(frames[:8]),
                    method=model.encode)
    assert z.shape == (8, cfg.hidden_size)
    recon = model.apply(variables, z, method=model.decode)
    assert recon.shape == (8, frames.shape[1])
    assert payload["extra"]["vq_state"] is not None
    # full quantized forward from the restored pieces
    from gesture2vec_tpu.models.vq import VQEmaState
    vq_state = VQEmaState(**{k: jnp.asarray(v) for k, v in
                             payload["extra"]["vq_state"].items()})
    res, _ = model.apply(variables, jnp.asarray(frames[:8]), vq_state,
                         train=False)
    assert res["output"].shape == (8, frames.shape[1])


def test_vq_tricks(corpus, tmp_path):
    """Delayed VQ start + K-Means codebook re-estimation
    (ref: train_DAE.py:230-263)."""
    train_dir, _ = corpus
    tr = ClipStore(train_dir)
    frames = all_frames(tr)
    cfg = _config(name="test_vqtricks", autoencoder_vq=True,
                  autoencoder_vq_components=16, epochs=4)
    state, hist = train_dae(cfg, frames, frames[:64], vq_tricks=True,
                            vq_start_epoch=2, vq_reestimate_every=2)
    assert np.isfinite(hist["train_loss"]).all()
    assert state.vq_state is not None
    # the tricks must actually change the training trajectory: the same
    # run WITHOUT them ends with a different codebook (delayed VQ start
    # skips early-epoch quantization; k-means re-estimation at epoch 2
    # replaces the codebook and resets the EMA state)
    plain, _ = train_dae(cfg, frames, frames[:64])
    assert not np.allclose(np.asarray(state.vq_state.codebook),
                           np.asarray(plain.vq_state.codebook))
