"""Streaming (bigger-than-RAM) dataset path: data/streaming.py."""
import numpy as np

from gesture2vec_tpu.data.datasets import all_frames, pose_windows
from gesture2vec_tpu.data.store import ClipStore, ClipStoreWriter
from gesture2vec_tpu.data.streaming import (StreamingFrames,
                                            StreamingWindows)
from gesture2vec_tpu.train.config import load_config

D = 12


def _store(tmp_path, rng, n_clips=5, frames=64):
    root = str(tmp_path / "store")
    w = ClipStoreWriter(root)
    for i in range(n_clips):
        w.add_clip(f"c{i}",
                   rng.normal(size=(frames, D)).astype(np.float32))
    w.set_stats(np.zeros(D), np.ones(D))
    w.finish()
    return ClipStore(root)


def test_shuffled_stream_copies_rows():
    """Buffered rows must be COPIES, not views: a surviving view pins
    its whole parent clip array, breaking the O(shuffle_buffer) RAM
    bound the module documents. Mutating the source block after
    streaming must not change what was yielded."""
    from gesture2vec_tpu.data.streaming import _shuffled_stream
    blocks = [np.full((8, 3), i, np.float32) for i in range(4)]
    rng = np.random.default_rng(0)
    out = list(_shuffled_stream(iter(blocks), 8, rng))
    expect = [row.copy() for row in out]
    for b in blocks:
        b[:] = -1.0
    assert all(np.array_equal(a, e) for a, e in zip(out, expect))
    assert not any(row.base is b for row in out for b in blocks)


def test_streaming_windows_cover_same_data(tmp_path, rng):
    """One streamed epoch yields exactly the windows pose_windows
    materializes (shuffled)."""
    store = _store(tmp_path, rng)
    ref = pose_windows(store, 8, 4)
    src = StreamingWindows(store, 8, 4, shuffle_rows=32, seed=1)
    assert len(src) == ref.shape[0]
    got = np.concatenate(list(src.batches(0, 5)), axis=0)
    # trailing partial batch dropped, so compare as multisets over the
    # intersection size
    assert got.shape[0] == (ref.shape[0] // 5) * 5
    key = lambda a: np.sort(a.reshape(a.shape[0], -1).sum(axis=1))
    ref_sums = key(ref)
    got_sums = key(got)
    # every streamed row appears among the materialized rows
    assert np.all(np.isin(np.round(got_sums, 4), np.round(ref_sums, 4)))


def test_streaming_deterministic_per_epoch(tmp_path, rng):
    store = _store(tmp_path, rng)
    src = StreamingWindows(store, 8, 4, shuffle_rows=16, seed=3)
    a = np.concatenate(list(src.batches(2, 4)))
    b = np.concatenate(list(src.batches(2, 4)))
    np.testing.assert_array_equal(a, b)
    c = np.concatenate(list(src.batches(3, 4)))
    assert not np.array_equal(a, c)


def test_streaming_frames_cover_corpus(tmp_path, rng):
    store = _store(tmp_path, rng)
    ref = all_frames(store)
    src = StreamingFrames(store, shuffle_rows=64, seed=0)
    assert len(src) == ref.shape[0]
    got = np.concatenate(list(src.batches(0, 16)))
    assert got.shape[0] == (ref.shape[0] // 16) * 16
    # every streamed row is a corpus row, and no row repeats
    ref_set = {r.tobytes() for r in np.round(ref, 5)}
    got_keys = [np.round(r, 5).tobytes() for r in got]
    assert all(k in ref_set for k in got_keys)
    assert len(set(got_keys)) == len(got_keys)


def test_train_dae_streaming_converges(tmp_path, rng):
    from gesture2vec_tpu.train.dae_trainer import train_dae
    store = _store(tmp_path, rng, n_clips=4, frames=128)
    cfg = load_config(dict(name="sdae", model="DAE", hidden_size=6,
                           input_motion_dim=D, epochs=4, batch_size=32,
                           learning_rate=0.01, random_seed=0))
    src = StreamingFrames(store, shuffle_rows=128, seed=0)
    val = all_frames(store)[:32]
    _, hist = train_dae(cfg, src, val)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_train_seq_ae_streaming_with_teacher_transform(tmp_path, rng):
    """StreamingWindows with the frozen-DAE teacher as the in-worker
    transform: Part b trains from a stream, teacher compute overlapped
    in the prefetch thread."""
    import jax

    from gesture2vec_tpu.train.dae_trainer import (init_state as dae_init,
                                                   make_frame_model)
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import train_seq_ae
    from gesture2vec_tpu.data.teacher import encode_windows_with_dae

    store = _store(tmp_path, rng, n_clips=4, frames=96)
    dae_cfg = load_config(dict(name="d", model="DAE", hidden_size=6,
                               input_motion_dim=D, epochs=1,
                               batch_size=8, random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_init(dae_cfg, dae, jax.random.PRNGKey(0),
                                   make_optimizer(1e-3)).params}

    def teacher(batch):
        return encode_windows_with_dae(dae, dae_vars, batch)

    src = StreamingWindows(store, 8, 4, shuffle_rows=64, seed=0,
                           transform=teacher)
    val = teacher(pose_windows(store, 8, 4)[:16])
    cfg = load_config(dict(name="svq", model="seq2seq", hidden_size=12,
                           n_layers=2, dropout_prob=0.1, epochs=3,
                           batch_size=16, learning_rate=0.005,
                           rep_learning_dim=6, n_poses=8, n_pre_poses=1,
                           autoencoder_vq=True,
                           autoencoder_vq_components=8, random_seed=0))
    _, hist = train_seq_ae(cfg, src, val)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]
