"""ClipStore robustness and fp16 semantics."""
import os

import numpy as np
import pytest

from gesture2vec_tpu.data.store import ClipStore, ClipStoreWriter


def test_fp16_pose_storage(tmp_path, rng):
    """Poses round-trip through fp16 like the reference's LMDB cache
    (ref: trinity_data_to_lmdb.py:118)."""
    w = ClipStoreWriter(str(tmp_path / "s"))
    poses = rng.normal(size=(50, 12)).astype(np.float32)
    w.add_clip("a", poses, words=[["hi", 0.0, 0.5]])
    w.set_stats(poses.mean(0), poses.std(0))
    w.finish()
    s = ClipStore(str(tmp_path / "s"))
    got = s[0]["poses"]
    assert got.dtype == np.float32  # read back as f32...
    np.testing.assert_allclose(got, poses.astype(np.float16), atol=0)
    assert s[0]["words"] == [["hi", 0.0, 0.5]]


def test_extra_arrays_roundtrip(tmp_path, rng):
    w = ClipStoreWriter(str(tmp_path / "s"))
    w.add_clip("a", rng.normal(size=(10, 4)),
               latents=rng.normal(size=(10, 2)).astype(np.float32))
    w.finish()
    s = ClipStore(str(tmp_path / "s"))
    assert s[0]["latents"].shape == (10, 2)


def test_missing_meta_raises(tmp_path):
    os.makedirs(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        ClipStore(str(tmp_path / "empty"))


def test_missing_clip_file_raises(tmp_path, rng):
    w = ClipStoreWriter(str(tmp_path / "s"))
    w.add_clip("a", rng.normal(size=(5, 3)))
    w.finish()
    os.remove(str(tmp_path / "s" / "clip_00000.npz"))
    s = ClipStore(str(tmp_path / "s"))
    with pytest.raises(FileNotFoundError):
        s[0]
