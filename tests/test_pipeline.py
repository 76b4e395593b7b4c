import numpy as np

from gesture2vec_tpu.io.bvh import parse_bvh, write_bvh
from gesture2vec_tpu.mocap.features import (FeatureExtractor,
                                            TRINITY_TARGET_JOINTS,
                                            trinity_pipeline)
from gesture2vec_tpu.mocap.pipeline import Track
from tests.fixtures import make_synthetic_bvh


def _bvh():
    return parse_bvh(make_synthetic_bvh(n_frames=240, fps=60), from_text=True)


def test_pipeline_shapes():
    arr = trinity_pipeline().fit_transform([_bvh()])
    # downsample 60->20 fps drops last frame: (240-1)//3 = 80 frames  (79+1)
    assert arr.ndim == 3
    assert arr.shape[0] == 2          # original + mirrored
    assert arr.shape[1] == 80
    # root constants removed -> 15 joints * 3 euler channels
    assert arr.shape[2] == 45


def test_feature_extractor_135():
    fe = FeatureExtractor()
    orig, mirrored = fe.process(_bvh())
    assert orig.shape == (80, 135)
    assert mirrored.shape == (80, 135)
    assert not np.allclose(orig, mirrored)
    # rotation matrices are orthonormal
    m = orig.reshape(-1, 3, 3)
    eye = np.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (m.shape[0], 1, 1)),
                               atol=1e-5)


def test_feature_roundtrip_to_bvh():
    fe = FeatureExtractor()
    orig, _ = fe.process(_bvh())
    out = fe.to_bvh(orig)
    # re-extract from the exported BVH with a fresh extractor: features of
    # the round-tripped file must match (export writes 20fps so no
    # downsampling happens, meaning frame counts differ by the dropped
    # last frame only)
    fe2 = FeatureExtractor(trinity_pipeline(tgt_fps=20))
    text = write_bvh(out)
    orig2, _ = fe2.process(parse_bvh(text, from_text=True))
    n = min(orig.shape[0], orig2.shape[0])
    np.testing.assert_allclose(orig[:n], orig2[:n], atol=1e-4)


def test_pipeline_save_load(tmp_path):
    fe = FeatureExtractor()
    orig, _ = fe.process(_bvh())
    p = str(tmp_path / "data_pipe.json")
    fe.save(p)
    fe2 = FeatureExtractor.load(p)
    out = fe2.to_bvh(orig)
    out_ref = fe.to_bvh(orig)
    np.testing.assert_allclose(out.values, out_ref.values, atol=1e-6)
    assert out.column_names() == out_ref.column_names()


def test_mirror_trinity_quirk():
    # On Trinity naming (no _l_/_r_), mirror = sign flip only; column count
    # must be unchanged and the Y/Z rotations flipped relative to original.
    bvh = _bvh()
    arr = trinity_pipeline().fit_transform([bvh])
    numpyfy_cols = 45
    assert arr.shape[2] == numpyfy_cols
    # mirrored euler: X-axis mirror keeps Xrotation sign (+1), flips Y,Z
    # the pipeline output columns are euler Z,X,Y per joint
    orig, mir = arr[0], arr[1]
    # column 0 = Spine_Zrotation -> flipped
    np.testing.assert_allclose(mir[:, 0], -orig[:, 0], atol=1e-9)
    # column 1 = Spine_Xrotation -> kept
    np.testing.assert_allclose(mir[:, 1], orig[:, 1], atol=1e-9)
    # column 2 = Spine_Yrotation -> flipped
    np.testing.assert_allclose(mir[:, 2], -orig[:, 2], atol=1e-9)
