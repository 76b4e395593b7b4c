"""Forward kinematics, expmap transforms, TWH variants, viz helpers."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from gesture2vec_tpu.io.bvh import parse_bvh, write_bvh
from gesture2vec_tpu.mocap.features import (TWHFeatureExtractor,
                                            TWH_TARGET_JOINTS)
from gesture2vec_tpu.mocap.fk import forward_kinematics, positions_matrix
from gesture2vec_tpu.mocap.pipeline import (Downsample, JointSelect,
                                            MotionPipeline, Numpyfy,
                                            RootNormalizer, ToExpmap,
                                            Track)
from gesture2vec_tpu.mocap.viz import (foot_contact_idxs,
                                       stickfigure_segments)
from tests.fixtures import make_synthetic_bvh, make_synthetic_twh_bvh


def _trinity():
    return parse_bvh(make_synthetic_bvh(n_frames=60), from_text=True)


def _twh():
    return parse_bvh(make_synthetic_twh_bvh(n_frames=120), from_text=True)


def _reference_fk(data, joint, frame):
    """Independent per-frame scipy FK for one joint."""
    chain = []
    n = joint
    while n is not None:
        chain.append(n)
        n = data.skeleton[n].parent
    chain.reverse()
    cidx = data.column_index()
    pos = np.zeros(3)
    rot = R.identity()
    for name in chain:
        j = data.skeleton[name]
        off = j.offsets.copy()
        for k, ax in enumerate("XYZ"):
            col = f"{name}_{ax}position"
            if col in cidx:
                off[k] += data.values[frame, cidx[col]]
        pos = pos + rot.apply(off)
        if j.order:
            e = [data.values[frame, cidx[f"{name}_{ax}rotation"]]
                 for ax in j.order]
            rot = rot * R.from_euler(j.order, e, degrees=True)
    return pos


@pytest.mark.parametrize("joint", ["Head", "RightHand", "LeftFoot"])
def test_fk_matches_scipy_reference(joint):
    d = _trinity()
    pos = forward_kinematics(d)
    for frame in (0, 17, 43):
        ref = _reference_fk(d, joint, frame)
        np.testing.assert_allclose(pos[joint][frame], ref, atol=1e-4)


def test_positions_matrix_shape():
    d = _trinity()
    m = positions_matrix(d)
    assert m.shape == (60, len(d.skeleton), 3)
    assert np.isfinite(m).all()


def test_expmap_roundtrip():
    d = _twh()
    pipe = MotionPipeline([
        ("dwnsampl", Downsample(tgt_fps=10, keep_all=False)),
        ("jtsel", JointSelect(TWH_TARGET_JOINTS, include_root=False)),
        ("exp", ToExpmap()),
        ("np", Numpyfy()),
    ])
    arr = pipe.fit_transform([d])[0]
    # 3 expmap channels per joint plus the retained (non-rotation)
    # position channels - the reference's MocapParameterizer('expmap')
    # keeps non-rotation columns too (ref: pymo/preprocessing.py:180)
    assert arr.shape[1] == len(TWH_TARGET_JOINTS) * 6
    # the expmap block (first 54 columns) is radians, bounded by pi
    exp_block = arr[:, :len(TWH_TARGET_JOINTS) * 3]
    assert np.abs(exp_block).max() < np.pi + 1e-6
    # column order quirk: reversed joint order, alpha/beta/gamma
    cols = pipe.steps[-1][1].template.columns
    assert cols[0] == f"{TWH_TARGET_JOINTS[-1]}_alpha"
    # exact roundtrip through inverse_transform
    back = pipe.inverse_transform([arr])[0]
    fe_cols = back.column_names()
    assert any("rotation" in c for c in fe_cols)


def test_twh_variants_shapes():
    d = _twh()
    J = len(TWH_TARGET_JOINTS)
    # taras keeps position channels (no ConstantsRemover before expmap,
    # ref: twh_dataset_to_lmdb.py:96-104) -> 6 dims/joint raw
    for variant, dims in (("posrot", 12 * J), ("rot", 9 * J),
                          ("taras", 6 * J), ("test1", 9 * J)):
        fe = TWHFeatureExtractor(variant)
        feats = fe.process(parse_bvh(make_synthetic_twh_bvh(),
                                     from_text=True))
        assert feats.shape[1] == dims, (variant, feats.shape)
        assert np.isfinite(feats).all()


def test_twh_test1_roundtrip():
    fe = TWHFeatureExtractor("test1")
    feats = fe.process(parse_bvh(make_synthetic_twh_bvh(), from_text=True))
    out = fe.to_bvh(feats)
    text = write_bvh(out)
    d2 = parse_bvh(text, from_text=True)
    fe2 = TWHFeatureExtractor("test1")
    feats2 = fe2.process(d2)
    n = min(len(feats), len(feats2))
    np.testing.assert_allclose(feats[:n], feats2[:n], atol=1e-3)


def test_root_normalizer():
    d = _twh()
    tr = Track.from_bvh(d)
    out = RootNormalizer().transform([tr])[0]
    xp = out.col("body_world_Xposition")
    assert abs(xp.mean()) < 1e-9
    yr = out.col("body_world_Yrotation")
    assert (yr == yr[0]).all() and abs(yr[0]) == 90.0


def test_stickfigure_and_footcontact():
    d = _trinity()
    segs = stickfigure_segments(d, 0)
    assert len(segs) == len(d.skeleton) - 1
    idxs = foot_contact_idxs(d, "LeftFoot")
    assert (idxs >= 0).all() if len(idxs) else True
