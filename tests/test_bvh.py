import numpy as np

from gesture2vec_tpu.io.bvh import parse_bvh, write_bvh
from tests.fixtures import make_synthetic_bvh


def test_parse_basic():
    text = make_synthetic_bvh(n_frames=60, fps=60)
    d = parse_bvh(text, from_text=True)
    assert d.root_name == "Hips"
    assert d.values.shape == (60, 6 + 3 * 21)
    assert abs(d.framerate - 60.0) < 0.01
    # root has 6 channels, first three are positions
    assert d.channel_names[0] == ("Hips", "Xposition")
    assert d.channel_names[3] == ("Hips", "Zrotation")
    # end sites present as Nub joints with no channels
    assert "Head_Nub" in d.skeleton
    assert d.skeleton["Head_Nub"].channels == []
    assert d.skeleton["Head"].children == ["Head_Nub"]
    # hierarchy sane
    assert d.skeleton["Spine"].parent == "Hips"
    assert "Spine" in d.skeleton["Hips"].children


def test_roundtrip_identity():
    text = make_synthetic_bvh(n_frames=30)
    d1 = parse_bvh(text, from_text=True)
    text2 = write_bvh(d1)
    d2 = parse_bvh(text2, from_text=True)
    assert d1.column_names() == d2.column_names()
    np.testing.assert_allclose(d1.values, d2.values, atol=1e-5)
    assert d1.skeleton.keys() == d2.skeleton.keys()
    for k in d1.skeleton:
        np.testing.assert_allclose(d1.skeleton[k].offsets,
                                   d2.skeleton[k].offsets, atol=1e-5)
        assert d1.skeleton[k].order == d2.skeleton[k].order
        assert d1.skeleton[k].children == d2.skeleton[k].children
