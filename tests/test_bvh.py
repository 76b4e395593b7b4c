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


def test_parse_windows_line_endings():
    text = make_synthetic_bvh(n_frames=10).replace("\n", "\r\n")
    d = parse_bvh(text, from_text=True)
    assert d.n_frames == 10
    ref = parse_bvh(make_synthetic_bvh(n_frames=10), from_text=True)
    np.testing.assert_allclose(d.values, ref.values)


def test_parse_tab_separated_motion():
    text = make_synthetic_bvh(n_frames=5)
    header, motion = text.split("MOTION")
    motion = motion.replace(" ", "\t")
    d = parse_bvh(header + "MOTION" + motion, from_text=True)
    assert d.n_frames == 5


def test_parse_scientific_notation_motion():
    text = make_synthetic_bvh(n_frames=4)
    lines = text.splitlines()
    # rewrite one motion row in scientific notation
    start = next(i for i, l in enumerate(lines)
                 if l.startswith("Frame Time")) + 1
    vals = [float(v) for v in lines[start].split()]
    lines[start] = " ".join(f"{v:.4e}" for v in vals)
    d = parse_bvh("\n".join(lines), from_text=True)
    np.testing.assert_allclose(d.values[0], vals, rtol=1e-3)


def test_single_joint_skeleton():
    text = ("HIERARCHY\nROOT A\n{\n\tOFFSET 0 0 0\n"
            "\tCHANNELS 6 Xposition Yposition Zposition "
            "Zrotation Xrotation Yrotation\n"
            "\tEnd Site\n\t{\n\t\tOFFSET 0 1 0\n\t}\n}\n"
            "MOTION\nFrames: 2\nFrame Time: 0.05\n"
            "1 2 3 10 20 30\n4 5 6 40 50 60\n")
    d = parse_bvh(text, from_text=True)
    assert d.values.shape == (2, 6)
    assert "A_Nub" in d.skeleton
    # round-trips
    d2 = parse_bvh(write_bvh(d), from_text=True)
    np.testing.assert_allclose(d.values, d2.values, atol=1e-5)
