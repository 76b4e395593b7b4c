"""Native C++ host kernels vs numpy references."""
import numpy as np
import pytest

from gesture2vec_tpu.utils import native


def test_parse_floats(rng):
    vals = rng.normal(size=1000) * 100
    text = " ".join(f"{v:.6f}" for v in vals)
    out = native.parse_floats(text, 1000)
    np.testing.assert_allclose(out, np.round(vals, 6), atol=1e-9)


def test_parse_floats_scientific_and_whitespace():
    text = "1.5e-3\n\t-2.25E+2   .5  -0.0\n"
    out = native.parse_floats(text, 4)
    np.testing.assert_allclose(out, [0.0015, -225.0, 0.5, 0.0])


def test_euler_zxy_native_matches_rotations(rng):
    from gesture2vec_tpu.mocap import rotations as rot

    e = rng.uniform(-170, 170, size=(200, 3))
    e[:, 1] = rng.uniform(-85, 85, size=200)
    ours = native.euler_zxy_to_rotmat(e)
    ref = np.asarray(rot.euler_to_matrix(e, "ZXY")).reshape(-1, 9)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_extract_windows(rng):
    frames = rng.normal(size=(100, 7)).astype(np.float32)
    wins = native.extract_windows(frames, 20, 5)
    assert wins.shape == ((100 - 20) // 5 + 1, 20, 7)
    np.testing.assert_array_equal(wins[0], frames[:20])
    np.testing.assert_array_equal(wins[3], frames[15:35])


def test_native_actually_loaded():
    # the toolchain is available in this image; the library must load
    assert native.load() is not None


def test_bvh_uses_native_and_matches(rng):
    from gesture2vec_tpu.io.bvh import parse_bvh
    from tests.fixtures import make_synthetic_bvh

    text = make_synthetic_bvh(n_frames=50)
    import os
    d1 = parse_bvh(text, from_text=True)
    os.environ["G2V_NO_NATIVE"] = "1"
    try:
        # force the numpy path by resetting the module cache
        native._lib = None
        native._tried = False
        d2 = parse_bvh(text, from_text=True)
    finally:
        del os.environ["G2V_NO_NATIVE"]
        native._lib = None
        native._tried = False
    np.testing.assert_allclose(d1.values, d2.values, atol=0)


def test_format_motion_matches_python():
    """Native %.6f grid formatter: byte-identical to the Python
    fallback (C snprintf and Python format both use round-half-even
    shortest-correct decimal for doubles)."""
    from gesture2vec_tpu.utils.native import format_motion, load
    rng = np.random.default_rng(0)
    mat = np.concatenate([
        rng.normal(scale=100.0, size=(50, 7)),
        np.array([[0.0, -0.0, 1e-7, -1e-7, 123456.4999995,
                   -99.9999995, 0.5]]),
    ])
    expect = "\n".join(" ".join(f"{v:.6f}" for v in row)
                       for row in mat) + "\n"
    got = format_motion(mat)
    if load() is None:
        assert got == expect  # fallback path is the reference
    else:
        assert got == expect, "native formatter diverges from Python"
    # empty matrix: a bare newline — byte-parity with the pre-native
    # writer, which appended body + "\n" unconditionally (empty body)
    assert format_motion(np.zeros((0, 3))) == "\n"


def test_format_motion_speed_sanity():
    """The native path should beat pure Python comfortably on a
    clip-sized block (skipped silently when the toolchain is absent)."""
    import time

    from gesture2vec_tpu.utils.native import format_motion, load
    if load() is None:
        return
    mat = np.random.default_rng(1).normal(size=(2000, 69))
    t0 = time.perf_counter()
    format_motion(mat)
    native_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    "\n".join(" ".join(f"{v:.6f}" for v in row) for row in mat)
    py_dt = time.perf_counter() - t0
    assert native_dt < py_dt, (native_dt, py_dt)
