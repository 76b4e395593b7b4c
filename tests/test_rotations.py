import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from gesture2vec_tpu.mocap import rotations as rot

ORDERS = ["ZXY", "XYZ", "ZYX", "YXZ", "XZY", "YZX"]


@pytest.fixture
def eulers(rng):
    # keep middle angle away from +-90 deg to avoid gimbal ambiguity in
    # equality tests (matrices are still compared at lock separately)
    e = rng.uniform(-170, 170, size=(257, 3))
    e[:, 1] = rng.uniform(-85, 85, size=257)
    return e


@pytest.mark.parametrize("order", ORDERS)
def test_euler_to_matrix_matches_scipy(eulers, order):
    ours = np.asarray(rot.euler_to_matrix(eulers, order))
    ref = R.from_euler(order, eulers, degrees=True).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("order", ORDERS)
def test_matrix_to_euler_roundtrip(eulers, order):
    m = np.asarray(rot.euler_to_matrix(eulers, order))
    back = np.asarray(rot.matrix_to_euler(m, order))
    ref = R.from_matrix(m).as_euler(order, degrees=True)
    np.testing.assert_allclose(back, ref, atol=1e-4)


def test_rotvec_matrix_roundtrip(rng):
    v = rng.normal(size=(513, 3))
    m = np.asarray(rot.rotvec_to_matrix(v))
    ref = R.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(m, ref, atol=1e-6)
    back = np.asarray(rot.matrix_to_rotvec(m))
    np.testing.assert_allclose(back, R.from_matrix(ref).as_rotvec(),
                               atol=1e-5)


def test_rotvec_small_angles():
    v = np.array([[0.0, 0.0, 0.0], [1e-9, 0, 0], [0, 1e-7, 1e-7]])
    m = np.asarray(rot.rotvec_to_matrix(v))
    ref = R.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(m, ref, atol=1e-9)
    back = np.asarray(rot.matrix_to_rotvec(m))
    np.testing.assert_allclose(back, v, atol=1e-7)


def test_matrix_to_quat_matches_scipy(rng):
    v = rng.normal(size=(301, 3)) * 2.0
    m = R.from_rotvec(v).as_matrix()
    ours = np.asarray(rot.matrix_to_quat(m))
    ref = R.from_matrix(m).as_quat()
    # quaternions are sign-ambiguous; canonicalize both to w>=0
    ref = ref * np.where(ref[:, 3:4] < 0, -1.0, 1.0)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_near_pi_rotvec(rng):
    axis = rng.normal(size=(64, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    v = axis * (np.pi - 1e-4)
    m = np.asarray(rot.rotvec_to_matrix(v))
    back = np.asarray(rot.matrix_to_rotvec(m))
    ref = R.from_matrix(R.from_rotvec(v).as_matrix()).as_rotvec()
    np.testing.assert_allclose(back, ref, atol=1e-4)


@pytest.mark.parametrize("order", ORDERS)
def test_gimbal_lock_euler(order):
    e = np.array([[10.0, 90.0, 25.0], [-40.0, -90.0, 5.0]])
    m = np.asarray(rot.euler_to_matrix(e, order))
    back = np.asarray(rot.matrix_to_euler(m, order))
    m2 = np.asarray(rot.euler_to_matrix(back, order))
    np.testing.assert_allclose(m, m2, atol=1e-5)


def test_unroll_rotvec_fixes_flipped_interval():
    # a smooth rotation path whose middle interval got re-represented with
    # the flipped axis / complementary angle (the discontinuity pattern the
    # reference's fix_rotvec targets, ref: pymo/preprocessing.py:59-84)
    angles = np.linspace(1.8, 2.2, 60)
    axis = np.array([0.0, 0.0, 1.0])
    smooth = np.outer(angles, axis)
    corrupted = smooth.copy()
    corrupted[20:40] = -smooth[20:40] / angles[20:40, None] * \
        (2 * np.pi - angles[20:40])[:, None]
    raw_jumps = np.linalg.norm(np.diff(corrupted, axis=0), axis=1)
    assert raw_jumps.max() > 1.0  # corruption introduced jumps
    unrolled = rot.unroll_rotvec(corrupted)
    np.testing.assert_allclose(unrolled, smooth, atol=1e-9)
