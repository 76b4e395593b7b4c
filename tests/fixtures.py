"""Synthetic test fixtures: a Trinity-like BVH skeleton with smooth motion.

Tests must not depend on the licensed Trinity/TWH datasets, so we generate
a small upper-body+legs skeleton with the same joint naming scheme as the
Trinity corpus (the 15 joints targeted by the reference ingest,
ref: scripts/trinity_data_to_lmdb.py:23-25, plus legs so that joint
selection has something to drop).
"""
from __future__ import annotations

import io

import numpy as np

# (name, parent, offset) — depth-first. None parent = root.
_SKELETON = [
    ("Hips", None, (0.0, 95.0, 0.0)),
    ("Spine", "Hips", (0.0, 10.0, 0.0)),
    ("Spine1", "Spine", (0.0, 10.0, 0.0)),
    ("Spine2", "Spine1", (0.0, 10.0, 0.0)),
    ("Spine3", "Spine2", (0.0, 10.0, 0.0)),
    ("Neck", "Spine3", (0.0, 8.0, 0.0)),
    ("Neck1", "Neck", (0.0, 5.0, 0.0)),
    ("Head", "Neck1", (0.0, 8.0, 0.0)),
    ("RightShoulder", "Spine3", (-3.0, 6.0, 0.0)),
    ("RightArm", "RightShoulder", (-12.0, 0.0, 0.0)),
    ("RightForeArm", "RightArm", (-26.0, 0.0, 0.0)),
    ("RightHand", "RightForeArm", (-25.0, 0.0, 0.0)),
    ("LeftShoulder", "Spine3", (3.0, 6.0, 0.0)),
    ("LeftArm", "LeftShoulder", (12.0, 0.0, 0.0)),
    ("LeftForeArm", "LeftArm", (26.0, 0.0, 0.0)),
    ("LeftHand", "LeftForeArm", (25.0, 0.0, 0.0)),
    ("RightUpLeg", "Hips", (-9.0, -3.0, 0.0)),
    ("RightLeg", "RightUpLeg", (0.0, -40.0, 0.0)),
    ("RightFoot", "RightLeg", (0.0, -40.0, 0.0)),
    ("LeftUpLeg", "Hips", (9.0, -3.0, 0.0)),
    ("LeftLeg", "LeftUpLeg", (0.0, -40.0, 0.0)),
    ("LeftFoot", "LeftLeg", (0.0, -40.0, 0.0)),
]

_LEAVES = {"Head", "RightHand", "LeftHand", "RightFoot", "LeftFoot"}


def _children(name):
    return [n for n, p, _ in _SKELETON if p == name]


def _emit(name, depth, lines, channel_joints):
    _, parent, off = next(e for e in _SKELETON if e[0] == name)
    tab = "\t" * depth
    kw = "ROOT" if parent is None else "JOINT"
    lines.append(f"{tab}{kw} {name}")
    lines.append(f"{tab}{{")
    lines.append(f"{tab}\tOFFSET {off[0]:.5f} {off[1]:.5f} {off[2]:.5f}")
    if parent is None:
        lines.append(f"{tab}\tCHANNELS 6 Xposition Yposition Zposition "
                     "Zrotation Xrotation Yrotation")
    else:
        lines.append(f"{tab}\tCHANNELS 3 Zrotation Xrotation Yrotation")
    channel_joints.append(name)
    for c in _children(name):
        _emit(c, depth + 1, lines, channel_joints)
    if name in _LEAVES:
        lines.append(f"{tab}\tEnd Site")
        lines.append(f"{tab}\t{{")
        lines.append(f"{tab}\t\tOFFSET 0.00000 3.00000 0.00000")
        lines.append(f"{tab}\t}}")
    lines.append(f"{tab}}}")


_TWH_SKELETON = [
    ("body_world", None, (0.0, 0.0, 0.0)),
    ("b_root", "body_world", (0.0, 90.0, 0.0)),
    ("b_spine0", "b_root", (0.0, 8.0, 0.0)),
    ("b_spine1", "b_spine0", (0.0, 8.0, 0.0)),
    ("b_spine2", "b_spine1", (0.0, 8.0, 0.0)),
    ("b_spine3", "b_spine2", (0.0, 8.0, 0.0)),
    ("b_neck0", "b_spine3", (0.0, 7.0, 0.0)),
    ("b_head", "b_neck0", (0.0, 9.0, 0.0)),
    ("b_l_shoulder", "b_spine3", (4.0, 5.0, 0.0)),
    ("b_l_arm", "b_l_shoulder", (11.0, 0.0, 0.0)),
    ("b_l_arm_twist", "b_l_arm", (13.0, 0.0, 0.0)),
    ("b_l_forearm", "b_l_arm_twist", (13.0, 0.0, 0.0)),
    ("b_l_wrist_twist", "b_l_forearm", (12.0, 0.0, 0.0)),
    ("b_l_wrist", "b_l_wrist_twist", (12.0, 0.0, 0.0)),
    ("b_r_shoulder", "b_spine3", (-4.0, 5.0, 0.0)),
    ("b_r_arm", "b_r_shoulder", (-11.0, 0.0, 0.0)),
    ("b_r_arm_twist", "b_r_arm", (-13.0, 0.0, 0.0)),
    ("b_r_forearm", "b_r_arm_twist", (-13.0, 0.0, 0.0)),
    ("b_r_wrist_twist", "b_r_forearm", (-12.0, 0.0, 0.0)),
    ("b_r_wrist", "b_r_wrist_twist", (-12.0, 0.0, 0.0)),
    ("b_l_upleg", "b_root", (9.0, -4.0, 0.0)),
    ("b_l_leg", "b_l_upleg", (0.0, -40.0, 0.0)),
    ("b_r_upleg", "b_root", (-9.0, -4.0, 0.0)),
    ("b_r_leg", "b_r_upleg", (0.0, -40.0, 0.0)),
]

_TWH_LEAVES = {"b_head", "b_l_wrist", "b_r_wrist", "b_l_leg", "b_r_leg"}


def twh_hierarchy() -> "tuple[str, list[str]]":
    """HIERARCHY text + channel-joint order for the synthetic TWH
    skeleton (b_* names, 6 channels per joint, TalkingWithHands
    convention). Shared by make_synthetic_twh_bvh and the corpus-scale
    GENEA quality harness (benchmarks/quality_genea.py)."""
    def children(name):
        return [n for n, p, _ in _TWH_SKELETON if p == name]

    lines = ["HIERARCHY"]
    channel_joints: list[str] = []

    def emit(name, depth):
        _, parent, off = next(e for e in _TWH_SKELETON if e[0] == name)
        tab = "\t" * depth
        kw = "ROOT" if parent is None else "JOINT"
        lines.append(f"{tab}{kw} {name}")
        lines.append(f"{tab}{{")
        lines.append(f"{tab}\tOFFSET {off[0]:.5f} {off[1]:.5f} {off[2]:.5f}")
        lines.append(f"{tab}\tCHANNELS 6 Xposition Yposition Zposition "
                     "Zrotation Xrotation Yrotation")
        channel_joints.append(name)
        for c in children(name):
            emit(c, depth + 1)
        if name in _TWH_LEAVES:
            lines.append(f"{tab}\tEnd Site")
            lines.append(f"{tab}\t{{")
            lines.append(f"{tab}\t\tOFFSET 0.00000 2.00000 0.00000")
            lines.append(f"{tab}\t}}")
        lines.append(f"{tab}}}")

    emit("body_world", 0)
    return "\n".join(lines) + "\n", channel_joints


def make_synthetic_twh_bvh(n_frames: int = 300, fps: int = 30,
                           seed: int = 0) -> str:
    """TWH/GENEA-like BVH: b_* joint names, 6 channels on every joint
    (TalkingWithHands convention), root offset away from origin so
    RootNormalizer has work to do."""
    rng = np.random.default_rng(seed)
    hierarchy, channel_joints = twh_hierarchy()

    t = np.arange(n_frames) / fps
    cols = []
    for j in channel_joints:
        if j == "body_world":
            cols.append(-35.0 + 1.5 * np.sin(0.4 * t))
            cols.append(0.2 * np.sin(0.8 * t))
            cols.append(12.0 + np.cos(0.3 * t))
        else:
            for _ in range(3):  # constant position channels on non-root
                cols.append(np.full(n_frames,
                                    float(rng.uniform(-0.1, 0.1))))
        for _ in range(3):  # Z X Y rotations
            amp = rng.uniform(3.0, 25.0)
            freq = rng.uniform(0.3, 1.8)
            phase = rng.uniform(0, 2 * np.pi)
            base = rng.uniform(-15.0, 15.0)
            cols.append(base + amp * np.sin(freq * t + phase))
    motion = np.stack(cols, axis=1)

    buf = io.StringIO()
    buf.write(hierarchy)
    buf.write("MOTION\n")
    buf.write(f"Frames: {n_frames}\n")
    buf.write(f"Frame Time: {1.0 / fps:.6f}\n")
    for row in motion:
        buf.write(" ".join(f"{v:.6f}" for v in row) + "\n")
    return buf.getvalue()


def make_synthetic_bvh(n_frames: int = 240, fps: int = 60,
                       seed: int = 0) -> str:
    """Return BVH text with smooth pseudo-random motion.

    Root translates slowly on X/Z; every joint oscillates with per-joint
    random frequency/phase/amplitude so downstream constants-removal has
    no accidentally-constant rotation channels (except what we force:
    root channels stay constant-free, leaf Nubs have no channels).
    """
    rng = np.random.default_rng(seed)
    lines = ["HIERARCHY"]
    channel_joints: list[str] = []
    _emit("Hips", 0, lines, channel_joints)

    t = np.arange(n_frames) / fps
    cols = []
    for j in channel_joints:
        if j == "Hips":
            cols.append(2.0 * np.sin(0.5 * t))          # Xposition
            cols.append(95.0 + 0.5 * np.sin(0.9 * t))   # Yposition
            cols.append(1.5 * np.cos(0.4 * t))          # Zposition
        for _ in range(3):  # Z X Y rotation
            amp = rng.uniform(5.0, 30.0)
            freq = rng.uniform(0.3, 2.0)
            phase = rng.uniform(0, 2 * np.pi)
            base = rng.uniform(-20.0, 20.0)
            cols.append(base + amp * np.sin(freq * t + phase))
    motion = np.stack(cols, axis=1)

    buf = io.StringIO()
    buf.write("\n".join(lines) + "\n")
    buf.write("MOTION\n")
    buf.write(f"Frames: {n_frames}\n")
    buf.write(f"Frame Time: {1.0 / fps:.6f}\n")
    for row in motion:
        buf.write(" ".join(f"{v:.6f}" for v in row) + "\n")
    return buf.getvalue()


def make_smooth_windows(rng, n=64, t=10, d=24, phase=None):
    """Smooth (n, t, d) pose-latent windows the autoencoders can learn:
    per-sample base + sin(2*pi*ts + phase). phase=None uses the base as
    its own phase (the historical test_mesh_training variant); pass a
    generator-drawn phase array for the test_seq_ae variant."""
    import numpy as np
    base = rng.normal(size=(n, 1, d)).astype(np.float32)
    if phase is None:
        phase = base
    ts = np.linspace(0, 1, t)[None, :, None].astype(np.float32)
    return (base + np.sin(2 * np.pi * ts + phase)).astype(np.float32)
