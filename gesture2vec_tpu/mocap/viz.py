"""Visualization + motion feature helpers.

Rebuild of pymo's viz_tools/features
(ref: scripts/pymo/viz_tools.py:12-110 draw_stickfigure{,3d};
scripts/pymo/features.py:12-43 foot-contact detection via peak finding).
Matplotlib figures; peakutils is replaced by scipy.signal.find_peaks.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from gesture2vec_tpu.io.bvh import BVHData
from gesture2vec_tpu.mocap.fk import _topo_order, forward_kinematics


def stickfigure_segments(data: BVHData, frame: int,
                         values: Optional[np.ndarray] = None
                         ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """[(parent_xyz, child_xyz), ...] line segments for one frame."""
    pos = forward_kinematics(data, values)
    segs = []
    for name in _topo_order(data):
        parent = data.skeleton[name].parent
        if parent is not None:
            segs.append((pos[parent][frame], pos[name][frame]))
    return segs


def draw_stickfigure(data: BVHData, frame: int, ax=None,
                     values: Optional[np.ndarray] = None, plane="xy"):
    """2D stick figure (ref: viz_tools.py:12-46). Returns the axis."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(4, 6))
    a, b = {"x": 0, "y": 1, "z": 2}[plane[0]], \
        {"x": 0, "y": 1, "z": 2}[plane[1]]
    for p, c in stickfigure_segments(data, frame, values):
        ax.plot([p[a], c[a]], [p[b], c[b]], "k-", lw=2)
        ax.plot([c[a]], [c[b]], "ro", ms=2)
    ax.set_aspect("equal")
    return ax


def draw_stickfigure3d(data: BVHData, frame: int, ax=None,
                       values: Optional[np.ndarray] = None):
    """3D stick figure (ref: viz_tools.py:49-110)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        fig = plt.figure(figsize=(5, 6))
        ax = fig.add_subplot(111, projection="3d")
    for p, c in stickfigure_segments(data, frame, values):
        ax.plot([p[0], c[0]], [p[2], c[2]], [p[1], c[1]], "k-", lw=2)
    return ax


def foot_contact_idxs(data: BVHData, foot_joint: str,
                      values: Optional[np.ndarray] = None,
                      up_axis: int = 1) -> np.ndarray:
    """Frames where the foot touches down: minima of the foot height
    signal (ref: features.py:12-33, peakutils on the negated signal)."""
    from scipy.signal import find_peaks

    pos = forward_kinematics(data, values)
    height = pos[foot_joint][:, up_axis]
    peaks, _ = find_peaks(-height, prominence=np.std(height) * 0.5)
    return peaks


def plot_loss_curves(history: dict, path: str, title: str = "loss") -> None:
    """Training loss plot artifact (ref: train_DAE.py:458-488)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    for key, vals in history.items():
        if vals and isinstance(vals[0], (int, float)):
            ax.plot(vals, label=key)
    ax.set_xlabel("epoch")
    ax.set_title(title)
    ax.legend()
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
