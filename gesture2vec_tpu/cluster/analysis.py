"""Latent-space analysis utilities.

Rebuilds the analysis extras of scripts/inference_DAE.py:
  silhouette_sweep     <- silhouette-score sweeps over cluster counts
                          (ref :138-215)
  encoder_kernel_poses <- visualize each encoder latent unit's input
                          weights as a pseudo-pose (ref :358-407
                          Plot_Kernel renders them as stick figures)
  save_for_unity       <- per-frame joint-position text export
                          (ref :218-264 Save4Unity)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def silhouette_sweep(latents: np.ndarray,
                     k_range: Sequence[int] = range(2, 12),
                     seed: int = 0) -> Dict[int, float]:
    """K-Means silhouette score per cluster count (ref :138-215)."""
    import jax
    from sklearn.metrics import silhouette_score

    from gesture2vec_tpu.cluster.kmeans import kmeans_fit

    scores: Dict[int, float] = {}
    x = np.asarray(latents, np.float32)
    for k in k_range:
        if k >= len(x):
            break
        res = kmeans_fit(x, k, key=jax.random.PRNGKey(seed), n_init=3,
                         max_iter=50)
        labels = np.asarray(res.labels)
        if len(np.unique(labels)) < 2:
            continue
        scores[k] = float(silhouette_score(x, labels))
    return scores


def encoder_kernel_poses(encoder_kernel: np.ndarray,
                         mean: np.ndarray, std: np.ndarray,
                         scale: float = 1.0) -> np.ndarray:
    """(motion_dim, latent_dim) DAE encoder kernel -> (latent_dim,
    motion_dim) pseudo-poses: each latent unit's weight vector,
    unnormalized into feature space, so it renders as the pose pattern
    that maximally excites that unit (ref :358-407)."""
    k = np.asarray(encoder_kernel, np.float64)
    k = k / np.maximum(np.abs(k).max(axis=0, keepdims=True), 1e-8)
    poses = mean[None, :] + scale * k.T * np.clip(std, 0.01, None)[None, :]
    return poses


def plot_kernel_stickfigures(encoder_kernel: np.ndarray, fe,
                             mean: np.ndarray, std: np.ndarray,
                             out_dir: str, max_units: int = 16) -> list:
    """Render each DAE encoder latent unit's weight vector as a stick
    figure plus weight heatmaps - the reference's Plot_Kernel
    (ref: inference_DAE.py:358-407: unnormalize each kernel row,
    rotmat->euler->pipeline.inverse_transform->draw_stickfigure, plus
    imshow of the full kernel and each row reshaped (15, 9)).
    Headless: every figure is saved as a PNG under out_dir."""
    import os

    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    from gesture2vec_tpu.mocap.viz import draw_stickfigure

    os.makedirs(out_dir, exist_ok=True)
    written = []
    k = np.asarray(encoder_kernel, np.float64)

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(k, aspect="auto")
    ax.set_title(f"Kernel w ({k.min():.3f},{k.max():.3f})")
    fig.colorbar(im)
    p = os.path.join(out_dir, "kernel_matrix.png")
    fig.savefig(p, dpi=100, bbox_inches="tight")
    plt.close(fig)
    written.append(p)

    poses = encoder_kernel_poses(k, mean, std)
    # per-joint feature width: 9 (Trinity rotmat), 12 (TWH pos+rotmat),
    # 3 (expmap). A width that fits none of these skips the per-unit
    # heatmaps rather than crashing mid-loop (the stickfigures and the
    # kernel matrix are still written).
    feat_w = next((w for w in (9, 12, 3) if poses.shape[1] % w == 0),
                  None)
    n_joints = poses.shape[1] // feat_w if feat_w else 0
    for i in range(min(poses.shape[0], max_units)):
        data = fe.to_bvh(poses[i:i + 1])
        ax = draw_stickfigure(data, 0)
        ax.set_title(f"latent unit {i}")
        fig = ax.figure
        p = os.path.join(out_dir, f"kernel_{i:03d}_pose.png")
        fig.savefig(p, dpi=100, bbox_inches="tight")
        plt.close(fig)
        written.append(p)

        if feat_w is None:
            continue
        fig, ax2 = plt.subplots(figsize=(4, 4))
        ax2.imshow(k[:, i].reshape(n_joints, feat_w))
        ax2.set_title(f"unit {i} ({n_joints},{feat_w} style)")
        p = os.path.join(out_dir, f"kernel_{i:03d}_heat.png")
        fig.savefig(p, dpi=100, bbox_inches="tight")
        plt.close(fig)
        written.append(p)
    return written


def save_unity_latents(kernels: np.ndarray, latents: np.ndarray,
                       indices: Sequence[int], components: int,
                       path: str, seed: int = 0) -> str:
    """The reference's Save4Unity latents.txt: a joint 2-D t-SNE of
    encoder kernels + sample latents, written as
      line 1: component count
      next len(kernels) lines: "x,y" per kernel embedding
      remaining lines: "i,x,y,cluster_index" per latent
    (ref: inference_DAE.py:218-264; openTSNE replaced by the
    sklearn-backed cluster.plots.tsne_embed)."""
    from gesture2vec_tpu.cluster.plots import tsne_embed

    combined = np.concatenate([np.asarray(kernels, np.float64),
                               np.asarray(latents, np.float64)], axis=0)
    emb = tsne_embed(combined, seed=seed)
    tk, tl = emb[:len(kernels)], emb[len(kernels):]
    with open(path, "w") as f:
        f.write(f"{components}\n")
        for row in tk:
            f.write(f"{row[0]:.3f},{row[1]:.3f}\n")
        for i, row in enumerate(tl):
            f.write(f"{i},{row[0]:.3f},{row[1]:.3f},{indices[i]}\n")
    return path


def save_for_unity(positions: Dict[str, np.ndarray], path: str,
                   joints: Optional[List[str]] = None) -> None:
    """Write per-frame joint positions as 'joint:x,y,z;...' lines
    (ref :218-264)."""
    names = joints or list(positions.keys())
    T = next(iter(positions.values())).shape[0]
    with open(path, "w") as f:
        for t in range(T):
            parts = []
            for n in names:
                p = positions[n][t]
                parts.append(f"{n}:{p[0]:.4f},{p[1]:.4f},{p[2]:.4f}")
            f.write(";".join(parts) + "\n")
