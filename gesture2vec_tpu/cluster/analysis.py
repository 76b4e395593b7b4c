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
