"""Part c - corpus latent dataset (the clustering/exemplar substrate).

Rebuild of the reference's maake_dataset / generate_gestures_latent_dataset
(ref: scripts/Clustering.py:57-168, 273-360): every corpus window is
recorded with its frame-level DAE latents, its sequence latent (the
decoder-initial hidden), and its VQ token. The reference pickles this to
clusters/org_latent_clustering_data.bin (ref :1843-1852) and inference
later retrieves exemplar windows per token from it
(ref: scripts/inference_text2embedding.py:161-231, 572-624); we store
npz with the same roles.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from gesture2vec_tpu.data.datasets import normalize, pose_windows
from gesture2vec_tpu.data.store import ClipStore
from gesture2vec_tpu.data.teacher import (encode_windows_with_dae,
                                          tokenize_windows)


def build_latent_dataset(store: ClipStore, *, dae_model, dae_variables,
                         seq_model, seq_variables, n_poses: int = 20,
                         stride: int = 5,
                         mean: Optional[np.ndarray] = None,
                         std: Optional[np.ndarray] = None
                         ) -> Dict[str, np.ndarray]:
    """Returns {windows (N,T,D) normalized, dae_latents (N,T,R),
    tokens (N,), seq_latents (N, L*H)}."""
    windows = pose_windows(store, n_poses, stride, mean, std)
    dae_latents = encode_windows_with_dae(dae_model, dae_variables,
                                          windows)
    tokens, seq_latents = tokenize_windows(seq_model, seq_variables,
                                           dae_latents)
    return {"windows": windows, "dae_latents": dae_latents,
            "tokens": tokens.astype(np.int32), "seq_latents": seq_latents}


def save_latent_dataset(path: str, data: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **data)


def load_latent_dataset(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def token_index(tokens: np.ndarray, n_tokens: int) -> Dict[int, np.ndarray]:
    """token id -> window indices (the reference's cluster_indexed,
    ref: inference_text2embedding.py:196-231)."""
    return {t: np.where(tokens == t)[0] for t in range(n_tokens)}
