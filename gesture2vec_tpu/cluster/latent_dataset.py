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

from gesture2vec_tpu.data.datasets import pose_windows
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


def decode_codebook(seq_model, seq_variables, dae_model, dae_variables
                    ) -> np.ndarray:
    """Decode every codebook vector to motion frames: (K, n_frames, D).

    Rebuild of make_VQ_Centers (ref: scripts/Clustering.py:171-270),
    which writes one BVH per code; here the whole codebook decodes in a
    single batched call - callers export whichever codes they want.
    """
    import jax
    import jax.numpy as jnp

    cb = seq_variables["params"]["vq_layer"]["codebook"]
    K = cb.shape[0]
    L, H = seq_model.n_layers, seq_model.hidden_size

    @jax.jit
    def run(codebook):
        hidden = jnp.transpose(codebook.reshape(K, L, H), (1, 0, 2))
        seed = jnp.zeros((K, seq_model.n_frames, seq_model.rep_dim))
        lat = seq_model.apply(seq_variables, hidden, seed, None,
                              method=seq_model.decode)
        return dae_model.apply(dae_variables, lat,
                               method=dae_model.decode)

    return np.asarray(run(jnp.asarray(cb)))


def export_cluster_samples(data: Dict[str, np.ndarray], out_dir: str,
                           extractor, mean: np.ndarray, std: np.ndarray,
                           dae_model, dae_variables,
                           max_per_token: int = 5) -> int:
    """Write each window's reconstructed BVH under
    <out_dir>/<token>/sample_<i>.bvh - the reference's per-cluster BVH
    export (ref: scripts/save_clustered_fast.py:140-166,
    scripts/Clustering.py:875-897). Returns the number of files written.
    """
    import os

    import jax
    import jax.numpy as jnp

    from gesture2vec_tpu.data.datasets import unnormalize
    from gesture2vec_tpu.io.bvh import write_bvh

    @jax.jit
    def decode(lat):
        return dae_model.apply(dae_variables, lat,
                               method=dae_model.decode)

    count = 0
    written: Dict[int, int] = {}
    for i, tok in enumerate(data["tokens"]):
        tok = int(tok)
        if written.get(tok, 0) >= max_per_token:
            continue
        frames = np.asarray(decode(jnp.asarray(data["dae_latents"][i])))
        frames = unnormalize(frames, mean, std)
        d = os.path.join(out_dir, str(tok))
        os.makedirs(d, exist_ok=True)
        write_bvh(extractor.to_bvh(frames),
                  os.path.join(d, f"sample_{written.get(tok, 0)}.bvh"))
        written[tok] = written.get(tok, 0) + 1
        count += 1
    return count
