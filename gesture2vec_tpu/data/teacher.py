"""Offline frozen-teacher encoding.

The reference runs frozen Part-a/Part-b models inside DataLoader
__getitem__ on CPU, re-encoding every sample every epoch
(ref: scripts/data_loader/lmdb_data_loader.py:600-662, 1158-1281;
scripts/data_loader/data_preprocessor.py:366-457 get_pose_latent).
Here the teacher pass is one jitted, batched sweep over the corpus run
once at dataset-build time - identical artifacts, a fraction of the
compute, and the TPU does it instead of dataloader worker processes.

Scale-out ("sp" — the corpus/sequence axis): the sweep is row-wise, so
under a mesh every superbatch's leading axis shards over ALL mesh axes
(frozen teacher replicated, no collectives — each chip encodes its rows
and the host gathers). Pass mesh= to any sweep; identity vs the
single-device sweep is pinned in tests/test_mesh_training.py.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sweep_setup(variables, batch: int, mesh):
    """Returns (place_fn, variables, effective_batch) for a row-wise
    corpus sweep: no-mesh keeps plain host->device transfers; a mesh
    row-shards every superbatch over all mesh axes and replicates the
    frozen teacher parameters."""
    if mesh is None:
        return jnp.asarray, variables, batch
    from jax.sharding import NamedSharding, PartitionSpec

    from gesture2vec_tpu.parallel.mesh import replicate

    ndev = int(mesh.devices.size)
    shd = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))
    eff = -(-batch // ndev) * ndev
    return (lambda a: jax.device_put(a, shd), replicate(variables, mesh),
            eff)


def encode_frames_with_dae(dae_model, variables, frames: np.ndarray,
                           batch: int = 4096, mesh=None) -> np.ndarray:
    """(N, motion_dim) normalized frames -> (N, latent_dim) DAE latents
    (the reference's per-item frozen encoder call,
    ref: lmdb_data_loader.py:649-662)."""
    place, variables, batch = _sweep_setup(variables, batch, mesh)

    @jax.jit
    def enc(x):
        return dae_model.apply(variables, x, method=dae_model.encode)

    outs = []
    n = frames.shape[0]
    pad = (-n) % batch
    padded = np.concatenate([frames, np.zeros((pad, frames.shape[1]),
                                              frames.dtype)]) if pad else frames
    for s in range(0, padded.shape[0], batch):
        outs.append(np.asarray(enc(place(padded[s:s + batch]))))
    return np.concatenate(outs, axis=0)[:n]


def encode_windows_with_dae(dae_model, variables, windows: np.ndarray,
                            batch: int = 256, mesh=None) -> np.ndarray:
    """(N, T, motion_dim) -> (N, T, latent_dim)."""
    N, T, D = windows.shape
    flat = encode_frames_with_dae(dae_model, variables,
                                  windows.reshape(N * T, D),
                                  batch=batch * T, mesh=mesh)
    return flat.reshape(N, T, -1)


def tokenize_windows(seq_model, variables, latent_windows: np.ndarray,
                     batch: int = 512, mesh=None,
                     all_stages: bool = False
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(N, T, rep_dim) DAE-latent windows -> (tokens (N,), seq latents
    (N, L*H)): the Part-b tokenizer pass used to build Part-c/d datasets
    (ref: data_preprocessor.py:366-457, lmdb_data_loader.py:1274-1281).

    all_stages (rvq tokenizers only): tokens come back (N, S) with one
    column per residual stage (column 0 = the pipeline token), the
    teacher signal for a multi-stage Part d (config.token_stages)."""
    place, variables, batch = _sweep_setup(variables, batch, mesh)

    @jax.jit
    def tok(x):
        enc_outs, dec_hidden = seq_model.apply(
            variables, x, method=seq_model.encode)
        L, B, H = dec_hidden.shape
        flat = jnp.transpose(dec_hidden, (1, 0, 2)).reshape(B, L * H)
        if all_stages:
            toks = seq_model.apply(variables, dec_hidden,
                                   method=seq_model.stage_tokens)
            return toks, flat
        vq_out, _ = seq_model.apply(variables, dec_hidden,
                                    method=seq_model.quantize)
        return jnp.argmax(vq_out.encodings, axis=-1), flat

    toks, lats = [], []
    n = latent_windows.shape[0]
    pad = (-n) % batch
    if pad:
        z = np.zeros((pad,) + latent_windows.shape[1:],
                     latent_windows.dtype)
        latent_windows = np.concatenate([latent_windows, z])
    for s in range(0, latent_windows.shape[0], batch):
        t, l = tok(place(latent_windows[s:s + batch]))
        toks.append(np.asarray(t))
        lats.append(np.asarray(l))
    return (np.concatenate(toks)[:n], np.concatenate(lats)[:n])
