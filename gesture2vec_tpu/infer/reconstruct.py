"""Reconstruction inference paths (Parts a and b round trips).

Rebuilds:
  dae_roundtrip          <- scripts/inference_DAE.py core (encode every
                            frame, decode back; :416-486)
  chunked_reconstruct    <- scripts/inference_Autoencoder.py:124-231:
                            re-encode/decode the motion chunk by chunk
                            through the frozen DAE + seq autoencoder,
                            with linear cross-chunk blending
                            (ref :388-395). The reference's 5-step
                            decoder "warm-up" (:206-209) - repeating
                            the first decode step to spin the hidden
                            state - is available via warmup_steps
                            (default 0: the quantized hidden
                            initialization makes it redundant here,
                            but it reproduces the reference rollout
                            exactly when enabled).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def dae_roundtrip(dae_model, dae_variables, frames: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """(T, D) normalized frames -> (reconstruction (T, D), latents)."""

    @jax.jit
    def run(x):
        z = dae_model.apply(dae_variables, x, method=dae_model.encode)
        return dae_model.apply(dae_variables, z,
                               method=dae_model.decode), z

    recon, lat = run(jnp.asarray(frames))
    return np.asarray(recon), np.asarray(lat)


def chunked_reconstruct(seq_model, seq_variables, dae_model, dae_variables,
                        frames: np.ndarray, n_poses: int,
                        overlap: int = 0, blend: bool = True,
                        warmup_steps: int = 0) -> np.ndarray:
    """Round-trip (T, D) normalized motion through the full Part-a+b
    autoencoder, chunk by chunk.

    overlap > 0 strides chunks by (n_poses - overlap) and linearly
    cross-fades the overlapping frames (ref :388-395). warmup_steps > 0
    spins the decoder hidden by repeating the first decode step before
    the rollout, like the reference (ref :206-209 uses 5).
    """
    T = frames.shape[0]
    stride = n_poses - overlap if overlap > 0 else n_poses
    starts = list(range(0, T - n_poses + 1, stride))
    if not starts:
        raise ValueError(f"motion shorter than one chunk ({T} < {n_poses})")

    @jax.jit
    def run_chunk(x):
        lat = dae_model.apply(dae_variables, x, method=dae_model.encode)
        lat = lat[None]  # (1, n_poses, rep)
        # attention-enabled models consume the encoder outputs in every
        # decoder step; the fixed "dropout" rng feeds the parity-mode
        # eval step dropout (eval_step_dropout=True checkpoints -
        # random in the reference, deterministic per chunk here)
        enc_outs, hidden = seq_model.apply(seq_variables, lat,
                                           method=seq_model.encode)
        if seq_model.use_vq:
            _, hidden = seq_model.apply(seq_variables, hidden,
                                        method=seq_model.quantize)
        rngs = {"dropout": jax.random.PRNGKey(0)}
        if warmup_steps > 0:
            hidden = seq_model.apply(seq_variables, hidden, lat[:, 0],
                                     enc_outs, warmup_steps,
                                     method=seq_model.warmup_hidden,
                                     rngs=rngs)
        out = seq_model.apply(seq_variables, hidden, lat, enc_outs,
                              method=seq_model.decode, rngs=rngs)[0]
        return dae_model.apply(dae_variables, out,
                               method=dae_model.decode)

    recon = np.zeros_like(frames)
    weight = np.zeros((T, 1))
    ramp = np.ones(n_poses)
    if blend and overlap > 0:
        ramp[:overlap] = np.linspace(0, 1, overlap, endpoint=False)
        ramp[-overlap:] = np.linspace(1, 0, overlap, endpoint=False)
    for s in starts:
        chunk = np.asarray(run_chunk(jnp.asarray(frames[s:s + n_poses])))
        recon[s:s + n_poses] += chunk * ramp[:, None]
        weight[s:s + n_poses] += ramp[:, None]
    # tail frames not covered by a full chunk keep the input
    covered = weight[:, 0] > 0
    recon[covered] /= weight[covered]
    recon[~covered] = frames[~covered]
    return recon
