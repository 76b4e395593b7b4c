"""Part a - frame-level pose representation learning.

Rebuild of the reference DAE family (ref: scripts/model/DAE_model.py):
  DAE          <- DAE_Network (:22-114), the paper's default
  VQFrame      <- VQ_Frame (:118-274), frame-level VQ variant
  VAEFrame     <- VAE_Network (:600-725), VAE variant

Shape conventions: inputs are (batch, motion_dim); the reference's
squeeze/unsqueeze(2) cosmetics are dropped. Denoising comes from input
dropout during training exactly as in the reference (the dataset feeds
clean frames; dropout is the corruption, ref: DAE_model.py:49,106).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gesture2vec_tpu.models.vq import (VQEmaState, VQOutput, init_ema_state,
                                       vq_ema)


class DAE(nn.Module):
    """Denoising autoencoder: Dropout -> Linear -> ReLU -> Linear.

    latent_dim sentinels kept from the reference (ref: DAE_model.py:35-66):
      -1: identity (ablation - no network at all)
      -2: linear 200-dim bottleneck with 0.3 dropout, no ReLU
    """

    motion_dim: int
    latent_dim: int

    def setup(self):
        if self.latent_dim == -1:
            return
        if self.latent_dim == -2:
            self.encoder = nn.Dense(200, name="encoder")
            self.decoder = nn.Dense(self.motion_dim, name="decoder")
            self.dropout = nn.Dropout(0.3)
        else:
            self.encoder = nn.Dense(self.latent_dim, name="encoder")
            self.decoder = nn.Dense(self.motion_dim, name="decoder")
            self.dropout = nn.Dropout(0.2)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.latent_dim == -1:
            return x
        h = self.encoder(x)
        if self.latent_dim != -2:
            h = nn.relu(h)
        return h

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.latent_dim == -1:
            return z
        return self.decoder(z)

    def __call__(self, x: jnp.ndarray, train: bool = False,
                 get_latent: bool = False):
        if self.latent_dim == -1:
            return (x, x) if get_latent else x
        noisy = self.dropout(x, deterministic=not train)
        z = self.encode(noisy)
        out = self.decode(z)
        if get_latent:
            return out, jax.lax.stop_gradient(z)
        return out


class VAEFrame(nn.Module):
    """Frame-level VAE (ref: DAE_model.py:600-725): Tanh encoder, fc
    mean/std heads, reparameterized sample through an fc decoder head."""

    motion_dim: int
    latent_dim: int

    def setup(self):
        self.in_do = nn.Dropout(0.5)
        self.encoder = nn.Dense(self.latent_dim)
        self.fc_mean = nn.Dense(self.latent_dim)
        self.fc_std = nn.Dense(self.latent_dim)
        self.fc_decoder = nn.Dense(self.latent_dim)
        self.decoder = nn.Dense(self.motion_dim)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """The frozen-teacher latent: raw encoder + Tanh, like the
        reference data layer's `rep_model.encoder(target)` on a
        VAE_Network (ref: lmdb_data_loader.py:653, DAE_model.py:630-635
        - the encoder Sequential is Linear+Tanh; mean/std heads are
        forward-only)."""
        return jnp.tanh(self.encoder(x))

    def decode(self, h: jnp.ndarray) -> jnp.ndarray:
        """Latent (encode output) -> motion: the eval forward's tail
        (mean head, no sampling, fc decoder, output layer)."""
        return self.decoder(self.fc_decoder(self.fc_mean(h)))

    def __call__(self, x: jnp.ndarray, train: bool = False,
                 get_latent: bool = False):
        x_in = self.in_do(x, deterministic=not train)
        h = jnp.tanh(self.encoder(x_in))
        latent = jax.lax.stop_gradient(h)
        mean = self.fc_mean(h)
        logvar = self.fc_std(h)
        if train:
            eps = jax.random.normal(self.make_rng("reparam"), mean.shape,
                                    mean.dtype)
            z = mean + jnp.exp(logvar / 2) * eps
        else:
            z = mean
        z = self.fc_decoder(z)
        out = self.decoder(z)
        if get_latent:
            return out, latent
        return out, logvar, mean


class VQFrame(nn.Module):
    """Frame-level VQ-DAE (ref: DAE_model.py:118-274 VQ_Frame).

    Linear encoder (xavier init) + BatchNorm + EMA vector quantizer
    (decay 0.99, ref line 161-169) + linear decoder; optional VAE heads
    between encoder and VQ. EMA codebook state is passed explicitly.
    """

    motion_dim: int
    latent_dim: int
    vq_components: int
    vae: bool = False
    commitment_cost: float = 0.25
    decay: float = 0.99

    def setup(self):
        xavier = nn.initializers.xavier_normal()
        self.in_do = nn.Dropout(0.5)
        self.encoder = nn.Dense(self.latent_dim, kernel_init=xavier)
        self.bn = nn.BatchNorm()
        if self.vae:
            self.fc_mean = nn.Dense(self.latent_dim)
            self.fc_std = nn.Dense(self.latent_dim)
            self.fc_decoder = nn.Dense(self.latent_dim)
        self.decoder = nn.Dense(self.motion_dim, kernel_init=xavier)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """The frozen-teacher latent: RAW encoder output, like the
        reference data layer's `rep_model.encoder(target)` on a VQ_Frame
        (ref: lmdb_data_loader.py:653) - BN, VAE heads, and the
        quantizer are forward-only there too."""
        return self.encoder(x)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Latent -> motion via the output layer. Note the encode/decode
        teacher pipeline bypasses BN+VQ exactly like the reference's
        frozen-teacher usage; the full quantized forward is __call__
        (vq_state lives in the checkpoint payload extra)."""
        return self.decoder(z)

    def __call__(self, x: jnp.ndarray, vq_state: VQEmaState,
                 train: bool = False, axis_name: Optional[str] = None,
                 skip_vq: bool = False
                 ) -> Tuple[Dict[str, Any], VQEmaState]:
        x_in = self.in_do(x, deterministic=not train)
        h = self.encoder(x_in)
        h = self.bn(h, use_running_average=not train)
        latent = jax.lax.stop_gradient(h)

        mean = logvar = None
        if self.vae:
            mean = self.fc_mean(h)
            logvar = self.fc_std(h)
            if train:
                eps = jax.random.normal(self.make_rng("reparam"),
                                        mean.shape, mean.dtype)
                z = mean + jnp.exp(logvar / 2) * eps
            else:
                z = mean
            h = self.fc_decoder(z)

        if skip_vq:
            # delayed-VQ warmup (ref: train_DAE.py:232-241 skip_vq)
            vq_out = VQOutput(jnp.zeros(()), h, jnp.zeros(()),
                              jnp.zeros((h.shape[0], self.vq_components)))
            new_state = vq_state
        else:
            vq_out, new_state = vq_ema(h, vq_state,
                                       commitment_cost=self.commitment_cost,
                                       decay=self.decay, train=train,
                                       axis_name=axis_name)
        out = self.decoder(vq_out.quantized)
        return {"output": out, "latent": latent, "vq": vq_out,
                "mean": mean, "logvar": logvar}, new_state

    @staticmethod
    def init_vq_state(key: jax.Array, vq_components: int,
                      latent_dim: int) -> VQEmaState:
        return init_ema_state(key, vq_components, latent_dim)
