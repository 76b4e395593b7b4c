"""Cluster-id -> gesture decoder.

Rebuild of the reference cluster2gesture_model
(ref: scripts/model/seq2seq_with_cluster_model.py:8-70): a cluster-id
embedding seeds a GRU, then an autoregressive GRU decoder
(pre_linear+BN+ReLU -> GRU -> out) emits DAE-latent frames.

Reference quirk behind a switch: the reference assigns the decoder GRU's
new hidden to a *differently spelled* variable (`decode_hidden` vs
`decoder_hidden`, ref :56-61), so its decoder re-reads the encoder
hidden at every step and the recurrence never advances.
parity_frozen_hidden=True reproduces that; the default threads the
hidden state like the model obviously intends.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from gesture2vec_tpu.models.gru import GRU, GRUCellStack, make_decoder_scan


class _C2GStep(nn.Module):
    hidden_size: int
    output_size: int
    n_layers: int
    dropout: float

    @nn.compact
    def __call__(self, x, hidden, train: bool = False):
        h = nn.Dense(self.hidden_size, name="pre_linear")(x)
        h = nn.BatchNorm(use_running_average=not train, name="pre_bn")(h)
        h = nn.relu(h)
        out, new_hidden = GRUCellStack(hidden_size=self.hidden_size,
                                       n_layers=self.n_layers,
                                       dropout=self.dropout,
                                       name="gru")(h, hidden, train=train)
        return nn.Dense(self.output_size, name="out_layer")(out), new_hidden


class Cluster2Gesture(nn.Module):
    n_clusters: int
    output_size: int          # DAE latent dim (x2 with derivatives)
    hidden_size: int
    n_frames: int
    n_layers: int = 1
    dropout: float = 0.5
    parity_frozen_hidden: bool = False

    def setup(self):
        self.embedding = nn.Embed(self.n_clusters, self.hidden_size)
        self.pre_gru = GRU(hidden_size=self.hidden_size,
                           n_layers=self.n_layers, dropout=self.dropout)
        self.step = _C2GStep(hidden_size=self.hidden_size,
                             output_size=self.output_size,
                             n_layers=self.n_layers, dropout=self.dropout)

    def __call__(self, cluster_ids: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        """cluster_ids (B,) -> outputs (B, n_frames, output_size);
        frame 0 is zeros like the reference (ref :47,55,66)."""
        emb = self.embedding(cluster_ids)[None, :, :]       # (1, B, H)
        _, enc_hidden = self.pre_gru(emb, train=train)      # (L, B, H)

        def body(mdl, carry, _):
            x, hidden = carry
            out, new_hidden = mdl(x, hidden, train=train)
            nxt = enc_hidden if self.parity_frozen_hidden else new_hidden
            return (out, nxt), out

        scan = make_decoder_scan(body, train, length=self.n_frames - 1)
        x0 = jnp.zeros((cluster_ids.shape[0], self.output_size))
        (_, _), outs = scan(self.step, (x0, enc_hidden), None)
        zeros0 = jnp.zeros((1,) + outs.shape[1:], outs.dtype)
        outs = jnp.concatenate([zeros0, outs], axis=0)
        return jnp.transpose(outs, (1, 0, 2))
