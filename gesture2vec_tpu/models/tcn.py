"""Temporal Convolutional Network text encoder.

Rebuild of the vendored locuslab TCN (ref: scripts/model/tcn.py:7-64)
and TextEncoderTCN (ref: scripts/model/Helper_models.py:371-449), with
two repairs - the committed reference module cannot execute:

1. The reference feeds time-major (T, B, 300) activations into Conv1d as
   if batch-major, convolving over the batch axis
   (ref: text2embedding_model.py:631 transposes to (T, B), then
   Helper_models.py:447 does emb.transpose(1, 2) -> (T, 300, B)).
   Here the encoder takes batch-major (B, T) token ids and convolves
   over time, as the TCN paper intends.
2. The reference returns (y, 0) (ref: Helper_models.py:449) and the
   caller immediately slices the int 0 as decoder_hidden
   (ref: text2embedding_model.py:662-669) - a TypeError at runtime.
   Here the encoder also produces a decoder-initial hidden state from
   the output at each sequence's last valid position.

Convs are causal: left-pad by (k-1)*dilation and truncate the right
(the reference's Chomp1d, ref: tcn.py:7-13). Weight normalization
matches torch's weight_norm(conv).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class CausalConv1d(nn.Module):
    """Weight-normalized 1D causal convolution over (B, T, C)."""

    features: int
    kernel_size: int
    dilation: int
    dtype: Optional[Any] = None   # bf16 opt-in (config.compute_dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) * self.dilation
        conv = nn.WeightNorm(nn.Conv(
            self.features, kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,), padding=[(pad, 0)],
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01)), name="wn")
        return conv(x)


class TemporalBlock(nn.Module):
    """conv->relu->dropout x2 + residual (ref: tcn.py:16-46)."""

    features: int
    kernel_size: int
    dilation: int
    dropout: float
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = CausalConv1d(self.features, self.kernel_size, self.dilation,
                         dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = CausalConv1d(self.features, self.kernel_size, self.dilation,
                         dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, kernel_size=(1,),
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name="downsample")(x)
        return nn.relu(h + x)


class TemporalConvNet(nn.Module):
    """Stacked dilated blocks, dilation 2**i (ref: tcn.py:49-64)."""

    channels: Sequence[int]
    kernel_size: int = 2
    dropout: float = 0.2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, ch in enumerate(self.channels):
            x = TemporalBlock(ch, self.kernel_size, 2 ** i, self.dropout,
                              dtype=self.dtype,
                              name=f"block{i}")(x, train=train)
        return x


class TextEncoderTCN(nn.Module):
    """Embedding -> TCN -> per-step projection, plus decoder-init hidden.

    Returns (outputs (T, B, out_dim), hidden (n_layers, B, hidden_size)):
    outputs feed attention; hidden (a projection of each sequence's last
    valid TCN state) initializes the decoder GRU - the repaired contract
    the reference intended (ref: Helper_models.py:425 projects to 32).
    """

    n_words: int
    embed_size: int = 300
    hidden_size: int = 200
    n_layers: int = 2
    kernel_size: int = 2
    dropout: float = 0.3
    emb_dropout: float = 0.1
    out_dim: Optional[int] = None  # None -> hidden_size (attention-ready)
    embedding_weights: Optional[np.ndarray] = None
    dtype: Optional[Any] = None    # bf16 opt-in; outputs return fp32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tokens (B, S) int ids; lengths (B,)."""
        if self.embedding_weights is not None:
            emb_init = lambda *_: jnp.asarray(self.embedding_weights)
        else:
            emb_init = nn.initializers.normal(1.0)
        table = self.param("embedding_table", emb_init,
                           (self.n_words, self.embed_size))
        emb = jnp.take(table, tokens, axis=0)          # (B, S, E)
        if self.dtype is not None:
            emb = emb.astype(self.dtype)
        emb = nn.Dropout(self.emb_dropout,
                         deterministic=not train)(emb)
        y = TemporalConvNet([self.hidden_size] * self.n_layers,
                            self.kernel_size, self.dropout,
                            dtype=self.dtype,
                            name="tcn")(emb, train=train)
        out_dim = self.out_dim or self.hidden_size
        outputs = nn.Dense(out_dim, name="decoder", dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.zeros)(y)

        # decoder-init hidden from each sequence's last valid state
        idx = jnp.clip(lengths - 1, 0, tokens.shape[1] - 1)
        last = jnp.take_along_axis(
            y, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        hidden = nn.Dense(self.n_layers * self.hidden_size,
                          dtype=self.dtype,
                          name="hidden_proj")(jnp.tanh(last))
        hidden = hidden.reshape(tokens.shape[0], self.n_layers,
                                self.hidden_size)
        hidden = jnp.transpose(hidden, (1, 0, 2))
        # interface stays fp32; the decoder re-casts its carry when it
        # runs in a compute dtype
        return (jnp.transpose(outputs, (1, 0, 2)).astype(jnp.float32),
                hidden.astype(jnp.float32))
