"""Part b, transformer encoder variant — TPU-first chunk encoder.

Beyond-reference redesign of the Part-b tokenizer's ENCODER half
(ref: scripts/model/Autoencoder_VQVAE_model.py:30-100 EncoderRNN is a
biGRU over the chunk frames; the reference itself left a disabled
conv-encoder experiment at :739). The biGRU serializes 2 layers x 2
directions x n_frames tiny (B, H) x (H, 3H) matmuls; at the tokenizer's
production training shapes (B=1024 bf16) this recurrence bounds the
whole train step at ~16% MFU (benchmarks/README.md round 3). This
module replaces it with a pre-LN transformer over the n_frames chunk
positions: one parallel pass whose QKV/MLP matmuls batch (B*T, H)
rows onto the MXU. Select with `seq_arch: transformer` in the YAML
(config extras, like Part d's `t2t_arch`); the GRU decoder and the VQ
bottleneck are untouched, so token semantics and every downstream
consumer stay identical.

Contract-compatible with seq_ae.SeqEncoder: (T, B, D) time-major
frames -> (outputs (T, B, H) fp32, hidden (n_layers, B, H) fp32).
`hidden` — the VQ input — is a learned projection of the masked
mean-pool; SeqVQAutoencoder.encode's `[:n_layers]` slice is then the
identity (the biGRU returns 2L direction-major entries and relies on
the same slice, a reference quirk this variant has no reason to copy).

Token-identity precision: in fp32 mode every matmul here runs
precision="highest" (TPU fp32 matmuls default to bf16 passes, ~1e-3
error — enough to flip a VQ argmin near a Voronoi boundary); bf16
training mode keeps single-pass MXU matmuls like the rest of the
stack (CLAUDE.md fp32-island discipline).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gesture2vec_tpu.models.transformer import Block, sinusoidal_positions


class TransformerSeqEncoder(nn.Module):
    """Chunk frames -> contextual frame embeddings + pooled hidden."""

    hidden_size: int
    n_layers: int
    dropout: float
    n_heads: int = 4
    dtype: Optional[Any] = None   # bf16 opt-in (config.compute_dtype)

    @nn.compact
    def __call__(self, xs: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xs (T, B, D) -> (outputs (T, B, H) fp32,
        hidden (n_layers, B, H) fp32)."""
        prec = None if self.dtype is not None else "highest"
        T = xs.shape[0]
        h = nn.Dense(self.hidden_size, name="in_layer", dtype=self.dtype,
                     precision=prec)(xs)                  # (T, B, H)
        x = jnp.transpose(h, (1, 0, 2))                   # (B, T, H)
        x = x + jnp.asarray(
            sinusoidal_positions(T, self.hidden_size), dtype=x.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.n_layers):
            x, _ = Block(self.hidden_size, self.n_heads, self.dropout,
                         dtype=self.dtype, precision=prec,
                         name=f"layer_{i}")(x, None, train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)
        x = x.astype(jnp.float32)
        pooled = jnp.mean(x, axis=1)                      # (B, H)
        flat = nn.Dense(self.n_layers * self.hidden_size,
                        name="hidden_proj",
                        precision=prec)(pooled)           # fp32 (VQ input)
        hidden = jnp.transpose(
            flat.reshape(-1, self.n_layers, self.hidden_size), (1, 0, 2))
        return jnp.transpose(x, (1, 0, 2)), hidden
