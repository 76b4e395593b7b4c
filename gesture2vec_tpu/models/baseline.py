"""Baseline text->pose regressor (Yoon-style Seq2SeqNet).

Rebuild of the reference baseline (ref: scripts/model/seq2seq_net.py:220-256
and scripts/train.py): text encoder (packed biGRU, summed directions) +
always-attention GRU decoder emitting continuous pose frames, trained
with custom_loss. The decoder is the same step module as Part b's but
with attention always on and no 0.95 step dropout.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gesture2vec_tpu.models.gru import make_decoder_scan
from gesture2vec_tpu.models.seq_ae import DecoderStep
from gesture2vec_tpu.models.text2token import TextEncoderRNN


class Seq2SeqNet(nn.Module):
    """(ref: seq2seq_net.py:220-256)."""

    n_words: int
    pose_dim: int
    n_frames: int
    hidden_size: int
    n_layers: int
    n_pre_poses: int = 5
    dropout: float = 0.3
    word_embed_size: int = 300
    embedding_weights: Optional[np.ndarray] = None

    def setup(self):
        self.encoder = TextEncoderRNN(
            n_words=self.n_words, embed_size=self.word_embed_size,
            hidden_size=self.hidden_size, n_layers=self.n_layers,
            dropout=self.dropout,
            embedding_weights=self.embedding_weights)
        self.decoder_step = DecoderStep(
            hidden_size=self.hidden_size, output_size=self.pose_dim,
            n_layers=self.n_layers, dropout_p=self.dropout,
            use_attention=True, conditioned=True, step_dropout=0.0)

    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 poses: jnp.ndarray, train: bool = False
                 ) -> Dict[str, Any]:
        """tokens (B, S), lengths (B,), poses (B, T, pose_dim) target/seed.
        Returns outputs (B, T, pose_dim); outputs[0] is the seed frame."""
        enc_outs, enc_hidden = self.encoder(tokens, lengths, train=train)
        dec_hidden = enc_hidden[: self.n_layers]
        tgt = jnp.transpose(poses, (1, 0, 2))
        # torch pad_packed trims encoder outputs to max(lengths); mask
        # the attention identically (see models/seq_ae.Attn)
        enc_mask = jnp.arange(tokens.shape[1]) < jnp.max(lengths)

        step_mod = self.decoder_step

        def body(mdl, carry, t):
            prev_out, hidden = carry
            x = jnp.where(t - 1 < self.n_pre_poses,
                          jax.lax.dynamic_index_in_dim(tgt, t - 1, axis=0,
                                                       keepdims=False),
                          prev_out)
            out, new_hidden, _ = mdl(x, hidden, enc_outs, train=train,
                                     apply_step_dropout=False,
                                     enc_mask=enc_mask)
            return (out, new_hidden), out

        scan = make_decoder_scan(body, train)
        ts = jnp.arange(1, self.n_frames)
        (_, _), outs = scan(step_mod, (tgt[0], dec_hidden), ts)
        full = jnp.concatenate([tgt[:1], outs], axis=0)
        return {"outputs": jnp.transpose(full, (1, 0, 2))}
