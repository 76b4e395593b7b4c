"""Text->gesture GAN variant (experimental in the reference, kept for
capability parity).

Rebuild of scripts/model/text2embedding_GAN_model.py:
  generator (ref :427-514): text encoding + noise vector fused through a
    linear layer into the decoder-initial hidden, then an autoregressive
    pose decoder;
  discriminator (ref :516-623): encodes (text, motion) and classifies
    real/fake from the final hidden states.
Training uses the unrolled-GAN schedule of the reference
(ref: scripts/train_eval/train_seq2seq.py:541-661, 10 unroll steps) -
see train/gan_trainer.py.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gesture2vec_tpu.models.gru import GRU, make_decoder_scan
from gesture2vec_tpu.models.seq_ae import DecoderStep
from gesture2vec_tpu.models.text2token import TextEncoderRNN


class T2GGenerator(nn.Module):
    n_words: int
    pose_dim: int
    n_frames: int
    hidden_size: int
    n_layers: int
    noise_dim: int = 200
    dropout: float = 0.2
    word_embed_size: int = 300
    embedding_weights: Optional[np.ndarray] = None

    def setup(self):
        self.encoder = TextEncoderRNN(
            n_words=self.n_words, embed_size=self.word_embed_size,
            hidden_size=self.hidden_size, n_layers=self.n_layers,
            dropout=self.dropout,
            embedding_weights=self.embedding_weights)
        self.fuse = nn.Dense(self.n_layers * self.hidden_size)
        self.decoder_step = DecoderStep(
            hidden_size=self.hidden_size, output_size=self.pose_dim,
            n_layers=self.n_layers, dropout_p=self.dropout,
            use_attention=True, conditioned=True, step_dropout=0.0)

    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 noise: jnp.ndarray, seed_pose: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """noise (B, noise_dim); seed_pose (B, pose_dim). Returns
        (B, n_frames, pose_dim) with frame 0 = seed."""
        enc_outs, enc_hidden = self.encoder(tokens, lengths, train=train)
        B = tokens.shape[0]
        flat = jnp.transpose(enc_hidden[: self.n_layers],
                             (1, 0, 2)).reshape(B, -1)
        fused = self.fuse(jnp.concatenate([flat, noise], axis=-1))
        dec_hidden = jnp.transpose(
            fused.reshape(B, self.n_layers, self.hidden_size), (1, 0, 2))
        enc_mask = jnp.arange(tokens.shape[1]) < jnp.max(lengths)

        step_mod = self.decoder_step

        def body(mdl, carry, _):
            prev, hidden = carry
            out, new_hidden, _ = mdl(prev, hidden, enc_outs, train=train,
                                     apply_step_dropout=False,
                                     enc_mask=enc_mask)
            return (out, new_hidden), out

        scan = make_decoder_scan(body, train, length=self.n_frames - 1)
        (_, _), outs = scan(step_mod, (seed_pose, dec_hidden), None)
        full = jnp.concatenate([seed_pose[None], outs], axis=0)
        return jnp.transpose(full, (1, 0, 2))


class T2GDiscriminator(nn.Module):
    n_words: int
    pose_dim: int
    hidden_size: int
    n_layers: int
    dropout: float = 0.2
    word_embed_size: int = 300
    embedding_weights: Optional[np.ndarray] = None

    def setup(self):
        self.text_encoder = TextEncoderRNN(
            n_words=self.n_words, embed_size=self.word_embed_size,
            hidden_size=self.hidden_size, n_layers=self.n_layers,
            dropout=self.dropout,
            embedding_weights=self.embedding_weights)
        self.pose_in = nn.Dense(self.hidden_size)
        self.pose_gru = GRU(hidden_size=self.hidden_size,
                            n_layers=self.n_layers, dropout=self.dropout)
        self.head = nn.Sequential([nn.Dense(self.hidden_size), nn.relu,
                                   nn.Dense(1)])

    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 poses: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Returns real/fake logits (B, 1)."""
        _, text_hidden = self.text_encoder(tokens, lengths, train=train)
        pose_tm = self.pose_in(jnp.transpose(poses, (1, 0, 2)))
        _, pose_hidden = self.pose_gru(pose_tm)
        feat = jnp.concatenate([text_hidden[-1], pose_hidden[-1]], axis=-1)
        return self.head(feat)
