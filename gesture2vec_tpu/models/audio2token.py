"""Audio-context Part-d variant: mel chunks -> gesture tokens.

Rebuild of the reference's audio_context=True configuration
(ref: scripts/model/text2embedding_model.py:41,563-571 swaps the text
encoder for EncoderRNN_With_Audio, whose shipped branch consumes ONLY
audio features - see models/audio.AudioContextEncoder). The decoder is
the same discrete token decoder as the text path, teacher-forced for
the first n_pre_poses steps then argmax-fed, under lax.scan
(ref: text2embedding_model.py:701-744).

encode_audio / decode_tokens are exposed separately (like
Text2Token.encode_text) so inference can batch-encode every window in
one device call and scan the seed-carried decode across windows.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gesture2vec_tpu.models.gru import make_decoder_scan
from gesture2vec_tpu.models.audio import (AudioContextEncoder,
                                          AudioTextFusionEncoder)
from gesture2vec_tpu.models.text2token import (TokenDecoderStep,
                                               beam_decode_impl,
                                               sample_logits)


class Audio2Token(nn.Module):
    """fusion="audio" (default): the shipped Audio_Features=True branch,
    mel chunks only. fusion="both": the text+audio branch (ref
    both=True, Helper_models.py:246-253 - repaired, see
    models.audio.AudioTextFusionEncoder), encoder inputs are a
    (word_ids, wav_chunks) tuple."""

    n_tokens: int
    hidden_size: int
    n_layers: int
    n_steps: int
    n_pre_poses: int = 2
    dropout: float = 0.2
    use_attention: bool = True
    fusion: str = "audio"          # "audio" | "both"
    n_words: int = 0               # required when fusion="both"
    embed_size: int = 300
    token_stages: int = 1  # >1: residual-stage heads, same contract as
    # Text2Token (feedback + res["logits"] stay stage-0;
    # res["stage_logits"] covers steps 1..)
    stage_conditional: bool = False  # chain the stage heads (see
    # text2token.stage_chain); train mode then needs stage_targets
    # "bfloat16": bf16 matmuls in the encoder GRU + decoder recurrence;
    # logits/CE/argmax stay fp32 (same discipline as Text2Token)
    compute_dtype: str = "float32"

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        if self.fusion == "both":
            self.encoder = AudioTextFusionEncoder(
                n_words=self.n_words, hidden_size=self.hidden_size,
                embed_size=self.embed_size, n_layers=self.n_layers,
                dropout=self.dropout, dtype=self._dtype)
        else:
            self.encoder = AudioContextEncoder(
                hidden_size=self.hidden_size, n_layers=self.n_layers,
                dropout=self.dropout, dtype=self._dtype)
        self.decoder_step = TokenDecoderStep(
            hidden_size=self.hidden_size, n_tokens=self.n_tokens,
            n_layers=self.n_layers, dropout_p=self.dropout,
            use_attention=self.use_attention, dtype=self._dtype,
            n_stage_heads=self.token_stages - 1,
            stage_conditional=self.stage_conditional)

    def encode_audio(self, encoder_inputs, train: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """fusion="audio": encoder_inputs is mel_chunks
        (B, S, n_mels, frames). fusion="both": a (word_ids (B, T),
        wav_chunks (B, S, samples)) tuple. Returns (encoder outputs
        (S|T, B, H), decoder-initial hidden (L, B, H))."""
        if self.fusion == "both":
            word_ids, wav_chunks = encoder_inputs
            enc_outs, enc_hidden = self.encoder(word_ids, wav_chunks,
                                                train=train)
        else:
            enc_outs, enc_hidden = self.encoder(encoder_inputs,
                                                train=train)
        return enc_outs, enc_hidden[: self.n_layers]

    def decode_tokens(self, enc_outs: jnp.ndarray, dec_hidden: jnp.ndarray,
                      target_tokens: jnp.ndarray, train: bool = False,
                      temperature: float = 0.0, top_k: int = 0,
                      stage_targets=None) -> Dict[str, Any]:
        """The autoregressive token decode given an audio encoding.

        temperature=0 (default) is the reference's greedy decode; >0
        samples ancestrally (models/text2token.sample_logits) and needs
        a "sample" rng stream at apply time."""
        seed = target_tokens[:, 0]
        onehot0 = jax.nn.one_hot(seed, self.n_tokens)
        if self._dtype is not None:
            dec_hidden = dec_hidden.astype(self._dtype)
        step_mod = self.decoder_step

        multi = self.token_stages > 1
        cond = multi and self.stage_conditional
        if cond and train and stage_targets is None:
            raise ValueError("stage_conditional training needs "
                             "stage_targets (B, n_steps, token_stages)")

        def body(mdl, carry, t):
            prev_token, hidden = carry
            teacher = jax.lax.dynamic_index_in_dim(target_tokens, t - 1,
                                                   axis=1, keepdims=False)
            token_in = jnp.where(t - 1 < self.n_pre_poses, teacher,
                                 prev_token)
            if cond:
                st = None
                if train:
                    st = jax.lax.dynamic_index_in_dim(
                        stage_targets, t, axis=1, keepdims=False)
                (logits, new_hidden, attn, stage_logits, best,
                 stage_best) = mdl(token_in, hidden, enc_outs,
                                   train=train, stage_teacher=st,
                                   temperature=temperature, top_k=top_k)
                return (best, new_hidden), (
                    (logits, attn, stage_logits, stage_best), best)
            res = mdl(token_in, hidden, enc_outs, train=train)
            if multi:
                logits, new_hidden, attn, stage_logits = res
            else:
                logits, new_hidden, attn = res
                stage_logits = None
            if temperature > 0.0:
                best = sample_logits(logits, temperature, top_k,
                                     mdl.make_rng("sample"))
                if multi:
                    stage_best = sample_logits(stage_logits, temperature,
                                               top_k,
                                               mdl.make_rng("sample"))
            else:
                best = jnp.argmax(logits, axis=-1)
                if multi:
                    stage_best = jnp.argmax(stage_logits, axis=-1)
            ys = ((logits, attn, stage_logits, stage_best) if multi
                  else (logits, attn))
            return (best, new_hidden), (ys, best)

        scan = make_decoder_scan(body, train)
        ts = jnp.arange(1, self.n_steps)
        if multi:
            (_, _), ((logits_seq, attns, stage_seq, stage_tok),
                     chosen) = scan(step_mod, (seed, dec_hidden), ts)
        else:
            (_, _), ((logits_seq, attns), chosen) = scan(
                step_mod, (seed, dec_hidden), ts)
        logits = jnp.concatenate([onehot0[None], logits_seq], axis=0)
        tokens = jnp.concatenate([seed[None].astype(chosen.dtype),
                                  chosen], axis=0)
        out = {"logits": jnp.transpose(logits, (1, 0, 2)),
               "attentions": attns,
               "tokens": jnp.transpose(tokens, (1, 0))}
        if multi:
            out["stage_logits"] = jnp.transpose(stage_seq, (1, 0, 2, 3))
            out["stage_tokens"] = jnp.transpose(stage_tok, (1, 0, 2))
        return out

    def beam_decode(self, enc_outs: jnp.ndarray,
                    dec_hidden: jnp.ndarray, target_tokens: jnp.ndarray,
                    beam_width: int = 4) -> Dict[str, Any]:
        """Beam-search token decode given an audio encoding (eval only;
        see text2token.beam_decode_impl)."""
        return beam_decode_impl(self, enc_outs, dec_hidden,
                                target_tokens, beam_width)

    def __call__(self, encoder_inputs, target_tokens: jnp.ndarray,
                 train: bool = False, temperature: float = 0.0,
                 top_k: int = 0, stage_targets=None) -> Dict[str, Any]:
        """encoder_inputs: see encode_audio; target_tokens (B, n_steps)."""
        enc_outs, dec_hidden = self.encode_audio(encoder_inputs,
                                                 train=train)
        return self.decode_tokens(enc_outs, dec_hidden, target_tokens,
                                  train=train, temperature=temperature,
                                  top_k=top_k, stage_targets=stage_targets)
