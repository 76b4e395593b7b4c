"""Part d, transformer variant - text to gesture-token translation.

Beyond-reference, TPU-first redesign of the Part-d translator
(ref: scripts/model/text2embedding_model.py:488-746 is a GRU
encoder/decoder with Bahdanau attention). The reference architecture is
recurrence-bound: training serializes over the decoder scan (3.75% MFU
at B=128, benchmarks/README.md) and the encoder GRU over words. This
module replaces both with a pre-LN transformer encoder-decoder:

  - Training is ONE parallel pass - no lax.scan anywhere. Every
    position's QKV/MLP matmul batches onto the MXU, which is exactly
    the workload the systolic array wants (large fused (B*T, H) x
    (H, 4H) matmuls instead of T sequential (B, H) x (H, H) gate
    steps).
  - Inference keeps the reference's autoregressive semantics (teacher
    tokens for the first n_pre_poses steps, then the chosen token feeds
    back; greedy / sampled / beam policies identical to
    models/text2token). With n_steps = 6 at production shapes the
    rollout re-runs the full parallel decoder per emitted token instead
    of carrying a recurrent hidden - 5 extra tiny fused programs beat a
    serialized scan with per-step recurrent state, and there is no
    KV-cache bookkeeping to get wrong at this length.

API contract: drop-in for models/text2token.Text2Token - the same
constructor attributes, the same `__call__` / `encode_text` /
`decode_tokens` / `beam_decode` methods returning the same dict shapes
("logits" (B, T, K) with step 0 the seed one-hot, "tokens" (B, T),
"attentions" (T-1, B, S) = the last decoder layer's head-averaged
cross-attention, plus "stage_logits"/"stage_tokens" when
token_stages > 1). train/text2token_trainer and infer/text2gesture
therefore run it unchanged; select it with `t2t_arch: transformer` in
the YAML.

Deliberate deviation from the reference semantics, documented: at
TRAIN time the decoder is teacher-forced in parallel (standard
transformer training), whereas the reference feeds back its own argmax
after n_pre_poses during training too (ref :734-744). Feedback
training cannot be parallelized; the parity-exact GRU model keeps the
reference behavior, this variant trades it for the parallel pass.
Eval/inference feedback semantics are identical to the reference's.

The word-embedding table is named "embedding_table" so
parallel/mesh.param_spec row-shards it over the tp axis exactly like
the GRU variant's.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gesture2vec_tpu.models.gru import make_decoder_scan
from gesture2vec_tpu.models.text2token import sample_logits, stage_chain


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Standard fixed sinusoidal position table (length, dim), fp32."""
    pos = np.arange(length, dtype=np.float32)[:, None]
    i = np.arange(dim, dtype=np.float32)[None, :]
    angle = pos / np.power(10000.0, (2.0 * (i // 2)) / dim)
    table = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


class MHA(nn.Module):
    """Multi-head attention that returns its head-averaged weights
    (flax's stock module hides them; Part d's res dict exposes the
    cross-attention map like the reference's Bahdanau attn matrix)."""

    hidden_size: int
    n_heads: int
    dtype: Optional[Any] = None
    precision: Optional[str] = None  # "highest" for token-identity
    # paths in fp32 mode (TPU fp32 matmuls default to bf16 passes)

    @nn.compact
    def __call__(self, q_in: jnp.ndarray, kv_in: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """q_in (B, Tq, H), kv_in (B, Tk, H), mask broadcastable to
        (B, 1, Tq, Tk) (True = attend) -> (out (B, Tq, H),
        weights (B, Tq, Tk) head-averaged fp32)."""
        H, nh = self.hidden_size, self.n_heads
        hd = H // nh
        q = nn.Dense(H, dtype=self.dtype, name="q",
                     precision=self.precision)(q_in)
        k = nn.Dense(H, dtype=self.dtype, name="k",
                     precision=self.precision)(kv_in)
        v = nn.Dense(H, dtype=self.dtype, name="v",
                     precision=self.precision)(kv_in)

        def split(x):  # (B, T, H) -> (B, nh, T, hd)
            return x.reshape(x.shape[0], x.shape[1], nh, hd) \
                    .transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        # scores/softmax in fp32 even under bf16 compute: attention
        # sharpness is a token-identity path (fp32-island discipline,
        # CLAUDE.md / models/vq)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32,
                            precision=self.precision)
        scores = scores.astype(jnp.float32) / np.sqrt(hd)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e30)
        w = jax.nn.softmax(scores, axis=-1)
        wc = w.astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", wc, v,
                         precision=self.precision)
        out = out.transpose(0, 2, 1, 3).reshape(
            q_in.shape[0], q_in.shape[1], H)
        out = nn.Dense(H, dtype=self.dtype, name="o",
                       precision=self.precision)(out)
        return out, jnp.mean(w, axis=1)


class Block(nn.Module):
    """Pre-LN transformer block; cross-attention optional."""

    hidden_size: int
    n_heads: int
    dropout: float
    cross: bool = False
    dtype: Optional[Any] = None
    precision: Optional[str] = None  # see MHA

    @nn.compact
    def __call__(self, x: jnp.ndarray, self_mask: Optional[jnp.ndarray],
                 enc: Optional[jnp.ndarray] = None,
                 enc_mask: Optional[jnp.ndarray] = None,
                 train: bool = False
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        drop = lambda y: nn.Dropout(self.dropout,
                                    deterministic=not train)(y)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_self")(x)
        a, _ = MHA(self.hidden_size, self.n_heads, dtype=self.dtype,
                   precision=self.precision,
                   name="self_attn")(h, h, mask=self_mask)
        x = x + drop(a)
        cross_w = None
        if self.cross:
            h = nn.LayerNorm(dtype=self.dtype, name="ln_cross")(x)
            a, cross_w = MHA(self.hidden_size, self.n_heads,
                             dtype=self.dtype,
                             precision=self.precision,
                             name="cross_attn")(
                h, enc, mask=enc_mask)
            x = x + drop(a)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_mlp")(x)
        h = nn.Dense(4 * self.hidden_size, dtype=self.dtype,
                     precision=self.precision, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype,
                     precision=self.precision, name="mlp_out")(h)
        return x + drop(h), cross_w


class _TextEncoder(nn.Module):
    """Word ids -> contextual embeddings + masked mean-pool."""

    n_words: int
    word_embed_size: int
    hidden_size: int
    n_layers: int
    n_heads: int
    dropout: float
    embedding_weights: Optional[np.ndarray] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, S) ids, (B,) lengths -> (enc (B, S, H) fp32,
        pooled (B, H) fp32)."""
        if self.embedding_weights is not None:
            emb_init = lambda *_: jnp.asarray(self.embedding_weights)
        else:
            emb_init = nn.initializers.normal(1.0)
        table = self.param("embedding_table", emb_init,
                           (self.n_words, self.word_embed_size))
        x = jnp.take(table, tokens, axis=0)                # (B, S, E)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     name="embed_proj")(x)
        x = x + jnp.asarray(
            sinusoidal_positions(tokens.shape[1], self.hidden_size),
            dtype=x.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        valid = (jnp.arange(tokens.shape[1])[None, :]
                 < lengths[:, None])                       # (B, S)
        mask = valid[:, None, None, :]                     # (B,1,1,S)
        for i in range(self.n_layers):
            x, _ = Block(self.hidden_size, self.n_heads, self.dropout,
                         dtype=self.dtype, name=f"layer_{i}")(
                x, mask, train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)
        x = x.astype(jnp.float32)
        denom = jnp.maximum(lengths[:, None].astype(jnp.float32), 1.0)
        pooled = jnp.sum(x * valid[:, :, None], axis=1) / denom
        return x, pooled


class _TokenDecoder(nn.Module):
    """Causal token decoder with cross-attention, parallel form."""

    n_tokens: int
    hidden_size: int
    n_layers: int
    n_heads: int
    dropout: float
    n_stage_heads: int = 0
    stage_conditional: bool = False  # chain the stage heads
    # (text2token.stage_chain); extra returns below
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, buf: jnp.ndarray, enc: jnp.ndarray,
                 enc_mask: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 stage_teacher: Optional[jnp.ndarray] = None,
                 temperature: float = 0.0, top_k: int = 0,
                 stage0_temperature: float = -1.0
                 ) -> Tuple[jnp.ndarray, ...]:
        """buf (B, T) token ids, enc (B, S, H) -> fp32 (logits
        (B, T, K) where position j predicts step j+1, cross-attn
        weights (B, T, S) from the last layer, stage logits
        (B, T, S-1, K) or None).

        Stage-conditional mode returns (logits, cross_w, stage_logits,
        primary_choice (B, T), stage_choice (B, T, S-1)) — the whole
        chain runs vectorized over positions: teacher-forced with
        stage_teacher (B, T, S) at train, self-chained through each
        position's own greedy/sampled choice at eval (the rollout then
        reads position t-1's choice so the conditioning code and the
        emitted code are the same draw)."""
        T = buf.shape[1]
        emb = nn.Embed(self.n_tokens, self.hidden_size,
                       dtype=self.dtype, name="token_embedding")(buf)
        x = emb + jnp.asarray(
            sinusoidal_positions(T, self.hidden_size), dtype=emb.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        em = None
        if enc_mask is not None:
            em = jnp.reshape(enc_mask, (-1, enc.shape[1]))[
                :, None, None, :]                          # (B|1,1,1,S)
        cross_w = None
        for i in range(self.n_layers):
            x, cross_w = Block(self.hidden_size, self.n_heads,
                               self.dropout, cross=True,
                               dtype=self.dtype, name=f"layer_{i}")(
                x, causal, enc=enc, enc_mask=em, train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)
        logits = nn.Dense(self.n_tokens, name="out_layer",
                          dtype=self.dtype)(x).astype(jnp.float32)
        if self.n_stage_heads and self.stage_conditional:
            stage_logits, best, stage_best = stage_chain(
                self, x, logits, stage_teacher, temperature, top_k,
                stage0_temperature)
            return (logits, cross_w.astype(jnp.float32), stage_logits,
                    best, stage_best)
        stage_logits = None
        if self.n_stage_heads:
            heads = [nn.Dense(self.n_tokens, name=f"out_layer_r{s + 1}",
                              dtype=self.dtype)(x)
                     for s in range(self.n_stage_heads)]
            stage_logits = jnp.stack(heads, axis=-2).astype(jnp.float32)
        return logits, cross_w.astype(jnp.float32), stage_logits


class TransformerText2Token(nn.Module):
    """Sentence -> gesture-token sequence, transformer encoder-decoder.

    Constructor mirrors models/text2token.Text2Token (plus n_heads);
    see the module docstring for the API contract."""

    n_words: int
    n_tokens: int
    hidden_size: int
    n_layers: int
    n_steps: int
    n_pre_poses: int = 2
    dropout: float = 0.2
    word_embed_size: int = 300
    n_heads: int = 4
    embedding_weights: Optional[np.ndarray] = None
    token_stages: int = 1
    stage_conditional: bool = False  # chain the residual-stage heads
    # (text2token.stage_chain); train mode then needs stage_targets
    compute_dtype: str = "float32"
    # always attends (cross-attention is structural here); the field
    # exists because cli/infer gates its attention plots on it
    use_attention: bool = True

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        self.encoder = _TextEncoder(
            n_words=self.n_words, word_embed_size=self.word_embed_size,
            hidden_size=self.hidden_size, n_layers=self.n_layers,
            n_heads=self.n_heads, dropout=self.dropout,
            embedding_weights=self.embedding_weights, dtype=self._dtype)
        self.decoder = _TokenDecoder(
            n_tokens=self.n_tokens, hidden_size=self.hidden_size,
            n_layers=self.n_layers, n_heads=self.n_heads,
            dropout=self.dropout,
            n_stage_heads=self.token_stages - 1,
            stage_conditional=self.stage_conditional, dtype=self._dtype)

    # --- public API --------------------------------------------------

    def encode_text(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                    train: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Contract-compatible with Text2Token.encode_text: returns
        (enc_outs (S, B, H), dec_hidden (L, B, H)). The "hidden" is
        the masked mean-pool tiled over layers - the decoder actually
        conditions through cross-attention; the slot is kept so the
        window-batching inference code is shared between archs."""
        enc, pooled = self.encoder(tokens, lengths, train=train)
        return (jnp.transpose(enc, (1, 0, 2)),
                jnp.tile(pooled[None], (self.n_layers, 1, 1)))

    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 target_tokens: jnp.ndarray, train: bool = False,
                 temperature: float = 0.0, top_k: int = 0,
                 stage_targets: Optional[jnp.ndarray] = None,
                 stage0_temperature: float = -1.0
                 ) -> Dict[str, Any]:
        enc_outs, dec_hidden = self.encode_text(tokens, lengths,
                                                train=train)
        # per-SENTENCE valid mask, not batch-max: transformer pad rows
        # carry content (pad-token embeddings through self-attention),
        # so a batch-max mask would make a sentence's decode depend on
        # batch composition (advisor finding, round 3)
        enc_mask = (jnp.arange(tokens.shape[1])[None, :]
                    < lengths[:, None])
        return self.decode_tokens(enc_outs, dec_hidden, target_tokens,
                                  train=train, enc_mask=enc_mask,
                                  temperature=temperature, top_k=top_k,
                                  stage_targets=stage_targets,
                                  stage0_temperature=stage0_temperature)

    def decode_tokens(self, enc_outs: jnp.ndarray,
                      dec_hidden: jnp.ndarray,
                      target_tokens: jnp.ndarray, train: bool = False,
                      enc_mask: Optional[jnp.ndarray] = None,
                      temperature: float = 0.0, top_k: int = 0,
                      stage_targets: Optional[jnp.ndarray] = None,
                      stage0_temperature: float = -1.0
                      ) -> Dict[str, Any]:
        """Teacher-forced parallel pass in train mode; reference
        feedback semantics (autoregressive greedy/sampled) otherwise.
        dec_hidden is accepted for API parity and unused."""
        del dec_hidden
        enc = jnp.transpose(enc_outs, (1, 0, 2))          # (B, S, H)
        T = self.n_steps
        multi = self.token_stages > 1
        cond = multi and self.stage_conditional
        seed = target_tokens[:, 0]
        onehot0 = jax.nn.one_hot(seed, self.n_tokens)

        if train:
            # parallel teacher forcing: position j's input is
            # target[j], its logits predict step j+1
            if cond:
                if stage_targets is None:
                    raise ValueError(
                        "stage_conditional training needs stage_targets "
                        "(B, n_steps, token_stages)")
                # position j predicts step j+1: teacher codes align 1..
                logits_all, cross_w, stage_all, _, stage_ch = \
                    self.decoder(target_tokens[:, :T - 1], enc, enc_mask,
                                 train=True,
                                 stage_teacher=stage_targets[:, 1:, :])
            else:
                logits_all, cross_w, stage_all = self.decoder(
                    target_tokens[:, :T - 1], enc, enc_mask, train=True)
            logits = jnp.concatenate([onehot0[:, None], logits_all],
                                     axis=1)               # (B, T, K)
            chosen = jnp.argmax(logits_all, axis=-1)
            out = {"logits": logits,
                   "attentions": jnp.transpose(cross_w, (1, 0, 2)),
                   "tokens": jnp.concatenate(
                       [seed[:, None], chosen], axis=1)}
            if multi:
                out["stage_logits"] = stage_all            # (B,T-1,S-1,K)
                out["stage_tokens"] = (stage_ch if cond else
                                       jnp.argmax(stage_all, axis=-1))
            return out

        # autoregressive rollout, reference feedback semantics: the
        # decoder input at position j is the teacher token while
        # j < n_pre_poses (ref text2embedding_model.py:734-744), the
        # chosen token after. The carry is just the (B, T-1) input
        # buffer - the parallel decoder recomputes the prefix each step
        # (T = 6 at production shapes; no recurrent state, no KV cache).
        # n_pre clamps to >= 1 so buf0[:, 0] always carries the seed
        # token (target[0]); with the literal n_pre_poses=0 the first
        # step would condition on token id 0 instead of the seed, which
        # the GRU variant never does (advisor finding, round 3).
        n_pre = max(1, min(self.n_pre_poses, T))
        pos = jnp.arange(T - 1)[None, :]
        buf0 = jnp.where(pos < n_pre, target_tokens[:, :T - 1], 0)
        t0 = (temperature if stage0_temperature < 0.0
              else stage0_temperature)

        def body(mdl, carry, t):
            buf, = carry
            if cond:
                # the decoder makes every position's choice itself (the
                # chain conditions on it); read position t-1's
                logits_all, cross_w, stage_all, prim_ch, stage_ch = mdl(
                    buf, enc, enc_mask, train=False,
                    temperature=temperature, top_k=top_k,
                    stage0_temperature=stage0_temperature)
            else:
                logits_all, cross_w, stage_all = mdl(buf, enc, enc_mask,
                                                     train=False)
            lg = jax.lax.dynamic_index_in_dim(logits_all, t - 1, axis=1,
                                              keepdims=False)
            if cond:
                best = jax.lax.dynamic_index_in_dim(prim_ch, t - 1,
                                                    axis=1,
                                                    keepdims=False)
            elif t0 > 0.0:
                best = sample_logits(lg, t0, top_k,
                                     mdl.make_rng("sample"))
            else:
                best = jnp.argmax(lg, axis=-1)
            # position t's input (read by steps t+1..): teacher while
            # t < n_pre (already in buf0), else the token just chosen;
            # the final step's write lands out of range harmlessly
            # (clamped; nothing reads it)
            tw = jnp.minimum(t, T - 2)
            write = jnp.where(
                t < n_pre,
                jax.lax.dynamic_index_in_dim(target_tokens, tw, axis=1,
                                             keepdims=False),
                best)
            buf = jax.lax.dynamic_update_index_in_dim(buf, write, tw,
                                                      axis=1)
            aw = jax.lax.dynamic_index_in_dim(cross_w, t - 1, axis=1,
                                              keepdims=False)
            if multi:
                sl = jax.lax.dynamic_index_in_dim(stage_all, t - 1,
                                                  axis=1, keepdims=False)
                if cond:
                    sb = jax.lax.dynamic_index_in_dim(stage_ch, t - 1,
                                                      axis=1,
                                                      keepdims=False)
                elif temperature > 0.0:
                    sb = sample_logits(sl, temperature, top_k,
                                       mdl.make_rng("sample"))
                else:
                    sb = jnp.argmax(sl, axis=-1)
                return (buf,), ((lg, aw, sl, sb), best)
            return (buf,), ((lg, aw), best)

        scan = make_decoder_scan(body, train=False)
        ts = jnp.arange(1, T)
        if multi:
            (_,), ((lg_seq, attns, sl_seq, sb_seq), chosen) = scan(
                self.decoder, (buf0,), ts)
        else:
            (_,), ((lg_seq, attns), chosen) = scan(
                self.decoder, (buf0,), ts)
        logits = jnp.concatenate(
            [onehot0[:, None], jnp.transpose(lg_seq, (1, 0, 2))], axis=1)
        out = {"logits": logits,
               "attentions": attns,
               "tokens": jnp.concatenate(
                   [seed[:, None].astype(chosen.dtype),
                    jnp.transpose(chosen, (1, 0))], axis=1)}
        if multi:
            out["stage_logits"] = jnp.transpose(sl_seq, (1, 0, 2, 3))
            out["stage_tokens"] = jnp.transpose(sb_seq, (1, 0, 2))
        return out

    def greedy_tokens(self, logits: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(logits, axis=-1)

    def beam_decode(self, enc_outs: jnp.ndarray, dec_hidden: jnp.ndarray,
                    target_tokens: jnp.ndarray, beam_width: int = 4,
                    enc_mask: Optional[jnp.ndarray] = None
                    ) -> Dict[str, Any]:
        """Batched in-graph beam search (same contract and teacher
        semantics as models/text2token.beam_decode_impl: emitted tokens
        from step 1 on are the beam's choices, inputs are
        teacher-forced while t < n_pre_poses). Simpler than the GRU
        version: no recurrent hidden to gather - the beam state is the
        K token buffers plus the recorded sequences, re-decoded in
        parallel each step with hypotheses riding the batch axis."""
        del dec_hidden
        K, T, V = int(beam_width), self.n_steps, self.n_tokens
        enc = jnp.transpose(enc_outs, (1, 0, 2))
        B = target_tokens.shape[0]
        S1 = self.token_stages - 1
        multi = S1 > 0
        n_pre = max(1, min(self.n_pre_poses, T))  # seed always in buf0

        encK = jnp.repeat(enc, K, axis=0)                  # (B*K, S, H)
        emK = None
        if enc_mask is not None:
            em = jnp.reshape(enc_mask, (-1, enc.shape[1]))
            emK = jnp.repeat(jnp.broadcast_to(em, (B, enc.shape[1])),
                             K, axis=0)
        seed = target_tokens[:, 0]
        pos = jnp.arange(T - 1)[None, :]
        buf0 = jnp.where(pos < n_pre, target_tokens[:, :T - 1], 0)
        bufK0 = jnp.repeat(buf0, K, axis=0)                # (B*K, T-1)
        # all K hypotheses start identical: only beam 0 live
        lp0 = jnp.tile(jnp.concatenate(
            [jnp.zeros((1,), jnp.float32),
             jnp.full((K - 1,), -jnp.inf, jnp.float32)]), (B, 1))
        seqs0 = jnp.zeros((B, K, T), jnp.int32) \
            .at[:, :, 0].set(seed[:, None])
        stages0 = jnp.zeros((B, K, T, max(S1, 1)), jnp.int32)

        cond = multi and self.stage_conditional

        def body(mdl, carry, t):
            bufK, logprob, seqs, stages = carry
            stage_ch = None
            if cond:
                # chain conditions on each hypothesis's own argmax
                # primary (stage codes never enter the beam score —
                # same caveat as text2token.beam_decode_impl)
                logits_all, _, stage_all, _, stage_ch = mdl(
                    bufK, encK, emK, train=False)
            else:
                logits_all, _, stage_all = mdl(bufK, encK, emK,
                                               train=False)
            lg = jax.lax.dynamic_index_in_dim(logits_all, t - 1, axis=1,
                                              keepdims=False)
            logp = jax.nn.log_softmax(lg, axis=-1).reshape(B, K, V)
            scores = (logprob[:, :, None] + logp).reshape(B, K * V)
            top_lp, top_idx = jax.lax.top_k(scores, K)     # (B, K)
            parent = top_idx // V
            new_tok = top_idx % V
            buf3 = jnp.take_along_axis(bufK.reshape(B, K, T - 1),
                                       parent[:, :, None], axis=1)
            seqs = jnp.take_along_axis(seqs, parent[:, :, None], axis=1)
            seqs = seqs.at[:, :, t].set(new_tok)
            tw = jnp.minimum(t, T - 2)
            teacher = jax.lax.dynamic_index_in_dim(target_tokens, tw,
                                                   axis=1, keepdims=False)
            write = jnp.where(t < n_pre, teacher[:, None], new_tok)
            buf3 = jax.lax.dynamic_update_index_in_dim(buf3, write, tw,
                                                       axis=2)
            if multi:
                if cond:
                    st = jax.lax.dynamic_index_in_dim(
                        stage_ch, t - 1, axis=1,
                        keepdims=False).reshape(B, K, S1)
                else:
                    sl = jax.lax.dynamic_index_in_dim(
                        stage_all, t - 1, axis=1, keepdims=False)
                    st = jnp.argmax(sl, axis=-1).reshape(B, K, S1)
                st = jnp.take_along_axis(st, parent[:, :, None], axis=1)
                stages = jnp.take_along_axis(
                    stages, parent[:, :, None, None], axis=1)
                stages = stages.at[:, :, t, :].set(st)
            return (buf3.reshape(B * K, T - 1), top_lp, seqs,
                    stages), ()

        scan = make_decoder_scan(body, train=False)
        (_, logprob, seqs, stages), _ = scan(
            self.decoder, (bufK0, lp0, seqs0, stages0),
            jnp.arange(1, T))

        best = jnp.argmax(logprob, axis=1)
        out = {"tokens": jnp.take_along_axis(
                   seqs, best[:, None, None], axis=1)[:, 0],
               "logprob": jnp.take_along_axis(logprob, best[:, None],
                                              axis=1)[:, 0]}
        if multi:
            out["stage_tokens"] = jnp.take_along_axis(
                stages, best[:, None, None, None], axis=1)[:, 0, 1:, :]
        return out
