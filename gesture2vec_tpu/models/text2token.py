"""Part d - text to gesture-token translation.

Rebuild of the reference text2embedding_model
(ref: scripts/model/text2embedding_model.py:488-746): a text encoder
produces (outputs, hidden); an autoregressive GRU decoder with a token
embedding input and optional Bahdanau attention emits one gesture-token
logit vector per n_frames-chunk of the sentence window
(sentence_frame_length // n_frames steps = 6 for 120/20). Teacher
forcing feeds ground-truth tokens for the first n_pre_poses steps, then
the argmax feeds back (ref :734-744), in-graph under lax.scan.

Text encoder selection (ref :548-599):
  - "gru": packed-sequence biGRU over FastText embeddings, directions
    summed (ref :46-135) - the reference's only RUNNABLE path.
  - "tcn": the TemporalConvNet encoder. The committed reference TCN path
    crashes (returns (y, 0), then slices the int - see models/tcn.py);
    ours is the repaired version and is the default, matching the
    reference's declared intent (use_TCN=True, ref :42).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gesture2vec_tpu.models.gru import (
    GRUCellStack, MaskedBiGRU, make_decoder_scan)
from gesture2vec_tpu.models.seq_ae import Attn
from gesture2vec_tpu.models.tcn import TextEncoderTCN


def sample_logits(logits: jnp.ndarray, temperature: float, top_k: int,
                  key: jax.Array) -> jnp.ndarray:
    """Stochastic token choice for autoregressive decode: a categorical
    sample from softmax(logits / temperature), optionally truncated to
    the top_k logits first (top_k=0 keeps the full distribution;
    top_k=1 degenerates to argmax). Static-shape and in-graph
    (lax.top_k threshold + jax.random.categorical), so it lives inside
    the decode lax.scan with no host round-trips.

    Beyond-reference capability: the reference decodes greedily only
    (text2embedding_model.py:734-744); greedy decode underdisperses the
    generated token distribution (QUALITY.md: generated perplexity 4.7
    vs real 6.9), which sampling addresses at temperature ~1."""
    lg = logits / temperature
    if top_k and top_k < lg.shape[-1]:
        kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    return jax.random.categorical(key, lg, axis=-1)


def beam_decode_impl(model, enc_outs: jnp.ndarray,
                     dec_hidden: jnp.ndarray,
                     target_tokens: jnp.ndarray, beam_width: int,
                     enc_mask: Optional[jnp.ndarray] = None
                     ) -> Dict[str, Any]:
    """Batched in-graph beam search over the autoregressive token
    decode (beyond reference, eval-only; the reference decodes greedily,
    text2embedding_model.py:734-744). Shared by Text2Token and
    Audio2Token — both decode through the same TokenDecoderStep.

    TPU-native shape: the K hypotheses ride the batch axis (B*K rows
    through one decoder step per time step), the beam recombination is
    one lax.top_k over K*V scores, and parent gathers are
    take_along_axis — the whole search is one lax.scan, no host logic.
    Token sequences are carried in the beam state (n_steps is small, 6
    at production shapes) so no backtrace pass is needed.

    Teacher prefix semantics: inputs at steps t-1 < n_pre_poses are the
    teacher tokens (as in greedy decode); emitted tokens from step 1 on
    are the beam's choices. Beam width 1 reproduces greedy decode
    exactly (top_k(1) over one hypothesis's scores = argmax).

    Returns {"tokens": (B, n_steps) best sequence (step 0 = seed),
    "logprob": (B,) its total log-probability, and "stage_tokens"
    (B, n_steps-1, S-1) when the model has residual-stage heads (stage
    choices are per-hypothesis argmax — they do not feed back)}."""
    K = int(beam_width)
    V, L, T = model.n_tokens, model.n_layers, model.n_steps
    n_pre, H = model.n_pre_poses, model.hidden_size
    B = target_tokens.shape[0]
    S1 = getattr(model, "token_stages", 1) - 1
    multi = S1 > 0
    # stage-conditional chain under beam: the chain conditions on each
    # hypothesis's own argmax primary (made inside the step), not the
    # beam-recombined token — stage codes never enter the beam score,
    # so this only affects the reported stage ids, documented here
    cond = multi and getattr(model, "stage_conditional", False)

    seed = target_tokens[:, 0]
    eo = jnp.repeat(enc_outs, K, axis=1)            # (S, B*K, H)
    hid0 = jnp.repeat(dec_hidden, K, axis=1)        # (L, B*K, H)
    tok0 = jnp.repeat(seed, K)                      # (B*K,)
    # all K hypotheses start identical: only beam 0 is live, so the
    # first expansion picks the K best distinct continuations
    lp0 = jnp.tile(jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                    jnp.full((K - 1,), -jnp.inf,
                                             jnp.float32)]), (B, 1))
    seqs0 = jnp.zeros((B, K, T), jnp.int32) \
        .at[:, :, 0].set(seed[:, None])
    stages0 = jnp.zeros((B, K, T, max(S1, 1)), jnp.int32)

    step_mod = model.decoder_step

    def body(mdl, carry, t):
        tokens, hidden, logprob, seqs, stages = carry
        teacher = jax.lax.dynamic_index_in_dim(target_tokens, t - 1,
                                               axis=1, keepdims=False)
        token_in = jnp.where(t - 1 < n_pre, jnp.repeat(teacher, K),
                             tokens)
        res = mdl(token_in, hidden, eo, train=False, enc_mask=enc_mask)
        st_choice = None
        if cond:
            logits, new_hidden, _, stage_logits, _, st_choice = res
        elif multi:
            logits, new_hidden, _, stage_logits = res
        else:
            logits, new_hidden, _ = res
            stage_logits = None
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
        scores = (logprob[:, :, None] + logp).reshape(B, K * V)
        top_lp, top_idx = jax.lax.top_k(scores, K)       # (B, K)
        parent = top_idx // V
        new_tok = top_idx % V
        hidK = new_hidden.reshape(L, B, K, H)
        hidK = jnp.take_along_axis(hidK, parent[None, :, :, None],
                                   axis=2)
        seqs = jnp.take_along_axis(seqs, parent[:, :, None], axis=1)
        seqs = seqs.at[:, :, t].set(new_tok)
        if multi:
            st = (st_choice if cond
                  else jnp.argmax(stage_logits, axis=-1)).reshape(
                B, K, S1)
            st = jnp.take_along_axis(st, parent[:, :, None], axis=1)
            stages = jnp.take_along_axis(
                stages, parent[:, :, None, None], axis=1)
            stages = stages.at[:, :, t, :].set(st)
        return (new_tok.reshape(-1), hidK.reshape(L, B * K, H),
                top_lp, seqs, stages), ()

    scan = make_decoder_scan(body, train=False)
    (_, _, logprob, seqs, stages), _ = scan(
        step_mod, (tok0, hid0, lp0, seqs0, stages0),
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


def stage_chain(mdl, out: jnp.ndarray, logits_f32: jnp.ndarray,
                stage_teacher: Optional[jnp.ndarray],
                temperature: float, top_k: int,
                stage0_temperature: float = -1.0
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Conditional residual-stage heads (config.stage_conditional;
    beyond reference — the reference has no multi-stage tokens at all).

    Head s predicts stage s+1's code from the decoder state PLUS
    embeddings of the stage <= s codes:
        h_0 = out;  h_{s+1} = h_s + E_s(c_s);  logits_{s+1} = W_{s+1} h_{s+1}
    mirroring the residual-VQ structure the codes come from (stage s+1
    quantizes the residual GIVEN stages <= s). The independent-head
    alternative must marginalize over the earlier stages' choices,
    which is what blew up the 4-stage val CE (QUALITY.md 21.6 vs 8.3).

    Teacher forcing: with `stage_teacher` (..., S) — column 0 the
    primary code — the chain conditions on the ground-truth codes (the
    train-time factorization). Without it the chain feeds its own
    choices (greedy, or ancestral samples at temperature > 0 via the
    module's "sample" rng), and the PRIMARY choice is made here too so
    the conditioning code and the emitted code are the same draw.

    Per-stage decode policy (beyond reference, eval-only): the PRIMARY
    (stage-0) choice uses `stage0_temperature` when >= 0 (0 = greedy)
    while the residual-stage choices keep `temperature` — greedy
    stage 0 + sampled residual stages separates the semantic token
    choice (which sampling costs BLEU/acc, QUALITY.md) from the
    distributional dispersion the residual stages provide. The default
    sentinel -1 keeps one policy for all stages.

    Must execute inside the owning module's compact/apply context (the
    Dense/Embed submodules register on `mdl`; head param names stay
    `out_layer_r{s+1}` — the chain adds `stage_embed_{s}` tables).
    Shapes: out (..., H), logits_f32 (..., K); returns
    (stage_logits (..., S-1, K) fp32, best (...,), stage_best (..., S-1)).
    """
    H = out.shape[-1]
    teach = stage_teacher is not None
    t0 = temperature if stage0_temperature < 0.0 else stage0_temperature

    def choose(lg, temp):
        if temp > 0.0:
            return sample_logits(lg, temp, top_k,
                                 mdl.make_rng("sample"))
        return jnp.argmax(lg, axis=-1)

    best = (jnp.argmax(logits_f32, axis=-1) if teach
            else choose(logits_f32, t0))
    prev = stage_teacher[..., 0] if teach else best
    emb_init = nn.initializers.normal(1.0 / np.sqrt(H))
    h = out
    stage_lg, stage_ch = [], []
    for s in range(mdl.n_stage_heads):
        e = nn.Embed(mdl.n_tokens, H, embedding_init=emb_init,
                     dtype=mdl.dtype, name=f"stage_embed_{s}")(prev)
        h = h + e
        lg = nn.Dense(mdl.n_tokens, name=f"out_layer_r{s + 1}",
                      dtype=mdl.dtype)(h).astype(jnp.float32)
        stage_lg.append(lg)
        c = stage_teacher[..., s + 1] if teach else choose(lg, temperature)
        stage_ch.append(jnp.argmax(lg, axis=-1) if teach else c)
        prev = c
    return (jnp.stack(stage_lg, axis=-2), best,
            jnp.stack(stage_ch, axis=-1))


class TextEncoderRNN(nn.Module):
    """Embedding -> packed biGRU, directions summed
    (ref: text2embedding_model.py:46-135)."""

    n_words: int
    embed_size: int
    hidden_size: int
    n_layers: int
    dropout: float
    embedding_weights: Optional[np.ndarray] = None
    dtype: Optional[Any] = None   # bf16 opt-in; outputs return fp32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tokens (B, S), lengths (B,) -> (outputs (S, B, H),
        hidden (2L, B, H))."""
        if self.embedding_weights is not None:
            emb_init = lambda *_: jnp.asarray(self.embedding_weights)
        else:
            emb_init = nn.initializers.normal(1.0)
        table = self.param("embedding_table", emb_init,
                           (self.n_words, self.embed_size))
        emb = jnp.take(table, tokens, axis=0)              # (B, S, E)
        emb = jnp.transpose(emb, (1, 0, 2))                # (S, B, E)
        outs, hidden = MaskedBiGRU(hidden_size=self.hidden_size,
                                   n_layers=self.n_layers,
                                   dropout=self.dropout,
                                   dtype=self.dtype,
                                   name="gru")(emb, lengths, train=train)
        outs = outs[..., :self.hidden_size] + outs[..., self.hidden_size:]
        return outs.astype(jnp.float32), hidden.astype(jnp.float32)


class TokenDecoderStep(nn.Module):
    """One decoder step over discrete gesture tokens
    (ref: text2embedding_model.py:201-395 with
    discrete_representation=True): Embedding(token) -> Dropout(0.5) ->
    [attention ->] pre_linear(BN+ReLU) -> GRU stack -> logits."""

    hidden_size: int
    n_tokens: int
    n_layers: int
    dropout_p: float
    use_attention: bool = True
    dtype: Optional[Any] = None   # bf16 opt-in (config.compute_dtype)
    n_stage_heads: int = 0  # extra residual-stage logit heads (the
    # multi-stage Part d for vq_variant="rvq" tokenizers; 0 keeps the
    # reference shape and return arity exactly)
    stage_conditional: bool = False  # chain the stage heads: head s
    # sees embeddings of the stage <= s codes (config.stage_conditional)

    @nn.compact
    def __call__(self, token: jnp.ndarray, hidden: jnp.ndarray,
                 encoder_outputs: jnp.ndarray, train: bool = False,
                 enc_mask: Optional[jnp.ndarray] = None,
                 stage_teacher: Optional[jnp.ndarray] = None,
                 temperature: float = 0.0, top_k: int = 0,
                 stage0_temperature: float = -1.0
                 ) -> Tuple[jnp.ndarray, ...]:
        """Extra returns in the stage-conditional mode (see
        _stage_chain): (..., stage_logits, best, stage_best) — the step
        chooses its own tokens there so the conditioning codes and the
        emitted codes are the same draw."""
        emb = nn.Embed(self.n_tokens, self.hidden_size,
                       name="token_embedding")(token)       # (B, H)
        x = nn.Dropout(0.5, deterministic=not train)(emb)  # ref :260

        attn_weights = None
        if self.use_attention:
            attn_weights = Attn(self.hidden_size, name="attn")(
                hidden[-1], encoder_outputs, mask=enc_mask)
            context = jnp.einsum("bt,tbh->bh", attn_weights,
                                 encoder_outputs)
            x = jnp.concatenate([x, context], axis=-1)

        h = nn.Dense(self.hidden_size, name="pre_linear",
                     dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, name="pre_bn",
                         dtype=self.dtype)(h)
        h = nn.relu(h)
        out, new_hidden = GRUCellStack(hidden_size=self.hidden_size,
                                       n_layers=self.n_layers,
                                       dropout=self.dropout_p,
                                       dtype=self.dtype,
                                       name="gru")(h, hidden, train=train)
        logits = nn.Dense(self.n_tokens, name="out_layer",
                          dtype=self.dtype)(out)
        # CE loss and the argmax feedback read fp32 logits either way
        if self.n_stage_heads and self.stage_conditional:
            return (logits.astype(jnp.float32), new_hidden,
                    attn_weights) + stage_chain(
                self, out, logits.astype(jnp.float32), stage_teacher,
                temperature, top_k, stage0_temperature)
        if self.n_stage_heads:
            stage = [nn.Dense(self.n_tokens, name=f"out_layer_r{s + 1}",
                              dtype=self.dtype)(out)
                     for s in range(self.n_stage_heads)]
            stage_logits = jnp.stack(stage, axis=-2).astype(jnp.float32)
            return (logits.astype(jnp.float32), new_hidden, attn_weights,
                    stage_logits)
        return logits.astype(jnp.float32), new_hidden, attn_weights


class Text2Token(nn.Module):
    """Sentence -> sequence of gesture-token logits
    (ref: text2embedding_model.py:488-746)."""

    n_words: int
    n_tokens: int              # vq components (= pose_dim when discrete)
    hidden_size: int
    n_layers: int
    n_steps: int               # sentence_frame_length // n_frames
    n_pre_poses: int = 2
    dropout: float = 0.2
    word_embed_size: int = 300
    encoder_type: str = "tcn"  # "tcn" (repaired default) | "gru"
    use_attention: bool = True
    embedding_weights: Optional[np.ndarray] = None
    token_stages: int = 1  # >1: predict residual-VQ stage tokens too
    # (one extra head per stage; feedback and res["logits"] stay
    # stage-0, res["stage_logits"] carries steps 1.. for the heads)
    stage_conditional: bool = False  # chain the stage heads (see
    # stage_chain); train mode then needs stage_targets (B, T, S)
    # "bfloat16": single-pass MXU matmuls in the TCN/GRU encoder and the
    # decoder recurrence; logits, CE, and the argmax token feedback stay
    # fp32 (same fp32-island discipline as seq_ae.SeqVQAutoencoder)
    compute_dtype: str = "float32"

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        if self.encoder_type == "tcn":
            self.encoder = TextEncoderTCN(
                n_words=self.n_words, embed_size=self.word_embed_size,
                hidden_size=self.hidden_size, n_layers=self.n_layers,
                kernel_size=2, dropout=0.3, emb_dropout=0.1,
                embedding_weights=self.embedding_weights,
                dtype=self._dtype)
        elif self.encoder_type == "gru":
            self.encoder = TextEncoderRNN(
                n_words=self.n_words, embed_size=self.word_embed_size,
                hidden_size=self.hidden_size, n_layers=self.n_layers,
                dropout=self.dropout,
                embedding_weights=self.embedding_weights,
                dtype=self._dtype)
        else:
            raise ValueError(f"unknown encoder_type {self.encoder_type!r}")
        self.decoder_step = TokenDecoderStep(
            hidden_size=self.hidden_size, n_tokens=self.n_tokens,
            n_layers=self.n_layers, dropout_p=self.dropout,
            use_attention=self.use_attention, dtype=self._dtype,
            n_stage_heads=self.token_stages - 1,
            stage_conditional=self.stage_conditional)

    def encode_text(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                    train: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, S) word ids -> (encoder outputs (S, B, H),
        decoder-initial hidden (L, B, H)). Exposed separately so
        inference can batch-encode many windows in one call."""
        enc_outs, enc_hidden = self.encoder(tokens, lengths, train=train)
        return enc_outs, enc_hidden[: self.n_layers]

    def decode_tokens(self, enc_outs: jnp.ndarray, dec_hidden: jnp.ndarray,
                      target_tokens: jnp.ndarray, train: bool = False,
                      enc_mask: Optional[jnp.ndarray] = None,
                      temperature: float = 0.0, top_k: int = 0,
                      stage_targets: Optional[jnp.ndarray] = None,
                      stage0_temperature: float = -1.0
                      ) -> Dict[str, Any]:
        """The autoregressive token decode given a text encoding.

        temperature=0 (default) is the reference's greedy decode; >0
        samples each step's token ancestrally (the sampled token feeds
        back) and needs a "sample" rng stream at apply time.
        stage0_temperature >= 0 overrides the PRIMARY token's policy
        only (0 = greedy) while residual stages keep `temperature` —
        see stage_chain."""
        return self._decode(enc_outs, dec_hidden, target_tokens, train,
                            enc_mask=enc_mask, temperature=temperature,
                            top_k=top_k, stage_targets=stage_targets,
                            stage0_temperature=stage0_temperature)

    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 target_tokens: jnp.ndarray, train: bool = False,
                 temperature: float = 0.0, top_k: int = 0,
                 stage_targets: Optional[jnp.ndarray] = None,
                 stage0_temperature: float = -1.0
                 ) -> Dict[str, Any]:
        """tokens (B, S) word ids; lengths (B,); target_tokens (B, n_steps)
        gesture-token ids (teacher signal). Returns logits
        (B, n_steps, n_tokens) where step 0 is the one-hot of the seed
        token (ref :643-649,677), the per-step attention matrix, and
        "tokens" (B, n_steps): the decoded ids (greedy at
        temperature=0, sampled otherwise; step 0 is the seed)."""
        enc_outs, dec_hidden = self.encode_text(tokens, lengths,
                                                train=train)
        # replicate torch pad_packed trimming: attention only over
        # positions < max(lengths)
        enc_mask = jnp.arange(tokens.shape[1]) < jnp.max(lengths)
        return self._decode(enc_outs, dec_hidden, target_tokens, train,
                            enc_mask=enc_mask, temperature=temperature,
                            top_k=top_k, stage_targets=stage_targets,
                            stage0_temperature=stage0_temperature)

    def _decode(self, enc_outs: jnp.ndarray, dec_hidden: jnp.ndarray,
                target_tokens: jnp.ndarray, train: bool,
                enc_mask: Optional[jnp.ndarray] = None,
                temperature: float = 0.0,
                top_k: int = 0,
                stage_targets: Optional[jnp.ndarray] = None,
                stage0_temperature: float = -1.0
                ) -> Dict[str, Any]:

        t0 = (temperature if stage0_temperature < 0.0
              else stage0_temperature)
        seed = target_tokens[:, 0]
        onehot0 = jax.nn.one_hot(seed, self.n_tokens)
        if self._dtype is not None:
            # scan carries need a stable dtype: start the hidden in the
            # compute dtype (GRU steps keep it there)
            dec_hidden = dec_hidden.astype(self._dtype)

        step_mod = self.decoder_step

        multi = self.token_stages > 1
        cond = multi and self.stage_conditional
        if cond and train and stage_targets is None:
            raise ValueError("stage_conditional training needs "
                             "stage_targets (B, n_steps, token_stages)")

        def body(mdl, carry, t):
            prev_token, hidden = carry
            # input at step t was chosen at the end of step t-1: ground
            # truth while t-1 < n_pre_poses, else the previous argmax
            # (ref :734-744)
            teacher = jax.lax.dynamic_index_in_dim(target_tokens, t - 1,
                                                   axis=1, keepdims=False)
            token_in = jnp.where(t - 1 < self.n_pre_poses, teacher,
                                 prev_token)
            if cond:
                # teacher-forced chain at train (this step's GT codes);
                # self-chained (the step's own greedy/sampled choices,
                # same draw that feeds back) at eval
                st = None
                if train:
                    st = jax.lax.dynamic_index_in_dim(
                        stage_targets, t, axis=1, keepdims=False)
                (logits, new_hidden, attn, stage_logits, best,
                 stage_best) = mdl(token_in, hidden, enc_outs,
                                   train=train, enc_mask=enc_mask,
                                   stage_teacher=st,
                                   temperature=temperature, top_k=top_k,
                                   stage0_temperature=stage0_temperature)
                return (best, new_hidden), (
                    (logits, attn, stage_logits, stage_best), best)
            res = mdl(token_in, hidden, enc_outs, train=train,
                      enc_mask=enc_mask)
            if multi:
                logits, new_hidden, attn, stage_logits = res
            else:
                logits, new_hidden, attn = res
                stage_logits = None
            if t0 > 0.0:
                best = sample_logits(logits, t0, top_k,
                                     mdl.make_rng("sample"))
            else:
                best = jnp.argmax(logits, axis=-1)
            if multi:
                if temperature > 0.0:
                    stage_best = sample_logits(stage_logits, temperature,
                                               top_k,
                                               mdl.make_rng("sample"))
                else:
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
               # the decoded ids themselves (step 0 = seed): identical
               # to argmax(logits) at temperature=0, the ancestral
               # sample that actually fed back otherwise
               "tokens": jnp.transpose(tokens, (1, 0))}
        if multi:
            # (T-1, B, S-1, K) -> (B, T-1, S-1, K); covers steps 1..
            # (step 0 is the seed, excluded from CE like stage 0's)
            out["stage_logits"] = jnp.transpose(stage_seq, (1, 0, 2, 3))
            # chosen residual-stage ids per step (B, T-1, S-1)
            out["stage_tokens"] = jnp.transpose(stage_tok, (1, 0, 2))
        return out

    def greedy_tokens(self, logits: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(logits, axis=-1)

    def beam_decode(self, enc_outs: jnp.ndarray,
                    dec_hidden: jnp.ndarray, target_tokens: jnp.ndarray,
                    beam_width: int = 4,
                    enc_mask: Optional[jnp.ndarray] = None
                    ) -> Dict[str, Any]:
        """Beam-search token decode given a text encoding (eval only;
        see beam_decode_impl)."""
        return beam_decode_impl(self, enc_outs, dec_hidden,
                                target_tokens, beam_width,
                                enc_mask=enc_mask)
