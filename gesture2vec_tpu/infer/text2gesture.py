"""End-to-end inference: transcript -> gesture tokens -> motion frames.

Rebuild of the reference's generate_gestures pipeline
(ref: scripts/inference_text2embedding.py:108-569):

  per ~6 s subdivision (sentence_frame_length / fps, ref :255-265):
    words in window -> ids -> Part-d model -> n_steps gesture tokens
    (ref :360-366), carrying the previous window's trailing predictions
    as the next teacher-forced prefix (ref :369-374);
  per token, one of two synthesis modes:
    "exemplar" (the reference's shipped default): a corpus window of
      that token is retrieved and its frozen-DAE latents are used
      directly - the reference computes a seq-AE rollout and then
      discards it at :520 (`reconstructed_rnn = encoded.unsqueeze(1)`);
    "decode": the token's codebook vector re-inflates the decoder hidden
      and the Part-b GRU decoder rolls the chunk out - the generative
      path exercised by inference_Autoencoder.py.

TPU-native structure: the reference dispatches one model call per token
and per window from Python (ref :255-547). Here the whole generation is
THREE device calls regardless of duration - one lax.scan over windows
for token prediction (the cross-window seed carry lives in the scan
carry), one lax.scan over chunks for the generative decode (previous
chunk's last frame in the carry), and one batched DAE decode. Only
exemplar retrieval (pure indexing) happens on host.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.data.datasets import unnormalize
from gesture2vec_tpu.text.vocab import Vocab


@dataclasses.dataclass
class GestureGenerator:
    t2t_model: object
    t2t_variables: dict
    seq_model: object
    seq_variables: dict
    dae_model: object
    dae_variables: dict
    vocab: Vocab
    pose_mean: np.ndarray
    pose_std: np.ndarray
    n_frames: int = 20
    sentence_frame_length: int = 120
    fps: int = 20
    max_words: int = 48
    mode: str = "exemplar"            # "exemplar" | "decode"
    latent_bank: Optional[Dict[str, np.ndarray]] = None
    seed: int = 0
    # decode mode: True threads each chunk's last frame into the next
    # chunk's seed (sequential scan); False decodes all chunks as one
    # batch seeded with zeros, like the reference's per-chunk decoding
    # (ref: inference_Autoencoder.py:124-231) - 60x more parallel.
    chunk_continuity: bool = False
    # run the chunk rollout through the fully-fused Pallas decoder
    # kernel (ops/decoder_pallas) - TPU only, 2-layer no-attention
    # decoders; falls back to the scan path otherwise
    use_fused_decoder: bool = False
    # True (reference behavior): each window's teacher prefix carries the
    # previous window's trailing predictions (ref :369-374), forcing a
    # sequential scan over windows. False: all windows decode in ONE
    # batched call with zero seeds - W-fold more parallel, for
    # throughput-first deployments
    window_carry: bool = True
    # stochastic token decode (beyond reference; the reference decodes
    # greedily only, inference_text2embedding.py:360-366): 0.0 keeps
    # the greedy argmax; >0 samples each token ancestrally at this
    # softmax temperature (models/text2token.sample_logits), in-graph.
    # Greedy decode underdisperses the generated token distribution
    # (QUALITY.md); temperature ~1 restores diversity. top_k optionally
    # truncates the distribution first (0 = full). Sampling draws are
    # seeded from `seed` and fresh per generate() call.
    temperature: float = 0.0
    top_k: int = 0
    # per-stage decode policy (beyond reference, multi-stage Part d):
    # >= 0 overrides the PRIMARY (stage-0) token's temperature only —
    # 0.0 keeps the semantic token choice greedy while the residual
    # stages sample at `temperature`, separating the token-identity
    # decision (which sampling costs BLEU/acc, QUALITY.md) from the
    # distributional dispersion the residual stages carry. -1 (default)
    # keeps one policy for all stages (models/text2token.stage_chain).
    stage0_temperature: float = -1.0
    # beam-search token decode (beyond reference; exclusive with
    # temperature>0): 0/1 = greedy, >1 searches that many hypotheses
    # per window in-graph (models/text2token.beam_decode_impl) and
    # emits the most probable token sequence
    beam_width: int = 0
    # exemplar mode only (beyond reference): continuity-aware retrieval
    # (motion matching) — among each token's candidate windows pick the
    # one whose opening pose is nearest the previous pick's closing
    # pose, instead of the reference's uniform random pick
    # (inference_text2embedding.py:606-612), minimizing the splice jump
    # at chunk boundaries
    exemplar_continuity: bool = False
    # beyond reference (config `text_context_s`): extend each window's
    # word lookup backwards by this many seconds — must match the value
    # the Part-d checkpoint was TRAINED with (build_generator wires it
    # from the checkpoint config); 0 = the reference's window-local rule
    text_context_s: float = 0.0
    # decode mode only (beyond reference): soft-mixture decode. The
    # GS-Soft tokenizer trains its decoder on SOFT codebook mixtures,
    # so the hard codebook[argmax] vertex that decode mode feeds is out
    # of distribution by design (QUALITY.md VQ ablation). >0 rebuilds
    # each chunk's hidden from the Part-d predictive distribution
    # instead: softmax(step logits / soft_decode) @ codebook, in-graph.
    # Seed/carried steps keep the hard vertex (their "logits" are a
    # synthetic one-hot, not a model prediction). soft_decode -> 0
    # converges to the hard decode; 1.0 uses the model's own softmax.
    soft_decode: float = 0.0
    # decode mode only (beyond reference): overlap-blended chunk decode.
    # Each chunk's GRU rolls decode_overlap extra frames past its
    # trained length and the next chunk's head crossfades with that
    # tail — the reference's sliding-window blending idea
    # (inference.py:64-90) applied to the token decode. Frames outside
    # the blend regions are bit-identical to the unblended decode.
    # Exclusive with chunk_continuity; the fused Pallas decoder is
    # fixed-length, so use_fused_decoder falls back to the scan path.
    decode_overlap: int = 0

    def __post_init__(self):
        self.n_steps = self.sentence_frame_length // self.n_frames
        self._rng = np.random.default_rng(self.seed)
        if self.mode == "decode" and self.seq_model.use_attention:
            # decode mode rolls chunks out from codebook hidden states
            # alone - there is no encoder sequence for the attention to
            # read, so an autoencoder_att Part-b model cannot drive it
            # (the reference's generative rollout is likewise
            # attention-free, Autoencoder_VQVAE_model.py:1038-1054)
            raise ValueError(
                "decode mode cannot drive an attention-enabled Part-b "
                "decoder; use exemplar mode for this checkpoint")
        if self.mode == "exemplar":
            assert self.latent_bank is not None, \
                "exemplar mode needs a latent bank (cluster/latent_dataset)"
            from gesture2vec_tpu.infer.exemplar import ExemplarBank
            self._exemplars = ExemplarBank(
                self.latent_bank, int(self.t2t_model.n_tokens),
                self._codebook(), self._rng)

        t2t, seq, dae = self.t2t_model, self.seq_model, self.dae_model
        n_pre = t2t.n_pre_poses
        n_steps = self.n_steps

        if self.use_fused_decoder:
            # the fused kernel covers 2-layer no-attention decoders on
            # TPU; anything else falls back to the scan path (see
            # ops/decoder_pallas docstring)
            import logging

            # the kernel reproduces exactly the default rollout: output
            # fed back each step, no zeroed input (conditioned), no
            # eval step dropout, a single seed frame (n_pre_poses=1)
            ok = (seq.n_layers == 2 and not seq.use_attention
                  and seq.conditioned and not seq.eval_step_dropout
                  and seq.n_pre_poses == 1
                  and jax.devices()[0].platform == "tpu")
            if ok:
                from gesture2vec_tpu.ops.decoder_pallas import supported
                ok = supported(seq.hidden_size, seq.rep_dim,
                               seq.n_frames)
            if not ok:
                logging.warning("use_fused_decoder unsupported here "
                                "(needs TPU, 2 layers, no attention, "
                                "VMEM fit); using the scan decoder")
                self.use_fused_decoder = False

        window_carry = self.window_carry
        s0t = float(self.stage0_temperature)
        sampling = self.temperature > 0.0 or s0t > 0.0
        temp, topk = float(self.temperature), int(self.top_k)
        beam = int(self.beam_width) if self.beam_width > 1 else 0
        if beam and sampling:
            raise ValueError("beam_width>1 and temperature>0 are "
                             "mutually exclusive decode policies")
        soft = float(self.soft_decode)
        if soft and self.mode != "decode":
            raise ValueError("soft_decode only applies to decode mode "
                             "(exemplar retrieval is indexed by hard "
                             "tokens)")
        if soft and beam:
            raise ValueError("soft_decode needs the per-step predictive "
                             "distribution, which beam search does not "
                             "produce; use greedy or sampled decode")

        # batched-window enc masks: the transformer arch takes (and
        # needs) a per-SENTENCE (W, S) valid mask — its pad rows carry
        # content, so a batch-max mask would make decodes depend on
        # batch composition (advisor finding, round 3). The GRU arch's
        # Attn takes a (S,) batch-max mask (reference parity: packed
        # sequences trimmed to max length, pad hiddens frozen).
        per_sent_mask = type(t2t).__name__ == "TransformerText2Token"

        def _batched_mask(word_ids, lengths):
            if per_sent_mask:
                return (jnp.arange(word_ids.shape[1])[None, :]
                        < lengths[:, None])
            return jnp.arange(word_ids.shape[1]) < jnp.max(lengths)

        def _mix_probs(logits, tokens):
            """Per-step codebook mixture for soft decode: softmax of the
            decode logits at temperature `soft`, with step-0 rows (the
            seed/carry steps, whose "logits" are a synthetic one-hot,
            ref :643-649 parity) replaced by the hard one-hot of the
            token that actually fed downstream."""
            p = jax.nn.softmax(logits / soft, axis=-1)
            hard0 = jax.nn.one_hot(tokens[..., 0], logits.shape[-1],
                                   dtype=p.dtype)[..., None, :]
            return jnp.concatenate([hard0, p[..., 1:, :]], axis=-2)
        if self.decode_overlap:
            if self.chunk_continuity:
                raise ValueError("decode_overlap and chunk_continuity "
                                 "are mutually exclusive chunk-"
                                 "transition mechanisms")
            if self.use_fused_decoder:
                import logging
                logging.warning("decode_overlap needs the scan decoder "
                                "(variable rollout length); disabling "
                                "use_fused_decoder")
                self.use_fused_decoder = False

        def _tw(key):
            """Decode-apply kwargs for the configured decode policy:
            empty at temperature 0 (greedy; the model never touches the
            "sample" stream), else the temperature/top_k statics plus
            the per-call sample rng (and the stage-0 override when
            set)."""
            if not sampling:
                return {}
            kw = dict(temperature=temp, top_k=topk,
                      rngs={"sample": key})
            if s0t >= 0.0:
                kw["stage0_temperature"] = s0t
            return kw

        def _decode_win(eo, dh, seeds, mask, key):
            """One window-batch token decode under the configured
            policy (greedy / sampled / beam); returns the model's res
            dict — "tokens" (B, n_steps) is the common contract."""
            t2t_ = self.t2t_model
            if beam:
                return t2t_.apply(self.t2t_variables, eo, dh, seeds,
                                  enc_mask=mask, beam_width=beam,
                                  method=t2t_.beam_decode)
            return t2t_.apply(self.t2t_variables, eo, dh, seeds,
                              train=False, enc_mask=mask,
                              method=t2t_.decode_tokens, **_tw(key))

        # multi-stage decode: a token_stages>1 Part d predicts the
        # residual-VQ stage codes too, and decode mode rebuilds the FULL
        # quantized hidden (sum of stage codebook rows) instead of
        # stage 0 only — the rvq e2e chain (models/text2token
        # token_stages, models/vq.VQResidual.embed_stage_tokens)
        multi = getattr(t2t, "token_stages", 1) > 1
        if multi:
            assert getattr(seq, "vq_variant", "") == "rvq", \
                "a token_stages>1 Part d needs an rvq Part-b tokenizer"
            assert seq.rvq_stages >= t2t.token_stages, \
                (f"Part d predicts {t2t.token_stages} stages but the "
                 f"tokenizer has {seq.rvq_stages}")

        @jax.jit
        def predict_tokens_all(word_ids, lengths, seed0, key):
            """Text encoding of ALL windows in one batched call, then a
            scan over windows for the seed-carried token decode (or one
            fully-batched decode when window_carry=False).
            word_ids (W, S), lengths (W,), seed0 (n_steps,); key drives
            the stochastic decode (unused at temperature 0). When
            soft_decode > 0 a second output carries the per-step
            mixture distribution (W*n_steps, K)."""
            if not window_carry:
                W = word_ids.shape[0]
                targets = jnp.zeros((W, n_steps), jnp.int32)
                if beam:
                    eo, dh = t2t.apply(self.t2t_variables, word_ids,
                                       lengths, method=t2t.encode_text)
                    mask = _batched_mask(word_ids, lengths)
                    res = _decode_win(eo, dh, targets, mask, key)
                else:
                    res = t2t.apply(self.t2t_variables, word_ids,
                                    lengths, targets, train=False,
                                    **_tw(key))
                if soft:
                    return (res["tokens"].reshape(-1),
                            _mix_probs(res["logits"], res["tokens"])
                            .reshape(-1, t2t.n_tokens))
                return res["tokens"].reshape(-1)

            enc_outs, dec_hidden = t2t.apply(
                self.t2t_variables, word_ids, lengths,
                method=t2t.encode_text)   # (S, W, H), (L, W, H)

            def body(seed_tokens, w):
                eo = jax.lax.dynamic_slice_in_dim(enc_outs, w, 1, axis=1)
                dh = jax.lax.dynamic_slice_in_dim(dec_hidden, w, 1, axis=1)
                mask = jnp.arange(word_ids.shape[1]) < lengths[w]
                res = _decode_win(eo, dh, seed_tokens[None], mask,
                                  jax.random.fold_in(key, w))
                toks = res["tokens"][0]
                next_seed = jnp.zeros((n_steps,), jnp.int32) \
                    .at[:n_pre].set(toks[-n_pre:])
                if soft:
                    return next_seed, (
                        toks, _mix_probs(res["logits"][0], toks))
                return next_seed, toks

            if soft:
                _, (all_toks, all_probs) = jax.lax.scan(
                    body, seed0, jnp.arange(word_ids.shape[0]))
                return (all_toks.reshape(-1),
                        all_probs.reshape(-1, t2t.n_tokens))
            _, all_toks = jax.lax.scan(body, seed0,
                                       jnp.arange(word_ids.shape[0]))
            return all_toks.reshape(-1)               # (W * n_steps,)

        if multi:
            S1 = t2t.token_stages - 1

            def _stage_mix(stage_logits):
                """(..., T-1, S-1, K) stage logits -> (..., T, S-1, K)
                mixture with an all-zero step-0 row (the seed step's -1
                sentinel = no stage contribution)."""
                p = jax.nn.softmax(stage_logits / soft, axis=-1)
                z = jnp.zeros(p.shape[:-3] + (1,) + p.shape[-2:],
                              p.dtype)
                return jnp.concatenate([z, p], axis=-3)

            @jax.jit
            def predict_tokens_stages(word_ids, lengths, seed0, key):
                """Like predict_tokens_all, but also returns the
                residual-stage ids (W*n_steps, S-1); seed steps carry a
                -1 sentinel (no head predicts them) and decode masks
                their stage contribution to zero. When soft_decode > 0
                two more outputs carry the stage-0 and residual-stage
                mixture distributions."""
                if not window_carry:
                    W = word_ids.shape[0]
                    targets = jnp.zeros((W, n_steps), jnp.int32)
                    if beam:
                        eo, dh = t2t.apply(self.t2t_variables, word_ids,
                                           lengths,
                                           method=t2t.encode_text)
                        mask = _batched_mask(word_ids, lengths)
                        res = _decode_win(eo, dh, targets, mask, key)
                    else:
                        res = t2t.apply(self.t2t_variables, word_ids,
                                        lengths, targets, train=False,
                                        **_tw(key))
                    t0 = res["tokens"]
                    sr = res["stage_tokens"]
                    pad = jnp.full((W, 1, S1), -1, sr.dtype)
                    stage = jnp.concatenate([pad, sr], axis=1)
                    if soft:
                        return (t0.reshape(-1), stage.reshape(-1, S1),
                                _mix_probs(res["logits"], t0)
                                .reshape(-1, t2t.n_tokens),
                                _stage_mix(res["stage_logits"])
                                .reshape(-1, S1, t2t.n_tokens))
                    return t0.reshape(-1), stage.reshape(-1, S1)

                enc_outs, dec_hidden = t2t.apply(
                    self.t2t_variables, word_ids, lengths,
                    method=t2t.encode_text)

                def body(seed_tokens, w):
                    eo = jax.lax.dynamic_slice_in_dim(enc_outs, w, 1,
                                                      axis=1)
                    dh = jax.lax.dynamic_slice_in_dim(dec_hidden, w, 1,
                                                      axis=1)
                    mask = jnp.arange(word_ids.shape[1]) < lengths[w]
                    res = _decode_win(eo, dh, seed_tokens[None], mask,
                                      jax.random.fold_in(key, w))
                    toks = res["tokens"][0]
                    sr = res["stage_tokens"][0]
                    stage = jnp.concatenate(
                        [jnp.full((1, S1), -1, sr.dtype), sr], axis=0)
                    next_seed = jnp.zeros((n_steps,), jnp.int32) \
                        .at[:n_pre].set(toks[-n_pre:])
                    if soft:
                        return next_seed, (
                            toks, stage,
                            _mix_probs(res["logits"][0], toks),
                            _stage_mix(res["stage_logits"][0]))
                    return next_seed, (toks, stage)

                if soft:
                    _, (all_toks, all_stage, all_p, all_sp) = \
                        jax.lax.scan(body, seed0,
                                     jnp.arange(word_ids.shape[0]))
                    return (all_toks.reshape(-1),
                            all_stage.reshape(-1, S1),
                            all_p.reshape(-1, t2t.n_tokens),
                            all_sp.reshape(-1, S1, t2t.n_tokens))
                _, (all_toks, all_stage) = jax.lax.scan(
                    body, seed0, jnp.arange(word_ids.shape[0]))
                return (all_toks.reshape(-1),
                        all_stage.reshape(-1, S1))

        chunk_continuity = self.chunk_continuity

        def _token_hidden(tokens, stage_tokens, probs=None,
                          stage_probs=None):
            """(N,) [+ (N, S-1) stage ids, -1 = no contribution] ->
            (L, N, H) decoder hidden from the codebook row sum. With
            soft decode, probs (N, K) [+ stage_probs (N, S-1, K)]
            replace the hard row lookups with mixture matmuls
            (probs @ codebook) — the expected codebook vector under the
            Part-d predictive distribution."""
            cb = jnp.asarray(
                self.seq_variables["params"]["vq_layer"]["codebook"])
            L, H = seq.n_layers, seq.hidden_size
            N = tokens.shape[0]
            if probs is not None:
                flat = probs @ cb
            else:
                flat = jnp.take(cb, tokens, axis=0)
            if stage_tokens is not None:
                for s in range(stage_tokens.shape[-1]):
                    cbs = jnp.asarray(self.seq_variables["params"]
                                      ["vq_layer"][f"codebook_r{s + 1}"])
                    if stage_probs is not None:
                        # step-0 rows are all-zero => zero contribution,
                        # the same sentinel semantics as the hard mask
                        flat = flat + stage_probs[:, s] @ cbs
                        continue
                    st = stage_tokens[:, s]
                    flat = flat + jnp.where(
                        (st >= 0)[:, None],
                        jnp.take(cbs, jnp.maximum(st, 0), axis=0), 0.0)
            return jnp.transpose(flat.reshape(N, L, H), (1, 0, 2))

        def decode_tokens_core(tokens, use_fused, stage_tokens=None,
                               probs=None, stage_probs=None):
            """tokens (N,) -> latents (N*n_frames, rep_dim).

            Every frame is a decoder OUTPUT (seq.rollout) - the
            reference's generative rollout never emits its seed frame
            (inference_text2embedding.py:489-519), so no chunk starts on
            a constant token-independent pose. Default: all chunks roll
            out as ONE batch from zero seeds (n_frames sequential GRU
            steps total instead of n_frames*N). chunk_continuity
            reproduces the reference's carried decoder_input exactly
            (initialized to zeros once, ref :277, then carried across
            every chunk): a scan over chunks, seeded by the previous
            chunk's last output."""
            if not chunk_continuity:
                N = tokens.shape[0]
                hidden = _token_hidden(tokens, stage_tokens, probs,
                                       stage_probs)
                seed0 = jnp.zeros((N, seq.rep_dim))
                if use_fused:
                    from gesture2vec_tpu.ops.decoder_pallas import \
                        fused_chunk_decode
                    ys = fused_chunk_decode(
                        seed0, hidden,
                        self.seq_variables["params"]["decoder_step"],
                        self.seq_variables["batch_stats"]["decoder_step"],
                        n_steps=seq.n_frames)
                    return jnp.transpose(ys, (1, 0, 2)).reshape(
                        -1, seq.rep_dim)
                b = int(self.decode_overlap)
                out = seq.apply(self.seq_variables, hidden, seed0,
                                method=seq.rollout,
                                rngs={"dropout": jax.random.PRNGKey(0)},
                                n_steps=(seq.n_frames + b) if b else None)
                if b:
                    # crossfade each chunk's extra tail into the next
                    # chunk's head (linear weights, in-graph); frames
                    # outside the blend regions are bit-identical to
                    # the unblended decode (same scan prefix)
                    F = seq.n_frames
                    main = out[:, :F]
                    tail = out[:-1, F:F + b]
                    head = out[1:, :b]
                    w = ((jnp.arange(b) + 1.0)
                         / (b + 1.0))[None, :, None]
                    main = main.at[1:, :b].set((1 - w) * tail + w * head)
                    return main.reshape(-1, seq.rep_dim)
                return out.reshape(-1, seq.rep_dim)

            def body(prev_last, xs):
                hidden = _token_hidden(
                    xs["tok"][None],
                    xs["st"][None] if "st" in xs else None,
                    xs["p"][None] if "p" in xs else None,
                    xs["sp"][None] if "sp" in xs else None)
                out = seq.apply(self.seq_variables, hidden,
                                prev_last[None], method=seq.rollout,
                                rngs={"dropout": jax.random.PRNGKey(0)})[0]
                return out[-1], out

            # dict xs: lax.scan maps over pytree leaves, so optional
            # stage/mixture inputs just appear as extra keys
            xs = {"tok": tokens}
            if stage_tokens is not None:
                xs["st"] = stage_tokens
            if probs is not None:
                xs["p"] = probs
            if stage_probs is not None:
                xs["sp"] = stage_probs
            _, chunks = jax.lax.scan(
                body, jnp.zeros((seq.rep_dim,), jnp.float32), xs)
            return chunks.reshape(-1, seq.rep_dim)

        decode_tokens_all = jax.jit(
            lambda tokens: decode_tokens_core(tokens,
                                              self.use_fused_decoder))

        @jax.jit
        def dae_decode(latents):
            return dae.apply(self.dae_variables, latents,
                             method=dae.decode)

        if self.mode == "exemplar":
            self._exemplar_decode = self._exemplars.make_decode_fn(
                dae, self.dae_variables)

        @jax.jit
        def generate_decode_mode(word_ids, lengths, seed0, key):
            """The whole decode-mode generation as ONE device program:
            window token scan -> batched chunk decode -> DAE decode."""
            if multi:
                if soft:
                    tokens, stage, p, sp = predict_tokens_stages(
                        word_ids, lengths, seed0, key)
                    latents = decode_tokens_core(
                        tokens, self.use_fused_decoder, stage, p, sp)
                    return dae_decode(latents), tokens
                tokens, stage = predict_tokens_stages(word_ids, lengths,
                                                      seed0, key)
                latents = decode_tokens_core(tokens,
                                             self.use_fused_decoder,
                                             stage)
                return dae_decode(latents), tokens
            if soft:
                tokens, p = predict_tokens_all(word_ids, lengths, seed0,
                                               key)
                latents = decode_tokens_core(
                    tokens, self.use_fused_decoder, probs=p)
                return dae_decode(latents), tokens
            tokens = predict_tokens_all(word_ids, lengths, seed0, key)
            latents = decode_tokens_all(tokens)
            return dae_decode(latents), tokens

        @jax.jit
        def generate_decode_batch(word_ids, lengths, seed0, key):
            """Batch-of-transcripts decode mode: vmap the whole program
            over a leading transcript axis. word_ids (B, W, S), lengths
            (B, W) -> (frames (B, W*n_steps*n_frames, D),
            tokens (B, W*n_steps)). Transcripts are independent, so when
            the inputs are sharded over a "dp" mesh axis XLA partitions
            the batch across devices with no collectives.

            Uses the scan chunk decoder (the Pallas fused kernel has no
            batching rule under vmap)."""
            keys = jax.random.split(key, word_ids.shape[0])
            if multi:
                if soft:
                    toks, stage, p, sp = jax.vmap(
                        lambda w, l, k: predict_tokens_stages(
                            w, l, seed0, k))(word_ids, lengths, keys)
                    lats = jax.vmap(
                        lambda t, s, p_, sp_: decode_tokens_core(
                            t, False, s, p_, sp_))(toks, stage, p, sp)
                    return dae_decode(lats), toks
                toks, stage = jax.vmap(
                    lambda w, l, k: predict_tokens_stages(w, l, seed0,
                                                          k))(
                        word_ids, lengths, keys)
                lats = jax.vmap(
                    lambda t, s: decode_tokens_core(t, False, s))(toks,
                                                                  stage)
                return dae_decode(lats), toks
            if soft:
                toks, p = jax.vmap(
                    lambda w, l, k: predict_tokens_all(w, l, seed0, k))(
                        word_ids, lengths, keys)
                lats = jax.vmap(
                    lambda t, p_: decode_tokens_core(t, False,
                                                     probs=p_))(toks, p)
                return dae_decode(lats), toks
            toks = jax.vmap(
                lambda w, l, k: predict_tokens_all(w, l, seed0, k))(
                    word_ids, lengths, keys)
            lats = jax.vmap(lambda t: decode_tokens_core(t, False))(toks)
            return dae_decode(lats), toks

        @jax.jit
        def predict_tokens_batch(word_ids, lengths, seed0, key):
            keys = jax.random.split(key, word_ids.shape[0])
            return jax.vmap(
                lambda w, l, k: predict_tokens_all(w, l, seed0, k))(
                    word_ids, lengths, keys)

        self._predict_tokens_all = predict_tokens_all
        self._decode_tokens_all = decode_tokens_all
        self._generate_decode_mode = generate_decode_mode
        self._generate_decode_batch = generate_decode_batch
        self._predict_tokens_batch = predict_tokens_batch

    # ------------------------------------------------------------------
    def _window_word_ids(self, words: List[List], t0: float, t1: float
                         ) -> Tuple[np.ndarray, int]:
        # overlap rule like the reference window word lookup
        # (ref: inference_text2embedding.py:293 via
        # data_preprocessor.get_words_in_time_range :335-363), extended
        # backwards by text_context_s (must match training)
        t0 = t0 - float(self.text_context_s)
        inside = [w[0] for w in words if w[2] > t0 and w[1] < t1]
        ids = self.vocab.words_to_ids(inside)[: self.max_words]
        arr = np.zeros((self.max_words,), np.int32)
        arr[: len(ids)] = ids
        return arr, max(len(ids), 1)

    def _codebook(self) -> np.ndarray:
        return np.asarray(self.seq_variables["params"]["vq_layer"]
                          ["codebook"])

    def _next_key(self) -> jax.Array:
        """Fresh sample-stream key per generate call (reproducible from
        `seed`); a constant when the decode is greedy so repeated greedy
        calls stay cache- and bit-identical."""
        if self.temperature <= 0.0 and self.stage0_temperature <= 0.0:
            return jax.random.PRNGKey(0)
        return jax.random.PRNGKey(int(self._rng.integers(2 ** 31 - 1)))

    def generate(self, words: List[List], duration_s: float
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """words: [[word, start_s, end_s], ...]. Returns
        (motion (T, pose_dim) unnormalized, tokens (n_windows*n_steps,)).
        """
        unit = self.sentence_frame_length / self.fps   # ref :255-265
        n_windows = max(int(np.ceil(duration_s / unit)), 1)

        # bucket the window count (multiples of 16, powers of two below
        # that) so arbitrary durations reuse few compiled programs while
        # wasting at most ~5% padding at scale; padded windows generate
        # throwaway frames that are trimmed below
        if n_windows <= 16:
            n_padded = 1 << (n_windows - 1).bit_length()
        else:
            n_padded = (n_windows + 15) // 16 * 16
        word_ids = np.zeros((n_padded, self.max_words), np.int32)
        lengths = np.ones((n_padded,), np.int32)
        for w in range(n_windows):
            word_ids[w], lengths[w] = self._window_word_ids(
                words, w * unit, (w + 1) * unit)

        seed0 = jnp.zeros((self.n_steps,), jnp.int32)
        key = self._next_key()
        n_tokens_real = n_windows * self.n_steps
        n_frames_real = n_tokens_real * self.n_frames
        if self.mode == "decode":
            frames_j, tokens_j = self._generate_decode_mode(
                jnp.asarray(word_ids), jnp.asarray(lengths), seed0, key)
            frames = np.asarray(frames_j)[:n_frames_real]
            frames = unnormalize(frames, self.pose_mean, self.pose_std)
            return frames, np.asarray(tokens_j)[:n_tokens_real]

        tokens = np.asarray(self._predict_tokens_all(
            jnp.asarray(word_ids), jnp.asarray(lengths),
            seed0, key))[:n_tokens_real]
        picks = (self._exemplars.pick_indices_continuity(tokens)
                 if self.exemplar_continuity
                 else self._exemplars.pick_indices(tokens))
        frames = np.asarray(self._exemplar_decode(jnp.asarray(picks)))
        frames = unnormalize(frames, self.pose_mean, self.pose_std)
        return frames, tokens

    # ------------------------------------------------------------------
    def generate_batch(self, transcripts: List[List[List]],
                       durations_s, mesh=None
                       ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Generate gestures for MANY transcripts in one device program.

        transcripts: list of word lists ([[word, start_s, end_s], ...]);
        durations_s: one float or a per-transcript list. Returns a list
        of (motion (T_i, pose_dim), tokens) like generate().

        TPU-native serving path: all transcripts pad to a common window
        bucket and the whole batch runs as ONE vmapped program. Pass a
        jax.sharding.Mesh with a "dp" axis to shard the transcript axis
        across devices - the transcripts are independent, so the program
        partitions with zero collectives (the batch is padded to a
        multiple of the dp size). The reference generates one transcript
        per process (ref: inference_text2embedding.py:108-569)."""
        from jax.sharding import NamedSharding, PartitionSpec

        B = len(transcripts)
        if not isinstance(durations_s, (list, tuple, np.ndarray)):
            durations_s = [durations_s] * B
        assert len(durations_s) == B
        unit = self.sentence_frame_length / self.fps
        wins = [max(int(np.ceil(d / unit)), 1) for d in durations_s]
        w_max = max(wins)
        if w_max <= 16:
            n_padded = 1 << (w_max - 1).bit_length()
        else:
            n_padded = (w_max + 15) // 16 * 16

        b_padded = B
        if mesh is not None:
            dp = mesh.shape["dp"]
            b_padded = (B + dp - 1) // dp * dp

        word_ids = np.zeros((b_padded, n_padded, self.max_words), np.int32)
        lengths = np.ones((b_padded, n_padded), np.int32)
        for b, words in enumerate(transcripts):
            for w in range(wins[b]):
                word_ids[b, w], lengths[b, w] = self._window_word_ids(
                    words, w * unit, (w + 1) * unit)

        seed0 = jnp.zeros((self.n_steps,), jnp.int32)
        key = self._next_key()
        ids_j, len_j = jnp.asarray(word_ids), jnp.asarray(lengths)
        if mesh is not None:
            sh = NamedSharding(mesh, PartitionSpec("dp"))
            ids_j, len_j = (jax.device_put(ids_j, sh),
                            jax.device_put(len_j, sh))

        if self.mode == "decode":
            frames_j, tokens_j = self._generate_decode_batch(ids_j, len_j,
                                                             seed0, key)
            frames_all, tokens_all = (np.asarray(frames_j),
                                      np.asarray(tokens_j))
            out = []
            for b in range(B):
                n_tok = wins[b] * self.n_steps
                fr = unnormalize(frames_all[b, : n_tok * self.n_frames],
                                 self.pose_mean, self.pose_std)
                out.append((fr, tokens_all[b, :n_tok]))
            return out

        tokens_all = np.asarray(self._predict_tokens_batch(ids_j, len_j,
                                                           seed0, key))
        per, bounds = [], [0]
        for b in range(B):
            toks = tokens_all[b, : wins[b] * self.n_steps]
            per.append(toks)
            bounds.append(bounds[-1] + len(toks) * self.n_frames)
        # one vectorized pick over the concatenated batch: per-token
        # rng.choice costs ~0.3 ms/call (benchmarks/README.md round 3),
        # which at serving batch sizes would dominate the fused request.
        # Continuity retrieval chains per transcript (each transcript
        # starts its own chain, matching the single path).
        if self.exemplar_continuity:
            picks = np.concatenate(
                [self._exemplars.pick_indices_continuity(t)
                 for t in per])
        else:
            picks = self._exemplars.pick_indices(np.concatenate(per))
        frames = np.asarray(self._exemplar_decode(jnp.asarray(picks)))
        frames = unnormalize(frames, self.pose_mean, self.pose_std)
        return [(frames[bounds[b]: bounds[b + 1]], per[b])
                for b in range(B)]
