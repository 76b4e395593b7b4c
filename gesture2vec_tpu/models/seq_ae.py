"""Part b - gesture representation learning (sequence VQ autoencoder).

Rebuild of the reference Autoencoder_VQVAE
(ref: scripts/model/Autoencoder_VQVAE_model.py:686-1085) and its non-VQ
twin Autoencoder_seq2seq (ref: scripts/model/Autoencoder_model.py:261).

Architecture: Linear-in + bidirectional GRU encoder with summed
directions (ref :93-97); the decoder's initial hidden state is the
encoder hidden sliced to the first n_layers entries - which for a
bidirectional torch GRU is [layer0_fwd, layer0_bwd] (ref :971-973, a
reference quirk kept for parity); that hidden is vector-quantized
(GS-Soft by default - the reference constructs an EMA quantizer and then
unconditionally overwrites it, ref :816-820); the decoder is an
autoregressive GRU rolled out with lax.scan.

Reference quirks, each behind an explicit switch:
  - step_dropout 0.95 applied to the decoder input at EVERY step in both
    train and eval (the reference instantiates nn.Dropout(0.95) inline,
    which never sees .eval(), ref :570). `eval_step_dropout` controls
    eval behavior; default False (sane), parity mode True.
  - vq_flatten "per_sample" (transpose to (B, L*H), the intended
    semantics and what the reference's own VAE branch does, ref
    :995-1000) vs "torch_view" ((L,B,H).view(-1, L*H), which interleaves
    pairs of batch elements, ref :977 + VQ layer's .view(-1, dim)).
  - autoencoder_conditioned=False zeroes the decoder input (ref
    :568-569, :1042-1043,1053-1054).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gesture2vec_tpu.models.gru import BiGRU, GRUCellStack, make_decoder_scan
from gesture2vec_tpu.models.vq import VQGSSoft, VQOutput, VQResidual


class Attn(nn.Module):
    """Bahdanau additive attention
    (ref: Autoencoder_VQVAE_model.py:337-398, text2embedding_model.py:138-198).
    """

    hidden_size: int

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, encoder_outputs: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """hidden (B, H), encoder_outputs (T, B, H) -> weights (B, T).

        mask (T,) bool: True for VALID positions (arange(T) <
        max(lengths)); False positions are -inf'd out of the softmax.
        torch's pad_packed_sequence trims encoder outputs to
        max(lengths) (ref: text2embedding_model.py:129-131), so with
        static padded shapes the positions past that must be masked to
        reproduce the reference's attention distribution exactly.
        """
        T = encoder_outputs.shape[0]
        h = jnp.repeat(hidden[None, :, :], T, axis=0)        # (T, B, H)
        cat = jnp.concatenate([h, encoder_outputs], axis=-1)  # (T, B, 2H)
        energy = jnp.tanh(nn.Dense(self.hidden_size, name="attn")(cat))
        v = self.param("v", nn.initializers.normal(
            1.0 / jnp.sqrt(self.hidden_size)), (self.hidden_size,))
        scores = jnp.einsum("tbh,h->bt", energy, v)
        if mask is not None:
            scores = jnp.where(mask[None, :], scores, -jnp.inf)
        return jax.nn.softmax(scores, axis=-1)


class DecoderStep(nn.Module):
    """One decoder timestep: [attention ->] pre_linear(BN+ReLU) -> GRU
    stack -> out layer (ref: Autoencoder_VQVAE_model.py:499-592)."""

    hidden_size: int
    output_size: int
    n_layers: int
    dropout_p: float
    use_attention: bool = False
    conditioned: bool = True
    step_dropout: float = 0.95
    dtype: Optional[Any] = None   # bf16 opt-in (config.compute_dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, hidden: jnp.ndarray,
                 encoder_outputs: Optional[jnp.ndarray],
                 train: bool = False, apply_step_dropout: bool = True,
                 enc_mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        attn_weights = None
        if self.use_attention:
            attn_weights = Attn(self.hidden_size, name="attn")(
                hidden[-1], encoder_outputs, mask=enc_mask)   # (B, T)
            context = jnp.einsum("bt,tbh->bh", attn_weights,
                                 encoder_outputs)
            rnn_in = jnp.concatenate([x, context], axis=-1)
        else:
            rnn_in = x

        if not self.conditioned:
            rnn_in = jnp.zeros_like(rnn_in)
        if apply_step_dropout and self.step_dropout > 0:
            # the reference applies this dropout unconditionally at every
            # step (ref :570); deterministic=False only when the caller
            # says so (train, or eval under the parity quirk)
            rnn_in = nn.Dropout(self.step_dropout, name="step_do")(
                rnn_in, deterministic=False)

        h = nn.Dense(self.hidden_size, name="pre_linear",
                     dtype=self.dtype)(rnn_in)
        h = nn.BatchNorm(use_running_average=not train, name="pre_bn",
                         dtype=self.dtype)(h)
        h = nn.relu(h)
        out, new_hidden = GRUCellStack(hidden_size=self.hidden_size,
                                       n_layers=self.n_layers,
                                       dropout=self.dropout_p,
                                       dtype=self.dtype,
                                       name="gru")(h, hidden, train=train)
        out = nn.Dense(self.output_size, name="out_layer",
                       dtype=self.dtype)(out)
        # losses/argmax-feedback read fp32 regardless of compute dtype
        return out.astype(jnp.float32), new_hidden, attn_weights


class SeqEncoder(nn.Module):
    """Linear-in + biGRU, directions summed
    (ref: Autoencoder_VQVAE_model.py:30-100 EncoderRNN)."""

    hidden_size: int
    n_layers: int
    dropout: float
    dtype: Optional[Any] = None   # bf16 opt-in (config.compute_dtype)

    @nn.compact
    def __call__(self, xs: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xs (T, B, D) -> (outputs (T, B, H), hidden (2L, B, H))."""
        # fp32 mode runs HIGHEST: this projection feeds the recurrence
        # whose final hidden is the VQ argmin input (token identity);
        # the opt-in bf16 mode keeps the relaxed default on purpose
        h = nn.Dense(self.hidden_size, name="in_layer", dtype=self.dtype,
                     precision=None if self.dtype else "highest")(xs)
        outs, hidden = BiGRU(hidden_size=self.hidden_size,
                             n_layers=self.n_layers, dropout=self.dropout,
                             dtype=self.dtype,
                             name="gru")(h, train=train)
        outs = outs[..., :self.hidden_size] + outs[..., self.hidden_size:]
        return outs, hidden


def _flatten_hidden(hidden: jnp.ndarray, mode: str) -> jnp.ndarray:
    """(L, B, H) -> (N, L*H) rows for the VQ layer."""
    L, B, H = hidden.shape
    if mode == "per_sample":
        return jnp.transpose(hidden, (1, 0, 2)).reshape(B, L * H)
    if mode == "torch_view":
        return hidden.reshape(-1, L * H)
    raise ValueError(f"unknown vq_flatten mode {mode!r}")


def _unflatten_hidden(flat: jnp.ndarray, shape: Tuple[int, int, int],
                      mode: str) -> jnp.ndarray:
    L, B, H = shape
    if mode == "per_sample":
        return jnp.transpose(flat.reshape(B, L, H), (1, 0, 2))
    return flat.reshape(L, B, H)


class SeqVQAutoencoder(nn.Module):
    """The gesture tokenizer (ref: Autoencoder_VQVAE_model.py:686-1085)."""

    rep_dim: int            # DAE latent dim (args.rep_learning_dim)
    hidden_size: int
    n_layers: int
    n_frames: int
    n_pre_poses: int = 1
    dropout: float = 0.2
    use_vq: bool = True
    vq_components: int = 512
    commitment_cost: float = 0.25
    vq_variant: str = "gssoft"   # "gssoft" (reference parity) | "rvq"
    rvq_stages: int = 2          # residual stages when vq_variant="rvq"
    use_vae: bool = False
    use_attention: bool = False
    conditioned: bool = True
    vq_flatten: str = "per_sample"
    eval_step_dropout: bool = False   # parity quirk (ref :570)
    encoder_arch: str = "bigru"  # "bigru" (reference parity) |
    # "transformer": the TPU-first parallel chunk encoder
    # (models/seq_encoder.TransformerSeqEncoder; YAML `seq_arch`).
    # Decoder/VQ untouched — token semantics identical downstream.
    # "float32" (default, fp32/HIGHEST matmuls - token-identity exact) or
    # "bfloat16": single-pass MXU matmuls in encoder/decoder for
    # throughput-first training; the VQ distance/argmax path and the
    # returned outputs stay fp32 either way
    compute_dtype: str = "float32"

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        if self.encoder_arch == "transformer":
            from gesture2vec_tpu.models.seq_encoder import (
                TransformerSeqEncoder)
            self.encoder = TransformerSeqEncoder(
                hidden_size=self.hidden_size, n_layers=self.n_layers,
                dropout=self.dropout, dtype=self._dtype)
        else:
            self.encoder = SeqEncoder(hidden_size=self.hidden_size,
                                      n_layers=self.n_layers,
                                      dropout=self.dropout,
                                      dtype=self._dtype)
        self.in_do = nn.Dropout(self.dropout)
        self.decoder_step = DecoderStep(hidden_size=self.hidden_size,
                                        output_size=self.rep_dim,
                                        n_layers=self.n_layers,
                                        dropout_p=self.dropout,
                                        use_attention=self.use_attention,
                                        conditioned=self.conditioned,
                                        dtype=self._dtype)
        if self.use_vq:
            d = self.hidden_size * self.n_layers
            if self.vq_variant == "rvq":
                self.vq_layer = VQResidual(
                    num_codes=self.vq_components, dim=d,
                    stages=self.rvq_stages,
                    commitment_cost=self.commitment_cost)
            else:
                self.vq_layer = VQGSSoft(
                    num_codes=self.vq_components, dim=d,
                    commitment_cost=self.commitment_cost)
        if self.use_vae:
            d = self.hidden_size * self.n_layers
            self.vae_mean = nn.Dense(d)
            self.vae_std = nn.Dense(d)
            self.vae_dec = nn.Dense(d)

    def encode(self, in_poses: jnp.ndarray, train: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """in_poses (B, T, D) -> (encoder_outputs (T,B,H),
        decoder-initial hidden (L, B, H))."""
        xs = jnp.transpose(in_poses, (1, 0, 2))
        if train:  # encoder input dropout (ref :957)
            xs = self.in_do(xs, deterministic=False)
        enc_outs, enc_hidden = self.encoder(xs, train=train)
        return enc_outs, enc_hidden[: self.n_layers]

    def quantize(self, dec_hidden: jnp.ndarray) -> Tuple[VQOutput,
                                                         jnp.ndarray]:
        # token identity is fp32 regardless of the compute dtype
        flat = _flatten_hidden(dec_hidden.astype(jnp.float32),
                               self.vq_flatten)
        vq_out = self.vq_layer(flat)
        new_hidden = _unflatten_hidden(vq_out.quantized, dec_hidden.shape,
                                       self.vq_flatten)
        return vq_out, new_hidden

    def tokens_from_hidden(self, dec_hidden: jnp.ndarray) -> jnp.ndarray:
        """(L, B, H) -> (B,) discrete gesture-token ids."""
        vq_out, _ = self.quantize(dec_hidden)
        return jnp.argmax(vq_out.encodings, axis=-1)

    def stage_tokens(self, dec_hidden: jnp.ndarray) -> jnp.ndarray:
        """(L, B, H) -> (B, S) per-stage code ids (residual VQ only;
        column 0 is THE pipeline token). Feeds the multi-stage Part d
        (models/text2token token_stages > 1)."""
        assert self.use_vq and self.vq_variant == "rvq", \
            "stage tokens require vq_variant='rvq'"
        flat = _flatten_hidden(dec_hidden.astype(jnp.float32),
                               self.vq_flatten)
        return self.vq_layer.stage_tokens(flat)

    def hidden_from_stage_tokens(self, tokens: jnp.ndarray
                                 ) -> jnp.ndarray:
        """(B, S') stage ids -> (L, B, H) decoder-initial hidden = the
        sum of the first S' stage codebook rows (decode-mode inference
        from multi-stage tokens; S'=1 reproduces the single-token
        path)."""
        assert self.use_vq and self.vq_variant == "rvq", \
            "stage-token decode requires vq_variant='rvq'"
        flat = self.vq_layer.embed_stage_tokens(tokens)
        return _unflatten_hidden(
            flat, (self.n_layers, tokens.shape[0], self.hidden_size),
            self.vq_flatten)

    def warmup_hidden(self, dec_hidden: jnp.ndarray, seed: jnp.ndarray,
                      encoder_outputs: Optional[jnp.ndarray],
                      steps: int = 5, train: bool = False) -> jnp.ndarray:
        """Spin the decoder hidden state by feeding the seed frame
        `steps` times before the rollout, discarding the outputs
        (ref: inference_Autoencoder.py:206-209). seed is (B, D) - the
        first target frame, same as the rollout's decoder_input seed.
        """
        x = seed if self.conditioned else jnp.zeros_like(seed)
        apply_sd = train or self.eval_step_dropout
        hidden = dec_hidden
        for _ in range(steps):   # static count; XLA unrolls
            _, hidden, _ = self.decoder_step(x, hidden, encoder_outputs,
                                             train=train,
                                             apply_step_dropout=apply_sd)
        return hidden

    def rollout(self, dec_hidden: jnp.ndarray, seed_frame: jnp.ndarray,
                train: bool = False,
                n_steps: Optional[int] = None) -> jnp.ndarray:
        """Pure generative rollout for token->motion synthesis
        (ref: inference_text2embedding.py:488-519): every emitted frame
        is a DECODER OUTPUT - the seed frame is consumed as the first
        input, never emitted (unlike decode(), whose outputs[0] is the
        seed per the training contract, ref :1040) - and there is no
        teacher forcing (the reference disables it with
        `t < n_pre_poses and False`, :512). The inference script's own
        unconditioned-zeroing lines are commented out (:489-491,
        :517-518) but the decoder MODULE zeroes internally either way
        (Autoencoder_VQVAE_model.py:568-569), which DecoderStep
        reproduces. dec_hidden (L, B, H) from the token codebook,
        seed_frame (B, D) -> (B, n_frames, D).

        n_steps (static) overrides the rollout length: the GRU can
        roll past its trained chunk length, which overlap-blended
        decode uses for crossfade frames (the first n_frames of a
        longer rollout are bit-identical to the default rollout)."""
        apply_sd = train or self.eval_step_dropout
        if self._dtype is not None:
            dec_hidden = dec_hidden.astype(self._dtype)

        def body(mdl, carry, t):
            prev, hidden = carry
            out, new_hidden, _ = mdl(prev, hidden, None, train=train,
                                     apply_step_dropout=apply_sd)
            return (out, new_hidden), out

        scan = make_decoder_scan(body, train)
        (_, _), outs = scan(self.decoder_step, (seed_frame, dec_hidden),
                            jnp.arange(n_steps or self.n_frames))
        return jnp.transpose(outs, (1, 0, 2))

    def decode(self, dec_hidden: jnp.ndarray, out_poses: jnp.ndarray,
               encoder_outputs: Optional[jnp.ndarray],
               train: bool = False) -> jnp.ndarray:
        """Autoregressive rollout (ref :1038-1054). out_poses (B, T, D)
        provides the seed frame and teacher-forced steps."""
        tgt = jnp.transpose(out_poses, (1, 0, 2))   # (T, B, D)
        apply_sd = train or self.eval_step_dropout
        if self._dtype is not None:
            # scan carries need a stable dtype: start the hidden in the
            # compute dtype (GRU steps keep it there)
            dec_hidden = dec_hidden.astype(self._dtype)

        step_mod = self.decoder_step

        def body(mdl, carry, t):
            prev_out, hidden = carry
            # teacher forcing for t-1 < n_pre_poses (ref :1049-1052)
            x = jnp.where(t - 1 < self.n_pre_poses, tgt[t - 1], prev_out)
            if not self.conditioned:
                x = jnp.zeros_like(x)
            out, new_hidden, _ = mdl(x, hidden, encoder_outputs,
                                     train=train,
                                     apply_step_dropout=apply_sd)
            return (out, new_hidden), out

        scan = make_decoder_scan(body, train)
        ts = jnp.arange(1, self.n_frames)
        (_, _), outs = scan(step_mod, (tgt[0], dec_hidden), ts)
        full = jnp.concatenate([tgt[:1], outs], axis=0)   # outputs[0]=seed
        return jnp.transpose(full, (1, 0, 2))

    def __call__(self, in_poses: jnp.ndarray, out_poses: jnp.ndarray,
                 train: bool = False) -> Dict[str, Any]:
        enc_outs, dec_hidden = self.encode(in_poses, train=train)

        vq_out = None
        if self.use_vq:
            vq_out, dec_hidden = self.quantize(dec_hidden)

        mean = logvar = None
        if self.use_vae:
            L, B, H = dec_hidden.shape
            flat = jnp.transpose(dec_hidden, (1, 0, 2)).reshape(B, L * H)
            mean = self.vae_mean(flat)
            logvar = self.vae_std(flat)
            if train:
                eps = jax.random.normal(self.make_rng("reparam"),
                                        mean.shape, mean.dtype)
                z = mean + jnp.exp(logvar / 2) * eps
            else:
                z = mean
            flat = self.vae_dec(z)
            dec_hidden = jnp.transpose(flat.reshape(B, L, H), (1, 0, 2))

        first_hidden = dec_hidden
        outputs = self.decode(dec_hidden, out_poses, enc_outs,
                              train=train)
        return {"outputs": outputs, "first_hidden": first_hidden,
                "vq": vq_out, "mean": mean, "logvar": logvar}
