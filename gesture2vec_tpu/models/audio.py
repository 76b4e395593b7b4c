"""Audio encoders for the audio-context Part-d variant.

Rebuild of the reference audio stack (ref: scripts/model/Helper_models.py):
  WavEncoderRaw       <- WavEncoder (:16-49), strided conv stack over raw
                         16 kHz waveforms
  WavEncoderSpectral  <- WavEncoder2 (:116-172), per-second mel-chunk
                         conv encoder (spec_conv1d :52-85 + fc :88-113)
  AudioContextEncoder <- EncoderRNN_With_Audio (:179-317) in its shipped
                         Audio_Features=True branch (:235-244, 281-317):
                         the GRU consumes ONLY the per-chunk audio
                         features (the text path is dead in that branch).

  WavEncoderTri       <- WavEncoder_tri (:325-368), the trimodal-paper
                         raw-wave chunk encoder (1 s @ 16 kHz -> 200-d)
  AudioTextFusionEncoder <- the both=True text+audio fusion branch
                         (:246-253, 281-311), repaired (see class doc)

Repaired reference defect: the reference rearranges the per-chunk
features with a RAW torch.reshape((B*S, F) -> (S, B, F)) (ref :300) -
for B>1 that interleaves batch and sequence elements across rows, so
batched audio encoding mixes different clips' chunks. Here the
rearrangement is a true (B, S, F) -> (S, B, F) transpose; parity vs the
literal module holds at B=1 (its only exercised shape) and the defect
itself is pinned by tests/test_torch_parity.py::
test_audio_encoder_batch_reshape_defect_literal.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gesture2vec_tpu.models.gru import BiGRU


class WavEncoderRaw(nn.Module):
    """Strided conv stack over raw waveforms (ref :16-49).
    Input (B, S) samples -> (B, T', 200)."""

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = wav[..., None]                       # (B, S, 1)
        specs = [(16, 15, 5, 1600), (32, 15, 6, 0), (64, 15, 6, 0),
                 (128, 20, 6, 0), (200, 15, 8, 0)]
        for i, (ch, k, s, pad) in enumerate(specs):
            x = nn.Conv(ch, kernel_size=(k,), strides=(s,),
                        padding=[(pad, pad)], name=f"conv{i}")(x)
            if i < 3:  # BN + LeakyReLU after the first three convs
                x = nn.BatchNorm(use_running_average=not train,
                                 name=f"bn{i}")(x)
                x = nn.leaky_relu(x, negative_slope=0.3)
        return x                                  # (B, T', 200)


class WavEncoderSpectral(nn.Module):
    """Mel-chunk encoder (ref :116-172): conv1d over frequency channels
    [32,16,8], filters [1,3,3], strides [1,2,2], each ReLU+BN, then a
    flatten + Linear(200) + BN + tanh head.
    Input (B, n_mels=128, frames=32) -> (B, 200)."""

    out_dim: int = 200

    @nn.compact
    def __call__(self, mel: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.transpose(mel, (0, 2, 1))        # (B, time, freq-ch)
        for i, (ch, k, s) in enumerate(((32, 1, 1), (16, 3, 2),
                                        (8, 3, 2))):
            x = nn.Conv(ch, kernel_size=(k,), strides=(s,),
                        padding="VALID", name=f"conv{i}")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn{i}")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.out_dim, name="fc")(x)
        x = nn.BatchNorm(use_running_average=not train, name="fc_bn")(x)
        return jnp.tanh(x)


class WavEncoderTri(nn.Module):
    """Trimodal-paper raw-wave chunk encoder (ref: Helper_models.py
    :325-368 WavEncoder_tri): conv stack 16/32/64/32 (kernel 15,
    strides 5/6/6/6, first conv padded 1600) with BN + LeakyReLU(0.3)
    between, flatten, Linear(200). The torch out_layer is sized
    32*15=480, which pins the chunk length to exactly 1 second at
    16 kHz (16000 samples -> 15 conv frames).
    Input (B, samples) -> (B, out_dim)."""

    out_dim: int = 200

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = wav[..., None]                       # (B, samples, 1)
        specs = [(16, 15, 5, 1600), (32, 15, 6, 0), (64, 15, 6, 0),
                 (32, 15, 6, 0)]
        for i, (ch, k, s, pad) in enumerate(specs):
            x = nn.Conv(ch, kernel_size=(k,), strides=(s,),
                        padding=[(pad, pad)], name=f"conv{i}")(x)
            if i < 3:
                x = nn.BatchNorm(use_running_average=not train,
                                 name=f"bn{i}")(x)
                x = nn.leaky_relu(x, negative_slope=0.3)
        # torch flattens channel-major; the weight converter re-permutes
        # the out_layer input axis to our time-major layout
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.out_dim, name="out_layer")(x)


class AudioTextFusionEncoder(nn.Module):
    """Text+audio fusion encoder: the reference's both=True branch
    (ref: Helper_models.py:246-253, 281-311), REPAIRED.

    As committed the branch cannot execute: (1) WavEncoder_tri receives
    the 3-D (B, S, samples) tensor un-flattened (audio_raw_for_now is
    hardcoded False so the (B*S, samples) reshape at :289-292 is
    skipped), handing Conv1d a 4-D input; (2) even past that,
    torch.cat((packed, audio_feat), dim=2) at :305-308 concatenates a
    PackedSequence OBJECT with a tensor. Both crashes are pinned by
    tests/test_torch_parity.py::test_audio_both_branch_crashes_literal.

    The intended computation - word embeddings concatenated with
    per-chunk audio features into a biGRU built for input
    embed_size + hidden_size (ref :248-253) - is implemented here:
    1-second raw chunks -> WavEncoderTri features (B, S, H), aligned to
    the T text steps by nearest-chunk indexing t -> floor(t*S/T),
    concatenated with the embedded words, biGRU with summed directions
    (same output contract as AudioContextEncoder)."""

    n_words: int
    hidden_size: int
    embed_size: int = 300
    n_layers: int = 2
    dropout: float = 0.5
    dtype: Optional[Any] = None   # bf16 opt-in; outputs return fp32

    @nn.compact
    def __call__(self, word_ids: jnp.ndarray, wav_chunks: jnp.ndarray,
                 train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """word_ids (B, T); wav_chunks (B, S, samples)."""
        B, S = wav_chunks.shape[:2]
        emb = nn.Embed(self.n_words, self.embed_size,
                       name="embedding")(word_ids)          # (B, T, E)
        feats = WavEncoderTri(out_dim=self.hidden_size,
                              name="wav_encoder")(
            wav_chunks.reshape(B * S, wav_chunks.shape[-1]),
            train=train)
        feats = feats.reshape(B, S, self.hidden_size)
        T = word_ids.shape[1]
        idx = (jnp.arange(T) * S) // T
        fused = jnp.concatenate([emb, feats[:, idx]], axis=-1)
        seq = jnp.transpose(fused, (1, 0, 2))               # (T, B, E+H)
        outs, hidden = BiGRU(hidden_size=self.hidden_size,
                             n_layers=self.n_layers,
                             dropout=self.dropout,
                             dtype=self.dtype,
                             name="gru")(seq, train=train)
        outs = outs[..., :self.hidden_size] + outs[..., self.hidden_size:]
        return outs.astype(jnp.float32), hidden.astype(jnp.float32)


class AudioContextEncoder(nn.Module):
    """Per-second mel chunks -> biGRU context (ref :235-244, 281-317).

    Input (B, S, n_mels, frames) -> (outputs (S, B, H), hidden (2L, B, H))
    with summed directions, mirroring the text encoder contract so the
    Part-d decoder can consume either."""

    hidden_size: int
    n_layers: int = 2
    dropout: float = 0.5
    dtype: Optional[Any] = None   # bf16 opt-in; outputs return fp32

    @nn.compact
    def __call__(self, mel_chunks: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, S = mel_chunks.shape[:2]
        flat = mel_chunks.reshape((B * S,) + mel_chunks.shape[2:])
        feats = WavEncoderSpectral(out_dim=self.hidden_size,
                                   name="wav_encoder")(flat, train=train)
        seq = feats.reshape(B, S, -1).transpose(1, 0, 2)   # (S, B, H)
        outs, hidden = BiGRU(hidden_size=self.hidden_size,
                             n_layers=self.n_layers, dropout=self.dropout,
                             dtype=self.dtype,
                             name="gru")(seq, train=train)
        outs = outs[..., :self.hidden_size] + outs[..., self.hidden_size:]
        return outs.astype(jnp.float32), hidden.astype(jnp.float32)
