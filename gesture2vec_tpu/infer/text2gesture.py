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
      path exercised by inference_Autoencoder.py;
  finally the frame latents go through the DAE decoder and are
  unnormalized (ref :544-547, 786-789).

The whole tokens->motion synthesis is jitted; the per-window Python loop
only orchestrates word slicing.
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

    def __post_init__(self):
        self.n_steps = self.sentence_frame_length // self.n_frames
        self._rng = np.random.default_rng(self.seed)
        if self.mode == "exemplar":
            assert self.latent_bank is not None, \
                "exemplar mode needs a latent bank (cluster/latent_dataset)"
            toks = self.latent_bank["tokens"]
            k = int(self.t2t_model.n_tokens)
            self._token_index = [np.where(toks == t)[0] for t in range(k)]
            # tokens never produced on the corpus fall back to the
            # nearest populated token's exemplars at lookup time
            self._populated = np.array(
                [t for t in range(k) if len(self._token_index[t])])

        t2t, seq, dae = self.t2t_model, self.seq_model, self.dae_model

        @jax.jit
        def predict_tokens(word_ids, lengths, seed_tokens):
            res = t2t.apply(self.t2t_variables, word_ids, lengths,
                            seed_tokens, train=False)
            return jnp.argmax(res["logits"], axis=-1)

        @jax.jit
        def decode_token_chunk(codevec, seed_frame):
            """codevec (L*H,) -> chunk latents (n_frames, rep_dim)."""
            L, H = seq.n_layers, seq.hidden_size
            hidden = codevec.reshape(1, L, H).transpose(1, 0, 2)
            seed = jnp.tile(seed_frame[None, None, :],
                            (1, seq.n_frames, 1))
            out = seq.apply(self.seq_variables, hidden, seed, None,
                            method=seq.decode)
            return out[0]

        @jax.jit
        def dae_decode(latents):
            return dae.apply(self.dae_variables, latents,
                             method=dae.decode)

        self._predict_tokens = predict_tokens
        self._decode_token_chunk = decode_token_chunk
        self._dae_decode = dae_decode

    # ------------------------------------------------------------------
    def _window_word_ids(self, words: List[List], t0: float, t1: float
                         ) -> Tuple[np.ndarray, np.ndarray]:
        inside = [w[0] for w in words if t0 <= (w[1] + w[2]) / 2 < t1]
        ids = self.vocab.words_to_ids(inside)[: self.max_words]
        arr = np.zeros((1, self.max_words), np.int32)
        arr[0, : len(ids)] = ids
        return arr, np.array([max(len(ids), 1)], np.int32)

    def _codebook(self) -> np.ndarray:
        return np.asarray(self.seq_variables["params"]["vq_layer"]
                          ["codebook"])

    def _exemplar_latents(self, token: int) -> np.ndarray:
        idxs = self._token_index[token] if token < len(self._token_index) \
            else np.array([], np.int64)
        if len(idxs) == 0:
            # nearest populated token by codebook distance
            cb = self._codebook()
            pop = self._populated
            d = np.sum((cb[pop] - cb[token]) ** 2, axis=1)
            token = int(pop[np.argmin(d)])
            idxs = self._token_index[token]
        pick = int(self._rng.choice(idxs))  # ref :606-612 random exemplar
        return self.latent_bank["dae_latents"][pick]

    # ------------------------------------------------------------------
    def generate(self, words: List[List], duration_s: float
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """words: [[word, start_s, end_s], ...]. Returns
        (motion (T, pose_dim) unnormalized, tokens (n_windows*n_steps,)).
        """
        unit = self.sentence_frame_length / self.fps   # ref :255-265
        n_windows = max(int(np.ceil(duration_s / unit)), 1)

        all_tokens: List[np.ndarray] = []
        seed_tokens = np.zeros((1, self.n_steps), np.int32)
        for w in range(n_windows):
            t0, t1 = w * unit, (w + 1) * unit
            ids, lengths = self._window_word_ids(words, t0, t1)
            toks = np.asarray(self._predict_tokens(
                jnp.asarray(ids), jnp.asarray(lengths),
                jnp.asarray(seed_tokens)))[0]
            all_tokens.append(toks)
            # carry trailing predictions as the next teacher prefix
            # (ref :369-374)
            seed_tokens = np.zeros((1, self.n_steps), np.int32)
            n_pre = self.t2t_model.n_pre_poses
            seed_tokens[0, :n_pre] = toks[-n_pre:]

        tokens = np.concatenate(all_tokens)

        # tokens -> chunk latents
        chunks: List[np.ndarray] = []
        if self.mode == "exemplar":
            for t in tokens:
                chunks.append(self._exemplar_latents(int(t)))
        else:
            cb = self._codebook()
            prev_last = np.zeros((self.seq_model.rep_dim,), np.float32)
            for t in tokens:
                chunk = np.asarray(self._decode_token_chunk(
                    jnp.asarray(cb[int(t)]), jnp.asarray(prev_last)))
                prev_last = chunk[-1]
                chunks.append(chunk)
        latents = np.concatenate(chunks, axis=0)       # (T, rep_dim)

        frames = np.asarray(self._dae_decode(jnp.asarray(latents)))
        frames = unnormalize(frames, self.pose_mean, self.pose_std)
        return frames, tokens
