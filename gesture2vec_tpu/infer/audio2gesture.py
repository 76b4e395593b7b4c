"""End-to-end audio-context inference: waveform -> tokens -> motion.

The reference's audio_context=True inference path feeds per-second mel
chunks through EncoderRNN_With_Audio inside the same generate_gestures
window loop as the text path (ref: scripts/inference_text2embedding.py
:293-339 builds the mel chunks, :360-366 decodes tokens per window,
audio encoder ref: Helper_models.py:179-317). Same TPU-native shape as
infer/text2gesture.py: all windows' audio encodes in ONE device call,
one lax.scan carries the teacher-forced seed across windows
(ref :369-374), then tokens synthesize to motion either generatively
(Part-b decode + DAE) or by exemplar retrieval from a latent bank.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.data.datasets import unnormalize


@dataclasses.dataclass
class AudioGestureGenerator:
    """When the Audio2Token model was trained with audio_fusion="both"
    (the reference's repaired text+audio branch, Helper_models.py
    :246-253), `generate` additionally needs the transcript words and a
    `vocab`; the encoder then consumes (word_ids, 1-second raw wav
    chunks) per window instead of mel chunks."""

    a2t_model: object
    a2t_variables: dict
    seq_model: object
    seq_variables: dict
    dae_model: object
    dae_variables: dict
    pose_mean: np.ndarray
    pose_std: np.ndarray
    n_frames: int = 20
    sentence_frame_length: int = 120
    fps: int = 20
    audio_sr: int = 16000
    mode: str = "decode"              # "decode" | "exemplar"
    latent_bank: Optional[Dict[str, np.ndarray]] = None
    seed: int = 0
    vocab: Optional[object] = None    # required for fusion="both"
    max_words: int = 48
    # stochastic token decode (beyond reference; same contract as
    # infer/text2gesture.GestureGenerator): 0.0 = greedy argmax, >0 =
    # ancestral sampling at this softmax temperature, top_k truncation
    # optional. Draws are seeded from `seed`, fresh per generate call.
    temperature: float = 0.0
    top_k: int = 0
    # beam-search decode (beyond reference; exclusive with
    # temperature>0): 0/1 = greedy, >1 searches that many hypotheses
    beam_width: int = 0
    # exemplar mode: continuity-aware retrieval (motion matching) —
    # same contract as infer/text2gesture.GestureGenerator
    exemplar_continuity: bool = False
    # decode mode: overlap-blended chunk decode (same contract as
    # infer/text2gesture.GestureGenerator.decode_overlap)
    decode_overlap: int = 0
    # decode mode: soft-mixture decode (same contract as
    # infer/text2gesture.GestureGenerator.soft_decode): >0 rebuilds each
    # chunk's hidden from softmax(step logits / soft_decode) @ codebook
    # instead of the hard codebook[argmax] row
    soft_decode: float = 0.0

    def __post_init__(self):
        self.n_steps = self.sentence_frame_length // self.n_frames
        self.fusion = getattr(self.a2t_model, "fusion", "audio")
        self._rng = np.random.default_rng(self.seed)
        if self.mode == "exemplar":
            assert self.latent_bank is not None, \
                "exemplar mode needs a latent bank (cluster/latent_dataset)"
            from gesture2vec_tpu.infer.exemplar import ExemplarBank
            self._exemplars = ExemplarBank(
                self.latent_bank, int(self.a2t_model.n_tokens),
                np.asarray(self.seq_variables["params"]["vq_layer"]
                           ["codebook"]), self._rng)

        a2t, seq, dae = self.a2t_model, self.seq_model, self.dae_model
        n_pre, n_steps = a2t.n_pre_poses, self.n_steps
        sampling = self.temperature > 0.0
        temp, topk = float(self.temperature), int(self.top_k)
        beam = int(self.beam_width) if self.beam_width > 1 else 0
        if beam and sampling:
            raise ValueError("beam_width>1 and temperature>0 are "
                             "mutually exclusive decode policies")
        soft = float(self.soft_decode)
        if soft and self.mode != "decode":
            raise ValueError("soft_decode only applies to decode mode")
        if soft and beam:
            raise ValueError("soft_decode needs the per-step predictive "
                             "distribution, which beam search does not "
                             "produce; use greedy or sampled decode")

        def _mix_probs(logits, tokens):
            """softmax(logits / soft) per step, with the step-0 row (the
            seed/carry step's synthetic one-hot) replaced by the hard
            one-hot of its token — see text2gesture._mix_probs."""
            p = jax.nn.softmax(logits / soft, axis=-1)
            hard0 = jax.nn.one_hot(tokens[..., 0], logits.shape[-1],
                                   dtype=p.dtype)[..., None, :]
            return jnp.concatenate([hard0, p[..., 1:, :]], axis=-2)

        def _tw(key):
            """Decode-apply kwargs for the configured decode policy
            (empty = the reference's greedy argmax)."""
            if not sampling:
                return {}
            return dict(temperature=temp, top_k=topk,
                        rngs={"sample": key})

        def _decode_win(eo, dh, seeds, key):
            """One window token decode under the configured policy
            (greedy / sampled / beam); "tokens" is the common
            contract."""
            a2t_ = self.a2t_model
            if beam:
                return a2t_.apply(self.a2t_variables, eo, dh, seeds,
                                  beam_width=beam,
                                  method=a2t_.beam_decode)
            return a2t_.apply(self.a2t_variables, eo, dh, seeds,
                              method=a2t_.decode_tokens, **_tw(key))
        # multi-stage rvq chain (same contract as infer/text2gesture):
        # stage heads predicted per step, decode from the stage-sum
        # hidden; seed steps carry -1 and contribute stage 0 only
        multi = getattr(a2t, "token_stages", 1) > 1
        if multi:
            assert getattr(seq, "vq_variant", "") == "rvq", \
                "a token_stages>1 audio2token needs an rvq tokenizer"

        @jax.jit
        def predict_tokens_all(enc_in, seed0, key):
            """enc_in: mel_windows (W, S, n_mels, frames), or a
            (word_ids (W, T), wav_chunks (W, S, samples)) tuple when
            fusion="both". seed0 (n_steps,) -> tokens (W * n_steps,);
            key drives the stochastic decode (unused at temperature 0).
            One batched audio encode, then a scan over windows carrying
            the trailing predictions as the next teacher prefix
            (ref :369-374)."""
            enc_outs, dec_hidden = a2t.apply(
                self.a2t_variables, enc_in,
                method=a2t.encode_audio)          # (S, W, H), (L, W, H)

            def body(seed_tokens, w):
                eo = jax.lax.dynamic_slice_in_dim(enc_outs, w, 1, axis=1)
                dh = jax.lax.dynamic_slice_in_dim(dec_hidden, w, 1, axis=1)
                res = _decode_win(eo, dh, seed_tokens[None],
                                  jax.random.fold_in(key, w))
                toks = res["tokens"][0]
                next_seed = jnp.zeros((n_steps,), jnp.int32) \
                    .at[:n_pre].set(toks[-n_pre:])
                ys = {"tok": toks}
                if multi:
                    sr = res["stage_tokens"][0]
                    ys["st"] = jnp.concatenate(
                        [jnp.full((1, sr.shape[1]), -1, sr.dtype), sr],
                        axis=0)
                if soft:
                    ys["p"] = _mix_probs(res["logits"][0], toks)
                    if multi:
                        sp = jax.nn.softmax(
                            res["stage_logits"][0] / soft, axis=-1)
                        # all-zero step-0 row = the -1 sentinel's zero
                        # stage contribution
                        ys["sp"] = jnp.concatenate(
                            [jnp.zeros((1,) + sp.shape[1:], sp.dtype),
                             sp], axis=0)
                return next_seed, ys

            n_windows = (enc_in[1] if isinstance(enc_in, tuple)
                         else enc_in).shape[0]
            _, ys = jax.lax.scan(body, seed0, jnp.arange(n_windows))
            out = {"tok": ys["tok"].reshape(-1)}
            if multi:
                out["st"] = ys["st"].reshape(-1, ys["st"].shape[-1])
            if soft:
                out["p"] = ys["p"].reshape(-1, ys["p"].shape[-1])
                if multi:
                    out["sp"] = ys["sp"].reshape(
                        (-1,) + ys["sp"].shape[-2:])
            return out

        @jax.jit
        def decode_and_dae(tokens, stage_tokens=None, probs=None,
                           stage_probs=None):
            """tokens (N,) [+ stage ids (N, S-1), -1 = stage-0 only] ->
            motion frames (N * n_frames, pose_dim): batched Part-b chunk
            rollout + batched DAE decode. Every frame is a decoder
            output (seq.rollout) - the reference's generative rollout
            never emits its seed frame
            (inference_text2embedding.py:488-519). With soft decode,
            probs/stage_probs replace the hard codebook lookups with
            mixture matmuls (see text2gesture._token_hidden)."""
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
                        flat = flat + stage_probs[:, s] @ cbs
                        continue
                    st = stage_tokens[:, s]
                    flat = flat + jnp.where(
                        (st >= 0)[:, None],
                        jnp.take(cbs, jnp.maximum(st, 0), axis=0), 0.0)
            hidden = jnp.transpose(flat.reshape(N, L, H), (1, 0, 2))
            b = int(self.decode_overlap)
            out = seq.apply(
                self.seq_variables, hidden, jnp.zeros((N, seq.rep_dim)),
                method=seq.rollout,
                rngs={"dropout": jax.random.PRNGKey(0)},
                n_steps=(seq.n_frames + b) if b else None)
            if b:
                F = seq.n_frames
                main = out[:, :F]
                w = ((jnp.arange(b) + 1.0) / (b + 1.0))[None, :, None]
                main = main.at[1:, :b].set(
                    (1 - w) * out[:-1, F:F + b] + w * out[1:, :b])
                latents = main.reshape(-1, seq.rep_dim)
            else:
                latents = out.reshape(-1, seq.rep_dim)
            return dae.apply(self.dae_variables, latents,
                             method=dae.decode)

        if self.mode == "exemplar":
            self._exemplar_decode = self._exemplars.make_decode_fn(
                dae, self.dae_variables)

        self._predict_tokens_all = predict_tokens_all
        self._decode_and_dae = decode_and_dae

    # ------------------------------------------------------------------
    def _mel_windows(self, audio: np.ndarray, n_windows: int) -> np.ndarray:
        from gesture2vec_tpu.io.audio import mel_chunks_per_second
        window_seconds = self.sentence_frame_length // self.fps
        need = n_windows * window_seconds * self.audio_sr
        if len(audio) < need:
            audio = np.pad(audio, (0, need - len(audio)))
        wins = []
        for w in range(n_windows):
            seg = audio[w * window_seconds * self.audio_sr:
                        (w + 1) * window_seconds * self.audio_sr]
            wins.append(mel_chunks_per_second(seg, self.audio_sr))
        return np.stack(wins, axis=0).astype(np.float32)

    def _wav_windows(self, audio: np.ndarray, n_windows: int) -> np.ndarray:
        """(W, S, audio_sr): per-window 1-second raw chunks for the
        fusion encoder (WavEncoderTri pins the 1 s @ 16 kHz chunk)."""
        window_seconds = self.sentence_frame_length // self.fps
        need = n_windows * window_seconds * self.audio_sr
        if len(audio) < need:
            audio = np.pad(audio, (0, need - len(audio)))
        return audio[:need].reshape(
            n_windows, window_seconds, self.audio_sr).astype(np.float32)

    def _window_word_ids(self, words: List[List], n_windows: int
                         ) -> np.ndarray:
        """(W, max_words) int32: words overlapping each window's time
        range (same overlap rule as infer/text2gesture.py, ref:
        data_preprocessor.get_words_in_time_range :335-363)."""
        unit = self.sentence_frame_length / self.fps
        out = np.zeros((n_windows, self.max_words), np.int32)
        for w in range(n_windows):
            t0, t1 = w * unit, (w + 1) * unit
            inside = [t[0] for t in words if t[2] > t0 and t[1] < t1]
            ids = self.vocab.words_to_ids(inside)[: self.max_words]
            out[w, :len(ids)] = ids
        return out

    # ------------------------------------------------------------------
    def generate(self, audio: np.ndarray,
                 duration_s: Optional[float] = None,
                 words: Optional[List[List]] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """audio: mono waveform at audio_sr; words: [[word, start_s,
        end_s], ...], required when the model was trained with
        audio_fusion="both". Returns (motion (T, pose_dim) unnormalized,
        tokens (n_windows*n_steps,))."""
        if duration_s is None:
            duration_s = len(audio) / self.audio_sr
        unit = self.sentence_frame_length / self.fps
        n_windows = max(int(np.ceil(duration_s / unit)), 1)
        audio = np.asarray(audio, np.float32)
        if self.fusion == "both":
            if words is None or self.vocab is None:
                raise ValueError("audio_fusion='both' generation needs "
                                 "the transcript words and a vocab")
            enc_in = (jnp.asarray(self._window_word_ids(words, n_windows)),
                      jnp.asarray(self._wav_windows(audio, n_windows)))
        else:
            enc_in = jnp.asarray(self._mel_windows(audio, n_windows))

        seed0 = jnp.zeros((self.n_steps,), jnp.int32)
        if self.temperature > 0.0:
            key = jax.random.PRNGKey(int(self._rng.integers(2 ** 31 - 1)))
        else:
            key = jax.random.PRNGKey(0)
        pred = self._predict_tokens_all(enc_in, seed0, key)
        tokens = np.asarray(pred["tok"])
        if self.mode == "decode":
            frames = np.asarray(self._decode_and_dae(
                pred["tok"], pred.get("st"), pred.get("p"),
                pred.get("sp")))
        else:
            picks = (self._exemplars.pick_indices_continuity(tokens)
                     if self.exemplar_continuity
                     else self._exemplars.pick_indices(tokens))
            frames = np.asarray(self._exemplar_decode(
                jnp.asarray(picks)))
        frames = unnormalize(frames, self.pose_mean, self.pose_std)
        return frames, tokens
