"""Sentence-level dataset build for Part d.

Rebuild of the reference's sentence-level cache + dataset
(ref: scripts/data_loader/data_preprocessor.py:123-333 with
sentence_level=True; scripts/data_loader/lmdb_data_loader.py:1045-1292
TrinityDataset_sentencelevel): windows of sentence_frame_length frames
with >= 4 words, word-id sequences, and per-chunk gesture tokens
produced by the frozen Part-a + Part-b teachers. All teacher passes run
as one offline batched sweep (see data/teacher.py) instead of inside
__getitem__.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from gesture2vec_tpu.data.datasets import normalize, sentence_windows
from gesture2vec_tpu.data.store import ClipStore
from gesture2vec_tpu.data.teacher import (encode_windows_with_dae,
                                          tokenize_windows)
from gesture2vec_tpu.text.vocab import Vocab


def build_sentence_dataset(store: ClipStore, vocab: Vocab, *,
                           dae_model, dae_variables,
                           seq_model, seq_variables,
                           sentence_frame_length: int = 120,
                           stride: int = 20, n_frames: int = 20,
                           fps: int = 20, max_words: int = 48,
                           mean: Optional[np.ndarray] = None,
                           std: Optional[np.ndarray] = None,
                           include_audio: bool = False,
                           include_raw_audio: bool = False,
                           audio_sr: int = 16000,
                           sentence_embedding=None,
                           mesh=None,
                           emit_stage_tokens: bool = False,
                           text_context_s: float = 0.0
                           ) -> Dict[str, np.ndarray]:
    """Returns arrays:
      word_ids (N, max_words) int32 padded with PAD=0, SOS/EOS included
      lengths  (N,) int32
      tokens   (N, n_steps) int32 gesture tokens (n_steps = flen//n_frames)
      poses    (N, sentence_frame_length, D) float32 normalized
      mel      (N, seconds, 128, frames) when include_audio (per-second
               mel chunks, ref: data_preprocessor.py:248-263)
      wav      (N, seconds, audio_sr) when include_raw_audio: 1-second
               raw waveform chunks for the text+audio fusion encoder
               (WavEncoderTri pins the chunk to exactly 1 s @ 16 kHz,
               ref: Helper_models.py:325-368)
      sentence_emb (N, dim) when a sentence_embedding provider is given
               (the reference's GPT3_Embedding batch slot, ref:
               lmdb_data_loader.py:67-119 + data_preprocessor.py:459-472
               — see text/sentence_embedding.py)
    """
    mean = store.pose_mean if mean is None else mean
    std = store.pose_std if std is None else std
    wins = sentence_windows(store, sentence_frame_length, stride, fps,
                            context_s=text_context_s)
    if not wins:
        raise ValueError("no sentence windows (too few words or frames)")

    clips = {i: store[i] for i in sorted({w["clip"] for w in wins})}
    poses = np.stack([
        normalize(clips[w["clip"]]["poses"][w["frame0"]:
                                            w["frame0"] + sentence_frame_length],
                  mean, std)
        for w in wins]).astype(np.float32)

    # word ids (SOS ... EOS), sorted nothing - static padding
    N = len(wins)
    word_ids = np.zeros((N, max_words), np.int32)
    lengths = np.zeros((N,), np.int32)
    for i, w in enumerate(wins):
        ids = vocab.words_to_ids([t[0] for t in w["words"]])[:max_words]
        word_ids[i, :len(ids)] = ids
        lengths[i] = len(ids)

    # frozen-teacher tokenization: DAE latents -> per-chunk tokens
    n_steps = sentence_frame_length // n_frames
    latents = encode_windows_with_dae(dae_model, dae_variables,
                                      poses, mesh=mesh)  # (N, F, rep)
    chunks = latents.reshape(N * n_steps, n_frames, -1)
    tokens, _ = tokenize_windows(seq_model, seq_variables, chunks,
                                 mesh=mesh, all_stages=emit_stage_tokens)
    if emit_stage_tokens:
        # (N*steps, S) -> keep the full stack for the multi-stage Part d
        # AND the stage-0 column under the standard "tokens" key so
        # every single-token consumer is unaffected
        stage_tokens = tokens.reshape(N, n_steps, -1).astype(np.int32)
        tokens = stage_tokens[:, :, 0]
    else:
        tokens = tokens.reshape(N, n_steps).astype(np.int32)

    out = {"word_ids": word_ids, "lengths": lengths, "tokens": tokens,
           "poses": poses}
    if emit_stage_tokens:
        out["stage_tokens"] = stage_tokens

    if sentence_embedding is not None:
        sentences = [" ".join(t[0] for t in w["words"]) for w in wins]
        out["sentence_emb"] = sentence_embedding.embed_batch(sentences) \
            .astype(np.float32)

    if include_audio or include_raw_audio:
        from gesture2vec_tpu.io.audio import mel_chunks_per_second
        import math
        window_seconds = sentence_frame_length // fps
        mels, wavs = [], []
        for w in wins:
            clip = clips[w["clip"]]
            audio = clip.get("audio")
            if audio is None:
                seg = np.zeros((window_seconds * audio_sr,), np.float32)
            else:
                # map frames -> samples by position ratio
                # (ref: data_preprocessor.py:251-253)
                a0 = math.floor(w["frame0"] / clip["poses"].shape[0]
                                * len(audio))
                seg = audio[a0:a0 + window_seconds * audio_sr]
                if len(seg) < window_seconds * audio_sr:
                    seg = np.pad(
                        seg, (0, window_seconds * audio_sr - len(seg)))
            if include_audio:
                mels.append(mel_chunks_per_second(seg, audio_sr))
            if include_raw_audio:
                wavs.append(seg.reshape(window_seconds, audio_sr))
        if include_audio:
            out["mel"] = np.stack(mels, axis=0).astype(np.float32)
        if include_raw_audio:
            out["wav"] = np.stack(wavs, axis=0).astype(np.float32)
    return out
