"""Baseline Seq2SeqNet inference: sliding windows with seed-pose carry.

Rebuild of scripts/inference.py:53-96: the continuous text->pose
baseline generates n_poses-frame windows; each subsequent window is
seeded with the previous window's last n_pre_poses frames (pose
continuation), and overlapping frames are linearly cross-faded.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.data.datasets import unnormalize
from gesture2vec_tpu.text.vocab import Vocab


def generate_baseline(model, variables, vocab: Vocab, words: List[List],
                      duration_s: float, *, pose_mean: np.ndarray,
                      pose_std: np.ndarray, fps: int = 20,
                      max_words: int = 32, overlap: int = 4
                      ) -> np.ndarray:
    """words: [[word, start_s, end_s], ...] -> motion (T, pose_dim),
    unnormalized."""
    n_frames = model.n_frames
    n_pre = model.n_pre_poses
    pose_dim = model.pose_dim
    stride = n_frames - overlap
    total = max(int(duration_s * fps), n_frames)
    starts = list(range(0, total - n_frames + 1, stride))
    if not starts:
        starts = [0]

    @jax.jit
    def run(ids, lengths, seed_poses):
        res = model.apply(variables, ids, lengths, seed_poses,
                          train=False)
        return res["outputs"]

    out = np.zeros((total, pose_dim), np.float32)
    weight = np.zeros((total, 1), np.float32)
    ramp = np.ones(n_frames, np.float32)
    if overlap > 0:
        ramp[:overlap] = np.linspace(0, 1, overlap, endpoint=False)
        ramp[-overlap:] = np.linspace(1, 0, overlap, endpoint=False)

    prev_tail = np.zeros((n_pre, pose_dim), np.float32)
    for s in starts:
        t0, t1 = s / fps, (s + n_frames) / fps
        # overlap rule (ref: inference.py:58 via get_words_in_time_range)
        inside = [w[0] for w in words if w[2] > t0 and w[1] < t1]
        ids = np.zeros((1, max_words), np.int32)
        wid = vocab.words_to_ids(inside)[:max_words]
        ids[0, : len(wid)] = wid
        lengths = np.array([max(len(wid), 1)], np.int32)

        # seed the teacher-forced prefix with the previous window's tail
        # (ref: inference.py:78-88 pre_seq continuation)
        seed = np.zeros((1, n_frames, pose_dim), np.float32)
        seed[0, :n_pre] = prev_tail
        win = np.asarray(run(jnp.asarray(ids), jnp.asarray(lengths),
                             jnp.asarray(seed)))[0]
        prev_tail = win[-n_pre:]

        out[s:s + n_frames] += win * ramp[:, None]
        weight[s:s + n_frames] += ramp[:, None]

    covered = weight[:, 0] > 0
    out[covered] /= weight[covered]
    return unnormalize(out, pose_mean, pose_std)
